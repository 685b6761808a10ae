"""Golden ODE tests: our RectifiedFlow vs the reference reflow/reflow.py
with a shared dummy velocity net and identical initial noise."""
import sys
from unittest import mock

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

B, T, M = 1, 8, 4


@pytest.fixture(scope="module")
def ref_cls():
    sys.path.insert(0, "/root/reference")
    from reflow.reflow import RectifiedFlow as RefRF

    return RefRF


class TorchDummyV(torch.nn.Module):
    def forward(self, x, t, cond):
        tt = t.float().reshape(-1, 1, 1, 1)
        return torch.tanh(x) * 0.2 + torch.cos(tt / 113.0) * 0.05 + 0.03 * cond.mean()


class FlaxDummyV:
    def __call__(self, x, t, cond, deterministic=True):
        tt = t.astype(jnp.float32).reshape(-1, 1, 1)
        return jnp.tanh(x) * 0.2 + jnp.cos(tt / 113.0) * 0.05 + 0.03 * jnp.mean(cond)


@pytest.mark.parametrize("sampler,steps,t_start", [
    ("euler", 10, 0.7),
    ("rk4", 5, 0.7),
    ("euler", 20, 0.0),
])
def test_ode_matches_reference(ref_cls, sampler, steps, t_start):
    rng = np.random.default_rng(1)
    cond = rng.standard_normal((B, T, 16)).astype(np.float32)
    gt = (rng.standard_normal((B, T, M)) * 2 - 6).astype(np.float32)
    noise = rng.standard_normal((B, 1, M, T)).astype(np.float32)

    ref = ref_cls(TorchDummyV(), out_dims=M)
    ref.eval()
    noise_t = torch.from_numpy(noise)
    with torch.no_grad(), mock.patch.object(
        torch, "randn", lambda *shape, **k: noise_t
    ):
        golden = ref(
            torch.from_numpy(cond),
            gt_spec=torch.from_numpy(gt),
            infer=True,
            infer_step=steps,
            method=sampler,
            t_start=t_start,
            use_tqdm=False,
        ).numpy()

    from ddsp_svc_tpu.models.reflow import RectifiedFlow

    model = RectifiedFlow(FlaxDummyV(), out_dims=M)
    ours = np.asarray(
        model.apply(
            {},
            jnp.asarray(cond),
            gt_spec=jnp.asarray(gt),
            infer=True,
            infer_step=steps,
            sampler=sampler,
            t_start=t_start,
            key=jax.random.PRNGKey(0),
            init_noise=jnp.asarray(noise[:, 0].transpose(0, 2, 1)),
        )
    )
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=5e-4, rtol=1e-3)
