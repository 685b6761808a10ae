"""Golden sampler tests: our GaussianDiffusion vs the reference's own
(diffusion/diffusion.py + vendored dpm_solver_pytorch/uni_pc), executed
directly with a shared deterministic dummy denoiser and identical initial
noise. This validates the schedule buffers, the shallow q_sample start, and
every accelerated sampler's step sequence / t-labeling convention.
"""
import sys
import types
from unittest import mock

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

B, T, M = 1, 8, 4
K_STEP = 100


@pytest.fixture(scope="module")
def ref_module():
    # stub librosa (imported but unused by the diffusion module); a valid
    # __spec__ is required or later importlib.util.find_spec("librosa")
    # calls raise "librosa.__spec__ is None" (test-order interaction with
    # test_golden_torch_modules)
    if "librosa" not in sys.modules:
        import importlib.machinery

        librosa = types.ModuleType("librosa")
        librosa.__spec__ = importlib.machinery.ModuleSpec("librosa", None)
        librosa.sequence = types.ModuleType("librosa.sequence")
        librosa.sequence.__spec__ = importlib.machinery.ModuleSpec(
            "librosa.sequence", None
        )
        sys.modules["librosa"] = librosa
        sys.modules["librosa.sequence"] = librosa.sequence
    sys.path.insert(0, "/root/reference")
    from diffusion.diffusion import GaussianDiffusion as RefGD

    return RefGD


class TorchDummy(torch.nn.Module):
    """eps = tanh(x)*0.1 + sin(t/57)*0.01 + 0.05*mean(cond) — elementwise,
    t-sensitive, cond-sensitive; identical math on both sides."""

    def forward(self, x, t, cond):
        tt = t.float().reshape(-1, 1, 1, 1)
        return (
            torch.tanh(x) * 0.1
            + torch.sin(tt / 57.0) * 0.01
            + 0.05 * cond.mean()
        )


class FlaxDummy:
    def __call__(self, x, t, cond, deterministic=True):
        tt = t.astype(jnp.float32).reshape(-1, 1, 1)
        return (
            jnp.tanh(x) * 0.1
            + jnp.sin(tt / 57.0) * 0.01
            + 0.05 * jnp.mean(cond)
        )


def run_ref(ref_cls, sampler, cond, gt, noise, speedup):
    ref = ref_cls(TorchDummy(), out_dims=M, timesteps=1000, k_step=K_STEP)
    ref.eval()
    cond_t = torch.from_numpy(cond.transpose(0, 2, 1))  # ref takes (B,H,T)
    gt_t = torch.from_numpy(gt)  # (B, T, M)? ref norm_spec handles (B,T,M)
    noise_t = torch.from_numpy(noise)  # (B,1,M,T)

    def fake_randn_like(x, *a, **k):
        assert x.shape == noise_t.shape
        return noise_t

    with torch.no_grad(), \
            mock.patch.object(torch, "randn_like", fake_randn_like):
        out = ref(
            cond_t.transpose(1, 2), gt_spec=gt_t, infer=True,
            infer_speedup=speedup, method=sampler, k_step=K_STEP,
            use_tqdm=False,
        )
    return out.numpy()  # (B, T, M)


def run_ours(sampler, cond, gt, noise, speedup):
    from ddsp_svc_tpu.models.diffusion import GaussianDiffusion

    model = GaussianDiffusion(
        FlaxDummy(), out_dims=M, timesteps=1000, k_step=K_STEP
    )
    noise_btm = noise[:, 0].transpose(0, 2, 1)  # (B,1,M,T) -> (B,T,M)
    out = model.apply(
        {},
        jnp.asarray(cond),
        gt_spec=jnp.asarray(gt),
        infer=True,
        infer_speedup=speedup,
        sampler=sampler,
        k_step=K_STEP,
        key=jax.random.PRNGKey(0),
        init_noise=jnp.asarray(noise_btm),
    )
    return np.asarray(out)


@pytest.mark.parametrize("sampler,speedup", [
    ("ddim", 10),
    ("pndm", 10),
    ("dpm-solver", 10),
    ("unipc", 10),
    ("ddim", 5),
    ("dpm-solver", 20),
])
def test_sampler_matches_reference(ref_module, sampler, speedup):
    rng = np.random.default_rng(0)
    cond = rng.standard_normal((B, T, 16)).astype(np.float32)
    gt = (rng.standard_normal((B, T, M)) * 2 - 6).astype(np.float32)
    noise = rng.standard_normal((B, 1, M, T)).astype(np.float32)

    golden = run_ref(ref_module, sampler, cond, gt, noise, speedup)
    ours = run_ours(sampler, cond, gt, noise, speedup)
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=5e-4, rtol=1e-3)
