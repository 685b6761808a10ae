"""Streamed Unit2Mel (pure diffusion, shallow start from input mel) vs
whole-utterance."""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ddsp_svc_tpu.models.cascade import Unit2Mel
from ddsp_svc_tpu.parallel.stream import blocked_noise_frames, streamed_unit2mel


def test_streamed_unit2mel_matches_whole():
    b, t, n_unit, m = 1, 128, 16, 16
    model = Unit2Mel(n_unit, n_spk=2, out_dims=m, n_layers=4, n_chans=32,
                     n_hidden=24, k_step_max=100)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    units = jax.random.normal(k1, (b, t, n_unit), jnp.float32)
    f0 = 220.0 * jnp.ones((b, t, 1), jnp.float32)
    volume = 0.5 * jnp.ones((b, t, 1), jnp.float32)
    gt = (jax.random.normal(k2, (b, t, m)) * 2.0 - 6.0).astype(jnp.float32)
    spk = jnp.array([[2]], jnp.int32)

    variables = model.init(
        {"params": jax.random.PRNGKey(1)},
        units, f0, volume, spk_id=spk, gt_spec=gt, infer=True, k_step=20,
        key=jax.random.PRNGKey(2),
    )
    kwargs = dict(k_step=20, infer_speedup=5, sampler="ddim")
    init_noise = blocked_noise_frames(k2, b, t, m)
    # jit-vs-jit comparison (see test_stream_sins.py note)
    whole = np.asarray(
        jax.jit(
            lambda v, u, f, vol, s, g, n: model.apply(
                v, u, f, vol, spk_id=s, gt_spec=g, infer=True,
                key=jax.random.PRNGKey(0), init_noise=n, **kwargs,
            )
        )(variables, units, f0, volume, spk, gt, init_noise)
    )
    mesh = Mesh(np.array(jax.devices()[:2]), ("time",))
    streamed = np.asarray(
        streamed_unit2mel(
            model, variables, units, f0, volume, gt, k2, spk_id=spk,
            mesh=mesh, **kwargs,
        )
    )
    assert streamed.shape == whole.shape
    scale = np.abs(whole).max()
    err = np.abs(streamed - whole).max() / scale
    assert err < 2e-5, f"relative error {err}"


def test_streamed_unit2mel_nondefault_timesteps():
    """Regression: the streamed engine rebuilds GaussianDiffusion and must
    forward timesteps=model.timesteps — with a non-default schedule (500)
    the streamed output previously used the 1000-step betas and silently
    diverged from whole-utterance."""
    b, t, n_unit, m = 1, 128, 16, 16
    model = Unit2Mel(n_unit, n_spk=1, out_dims=m, n_layers=2, n_chans=16,
                     n_hidden=12, k_step_max=100, timesteps=500)
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    units = jax.random.normal(k1, (b, t, n_unit), jnp.float32)
    f0 = 220.0 * jnp.ones((b, t, 1), jnp.float32)
    volume = 0.5 * jnp.ones((b, t, 1), jnp.float32)
    gt = (jax.random.normal(k2, (b, t, m)) * 2.0 - 6.0).astype(jnp.float32)

    variables = model.init(
        {"params": jax.random.PRNGKey(1)},
        units, f0, volume, gt_spec=gt, infer=True, k_step=20,
        key=jax.random.PRNGKey(2),
    )
    kwargs = dict(k_step=20, infer_speedup=5, sampler="ddim")
    init_noise = blocked_noise_frames(k2, b, t, m)
    whole = np.asarray(
        jax.jit(
            lambda v, u, f, vol, g, n: model.apply(
                v, u, f, vol, gt_spec=g, infer=True,
                key=jax.random.PRNGKey(0), init_noise=n, **kwargs,
            )
        )(variables, units, f0, volume, gt, init_noise)
    )
    mesh = Mesh(np.array(jax.devices()[:2]), ("time",))
    streamed = np.asarray(
        streamed_unit2mel(
            model, variables, units, f0, volume, gt, k2, mesh=mesh, **kwargs,
        )
    )
    scale = np.abs(whole).max()
    err = np.abs(streamed - whole).max() / scale
    assert err < 2e-5, f"relative error {err}"


def test_streamed_unit2mel_rejects_ancestral_chain():
    """infer_speedup <= 1 reaches the stochastic ancestral chain, which is
    not blocking-invariant — the streamed path must refuse clearly."""
    import pytest

    b, t, n_unit, m = 1, 128, 16, 16
    model = Unit2Mel(n_unit, n_spk=1, out_dims=m, n_layers=2, n_chans=16,
                     n_hidden=12, k_step_max=100)
    units = jnp.zeros((b, t, n_unit), jnp.float32)
    f0 = 220.0 * jnp.ones((b, t, 1), jnp.float32)
    volume = 0.5 * jnp.ones((b, t, 1), jnp.float32)
    gt = jnp.zeros((b, t, m), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:2]), ("time",))
    with pytest.raises(NotImplementedError, match="blocking-invariant"):
        streamed_unit2mel(
            model, {}, units, f0, volume, gt, jax.random.PRNGKey(0),
            mesh=mesh, k_step=20, infer_speedup=1,
        )
