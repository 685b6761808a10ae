"""Streamed Sins (harmonic bank + blocked LTV-FIR) vs whole-utterance."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ddsp_svc_tpu.models.ddsp import Sins
from ddsp_svc_tpu.parallel.stream import blocked_uniform, streamed_sins_forward


@pytest.mark.parametrize("n_dev", [
    2,
    pytest.param(4, marks=pytest.mark.slow),
])
def test_streamed_sins_matches_whole(n_dev):
    b, t, n_unit = 1, 192, 16
    sr, block = 16000, 32
    model = Sins(
        sampling_rate=sr, block_size=block, n_harmonics=16,
        n_mag_allpass=17, n_mag_noise=9, n_unit=n_unit, n_spk=1,
    )
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    units = jax.random.normal(k1, (b, t, n_unit), jnp.float32)
    f0 = 220.0 * jnp.exp(0.3 * jnp.sin(jnp.arange(t) / 13.0))[None, :, None]
    f0 = jnp.broadcast_to(f0, (b, t, 1)).astype(jnp.float32)
    volume = 0.5 * jnp.ones((b, t, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        units, f0, volume,
    )

    noise = blocked_uniform(k2, b, t, block)
    # jit the whole side: the streamed driver is jitted, and XLA's lowering
    # (e.g. cumsum as associative scan) differs from eager op-by-op at
    # ~1e-4 — the consistency contract is jit-vs-jit (production runs jitted)
    whole, _, _ = jax.jit(
        lambda v, u, f, vol, n: model.apply(v, u, f, vol, noise=n)
    )(variables, units, f0, volume, noise)
    whole = np.asarray(whole)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("time",))
    streamed = np.asarray(
        streamed_sins_forward(
            model, variables, units, f0, volume, k2, mesh=mesh
        )
    )
    assert streamed.shape == whole.shape
    scale = np.abs(whole).max()
    err = np.abs(streamed - whole).max() / scale
    assert err < 2e-5, f"D={n_dev} relative error {err}"
