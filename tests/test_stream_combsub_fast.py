"""Streamed standalone CombSubFast (framed-rFFT OLA + PCmer-decoder
controls) vs whole-utterance — the engine the DiffusionNew cascade rides,
exposed directly through streamed_forward dispatch."""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ddsp_svc_tpu.models.ddsp import CombSubFast
from ddsp_svc_tpu.parallel.stream import (
    blocked_uniform,
    streamed_forward,
)


def test_streamed_combsub_fast_matches_whole():
    b, t, n_unit = 1, 128, 16
    sr, block = 16000, 32
    model = CombSubFast(
        sampling_rate=sr, block_size=block, n_unit=n_unit, n_spk=1,
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
    # jit-vs-jit comparison (see test_stream_sins.py note)
    whole, _, _ = jax.jit(
        lambda v, u, f, vol, n: model.apply(v, u, f, vol, noise=n)
    )(variables, units, f0, volume, noise)
    whole = np.asarray(whole)

    mesh = Mesh(np.array(jax.devices()[:2]), ("time",))
    streamed = np.asarray(
        streamed_forward(model, variables, units, f0, volume, k2, mesh)
    )
    assert streamed.shape == whole.shape
    scale = np.abs(whole).max()
    err = np.abs(streamed - whole).max() / scale
    assert err < 2e-5, f"relative error {err}"
