"""Streamed NSF-HiFiGAN vs whole-padded-utterance consistency."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ddsp_svc_tpu.models.nsf_hifigan import Generator
from ddsp_svc_tpu.parallel.stream import (
    nsf_hifigan_padded_forward,
    streamed_nsf_hifigan,
)


@pytest.mark.parametrize("resblock_cfg", [
    # small kernels (fast) and the full-size kernel/dilation set (stresses
    # the receptive-field bound of VOCODER_HALO; slow-marked)
    dict(resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),)),
    pytest.param(
        dict(resblock_kernel_sizes=(3, 7, 11),
             resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5))),
        marks=pytest.mark.slow),
])
def test_streamed_vocoder_matches_whole(resblock_cfg):
    b, t, m = 1, 128, 8
    gen = Generator(
        sampling_rate=16000, num_mels=m, upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8), upsample_initial_channel=16,
        resblock="1", **resblock_cfg,
    )
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    mel = jax.random.normal(k1, (b, t, m), jnp.float32)
    f0 = 200.0 * jnp.exp(0.2 * jnp.sin(jnp.arange(t) / 11.0))[None, :]
    f0 = jnp.broadcast_to(f0, (b, t)).astype(jnp.float32)
    # unvoiced stretch exercises the uv noise path
    f0 = f0.at[:, 40:50].set(0.0)
    params = gen.init(
        {"params": k2, "noise": k3}, mel, f0, key=jax.random.PRNGKey(1)
    )["params"]

    whole = np.asarray(
        nsf_hifigan_padded_forward(gen, params, mel, f0, jax.random.PRNGKey(7))
    )
    mesh = Mesh(np.array(jax.devices()[:4]), ("time",))
    streamed = np.asarray(
        streamed_nsf_hifigan(
            gen, params, mel, f0, jax.random.PRNGKey(7), mesh=mesh
        )
    )
    assert streamed.shape == whole.shape == (b, t * gen.upp)
    scale = np.abs(whole).max()
    err = np.abs(streamed - whole).max() / scale
    assert err < 1e-5, f"relative error {err}"
