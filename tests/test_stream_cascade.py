"""Streamed cascade (DDSP -> blocked mel -> halo-exchanging sampler) vs
whole-utterance consistency."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ddsp_svc_tpu.models.cascade import ReflowUnit2Wav, Unit2WavFast
from ddsp_svc_tpu.ops.mel import LogMelSpectrogram
from ddsp_svc_tpu.parallel.stream import (
    streamed_cascade_mel,
    whole_cascade_reference,
)

SR, HOP, WIN, N_UNIT, M = 16000, 64, 256, 16, 16
B, T = 1, 192


def make_mel():
    return LogMelSpectrogram(
        sr=SR, n_mels=M, n_fft=WIN, win_size=WIN, hop_length=HOP,
        fmin=40.0, fmax=7000.0,
    )


def make_inputs():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    units = jax.random.normal(k1, (B, T, N_UNIT), jnp.float32)
    f0 = 200.0 * jnp.exp(0.3 * jnp.sin(jnp.arange(T) / 9.0))[None, :, None]
    f0 = jnp.broadcast_to(f0, (B, T, 1)).astype(jnp.float32)
    volume = 0.5 * jnp.ones((B, T, 1), jnp.float32)
    return units, f0, volume, k2


def _init(model, units, f0, volume, mel, family):
    kwargs = dict(
        mel_extract_fn=mel.extract, infer=True, key=jax.random.PRNGKey(9)
    )
    if family == "diffusion":
        kwargs["k_step"] = 20
    return model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        units, f0, volume, **kwargs,
    )


@pytest.mark.parametrize("family,sampler", [
    ("reflow", "euler"),
    pytest.param("reflow", "rk4", marks=pytest.mark.slow),
    ("diffusion", "ddim"),
    pytest.param("diffusion", "dpm-solver", marks=pytest.mark.slow),
])
def test_streamed_cascade_matches_whole(family, sampler):
    units, f0, volume, key = make_inputs()
    mel = make_mel()
    if family == "reflow":
        model = ReflowUnit2Wav(SR, HOP, WIN, N_UNIT, 1, out_dims=M,
                               n_layers=2, n_chans=32)
        kwargs = dict(infer_step=2, sampler=sampler, t_start=0.7)
    else:
        model = Unit2WavFast(SR, HOP, WIN, N_UNIT, 1, out_dims=M,
                             n_layers=2, n_chans=32, k_step_max=100)
        kwargs = dict(infer_speedup=5, sampler=sampler, k_step=10)
    variables = _init(model, units, f0, volume, mel, family)

    whole = np.asarray(
        whole_cascade_reference(
            model, variables, units, f0, volume, key, mel, family=family,
            **kwargs,
        )
    )
    mesh = Mesh(np.array(jax.devices()[:2]), ("time",))
    streamed = np.asarray(
        streamed_cascade_mel(
            model, variables, units, f0, volume, key, mel, mesh=mesh,
            family=family, **kwargs,
        )
    )
    assert streamed.shape == whole.shape
    scale = np.abs(whole).max()
    err = np.abs(streamed - whole).max() / scale
    assert err < 2e-5, f"relative error {err}"
