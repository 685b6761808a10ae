"""Streamed DiffusionNew (CombSubFast + PCmer decoder + WaveNet diffusion)
vs whole-utterance consistency — covers the masked-psum FAVOR+ attention,
the exact cumsum phase carries, and the WaveNet denoiser halos."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ddsp_svc_tpu.models.cascade import Unit2Wav
from ddsp_svc_tpu.ops.mel import LogMelSpectrogram
from ddsp_svc_tpu.parallel.stream import (
    streamed_unit2wav_new_mel,
    whole_unit2wav_new_reference,
)

SR, HOP, N_UNIT, M = 16000, 64, 16, 16
B, T = 1, 128


@pytest.mark.parametrize("sampler,k_step,speedup", [
    ("ddim", 10, 5),
    pytest.param("dpm-solver", 40, 10, marks=pytest.mark.slow),
])
def test_streamed_diffnew_matches_whole(sampler, k_step, speedup):
    mel = LogMelSpectrogram(sr=SR, n_mels=M, n_fft=256, win_size=256,
                            hop_length=HOP, fmin=40.0, fmax=7000.0)
    model = Unit2Wav(SR, HOP, N_UNIT, 1, out_dims=M, n_layers=4, n_chans=32,
                     k_step_max=100)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    units = jax.random.normal(k1, (B, T, N_UNIT), jnp.float32)
    f0 = 200.0 * jnp.exp(0.3 * jnp.sin(jnp.arange(T) / 9.0))[None, :, None]
    f0 = jnp.broadcast_to(f0, (B, T, 1)).astype(jnp.float32)
    volume = 0.5 * jnp.ones((B, T, 1), jnp.float32)

    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        units, f0, volume, mel_extract_fn=mel.extract, infer=True,
        k_step=k_step, key=jax.random.PRNGKey(3),
    )
    kwargs = dict(k_step=k_step, infer_speedup=speedup, sampler=sampler)
    whole = np.asarray(
        whole_unit2wav_new_reference(
            model, variables, units, f0, volume, k2, mel, **kwargs
        )
    )
    mesh = Mesh(np.array(jax.devices()[:2]), ("time",))
    streamed = np.asarray(
        streamed_unit2wav_new_mel(
            model, variables, units, f0, volume, k2, mel, mesh=mesh, **kwargs
        )
    )
    assert streamed.shape == whole.shape
    scale = np.abs(whole).max()
    err = np.abs(streamed - whole).max() / scale
    assert err < 2e-5, f"relative error {err}"
