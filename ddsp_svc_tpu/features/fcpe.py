"""FCPE pitch estimator — JAX/flax port (wheel-free 'fcpe' extractor).

Reference usage: ddsp/vocoder.py:121-133 calls the ``torchfcpe`` wheel's
bundled ``InferCFNaiveMelPE`` with ``decoder_mode='local_argmax'`` and
``threshold=0.006`` on a 10 ms grid. The wheel is not shipped in this image,
so this module ports the published CFNaiveMelPE architecture
(github.com/CNChTu/FCPE — the same author's ConformerNaiveEncoder that the
reference vendors at diffusion/model_conformer_naive.py:8-165):

  mel (B, T, 128, log, 16 kHz / hop 160)
    -> input stack: Conv1d(128->512, k3) + GroupNorm(4) + LeakyReLU +
       Conv1d(512->512, k3)                       [torchfcpe input_stack]
    -> ConformerNaiveEncoder(6 layers, conv_only) [shared models/conformer]
    -> LayerNorm -> weight-norm Linear(512->360) -> sigmoid
    -> local-argmax decode: +/-4 bins around the argmax, probability-weighted
       cents average, confidence threshold -> f0 = 10 * 2^(cents/1200)

Weights: convert a ``torchfcpe`` checkpoint with convert/fcpe.py (the bundled
model ships inside the wheel as fcpe_c_v001_l.pt-style files); the converter
and the forward here are golden-tested against a torch mirror built from the
reference's own ConformerNaiveEncoder (tests/test_golden_fcpe.py).
"""
from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.conformer import ConformerNaiveEncoder
from ..models.nn import Conv1d, Dense, GroupNorm, LayerNorm, leaky_relu
from ..ops.mel import LogMelSpectrogram
from ..ops.resample import resample

SAMPLE_RATE = 16000
HOP = 160  # 10 ms grid (matches the reference's origin_time = 0.01 * i)
F0_MIN = 32.70
F0_MAX = 1975.5
N_BINS = 360


def f0_to_cent(f0):
    return 1200.0 * np.log2(np.asarray(f0, np.float64) / 10.0)


def cent_table() -> np.ndarray:
    return np.linspace(f0_to_cent(F0_MIN), f0_to_cent(F0_MAX), N_BINS).astype(
        np.float32
    )


class CFNaiveMelPE(nn.Module):
    """torchfcpe CFNaiveMelPE forward: mel (B, T, 128) -> probs (B, T, 360)."""

    hidden: int = 512
    out_dims: int = N_BINS
    n_layers: int = 6
    n_heads: int = 8

    @nn.compact
    def __call__(self, mel):
        x = Conv1d(self.hidden, 3, padding=1, name="input_conv0")(mel)
        x = GroupNorm(4, name="input_norm")(x)
        x = leaky_relu(x)  # torch nn.LeakyReLU() default slope 0.01
        x = Conv1d(self.hidden, 3, padding=1, name="input_conv1")(x)
        x = ConformerNaiveEncoder(
            self.n_layers, self.n_heads, self.hidden, conv_only=True, name="net"
        )(x)
        x = LayerNorm(name="norm")(x)
        x = Dense(self.out_dims, weight_norm=True, name="output_proj")(x)
        return jax.nn.sigmoid(x)


def local_argmax_f0(probs: np.ndarray, threshold: float = 0.006) -> np.ndarray:
    """torchfcpe latent2cents_local_decoder: probability-weighted cents over
    the +/-4 bins around the argmax; frames whose peak probability is at or
    below the threshold are unvoiced (f0 = 0). Out-of-range window indices
    are CLAMPED to the edge bin (torchfcpe duplicates edge bins via
    torch.clamp before gather — unlike RMVPE's zero-padded window), so
    decoded cents at the extreme ends of the 32.7-1975.5 Hz range lean
    into the edge bin by design."""
    table = cent_table()
    idx = probs.argmax(axis=-1)  # (T,)
    local = np.clip(idx[:, None] + np.arange(-4, 5)[None, :], 0, N_BINS - 1)
    t_idx = np.arange(len(idx))[:, None]
    w = probs[t_idx, local]
    cents = (table[local] * w).sum(-1) / np.maximum(w.sum(-1), 1e-12)
    f0 = 10.0 * 2.0 ** (cents / 1200.0)
    conf = probs.max(axis=-1)
    return np.where(conf > threshold, f0, 0.0).astype(np.float32)


class FCPEInfer:
    """Wheel-free fcpe front-end: audio -> f0 on the 10 ms grid."""

    def __init__(self, variables):
        self.net = CFNaiveMelPE()
        self.variables = (
            variables if "params" in variables else {"params": variables}
        )
        self.mel = LogMelSpectrogram(
            sr=SAMPLE_RATE, n_mels=128, n_fft=1024, win_size=1024,
            hop_length=HOP, fmin=0.0, fmax=8000.0,
        )
        self._apply = jax.jit(partial(self.net.apply, self.variables))

    def infer_from_audio(
        self, audio: np.ndarray, sample_rate: int = SAMPLE_RATE,
        threshold: float = 0.006,
    ) -> np.ndarray:
        audio = jnp.asarray(audio, jnp.float32)[None, :]
        if sample_rate != SAMPLE_RATE:
            audio = resample(audio, sample_rate, SAMPLE_RATE)
        n_frames = audio.shape[1] // HOP + 1
        mel = jnp.swapaxes(self.mel(audio), 1, 2)  # (1, T, 128)
        if mel.shape[1] < n_frames:
            # edge-replicate the last frame (torchfcpe's wav2mel pad; a
            # zero pad would be log-mel amplitude 1.0 — a loud bogus frame)
            mel = jnp.pad(
                mel, ((0, 0), (0, n_frames - mel.shape[1]), (0, 0)),
                mode="edge",
            )
        mel = mel[:, :n_frames]
        probs = np.asarray(self._apply(mel)[0])
        return local_argmax_f0(probs, threshold=threshold)
