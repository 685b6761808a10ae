"""CREPE pitch estimator — JAX/flax port of torchcrepe's 'full' model.

The reference uses torchcrepe.predict at 16 kHz, hop 80 (5 ms), model
'full', with median-pooled periodicity thresholding at 0.05 and
masked-average f0 smoothing (ddsp/vocoder.py:92-105).

Architecture (torchcrepe.model.Crepe, 'full' capacity):
  6 blocks of [Conv2d over the 1024-sample frame, BatchNorm, ReLU,
  MaxPool(2,1)] with channels (1024,128,128,128,256,512), kernel 512 then
  64, stride 4 then 1; flatten -> Linear(2048, 360) -> sigmoid.
Frames are 1024 samples, per-frame mean/std normalized; decode is the
weighted-average-cents around the argmax (same 20c bins + 1997.3794 offset
as RMVPE).

Weights convert from the torchcrepe .pth via convert/crepe.py; a random
init still runs for shape/pipeline tests.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resample import resample

SAMPLE_RATE = 16000
WINDOW_SIZE = 1024
N_BINS = 360
CENTS_OFFSET = 1997.3794084376191

FULL_CHANNELS = (1024, 128, 128, 128, 256, 512)


class Crepe(nn.Module):
    """frames (B, 1024) normalized -> salience (B, 360)."""

    @nn.compact
    def __call__(self, frames):
        x = frames[:, :, None, None]  # (B, 1024, 1, 1) NHWC
        for i, ch in enumerate(FULL_CHANNELS):
            k, s = (512, 4) if i == 0 else (64, 1)
            pad = (254, 254) if i == 0 else (31, 32)
            x = nn.Conv(
                ch, (k, 1), strides=(s, 1), padding=(pad, (0, 0)),
                name=f"conv{i + 1}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=True, momentum=0.99, epsilon=1e-5,
                name=f"bn{i + 1}",
            )(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 1), strides=(2, 1))
        # torch flattens (B, C, H, 1) channel-major -> (B, H*C) after permute
        # (torchcrepe: x.permute(0, 2, 1, 3).reshape(B, -1))
        b = x.shape[0]
        x = x.transpose(0, 1, 3, 2).reshape(b, -1)  # (B, H*C) H-major
        x = nn.Dense(N_BINS, name="classifier")(x)
        return nn.sigmoid(x)


def weighted_argmax_f0(
    salience: np.ndarray,
    fmin: float | None = None,
    fmax: float | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(T, 360) -> (f0 Hz, periodicity) via local weighted average cents
    (torchcrepe.decode.weighted_argmax equivalent). fmin/fmax zero the
    out-of-range bins BEFORE decoding, as torchcrepe.predict does — without
    the pre-mask an out-of-range argmax (octave error / rumble) decodes to
    an out-of-range f0 that survives the periodicity gate."""
    idx = np.arange(N_BINS)[None, :]
    cents = idx * 20 + CENTS_OFFSET
    if fmin is not None or fmax is not None:
        freq = 10.0 * 2.0 ** (cents / 1200.0)
        keep = np.ones(N_BINS, bool)[None, :]
        if fmin is not None:
            keep &= freq >= fmin
        if fmax is not None:
            keep &= freq <= fmax
        salience = np.where(keep, salience, 0.0)
    center = salience.argmax(axis=1, keepdims=True)
    start = np.clip(center - 4, 0, None)
    end = np.clip(center + 5, None, N_BINS)
    mask = (idx >= start) & (idx < end)
    w = salience * mask
    c = (w * cents).sum(axis=1) / np.maximum(w.sum(axis=1), 1e-9)
    f0 = 10.0 * 2.0 ** (c / 1200.0)
    periodicity = salience.max(axis=1)
    return f0.astype(np.float32), periodicity.astype(np.float32)


class CrepeInfer:
    def __init__(self, params=None, hop_length: int = 80):
        self.model = Crepe()
        self.hop_length = hop_length
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, WINDOW_SIZE))
            )
        self.variables = params
        self._apply = jax.jit(lambda v, x: self.model.apply(v, x))

    def infer_from_audio(
        self, audio: np.ndarray, sample_rate: int = 16000,
        fmin: float | None = None, fmax: float | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """1-D audio -> (f0, periodicity) on the 5 ms grid (centered frames,
        torchcrepe pad=True)."""
        audio_j = jnp.asarray(audio, jnp.float32)[None, :]
        if sample_rate != SAMPLE_RATE:
            audio_j = resample(audio_j, sample_rate, SAMPLE_RATE)
        a = np.asarray(audio_j)[0]
        n_frames = len(a) // self.hop_length + 1
        padded = np.pad(a, (WINDOW_SIZE // 2, WINDOW_SIZE // 2))
        idx = (
            np.arange(n_frames)[:, None] * self.hop_length
            + np.arange(WINDOW_SIZE)[None, :]
        )
        idx = np.minimum(idx, len(padded) - 1)
        frames = padded[idx]
        # per-frame normalization (torchcrepe.core.preprocess)
        frames = frames - frames.mean(axis=1, keepdims=True)
        frames = frames / np.maximum(frames.std(axis=1, keepdims=True), 1e-10)
        salience = np.asarray(self._apply(self.variables, jnp.asarray(frames)))
        return weighted_argmax_f0(salience, fmin=fmin, fmax=fmax)
