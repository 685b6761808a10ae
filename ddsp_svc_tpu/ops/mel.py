"""Log-mel front-end matching the NSF-HiFiGAN feature extractor.

Reference behaviours matched (nsf_hifigan/nvSTFT.py:59-117):
  - librosa slaney-scale mel filterbank (htk=False, norm='slaney'),
    reimplemented here so no librosa dependency is needed at runtime;
  - keyshift-scaled n_fft/win_size, manual reflect/constant padding,
    center=False STFT, magnitude with 1e-9 floor, keyshift spectrum
    resize + rescale, log dynamic-range compression with 1e-5 clip.

The mel basis is precomputed host-side (numpy) and the projection is a
single (freq x mel) matmul — MXU-friendly.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .window import hann_window
from .spectral import frame_signal


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):  # f=0 (fmin=0) takes the linear branch
        return np.where(
            f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, f / f_sp
        )


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f_sp * m)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float,
    fmax: float,
    htk: bool = False,
    dtype=np.float32,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, librosa-compatible.

    ``htk=True`` switches to the HTK mel scale (librosa ``htk=True``), used
    by the RMVPE front-end (encoder/rmvpe/spec.py:20-27).
    Returns (n_mels, n_fft//2 + 1).
    """
    to_mel = _hz_to_mel_htk if htk else _hz_to_mel_slaney
    to_hz = _mel_to_hz_htk if htk else _mel_to_hz_slaney
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_min = to_mel(fmin)
    mel_max = to_mel(fmax)
    mel_f = to_hz(np.linspace(mel_min, mel_max, n_mels + 2))

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(dtype)


class LogMelSpectrogram:
    """nvSTFT.get_mel-compatible log-mel extractor.

    Stateless w.r.t. jit: all shape-determining inputs (keyshift, speed) are
    Python scalars, so each (keyshift, speed) pair compiles once.
    """

    def __init__(
        self,
        sr: int = 44100,
        n_mels: int = 128,
        n_fft: int = 2048,
        win_size: int = 2048,
        hop_length: int = 512,
        fmin: float = 40.0,
        fmax: float = 16000.0,
        clip_val: float = 1e-5,
    ):
        self.sr = sr
        self.n_mels = n_mels
        self.n_fft = n_fft
        self.win_size = win_size
        self.hop_length = hop_length
        self.fmin = fmin
        self.fmax = fmax
        self.clip_val = clip_val
        self.mel_basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))

    def cache_key(self) -> tuple:
        """Hashable identity for jit-executable caches (parallel/stream.py):
        every value that changes the compiled computation."""
        return (self.sr, self.n_mels, self.n_fft, self.win_size,
                self.hop_length, self.fmin, self.fmax, self.clip_val)

    def __call__(
        self, y: jnp.ndarray, keyshift: float = 0.0, speed: float = 1.0
    ) -> jnp.ndarray:
        """audio (B, L) -> log-mel (B, n_mels, n_frames)."""
        factor = 2.0 ** (keyshift / 12.0)
        n_fft_new = int(np.round(self.n_fft * factor))
        win_size_new = int(np.round(self.win_size * factor))
        hop_new = int(np.round(self.hop_length * speed))

        pad_left = (win_size_new - hop_new) // 2
        pad_right = max((win_size_new - hop_new + 1) // 2, win_size_new - y.shape[-1] - pad_left)
        mode = "reflect" if pad_right < y.shape[-1] else "constant"
        y = jnp.pad(y, ((0, 0), (pad_left, pad_right)), mode=mode)

        window = jnp.asarray(hann_window(win_size_new))
        if win_size_new < n_fft_new:
            lpad = (n_fft_new - win_size_new) // 2
            window = jnp.pad(window, (lpad, n_fft_new - win_size_new - lpad))
        frames = frame_signal(y, n_fft_new, hop_new) * window
        spec = jnp.fft.rfft(frames, n_fft_new, axis=-1)  # (B, n_frames, F)
        mag = jnp.sqrt(spec.real**2 + spec.imag**2 + 1e-9)
        mag = mag.transpose(0, 2, 1)  # (B, F, n_frames)

        if keyshift != 0.0:
            size = self.n_fft // 2 + 1
            resize = mag.shape[1]
            if resize < size:
                mag = jnp.pad(mag, ((0, 0), (0, size - resize), (0, 0)))
            mag = mag[:, :size, :] * (self.win_size / win_size_new)

        mel = jnp.matmul(self.mel_basis, mag)
        return jnp.log(jnp.clip(mel, min=self.clip_val))

    def extract(self, audio: jnp.ndarray, keyshift: float = 0.0) -> jnp.ndarray:
        """Vocoder.extract layout: audio (B, L) -> mel (B, n_frames, n_mels)."""
        return self(audio, keyshift=keyshift).transpose(0, 2, 1)
