"""Polyphase windowed-sinc resampling, torchaudio.transforms.Resample-compatible.

The reference resamples with torchaudio Resample(lowpass_filter_width=128)
everywhere audio crosses sample-rate domains (ddsp/vocoder.py:211-214,
diffusion/vocoder.py:104-107, enhancer.py:52-58). We reproduce the
'sinc_interp_hann' kernel exactly so unit alignment and mel parity hold.

The kernel is precomputed host-side per (orig_freq, new_freq) pair; the
resample itself is one grouped conv with stride = orig (polyphase), which
XLA maps onto the MXU.
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _sinc_resample_kernel(
    orig_freq: int, new_freq: int, lowpass_filter_width: int = 128, rolloff: float = 0.99
):
    """Build the torchaudio polyphase kernel. Returns (kernels, width, orig, new).

    kernels: (new, 1, kernel_len) float32 — one filter phase per output slot.
    """
    gcd = math.gcd(int(orig_freq), int(new_freq))
    orig = int(orig_freq) // gcd
    new = int(new_freq) // gcd

    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)

    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    t = (-np.arange(new, dtype=np.float64)[:, None] / new + idx) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t = t * np.pi
    kernels = np.where(t == 0.0, 1.0, np.sin(t) / np.where(t == 0.0, 1.0, t))
    kernels *= window * base_freq / orig
    return kernels.astype(np.float32)[:, None, :], width, orig, new


def resample(
    waveform: jnp.ndarray,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 128,
    rolloff: float = 0.99,
) -> jnp.ndarray:
    """Resample (B, L) audio from orig_freq to new_freq.

    Matches torchaudio's sinc_interp_hann output including edge handling and
    the ceil(new * L / orig) target length.
    """
    if orig_freq == new_freq:
        return waveform
    kernels, width, orig, new = _sinc_resample_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff
    )
    b, length = waveform.shape
    x = jnp.pad(waveform, ((0, 0), (width, width + orig)))[:, None, :]  # (B,1,Lp)
    # conv with stride=orig: output (B, new, ceil-ish length)
    y = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(kernels),  # (new, 1, K)
        window_strides=(orig,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (B, new, L//orig + 1)
    y = y.transpose(0, 2, 1).reshape(b, -1)
    target_length = int(math.ceil(new * length / orig))
    return y[:, :target_length]
