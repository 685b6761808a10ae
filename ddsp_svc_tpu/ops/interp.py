"""Frame-rate <-> sample-rate interpolation and harmonic masking ops.

TPU-first reimplementation of the reference semantics:
  - upsample:           ddsp/core.py:66-70 (linear, edge-repeat, align_corners)
  - remove_above_fmax:  ddsp/core.py:73-77
  - masked_avg_pool_1d: ddsp/core.py:8-37   (NaN-masked average pooling)
  - median_pool_1d:     ddsp/core.py:39-45

The upsample avoids gathers entirely: with a static integer factor the
align_corners=True linear interpolation over the edge-padded grid reduces to
a broadcast lerp between each frame and its successor, which XLA fuses into
a single elementwise kernel.
"""
from __future__ import annotations

import jax.numpy as jnp


def upsample(signal: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Linear upsampling of frame-level signals to sample rate.

    Equivalent to the reference: append the last frame, linearly interpolate
    onto an (n*factor + 1)-point grid with align_corners=True, drop the last
    sample. On that grid output j sits at position j/factor, so
    ``out[j] = lerp(in[j // factor], in[j // factor + 1], (j % factor)/factor)``.

    Args:
        signal: (B, n_frames, C)
        factor: static integer upsampling factor (hop size)

    Returns:
        (B, n_frames * factor, C)
    """
    b, t, c = signal.shape
    cur = signal
    nxt = jnp.concatenate([signal[:, 1:], signal[:, -1:]], axis=1)
    w = (jnp.arange(factor, dtype=signal.dtype) / factor).reshape(1, 1, factor, 1)
    out = cur[:, :, None, :] * (1.0 - w) + nxt[:, :, None, :] * w
    return out.reshape(b, t * factor, c)


def remove_above_fmax(
    amplitudes: jnp.ndarray,
    pitch: jnp.ndarray,
    fmax: float,
    level_start: int = 1,
) -> jnp.ndarray:
    """Zero harmonic amplitudes whose frequency exceeds fmax (anti-aliasing).

    amplitudes: (B, n_frames, n_harm); pitch: (B, n_frames, 1).
    """
    n_harm = amplitudes.shape[-1]
    levels = jnp.arange(level_start, n_harm + level_start, dtype=pitch.dtype)
    pitches = pitch * levels
    aa = (pitches < fmax).astype(amplitudes.dtype) + 1e-7
    return amplitudes * aa


def masked_avg_pool_1d(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """NaN-masked average pooling over the last axis (stride 1, reflect pad).

    Used to smooth CREPE f0 tracks where unvoiced frames are NaN.
    x: (B, T) -> (B, T)
    """
    pad_l = (kernel_size - 1) // 2
    pad_r = kernel_size // 2
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r)), mode="reflect")
    mask = ~jnp.isnan(xp)
    vals = jnp.where(mask, xp, 0.0)
    # windowed sums via cumulative sums (stride-1 box filter)
    csum = jnp.cumsum(vals, axis=-1)
    csum = jnp.pad(csum, ((0, 0), (1, 0)))
    cmask = jnp.cumsum(mask.astype(x.dtype), axis=-1)
    cmask = jnp.pad(cmask, ((0, 0), (1, 0)))
    t = x.shape[-1]
    idx_hi = jnp.arange(t) + kernel_size
    idx_lo = jnp.arange(t)
    win_sum = csum[:, idx_hi] - csum[:, idx_lo]
    win_cnt = jnp.maximum(cmask[:, idx_hi] - cmask[:, idx_lo], 1.0)
    return win_sum / win_cnt


def median_pool_1d(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Median pooling over the last axis (stride 1, reflect pad). x: (B, T)."""
    pad_l = (kernel_size - 1) // 2
    pad_r = kernel_size // 2
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r)), mode="reflect")
    t = x.shape[-1]
    idx = jnp.arange(t)[:, None] + jnp.arange(kernel_size)[None, :]
    windows = xp[:, idx]  # (B, T, k)
    return jnp.sort(windows, axis=-1)[..., (kernel_size - 1) // 2]
