"""Linear time-varying FIR filtering in the frequency domain.

Reference behaviours matched (ddsp/core.py):
  - fft_convolve (:120-182): 50%-overlap Bartlett-windowed frames, rFFT,
    per-frame IR multiply, irFFT, overlap-add, group-delay crop.
  - apply_window_to_impulse_response (:185-237)
  - apply_dynamic_window_to_impulse_response (:240-251)
  - frequency_impulse_response (:254-270), frequency_filter (:273-280)

TPU notes: FFT sizes are always rounded up to a power of two (the reference
comment at ddsp/core.py:52 itself notes "TPU requires power of 2"). Because
the FFT size only needs to be >= frame + ir - 1 for linear convolution, the
pow-2 padding changes nothing numerically — the overlap-add output is
identical sample-for-sample after the delay-compensating crop.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .window import bartlett_window, hann_window
from .spectral import frame_signal, overlap_add


def get_fft_size(frame_size: int, ir_size: int) -> int:
    """Next power-of-two FFT size for linear convolution."""
    convolved = frame_size + ir_size - 1
    return int(2 ** np.ceil(np.log2(convolved)))


def fft_convolve(audio: jnp.ndarray, impulse_response: jnp.ndarray) -> jnp.ndarray:
    """Filter audio with frames of time-varying impulse responses.

    Args:
        audio: (B, L).
        impulse_response: (B, ir_size) for LTI or (B, n_ir_frames, ir_size)
            for LTV filtering; L must be divisible by n_ir_frames.

    Returns:
        (B, L) filtered audio (same-length, group delay compensated).
    """
    if impulse_response.ndim == 2:
        impulse_response = impulse_response[:, None, :]
    b_ir, n_ir_frames, ir_size = impulse_response.shape
    b, audio_size = audio.shape
    assert b == b_ir, "batch mismatch between audio and impulse response"

    hop = audio_size // n_ir_frames
    frame_size = 2 * hop
    padded = jnp.pad(audio, ((0, 0), (hop, hop)))
    frames = frame_signal(padded, frame_size, hop)  # (B, n_ir_frames+1, 2*hop)
    frames = frames * jnp.asarray(bartlett_window(frame_size), dtype=frames.dtype)

    fft_size = get_fft_size(frame_size, ir_size)
    audio_fft = jnp.fft.rfft(frames, fft_size, axis=-1)
    ir = jnp.concatenate([impulse_response, impulse_response[:, -1:, :]], axis=1)
    ir_fft = jnp.fft.rfft(ir, fft_size, axis=-1)

    out_frames = jnp.fft.irfft(audio_fft * ir_fft, fft_size, axis=-1)
    signal = overlap_add(out_frames, hop)

    # crop: drop the leading center-pad hop, compensate the linear-phase
    # group delay ir_size // 2, keep audio_size samples.
    start = hop + ir_size // 2
    return signal[:, start : start + audio_size]


def apply_window_to_impulse_response(
    impulse_response: jnp.ndarray, window_size: int = 0, causal: bool = False
) -> jnp.ndarray:
    """Hann-window an IR and put it in causal form (ddsp/core.py:185-237)."""
    if causal:
        impulse_response = jnp.fft.fftshift(impulse_response, axes=-1)

    ir_size = impulse_response.shape[-1]
    if window_size <= 0 or window_size > ir_size:
        window_size = ir_size
    window = jnp.asarray(hann_window(window_size), dtype=impulse_response.dtype)

    padding = ir_size - window_size
    if padding > 0:
        half_idx = (window_size + 1) // 2
        window = jnp.concatenate(
            [window[half_idx:], jnp.zeros(padding, dtype=window.dtype), window[:half_idx]]
        )
    else:
        window = jnp.roll(window, window.shape[-1] // 2)

    impulse_response = impulse_response * window

    if padding > 0:
        first_half_start = (ir_size - (half_idx - 1)) + 1
        second_half_end = half_idx + 1
        impulse_response = jnp.concatenate(
            [
                impulse_response[..., first_half_start:],
                impulse_response[..., :second_half_end],
            ],
            axis=-1,
        )
    else:
        impulse_response = jnp.roll(impulse_response, ir_size // 2, axis=-1)
    return impulse_response


def apply_dynamic_window_to_impulse_response(
    impulse_response: jnp.ndarray, half_width_frames: jnp.ndarray
) -> jnp.ndarray:
    """Per-frame variable-width raised-cosine window (ddsp/core.py:240-251).

    impulse_response: (B, n_frames, ir_size); half_width_frames: (B, n_frames, 1).
    """
    ir_size = impulse_response.shape[-1]
    pos = jnp.arange(-(ir_size // 2), (ir_size + 1) // 2, dtype=impulse_response.dtype)
    w = pos / half_width_frames  # (B, n_frames, ir_size)
    w = jnp.where(w > 1.0, 0.0, w)
    window = (1.0 + jnp.cos(np.pi * w)) / 2.0
    impulse_response = jnp.roll(impulse_response, ir_size // 2, axis=-1)
    return impulse_response * window


def frequency_impulse_response(
    magnitudes: jnp.ndarray,
    hann_window_flag: bool = True,
    half_width_frames: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Complex frequency response -> windowed time-domain IR (ddsp/core.py:254-270)."""
    impulse_response = jnp.fft.irfft(magnitudes, axis=-1)
    if hann_window_flag:
        if half_width_frames is None:
            impulse_response = apply_window_to_impulse_response(impulse_response)
        else:
            impulse_response = apply_dynamic_window_to_impulse_response(
                impulse_response, half_width_frames
            )
    else:
        impulse_response = jnp.roll(
            impulse_response, impulse_response.shape[-1] // 2, axis=-1
        )
    return impulse_response


def frequency_filter(
    audio: jnp.ndarray,
    magnitudes: jnp.ndarray,
    hann_window_flag: bool = True,
    half_width_frames: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """LTV filtering by a frame-wise complex frequency response (ddsp/core.py:273-280)."""
    impulse_response = frequency_impulse_response(
        magnitudes, hann_window_flag, half_width_frames
    )
    return fft_convolve(audio, impulse_response)
