"""Excitation source generators (combtooth / sine bank) — f32-safe on TPU.

Reference behaviours matched:
  - CombSubSuperFast.fast_source_gen (ddsp/vocoder.py:639-651): per-frame
    linear f0 ramp, cross-frame phase continuity via wrapped cumsum carry,
    sinc combtooth.
  - Sins / CombSub exciter phase (ddsp/vocoder.py:566-575, 743-753): plain
    cumsum of instantaneous frequency. The reference upcasts to float64 at
    inference to survive long cumsums; TPUs have no fast f64, so we use the
    same wrapped per-frame carry trick fast_source_gen already uses — each
    frame's phase is accumulated locally in f32 and only the *wrapped*
    frame-boundary phase is carried, so precision never degrades with length.
  - NSF-HiFiGAN SineGen._f02sine (nsf_hifigan/models.py:134-148).

All functions are pure and jit-friendly (static block sizes, no data-
dependent control flow); the cross-frame carry is a cumsum over frames,
which XLA lowers to a log-depth associative scan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _wrap_half(x: jnp.ndarray) -> jnp.ndarray:
    """Wrap to [-0.5, 0.5) via fmod, matching torch.fmod semantics."""
    return jnp.fmod(x + 0.5, 1.0) - 0.5


PHASE_Q_BITS = 22  # phase carries quantized to 2^-22 cycles (~1e-4 cents)


def frame_phase_increments_q(
    f0_frames: jnp.ndarray, sampling_rate: int, block_size: int
) -> jnp.ndarray:
    """Per-frame wrapped end-of-frame phase increments, quantized to int32
    units of 2^-PHASE_Q_BITS cycles.

    Integer accumulation of these is exact and associative (int32 natural
    overflow preserves the residue mod 2^PHASE_Q_BITS since 2^22 | 2^32), so
    any blocking of the cumulative carry — per-device prefix sums in the
    streaming engine vs one whole-utterance cumsum — yields bit-identical
    phases. This replaces the reference's float64 cumsum
    (ddsp/vocoder.py:645-647) on TPUs, which have no fast f64.

    Returns q: (B, T, 1) int32.
    """
    n_last = jnp.asarray(block_size - 1, f0_frames.dtype)
    s0 = f0_frames / sampling_rate
    ds0 = jnp.pad(s0[:, 1:, :] - s0[:, :-1, :], ((0, 0), (0, 1), (0, 0)))
    rad_last = s0 * (n_last + 1.0) + 0.5 * ds0 * n_last * (n_last + 1.0) / block_size
    rad2 = _wrap_half(rad_last)
    return jnp.round(rad2 * (1 << PHASE_Q_BITS)).astype(jnp.int32)


def carry_from_increments_q(q: jnp.ndarray, carry_offset_q=None) -> jnp.ndarray:
    """Exclusive prefix of quantized increments -> float carry per frame.

    q: (B, T, 1) int32 -> (B, T, 1) float carry in cycles (mod 1).
    ``carry_offset_q``: optional (B, 1, 1) int32 carry of everything before
    this block (the streaming engines' cross-device prefix) — added in the
    exact integer domain before dequantization. THE single implementation
    of the carry idiom all sources share (hard streaming invariant)."""
    acc = jnp.cumsum(q, axis=1)  # int32, exact mod 2^32
    carry_q = jnp.pad(acc[:, :-1, :], ((0, 0), (1, 0), (0, 0)))
    if carry_offset_q is not None:
        carry_q = carry_q + carry_offset_q.astype(jnp.int32)
    return _dequantize_carry(carry_q, q.dtype)


def _dequantize_carry(carry_q: jnp.ndarray, _=None) -> jnp.ndarray:
    mask = (1 << PHASE_Q_BITS) - 1
    frac = jnp.bitwise_and(carry_q, mask)  # value mod 1 cycle, in [0, 2^22)
    return frac.astype(jnp.float32) / (1 << PHASE_Q_BITS)


def fast_source_gen(
    f0_frames: jnp.ndarray,
    sampling_rate: int,
    block_size: int,
    carry_offset_q: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Combtooth exciter with per-frame linear f0 ramps and phase continuity.

    Args:
        f0_frames: (B, T, 1) frame-level f0 in Hz.
        sampling_rate, block_size: static ints.
        carry_offset_q: optional (B, 1, 1) int32 quantized phase offset added
            to every frame's carry — the streaming engine passes the exact
            global prefix of the frames before this block.

    Returns:
        combtooth: (B, T * block_size)
        phase_frames: (B, T, 1) wrapped phase (radians) at each frame start.
    """
    n = jnp.arange(block_size, dtype=f0_frames.dtype)
    s0 = f0_frames / sampling_rate  # (B, T, 1) cycles/sample
    ds0 = jnp.pad(s0[:, 1:, :] - s0[:, :-1, :], ((0, 0), (0, 1), (0, 0)))
    # phase ramp within each frame (trapezoid integration of the linear ramp)
    rad = s0 * (n + 1.0) + 0.5 * ds0 * n * (n + 1.0) / block_size  # (B, T, block)
    s0_eff = s0 + ds0 * n / block_size
    # cross-frame carry: exact int-quantized accumulation (see
    # frame_phase_increments_q) — bit-identical under any blocking
    q = frame_phase_increments_q(f0_frames, sampling_rate, block_size)
    rad = rad + carry_from_increments_q(q, carry_offset_q)
    rad = rad - jnp.round(rad)
    combtooth = jnp.sinc(rad / (s0_eff + 1e-5))
    combtooth = combtooth.reshape(f0_frames.shape[0], -1)
    phase_frames = 2.0 * np.pi * rad[:, :, :1]
    return combtooth, phase_frames


def cumsum_increments_q(
    f0: jnp.ndarray, sampling_rate: int, block_size: int
) -> jnp.ndarray:
    """Per-frame wrapped phase increments of the sample-level cumsum source,
    int32-quantized (see frame_phase_increments_q). f0: (B, L, 1)."""
    b, l, _ = f0.shape
    t = l // block_size
    inc = (f0 / sampling_rate).reshape(b, t, block_size)
    frame_sum = _wrap_half(jnp.cumsum(inc, axis=-1)[..., -1:])
    return jnp.round(frame_sum * (1 << PHASE_Q_BITS)).astype(jnp.int32)


def cumsum_phase_source(
    f0: jnp.ndarray,
    sampling_rate: int,
    block_size: int,
    initial_phase: jnp.ndarray | None = None,
    carry_offset_q: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Wrapped normalized phase x(t) = frac(cumsum(f0/sr)), f32-safe.

    Matches the reference's float64 ``cumsum(f0/sr); x - round(x)``
    (ddsp/vocoder.py:743-751) without f64: the cumsum is computed per frame
    and only the wrapped frame-boundary value is carried across frames, as
    int32-quantized increments whose prefix sums are exactly associative
    (blocking-invariant — see frame_phase_increments_q).

    Args:
        f0: (B, L, 1) sample-level f0 (already upsampled); L % block_size == 0.
        initial_phase: optional (B, 1, 1) phase in radians.
        carry_offset_q: optional (B, 1, 1) int32 quantized carry prefix of
            the frames before this block (streaming).

    Returns:
        x: (B, L, 1) wrapped phase in cycles, in [-0.5, 0.5].
    """
    b, l, _ = f0.shape
    t = l // block_size
    inc = (f0 / sampling_rate).reshape(b, t, block_size)
    intra = jnp.cumsum(inc, axis=-1)  # phase within frame, from frame start
    q = cumsum_increments_q(f0, sampling_rate, block_size)
    x = intra + carry_from_increments_q(q, carry_offset_q)
    if initial_phase is not None:
        x = x + initial_phase.reshape(b, 1, 1) / (2.0 * np.pi)
    x = x - jnp.round(x)
    return x.reshape(b, l, 1)


def sine_increments_q(f0: jnp.ndarray, upp: int, sampling_rate: int) -> jnp.ndarray:
    """Per-frame wrapped end-of-frame phase increments of the NSF sine
    source, int32-quantized (see frame_phase_increments_q). f0: (B, T)."""
    rad_last = f0[..., None] / sampling_rate * upp
    return jnp.round(_wrap_half(rad_last) * (1 << PHASE_Q_BITS)).astype(jnp.int32)


def sine_gen(
    f0: jnp.ndarray,
    upp: int,
    sampling_rate: int,
    n_harmonics: int,
    key: jax.Array | None = None,
    sine_amp: float = 0.1,
    noise_std: float = 0.003,
    voiced_threshold: float = 0.0,
    rand_ini: jnp.ndarray | None = None,
    noise: jnp.ndarray | None = None,
    carry_offset_q: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """NSF sine-bank excitation (nsf_hifigan/models.py:101-165).

    Args:
        f0: (B, T) frame-level f0 in Hz.
        upp: upsample factor (product of the generator's upsample rates).
        n_harmonics: number of overtones; output dim is n_harmonics + 1.
        key: PRNG key for the random initial phases and the additive noise
            (unused when rand_ini and noise are given).
        rand_ini / noise / carry_offset_q: streaming hooks — precomputed
            per-harmonic initial phases (1,1,dim), per-sample noise
            (B, T*upp, dim), and the exact int32 phase-carry prefix (B,1,1)
            of the frames before this block.

    Returns:
        sine_waves: (B, T * upp, n_harmonics + 1)
    """
    b, t = f0.shape
    dim = n_harmonics + 1
    f0 = f0[..., None]  # (B, T, 1)
    pos = jnp.arange(1, upp + 1, dtype=f0.dtype)
    rad = f0 / sampling_rate * pos  # (B, T, upp)
    # cross-frame carry: exact int32 accumulation (blocking-invariant)
    q = sine_increments_q(f0[..., 0], upp, sampling_rate)
    rad = rad + carry_from_increments_q(q, carry_offset_q)
    rad = rad.reshape(b, t * upp, 1)
    rad = rad * jnp.arange(1, dim + 1, dtype=f0.dtype).reshape(1, 1, dim)
    if rand_ini is None or noise is None:
        if key is None:
            raise ValueError(
                "sine_gen: key is required when rand_ini or noise is not "
                "provided (partial sine_kwargs without an rng)"
            )
        key_ini, key_noise = jax.random.split(key)
    if rand_ini is None:
        rand_ini = jax.random.uniform(key_ini, (1, 1, dim), dtype=f0.dtype)
        rand_ini = rand_ini.at[..., 0].set(0.0)
    rad = rad + rand_ini
    sines = jnp.sin(2.0 * np.pi * rad) * sine_amp

    uv = (f0 > voiced_threshold).astype(f0.dtype)  # (B, T, 1)
    uv = jnp.repeat(uv, upp, axis=1)  # nearest upsample to (B, T*upp, 1)
    noise_amp = uv * noise_std + (1.0 - uv) * sine_amp / 3.0
    if noise is None:
        noise = jax.random.normal(key_noise, sines.shape, dtype=f0.dtype)
    return sines * uv + noise_amp * noise
