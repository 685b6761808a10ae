"""Pallas TPU kernel: fused combtooth source generation.

The exciter (ops/source.fast_source_gen) is the hot memory-bound op of the
flagship synthesizer: per output sample it needs a phase ramp, a wrap, and a
sinc — O(B*T*block) elementwise work fed by only 3 scalars per frame
(s0, ds0, carry). XLA emits this as several elementwise HLOs over the full
(B, T*block) buffer; the Pallas kernel fuses ramp + wrap + sinc into one
VMEM pass so HBM traffic is one write of the output plus a negligible read
of the per-frame scalars — speed-of-light for this op (SURVEY.md §7).

The exact int32 carry prefix (ops/source.frame_phase_increments_q) stays
outside the kernel: it is O(B*T) and already exact/associative; the kernel
consumes the dequantized float carry per frame.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .source import carry_from_increments_q, frame_phase_increments_q

ROWS = 8  # frames per kernel instance (f32 sublane tile)


def _comb_kernel(block_size: int, s0_ref, ds0_ref, carry_ref, out_ref):
    """One tile: (ROWS, 1) frame scalars -> (ROWS, block_size) samples."""
    # Mosaic requires integer iota ('tpu.iota' result must be int); cast
    n = jax.lax.broadcasted_iota(
        jnp.int32, (ROWS, block_size), 1
    ).astype(jnp.float32)
    s0 = s0_ref[:]  # (ROWS, 1)
    ds0 = ds0_ref[:]
    carry = carry_ref[:]
    rad = s0 * (n + 1.0) + 0.5 * ds0 * n * (n + 1.0) / block_size + carry
    rad = rad - jnp.round(rad)
    s0_eff = s0 + ds0 * n / block_size
    x = rad / (s0_eff + 1e-5)
    # sinc(x) = sin(pi x) / (pi x), sinc(0) = 1
    px = np.pi * x
    out_ref[:] = jnp.where(jnp.abs(px) < 1e-7, 1.0, jnp.sin(px) / jnp.where(px == 0, 1.0, px))


def combtooth_pallas(
    f0_frames: jnp.ndarray,
    sampling_rate: int,
    block_size: int,
    carry_offset_q: jnp.ndarray | None = None,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in fast path for ops/source.fast_source_gen.

    Returns (combtooth (B, T*block), phase_frames (B, T, 1)).
    """
    b, t, _ = f0_frames.shape
    s0 = (f0_frames / sampling_rate).astype(jnp.float32)
    ds0 = jnp.pad(s0[:, 1:, :] - s0[:, :-1, :], ((0, 0), (0, 1), (0, 0)))

    q = frame_phase_increments_q(f0_frames, sampling_rate, block_size)
    carry = carry_from_increments_q(q, carry_offset_q)

    n_rows = b * t
    pad_rows = (-n_rows) % ROWS
    def flat(x):
        x = x.reshape(n_rows, 1)
        return jnp.pad(x, ((0, pad_rows), (0, 0)))

    grid = (n_rows + pad_rows) // ROWS
    spec_in = pl.BlockSpec((ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_comb_kernel, block_size),
        out_shape=jax.ShapeDtypeStruct((n_rows + pad_rows, block_size), jnp.float32),
        grid=(grid,),
        in_specs=[spec_in, spec_in, spec_in],
        out_specs=pl.BlockSpec(
            (ROWS, block_size), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(flat(s0), flat(ds0), flat(carry))
    combtooth = out[:n_rows].reshape(b, t * block_size)

    # wrapped start-of-frame phase (matches fast_source_gen's phase_frames)
    rad_first = s0 + carry
    rad_first = rad_first - jnp.round(rad_first)
    phase_frames = 2.0 * np.pi * rad_first
    return combtooth, phase_frames
