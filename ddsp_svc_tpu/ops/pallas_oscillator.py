"""Pallas TPU kernel: fused harmonic sine-bank oscillator (Sins exciter).

The Sins additive synthesizer evaluates sum_k sin(phase * k) * amp_k per
output sample (ddsp/vocoder.py:589-594). The XLA path materializes the
(B, L, chunk) phase/sine/amplitude intermediates in HBM per 32-harmonic
chunk; this kernel keeps everything in VMEM — per tile it reads the phase
row, the two bounding amplitude frames (for the linear upsample), computes
the k-scaled sines and the interpolated amplitudes in registers, and writes
only the (ROWS, block) accumulated waveform. HBM traffic drops from
O(L * n_harm) to O(L + T * n_harm).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8  # frames per kernel instance


def _bank_kernel(block_size: int, n_harm: int, x_ref, amp0_ref, amp1_ref, out_ref):
    """One tile: phase x (ROWS, block), amps (ROWS, n_harm) at frame t and
    t+1 -> summed sinusoids (ROWS, block)."""
    x = x_ref[:]  # wrapped phase in cycles
    w = (
        jax.lax.broadcasted_iota(  # Mosaic: iota must be integer; cast
            jnp.int32, (ROWS, block_size), 1
        ).astype(jnp.float32) / block_size
    )  # upsample weight within frame
    acc = jnp.zeros((ROWS, block_size), jnp.float32)
    for k in range(n_harm):
        amp = amp0_ref[:, k : k + 1] * (1.0 - w) + amp1_ref[:, k : k + 1] * w
        acc = acc + jnp.sin((2.0 * np.pi * (k + 1)) * x) * amp
    out_ref[:] = acc


def harmonic_bank_pallas(
    x: jnp.ndarray,  # (B, L, 1) wrapped phase in cycles (cumsum_phase_source)
    amplitudes_frames: jnp.ndarray,  # (B, T, n_harm)
    block_size: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in fast path for models/ddsp.sins_harmonic_bank given the
    wrapped phase (phase_radians = 2*pi*x). Returns (B, L)."""
    b, t, n_harm = amplitudes_frames.shape
    l = x.shape[1]
    assert l == t * block_size
    xf = x[..., 0].reshape(b * t, block_size)
    amp0 = amplitudes_frames.reshape(b * t, n_harm)
    # next frame's amplitudes (edge-repeat per batch row, ops/interp.upsample)
    amp1 = jnp.concatenate(
        [amplitudes_frames[:, 1:], amplitudes_frames[:, -1:]], axis=1
    ).reshape(b * t, n_harm)

    n_rows = b * t
    pad_rows = (-n_rows) % ROWS

    def padr(a):
        return jnp.pad(a, ((0, pad_rows), (0, 0)))

    grid = (n_rows + pad_rows) // ROWS
    out = pl.pallas_call(
        partial(_bank_kernel, block_size, n_harm),
        out_shape=jax.ShapeDtypeStruct((n_rows + pad_rows, block_size), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((ROWS, block_size), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, n_harm), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, n_harm), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ROWS, block_size), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(padr(xf), padr(amp0), padr(amp1))
    return out[:n_rows].reshape(b, l)
