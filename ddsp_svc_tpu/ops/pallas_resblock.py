"""Pallas TPU kernel: fused NSF-HiFiGAN resblock group.

Reference behavior: /root/reference/nsf_hifigan/models.py:37-68 (ResBlock1
chains) and the per-stage ``xs = sum_j resblock_j(x); x = xs / n`` loop at
models.py:245-259.

Why a kernel: each upsample stage of the generator runs 3 ResBlock1 chains
(= 18 'same' convolutions plus leaky_relus and residual adds) over the full
sample-rate activation. XLA lowers every conv as its own HBM
read->compute->write pass, so a stage moves ~40x the activation bytes —
this is why the vocoder sat at ~45 % of its memory roofline (PERF.md). The
kernel keeps a time tile of the activation in VMEM, runs all 18 convs (as
banded lane-packed matmuls on the MXU) and the elementwise chain there, and
writes the stage output once: HBM traffic drops from ~40 passes to
2 reads + 1 write.

Lane packing: stages with channels C < 128 reshape time into lanes,
(L, C) -> (L/p, p*C) with p = 128 // C, and each 'same' conv becomes a
small banded block-Toeplitz matmul in super-row space — contraction and
output dims are then always >= 128, so the matmuls actually tile onto the
MXU (a (len, 16) @ (16, 16) matmul would run the MXU at ~1.5 % utilization).
The band matrices spread a k-tap kernel over ceil extra super-taps, a
3-5x FLOP inflation — a good trade: the op leaves the memory roofline at
~45 % utilization and lands on the MXU at <3 % of its f32 ceiling.

Halo handling: a block needs left+right context rows; Pallas BlockSpecs
cannot express overlapping reads, so the padded input is passed twice with
index maps i and i+1 and the kernel concatenates — Mosaic still
double-buffers the loads, and the second read of x is ~5 % of the traffic
the kernel removes.

Zero-padding parity: torch pads each conv input with zeros on the *full
utterance*. The VALID-chain emulates this exactly by masking rows outside
the utterance to zero before every conv (after the leaky_relu), so edge
outputs match the reference formulation — not just in the interior.

Training: ``fused_resblock_group`` carries a custom VJP, so the kernel is
usable under ``jax.grad`` (the vocoder GAN trainer) — the forward runs the
Pallas kernel; the backward differentiates an equivalent pure-jnp chain
(identical math; XLA convs). Gradients w.r.t. the weight-norm parameters
flow through the fold outside this op, which takes folded kernels.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1
_VMEM_WEIGHT_BUDGET = 6 * 1024 * 1024  # split per-resblock above this


def _leaky(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


# ---------------------------------------------------------------------------
# Geometry: 'same' sample-space conv -> banded VALID matmul in super space
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class _ConvGeom:
    offsets: tuple[int, ...]  # z-relative row offsets (o - s_min), ascending
    shrink: int               # rows lost by the VALID form (s_max - s_min)
    lead: int                 # left trim: output global row = g + lead
    w0: int                   # first tap index into the stacked weight array
    bidx: int                 # bias row index


def _band_placement(k: int, dilation: int, p: int):
    """Map sample-space taps to super-space bands.

    y[t] = sum_tau x[t + tau*d - p1] w[tau]  with p1 = (k-1)*d//2 ('same').
    Super row u packs samples [u*p, u*p + p); output phase j at tap tau reads
    input super row u + s, phase r, where  j + tau*d - p1 = s*p + r.
    Returns (sorted band offsets s, {s: [(r, j, tau), ...]}).
    """
    p1 = (k - 1) * dilation // 2
    bands: dict[int, list[tuple[int, int, int]]] = {}
    for j in range(p):
        for tau in range(k):
            t = j + tau * dilation - p1
            s = t // p
            r = t - s * p
            bands.setdefault(s, []).append((r, j, tau))
    return sorted(bands), bands


def _band_weights(w: jnp.ndarray, dilation: int, p: int, dtype) -> jnp.ndarray:
    """w: (k, C_in, C_out) HIO -> stacked band matrices (S, p*C_in, p*C_out)."""
    k, cin, cout = w.shape
    offsets, bands = _band_placement(k, dilation, p)
    if p == 1:
        mats = [w[tau] for s in offsets for (_, _, tau) in bands[s]]
        return jnp.stack(mats).astype(dtype)
    out = jnp.zeros((len(offsets), p * cin, p * cout), dtype=w.dtype)
    for i, s in enumerate(offsets):
        for r, j, tau in bands[s]:
            out = out.at[
                i, r * cin : (r + 1) * cin, j * cout : (j + 1) * cout
            ].set(w[tau])
    return out.astype(dtype)


@dataclass(frozen=True)
class _RBGeom:
    convs: tuple[_ConvGeom, ...]  # chain order: (c1_d0, c2_0, c1_d1, c2_1, ...)
    lead_total: int
    shrink_total: int


@dataclass(frozen=True)
class _GroupGeom:
    rbs: tuple[_RBGeom, ...]
    bl: int          # output super rows per block
    h_l: int         # left halo rows
    h_r: int         # right halo rows
    ls: int          # utterance super rows
    pc: int          # packed channels
    mean: bool       # divide the sum by len(rbs)
    n_rb_total: int  # divisor for the mean (the full group size)
    out_dtype: object


def _chain_geom(kernel_sizes, dilations, p, tap_counter, bias_counter):
    """Geometry for one group of resblocks; mutates the shared counters."""
    rbs = []
    for k, dils in zip(kernel_sizes, dilations):
        convs = []
        for d in dils:
            for dd in (d, 1):  # convs1_i (dilated) then convs2_i (d=1)
                offs, _ = _band_placement(k, dd, p)
                geom = _ConvGeom(
                    offsets=tuple(o - offs[0] for o in offs),
                    shrink=offs[-1] - offs[0],
                    lead=-offs[0],
                    w0=tap_counter[0],
                    bidx=bias_counter[0],
                )
                tap_counter[0] += len(offs)
                bias_counter[0] += 1
                convs.append(geom)
        rbs.append(
            _RBGeom(
                convs=tuple(convs),
                lead_total=sum(c.lead for c in convs),
                shrink_total=sum(c.shrink for c in convs),
            )
        )
    return tuple(rbs)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _rb_group_kernel(geom: _GroupGeom, x_ref, xn_ref, w_ref, b_ref, o_ref):
    h = geom.h_l + geom.h_r
    # elementwise chain in f32 (Mosaic lacks bf16 cmpf for the leaky_relu);
    # matmul inputs cast to the weight dtype so the MXU runs bf16 when the
    # stage does. HBM traffic stays in the activation dtype either way.
    z0 = jnp.concatenate([x_ref[0], xn_ref[0]], axis=0)[: geom.bl + h]
    z0 = z0.astype(jnp.float32)
    blk = pl.program_id(1)

    # Row-validity vector, built ONCE per block (r4): the per-conv mask
    # used to be a fresh iota + 2 compares + select over the full tile —
    # ~5 VPU sweeps per conv × 18 convs that serialize against the MXU
    # chain. One precomputed {0,1} column reduces each conv's mask to a
    # single broadcast multiply.
    rows = jax.lax.broadcasted_iota(jnp.int32, (geom.bl + h, 1), 0)
    rows = rows + (blk * geom.bl - geom.h_l)
    valid = jnp.where(
        (rows >= 0) & (rows < geom.ls),
        jnp.ones((geom.bl + h, 1), jnp.float32),
        jnp.zeros((geom.bl + h, 1), jnp.float32),
    )

    def lm(t, g):
        # leaky_relu as maximum (slope < 1 ⇒ max(x, 0.1x) == leaky(x)):
        # 2 VPU ops instead of compare+mul+select, then the utterance
        # zero-pad mask as one multiply (torch pads each conv input with
        # zeros on the full utterance; rows outside [0, ls) go to 0).
        t = jnp.maximum(t, LRELU_SLOPE * t)
        return t * jax.lax.slice_in_dim(valid, g, g + t.shape[0])

    def conv(tc, g, c: _ConvGeom):
        # tc: pre-cast (weight-dtype) masked activation
        n_out = tc.shape[0] - c.shrink
        acc = jnp.broadcast_to(
            b_ref[c.bidx][None, :].astype(jnp.float32), (n_out, geom.pc)
        )
        for ti, off in enumerate(c.offsets):
            acc = acc + jax.lax.dot_general(
                tc[off : off + n_out],
                w_ref[c.w0 + ti],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc, g + c.lead

    # the first conv of EVERY resblock consumes the same lm(z0, 0) — hoist
    # it (and its weight-dtype cast, which is per-conv-not-per-band here:
    # casting inside the band loop re-swept the tile S times)
    z0c = lm(z0, 0).astype(w_ref.dtype)
    total = None
    for rb in geom.rbs:
        z, g = z0, 0
        for pair in range(len(rb.convs) // 2):
            x_res, g_res = z, g
            t = z
            for ci in (0, 1):
                tc = z0c if (pair == 0 and ci == 0) else (
                    lm(t, g).astype(w_ref.dtype))
                t, g = conv(tc, g, rb.convs[pair * 2 + ci])
            z = t + jax.lax.slice_in_dim(x_res, g - g_res, g - g_res + t.shape[0])
        start = geom.h_l - rb.lead_total
        crop = jax.lax.slice_in_dim(z, start, start + geom.bl)
        total = crop if total is None else total + crop
    if geom.mean:
        total = total / float(geom.n_rb_total)
    o_ref[0] = total.astype(geom.out_dtype)


def _run_group(
    x_super: jnp.ndarray,  # (B, Ls_padded_to_(nb+1)*BL, PC) -- caller pads
    ls: int,
    rb_weights,            # list per RB of list of 6 (kernel (k,C,C), bias (C,))
    kernel_sizes,
    dilations,
    p: int,
    bl: int,
    h_l: int,
    h_r: int,
    mean: bool,
    n_rb_total: int,
    weight_dtype,
    interpret: bool,
):
    b, lpad, pc = x_super.shape
    nb = lpad // bl - 1
    tap_counter, bias_counter = [0], [0]
    rbs = _chain_geom(kernel_sizes, dilations, p, tap_counter, bias_counter)
    geom = _GroupGeom(
        rbs=rbs, bl=bl, h_l=h_l, h_r=h_r, ls=ls, pc=pc,
        mean=mean, n_rb_total=n_rb_total, out_dtype=x_super.dtype,
    )
    w_parts, b_parts = [], []
    for (k, dils), rbw in zip(zip(kernel_sizes, dilations), rb_weights):
        ci = 0
        for d in dils:
            for dd in (d, 1):
                w, bias = rbw[ci]
                w_parts.append(_band_weights(w, dd, p, weight_dtype))
                b_parts.append(jnp.tile(bias.astype(jnp.float32), p))
                ci += 1
    w_all = jnp.concatenate(w_parts, axis=0)
    b_all = jnp.stack(b_parts, axis=0)

    spec_x = pl.BlockSpec((1, bl, pc), lambda bi, i: (bi, i, 0),
                          memory_space=pltpu.VMEM)
    spec_xn = pl.BlockSpec((1, bl, pc), lambda bi, i: (bi, i + 1, 0),
                           memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec(w_all.shape, lambda bi, i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec(b_all.shape, lambda bi, i: (0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_rb_group_kernel, geom),
        out_shape=jax.ShapeDtypeStruct((b, nb * bl, pc), x_super.dtype),
        grid=(b, nb),
        in_specs=[spec_x, spec_xn, spec_w, spec_b],
        out_specs=pl.BlockSpec((1, bl, pc), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_super, x_super, w_all, b_all)
    return out[:, :ls]


def _stock_group(x, rb_weights, kernel_sizes, dilations):
    """Pure-jnp reference of the fused op (the ResBlock1 chain math) — the
    differentiation target for the custom VJP."""
    total = None
    for (k, dils), rbw in zip(zip(kernel_sizes, dilations), rb_weights):
        z = x
        ci = 0
        for d in dils:
            t = z
            for dd in (d, 1):
                w, b = rbw[ci]
                ci += 1
                pad = (k - 1) * dd // 2
                t = _leaky(t)
                t = jax.lax.conv_general_dilated(
                    t, w, window_strides=(1,), padding=[(pad, pad)],
                    rhs_dilation=(dd,),
                    dimension_numbers=("NHC", "HIO", "NHC"),
                ) + b
            z = t + z
        total = z if total is None else total + z
    return total / float(len(rb_weights))


def fused_resblock_group(
    x: jnp.ndarray,
    rb_weights,
    kernel_sizes,
    dilations,
    *,
    block_rows: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable entry point: Pallas forward + jnp-chain backward."""
    ks = tuple(kernel_sizes)
    ds = tuple(tuple(d) for d in dilations)
    flat = tuple(tuple((w, b) for w, b in rbw) for rbw in rb_weights)
    return _fused_group_vjp(
        x, flat, ks, ds, block_rows, bool(interpret)
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _fused_group_vjp(x, rb_weights, kernel_sizes, dilations, block_rows,
                     interpret):
    return _fused_group_impl(x, rb_weights, kernel_sizes, dilations,
                             block_rows, interpret)


def _fused_group_fwd(x, rb_weights, kernel_sizes, dilations, block_rows,
                     interpret):
    out = _fused_group_impl(x, rb_weights, kernel_sizes, dilations,
                            block_rows, interpret)
    return out, (x, rb_weights)


def _fused_group_bwd(kernel_sizes, dilations, block_rows, interpret,
                     residuals, g):
    x, rb_weights = residuals
    _, vjp = jax.vjp(
        lambda xx, ww: _stock_group(xx, ww, kernel_sizes, dilations),
        x, rb_weights,
    )
    return vjp(g.astype(x.dtype))


_fused_group_vjp.defvjp(_fused_group_fwd, _fused_group_bwd)


def _fused_group_impl(
    x: jnp.ndarray,
    rb_weights,
    kernel_sizes,
    dilations,
    block_rows: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused ``mean_j ResBlock1_j(x)`` for one generator stage.

    x: (B, L, C) with C a power of two <= 128; rb_weights: per resblock the
    6 folded (kernel (k, C, C) HIO, bias (C,)) pairs in chain order
    (convs1_0, convs2_0, convs1_1, ...). Matches the stock flax path
    (models/nsf_hifigan.py ResBlock1 loop) to f32 rounding.
    """
    b, l, c = x.shape
    p = max(1, 128 // c)
    if l % p:
        raise ValueError(f"length {l} not divisible by packing {p}")
    pc, ls = p * c, l // p
    weight_dtype = x.dtype

    # per-conv band tap counts -> stacked weight bytes; split per-RB if the
    # full group would not fit comfortably in VMEM
    def group_bytes(ks, ds):
        taps = 0
        for k, dils in zip(ks, ds):
            for d in dils:
                for dd in (d, 1):
                    taps += len(_band_placement(k, dd, p)[0])
        return taps * pc * pc * jnp.dtype(weight_dtype).itemsize

    split = group_bytes(kernel_sizes, dilations) > _VMEM_WEIGHT_BUDGET

    def halos(ks, ds):
        h_l = h_r = 0
        tap_counter, bias_counter = [0], [0]
        for rb in _chain_geom(ks, ds, p, tap_counter, bias_counter):
            h_l = max(h_l, rb.lead_total)
            h_r = max(h_r, rb.shrink_total - rb.lead_total)
        return h_l, h_r

    groups = (
        [([k], [d], [w]) for k, d, w in zip(kernel_sizes, dilations, rb_weights)]
        if split
        else [(list(kernel_sizes), list(dilations), list(rb_weights))]
    )

    out = None
    for ks, ds, ws in groups:
        h_l, h_r = halos(ks, ds)
        bl = block_rows or max(512, 16 * -(-2 * (h_l + h_r) // 16))
        nb = -(-ls // bl)
        pad_r = (nb + 1) * bl - h_l - ls
        xs = jnp.pad(
            x.reshape(b, ls, pc), ((0, 0), (h_l, pad_r), (0, 0))
        )
        part = _run_group(
            xs, ls, ws, ks, ds, p, bl, h_l, h_r,
            mean=not split, n_rb_total=len(rb_weights),
            weight_dtype=weight_dtype, interpret=interpret,
        )
        out = part if out is None else out + part
    if split:
        out = out / float(len(rb_weights))
    return out.reshape(b, l, c)
