"""Pallas TPU kernel: fused NaiveV2Diff conformer layer.

Reference behavior: /root/reference/diffusion/naive_v2_diff.py:44-84
(ConformerConvModule inside NaiveV2DiffLayer) — the denoiser trunk every
DiffusionFast / RectifiedFlow sampler step runs 6 times per pass, 10-20
passes per utterance.

Why a kernel: the layer is
    h   = x + step_vec + cond @ Wc + bc          (1x1 cond projection)
    g   = h @ W1 + b1 ; u = glu(g)               (1x1 expand + GLU)
    v   = depthwise_conv_k31(u) + bd ; s = silu(v)
    out = x + (s @ W2 + b2)                      (1x1 project + residual)
XLA lowers the three matmuls well but materializes every intermediate —
(T, 2048) g, (T, 1024) u and v — in HBM, so one layer moves ~7x the bytes
of its inputs+outputs; COST.json puts the trunk at 76-107 % of the HBM
roofline (the same situation the vocoder resblocks were in before
ops/pallas_resblock: 286 -> 1022x). This kernel keeps a time tile of the
whole chain in VMEM: HBM traffic per layer drops to read x (C) + read
cond (Hc) + write out (C) ~= 5 KB/frame vs ~35 KB/frame unfused.

MXU shapes: contractions are Hc>=128, C=512, 2C=1024 — all native MXU
tiles, no lane packing needed (unlike the resblock kernel's C<=128
stages). The depthwise k=31 conv is 31 shifted fused multiply-adds on the
VPU over the (bl, 2C) tile — ~2 % of the layer's FLOPs.

Halo handling: the depthwise conv needs 15 context rows each side, and
its INPUT u must be computed at halo rows too — the kernel loads
bl + 30 rows of x/cond (the resblock kernel's double-BlockSpec trick:
the padded input is passed twice with index maps i and i+1) and runs the
pre-conv stage on all of them.

Zero-padding parity: torch's 'same' depthwise conv pads the full
utterance with zeros, i.e. u == 0 outside [0, T). The kernel masks u
with a per-block row-validity vector before the conv, so edge outputs
match the stock formulation exactly (same device as the resblock
kernel's VALID-chain masking).

Training: ``fused_conformer_layer`` carries a custom VJP (forward Pallas,
backward the equivalent pure-jnp chain), so the flag can stay on under
jax.grad.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _layer_kernel(bl: int, halo: int, ls: int, k: int, out_dtype,
                  x_ref, xn_ref, c_ref, cn_ref, sv_ref,
                  wc_ref, bc_ref, w1_ref, b1_ref, wd_ref, bd_ref,
                  w2_ref, b2_ref, o_ref):
    """One (batch row, time block): rows [blk*bl - halo, blk*bl + bl + halo)
    of the padded input; writes the bl center rows of the layer output."""
    blk = pl.program_id(1)
    span = bl + 2 * halo
    xt = jnp.concatenate([x_ref[0], xn_ref[0]], axis=0)[:span]
    ct = jnp.concatenate([c_ref[0], cn_ref[0]], axis=0)[:span]
    xt = xt.astype(jnp.float32)

    # h = x + step + cond @ Wc + bc  on all span rows (halo rows feed the
    # depthwise conv through the GLU). step_vec arrives (B, 1, C) so its
    # (1, 1, C) per-batch block satisfies Mosaic's block rule (trailing
    # dims equal to the array's).
    h = xt + sv_ref[0].astype(jnp.float32)
    h = h + jax.lax.dot_general(
        ct.astype(wc_ref.dtype), wc_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + bc_ref[0][None, :].astype(jnp.float32)

    g = jax.lax.dot_general(
        h.astype(w1_ref.dtype), w1_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + b1_ref[0][None, :].astype(jnp.float32)
    inner = g.shape[-1] // 2
    u = g[:, :inner] * jax.nn.sigmoid(g[:, inner:])

    # 'same' zero padding on the FULL utterance: u rows outside [0, ls)
    # are zero (one precomputed validity column, one broadcast multiply —
    # the resblock kernel's r4 masking form)
    rows = jax.lax.broadcasted_iota(jnp.int32, (span, 1), 0)
    rows = rows + (blk * bl - halo)
    valid = jnp.where((rows >= 0) & (rows < ls), 1.0, 0.0)
    u = u * valid

    # depthwise k-tap conv over time: k shifted FMAs on the VPU
    v = jnp.broadcast_to(bd_ref[0][None, :].astype(jnp.float32), (bl, inner))
    for tau in range(k):
        v = v + jax.lax.slice_in_dim(u, tau, tau + bl) * (
            wd_ref[tau][None, :].astype(jnp.float32))
    s = v * jax.nn.sigmoid(v)

    y = jax.lax.dot_general(
        s.astype(w2_ref.dtype), w2_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + b2_ref[0][None, :].astype(jnp.float32)
    out = jax.lax.slice_in_dim(xt, halo, halo + bl) + y
    o_ref[0] = out.astype(out_dtype)


def _stock_layer(x, cond, step_vec, weights):
    """Pure-jnp reference of the fused layer (the NaiveV2DiffLayer chain
    with conv_only=True, use_norm=False) — the differentiation target for
    the custom VJP and the CPU/test path."""
    wc, bc, w1, b1, wd, bd, w2, b2 = weights
    h = x + step_vec[:, None, :] + jnp.einsum("btc,cd->btd", cond, wc) + bc
    g = jnp.einsum("btc,cd->btd", h, w1) + b1
    a, b_ = jnp.split(g, 2, axis=-1)
    u = a * jax.nn.sigmoid(b_)
    k = wd.shape[0]
    pad = (k - 1) // 2
    v = jax.lax.conv_general_dilated(
        u, wd[:, None, :], window_strides=(1,), padding=[(pad, pad)],
        feature_group_count=u.shape[-1],
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + bd
    s = v * jax.nn.sigmoid(v)
    return x + jnp.einsum("btc,cd->btd", s, w2) + b2


def fused_conformer_layer(
    x: jnp.ndarray,            # (B, T, C)
    cond: jnp.ndarray,         # (B, T, Hc)
    step_vec: jnp.ndarray,     # (B, C) — the diffusion-step projection
    weights,                   # (Wc (Hc,C), bc, W1 (C,2I), b1, wd (k,I), bd,
                               #  W2 (I,C), b2)
    *,
    block_rows: int = 256,
    interpret: bool = False,
    mxu_bf16: bool = True,
) -> jnp.ndarray:
    """Differentiable fused NaiveV2DiffLayer: Pallas forward + jnp-chain
    backward.

    ``mxu_bf16`` (default): run the three matmuls as single-pass bf16 MXU
    ops with f32 accumulation — the SAME precision class XLA's default
    matmul precision gives the stock convs, and the difference between
    winning and losing on TPU: with f32 passes the kernel is
    FLOP-bound (~3x the bf16 MXU time) and its 7x HBM-traffic reduction
    never shows. ``mxu_bf16=False`` keeps full f32 passes (bit-comparable
    to the stock path under `jax.default_matmul_precision('highest')`,
    which the hardware equality check uses)."""
    return _fused_layer_vjp(x, cond, step_vec, tuple(weights),
                            int(block_rows), bool(interpret),
                            bool(mxu_bf16))


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_layer_vjp(x, cond, step_vec, weights, block_rows, interpret,
                     mxu_bf16):
    return _fused_layer_impl(x, cond, step_vec, weights, block_rows,
                             interpret, mxu_bf16)


def _fused_layer_fwd(x, cond, step_vec, weights, block_rows, interpret,
                     mxu_bf16):
    out = _fused_layer_impl(x, cond, step_vec, weights, block_rows,
                            interpret, mxu_bf16)
    return out, (x, cond, step_vec, weights)


def _fused_layer_bwd(block_rows, interpret, mxu_bf16, residuals, g):
    x, cond, step_vec, weights = residuals
    _, vjp = jax.vjp(
        lambda xx, cc, sv, ww: _stock_layer(xx, cc, sv, ww),
        x, cond, step_vec, weights,
    )
    return vjp(g.astype(x.dtype))


_fused_layer_vjp.defvjp(_fused_layer_fwd, _fused_layer_bwd)


def _fused_layer_impl(x, cond, step_vec, weights, block_rows, interpret,
                      mxu_bf16=False):
    b, t, c = x.shape
    wc, bc, w1, b1, wd, bd, w2, b2 = weights
    k = wd.shape[0]
    halo = (k - 1) // 2
    bl = int(block_rows)
    if bl < 2 * halo:
        raise ValueError(f"block_rows {bl} < 2*halo {2 * halo}")
    nb = -(-t // bl)
    # left pad = halo; right pad to (nb+1)*bl so block nb-1's second
    # BlockSpec read (index i+1) stays in range
    pad_r = (nb + 1) * bl - halo - t
    xs = jnp.pad(x, ((0, 0), (halo, pad_r), (0, 0)))
    cs = jnp.pad(cond, ((0, 0), (halo, pad_r), (0, 0)))
    hc = cond.shape[-1]

    # matmul operand dtype: the kernel casts activations to the WEIGHT
    # dtype before each dot (w_ref.dtype in the kernel body), so setting
    # it here sets the MXU pass precision for the whole layer
    weight_dtype = jnp.bfloat16 if mxu_bf16 else x.dtype
    wc = wc.astype(weight_dtype)
    w1 = w1.astype(weight_dtype)
    w2 = w2.astype(weight_dtype)
    inner = w1.shape[-1] // 2

    spec = partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_layer_kernel, bl, halo, t, k, x.dtype),
        out_shape=jax.ShapeDtypeStruct((b, nb * bl, c), x.dtype),
        grid=(b, nb),
        in_specs=[
            spec((1, bl, c), lambda bi, i: (bi, i, 0)),
            spec((1, bl, c), lambda bi, i: (bi, i + 1, 0)),
            spec((1, bl, hc), lambda bi, i: (bi, i, 0)),
            spec((1, bl, hc), lambda bi, i: (bi, i + 1, 0)),
            spec((1, 1, c), lambda bi, i: (bi, 0, 0)),
            spec(wc.shape, lambda bi, i: (0, 0)),
            spec((1, c), lambda bi, i: (0, 0)),
            spec(w1.shape, lambda bi, i: (0, 0)),
            spec((1, 2 * inner), lambda bi, i: (0, 0)),
            spec(wd.shape, lambda bi, i: (0, 0)),
            spec((1, inner), lambda bi, i: (0, 0)),
            spec(w2.shape, lambda bi, i: (0, 0)),
            spec((1, c), lambda bi, i: (0, 0)),
        ],
        out_specs=spec((1, bl, c), lambda bi, i: (bi, i, 0)),
        interpret=interpret,
    )(xs, xs, cs, cs, step_vec.astype(x.dtype)[:, None, :],
      wc, bc.astype(jnp.float32)[None], w1, b1.astype(jnp.float32)[None],
      wd.astype(jnp.float32), bd.astype(jnp.float32)[None],
      w2, b2.astype(jnp.float32)[None])
    return out[:, :t]
