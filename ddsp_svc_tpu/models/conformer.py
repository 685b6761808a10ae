"""Conv-only conformer encoder (the reference's workhorse decoder).

Reference: diffusion/model_conformer_naive.py:8-165 (identical copy at
reflow/model_conformer_naive.py — unified here, see SURVEY.md §1).

Every shipped config uses conv_only=True, so the residual block is just
``x += ConformerConvModule(x)`` — a GLU-gated pointwise expansion, a
depthwise conv (k=31), SiLU, and a pointwise projection. On TPU the
pointwise convs are MXU matmuls and the depthwise conv is a VPU op; XLA
fuses the GLU/SiLU into them. For conv_only=False we use exact multi-head
attention: sequences here are ~172 frames (2 s crops), where exact attention
is cheaper on the MXU than Performer's FAVOR+ projections (SURVEY.md §2.9).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .nn import Conv1d, Dense, LayerNorm, glu


def calc_same_padding(kernel_size: int) -> tuple[int, int]:
    pad = kernel_size // 2
    return (pad, pad - (kernel_size + 1) % 2)


class ConformerConvModule(nn.Module):
    """LayerNorm? -> 1x1 conv -> GLU -> depthwise k -> SiLU -> 1x1 conv."""

    dim: int
    expansion_factor: int = 2
    kernel_size: int = 31
    dropout: float = 0.0
    use_norm: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True, edge_mask=None,
                 fold_only: bool = False):
        inner = self.dim * self.expansion_factor
        if fold_only:
            # weight accessor for the fused conformer kernel
            # (ops/pallas_conformer): declares the exact same params,
            # returns (W1 (C, 4C), b1, wd (k, 2C), bd, W2 (2C, C), b2)
            # with the 1x1 conv kernels squeezed to matmul form
            w1, b1 = Conv1d(inner * 2, 1, dtype=self.dtype)(x, fold_only=True)
            pad = calc_same_padding(self.kernel_size)
            wd, bd = Conv1d(
                inner, self.kernel_size, padding=pad, groups=inner,
                dtype=self.dtype,
            )(jnp.zeros(x.shape[:-1] + (inner,), x.dtype), fold_only=True)
            w2, b2 = Conv1d(self.dim, 1, dtype=self.dtype)(
                jnp.zeros(x.shape[:-1] + (inner,), x.dtype), fold_only=True)
            return (w1[0], b1, wd[:, 0, :], bd, w2[0], b2)
        if self.use_norm:
            x = LayerNorm()(x)
        x = Conv1d(inner * 2, 1, dtype=self.dtype)(x)
        x = glu(x, axis=-1)
        if edge_mask is not None:
            # streaming: zero activations at frames outside the utterance so
            # the depthwise conv sees the whole-utterance zero padding
            x = x * edge_mask
        pad = calc_same_padding(self.kernel_size)
        x = Conv1d(
            inner, self.kernel_size, padding=pad, groups=inner, dtype=self.dtype
        )(x)
        x = jax.nn.silu(x)
        x = Conv1d(self.dim, 1, dtype=self.dtype)(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class ExactSelfAttention(nn.Module):
    """torch nn.TransformerEncoderLayer equivalent (post-norm default,
    gelu) with exact attention, used when conv_only=False. The reference
    wraps this in `x + attn(norm(x))` (model_conformer_naive.py:90-110);
    within the layer torch applies norm1 AFTER the attention residual and
    norm2 AFTER the FFN residual."""

    dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            dtype=self.dtype,
            name="attn",
        )(x, x)
        x = LayerNorm(name="norm1")(x + h)
        y = Dense(self.dim * 4, dtype=self.dtype, name="fc1")(x)
        y = jax.nn.gelu(y, approximate=False)
        if self.dropout > 0.0:
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return LayerNorm(name="norm2")(x + y)


class CFNEncoderLayer(nn.Module):
    dim_model: int
    num_heads: int = 8
    use_norm: bool = False
    conv_only: bool = False
    conv_dropout: float = 0.0
    atten_dropout: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True, edge_mask=None):
        if not self.conv_only:
            x = x + ExactSelfAttention(
                self.dim_model, self.num_heads, self.atten_dropout, dtype=self.dtype
            )(LayerNorm()(x), deterministic=deterministic)
        x = x + ConformerConvModule(
            self.dim_model,
            use_norm=self.use_norm,
            dropout=self.conv_dropout,
            dtype=self.dtype,
        )(x, deterministic=deterministic, edge_mask=edge_mask)
        return x


class ConformerNaiveEncoder(nn.Module):
    num_layers: int
    num_heads: int
    dim_model: int
    use_norm: bool = False
    conv_only: bool = False
    conv_dropout: float = 0.0
    atten_dropout: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True, edge_mask=None):
        for _ in range(self.num_layers):
            x = CFNEncoderLayer(
                self.dim_model,
                self.num_heads,
                self.use_norm,
                self.conv_only,
                self.conv_dropout,
                self.atten_dropout,
                dtype=self.dtype,
            )(x, deterministic=deterministic, edge_mask=edge_mask)
        return x
