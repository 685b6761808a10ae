"""PCmer: Performer(FAVOR+) + conformer-conv encoder, for the legacy models
(Sins / CombSub / CombSubFast / DiffusionNew — ddsp/pcmer.py).

FAVOR+ is expressed as three einsums (kernel features -> KV context -> out),
all MXU matmuls on TPU. The orthogonal random projection lives in a
"buffers" variable collection (not trained); redraw it by re-initializing
that collection with a new RNG, mirroring redraw_projection_matrix
(ddsp/pcmer.py:291-295).

``pcmer_norm`` enables q/k L2 normalization for fp16/bf16 stability
(ddsp/pcmer.py:300-303; config diffusion-new-fp16.yaml).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from .conformer import ConformerConvModule
from .nn import Dense, LayerNorm


def gaussian_orthogonal_random_matrix(key, nb_rows: int, nb_cols: int) -> jnp.ndarray:
    """Orthogonal random features matrix (scaling=0: row norms of a gaussian)."""
    n_full = nb_rows // nb_cols
    keys = jax.random.split(key, n_full + 2)
    blocks = []
    for i in range(n_full):
        g = jax.random.normal(keys[i], (nb_cols, nb_cols))
        q, _ = jnp.linalg.qr(g)
        blocks.append(q.T)
    rem = nb_rows - n_full * nb_cols
    if rem > 0:
        g = jax.random.normal(keys[n_full], (nb_cols, nb_cols))
        q, _ = jnp.linalg.qr(g)
        blocks.append(q.T[:rem])
    final = jnp.concatenate(blocks, axis=0)
    multiplier = jnp.linalg.norm(
        jax.random.normal(keys[-1], (nb_rows, nb_cols)), axis=1
    )
    return multiplier[:, None] * final


def softmax_kernel(data, projection_matrix, is_query: bool, eps: float = 1e-4):
    """FAVOR+ positive softmax kernel features (ddsp/pcmer.py:14-47).

    data: (B, H, N, D); projection: (M, D) -> (B, H, N, M).
    """
    normalizer = data.shape[-1] ** -0.25
    ratio = projection_matrix.shape[0] ** -0.5
    data_dash = jnp.einsum("bhnd,md->bhnm", normalizer * data, projection_matrix)
    diag = jnp.sum(data**2, axis=-1, keepdims=True) / 2.0 * (normalizer**2)
    if is_query:
        out = ratio * (
            jnp.exp(data_dash - diag - jnp.max(data_dash, axis=-1, keepdims=True)) + eps
        )
    else:
        out = ratio * jnp.exp(data_dash - diag + eps)
    return out


def linear_attention(q, k, v, stream_axis=None):
    """Non-causal linear attention (ddsp/pcmer.py:218-232).

    The global sums (k_sum and the M x E context) are the ONLY cross-frame
    quantities — under time-sharding they are psum'd over ``stream_axis``,
    making FAVOR+ attention exactly sequence-parallel (the caller masks
    halo/duplicate frames out of k and v first)."""
    k_sum = jnp.sum(k, axis=-2)  # (B,H,M)
    context = jnp.einsum("bhnm,bhne->bhme", k, v)
    if stream_axis is not None:
        k_sum = jax.lax.psum(k_sum, stream_axis)
        context = jax.lax.psum(context, stream_axis)
    d_inv = 1.0 / (jnp.einsum("bhnm,bhm->bhn", q, k_sum) + 1e-8)
    return jnp.einsum("bhme,bhnm,bhn->bhne", context, q, d_inv)


class FAVORSelfAttention(nn.Module):
    dim: int
    heads: int = 8
    # the reference SelfAttention uses dim_head=64 regardless of dim
    # (ddsp/pcmer.py:327-344: inner = 64 * heads = 512 for dim_model 256)
    dim_head: int = 64
    pcmer_norm: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True, frame_mask=None,
                 stream_axis=None):
        b, n, _ = x.shape
        dim_head = self.dim_head
        nb_features = int(dim_head * math.log(dim_head))
        inner = dim_head * self.heads

        projection = self.variable(
            "buffers",
            "projection_matrix",
            lambda: gaussian_orthogonal_random_matrix(
                self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(0),
                nb_features,
                dim_head,
            ),
        ).value

        q = Dense(inner, dtype=self.dtype, name="to_q")(x)
        k = Dense(inner, dtype=self.dtype, name="to_k")(x)
        v = Dense(inner, dtype=self.dtype, name="to_v")(x)
        q, k, v = (
            t.reshape(b, n, self.heads, dim_head).transpose(0, 2, 1, 3) for t in (q, k, v)
        )
        if self.pcmer_norm:
            q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-8)
            k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-8)
        q = softmax_kernel(q, projection, is_query=True)
        k = softmax_kernel(k, projection, is_query=False)
        if frame_mask is not None:
            # streaming: count each global frame's k/v exactly once
            m = frame_mask.reshape(b, 1, n, 1)
            k = k * m
            v = v * m
        out = linear_attention(q, k, v, stream_axis=stream_axis)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class PCmerLayer(nn.Module):
    dim_model: int
    num_heads: int
    residual_dropout: float = 0.1
    pcmer_norm: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True, frame_mask=None,
                 stream_axis=None, edge_mask=None):
        x = x + FAVORSelfAttention(
            self.dim_model, self.num_heads, pcmer_norm=self.pcmer_norm,
            dtype=self.dtype, name="attn",
        )(LayerNorm(name="norm")(x), deterministic=deterministic,
          frame_mask=frame_mask, stream_axis=stream_axis)
        # PCmer's ConformerConvModule always layer-norms first (ddsp/pcmer.py:203)
        x = x + ConformerConvModule(
            self.dim_model, use_norm=True, dtype=self.dtype, name="conformer"
        )(x, deterministic=deterministic, edge_mask=edge_mask)
        return x


class PCmer(nn.Module):
    num_layers: int
    num_heads: int
    dim_model: int
    dim_keys: int = 256
    dim_values: int = 256
    residual_dropout: float = 0.1
    attention_dropout: float = 0.1
    pcmer_norm: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True, frame_mask=None,
                 stream_axis=None, edge_mask=None):
        for _ in range(self.num_layers):
            x = PCmerLayer(
                self.dim_model,
                self.num_heads,
                self.residual_dropout,
                self.pcmer_norm,
                dtype=self.dtype,
                name=f"layer_{_}",
            )(x, deterministic=deterministic, frame_mask=frame_mask,
              stream_axis=stream_axis, edge_mask=edge_mask)
        return x
