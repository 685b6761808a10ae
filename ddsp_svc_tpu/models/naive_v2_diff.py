"""NaiveV2Diff: conv-only conformer denoiser (reference: diffusion/naive_v2_diff.py,
identical copy at reflow/naive_v2_diff.py — unified here).

Used by DiffusionFast (6 layers, 512 ch, use_mlp=False, cond = ddsp mel) and
RectifiedFlow (same config). Feature-last layout; the per-layer 1x1
projections are MXU matmuls and the depthwise k=31 conv rides the VPU.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from .conformer import ConformerConvModule
from .nn import Conv1d, Dense, glu
from .wavenet import sinusoidal_pos_emb


class NaiveV2DiffLayer(nn.Module):
    dim_model: int
    dim_cond: int
    use_norm: bool = False
    conv_only: bool = True
    expansion_factor: int = 2
    kernel_size: int = 31
    wavenet_like: bool = False
    conv_dropout: float = 0.0
    atten_dropout: float = 0.1
    dtype: jnp.dtype | None = None
    use_pallas: bool = False
    pallas_block_rows: int = 256
    pallas_interpret: bool = False
    # bf16 MXU passes inside the kernel (the stock convs' default-precision
    # class); False = full f32 passes (the hardware exactness regime)
    pallas_mxu_bf16: bool = True

    @nn.compact
    def __call__(self, x, condition, diffusion_step, deterministic=True,
                 edge_mask=None):
        """x: (B,T,C), condition: (B,T,Hc), diffusion_step: (B,1,C)."""
        res_x = x
        step_proj = Conv1d(self.dim_model, 1, dtype=self.dtype,
                           name="diffusion_step_projection")
        cond_proj = Conv1d(self.dim_model, 1, dtype=self.dtype,
                           name="condition_projection")
        conformer = ConformerConvModule(
            self.dim_model,
            expansion_factor=self.expansion_factor,
            kernel_size=self.kernel_size,
            dropout=self.conv_dropout,
            use_norm=self.use_norm,
            dtype=self.dtype,
            name="conformer",
        )
        # fused Pallas path (ops/pallas_conformer): the whole layer —
        # step/cond projections + GLU expand + depthwise k + SiLU +
        # projection + residual — as ONE VMEM-resident kernel. Params are
        # identical either way (fold_only accessors); guarded to the
        # shipped structural config (conv_only, no norm/dropout/wavenet,
        # no streaming edge mask — those fall back to the stock chain).
        use_fused = (
            self.use_pallas
            and not self.wavenet_like
            and not self.use_norm
            and self.conv_dropout == 0.0
            and edge_mask is None
            and not self.is_initializing()
        )
        if use_fused:
            from ..ops.pallas_conformer import fused_conformer_layer

            ws, bs = step_proj(diffusion_step, fold_only=True)
            wc, bc = cond_proj(condition, fold_only=True)
            w1, b1, wd, bd, w2, b2 = conformer(x, fold_only=True)
            # step projection on the (B, 1, C) step embedding is a tiny
            # matmul; fold it into the per-batch step vector outside
            step_vec = (
                jnp.einsum("boc,cd->bod", diffusion_step, ws[0]) + bs
            )[:, 0, :]
            return fused_conformer_layer(
                x, condition, step_vec, (wc[0], bc, w1, b1, wd, bd, w2, b2),
                block_rows=self.pallas_block_rows,
                interpret=self.pallas_interpret,
                mxu_bf16=self.pallas_mxu_bf16,
            )
        x = x + step_proj(diffusion_step) + cond_proj(condition)
        x = conformer(x, deterministic=deterministic, edge_mask=edge_mask)

        if self.wavenet_like:
            y = Conv1d(2 * self.dim_model, 1, dtype=self.dtype, name="wavenet_like_proj")(x)
            y = glu(y, axis=-1)
            return (y + res_x) / math.sqrt(2.0), res_x
        return x + res_x


class NaiveV2Diff(nn.Module):
    mel_channels: int = 128
    dim: int = 512
    use_mlp: bool = True
    mlp_factor: int = 4
    condition_dim: int = 256
    num_layers: int = 20
    expansion_factor: int = 2
    kernel_size: int = 31
    conv_only: bool = True
    wavenet_like: bool = False
    use_norm: bool = False
    conv_dropout: float = 0.0
    atten_dropout: float = 0.1
    remat: bool = False  # jax.checkpoint each layer (HBM <-> FLOPs)
    dtype: jnp.dtype | None = None
    use_pallas: bool = False  # fused conformer-layer kernel (ops/pallas_conformer)
    pallas_block_rows: int = 256
    pallas_interpret: bool = False
    pallas_mxu_bf16: bool = True  # see NaiveV2DiffLayer.pallas_mxu_bf16

    @nn.compact
    def __call__(self, spec, diffusion_step, cond, deterministic=True,
                 edge_mask=None):
        """spec: (B,T,M), diffusion_step: (B,) float, cond: (B,T,Hc) -> (B,T,M).

        ``edge_mask`` (streaming): zeros activations at frames outside the
        utterance before each depthwise conv (see models/conformer.py)."""
        x = Conv1d(self.dim, 1, dtype=self.dtype, name="input_projection")(spec)
        x = jax.nn.gelu(x, approximate=False)

        step = sinusoidal_pos_emb(diffusion_step.astype(x.dtype), self.dim)
        step = Dense(self.dim * self.mlp_factor, dtype=self.dtype, name="diff_emb_0")(step)
        step = jax.nn.gelu(step, approximate=False)
        step = Dense(self.dim, dtype=self.dtype, name="diff_emb_1")(step)
        step = step[:, None, :]  # (B,1,dim)

        if self.use_mlp:
            c = Conv1d(self.dim * self.mlp_factor, 1, dtype=self.dtype, name="cond_proj_0")(cond)
            c = jax.nn.gelu(c, approximate=False)
            condition = Conv1d(self.dim, 1, dtype=self.dtype, name="cond_proj_1")(c)
        else:
            condition = cond

        layer_cls = (
            nn.remat(NaiveV2DiffLayer, static_argnums=(4,))
            if self.remat
            else NaiveV2DiffLayer
        )

        def call_layer(layer, x_in):
            # positional call so remat's static_argnums can mark
            # `deterministic` (index 4 after flax's module-arg shift)
            return layer(x_in, condition, step, deterministic, edge_mask)
        if self.wavenet_like:
            sks = []
            for i in range(self.num_layers):
                x, sk = call_layer(
                    layer_cls(
                        self.dim,
                        self.dim if self.use_mlp else self.condition_dim,
                        use_norm=self.use_norm,
                        conv_only=self.conv_only,
                        expansion_factor=self.expansion_factor,
                        kernel_size=self.kernel_size,
                        wavenet_like=True,
                        dtype=self.dtype,
                        name=f"layer_{i}",
                    ),
                    x,
                )
                sks.append(sk)
            x = sum(sks) / math.sqrt(len(sks))
        else:
            for i in range(self.num_layers):
                x = call_layer(
                    layer_cls(
                        self.dim,
                        self.dim if self.use_mlp else self.condition_dim,
                        use_norm=self.use_norm,
                        conv_only=self.conv_only,
                        expansion_factor=self.expansion_factor,
                        kernel_size=self.kernel_size,
                        dtype=self.dtype,
                        use_pallas=self.use_pallas,
                        pallas_block_rows=self.pallas_block_rows,
                        pallas_interpret=self.pallas_interpret,
                        pallas_mxu_bf16=self.pallas_mxu_bf16,
                        name=f"layer_{i}",
                    ),
                    x,
                )

        if self.use_mlp:
            x = Conv1d(self.dim * self.mlp_factor, 1, dtype=self.dtype, name="out_proj_0")(x)
            x = jax.nn.gelu(x, approximate=False)
            x = Conv1d(
                self.mel_channels, 1, kernel_init=nn.initializers.zeros,
                dtype=self.dtype, name="out_proj_1",
            )(x)
        else:
            x = Conv1d(
                self.mel_channels, 1, kernel_init=nn.initializers.zeros,
                dtype=self.dtype, name="output_projection",
            )(x)
        return x
