"""WaveNet denoiser for mel diffusion (reference: diffusion/wavenet.py).

Feature-last layout (B, T, C): 1x1 convs become MXU matmuls; the k=3 dilated
conv is the only spatial op per block. The output projection is zero-init so
the untrained denoiser predicts zero noise (diffusion/wavenet.py:84).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from .nn import Conv1d, Dense


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """DiffSVC/DDPM sinusoidal step embedding (diffusion/wavenet.py:16-28).

    t: (B,) float steps -> (B, dim).
    """
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    emb = jnp.exp(jnp.arange(half, dtype=t.dtype) * -emb)
    emb = t[:, None] * emb[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class WaveNetResidualBlock(nn.Module):
    residual_channels: int
    dilation: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, cond, diffusion_step, edge_mask=None):
        """x: (B,T,C), cond: (B,T,H), diffusion_step: (B,C)."""
        c = self.residual_channels
        step = Dense(c, dtype=self.dtype, name="diffusion_projection")(diffusion_step)
        y = x + step[:, None, :]
        if edge_mask is not None:
            # streaming: emulate whole-utterance zero padding at global edges
            y = y * edge_mask
        y = Conv1d(
            2 * c, 3, padding=self.dilation, dilation=self.dilation,
            dtype=self.dtype, name="dilated_conv",
        )(y)
        y = y + Conv1d(2 * c, 1, dtype=self.dtype, name="conditioner_projection")(cond)
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        y = Conv1d(2 * c, 1, dtype=self.dtype, name="output_projection")(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) / math.sqrt(2.0), skip


class WaveNet(nn.Module):
    """20-layer gated WaveNet noise predictor. x: (B,T,M) -> (B,T,M)."""

    in_dims: int = 128
    n_layers: int = 20
    n_chans: int = 384
    n_hidden: int = 256
    remat: bool = False  # jax.checkpoint each residual block
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, spec, diffusion_step, cond, deterministic=True,
                 edge_mask=None):
        """spec: (B,T,M), diffusion_step: (B,) float, cond: (B,T,H)."""
        x = Conv1d(self.n_chans, 1, dtype=self.dtype, name="input_projection")(spec)
        x = jax.nn.relu(x)
        step = sinusoidal_pos_emb(diffusion_step.astype(x.dtype), self.n_chans)
        step = Dense(self.n_chans * 4, dtype=self.dtype, name="mlp_0")(step)
        step = step * jnp.tanh(jax.nn.softplus(step))  # Mish
        step = Dense(self.n_chans, dtype=self.dtype, name="mlp_1")(step)

        block_cls = (
            nn.remat(WaveNetResidualBlock) if self.remat else WaveNetResidualBlock
        )
        skips = 0.0
        for i in range(self.n_layers):
            x, skip = block_cls(
                self.n_chans, dilation=1, dtype=self.dtype, name=f"layer_{i}"
            )(x, cond, step, edge_mask)
            skips = skips + skip
        x = skips / math.sqrt(self.n_layers)
        x = Conv1d(self.n_chans, 1, dtype=self.dtype, name="skip_projection")(x)
        x = jax.nn.relu(x)
        x = Conv1d(
            self.in_dims, 1, kernel_init=nn.initializers.zeros,
            dtype=self.dtype, name="output_projection",
        )(x)
        return x
