"""Unit2Control: units + f0/phase/volume/speaker -> named control tensors.

Reference: ddsp/unit2control.py:26-109. Conv stack (2x conv3 + GroupNorm(4)
+ LeakyReLU), additive embeddings (log-f0, phase/pi, volume, speaker mix,
pitch-aug shift), a 3-layer decoder (conv-only conformer by default, PCmer
for legacy models), LayerNorm, and a weight-normed output projection split
into the per-model control dict.
"""
from __future__ import annotations

from typing import Mapping

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .conformer import ConformerNaiveEncoder
from .nn import Conv1d, Dense, GroupNorm, LayerNorm, leaky_relu
from .pcmer import PCmer


def split_to_dict(tensor: jnp.ndarray, splits: Mapping[str, int]):
    """Split the last axis into a dict of named tensors (unit2control.py:13-23)."""
    out = {}
    start = 0
    for k, size in splits.items():
        out[k] = tensor[..., start : start + size]
        start += size
    return out


class Unit2Control(nn.Module):
    input_channel: int
    n_spk: int
    output_splits: Mapping[str, int]
    use_pitch_aug: bool = False
    pcmer_norm: bool = False
    use_naive_v2: bool = False
    use_conv_stack: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        units,  # (B, T, n_unit)
        f0,  # (B, T, 1)
        phase,  # (B, T, 1)
        volume,  # (B, T, 1)
        spk_id=None,  # (B, 1) int, 1-based
        spk_mix_dict: Mapping[int, float] | None = None,
        aug_shift=None,  # (B, 1)
        deterministic: bool = True,
        frame_mask=None,  # (B, T, 1) streaming: 1 = own frame, 0 = halo
        stream_axis: str | None = None,  # shard_map time-axis name
        edge_mask=None,  # (B, T, 1) streaming: 0 = frame outside the utterance
    ):
        if self.use_conv_stack:
            x = Conv1d(256, 3, padding=1, dtype=self.dtype, name="stack_conv0")(units)
            x = GroupNorm(4, name="stack_norm")(
                x, frame_mask=frame_mask, axis_name=stream_axis
            )
            x = leaky_relu(x)
            if edge_mask is not None:
                x = x * edge_mask
            x = Conv1d(256, 3, padding=1, dtype=self.dtype, name="stack_conv1")(x)
        else:
            x = Conv1d(256, 3, padding=1, dtype=self.dtype, name="stack_conv0")(units)

        f0_embed = Dense(256, dtype=self.dtype, name="f0_embed")
        phase_embed = Dense(256, dtype=self.dtype, name="phase_embed")
        volume_embed = Dense(256, dtype=self.dtype, name="volume_embed")
        x = (
            x
            + f0_embed(jnp.log1p(f0 / 700.0))
            + phase_embed(phase / np.pi)
            + volume_embed(volume)
        )

        if self.n_spk is not None and self.n_spk > 1:
            spk_embed = nn.Embed(self.n_spk, 256, name="spk_embed")
            if spk_mix_dict is not None:
                for k, v in spk_mix_dict.items():
                    x = x + v * spk_embed(jnp.array([[int(k) - 1]], dtype=jnp.int32))
            else:
                x = x + spk_embed(spk_id - 1)
        if self.use_pitch_aug and aug_shift is not None:
            # aug_shift: (B, 1, 1) semitone shift (diffusion/data_loaders.py:269)
            aug_embed = Dense(256, use_bias=False, dtype=self.dtype, name="aug_shift_embed")
            x = x + aug_embed(aug_shift / 5.0)

        if self.use_naive_v2:
            x = ConformerNaiveEncoder(
                num_layers=3,
                num_heads=8,
                dim_model=256,
                use_norm=False,
                conv_only=True,
                conv_dropout=0.0,
                atten_dropout=0.1,
                dtype=self.dtype,
                name="decoder",
            )(x, deterministic=deterministic, edge_mask=edge_mask)
        else:
            x = PCmer(
                num_layers=3,
                num_heads=8,
                dim_model=256,
                dim_keys=256,
                dim_values=256,
                residual_dropout=0.1,
                attention_dropout=0.1,
                pcmer_norm=self.pcmer_norm,
                dtype=self.dtype,
                name="decoder",
            )(x, deterministic=deterministic, frame_mask=frame_mask,
              stream_axis=stream_axis, edge_mask=edge_mask)
        x = LayerNorm(name="norm")(x)
        n_out = sum(self.output_splits.values())
        e = Dense(n_out, weight_norm=True, dtype=self.dtype, name="dense_out")(x)
        controls = split_to_dict(e, self.output_splits)
        return controls, x
