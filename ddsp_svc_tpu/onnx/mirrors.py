"""torch mirrors of our flax modules, in the external apps' I/O contract.

Graph surface (names, shapes, dynamic axes) matches the reference export:
- encoder: diffusion/onnx_export.py:75-158  (hubert, mel2ph, f0, volume,
  spk_mix) -> mel_pred == the (1, H, T) condition
- denoise: diffusion/diffusion_onnx.py:128-168, 492-504  (noise, time,
  condition) -> noise_pred
- pred:    diffusion/diffusion_onnx.py:186-199, 512-524  PLMS x_pred step
- after:   diffusion/diffusion_onnx.py:171-183, 549-560  denorm mel

The math mirrors OUR modules (models/cascade.py Unit2Mel embeds,
models/wavenet.py WaveNet, models/diffusion.py schedule) so the exported
graphs agree numerically with the JAX checkpoints they were converted from
(tests/test_onnx_export.py asserts this end-to-end).
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class EncoderMirror(nn.Module):
    """Unit2Mel front half: aligned units/f0/volume embeds + speaker mix.

    Inputs: hubert (1, T, U); mel2ph (1, T) int64, 1-based frame -> unit
    alignment (0 selects the zero row, i.e. silence); f0, volume (1, T);
    spk_mix (T, n_spk) per-frame mix weights (0-based speaker columns).
    Output: (1, H, T) condition, named ``mel_pred`` for app compatibility.
    """

    def __init__(self, input_channel: int, n_spk: int, n_hidden: int):
        super().__init__()
        self.unit_embed = nn.Linear(input_channel, n_hidden)
        self.f0_embed = nn.Linear(1, n_hidden)
        self.volume_embed = nn.Linear(1, n_hidden)
        self.n_spk = n_spk
        if n_spk is not None and n_spk > 1:
            # row k == our spk_embed table row k (speaker id k+1 in configs)
            self.register_buffer("speaker_map", torch.zeros(n_spk, n_hidden))

    def forward(self, units, mel2ph, f0, volume, spk_mix):
        padded = F.pad(units, (0, 0, 1, 0))
        idx = mel2ph.unsqueeze(-1).repeat(1, 1, units.shape[-1])
        aligned = torch.gather(padded, 1, idx)
        x = (
            self.unit_embed(aligned)
            + self.f0_embed(torch.log(1.0 + f0.unsqueeze(-1) / 700.0))
            + self.volume_embed(volume.unsqueeze(-1))
        )
        if self.n_spk is not None and self.n_spk > 1:
            x = x + torch.matmul(spk_mix, self.speaker_map).unsqueeze(0)
        return x.transpose(1, 2)


class _ResBlockMirror(nn.Module):
    def __init__(self, n_chans: int, n_hidden: int):
        super().__init__()
        self.dilated_conv = nn.Conv1d(n_chans, 2 * n_chans, 3, padding=1)
        self.diffusion_projection = nn.Linear(n_chans, n_chans)
        self.conditioner_projection = nn.Conv1d(n_hidden, 2 * n_chans, 1)
        self.output_projection = nn.Conv1d(n_chans, 2 * n_chans, 1)


class WaveNetMirror(nn.Module):
    """models/wavenet.py WaveNet in NCW with the app 'denoise' contract.

    Inputs: noise (1, 1, M, T); time (1,) int64; condition (1, H, T).
    Output: (1, 1, M, T) predicted noise.
    """

    def __init__(self, in_dims: int, n_layers: int, n_chans: int, n_hidden: int):
        super().__init__()
        self.n_chans = n_chans
        self.n_layers = n_layers
        self.input_projection = nn.Conv1d(in_dims, n_chans, 1)
        self.mlp_0 = nn.Linear(n_chans, n_chans * 4)
        self.mlp_1 = nn.Linear(n_chans * 4, n_chans)
        self.layers = nn.ModuleList(
            _ResBlockMirror(n_chans, n_hidden) for _ in range(n_layers)
        )
        self.skip_projection = nn.Conv1d(n_chans, n_chans, 1)
        self.output_projection = nn.Conv1d(n_chans, in_dims, 1)
        half = n_chans // 2
        freqs = torch.exp(
            torch.arange(half, dtype=torch.float32)
            * (-math.log(10000.0) / (half - 1))
        )
        self.register_buffer("emb_freqs", freqs, persistent=False)

    def forward(self, noise, time, condition):
        x = noise.squeeze(1)
        x = F.relu(self.input_projection(x))
        t = time.float().unsqueeze(-1) * self.emb_freqs
        step = torch.cat([t.sin(), t.cos()], dim=-1)
        step = self.mlp_0(step)
        step = step * torch.tanh(F.softplus(step))  # Mish
        step = self.mlp_1(step)
        skips = None
        for layer in self.layers:
            y = x + layer.diffusion_projection(step).unsqueeze(-1)
            y = layer.dilated_conv(y) + layer.conditioner_projection(condition)
            gate, filt = torch.split(y, self.n_chans, dim=1)
            y = torch.sigmoid(gate) * torch.tanh(filt)
            y = layer.output_projection(y)
            residual, skip = torch.split(y, self.n_chans, dim=1)
            x = (x + residual) / math.sqrt(2.0)
            skips = skip if skips is None else skips + skip
        x = skips / math.sqrt(self.n_layers)
        x = F.relu(self.skip_projection(x))
        x = self.output_projection(x)
        return x.unsqueeze(1)


class PredMirror(nn.Module):
    """PLMS transfer step x_pred (models/diffusion.py:_sample_plms x_pred).

    Inputs: noise (1,1,M,T) current x; noise_pred (1,1,M,T) eps';
    time, time_prev (1,) int64.  Output: next x.
    """

    def __init__(self, alphas_cumprod):
        super().__init__()
        self.register_buffer(
            "alphas_cumprod",
            torch.as_tensor(alphas_cumprod, dtype=torch.float32),
            persistent=False,
        )

    def forward(self, noise, noise_pred, time, time_prev):
        a_t = self.alphas_cumprod.index_select(0, time).reshape(1, 1, 1, 1)
        a_prev = self.alphas_cumprod.index_select(0, time_prev).reshape(1, 1, 1, 1)
        a_t_sq = a_t.sqrt()
        a_prev_sq = a_prev.sqrt()
        x_delta = (a_prev - a_t) * (
            (1.0 / (a_t_sq * (a_t_sq + a_prev_sq))) * noise
            - 1.0
            / (a_t_sq * (((1.0 - a_prev) * a_t).sqrt() + ((1.0 - a_t) * a_prev).sqrt()))
            * noise_pred
        )
        return noise + x_delta


class AfterMirror(nn.Module):
    """Denormalize the sampled spec (models/diffusion.py denorm_spec), with
    the vocoder's log-base factor folded in (ln->log10 for
    'nsf-hifigan-log10', models/vocoder.py).  (1,1,M,T) -> (1,M,T)."""

    def __init__(self, spec_min: float, spec_max: float, scale: float = 1.0):
        super().__init__()
        self.spec_min = float(spec_min)
        self.spec_max = float(spec_max)
        self.scale = float(scale)

    def forward(self, x):
        m = x.squeeze(1)
        m = (m + 1.0) / 2.0 * (self.spec_max - self.spec_min) + self.spec_min
        if self.scale != 1.0:
            m = m * self.scale
        return m
