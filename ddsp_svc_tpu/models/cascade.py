"""Cascade SVC models: DDSP synth -> mel -> diffusion/reflow refinement.

Reference: diffusion/vocoder.py:171-314 (Unit2Mel, Unit2Wav, Unit2WavFast)
and reflow/vocoder.py:149-198 (reflow Unit2Wav).

The external NSF-HiFiGAN mel extractor is injected as ``mel_extract_fn``
(audio (B,L) -> mel (B,T,M)) rather than owned by the module — matching the
reference, which passes ``vocoder`` into forward. Pass None at inference to
condition on gt_spec directly.
"""
from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from .ddsp import CombSubFast, CombSubSuperFast
from .diffusion import GaussianDiffusion
from .naive_v2_diff import NaiveV2Diff
from .nn import Dense
from .reflow import RectifiedFlow
from .wavenet import WaveNet


class Unit2Mel(nn.Module):
    """Pure mel-diffusion SVC (diffusion/vocoder.py:171-218): unit/f0/volume/
    speaker embeds -> hidden -> GaussianDiffusion(WaveNet)."""

    input_channel: int
    n_spk: int
    use_pitch_aug: bool = False
    out_dims: int = 128
    n_layers: int = 20
    n_chans: int = 384
    n_hidden: int = 256
    timesteps: int = 1000
    k_step_max: int = 1000
    remat: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        units,
        f0,
        volume,
        spk_id=None,
        spk_mix_dict=None,
        aug_shift=None,
        gt_spec=None,
        infer=True,
        infer_speedup=10,
        sampler="dpm-solver",
        k_step=300,
        key=None,
        deterministic=True,
        init_noise=None,
        denoise_wrapper=None,
    ):
        x = (
            Dense(self.n_hidden, dtype=self.dtype, name="unit_embed")(units)
            + Dense(self.n_hidden, dtype=self.dtype, name="f0_embed")(
                jnp.log1p(f0 / 700.0)
            )
            + Dense(self.n_hidden, dtype=self.dtype, name="volume_embed")(volume)
        )
        if self.n_spk is not None and self.n_spk > 1:
            spk_embed = nn.Embed(self.n_spk, self.n_hidden, name="spk_embed")
            if spk_mix_dict is not None:
                for k, v in spk_mix_dict.items():
                    x = x + v * spk_embed(jnp.array([[int(k) - 1]], dtype=jnp.int32))
            else:
                x = x + spk_embed(spk_id - 1)
        if self.use_pitch_aug and aug_shift is not None:
            x = x + Dense(
                self.n_hidden, use_bias=False, dtype=self.dtype, name="aug_shift_embed"
            )(aug_shift / 5.0)

        return GaussianDiffusion(
            WaveNet(self.out_dims, self.n_layers, self.n_chans, self.n_hidden,
                    remat=self.remat, dtype=self.dtype, name="denoise_fn"),
            out_dims=self.out_dims,
            timesteps=self.timesteps,
            k_step=self.k_step_max,
            name="decoder",
        )(
            x,
            gt_spec=gt_spec,
            infer=infer,
            infer_speedup=infer_speedup,
            sampler=sampler,
            k_step=k_step,
            key=key,
            deterministic=deterministic,
            init_noise=init_noise,
            denoise_wrapper=denoise_wrapper,
        )


class Unit2Wav(nn.Module):
    """DiffusionNew cascade (diffusion/vocoder.py:221-266): CombSubFast ->
    wav -> mel; WaveNet diffusion conditioned on the DDSP *hidden*."""

    sampling_rate: int
    block_size: int
    n_unit: int
    n_spk: int
    use_pitch_aug: bool = False
    out_dims: int = 128
    n_layers: int = 20
    n_chans: int = 512
    pcmer_norm: bool = False
    timesteps: int = 1000
    k_step_max: int = 1000
    remat: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        units,
        f0,
        volume,
        spk_id=None,
        spk_mix_dict=None,
        aug_shift=None,
        mel_extract_fn: Callable | None = None,
        gt_spec=None,
        infer=True,
        infer_speedup=10,
        sampler="dpm-solver",
        k_step=None,
        key=None,
        deterministic=True,
        ddsp_noise=None,
        init_noise=None,
        denoise_wrapper=None,
    ):
        ddsp_wav, hidden, _ = CombSubFast(
            self.sampling_rate,
            self.block_size,
            self.n_unit,
            self.n_spk,
            self.use_pitch_aug,
            pcmer_norm=self.pcmer_norm,
            dtype=self.dtype,
            name="ddsp_model",
        )(
            units, f0, volume, spk_id=spk_id, spk_mix_dict=spk_mix_dict,
            aug_shift=aug_shift, infer=infer, deterministic=deterministic,
            noise=ddsp_noise,
        )
        ddsp_mel = mel_extract_fn(ddsp_wav) if mel_extract_fn is not None else None

        diff_model = GaussianDiffusion(
            WaveNet(self.out_dims, self.n_layers, self.n_chans, 256,
                    remat=self.remat, dtype=self.dtype, name="denoise_fn"),
            out_dims=self.out_dims,
            timesteps=self.timesteps,
            k_step=self.k_step_max,
            name="diff_model",
        )
        if not infer:
            ddsp_loss = jnp.mean((ddsp_mel - gt_spec) ** 2)
            diff_loss = diff_model(
                hidden, gt_spec=gt_spec, k_step=k_step, infer=False, key=key,
                deterministic=deterministic,
            )
            return ddsp_loss, diff_loss
        if gt_spec is not None and ddsp_mel is None:
            ddsp_mel = gt_spec
        if k_step is not None and k_step > 0:
            return diff_model(
                hidden, gt_spec=ddsp_mel, infer=True, infer_speedup=infer_speedup,
                sampler=sampler, k_step=k_step, key=key, deterministic=deterministic,
                init_noise=init_noise, denoise_wrapper=denoise_wrapper,
            )
        return ddsp_mel


class Unit2WavFast(nn.Module):
    """DiffusionFast cascade (diffusion/vocoder.py:269-314): CombSubSuperFast
    -> mel; NaiveV2Diff conditioned on the ddsp mel itself (use_mlp=False)."""

    sampling_rate: int
    block_size: int
    win_length: int
    n_unit: int
    n_spk: int
    use_pitch_aug: bool = False
    out_dims: int = 128
    n_layers: int = 6
    n_chans: int = 512
    timesteps: int = 1000
    k_step_max: int = 1000
    remat: bool = False
    dtype: jnp.dtype | None = None
    # fused Pallas conformer-layer trunk (ops/pallas_conformer): params
    # identical to the stock path; opt-in per deployment, equality
    # hardware-checked (TPU_CHECKS fused_conformer)
    trunk_pallas: bool = False
    # f32 MXU passes in the fused trunk (hardware exactness checks); the
    # default bf16 passes match the stock convs' default precision class
    trunk_pallas_exact: bool = False

    @nn.compact
    def __call__(
        self,
        units,
        f0,
        volume,
        spk_id=None,
        spk_mix_dict=None,
        aug_shift=None,
        mel_extract_fn: Callable | None = None,
        gt_spec=None,
        infer=True,
        infer_speedup=10,
        sampler="dpm-solver",
        k_step=None,
        key=None,
        deterministic=True,
        ddsp_noise=None,
        init_noise=None,
        denoise_wrapper=None,
    ):
        ddsp_wav, hidden, _ = CombSubSuperFast(
            self.sampling_rate,
            self.block_size,
            self.win_length,
            self.n_unit,
            self.n_spk,
            self.use_pitch_aug,
            dtype=self.dtype,
            name="ddsp_model",
        )(
            units, f0, volume, spk_id=spk_id, spk_mix_dict=spk_mix_dict,
            aug_shift=aug_shift, infer=infer, deterministic=deterministic,
            noise=ddsp_noise,
        )
        ddsp_mel = mel_extract_fn(ddsp_wav) if mel_extract_fn is not None else None

        diff_model = GaussianDiffusion(
            NaiveV2Diff(
                mel_channels=self.out_dims, dim=self.n_chans,
                num_layers=self.n_layers, condition_dim=self.out_dims,
                use_mlp=False, remat=self.remat, dtype=self.dtype,
                use_pallas=self.trunk_pallas,
                pallas_mxu_bf16=not self.trunk_pallas_exact,
                name="denoise_fn",
            ),
            out_dims=self.out_dims,
            timesteps=self.timesteps,
            k_step=self.k_step_max,
            name="diff_model",
        )
        if not infer:
            ddsp_loss = jnp.mean((ddsp_mel - gt_spec) ** 2)
            diff_loss = diff_model(
                ddsp_mel, gt_spec=gt_spec, k_step=k_step, infer=False, key=key,
                deterministic=deterministic,
            )
            return ddsp_loss, diff_loss
        if gt_spec is not None and ddsp_mel is None:
            ddsp_mel = gt_spec
        if k_step is not None and k_step > 0:
            return diff_model(
                ddsp_mel, gt_spec=ddsp_mel, infer=True, infer_speedup=infer_speedup,
                sampler=sampler, k_step=k_step, key=key, deterministic=deterministic,
                init_noise=init_noise, denoise_wrapper=denoise_wrapper,
            )
        return ddsp_mel


class ReflowUnit2Wav(nn.Module):
    """RectifiedFlow cascade (reflow/vocoder.py:149-198): CombSubSuperFast ->
    mel -> RectifiedFlow(NaiveV2Diff)."""

    sampling_rate: int
    block_size: int
    win_length: int
    n_unit: int
    n_spk: int
    use_pitch_aug: bool = False
    out_dims: int = 128
    n_layers: int = 6
    n_chans: int = 512
    remat: bool = False
    dtype: jnp.dtype | None = None
    # fused Pallas conformer-layer trunk (ops/pallas_conformer): params
    # identical to the stock path; opt-in per deployment, equality
    # hardware-checked (TPU_CHECKS fused_conformer)
    trunk_pallas: bool = False
    # f32 MXU passes in the fused trunk (hardware exactness checks); the
    # default bf16 passes match the stock convs' default precision class
    trunk_pallas_exact: bool = False

    @nn.compact
    def __call__(
        self,
        units,
        f0,
        volume,
        spk_id=None,
        spk_mix_dict=None,
        aug_shift=None,
        mel_extract_fn: Callable | None = None,
        gt_spec=None,
        infer=True,
        infer_step=10,
        sampler="euler",
        t_start=0.0,
        key=None,
        deterministic=True,
        ddsp_noise=None,
        init_noise=None,
        velocity_wrapper=None,
    ):
        ddsp_wav, hidden, _ = CombSubSuperFast(
            self.sampling_rate,
            self.block_size,
            self.win_length,
            self.n_unit,
            self.n_spk,
            self.use_pitch_aug,
            dtype=self.dtype,
            name="ddsp_model",
        )(
            units, f0, volume, spk_id=spk_id, spk_mix_dict=spk_mix_dict,
            aug_shift=aug_shift, infer=infer, deterministic=deterministic,
            noise=ddsp_noise,
        )
        ddsp_mel = mel_extract_fn(ddsp_wav) if mel_extract_fn is not None else None

        reflow_model = RectifiedFlow(
            NaiveV2Diff(
                mel_channels=self.out_dims, dim=self.n_chans,
                num_layers=self.n_layers, condition_dim=self.out_dims,
                use_mlp=False, remat=self.remat, dtype=self.dtype,
                use_pallas=self.trunk_pallas,
                pallas_mxu_bf16=not self.trunk_pallas_exact,
                name="velocity_fn",
            ),
            out_dims=self.out_dims,
            name="reflow_model",
        )
        if not infer:
            ddsp_loss = jnp.mean((ddsp_mel - gt_spec) ** 2)
            reflow_loss = reflow_model(
                ddsp_mel, gt_spec=gt_spec, infer=False, t_start=t_start, key=key,
                deterministic=deterministic,
            )
            return ddsp_loss, reflow_loss
        if gt_spec is not None and ddsp_mel is None:
            ddsp_mel = gt_spec
        # t_start >= 1.0 bypasses the ODE entirely (reference
        # reflow/vocoder.py:190-195: pure-DDSP mode returns ddsp_mel);
        # vocoding the returned mel is the caller's step (models/vocoder.py)
        if infer_step > 0 and t_start < 1.0:
            return reflow_model(
                ddsp_mel, gt_spec=ddsp_mel, infer=True, infer_step=infer_step,
                sampler=sampler, t_start=t_start, key=key, deterministic=deterministic,
                init_noise=init_noise, velocity_wrapper=velocity_wrapper,
            )
        return ddsp_mel
