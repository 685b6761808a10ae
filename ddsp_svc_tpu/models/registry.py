"""Model construction from the reference YAML config schema.

Mirrors the dispatch in ddsp/vocoder.py:475-529 (DDSP models) and
diffusion/vocoder.py:24-78 / reflow/vocoder.py:23-56 (cascades), keeping
``model.type`` strings and config keys identical so reference configs work
unchanged.
"""
from __future__ import annotations

import flax.linen as nn

from .cascade import ReflowUnit2Wav, Unit2Mel, Unit2Wav, Unit2WavFast
from .ddsp import CombSub, CombSubFast, CombSubSuperFast, Sins


def build_model(args, vocoder_dimension: int = 128, dtype=None) -> nn.Module:
    """args: DotDict config (see configs/*.yaml). Returns an un-initialized
    flax module. ``dtype`` = activation dtype (bf16 mixed precision when
    jnp.bfloat16; params stay f32)."""
    mtype = args.model.type
    if mtype == "Sins":
        return Sins(
            sampling_rate=args.data.sampling_rate,
            block_size=args.data.block_size,
            n_harmonics=args.model.n_harmonics,
            n_mag_allpass=args.model.n_mag_allpass,
            n_mag_noise=args.model.n_mag_noise,
            n_unit=args.data.encoder_out_channels,
            n_spk=args.model.n_spk,
            dtype=dtype,
        )
    if mtype == "CombSub":
        return CombSub(
            sampling_rate=args.data.sampling_rate,
            block_size=args.data.block_size,
            n_mag_allpass=args.model.n_mag_allpass,
            n_mag_harmonic=args.model.n_mag_harmonic,
            n_mag_noise=args.model.n_mag_noise,
            n_unit=args.data.encoder_out_channels,
            n_spk=args.model.n_spk,
            dtype=dtype,
        )
    if mtype == "CombSubFast":
        return CombSubFast(
            sampling_rate=args.data.sampling_rate,
            block_size=args.data.block_size,
            n_unit=args.data.encoder_out_channels,
            n_spk=args.model.n_spk,
            dtype=dtype,
        )
    if mtype == "CombSubSuperFast":
        return CombSubSuperFast(
            sampling_rate=args.data.sampling_rate,
            block_size=args.data.block_size,
            win_length=args.model.win_length,
            n_unit=args.data.encoder_out_channels,
            n_spk=args.model.n_spk,
            use_pallas_source=bool(args.model.use_pallas_source),
            dtype=dtype,
        )
    remat = bool(args.model.use_remat)
    if mtype == "Diffusion":
        return Unit2Mel(
            args.data.encoder_out_channels,
            args.model.n_spk,
            bool(args.model.use_pitch_aug),
            vocoder_dimension,
            args.model.n_layers,
            args.model.n_chans,
            args.model.n_hidden,
            k_step_max=args.model.k_step_max or 1000,
            remat=remat,
            dtype=dtype,
        )
    if mtype == "DiffusionNew":
        return Unit2Wav(
            args.data.sampling_rate,
            args.data.block_size,
            args.data.encoder_out_channels,
            args.model.n_spk,
            bool(args.model.use_pitch_aug),
            vocoder_dimension,
            args.model.n_layers,
            args.model.n_chans,
            pcmer_norm=bool(args.model.pcmer_norm),
            k_step_max=args.model.k_step_max or 1000,
            remat=remat,
            dtype=dtype,
        )
    if mtype == "DiffusionFast":
        return Unit2WavFast(
            args.data.sampling_rate,
            args.data.block_size,
            args.model.win_length,
            args.data.encoder_out_channels,
            args.model.n_spk,
            bool(args.model.use_pitch_aug),
            vocoder_dimension,
            args.model.n_layers,
            args.model.n_chans,
            k_step_max=args.model.k_step_max or 1000,
            remat=remat,
            dtype=dtype,
        )
    if mtype == "RectifiedFlow":
        return ReflowUnit2Wav(
            args.data.sampling_rate,
            args.data.block_size,
            args.model.win_length,
            args.data.encoder_out_channels,
            args.model.n_spk,
            bool(args.model.use_pitch_aug),
            vocoder_dimension,
            args.model.n_layers,
            args.model.n_chans,
            remat=remat,
            dtype=dtype,
        )
    raise ValueError(f" [x] Unknown Model: {mtype}")


def load_model(model_path, device=None):
    """Load checkpoint + sibling config.yaml (ddsp/vocoder.py:475-529 contract).

    Returns (module, variables, args).
    """
    import os

    from ..train.checkpoint import load_checkpoint
    from ..utils.config import load_config

    config_file = os.path.join(os.path.split(model_path)[0], "config.yaml")
    args = load_config(config_file)
    # mel dimension normally comes from the vocoder ckpt at train time;
    # allow configs to pin it (model.out_dims), default nsf-hifigan's 128
    model = build_model(args, vocoder_dimension=args.model.out_dims or 128)
    payload, _step = load_checkpoint(model_path)
    variables = {"params": payload["params"]}
    if payload.get("buffers"):  # e.g. FAVOR+ projections (convert/models.py)
        variables["buffers"] = payload["buffers"]
    return model, variables, args
