"""Reference DDSP-SVC model checkpoints (model_<step>.pt) -> our params.

Covers the naive-v2 (conv-only conformer) model family — the current-gen
configs: CombSubSuperFast, DiffusionFast (Unit2WavFast), RectifiedFlow
(reflow Unit2Wav). Legacy PCmer models (Sins/CombSub/CombSubFast and
DiffusionNew) keep their architecture here but need FAVOR+ weight mapping —
planned for a later round.

torch module paths are from ddsp/unit2control.py:26-109,
diffusion/model_conformer_naive.py:117-150, diffusion/naive_v2_diff.py:
103-170, diffusion/vocoder.py:269-314, reflow/vocoder.py:149-198.
"""
from __future__ import annotations

import numpy as np

from .common import conv1d_kernel, linear_kernel, load_state_dict


def _conv(sd, pre):
    return {"kernel": conv1d_kernel(sd[pre + ".weight"]), "bias": sd[pre + ".bias"]}


def _dense(sd, pre, bias=True):
    out = {"kernel": linear_kernel(sd[pre + ".weight"])}
    if bias:
        out["bias"] = sd[pre + ".bias"]
    return out


def _ln(sd, pre):
    return {"scale": sd[pre + ".weight"], "bias": sd[pre + ".bias"]}


def _wn_dense(sd, pre):
    return {
        "kernel_v": linear_kernel(sd[pre + ".weight_v"]),
        "kernel_g": sd[pre + ".weight_g"].reshape(-1),
        "bias": sd[pre + ".bias"],
    }


def _conformer_module(sd, pre):
    """torch ConformerConvModule .net.{2,4,6} -> flax Conv1d_{0,1,2}."""
    return {
        "Conv1d_0": _conv(sd, pre + ".net.2"),
        "Conv1d_1": _conv(sd, pre + ".net.4"),
        "Conv1d_2": _conv(sd, pre + ".net.6"),
    }


def convert_unit2control(sd: dict, prefix: str, n_layers: int = 3) -> dict:
    """torch Unit2Control (naive_v2 decoder) subtree -> flax params."""
    p = {
        "stack_conv0": _conv(sd, prefix + "stack.0"),
        "stack_norm": _ln(sd, prefix + "stack.1"),
        "stack_conv1": _conv(sd, prefix + "stack.3"),
        "f0_embed": _dense(sd, prefix + "f0_embed"),
        "phase_embed": _dense(sd, prefix + "phase_embed"),
        "volume_embed": _dense(sd, prefix + "volume_embed"),
        "norm": _ln(sd, prefix + "norm"),
        "dense_out": _wn_dense(sd, prefix + "dense_out"),
    }
    if prefix + "spk_embed.weight" in sd:
        p["spk_embed"] = {"embedding": sd[prefix + "spk_embed.weight"]}
    if prefix + "aug_shift_embed.weight" in sd:
        p["aug_shift_embed"] = _dense(sd, prefix + "aug_shift_embed", bias=False)
    decoder = {}
    for i in range(n_layers):
        decoder[f"CFNEncoderLayer_{i}"] = {
            "ConformerConvModule_0": _conformer_module(
                sd, prefix + f"decoder.encoder_layers.{i}.conformer"
            )
        }
    p["decoder"] = decoder
    return p


def convert_combsub_superfast(sd: dict, prefix: str = "") -> dict:
    return {"unit2ctrl": convert_unit2control(sd, prefix + "unit2ctrl.")}


def _pcmer_layer(sd: dict, pre: str) -> tuple[dict, dict]:
    """torch _EncoderLayer (ddsp/pcmer.py:114-148) -> (params, buffers)."""
    params = {
        "attn": {
            "to_q": _dense(sd, pre + "attn.to_q"),
            "to_k": _dense(sd, pre + "attn.to_k"),
            "to_v": _dense(sd, pre + "attn.to_v"),
            "to_out": _dense(sd, pre + "attn.to_out"),
        },
        "norm": _ln(sd, pre + "norm"),
        "conformer": {
            "LayerNorm_0": _ln(sd, pre + "conformer.net.0"),
            "Conv1d_0": _conv(sd, pre + "conformer.net.2"),
            "Conv1d_1": _conv(sd, pre + "conformer.net.4.conv"),
            "Conv1d_2": _conv(sd, pre + "conformer.net.6"),
        },
    }
    buffers = {
        "attn": {
            "projection_matrix": sd[pre + "attn.fast_attention.projection_matrix"]
        }
    }
    return params, buffers


def convert_unit2control_pcmer(sd: dict, prefix: str, n_layers: int = 3):
    """torch Unit2Control with the PCmer decoder (legacy models).

    Returns (params, buffers) — buffers hold the FAVOR+ projection matrices.
    """
    p = {
        "f0_embed": _dense(sd, prefix + "f0_embed"),
        "phase_embed": _dense(sd, prefix + "phase_embed"),
        "volume_embed": _dense(sd, prefix + "volume_embed"),
        "norm": _ln(sd, prefix + "norm"),
        "dense_out": _wn_dense(sd, prefix + "dense_out"),
    }
    if prefix + "stack.1.weight" in sd:  # conv stack variant
        p["stack_conv0"] = _conv(sd, prefix + "stack.0")
        p["stack_norm"] = _ln(sd, prefix + "stack.1")
        p["stack_conv1"] = _conv(sd, prefix + "stack.3")
    else:
        p["stack_conv0"] = _conv(sd, prefix + "stack")
    if prefix + "spk_embed.weight" in sd:
        p["spk_embed"] = {"embedding": sd[prefix + "spk_embed.weight"]}
    if prefix + "aug_shift_embed.weight" in sd:
        p["aug_shift_embed"] = _dense(sd, prefix + "aug_shift_embed", bias=False)
    decoder_p, decoder_b = {}, {}
    for i in range(n_layers):
        lp, lb = _pcmer_layer(sd, prefix + f"decoder._layers.{i}.")
        decoder_p[f"layer_{i}"] = lp
        decoder_b[f"layer_{i}"] = lb
    p["decoder"] = decoder_p
    return p, {"decoder": decoder_b}


def convert_wavenet(sd: dict, prefix: str, n_layers: int) -> dict:
    """torch diffusion/wavenet.py WaveNet -> flax params."""
    p = {
        "input_projection": _conv(sd, prefix + "input_projection"),
        "mlp_0": _dense(sd, prefix + "mlp.0"),
        "mlp_1": _dense(sd, prefix + "mlp.2"),
        "skip_projection": _conv(sd, prefix + "skip_projection"),
        "output_projection": _conv(sd, prefix + "output_projection"),
    }
    for i in range(n_layers):
        lp = prefix + f"residual_layers.{i}."
        p[f"layer_{i}"] = {
            "dilated_conv": _conv(sd, lp + "dilated_conv"),
            "diffusion_projection": _dense(sd, lp + "diffusion_projection"),
            "conditioner_projection": _conv(sd, lp + "conditioner_projection"),
            "output_projection": _conv(sd, lp + "output_projection"),
        }
    return p


def convert_naive_v2_diff(sd: dict, prefix: str, n_layers: int) -> dict:
    """torch NaiveV2Diff (use_mlp=False) -> flax params."""
    p = {
        "input_projection": _conv(sd, prefix + "input_projection"),
        "diff_emb_0": _dense(sd, prefix + "diffusion_embedding.1"),
        "diff_emb_1": _dense(sd, prefix + "diffusion_embedding.3"),
        "output_projection": _conv(sd, prefix + "output_projection"),
    }
    for i in range(n_layers):
        lp = prefix + f"residual_layers.{i}."
        p[f"layer_{i}"] = {
            "conformer": _conformer_module(sd, lp + "conformer"),
            "diffusion_step_projection": _conv(sd, lp + "diffusion_step_projection"),
            "condition_projection": _conv(sd, lp + "condition_projection"),
        }
    return p


def convert_reference_model(ckpt_path: str, args, out_path: str | None = None):
    """Convert a reference model_<step>.pt for a given config (DotDict).

    Returns the params dict; writes our checkpoint format when out_path set.
    """
    sd = load_state_dict(ckpt_path)
    mtype = args.model.type
    buffers = None
    if mtype == "CombSubSuperFast":
        params = convert_combsub_superfast(sd)
    elif mtype in ("Sins", "CombSub", "CombSubFast"):
        u2c_p, u2c_b = convert_unit2control_pcmer(sd, "unit2ctrl.")
        params = {"unit2ctrl": u2c_p}
        buffers = {"unit2ctrl": u2c_b}
    elif mtype == "Diffusion":
        params = {
            k: _dense(sd, k) for k in ("unit_embed", "f0_embed", "volume_embed")
        }
        if "spk_embed.weight" in sd:
            params["spk_embed"] = {"embedding": sd["spk_embed.weight"]}
        if "aug_shift_embed.weight" in sd:
            params["aug_shift_embed"] = _dense(sd, "aug_shift_embed", bias=False)
        params["denoise_fn"] = convert_wavenet(
            sd, "decoder.denoise_fn.", args.model.n_layers
        )
    elif mtype == "DiffusionNew":
        u2c_p, u2c_b = convert_unit2control_pcmer(sd, "ddsp_model.unit2ctrl.")
        params = {
            "ddsp_model": {"unit2ctrl": u2c_p},
            "denoise_fn": convert_wavenet(
                sd, "diff_model.denoise_fn.", args.model.n_layers
            ),
        }
        buffers = {"ddsp_model": {"unit2ctrl": u2c_b}}
    elif mtype == "DiffusionFast":
        # our cascades adopt the denoiser at the cascade scope ('denoise_fn' /
        # 'velocity_fn'), see models/cascade.py
        params = {
            "ddsp_model": convert_combsub_superfast(sd, "ddsp_model."),
            "denoise_fn": convert_naive_v2_diff(
                sd, "diff_model.denoise_fn.", args.model.n_layers
            ),
        }
    elif mtype == "RectifiedFlow":
        params = {
            "ddsp_model": convert_combsub_superfast(sd, "ddsp_model."),
            "velocity_fn": convert_naive_v2_diff(
                sd, "reflow_model.velocity_fn.", args.model.n_layers
            ),
        }
    else:
        raise NotImplementedError(f"no converter for model type {mtype!r}")
    if out_path:
        import os
        import re

        from ..train.checkpoint import save_checkpoint

        m = re.search(r"model_(\d+)", os.path.basename(ckpt_path))
        step = int(m.group(1)) if m else 0
        extra = {"buffers": buffers} if buffers else None
        save_checkpoint(os.path.dirname(out_path) or ".", step, params, extra=extra)
    return (params, buffers) if buffers else params
