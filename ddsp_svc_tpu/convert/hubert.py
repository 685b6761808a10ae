"""HuBERT / ContentVec torch checkpoints -> flax HubertModel params.

Two source layouts:
  - 'bshall' HuBERT-Soft (encoder/hubert/model.py:19-80): packed
    self_attn.in_proj_weight, positional conv weight-normed on dim=2.
  - 'fairseq' HuBERT-Base/Large & ContentVec: separate q/k/v_proj,
    feature_extractor.conv_layers.N.0 convs, post_extract_proj, pos_conv.0.
"""
from __future__ import annotations

import numpy as np

from ..features.hubert import ENCODER_CONFIGS, HubertConfig
from .common import (
    conv1d_kernel,
    fold_weight_norm,
    linear_kernel,
    load_state_dict,
    mha_params,
)


def _layer_from_bshall(sd: dict, i: int, heads: int) -> dict:
    pre = f"encoder.layers.{i}."
    w = sd[pre + "self_attn.in_proj_weight"]
    b = sd[pre + "self_attn.in_proj_bias"]
    d = w.shape[1]
    wq, wk, wv = w[:d], w[d : 2 * d], w[2 * d :]
    bq, bk, bv = b[:d], b[d : 2 * d], b[2 * d :]
    return {
        "attn": mha_params(
            wq, wk, wv, bq, bk, bv,
            sd[pre + "self_attn.out_proj.weight"],
            sd[pre + "self_attn.out_proj.bias"], heads,
        ),
        "fc1": {"kernel": linear_kernel(sd[pre + "linear1.weight"]),
                "bias": sd[pre + "linear1.bias"]},
        "fc2": {"kernel": linear_kernel(sd[pre + "linear2.weight"]),
                "bias": sd[pre + "linear2.bias"]},
        "norm1": {"scale": sd[pre + "norm1.weight"], "bias": sd[pre + "norm1.bias"]},
        "norm2": {"scale": sd[pre + "norm2.weight"], "bias": sd[pre + "norm2.bias"]},
    }


def _layer_from_fairseq(sd: dict, i: int, heads: int) -> dict:
    pre = f"encoder.layers.{i}."
    return {
        "attn": mha_params(
            sd[pre + "self_attn.q_proj.weight"],
            sd[pre + "self_attn.k_proj.weight"],
            sd[pre + "self_attn.v_proj.weight"],
            sd[pre + "self_attn.q_proj.bias"],
            sd[pre + "self_attn.k_proj.bias"],
            sd[pre + "self_attn.v_proj.bias"],
            sd[pre + "self_attn.out_proj.weight"],
            sd[pre + "self_attn.out_proj.bias"], heads,
        ),
        "fc1": {"kernel": linear_kernel(sd[pre + "fc1.weight"]),
                "bias": sd[pre + "fc1.bias"]},
        "fc2": {"kernel": linear_kernel(sd[pre + "fc2.weight"]),
                "bias": sd[pre + "fc2.bias"]},
        "norm1": {"scale": sd[pre + "self_attn_layer_norm.weight"],
                  "bias": sd[pre + "self_attn_layer_norm.bias"]},
        "norm2": {"scale": sd[pre + "final_layer_norm.weight"],
                  "bias": sd[pre + "final_layer_norm.bias"]},
    }


def _layer_from_hf(sd: dict, i: int, heads: int) -> dict:
    pre = f"encoder.layers.{i}."
    return {
        "attn": mha_params(
            sd[pre + "attention.q_proj.weight"],
            sd[pre + "attention.k_proj.weight"],
            sd[pre + "attention.v_proj.weight"],
            sd[pre + "attention.q_proj.bias"],
            sd[pre + "attention.k_proj.bias"],
            sd[pre + "attention.v_proj.bias"],
            sd[pre + "attention.out_proj.weight"],
            sd[pre + "attention.out_proj.bias"], heads,
        ),
        "fc1": {"kernel": linear_kernel(sd[pre + "feed_forward.intermediate_dense.weight"]),
                "bias": sd[pre + "feed_forward.intermediate_dense.bias"]},
        "fc2": {"kernel": linear_kernel(sd[pre + "feed_forward.output_dense.weight"]),
                "bias": sd[pre + "feed_forward.output_dense.bias"]},
        "norm1": {"scale": sd[pre + "layer_norm.weight"],
                  "bias": sd[pre + "layer_norm.bias"]},
        "norm2": {"scale": sd[pre + "final_layer_norm.weight"],
                  "bias": sd[pre + "final_layer_norm.bias"]},
    }


def convert_hubert_state_dict(sd: dict, config: HubertConfig) -> dict:
    """{torch name: ndarray} -> flax {'params': ...} for HubertModel.

    Auto-detects bshall / fairseq / HF-transformers (CNHubertSoftFish)
    layouts.
    """
    # CNHubertSoftFish wraps the HF model under 'model.' with a 'proj.1'
    # head (ddsp/vocoder.py:330-364)
    if any(k.startswith("model.") for k in sd):
        sd = dict(sd)
        for k in list(sd):
            if k.startswith("model."):
                sd[k[len("model.") :]] = sd.pop(k)
    hf = any("pos_conv_embed" in k for k in sd)
    if hf:
        return _convert_hf(sd, config)
    fairseq = any(k.startswith("feature_extractor.conv_layers") for k in sd)
    params: dict = {}

    # feature extractor — fairseq has two conv-extractor modes
    # (wav2vec2.py ConvFeatureExtractionModel): 'default' (bias-free convs,
    # GroupNorm after conv0: keys .{i}.0.weight + .0.2.{weight,bias}) and
    # 'layer_norm' (HuBERT-Large: biased convs + per-layer LayerNorm:
    # keys .{i}.0.{weight,bias} + .{i}.2.1.{weight,bias})
    ln_mode = "feature_extractor.conv_layers.0.2.1.weight" in sd
    fe = {}
    for i in range(7):
        if fairseq:
            w = sd[f"feature_extractor.conv_layers.{i}.0.weight"]
        else:
            w = sd[f"feature_extractor.conv{i}.weight"]
        fe[f"conv{i}"] = {"kernel": conv1d_kernel(w)}
        if fairseq and ln_mode:
            fe[f"conv{i}"]["bias"] = sd[
                f"feature_extractor.conv_layers.{i}.0.bias"
            ]
            fe[f"norm{i}"] = {
                "scale": sd[f"feature_extractor.conv_layers.{i}.2.1.weight"],
                "bias": sd[f"feature_extractor.conv_layers.{i}.2.1.bias"],
            }
    if fairseq and not ln_mode:
        fe["norm0"] = {
            "scale": sd["feature_extractor.conv_layers.0.2.weight"],
            "bias": sd["feature_extractor.conv_layers.0.2.bias"],
        }
    elif not fairseq:
        fe["norm0"] = {
            "scale": sd["feature_extractor.norm0.weight"],
            "bias": sd["feature_extractor.norm0.bias"],
        }
    params["feature_extractor"] = fe

    # feature projection
    if fairseq:
        params["fp_norm"] = {"scale": sd["layer_norm.weight"],
                             "bias": sd["layer_norm.bias"]}
        params["fp_proj"] = {"kernel": linear_kernel(sd["post_extract_proj.weight"]),
                             "bias": sd["post_extract_proj.bias"]}
        pos_pre = "encoder.pos_conv.0."
        params["norm"] = {"scale": sd["encoder.layer_norm.weight"],
                          "bias": sd["encoder.layer_norm.bias"]}
    else:
        params["fp_norm"] = {"scale": sd["feature_projection.norm.weight"],
                             "bias": sd["feature_projection.norm.bias"]}
        params["fp_proj"] = {
            "kernel": linear_kernel(sd["feature_projection.projection.weight"]),
            "bias": sd["feature_projection.projection.bias"],
        }
        pos_pre = "positional_embedding.conv."
        params["norm"] = {"scale": sd["norm.weight"], "bias": sd["norm.bias"]}

    # positional conv (weight-normed on dim=2, encoder/hubert/model.py:133-148)
    wv = sd[pos_pre + "weight_v"]
    wg = sd[pos_pre + "weight_g"]
    w = fold_weight_norm(wg, wv, dim=2)
    params["pos_conv"] = {
        "conv": {"kernel": conv1d_kernel(w), "bias": sd[pos_pre + "bias"]}
    }

    n = config.output_layer or config.num_layers
    for i in range(n):
        params[f"layer{i}"] = (
            _layer_from_fairseq(sd, i, config.heads)
            if fairseq
            else _layer_from_bshall(sd, i, config.heads)
        )

    if config.proj_dim:
        if fairseq and "final_proj.weight" in sd:
            params["proj"] = {"kernel": linear_kernel(sd["final_proj.weight"]),
                              "bias": sd["final_proj.bias"]}
        elif "proj.weight" in sd:
            params["proj"] = {"kernel": linear_kernel(sd["proj.weight"]),
                              "bias": sd["proj.bias"]}
    return {"params": params}


def _convert_hf(sd: dict, config: HubertConfig) -> dict:
    """HF transformers HubertModel layout (chinese-hubert-base etc.)."""
    params: dict = {}
    fe = {}
    for i in range(7):
        fe[f"conv{i}"] = {
            "kernel": conv1d_kernel(sd[f"feature_extractor.conv_layers.{i}.conv.weight"])
        }
    fe["norm0"] = {
        "scale": sd["feature_extractor.conv_layers.0.layer_norm.weight"],
        "bias": sd["feature_extractor.conv_layers.0.layer_norm.bias"],
    }
    params["feature_extractor"] = fe
    params["fp_norm"] = {"scale": sd["feature_projection.layer_norm.weight"],
                         "bias": sd["feature_projection.layer_norm.bias"]}
    params["fp_proj"] = {"kernel": linear_kernel(sd["feature_projection.projection.weight"]),
                         "bias": sd["feature_projection.projection.bias"]}
    pos = "encoder.pos_conv_embed.conv."
    if pos + "weight_v" in sd:
        w = fold_weight_norm(sd[pos + "weight_g"], sd[pos + "weight_v"], dim=2)
    else:  # torch >= 2.1 parametrized weight norm
        w = fold_weight_norm(
            sd[pos + "parametrizations.weight.original0"],
            sd[pos + "parametrizations.weight.original1"], dim=2,
        )
    params["pos_conv"] = {"conv": {"kernel": conv1d_kernel(w), "bias": sd[pos + "bias"]}}
    params["norm"] = {"scale": sd["encoder.layer_norm.weight"],
                      "bias": sd["encoder.layer_norm.bias"]}
    n = config.output_layer or config.num_layers
    for i in range(n):
        params[f"layer{i}"] = _layer_from_hf(sd, i, config.heads)
    if config.proj_dim and "proj.1.weight" in sd:
        params["proj"] = {"kernel": linear_kernel(sd["proj.1.weight"]),
                          "bias": sd["proj.1.bias"]}
    return {"params": params}


def convert_hubert(ckpt_path: str, encoder: str, out_path: str) -> None:
    from flax import serialization

    sd = load_state_dict(ckpt_path)
    variables = convert_hubert_state_dict(sd, ENCODER_CONFIGS[encoder])
    with open(out_path, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))
    print(f" [*] {encoder}: {ckpt_path} -> {out_path}")
