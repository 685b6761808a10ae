"""Our flax checkpoint params -> torch state dicts for the export mirrors.

Exact inverse of convert/common.py's layout rules: flax Dense kernel
(in, out) -> torch Linear weight (out, in); flax Conv1d kernel (k, in, out)
-> torch Conv1d weight (out, in, k); flax Embed 'embedding' (N, H) is the
speaker map rows directly (diffusion/onnx_export.py:101-124 fills
speaker_map[k] with spk_embed row k).
"""
from __future__ import annotations

import numpy as np


def _dense_w(p) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(p["kernel"]).T)


def _conv_w(p) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(p["kernel"]).transpose(2, 1, 0))


def _put_dense(sd: dict, name: str, p) -> None:
    sd[name + ".weight"] = _dense_w(p)
    if "bias" in p:
        sd[name + ".bias"] = np.asarray(p["bias"])


def _put_conv(sd: dict, name: str, p) -> None:
    sd[name + ".weight"] = _conv_w(p)
    if "bias" in p:
        sd[name + ".bias"] = np.asarray(p["bias"])


def encoder_state_dict(params: dict, n_spk: int) -> dict:
    """Unit2Mel top-level embeds (models/cascade.py:62-79) -> EncoderMirror."""
    sd: dict = {}
    _put_dense(sd, "unit_embed", params["unit_embed"])
    _put_dense(sd, "f0_embed", params["f0_embed"])
    _put_dense(sd, "volume_embed", params["volume_embed"])
    if n_spk is not None and n_spk > 1:
        sd["speaker_map"] = np.asarray(params["spk_embed"]["embedding"])
    return sd


def wavenet_state_dict(params: dict, n_layers: int) -> dict:
    """models/wavenet.py WaveNet params -> WaveNetMirror state dict."""
    sd: dict = {}
    _put_conv(sd, "input_projection", params["input_projection"])
    _put_dense(sd, "mlp_0", params["mlp_0"])
    _put_dense(sd, "mlp_1", params["mlp_1"])
    for i in range(n_layers):
        p = params[f"layer_{i}"]
        _put_conv(sd, f"layers.{i}.dilated_conv", p["dilated_conv"])
        _put_dense(sd, f"layers.{i}.diffusion_projection", p["diffusion_projection"])
        _put_conv(sd, f"layers.{i}.conditioner_projection", p["conditioner_projection"])
        _put_conv(sd, f"layers.{i}.output_projection", p["output_projection"])
    _put_conv(sd, "skip_projection", params["skip_projection"])
    _put_conv(sd, "output_projection", params["output_projection"])
    return sd


def to_torch(sd: dict):
    import torch

    return {k: torch.from_numpy(np.array(v, dtype=np.float32)) for k, v in sd.items()}
