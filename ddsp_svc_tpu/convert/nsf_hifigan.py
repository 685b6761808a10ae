"""NSF-HiFiGAN torch checkpoint (+config.json) -> flax Generator msgpack.

Source layout (nsf_hifigan/models.py:207-274 + env.py): generator state dict
with weight-normed conv_pre/ups/resblocks/conv_post (weight_g/weight_v kept,
matching our Conv1d/ConvTranspose1d kernel_g/kernel_v parameterization) and
plain noise_convs; config.json carries the mel/upsampling hyperparams.
"""
from __future__ import annotations

import json
import os

import numpy as np

from .common import conv1d_kernel, convtranspose1d_kernel, linear_kernel, load_state_dict


def _wn_conv(sd: dict, pre: str) -> dict:
    v = conv1d_kernel(sd[pre + ".weight_v"])
    g = sd[pre + ".weight_g"].reshape(-1)
    return {"kernel_v": v, "kernel_g": g, "bias": sd[pre + ".bias"]}


def _wn_convt(sd: dict, pre: str) -> dict:
    v = convtranspose1d_kernel(sd[pre + ".weight_v"])  # (k, in, out)
    g = sd[pre + ".weight_g"].reshape(-1)  # per-in-channel
    return {"kernel_v": v, "kernel_g": g, "bias": sd[pre + ".bias"]}


def convert_nsf_hifigan_state_dict(sd: dict, config: dict) -> dict:
    params: dict = {
        "conv_pre": _wn_conv(sd, "conv_pre"),
        "conv_post": _wn_conv(sd, "conv_post"),
        "m_source": {
            "l_linear": {
                "kernel": linear_kernel(sd["m_source.l_linear.weight"]),
                "bias": sd["m_source.l_linear.bias"],
            }
        },
    }
    n_ups = len(config["upsample_rates"])
    n_kernels = len(config["resblock_kernel_sizes"])
    for i in range(n_ups):
        params[f"ups_{i}"] = _wn_convt(sd, f"ups.{i}")
        params[f"noise_convs_{i}"] = {
            "kernel": conv1d_kernel(sd[f"noise_convs.{i}.weight"]),
            "bias": sd[f"noise_convs.{i}.bias"],
        }
    resblock1 = str(config.get("resblock", "1")) == "1"
    for idx in range(n_ups * n_kernels):
        block: dict = {}
        n_dil = len(config["resblock_dilation_sizes"][idx % n_kernels])
        for j in range(n_dil):
            if resblock1:
                block[f"convs1_{j}"] = _wn_conv(sd, f"resblocks.{idx}.convs1.{j}")
                block[f"convs2_{j}"] = _wn_conv(sd, f"resblocks.{idx}.convs2.{j}")
            else:
                block[f"convs_{j}"] = _wn_conv(sd, f"resblocks.{idx}.convs.{j}")
        params[f"resblocks_{idx}"] = block
    return params


def convert_nsf_hifigan(ckpt_path: str, out_path: str | None = None) -> None:
    """ckpt_path: the 'model' file; config.json must sit next to it
    (nsf_hifigan/models.py:27-34)."""
    from flax import serialization

    with open(os.path.join(os.path.dirname(ckpt_path), "config.json")) as f:
        config = json.load(f)
    sd = load_state_dict(ckpt_path)
    params = convert_nsf_hifigan_state_dict(sd, config)
    keep = (
        "sampling_rate", "num_mels", "n_fft", "win_size", "hop_size", "fmin",
        "fmax", "upsample_rates", "upsample_kernel_sizes",
        "upsample_initial_channel", "resblock", "resblock_kernel_sizes",
        "resblock_dilation_sizes",
    )
    payload = {
        "params": params,
        "config": {k: config[k] for k in keep if k in config},
    }
    out_path = out_path or ckpt_path + ".msgpack"
    with open(out_path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    print(f" [*] nsf-hifigan: {ckpt_path} -> {out_path}")
