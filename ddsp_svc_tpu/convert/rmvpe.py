"""RMVPE torch checkpoint -> flax E2E0 params (features/rmvpe.py).

Source layout: encoder/rmvpe (E2E0(4, 1, (2,2))): DeepUnet0 ConvBlockRes
sequences with BatchNorms, ConvTranspose decoders, 3-ch head conv, 1-layer
BiGRU, 360-class linear. TimbreFilter weights exist in the checkpoint but
are unused by the DeepUnet0 forward (deepunet.py:196-208) and are skipped.
"""
from __future__ import annotations

import numpy as np

from .common import (
    conv2d_kernel,
    convtranspose2d_kernel,
    linear_kernel,
    load_state_dict,
)


def _bn(sd, pre):
    return (
        {"scale": sd[pre + ".weight"], "bias": sd[pre + ".bias"]},
        {"mean": sd[pre + ".running_mean"], "var": sd[pre + ".running_var"]},
    )


def _conv_block_res(sd, pre):
    """torch ConvBlockRes '<pre>.conv.{0,1,3,4}' (+ optional shortcut)."""
    params, stats = {}, {}
    params["conv1"] = {"kernel": conv2d_kernel(sd[pre + ".conv.0.weight"])}
    params["bn1"], stats["bn1"] = _bn(sd, pre + ".conv.1")
    params["conv2"] = {"kernel": conv2d_kernel(sd[pre + ".conv.3.weight"])}
    params["bn2"], stats["bn2"] = _bn(sd, pre + ".conv.4")
    if pre + ".shortcut.weight" in sd:
        params["shortcut"] = {
            "kernel": conv2d_kernel(sd[pre + ".shortcut.weight"]),
            "bias": sd[pre + ".shortcut.bias"],
        }
    return params, stats


def _res_blocks(sd, pre, n_blocks):
    params, stats = {}, {}
    for j in range(n_blocks):
        p, s = _conv_block_res(sd, f"{pre}.conv.{j}")
        params[f"block{j}"] = p
        stats[f"block{j}"] = s
    return params, stats


def _gru_cell(w_ih, w_hh, b_ih, b_hh):
    h = w_hh.shape[1]

    def rows(w, i):
        return w[i * h : (i + 1) * h]

    return {
        "ir": {"kernel": linear_kernel(rows(w_ih, 0)),
               "bias": rows(b_ih, 0) + rows(b_hh, 0)},
        "iz": {"kernel": linear_kernel(rows(w_ih, 1)),
               "bias": rows(b_ih, 1) + rows(b_hh, 1)},
        "in": {"kernel": linear_kernel(rows(w_ih, 2)), "bias": rows(b_ih, 2)},
        "hr": {"kernel": linear_kernel(rows(w_hh, 0))},
        "hz": {"kernel": linear_kernel(rows(w_hh, 1))},
        "hn": {"kernel": linear_kernel(rows(w_hh, 2)), "bias": rows(b_hh, 2)},
    }


def convert_rmvpe_state_dict(
    sd: dict, en_de_layers: int = 5, inter_layers: int = 4, n_blocks: int = 4
) -> dict:
    params: dict = {"unet": {}}
    stats: dict = {"unet": {}}

    params["unet"]["in_bn"], stats["unet"]["in_bn"] = _bn(sd, "unet.encoder.bn")
    for i in range(en_de_layers):
        p, s = _res_blocks(sd, f"unet.encoder.layers.{i}", n_blocks)
        params["unet"][f"enc{i}"] = p
        stats["unet"][f"enc{i}"] = s
    for i in range(inter_layers):
        p, s = _res_blocks(sd, f"unet.intermediate.layers.{i}", n_blocks)
        params["unet"][f"inter{i}"] = p
        stats["unet"][f"inter{i}"] = s
    for i in range(en_de_layers):
        dec_p: dict = {
            "deconv": {
                "kernel": convtranspose2d_kernel(
                    sd[f"unet.decoder.layers.{i}.conv1.0.weight"]
                )
            }
        }
        dec_s: dict = {}
        dec_p["bn1"], dec_s["bn1"] = _bn(sd, f"unet.decoder.layers.{i}.conv1.1")
        for j in range(n_blocks):
            p, s = _conv_block_res(sd, f"unet.decoder.layers.{i}.conv2.{j}")
            dec_p[f"block{j}"] = p
            dec_s[f"block{j}"] = s
        params["unet"][f"dec{i}"] = dec_p
        stats["unet"][f"dec{i}"] = dec_s

    params["cnn"] = {"kernel": conv2d_kernel(sd["cnn.weight"]),
                     "bias": sd["cnn.bias"]}
    params["gru"] = {
        "fw": _gru_cell(
            sd["fc.0.gru.weight_ih_l0"], sd["fc.0.gru.weight_hh_l0"],
            sd["fc.0.gru.bias_ih_l0"], sd["fc.0.gru.bias_hh_l0"],
        ),
        "bw": _gru_cell(
            sd["fc.0.gru.weight_ih_l0_reverse"], sd["fc.0.gru.weight_hh_l0_reverse"],
            sd["fc.0.gru.bias_ih_l0_reverse"], sd["fc.0.gru.bias_hh_l0_reverse"],
        ),
    }
    params["fc"] = {"kernel": linear_kernel(sd["fc.1.weight"]),
                    "bias": sd["fc.1.bias"]}
    return {"params": params, "batch_stats": stats}


def convert_rmvpe(ckpt_path: str, out_path: str | None = None) -> None:
    from flax import serialization

    sd = load_state_dict(ckpt_path)
    variables = convert_rmvpe_state_dict(sd)
    out_path = out_path or ckpt_path.rsplit(".", 1)[0] + ".msgpack"
    with open(out_path, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))
    print(f" [*] rmvpe: {ckpt_path} -> {out_path}")
