"""torchcrepe 'full' .pth -> flax Crepe params (features/crepe.py)."""
from __future__ import annotations

import numpy as np

from .common import conv2d_kernel, linear_kernel, load_state_dict


def convert_crepe_state_dict(sd: dict) -> dict:
    params: dict = {}
    stats: dict = {}
    for i in range(1, 7):
        params[f"conv{i}"] = {
            "kernel": conv2d_kernel(sd[f"conv{i}.weight"]),
            "bias": sd[f"conv{i}.bias"],
        }
        params[f"bn{i}"] = {
            "scale": sd[f"conv{i}_BN.weight"],
            "bias": sd[f"conv{i}_BN.bias"],
        }
        stats[f"bn{i}"] = {
            "mean": sd[f"conv{i}_BN.running_mean"],
            "var": sd[f"conv{i}_BN.running_var"],
        }
    params["classifier"] = {
        "kernel": linear_kernel(sd["classifier.weight"]),
        "bias": sd["classifier.bias"],
    }
    return {"params": params, "batch_stats": stats}


def convert_crepe(ckpt_path: str, out_path: str | None = None) -> None:
    from flax import serialization

    sd = load_state_dict(ckpt_path)
    variables = convert_crepe_state_dict(sd)
    out_path = out_path or ckpt_path.rsplit(".", 1)[0] + ".msgpack"
    with open(out_path, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))
    print(f" [*] crepe: {ckpt_path} -> {out_path}")
