"""Shared torch-checkpoint conversion helpers (numpy only — no torch needed
at load time; state dicts are read with torch.load when available, or passed
in directly as {name: ndarray})."""
from __future__ import annotations

import numpy as np


def load_state_dict(path: str) -> dict:
    """torch.load a checkpoint file -> {key: numpy array}. Accepts raw state
    dicts or {'model': ...} / {'generator': ...} wrappers."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for wrapper in ("model", "generator", "state_dict"):
        if isinstance(ckpt, dict) and wrapper in ckpt and isinstance(
            ckpt[wrapper], dict
        ):
            ckpt = ckpt[wrapper]
            break
    out = {}
    for k, v in ckpt.items():
        if hasattr(v, "detach"):
            out[k.replace("module.", "")] = v.detach().cpu().numpy()
    return out


def conv1d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv1d (out, in/g, k) -> flax (k, in/g, out)."""
    return np.ascontiguousarray(w.transpose(2, 1, 0))


def convtranspose1d_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose1d (in, out, k) -> our ConvTranspose1d (k, in, out)."""
    return np.ascontiguousarray(w.transpose(2, 0, 1))


def conv2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d (out, in, kh, kw) -> flax (kh, kw, in, out)."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def convtranspose2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose
    (kh, kw, in, out)."""
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear (out, in) -> flax (in, out)."""
    return np.ascontiguousarray(w.T)


def fold_weight_norm(g: np.ndarray, v: np.ndarray, dim: int = 0) -> np.ndarray:
    """Fold torch weight_norm(weight_g, weight_v) into a plain weight:
    w = g * v / ||v|| with the norm over all dims except ``dim``."""
    axes = tuple(i for i in range(v.ndim) if i != dim)
    norm = np.sqrt((v**2).sum(axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def mha_params(wq, wk, wv, bq, bk, bv, wo, bo, num_heads: int) -> dict:
    """torch per-head-packed projections -> flax MultiHeadDotProductAttention
    params. w*: (d, d) torch layout (out, in); b*: (d,)."""
    d = wq.shape[0]
    head = d // num_heads

    def split_proj(w, b):
        return {
            "kernel": np.ascontiguousarray(w.T.reshape(d, num_heads, head)),
            "bias": np.ascontiguousarray(b.reshape(num_heads, head)),
        }

    return {
        "query": split_proj(wq, bq),
        "key": split_proj(wk, bk),
        "value": split_proj(wv, bv),
        "out": {
            "kernel": np.ascontiguousarray(wo.T.reshape(num_heads, head, d)),
            "bias": np.asarray(bo),
        },
    }


def check_tree_shapes(converted: dict, template: dict, path: str = "") -> list[str]:
    """Compare converted params against a model.init template; returns a list
    of mismatch descriptions (empty == exact structural match)."""
    problems = []
    t_keys = set(template.keys())
    c_keys = set(converted.keys())
    for k in sorted(t_keys - c_keys):
        problems.append(f"missing {path}/{k}")
    for k in sorted(c_keys - t_keys):
        problems.append(f"unexpected {path}/{k}")
    for k in sorted(t_keys & c_keys):
        tv, cv = template[k], converted[k]
        if isinstance(tv, dict):
            if not isinstance(cv, dict):
                problems.append(f"type mismatch at {path}/{k}")
            else:
                problems += check_tree_shapes(cv, tv, f"{path}/{k}")
        else:
            if np.shape(cv) != np.shape(tv):
                problems.append(
                    f"shape {path}/{k}: {np.shape(cv)} vs {np.shape(tv)}"
                )
    return problems
