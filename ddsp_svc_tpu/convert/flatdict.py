"""Flat <-> nested param-dict helpers for .npz param files."""
from __future__ import annotations

import numpy as np


def flatten(tree: dict, prefix: str = "", sep: str = ".") -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{sep}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten(v, key, sep))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten(flat: dict, sep: str = ".") -> dict:
    out: dict = {}
    for k, v in flat.items():
        parts = k.split(sep)
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return out
