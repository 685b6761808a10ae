"""Converted-parameter loading shared by the CLI builders and the feature
front-end (one loader, one set of messages — the feature classes must not
reach into cli/)."""
from __future__ import annotations

import os

import numpy as np


def load_params(path: str | None):
    """Load converted flax params (.npz/.msgpack) if present, else None
    (converters live in convert/)."""
    if not path:
        return None
    if os.path.exists(path) and path.endswith(".msgpack"):
        from flax import serialization

        with open(path, "rb") as f:
            return serialization.msgpack_restore(f.read())
    if os.path.exists(path) and path.endswith(".npz"):
        from ..convert.flatdict import unflatten

        return unflatten(dict(np.load(path)))
    return None
