"""Device mesh & sharding helpers.

The reference is single-device (SURVEY.md §2.9: no torch.distributed anywhere;
train.py:85-86 pins one GPU). The TPU framework is SPMD from the start:

  - axis ``data``: data parallelism — the batch dimension of every step is
    sharded across chips; gradients are all-reduced over ICI by XLA when the
    jitted train step closes over replicated params.
  - axis ``time``: sequence parallelism — frame/sample time axes of a batch
    can additionally be sharded; the conformer depthwise convs (k=31) and
    STFT framing have finite receptive fields, so XLA inserts halo-exchange
    collectives automatically under pjit.

``make_mesh(n, dp, sp)`` builds a (data, time) mesh; helpers produce
NamedShardings for batches (leading-axis data, second-axis time for rank>=2
feature arrays) and replicated params.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    dp: int | None = None,
    sp: int = 1,
    devices=None,
) -> Mesh:
    """Create a 2D (data, time) mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if dp is None:
        dp = n_devices // sp
    assert dp * sp == n_devices, f"dp({dp}) * sp({sp}) != n_devices({n_devices})"
    dev_array = np.asarray(devices).reshape(dp, sp)
    return Mesh(dev_array, ("data", "time"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, shard_time: bool = False) -> NamedSharding:
    """Sharding for a batch array: axis0 over 'data', axis1 over 'time' if
    requested (only meaningful for (B, T, ...) feature arrays)."""
    if ndim == 0:
        return NamedSharding(mesh, P())
    spec = ["data"] + [None] * (ndim - 1)
    if shard_time and ndim >= 2:
        spec[1] = "time"
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, batch, shard_time: bool = False):
    """device_put a pytree of batch arrays with data(+time) sharding.

    Time sharding is applied per leaf only where it is valid: axis 1 must
    exist and be divisible by the mesh's time extent (a (B, 1) spk_id or
    (B, 1, 1) aug_shift rides along replicated on 'time')."""
    tsize = dict(mesh.shape).get("time", 1)

    def put(x):
        nd = getattr(x, "ndim", 0)
        st = (
            shard_time and nd >= 2 and tsize > 1
            and x.shape[1] % tsize == 0
        )
        return jax.device_put(x, batch_sharding(mesh, nd, st))

    return jax.tree_util.tree_map(put, batch)
