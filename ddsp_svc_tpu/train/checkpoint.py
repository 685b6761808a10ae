"""Checkpoint save / resume with the reference's expdir contract.

Reference behaviours matched (logger/saver.py:104-147, logger/utils.py:97-122):
  - checkpoints live in ``<expdir>/model_<step>.ckpt``;
  - resume scans the expdir for the highest numeric suffix;
  - a ``model_0`` dropped into a fresh expdir warm-starts fine-tuning
    (README.md:33-35 contract) — loading is shape-tolerant: params present
    in the ckpt but absent from the model (or mismatched) are skipped, like
    the reference's ``strict=False``;
  - retention: delete the previous checkpoint unless its step is a multiple
    of ``interval_force_save`` (diffusion/solver_new.py:182-185).

Format: a single msgpack file holding
  {"global_step", "params", "opt_state"?} serialized with
flax.serialization — single-file like the reference's ``model_<step>.pt``,
readable without the model class.
"""
from __future__ import annotations

import os
import re

import jax
import numpy as np
from flax import serialization

CKPT_RE = re.compile(r"model_(\d+)\.ckpt$")


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    expdir: str,
    step: int,
    params,
    opt_state=None,
    extra: dict | None = None,
) -> str:
    os.makedirs(expdir, exist_ok=True)
    payload = {"global_step": int(step), "params": _to_host(params)}
    if opt_state is not None:
        # optax opt_states are (named)tuples, which msgpack cannot encode;
        # to_state_dict turns them into nested dicts ('0', '1', ...) that
        # restore_opt_state maps back through the live template
        payload["opt_state"] = serialization.to_state_dict(_to_host(opt_state))
    if extra:
        payload.update(extra)
    path = os.path.join(expdir, f"model_{step}.ckpt")
    # atomic: a crash mid-write must never leave a truncated model_<step>
    # that latest_checkpoint() would then pick up and brick the resume
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)
    return path


def latest_checkpoint(expdir: str) -> str | None:
    """Highest-step model_<step>.ckpt in expdir (logger/utils.py:97-122)."""
    if not os.path.isdir(expdir):
        return None
    best, best_step = None, -1
    for name in os.listdir(expdir):
        m = CKPT_RE.match(name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(expdir, name)
    return best


def load_checkpoint(path: str):
    """Returns (payload_dict, step). payload['params'] is a raw dict of
    numpy arrays suitable for flax apply after ``restore_into``."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return payload, int(payload.get("global_step", 0))


def restore_into(template, loaded, strict: bool = False, path: str = ""):
    """Merge ``loaded`` (raw dict tree) into ``template`` pytree, skipping
    mismatched/missing leaves when strict=False (torch strict=False parity)."""
    if isinstance(template, dict):
        out = {}
        for k, tv in template.items():
            if isinstance(loaded, dict) and k in loaded:
                out[k] = restore_into(tv, loaded[k], strict, f"{path}/{k}")
            else:
                if strict:
                    raise KeyError(f"missing checkpoint key {path}/{k}")
                out[k] = tv
        return out
    arr = np.asarray(loaded)
    t = np.asarray(template)
    if arr.shape != t.shape:
        if strict:
            raise ValueError(f"shape mismatch at {path}: {arr.shape} vs {t.shape}")
        return template
    return arr.astype(t.dtype)


def restore_opt_state(template_opt_state, loaded):
    """Rebuild an optax opt_state from its saved state-dict form using the
    live state as the structural template (tuples/namedtuples round-trip
    through flax.serialization). Returns the template unchanged (with a
    warning) when the saved tree does not match — e.g. the optimizer chain
    changed between runs."""
    try:
        return serialization.from_state_dict(template_opt_state, loaded)
    except Exception as e:  # structure mismatch: warm-start without opt
        print(f" [!] opt_state restore skipped ({type(e).__name__}: "
              f"{str(e)[:120]})")
        return template_opt_state


def delete_checkpoint(expdir: str, step: int) -> None:
    path = os.path.join(expdir, f"model_{step}.ckpt")
    if os.path.exists(path):
        os.remove(path)


def apply_retention(expdir: str, prev_step: int, interval_force_save: int) -> None:
    """Delete prev ckpt unless step % interval_force_save == 0
    (diffusion/solver_new.py:182-185)."""
    if prev_step >= 0 and (
        interval_force_save <= 0 or prev_step % interval_force_save != 0
    ):
        delete_checkpoint(expdir, prev_step)
