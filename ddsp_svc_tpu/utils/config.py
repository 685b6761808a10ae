"""YAML config system.

Keeps the exact on-disk schema of the reference (see /root/reference
configs/*.yaml and logger/utils.py:49-73) so user workflows, expdirs and
checkpoint-adjacent ``config.yaml`` files carry over unchanged, while adding
light validation helpers.
"""
from __future__ import annotations

import os
from typing import Any

import yaml


class DotDict(dict):
    """dict with attribute access; nested dicts are wrapped lazily.

    Mirrors the reference DotDict (logger/utils.py:49-55): missing keys
    return None instead of raising, which the config schema relies on
    (e.g. optional ``model.use_pitch_aug``).
    """

    def __getattr__(*args):
        val = dict.get(*args)
        return DotDict(val) if type(val) is dict else val

    __setattr__ = dict.__setitem__
    __delattr__ = dict.__delitem__


def load_config(path_config: str | os.PathLike) -> DotDict:
    """Load a YAML config into a DotDict (reference logger/utils.py:68-73)."""
    with open(path_config, "r") as f:
        args = yaml.safe_load(f)
    return DotDict(args)


def save_config(path_config: str | os.PathLike, config: dict) -> None:
    with open(path_config, "w") as f:
        yaml.safe_dump(_plain(config), f, sort_keys=False)


def _plain(x: Any) -> Any:
    if isinstance(x, dict):
        return {k: _plain(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_plain(v) for v in x]
    return x


def traverse_dir(
    root_dir: str,
    extensions: list[str],
    amount: int | None = None,
    str_include: str | None = None,
    str_exclude: str | None = None,
    is_pure: bool = False,
    is_sort: bool = False,
    is_ext: bool = True,
):
    """Recursively collect files by extension (reference logger/utils.py:12-47)."""
    file_list = []
    cnt = 0
    for root, _, files in os.walk(root_dir):
        for file in files:
            # the reference matches '.{ext}' (logger/utils.py:21) — a bare
            # endswith(ext) would also collect e.g. 'notes_wav'
            if any(file.endswith(f".{ext.lstrip('.')}") for ext in extensions):
                mix_path = os.path.join(root, file)
                pure_path = mix_path[len(root_dir) + 1 :] if is_pure else mix_path
                if amount is not None and cnt == amount:
                    if is_sort:
                        file_list.sort()
                    return file_list
                if str_include is not None and str_include not in pure_path:
                    continue
                if str_exclude is not None and str_exclude in pure_path:
                    continue
                if not is_ext:
                    ext = pure_path.split(".")[-1]
                    pure_path = pure_path[: -(len(ext) + 1)]
                file_list.append(pure_path)
                cnt += 1
    if is_sort:
        file_list.sort()
    return file_list
