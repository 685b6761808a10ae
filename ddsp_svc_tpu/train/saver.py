"""Experiment saver: expdir management, text/TensorBoard logging, checkpoints.

Parity with logger/saver.py:23-152: expdir layout, config snapshot,
log_info.txt, TensorBoard scalars/spec-figures/audio, model_<step> saves
with retention, wall-time tracking.
"""
from __future__ import annotations

import datetime
import os
import time

import numpy as np
import yaml

from . import checkpoint as ckpt


class Saver:
    def __init__(self, args, initial_global_step: int = -1):
        self.expdir = args.env.expdir
        self.sample_rate = args.data.sampling_rate
        self.global_step = initial_global_step
        self.init_time = time.time()
        self.last_time = time.time()

        os.makedirs(self.expdir, exist_ok=True)
        self.path_log_info = os.path.join(self.expdir, "log_info.txt")

        # save config snapshot (logger/saver.py:43-46)
        with open(os.path.join(self.expdir, "config.yaml"), "w") as f:
            yaml.safe_dump(_plain(args), f, sort_keys=False)

        self.writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(os.path.join(self.expdir, "logs"))
        except Exception:
            pass

    def log_info(self, msg: str) -> None:
        if isinstance(msg, dict):
            msg_list = []
            for k, v in msg.items():
                if isinstance(v, dict):
                    msg_list.append(f"{k}:")
                    msg_list += [f" {kk}: {vv}" for kk, vv in v.items()]
                else:
                    msg_list.append(f"{k}: {v}")
            msg = "\n".join(msg_list)
        print(msg)
        with open(self.path_log_info, "a") as f:
            f.write(msg + "\n")

    def log_value(self, dct: dict) -> None:
        if self.writer is not None:
            for k, v in dct.items():
                self.writer.add_scalar(k, float(v), self.global_step)

    def log_audio(self, dct: dict) -> None:
        if self.writer is not None:
            for k, v in dct.items():
                self.writer.add_audio(
                    k, np.asarray(v).reshape(-1, 1), self.global_step,
                    sample_rate=self.sample_rate,
                )

    def log_spec(self, name: str, spec, spec_out) -> None:
        """diff | gt | pred mel panel (logger/saver.py:76-84)."""
        if self.writer is None:
            return
        try:
            import matplotlib.pyplot as plt

            gt = np.asarray(spec).squeeze().T
            pred = np.asarray(spec_out).squeeze().T
            panel = np.concatenate([pred - gt, gt, pred], axis=0)
            fig = plt.figure(figsize=(12, 9))
            plt.pcolor(panel, vmin=-9, vmax=2)
            plt.tight_layout()
            self.writer.add_figure(name, fig, self.global_step)
            plt.close(fig)
        except Exception:
            pass

    def get_interval_time(self) -> float:
        now = time.time()
        dt = now - self.last_time
        self.last_time = now
        return dt

    def get_total_time(self, to_str: bool = True):
        total = time.time() - self.init_time
        return str(datetime.timedelta(seconds=total))[:-5] if to_str else total

    def save_model(
        self, params, opt_state=None, postfix: str | int | None = None
    ) -> str:
        step = self.global_step if postfix is None else postfix
        path = ckpt.save_checkpoint(self.expdir, int(step), params, opt_state)
        self.log_info(f" [*] model saved: {path}")
        return path

    def delete_model(self, postfix: int) -> None:
        ckpt.delete_checkpoint(self.expdir, postfix)

    def global_step_increment(self) -> None:
        self.global_step += 1


def _plain(x):
    if isinstance(x, dict):
        return {k: _plain(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_plain(v) for v in x]
    return x
