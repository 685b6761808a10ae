"""Train state: optax AdamW + the reference's step-decayed LR schedule.

Reference behaviours matched:
  - AdamW with config lr/weight_decay forced on resume (train.py:75-79);
  - StepLR ``lr * gamma ** (step // decay_step)`` resume-aware
    (train_diff.py:76-80) — expressed as an optax schedule so it is pure.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct


def make_lr_schedule(
    lr: float, decay_step: int | None, gamma: float | None
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if not decay_step or not gamma or gamma == 1.0:
        return lambda step: jnp.asarray(lr)
    return lambda step: lr * jnp.power(gamma, jnp.floor_divide(step, decay_step))


class TrainState(struct.PyTreeNode):
    """Minimal flax-style train state (apply_fn/tx static, rest pytree)."""

    step: jnp.ndarray
    params: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def create_train_state(
    model,
    params,
    lr: float = 5e-4,
    weight_decay: float = 0.0,
    decay_step: int | None = None,
    gamma: float | None = None,
    grad_clip: float | None = None,
    start_step: int = 0,
) -> TrainState:
    schedule = make_lr_schedule(lr, decay_step, gamma)
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(
        optax.adamw(learning_rate=schedule, weight_decay=weight_decay, b1=0.9, b2=0.999)
    )
    tx = optax.chain(*chain)
    opt_state = tx.init(params)
    if start_step:
        # resume-aware StepLR (reference train_diff.py:76-80 forces the
        # scheduler to the resumed global step): the schedule is driven by
        # optax's internal count, which init() starts at 0 — fast-forward
        # every count leaf so lr resumes at lr*gamma**(step/decay) instead
        # of silently restarting at full lr. Counts saved in checkpoints
        # are therefore absolute global steps (restore overwrites these).
        from flax import serialization

        sd = serialization.to_state_dict(opt_state)

        def fix(d):
            for k, v in d.items():
                if k == "count":
                    d[k] = np.asarray(start_step, np.int32)
                elif isinstance(v, dict):
                    fix(v)

        fix(sd)
        opt_state = serialization.from_state_dict(opt_state, sd)
    return TrainState(
        step=jnp.asarray(start_step, jnp.int32),
        params=params,
        opt_state=opt_state,
        apply_fn=model.apply,
        tx=tx,
    )


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
