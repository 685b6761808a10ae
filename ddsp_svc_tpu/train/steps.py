"""Jittable train / eval steps for every model family.

One step = forward + loss + grad + optimizer update, designed to be jitted
over a (data, time) mesh (parallel/mesh.py): the caller shards the batch on
axis0 ('data'); params/opt_state are replicated, so XLA all-reduces grads
over ICI automatically — the TPU replacement for the reference's single-GPU
loops (solver.py:69-148, diffusion/solver_new.py:94-204, reflow/solver.py).

Loss functions per family:
  - DDSP synths: RSS multi-scale spectral loss (ddsp/loss.py:34-54).
  - Diffusion cascades: lambda_ddsp * MSE(ddsp_mel, gt_mel) + diffusion l2
    (diffusion/solver_new.py:142).
  - Unit2Mel: diffusion l2 only (diffusion/solver.py:102-141).
  - Reflow cascade: lambda_ddsp * MSE + lognorm-weighted flow l2
    (reflow/solver.py:193-305, reflow/reflow.py:20-35).

bf16 mixed precision: pass ``compute_dtype=jnp.bfloat16`` — params stay f32,
activations run in bf16 via the model's dtype attr (the amp_dtype analogue,
diffusion/solver.py:102-141).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.losses import RSSLoss


def make_ddsp_train_step(
    loss_fft_min: int = 256,
    loss_fft_max: int = 2048,
    n_scale: int = 4,
    donate: bool = True,
):
    """Train step for Sins/CombSub* models (solver.py:88-108)."""
    rss = RSSLoss(loss_fft_min, loss_fft_max, n_scale)

    def loss_fn(params, apply_fn, batch, key):
        key_noise, key_loss = jax.random.split(key)
        signal, _, _ = apply_fn(
            {"params": params},
            batch["units"],
            batch["f0"],
            batch["volume"],
            spk_id=batch.get("spk_id"),
            infer=False,
            deterministic=False,
            rngs={"noise": key_noise},
        )
        loss = rss(signal, batch["audio"], key_loss)
        return loss, signal

    def step(state, batch, key):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.apply_fn, batch, key
        )
        return state.apply_gradients(grads), {"loss": loss}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_cascade_train_step(
    mel_extract_fn: Callable,
    lambda_ddsp: float = 1.0,
    k_step_max: int | None = None,
    family: str = "diffusion",
    t_start: float = 0.0,
    donate: bool = True,
):
    """Train step for Unit2Wav / Unit2WavFast / ReflowUnit2Wav cascades.

    ``family``: 'diffusion' (solver_new.py:94-204) or 'reflow'
    (reflow/solver.py:193-305). The batch may carry 'aug_shift' (pitch-aug
    pairs, diffusion/data_loaders.py:237-273).
    """

    def loss_fn(params, apply_fn, batch, key):
        key_noise, key_diff = jax.random.split(key)
        kwargs = dict(
            spk_id=batch.get("spk_id"),
            aug_shift=batch.get("aug_shift"),
            mel_extract_fn=mel_extract_fn,
            gt_spec=batch["mel"],
            infer=False,
            key=key_diff,
            deterministic=False,
        )
        if family == "diffusion":
            kwargs["k_step"] = k_step_max
        else:  # reflow: train-time t ~ U[t_start, 1] (reflow/reflow.py:63-68)
            kwargs["t_start"] = t_start
        ddsp_loss, diff_loss = apply_fn(
            {"params": params},
            batch["units"],
            batch["f0"],
            batch["volume"],
            rngs={"noise": key_noise},
            **kwargs,
        )
        loss = lambda_ddsp * ddsp_loss + diff_loss
        return loss, (ddsp_loss, diff_loss)

    def step(state, batch, key):
        (loss, (ddsp_loss, diff_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.apply_fn, batch, key)
        metrics = {"loss": loss, "ddsp_loss": ddsp_loss, "diff_loss": diff_loss}
        return state.apply_gradients(grads), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_unit2mel_train_step(k_step_max: int | None = None, donate: bool = True):
    """Train step for the pure-diffusion Unit2Mel (diffusion/solver.py)."""

    def loss_fn(params, apply_fn, batch, key):
        diff_loss = apply_fn(
            {"params": params},
            batch["units"],
            batch["f0"],
            batch["volume"],
            spk_id=batch.get("spk_id"),
            aug_shift=batch.get("aug_shift"),
            gt_spec=batch["mel"],
            infer=False,
            k_step=k_step_max,
            key=key,
            deterministic=False,
        )
        return diff_loss, ()

    def step(state, batch, key):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.apply_fn, batch, key
        )
        return state.apply_gradients(grads), {"loss": loss}

    return jax.jit(step, donate_argnums=(0,) if donate else ())
