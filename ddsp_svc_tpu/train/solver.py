"""Unified training loop for all model families.

Replaces the reference's four near-identical solvers (solver.py,
diffusion/solver.py, diffusion/solver_new.py, reflow/solver.py) with one
loop parameterized by model family:

  family 'ddsp'     — RSS spectral loss on waveform (solver.py:69-148)
  family 'unit2mel' — pure mel diffusion (diffusion/solver.py:86-195)
  family 'diffusion'— cascade: lambda_ddsp*MSE + diffusion l2
                      (diffusion/solver_new.py:94-204)
  family 'reflow'   — cascade with lognorm flow loss + mel SNR/PSNR/SI-SNR
                      validation metrics (reflow/solver.py:151-189)

TPU structure: one jitted step over a (data, time) mesh — batch sharded on
'data', params replicated, grads all-reduced by XLA; batches assembled
host-side by data/dataset.BatchSampler, one device_put per step. NaN loss
raises (solver.py:99-100). Checkpoints follow the model_<step> + retention
contract.
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from ..data.dataset import AudioDataset, BatchSampler
from ..ops.losses import mel_psnr, mel_si_snr, mel_snr, rss_loss
from ..parallel.mesh import batch_sharding, replicate
from .saver import Saver
from .steps import (
    make_cascade_train_step,
    make_ddsp_train_step,
    make_unit2mel_train_step,
)

FAMILIES = {
    "Sins": "ddsp",
    "CombSub": "ddsp",
    "CombSubFast": "ddsp",
    "CombSubSuperFast": "ddsp",
    "Diffusion": "unit2mel",
    "DiffusionNew": "diffusion",
    "DiffusionFast": "diffusion",
    "RectifiedFlow": "reflow",
}


def model_family(model_type: str) -> str:
    try:
        return FAMILIES[model_type]
    except KeyError:
        raise ValueError(f" [x] Unknown Model: {model_type}") from None


def build_train_step(args, mel_extract_fn=None):
    family = model_family(args.model.type)
    if family == "ddsp":
        loss_cfg = args.loss or {}
        return family, make_ddsp_train_step(
            loss_fft_min=loss_cfg.get("fft_min", 256),
            loss_fft_max=loss_cfg.get("fft_max", 2048),
            n_scale=loss_cfg.get("n_scale", 4),
        )
    if family == "unit2mel":
        return family, make_unit2mel_train_step(
            k_step_max=args.model.k_step_max or 1000
        )
    t_start = float(args.model.t_start or 0.0) if family == "reflow" else 0.0
    return family, make_cascade_train_step(
        mel_extract_fn,
        lambda_ddsp=float(args.train.lambda_ddsp or 1.0),
        k_step_max=(args.model.k_step_max or 1000) if family == "diffusion" else None,
        family=family,
        t_start=t_start,
    )


def _sync(x):
    jax.effects_barrier()
    return np.asarray(x)


def validate(args, family, model, params, valid: AudioDataset, saver: Saver,
             mel_extract_fn=None):
    """Full-length validation pass: loss/metrics + RTF (solver.py:9-66)."""
    results = {}
    num = 0
    rng = np.random.default_rng(0)
    total_rtf = []
    for name_ext in valid.paths:
        item = valid.sample_crop(name_ext, rng)
        batch = {
            k: jnp.asarray(v)[None, ...] for k, v in item.items() if k != "name"
        }
        key = jax.random.PRNGKey(num)
        start = time.time()
        if family == "ddsp":
            signal, _, _ = model.apply(
                {"params": params},
                batch["units"], batch["f0"], batch["volume"],
                spk_id=batch.get("spk_id"), infer=True,
                rngs={"noise": key},
            )
            signal = _sync(signal)
            run_time = time.time() - start
            loss = float(_sync(rss_loss(
                jnp.asarray(signal), batch["audio"], key
            )))
            metrics = {"validation/loss": loss}
            saver.log_audio({f"{name_ext}/audio": signal[0]})
            song_time = signal.shape[-1] / args.data.sampling_rate
        else:
            kwargs = {}
            if family in ("diffusion", "unit2mel"):
                kwargs = dict(
                    infer_speedup=args.infer.speedup or 10,
                    sampler=args.infer.method or "dpm-solver",
                    k_step=args.model.k_step_max or 1000,
                )
            else:
                kwargs = dict(
                    infer_step=args.infer.infer_step or 10,
                    sampler=args.infer.method or "euler",
                    t_start=float(args.model.t_start or 0.0),
                )
            if family != "unit2mel":
                kwargs["mel_extract_fn"] = mel_extract_fn
            mel_pred = model.apply(
                {"params": params},
                batch["units"], batch["f0"], batch["volume"],
                spk_id=batch.get("spk_id"), gt_spec=batch["mel"],
                infer=True, key=key, rngs={"noise": key}, **kwargs,
            )
            mel_pred = _sync(mel_pred)
            run_time = time.time() - start
            gt = np.asarray(batch["mel"])
            metrics = {
                "validation/mse": float(np.mean((mel_pred - gt) ** 2)),
                "validation/snr": float(_sync(mel_snr(jnp.asarray(gt), jnp.asarray(mel_pred)))),
                "validation/si_snr": float(_sync(mel_si_snr(jnp.asarray(gt), jnp.asarray(mel_pred)))),
                "validation/psnr": float(_sync(mel_psnr(jnp.asarray(gt), jnp.asarray(mel_pred)))),
            }
            saver.log_spec(f"{name_ext}/spec", gt, mel_pred)
            song_time = mel_pred.shape[1] * args.data.block_size / args.data.sampling_rate
        rtf = run_time / max(song_time, 1e-9)
        total_rtf.append(rtf)
        num += 1
        for k, v in metrics.items():
            results[k] = results.get(k, 0.0) + v
    results = {k: v / max(num, 1) for k, v in results.items()}
    results["validation/rtf"] = float(np.mean(total_rtf)) if total_rtf else 0.0
    return results


def train(args, model, state, mesh=None, mel_extract_fn=None,
          initial_step: int = 0):
    """The main loop (reference solver.train contract)."""
    family, step_fn = build_train_step(args, mel_extract_fn)
    saver = Saver(args, initial_global_step=initial_step)

    from ..data.dataset import get_datasets

    train_ds, valid_ds = get_datasets(
        args, rank=jax.process_index(), world_size=jax.process_count()
    )
    # data-stream seed: config seed + resumed step, so (a) different seeds
    # draw different file/crop/gain sequences and (b) a resumed run
    # continues with fresh batches instead of replaying the head of the
    # stream (the sampler RNG is not checkpointed)
    data_seed = int(args.train.seed or 0) + initial_step
    if not bool(args.train.cache_all_data) and not train_ds.with_mel:
        # uncached corpus: native C++ prefetcher overlaps the crop IO with
        # the device step (the torch DataLoader(num_workers) equivalent)
        from ..data.prefetch import PrefetchBatchSampler

        sampler = PrefetchBatchSampler(
            train_ds, int(args.train.batch_size), seed=data_seed
        )
    else:
        sampler = BatchSampler(
            train_ds, int(args.train.batch_size), seed=data_seed
        )
    saver.log_info(f" [*] {len(train_ds)} train files, {len(valid_ds)} valid files")

    interval_log = int(args.train.interval_log or 10)
    interval_val = int(args.train.interval_val or 2000)
    interval_force_save = int(args.train.interval_force_save or 0)
    save_opt = bool(args.train.save_opt)
    epochs = int(args.train.epochs or 100000)
    steps_per_epoch = max(len(sampler.files) // int(args.train.batch_size), 1)
    total_steps = epochs * steps_per_epoch

    # fold the resumed step into the model-noise stream too (same rationale
    # as data_seed: resume must not replay the run's first noise draws)
    key = jax.random.fold_in(
        jax.random.PRNGKey(int(args.train.seed or 0)), initial_step
    )
    last_saved_step = -1

    if mesh is not None:
        state = jax.device_put(state, replicate(mesh))

    while saver.global_step < total_steps:
        batch_np = sampler.sample()
        if mesh is not None:
            batch = {
                k: jax.device_put(jnp.asarray(v), batch_sharding(mesh, np.ndim(v)))
                for k, v in batch_np.items()
            }
        else:
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)
        saver.global_step_increment()

        if saver.global_step % interval_log == 0:
            loss = float(_sync(metrics["loss"]))
            if np.isnan(loss):
                raise ValueError(" [x] nan loss ")
            saver.log_info(
                f"step: {saver.global_step} | loss: {loss:.6f} | "
                f"time: {saver.get_total_time()} | "
                f"{interval_log / max(saver.get_interval_time(), 1e-9):.2f} it/s"
            )
            saver.log_value(
                {f"train/{k}": float(_sync(v)) for k, v in metrics.items()}
            )

        if saver.global_step % interval_val == 0:
            params_host = jax.device_get(state.params)
            saver.save_model(
                params_host,
                jax.device_get(state.opt_state) if save_opt else None,
            )
            # retention (diffusion/solver_new.py:182-185, same semantics as
            # checkpoint.apply_retention): delete the previous save unless
            # its step is a force-save multiple; unset interval_force_save
            # keeps only the latest (not every one — disk safety)
            if last_saved_step >= 0 and (
                interval_force_save <= 0
                or last_saved_step % interval_force_save != 0
            ):
                saver.delete_model(last_saved_step)
            last_saved_step = saver.global_step
            results = validate(
                args, family, model, state.params, valid_ds, saver, mel_extract_fn
            )
            saver.log_info({"validation": results})
            saver.log_value(results)
    return state
