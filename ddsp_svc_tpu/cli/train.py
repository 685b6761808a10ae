"""Train CLI: python -m ddsp_svc_tpu.cli.train -c configs/combsub.yaml

Reference contract: train.py / train_diff.py / train_reflow.py — build model
from config, resume from the latest model_<step> in expdir, train.
"""
from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from ..models.registry import build_model
from ..parallel.mesh import make_mesh
from ..train import checkpoint as ckpt
from ..train.solver import model_family, train
from ..train.state import create_train_state, param_count
from ..utils.config import load_config
from .common import build_mel_extractor, needs_mel


def init_model_params(args, model, key):
    t = int(args.data.duration * args.data.sampling_rate) // args.data.block_size
    units = jnp.zeros((1, t, args.data.encoder_out_channels), jnp.float32)
    f0 = 220.0 * jnp.ones((1, t, 1), jnp.float32)
    volume = 0.5 * jnp.ones((1, t, 1), jnp.float32)
    spk_id = jnp.ones((1, 1), jnp.int32)
    kwargs = {}
    if args.model.use_pitch_aug:
        kwargs["aug_shift"] = jnp.zeros((1, 1, 1), jnp.float32)
    if needs_mel(args):
        kwargs.update(
            gt_spec=jnp.zeros((1, t, 128), jnp.float32),
            infer=False,
            k_step=args.model.k_step_max or 1000,
            key=key,
        )
        if args.model.type != "Diffusion":  # Unit2Mel owns no DDSP stage
            kwargs["mel_extract_fn"] = build_mel_extractor(args).extract
        if args.model.type == "RectifiedFlow":
            kwargs.pop("k_step")
    # jitted init: one compiled graph instead of per-op eager dispatches
    # (measured several× faster for the big models on CPU and over the
    # tunnel; same params — init is deterministic in the keys)
    variables = jax.jit(lambda: model.init(
        {"params": key, "noise": key}, units, f0, volume, spk_id=spk_id,
        **kwargs
    ))()
    return variables["params"]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    cmd = parser.parse_args(argv)

    from .common import enable_compile_cache

    enable_compile_cache()
    args = load_config(cmd.config)

    # multi-host: initialize the distributed runtime when launched under a
    # multi-process coordinator (JAX_COORDINATOR_ADDRESS set per host)
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()

    amp = (args.train.amp_dtype or "fp32").lower()
    dtype = jnp.bfloat16 if amp in ("bf16", "bfloat16") else None
    if amp in ("fp16", "float16"):
        print(" [!] fp16 requested; using bf16 (the TPU-native low precision)")
        dtype = jnp.bfloat16
    model = build_model(args, dtype=dtype)
    family = model_family(args.model.type)
    print(f" [*] model: {args.model.type} ({family})")

    key = jax.random.PRNGKey(int(args.train.seed or 0))
    params = init_model_params(args, model, key)

    # resume (logger/utils.py:97-122 contract, strict=False warm-start)
    initial_step = 0
    latest = ckpt.latest_checkpoint(args.env.expdir)
    opt_payload = None
    if latest:
        payload, initial_step = ckpt.load_checkpoint(latest)
        params = ckpt.restore_into(jax.device_get(params), payload["params"])
        opt_payload = payload.get("opt_state")
        print(f" [*] resumed from {latest} (step {initial_step})")
    print(f" [*] parameters: {param_count(params):,}")

    state = create_train_state(
        model,
        params,
        lr=float(args.train.lr),
        weight_decay=float(args.train.weight_decay or 0.0),
        decay_step=args.train.decay_step,
        gamma=args.train.gamma,
        start_step=initial_step,
    )
    if opt_payload is not None:
        state = state.replace(
            opt_state=ckpt.restore_opt_state(
                jax.device_get(state.opt_state), opt_payload
            )
        )

    n_dev = len(jax.devices())
    batch = int(args.train.batch_size)
    if batch % n_dev != 0:
        # dp shards the batch; use the largest device count that divides it
        # rather than failing deep inside pjit with a sharding error
        while n_dev > 1 and batch % n_dev != 0:
            n_dev -= 1
        print(f" [!] batch_size {batch} not divisible by "
              f"{len(jax.devices())} devices — using dp={n_dev}")
    mesh = make_mesh(n_dev)
    mel_fn = build_mel_extractor(args).extract if needs_mel(args) else None
    train(args, model, state, mesh=mesh, mel_extract_fn=mel_fn,
          initial_step=initial_step)


if __name__ == "__main__":
    main()
