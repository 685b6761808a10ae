"""NSF-HiFiGAN vocoder GAN training CLI — beyond-reference capability.

python -m ddsp_svc_tpu.cli.train_vocoder -c configs/nsf-hifigan.yaml

Uses the standard preprocessed layout (audio/ f0/ mel/ from a diffusion-
family preprocess run); trains Generator vs MPD+MSD with the HiFiGAN
recipe. Checkpoints: expdir/model_<step>.ckpt holds {generator, discriminator}.
"""
from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..data.dataset import AudioDataset, BatchSampler
from ..models.nsf_hifigan import Generator
from ..models.vocoder import DEFAULT_NSF_CONFIG
from ..ops.mel import LogMelSpectrogram
from ..train import checkpoint as ckpt
from ..train.saver import Saver
from ..train.vocoder_solver import init_vocoder_training, make_vocoder_train_steps
from ..utils.config import load_config


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--fused_resblocks", action="store_true",
                        help="run the generator's resblock stages on the "
                             "fused Pallas kernel (custom VJP); measured a "
                             "wash at the default 8192-sample crops — try "
                             "for longer-crop recipes")
    cmd = parser.parse_args(argv)

    from .common import enable_compile_cache

    enable_compile_cache()
    args = load_config(cmd.config)

    cfg = dict(DEFAULT_NSF_CONFIG)
    if args.vocoder:
        cfg.update({k: v for k, v in dict(args.vocoder).items() if k in cfg})
    cfg["sampling_rate"] = args.data.sampling_rate
    cfg["hop_size"] = args.data.block_size

    gen = Generator(
        sampling_rate=cfg["sampling_rate"], num_mels=cfg["num_mels"],
        upsample_rates=tuple(cfg["upsample_rates"]),
        upsample_kernel_sizes=tuple(cfg["upsample_kernel_sizes"]),
        upsample_initial_channel=cfg["upsample_initial_channel"],
        resblock=str(cfg["resblock"]),
        resblock_kernel_sizes=tuple(cfg["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(
            tuple(d) for d in cfg["resblock_dilation_sizes"]
        ),
        # the fused Pallas resblock stages carry a custom VJP, so training
        # CAN ride them (--fused_resblocks); measured a wash at HiFiGAN's
        # 8192-sample training crops (22.98x vs 24.6x stock — the backward
        # dominates and the kernel's block overhead eats the forward win at
        # these sizes; bench_suite train_vocoder_fused), so default off
        use_pallas_resblock=bool(getattr(cmd, "fused_resblocks", False)),
    )
    mel_x = LogMelSpectrogram(
        sr=cfg["sampling_rate"], n_mels=cfg["num_mels"], n_fft=cfg["n_fft"],
        win_size=cfg["win_size"], hop_length=cfg["hop_size"],
        fmin=cfg["fmin"], fmax=cfg["fmax"],
    )

    ds = AudioDataset(
        args.data.train_path,
        waveform_sec=args.data.duration,
        hop_size=args.data.block_size,
        sample_rate=args.data.sampling_rate,
        load_all_data=bool(args.train.cache_all_data),
        with_mel=True,
        use_aug=False,
    )
    sampler = BatchSampler(ds, int(args.train.batch_size))

    t_ex = ds.crop_frames
    disc_cfg = None
    # explicit falsy values are CONFIG, not absence: periods [] must mean
    # "no MPD" and msd_scales 0 "no MSD", so gate on `is not None` rather
    # than truthiness (ADVICE r4)
    periods_cfg = args.vocoder.discriminator_periods if args.vocoder else None
    msd_cfg = args.vocoder.msd_scales if args.vocoder else None
    if periods_cfg is not None or msd_cfg is not None:
        periods = tuple((2, 3, 5, 7, 11) if periods_cfg is None
                        else periods_cfg)
        msd = 3 if msd_cfg is None else int(msd_cfg)
        if not periods and not msd:
            # an empty bundle would run GAN steps with zero
            # sub-discriminators; disc_cfg=None would silently mean the
            # FULL default recipe — neither is what "both off" asks for
            raise SystemExit(
                "config error: discriminator_periods=[] with msd_scales=0 "
                "disables every sub-discriminator; this trainer is the GAN "
                "recipe (nsf_hifigan/models.py) and needs at least one of "
                "MPD periods or MSD scales")
        from ..train.vocoder_solver import Discriminators

        disc_cfg = Discriminators(periods=periods, msd_scales=msd)
    state_g, state_d, disc = init_vocoder_training(
        gen,
        jnp.zeros((1, t_ex, cfg["num_mels"]), jnp.float32),
        jnp.zeros((1, t_ex, 1), jnp.float32),
        jax.random.PRNGKey(int(args.train.seed or 0)),
        lr=float(args.train.lr),
        disc=disc_cfg,
    )
    saver = Saver(args, initial_global_step=0)

    # resume
    latest = ckpt.latest_checkpoint(args.env.expdir)
    if latest:
        payload, step = ckpt.load_checkpoint(latest)
        state_g = state_g.replace(
            params=ckpt.restore_into(
                jax.device_get(state_g.params), payload["params"]["generator"]
            )
        )
        state_d = state_d.replace(
            params=ckpt.restore_into(
                jax.device_get(state_d.params), payload["params"]["discriminator"]
            )
        )
        # optimizer moments matter for the adversarial equilibrium: resume
        # them too (fresh Adam states after a restart spike D/G losses)
        opt = payload.get("opt_state")
        if opt is not None:
            state_g = state_g.replace(opt_state=ckpt.restore_opt_state(
                jax.device_get(state_g.opt_state), opt["generator"]))
            state_d = state_d.replace(opt_state=ckpt.restore_opt_state(
                jax.device_get(state_d.opt_state), opt["discriminator"]))
        saver.global_step = step
        print(f" [*] resumed from {latest} (step {step})")

    disc_step, gen_step = make_vocoder_train_steps(gen, disc, mel_x.extract)

    # data-parallel over a 1-axis mesh: params replicated, batch rows
    # sharded — XLA inserts the gradient all-reduce (the same
    # jit-over-NamedSharding recipe as the main trainer, SCALING.md)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    batch_sz = int(args.train.batch_size)
    n_dev = len(jax.devices())
    while n_dev > 1 and batch_sz % n_dev != 0:
        n_dev -= 1
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P("data"))
    state_g = jax.device_put(state_g, repl)
    state_d = jax.device_put(state_d, repl)
    if n_dev > 1:
        print(f" [*] data-parallel over {n_dev} devices")

    key = jax.random.PRNGKey(int(args.train.seed or 0))
    interval_log = int(args.train.interval_log or 10)
    interval_val = int(args.train.interval_val or 2000)
    total = int(args.train.epochs or 1) * max(
        len(sampler.files) // int(args.train.batch_size), 1
    )
    while saver.global_step < total:
        batch_np = sampler.sample()
        batch = {
            "audio": jax.device_put(jnp.asarray(batch_np["audio"]), rows),
            "mel": jax.device_put(jnp.asarray(batch_np["mel"]), rows),
            "f0": jax.device_put(jnp.asarray(batch_np["f0"]), rows),
        }
        key, k1, k2 = jax.random.split(key, 3)
        state_d, md = disc_step(state_d, state_g.params, batch, k1)
        state_g, mg = gen_step(state_g, state_d.params, batch, k2)
        saver.global_step_increment()
        if saver.global_step % interval_log == 0:
            jax.effects_barrier()
            dl = float(np.asarray(md["disc_loss"]))
            gl = float(np.asarray(mg["gen_loss"]))
            mel_l1 = float(np.asarray(mg["mel_l1"]))
            if not (np.isfinite(dl) and np.isfinite(gl)):
                raise ValueError(" [x] nan loss ")
            saver.log_info(
                f"step: {saver.global_step} | d: {dl:.4f} | g: {gl:.4f} | "
                f"mel_l1: {mel_l1:.4f} | time: {saver.get_total_time()}"
            )
            saver.log_value({"vocoder/disc_loss": dl, "vocoder/gen_loss": gl,
                             "vocoder/mel_l1": mel_l1})
        if saver.global_step % interval_val == 0:
            ckpt.save_checkpoint(
                args.env.expdir, saver.global_step,
                {
                    "generator": jax.device_get(state_g.params),
                    "discriminator": jax.device_get(state_d.params),
                },
                opt_state={
                    "generator": jax.device_get(state_g.opt_state),
                    "discriminator": jax.device_get(state_d.opt_state),
                },
            )
            saver.log_info(f" [*] vocoder ckpt saved at {saver.global_step}")


if __name__ == "__main__":
    main()
