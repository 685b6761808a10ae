"""Extended benchmark suite — the BASELINE.md measured configs:

  1. combsub  — CombSubSuperFast forward (the bench.py headline metric)
  2. sins     — Sins additive synthesizer forward
  3. nsf      — NSF-HiFiGAN forward from ground-truth mel
  4. cascade  — DiffusionFast shallow cascade, kstep=100, dpm-solver speedup 10
  5. reflow   — RectifiedFlow cascade, euler 20 steps

Prints one JSON line per config: {"metric", "value" (x realtime per chip),
"unit", "vs_baseline" (value/200)}. Uses the same tunnel-safe sync as
bench.py. Select configs: python bench_suite.py [names...]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ddsp_svc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

SR, HOP, WIN, N_UNIT, M = 44100, 512, 2048, 768, 128
MIN_WINDOW_S = 5.0


def _sync(x):
    last = None
    for _ in range(5):
        try:
            jax.effects_barrier()
            return float(np.asarray(x))
        except Exception as e:
            last = e
            time.sleep(5.0)
    raise last


def measure(fn, audio_seconds_per_call: float) -> float:
    # warm once with retries (the tunneled service fails in waves)
    last = None
    for attempt in range(5):
        try:
            _sync(fn(0))
            break
        except Exception as e:
            last = e
            if attempt == 4:
                raise last
            time.sleep(30)
    n_iter = 4
    while True:
        start = time.perf_counter()
        out = None
        for i in range(n_iter):
            out = fn(i + 1)
        _sync(out)
        elapsed = time.perf_counter() - start
        if elapsed >= MIN_WINDOW_S or n_iter >= 2048:
            return n_iter * audio_seconds_per_call / elapsed
        n_iter *= 2


def make_inputs(batch, t, key):
    k1, k2 = jax.random.split(key)
    units = jax.random.normal(k1, (batch, t, N_UNIT), jnp.float32)
    f0 = 220.0 * jnp.exp(jax.random.normal(k2, (batch, t, 1)) * 0.1)
    volume = 0.5 * jnp.ones((batch, t, 1), jnp.float32)
    spk = jnp.zeros((batch, 1), jnp.int32)
    return units, f0, volume, spk


def bench_combsub(batch=64, seconds=30.0):
    from ddsp_svc_tpu.models.ddsp import CombSubSuperFast

    t = int(seconds * SR) // HOP
    model = CombSubSuperFast(SR, HOP, WIN, n_unit=N_UNIT, n_spk=1)
    units, f0, volume, spk = make_inputs(batch, t, jax.random.PRNGKey(0))
    params = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        units, f0, volume, spk_id=spk,
    )["params"]

    @jax.jit
    def run(params, key):
        s, _, _ = model.apply(
            {"params": params}, units, f0, volume, spk_id=spk, infer=True,
            rngs={"noise": key},
        )
        return jnp.sum(jnp.abs(s))

    return (
        lambda i: run(params, jax.random.fold_in(jax.random.PRNGKey(3), i)),
        batch * t * HOP / SR,
    )


def bench_sins(batch=16, seconds=10.0):
    from ddsp_svc_tpu.models.ddsp import Sins

    t = int(seconds * SR) // HOP
    model = Sins(SR, HOP, n_harmonics=128, n_mag_allpass=256, n_mag_noise=80,
                 n_unit=N_UNIT, n_spk=1)
    units, f0, volume, spk = make_inputs(batch, t, jax.random.PRNGKey(0))
    params = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        units, f0, volume, spk_id=spk,
    )["params"]

    @jax.jit
    def run(params, key):
        s, _, _ = model.apply(
            {"params": params}, units, f0, volume, spk_id=spk, infer=True,
            rngs={"noise": key},
        )
        return jnp.sum(jnp.abs(s))

    return (
        lambda i: run(params, jax.random.fold_in(jax.random.PRNGKey(3), i)),
        batch * t * HOP / SR,
    )


def bench_nsf(batch=16, seconds=10.0):
    from ddsp_svc_tpu.models.nsf_hifigan import Generator

    t = int(seconds * SR) // HOP
    gen = Generator(sampling_rate=SR, num_mels=M)
    key = jax.random.PRNGKey(0)
    mel = jax.random.normal(key, (batch, t, M), jnp.float32) * 2.0 - 6.0
    f0 = 220.0 * jnp.ones((batch, t), jnp.float32)
    params = gen.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        mel, f0, key=key,
    )["params"]

    @jax.jit
    def run(params, key):
        return jnp.sum(jnp.abs(gen.apply({"params": params}, mel, f0, key=key)))

    return (
        lambda i: run(params, jax.random.fold_in(jax.random.PRNGKey(3), i)),
        batch * t * HOP / SR,
    )


def _bench_cascade(family, batch=8, seconds=10.0):
    from ddsp_svc_tpu.models.cascade import ReflowUnit2Wav, Unit2WavFast
    from ddsp_svc_tpu.ops.mel import LogMelSpectrogram

    t = int(seconds * SR) // HOP
    mel_x = LogMelSpectrogram(sr=SR, n_mels=M, n_fft=2048, win_size=2048,
                              hop_length=HOP, fmin=40.0, fmax=16000.0)
    units, f0, volume, spk = make_inputs(batch, t, jax.random.PRNGKey(0))
    if family == "diffusion":
        model = Unit2WavFast(SR, HOP, WIN, N_UNIT, 1, out_dims=M, n_layers=6,
                             n_chans=512, k_step_max=100)
        kwargs = dict(k_step=100, infer_speedup=10, sampler="dpm-solver")
    else:
        model = ReflowUnit2Wav(SR, HOP, WIN, N_UNIT, 1, out_dims=M, n_layers=6,
                               n_chans=512)
        kwargs = dict(infer_step=20, sampler="euler", t_start=0.7)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        units, f0, volume, spk_id=spk, mel_extract_fn=mel_x.extract,
        infer=True, key=jax.random.PRNGKey(3), **kwargs,
    )

    @jax.jit
    def run(params, key):
        out = model.apply(
            {"params": params}, units, f0, volume, spk_id=spk,
            mel_extract_fn=mel_x.extract, infer=True, key=key,
            rngs={"noise": key}, **kwargs,
        )
        return jnp.sum(jnp.abs(out))

    return (
        lambda i: run(variables["params"],
                      jax.random.fold_in(jax.random.PRNGKey(4), i)),
        batch * t * HOP / SR,
    )


CONFIGS = {
    "combsub": bench_combsub,
    "sins": bench_sins,
    "nsf": bench_nsf,
    "cascade": lambda: _bench_cascade("diffusion"),
    "reflow": lambda: _bench_cascade("reflow"),
}


def main(names=None):
    profile_dir = None
    if names and "--profile" in names:
        names = [n for n in names if n != "--profile"]
        profile_dir = "/tmp/ddsp_svc_tpu_trace"
        jax.profiler.start_trace(profile_dir)
        print(f"# profiling to {profile_dir}", flush=True)
    names = names or list(CONFIGS)
    for name in names:
        try:
            fn, audio_s = CONFIGS[name]()
            rtf = measure(fn, audio_s)
            print(json.dumps({
                "metric": f"{name}_rtf_44k1",
                "value": round(rtf, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(rtf / 200.0, 3),
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "metric": f"{name}_rtf_44k1", "value": None,
                "unit": "x_realtime_per_chip", "error": str(e)[:100],
            }), flush=True)
    if profile_dir:
        jax.profiler.stop_trace()


if __name__ == "__main__":
    main(sys.argv[1:] or None)
