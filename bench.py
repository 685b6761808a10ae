"""Benchmark: flagship CombSubSuperFast 44.1 kHz synthesis RTF per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value  = real-time factor (seconds of 44.1 kHz audio synthesized per second
         per chip) of the full DDSP forward (Unit2Control + comb source +
         STFT filtering), steady-state.
vs_baseline = value / 200 — BASELINE.json's north star is >=200x real time
         per chip (the reference publishes no numbers, BASELINE.md).

Timing notes for the tunneled axon TPU backend: block_until_ready is not a
true barrier there (enqueue returns immediately) and device->host fetches
only complete after jax.effects_barrier(). Each timed window therefore ends
with effects_barrier + a scalar fetch, and the iteration count adapts until
a window takes >= MIN_WINDOW_S so the fixed ~0.6 s flush overhead is noise.
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# first compile of the full model over the tunneled backend can take minutes;
# cache compiled executables across bench runs
jax.config.update("jax_compilation_cache_dir", "/tmp/ddsp_svc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

MIN_WINDOW_S = 5.0


def _sync_scalar(x) -> float:
    """Barrier + fetch, retrying: the tunneled axon backend's d2h fetch is
    flaky (transient UNIMPLEMENTED / stalls until the queue is flushed)."""
    last_err = None
    for _ in range(5):
        try:
            jax.effects_barrier()
            return float(np.asarray(x))
        except Exception as e:  # jax.errors.JaxRuntimeError
            last_err = e
            time.sleep(5.0)
    raise last_err


def main():
    from ddsp_svc_tpu.models.ddsp import CombSubSuperFast

    sr, block, win, n_unit = 44100, 512, 2048, 768
    model = CombSubSuperFast(
        sampling_rate=sr, block_size=block, win_length=win, n_unit=n_unit, n_spk=1
    )

    def measure(batch: int, seconds: float) -> float:
        t = int(seconds * sr) // block  # frames per utterance
        key = jax.random.PRNGKey(0)
        k_units, k_f0, k_init, k_noise = jax.random.split(key, 4)
        units = jax.random.normal(k_units, (batch, t, n_unit), jnp.float32)
        f0 = 220.0 * jnp.exp(jax.random.normal(k_f0, (batch, t, 1)) * 0.1)
        volume = 0.5 * jnp.ones((batch, t, 1), jnp.float32)
        spk_id = jnp.zeros((batch, 1), jnp.int32)
        params = model.init(
            {"params": k_init, "noise": k_noise}, units, f0, volume, spk_id=spk_id
        )["params"]

        @jax.jit
        def synth_checksum(params, units, f0, volume, spk_id, key):
            signal, _, _ = model.apply(
                {"params": params}, units, f0, volume, spk_id=spk_id, infer=True,
                rngs={"noise": key},
            )
            return jnp.sum(jnp.abs(signal))

        k = jax.random.PRNGKey(1)
        # the tunneled service degrades in waves: compile once (retrying),
        # then retry execution of the cached executable
        compiled = None
        last = None
        for _ in range(3):
            try:
                compiled = synth_checksum.lower(
                    params, units, f0, volume, spk_id, k
                ).compile()
                break
            except Exception as e:
                last = e
                time.sleep(30)
        if compiled is None:
            raise last
        for attempt in range(10):
            try:
                _sync_scalar(compiled(params, units, f0, volume, spk_id, k))
                break
            except Exception as e:
                last = e
                if attempt == 9:
                    raise last
                time.sleep(30)

        def window(n_iter: int) -> float:
            start = time.perf_counter()
            out = None
            for i in range(n_iter):
                out = compiled(
                    params, units, f0, volume, spk_id, jax.random.fold_in(k, i)
                )
            _sync_scalar(out)
            return time.perf_counter() - start

        n_iter = 8
        elapsed = window(n_iter)
        while elapsed < MIN_WINDOW_S and n_iter < 4096:
            n_iter *= 2
            elapsed = window(n_iter)
        return n_iter * batch * (t * block) / sr / elapsed

    def measure_split(batch: int, seconds: float) -> float:
        """Fallback when the remote compiler rejects the fused graph: jit the
        control net and the DSP synthesis separately (two smaller graphs,
        sequential execution — still an honest end-to-end time)."""
        from ddsp_svc_tpu.models.ddsp import (
            CombSubSuperFast as M, combsub_stft_synthesis,
        )
        from ddsp_svc_tpu.ops.source import fast_source_gen

        t = int(seconds * sr) // block
        key = jax.random.PRNGKey(0)
        k_units, k_f0, k_init, k_noise = jax.random.split(key, 4)
        units = jax.random.normal(k_units, (batch, t, n_unit), jnp.float32)
        f0 = 220.0 * jnp.exp(jax.random.normal(k_f0, (batch, t, 1)) * 0.1)
        volume = 0.5 * jnp.ones((batch, t, 1), jnp.float32)
        spk_id = jnp.zeros((batch, 1), jnp.int32)
        params = model.init(
            {"params": k_init, "noise": k_noise}, units, f0, volume, spk_id=spk_id
        )["params"]

        @jax.jit
        def source(f0):
            return fast_source_gen(f0, sr, block)

        @jax.jit
        def controls(params, units, f0, phase, volume):
            return model.apply(
                {"params": params}, units, f0, phase, volume, spk_id=spk_id,
                method=M.controls,
            )

        @jax.jit
        def synth(comb, src_f, nf, key):
            src_f = jnp.concatenate([src_f, src_f[:, -1:, :]], axis=1)
            nf = jnp.concatenate([nf, nf[:, -1:, :]], axis=1)
            noise = jax.random.normal(key, comb.shape, comb.dtype)
            sig = combsub_stft_synthesis(comb, noise, src_f, nf, win, block)
            return jnp.sum(jnp.abs(sig))

        def full(i):
            comb, phase = source(f0)
            src_f, nf, _ = controls(params, units, f0, phase, volume)
            return synth(comb, src_f, nf, jax.random.fold_in(key, i))

        _sync_scalar(full(0))

        def window(n_iter):
            start = time.perf_counter()
            out = None
            for i in range(n_iter):
                out = full(i + 1)
            _sync_scalar(out)
            return time.perf_counter() - start

        n_iter = 8
        elapsed = window(n_iter)
        while elapsed < MIN_WINDOW_S and n_iter < 4096:
            n_iter *= 2
            elapsed = window(n_iter)
        return n_iter * batch * (t * block) / sr / elapsed

    # the tunneled backend intermittently rejects large graphs — fall back
    # to smaller workloads, then to a split-graph measurement
    last_err = None
    rtf = None
    attempts = [
        (measure, 64, 30.0), (measure, 16, 10.0), (measure, 2, 2.0),
        (measure_split, 16, 10.0), (measure_split, 2, 2.0),
    ]
    for fn, batch, seconds in attempts:
        try:
            rtf = fn(batch, seconds)
            break
        except Exception as e:
            last_err = e
            print(f"# bench {fn.__name__}({batch}, {seconds}) failed: {e}",
                  flush=True)
    if rtf is None:
        raise last_err
    print(
        json.dumps(
            {
                "metric": "combsub_superfast_rtf_44k1",
                "value": round(rtf, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(rtf / 200.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
