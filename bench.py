"""Benchmark: flagship CombSubSuperFast 44.1 kHz synthesis RTF per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value  = real-time factor (seconds of 44.1 kHz audio synthesized per second
         per chip) of the full DDSP forward (Unit2Control + comb source +
         STFT filtering), steady-state.
vs_baseline = value / 200 — BASELINE.json's north star is >=200x real time
         per chip (the reference publishes no numbers, BASELINE.md; the
         reference's RTF semantics are /root/reference/solver.py:45-50).

Contract: ALWAYS prints exactly one parseable JSON line, even on total
failure (then value is null and "error" carries the cause). Any successful
measurement is persisted to .bench_last_good.json so a later run during a
degraded-service window can report the last measured number (marked
"cached": true with its timestamp) instead of nothing.

Timing notes for the tunneled axon TPU backend: block_until_ready is not a
true barrier there (enqueue returns immediately) and device->host fetches
only complete after jax.effects_barrier(). Each timed window therefore ends
with effects_barrier + a scalar fetch, and the iteration count adapts until
a window takes >= MIN_WINDOW_S so the fixed ~0.6 s flush overhead is noise.
The service degrades in waves, so: warm up the remote-compile session with
tiny graphs first, compile each workload once (retrying), then retry
execution of the cached executable.
"""
from __future__ import annotations

import json
import os
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

# first compile of the full model over the tunneled backend can take minutes;
# cache compiled executables across bench runs (the CLIs' shared per-user dir)
from ddsp_svc_tpu.cli.common import enable_compile_cache  # noqa: E402

enable_compile_cache()

MIN_WINDOW_S = 5.0
LAST_GOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_last_good.json")
METRIC = "combsub_superfast_rtf_44k1"


def _sync_scalar(x) -> float:
    """Barrier + fetch, retrying: the tunneled axon backend's d2h fetch is
    flaky (transient UNIMPLEMENTED / stalls until the queue is flushed).
    Session establishment can legitimately block the first fetch for many
    minutes — patience, not fail-fast, is what lands a number here."""
    last_err = None
    for i in range(10):
        try:
            jax.effects_barrier()
            return float(np.asarray(x))
        except Exception as e:  # jax.errors.JaxRuntimeError
            last_err = e
            time.sleep(min(10.0 * (i + 1), 60.0))
    raise last_err


def warmup():
    """Establish the remote-compile session with small graphs before the big
    one — fresh-process first compiles on the tunnel are the most fragile."""
    st = time.perf_counter()
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 128))
    _sync_scalar(jax.jit(lambda a: (a * 2 + 1).sum())(x))
    _sync_scalar(jax.jit(lambda a: (a @ a.T).sum())(x))
    y = jax.random.normal(jax.random.PRNGKey(1), (4, 2048))
    _sync_scalar(jax.jit(lambda a: jnp.abs(jnp.fft.rfft(a, axis=-1)).sum())(y))
    print(f"# warmup done ({time.perf_counter() - st:.0f}s)", flush=True)


_EMIT_LOCK = threading.Lock()
_STATE = {"emitted": False, "rtf": None, "shape": None}


def emit(payload: dict):
    with _EMIT_LOCK:
        if _STATE["emitted"]:
            return
        _STATE["emitted"] = True
    print(json.dumps(payload), flush=True)


def save_last_good(value: float, detail: dict):
    try:
        with open(LAST_GOOD, "w") as f:
            json.dump({"value": value, "time": time.time(), **detail}, f)
    except OSError:
        pass


def load_last_good():
    try:
        with open(LAST_GOOD) as f:
            return json.load(f)
    except Exception:
        pass
    # the scratch cache is gitignored; in a fresh checkout fall back to the
    # committed suite results (same metric semantics, "combsub" entry)
    try:
        suite = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_SUITE.json")
        with open(suite) as f:
            entry = json.load(f)["combsub"]
        return {"value": entry["value"], "time": entry.get("measured_at_unix")}
    except Exception:
        return None


def _cached_or_null_payload(reason: str) -> dict:
    rtf = _STATE["rtf"]
    if rtf is not None:
        return {
            "metric": METRIC,
            "value": round(rtf, 2),
            "unit": "x_realtime_per_chip",
            "vs_baseline": round(rtf / 200.0, 3),
            "partial": True,
            "error": reason,
        }
    cached = load_last_good()
    if cached and cached.get("value"):
        return {
            "metric": METRIC,
            "value": round(float(cached["value"]), 2),
            "unit": "x_realtime_per_chip",
            "vs_baseline": round(float(cached["value"]) / 200.0, 3),
            "cached": True,
            "measured_at_unix": cached.get("time"),
            "error": reason,
        }
    return {
        "metric": METRIC,
        "value": None,
        "unit": "x_realtime_per_chip",
        "vs_baseline": None,
        "error": reason,
    }


def _start_watchdog():
    """The tunnel can HANG (not error) for unbounded time; a blocked C call
    never returns to the interpreter, so only a side thread can save the
    one-JSON-line contract. After the deadline, emit the best available
    number (banked this run > last-good cache > null) and hard-exit 0."""
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "2400"))

    def fire():
        emit(_cached_or_null_payload(
            f"watchdog: no completed run within {deadline:.0f}s "
            f"(tunnel hung or degraded)"))
        os._exit(0)

    t = threading.Timer(deadline, fire)
    t.daemon = True
    t.start()
    return t


def main():
    _start_watchdog()
    from ddsp_svc_tpu.models.ddsp import CombSubSuperFast

    sr, block, win, n_unit = 44100, 512, 2048, 768
    model = CombSubSuperFast(
        sampling_rate=sr, block_size=block, win_length=win, n_unit=n_unit, n_spk=1
    )

    # Init params once at a tiny shape on CPU (params don't depend on
    # batch/time) — keeps all eager tunnel traffic out of the fragile phase.
    rng = np.random.default_rng(0)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        tiny = dict(
            units=jnp.asarray(rng.standard_normal((1, 16, n_unit)), jnp.float32),
            f0=jnp.asarray(220.0 * np.ones((1, 16, 1)), jnp.float32),
            volume=jnp.asarray(0.5 * np.ones((1, 16, 1)), jnp.float32),
        )
        params_host = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            tiny["units"], tiny["f0"], tiny["volume"],
            spk_id=jnp.zeros((1, 1), jnp.int32),
        )["params"]

    def build(batch: int, seconds: float):
        t = int(seconds * sr) // block  # frames per utterance
        units = np.asarray(rng.standard_normal((batch, t, n_unit)), np.float32)
        f0 = np.asarray(
            220.0 * np.exp(rng.standard_normal((batch, t, 1)) * 0.1), np.float32
        )
        volume = 0.5 * np.ones((batch, t, 1), np.float32)
        spk_id = np.zeros((batch, 1), np.int32)
        dev = jax.devices()[0]
        args = tuple(jax.device_put(a, dev) for a in (units, f0, volume, spk_id))
        params = jax.device_put(params_host, dev)

        def synth_checksum(params, key, units, f0, volume, spk_id):
            signal, _, _ = model.apply(
                {"params": params}, units, f0, volume, spk_id=spk_id, infer=True,
                rngs={"noise": key},
            )
            return jnp.sum(jnp.abs(signal))

        # compile once (retrying), then retry execution of the cached
        # executable across the service's degradation waves
        compiled = None
        last = None
        for attempt in range(3):
            try:
                compiled = (
                    jax.jit(synth_checksum)
                    .lower(params, jax.random.PRNGKey(1), *args)
                    .compile()
                )
                break
            except Exception as e:
                last = e
                print(f"# compile retry {attempt}: {str(e)[:80]}", flush=True)
                time.sleep(30)
        if compiled is None:
            raise last
        return compiled, params, args, t

    def measure(batch: int, seconds: float) -> float:
        compiled, params, args, t = build(batch, seconds)
        k = jax.random.PRNGKey(1)
        last = None
        for attempt in range(6):
            try:
                _sync_scalar(compiled(params, k, *args))
                break
            except Exception as e:
                last = e
                if attempt == 5:
                    raise last
                print(f"# exec retry {attempt}: {str(e)[:80]}", flush=True)
                time.sleep(30)

        def window(n_iter: int) -> float:
            start = time.perf_counter()
            out = None
            for i in range(n_iter):
                out = compiled(params, jax.random.fold_in(k, i), *args)
            _sync_scalar(out)
            return time.perf_counter() - start

        n_iter = 8
        elapsed = window(n_iter)
        while elapsed < MIN_WINDOW_S and n_iter < 4096:
            n_iter *= 2
            elapsed = window(n_iter)
        return n_iter * batch * (t * block) / sr / elapsed

    # ladder of workloads: smallest FIRST — a failed/oversized attempt can
    # poison the tunnel session for everything after it, so bank a small
    # number before reaching for the throughput-optimal shape. Env override
    # BENCH_WORKLOADS="2x2,16x10,64x30" picks the ladder explicitly.
    last_err = None
    rtf = None
    shape = None
    spec = os.environ.get("BENCH_WORKLOADS", "2x2,16x10,64x30")
    attempts = [
        (int(p.split("x")[0]), float(p.split("x")[1]))
        for p in spec.split(",") if p
    ]
    try:
        warmup()
    except Exception as e:
        last_err = e
        print(f"# warmup failed: {str(e)[:80]}", flush=True)
    # stamp the tunnel-health axis early (plenty of watchdog budget left;
    # probing at emit time raced the watchdog when the probe hung). The
    # flagship number itself syncs via an in-graph scalar so it is barely
    # wire-sensitive, but the stamp documents the window for the record.
    d2h_mb_s = None
    try:
        import bench_suite
        d2h_mb_s = bench_suite.probe_d2h_mb_s(timeout_s=45)
        print(f"# d2h {d2h_mb_s} MB/s", flush=True)
    except Exception:
        pass
    for batch, seconds in attempts:
        try:
            got = measure(batch, seconds)
            print(f"# measured({batch}, {seconds}) rtf={got:.1f}", flush=True)
            if rtf is None or got > rtf:
                rtf = got
                shape = {"batch": batch, "seconds": seconds}
                # bank immediately: the watchdog and the cached-fallback
                # path must see mid-run results if a later shape hangs
                _STATE["rtf"], _STATE["shape"] = rtf, shape
                save_last_good(rtf, {"metric": METRIC, **shape})
        except Exception as e:
            last_err = e
            print(f"# bench measure({batch}, {seconds}) failed: "
                  f"{str(e)[:120]}", flush=True)
            break  # session likely poisoned; keep what we banked

    if rtf is not None:
        payload = {
            "metric": METRIC,
            "value": round(rtf, 2),
            "unit": "x_realtime_per_chip",
            "vs_baseline": round(rtf / 200.0, 3),
        }
        if d2h_mb_s is not None:
            payload["d2h_mb_s"] = d2h_mb_s
        emit(payload)
        return

    emit(_cached_or_null_payload(
        f"live run failed: {str(last_err)[:200]}" if last_err
        else "no measurement"))


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # the contract: one JSON line, always
        emit({
            "metric": METRIC,
            "value": None,
            "unit": "x_realtime_per_chip",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {str(e)[:300]}",
        })
        raise SystemExit(0)
