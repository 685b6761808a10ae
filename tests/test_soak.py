"""Serving endurance soak (VERDICT r3 item 6): sustained mixed-signature
load through the dynamic batcher must hold stable RSS, a bounded jit
cache, and non-drifting tail latency — the long-running flask_api.py
deployment model that the per-request fuzz tests don't cover.

The hardware-window evidence is the `serving_soak` bench row
(bench_suite.py, SOAK_SECONDS=600); this test runs the same engine shape
on CPU for ~45 s so the suite exercises the loop on every run.
"""
import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

SR, HOP, WIN, N_UNIT = 16000, 64, 256, 16


def _rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


@pytest.mark.slow
def test_serving_soak_stability():
    from ddsp_svc_tpu.infer.batcher import BatchedSynth
    from ddsp_svc_tpu.models.ddsp import CombSubSuperFast

    model = CombSubSuperFast(SR, HOP, WIN, n_unit=N_UNIT, n_spk=2)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        jnp.zeros((1, 16, N_UNIT)), 220.0 * jnp.ones((1, 16, 1)),
        jnp.ones((1, 16, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
    ))()
    params = variables["params"]

    buckets, max_batch, n_clients, soak_s = (64, 128), 4, 6, 45.0
    rng = np.random.default_rng(0)
    req_pool = []
    for _ in range(24):
        t = int(rng.choice(buckets)) - int(rng.integers(0, 32))
        req_pool.append((
            rng.standard_normal((t, N_UNIT)).astype(np.float32),
            (220.0 * np.exp(0.1 * rng.standard_normal((t, 1)))).astype(
                np.float32),
            0.5 * np.ones((t, 1), np.float32),
            int(rng.integers(1, 3)),
        ))

    eng = BatchedSynth(model, params, buckets=buckets, max_batch=max_batch,
                       max_wait_ms=5.0, transfer="mulaw", pipeline_depth=2)
    errors, latencies = [], []
    lat_lock = threading.Lock()
    stop = threading.Event()
    try:
        # warm phase: compile both buckets before measuring anything
        for t_warm in buckets:
            eng.infer(np.zeros((t_warm, N_UNIT), np.float32),
                      220.0 * np.ones((t_warm, 1), np.float32),
                      0.5 * np.ones((t_warm, 1), np.float32),
                      spk_id=1, key=jax.random.PRNGKey(0))
        t_end = time.time() + soak_s
        rss_points = []

        def client(cid):
            crng = np.random.default_rng(cid)
            while not stop.is_set() and time.time() < t_end:
                u, f, v, spk = req_pool[int(crng.integers(0, len(req_pool)))]
                t0 = time.perf_counter()
                try:
                    # raw host key (PRNGKey layout) — an eager device key
                    # per request would be one remote allocation each on
                    # a tunneled backend (the r4 soak's RSS-growth cause)
                    eng.infer(u, f, v, spk_id=spk,
                              key=np.array([0, crng.integers(2**31)],
                                           np.uint32))
                except Exception as e:
                    errors.append(e)
                    stop.set()
                    return
                with lat_lock:
                    latencies.append((time.time(),
                                      time.perf_counter() - t0))

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n_clients)]
        for th in threads:
            th.start()
        while any(th.is_alive() for th in threads):
            rss_points.append((time.time(), _rss_mb()))
            time.sleep(2.0)
        for th in threads:
            th.join()
        stats = eng.stats()
    finally:
        stop.set()
        eng.close()

    assert not errors, errors[0]
    assert len(latencies) >= 20, "soak produced too few requests to judge"

    # bounded compile cache: one graph per (bucket, signature); this load
    # uses one sampler signature over two buckets
    assert stats["compiled_signatures"] <= 2 * 4, stats

    # stable RSS: compare the steady-state tail against the first
    # post-warm measurement (allocator fills buffers early; growth past
    # the first quarter must level off)
    q = max(1, len(rss_points) // 4)
    early = np.mean([m for _, m in rss_points[:q]])
    late = np.mean([m for _, m in rss_points[-q:]])
    assert late < early * 1.25 + 64, (
        f"RSS grew {early:.0f} -> {late:.0f} MB over the soak")

    # tail latency must not drift unboundedly (generous CPU bound; the
    # <20% production bound is checked on hardware by the bench row)
    lat = sorted(latencies)
    mid = lat[len(lat) // 2][0]
    first = [d for ts, d in lat if ts <= mid]
    second = [d for ts, d in lat if ts > mid]
    p99_first = np.percentile(first, 99)
    p99_second = np.percentile(second, 99)
    assert p99_second < p99_first * 2.0 + 0.05, (
        f"p99 drifted {p99_first:.3f}s -> {p99_second:.3f}s")
