"""Hardware probe for full-stack serving: runs the bench_serving_diffusion
flow (device_f0, codecs, pipelining) once warm + once measured and prints
the batcher's per-batch wall breakdown (stats()['recent_batches']) plus
front-end timing — to attribute a degraded aggregate to staging vs device
compute (barrier) vs d2h (fetch) vs batch formation.

Usage: /opt/venv/bin/python scripts/probe_serving.py [--batch_encoder]
    [--family=reflow] [--max_batch=16] [--n_requests=64] [--wait=200]
    [--voc_bf16] [--audio_i16] [--trunk_bf16]
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

import bench_suite as bs  # noqa: E402  (reuses SR/HOP/model builders)
import jax.numpy as jnp  # noqa: E402


def main():
    batch_encoder = "--batch_encoder" in sys.argv
    max_batch = 8
    n_requests = 16
    max_wait_ms = 30.0
    family = "diffusion"
    voc_bf16 = "--voc_bf16" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--max_batch="):
            max_batch = int(a.split("=")[1])
        elif a.startswith("--n_requests="):
            n_requests = int(a.split("=")[1])
        elif a.startswith("--wait="):
            max_wait_ms = float(a.split("=")[1])
        elif a.startswith("--family="):
            family = a.split("=")[1]
    SR, HOP = bs.SR, bs.HOP
    pipeline = bs.make_diffusion_serving_pipeline(
        device_f0=True, vocoder_bf16=voc_bf16, family=family,
        trunk_pallas="--trunk_pallas" in sys.argv)

    req_kw = (dict(k_step=100, speedup=10, method="dpm-solver")
              if family == "diffusion"
              else dict(infer_step=20, method="euler", t_start=0.7))
    seconds = 5.0
    bucket = int(seconds * SR) // HOP + 1
    batcher = pipeline.enable_batching(
        buckets=(bucket,), max_batch=max_batch, max_wait_ms=max_wait_ms,
        transfer="mulaw", transfer_in="f16", device_stage=True,
        pipeline_depth=3, batch_encoder=batch_encoder,
        audio_in="i16" if "--audio_i16" in sys.argv else "f32",
        **req_kw,
    )
    rng = np.random.default_rng(0)
    n = int(seconds * SR)
    t_ax = np.arange(n) / SR
    reqs = [(0.3 * np.sin(2 * np.pi * (180.0 + 7 * i) * t_ax)
             + 0.01 * rng.standard_normal(n)).astype(np.float32)
            for i in range(n_requests)]
    audio_s = n / SR

    t0 = time.time()
    pipeline.warmup_batching()
    print(f"warmup_batching: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    pipeline.infer(reqs[0], SR, spk_id=1, **req_kw)
    print(f"solo warm infer: {time.time()-t0:.1f}s", flush=True)

    for rep in range(2):
        errors = []
        lat = []
        submits = []

        def run_one(a):
            t1 = time.perf_counter()
            submits.append(t1)
            try:
                pipeline.infer(a, SR, spk_id=1, **req_kw)
                lat.append(time.perf_counter() - t1)
            except Exception as e:
                errors.append(e)

        start = time.perf_counter()
        threads = [threading.Thread(target=run_one, args=(a,))
                   for a in reqs]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wall = time.perf_counter() - start
        if errors:
            raise errors[0]
        agg = n_requests * audio_s / wall
        st = batcher.stats()
        print(json.dumps({
            "rep": rep, "family": family, "aggregate_x": round(agg, 1),
            "wall_s": round(wall, 2),
            "lat_mean_s": round(float(np.mean(lat)), 2),
            "occupancy": st.get("mean_batch_occupancy"),
            "batches": st.get("batches"),
            "client_spread_ms": round(
                1e3 * (max(submits) - min(submits)), 1),
        }), flush=True)
        for b in st.get("recent_batches", []):
            print("  batch:", json.dumps(b), flush=True)
        if pipeline.enc_batcher is not None:
            est = pipeline.enc_batcher.stats()
            print("enc stats:", json.dumps(
                {k: v for k, v in est.items() if k != "recent_batches"}),
                flush=True)
            for b in est.get("recent_batches", []):
                print("  enc batch:", json.dumps(b), flush=True)
    batcher.close()
    if pipeline.enc_batcher is not None:
        pipeline.enc_batcher.close()


if __name__ == "__main__":
    main()
