"""Supervised-serving soak on the real backend (VERDICT r4 item 5 'done'
criterion): drive the production DiffusionFast serving stack over HTTP
through `cli/api --worker_max_requests`, and show the axon h2d RSS growth
is BOUNDED by worker recycling (each recycle resets the leaked staging
buffers with zero downtime) at sustained req/s.

Usage:
  /opt/venv/bin/python scripts/probe_supervised_soak.py \
      [--seconds=360] [--clients=12] [--recycle=150] [--no_supervisor]

Writes one JSON line at the end; worker RSS sampled every 5 s.
"""
import io
import json
import os
import sys
import threading
import time
import urllib.request
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.io import wavfile


def _rss_mb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/statm") as f:
            return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1e6
    except Exception:
        return 0.0


def _ckpt_dir(tiny: bool = False) -> str:
    """Production-scale DiffusionFast checkpoint + config on disk (the
    bench rig saved once under /tmp, reused across runs). ``tiny``: the
    smoke-tier dims + tiny encoder — a CPU-runnable flow test of the
    whole supervised-soak rig so a script bug never costs a healthy
    hardware window."""
    d = ("/tmp/ddsp_svc_tpu_serving_ckpt_tiny" if tiny
         else "/tmp/ddsp_svc_tpu_serving_ckpt")
    ck = os.path.join(d, "model_1.ckpt")
    if os.path.exists(ck):
        return ck
    os.makedirs(d, exist_ok=True)
    import jax
    import jax.numpy as jnp

    from ddsp_svc_tpu.models.cascade import Unit2WavFast
    from ddsp_svc_tpu.train.checkpoint import save_checkpoint
    from ddsp_svc_tpu.utils.config import save_config

    SR, HOP, WIN, N_UNIT, M = 44100, 512, 2048, 768, 128
    n_layers, n_chans, encoder, enc_sr, enc_hop = (
        6, 512, "contentvec768l12", 16000, 320)
    if tiny:
        SR, HOP, WIN, N_UNIT, M = 16000, 64, 256, 256, 16
        n_layers, n_chans, encoder, enc_sr, enc_hop = (
            2, 32, "tiny", 16000, 320)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        model = Unit2WavFast(SR, HOP, WIN, N_UNIT, 1, out_dims=M,
                             n_layers=n_layers, n_chans=n_chans,
                             k_step_max=100)
        variables = model.init(
            {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
            jnp.zeros((1, 16, N_UNIT)), 220.0 * jnp.ones((1, 16, 1)),
            jnp.ones((1, 16, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
            gt_spec=jnp.zeros((1, 16, M)), infer=True,
            key=jax.random.PRNGKey(3), k_step=100, infer_speedup=10,
            sampler="dpm-solver",
        )
    save_checkpoint(d, 1, jax.device_get(variables["params"]))
    voc_ckpt = None
    if tiny:
        # a tiny NSF-HiFiGAN ckpt (the full-size default would dominate
        # the CPU flow test)
        from flax import serialization

        from ddsp_svc_tpu.models.nsf_hifigan import Generator

        cfg = dict(sampling_rate=SR, num_mels=M, n_fft=WIN, win_size=WIN,
                   hop_size=HOP, fmin=40, fmax=7000,
                   upsample_rates=[4, 4, 4], upsample_kernel_sizes=[8, 8, 8],
                   upsample_initial_channel=16, resblock="1",
                   resblock_kernel_sizes=[3],
                   resblock_dilation_sizes=[[1, 3]])
        gen = Generator(sampling_rate=SR, num_mels=M,
                        upsample_rates=(4, 4, 4),
                        upsample_kernel_sizes=(8, 8, 8),
                        upsample_initial_channel=16, resblock="1",
                        resblock_kernel_sizes=(3,),
                        resblock_dilation_sizes=((1, 3),))
        vp = gen.init({"params": jax.random.PRNGKey(3),
                       "noise": jax.random.PRNGKey(4)},
                      jnp.zeros((1, 8, M)), 220.0 * jnp.ones((1, 8)))["params"]
        voc_ckpt = os.path.join(d, "voc.msgpack")
        with open(voc_ckpt, "wb") as f:
            f.write(serialization.msgpack_serialize(
                {"params": jax.device_get(vp), "config": cfg}))
    save_config(os.path.join(d, "config.yaml"), {
        "data": {"sampling_rate": SR, "block_size": HOP, "duration": 2,
                 "encoder": encoder, "encoder_ckpt": None,
                 "encoder_sample_rate": enc_sr, "encoder_hop_size": enc_hop,
                 "encoder_out_channels": N_UNIT,
                 "f0_extractor": "yin", "f0_min": 50, "f0_max": 1100},
        "model": {"type": "DiffusionFast", "win_length": WIN, "n_spk": 1,
                  "n_layers": n_layers, "n_chans": n_chans,
                  "k_step_max": 100, "out_dims": M, "timesteps": 1000},
        "vocoder": {"type": "nsf-hifigan", "ckpt": voc_ckpt},
        "infer": {},
    })
    return ck


def _wav_bytes(seconds=5.0, freq=200.0, sr=44100):  # noqa: D103
    n = np.arange(int(sr * seconds))
    a = (0.3 * np.sin(2 * np.pi * freq * n / sr)
         + 0.01 * np.random.default_rng(0).standard_normal(len(n)))
    buf = io.BytesIO()
    wavfile.write(buf, sr, (a * 32767).astype(np.int16))
    return buf.getvalue()


def _post(base, wav):
    boundary = uuid.uuid4().hex
    out = io.BytesIO()
    # the flask_api_diff field contract: k_step 100 / speedup 10 /
    # dpm-solver (the serving_diffusion_max sampler signature)
    for name, value in (("sample", wav), ("fPitchChange", 0.0),
                        ("sSpeakId", 1), ("sampleRate", 44100),
                        ("sample_method", "dpm-solver"),
                        ("sample_interval", 10), ("skip_steps", 900)):
        out.write(f"--{boundary}\r\n".encode())
        out.write(f'Content-Disposition: form-data; name="{name}"'
                  f"\r\n\r\n".encode())
        out.write(value if isinstance(value, bytes) else str(value).encode())
        out.write(b"\r\n")
    out.write(f"--{boundary}--\r\n".encode())
    req = urllib.request.Request(
        f"{base}/voiceChangeModel", data=out.getvalue(), method="POST",
        headers={"Content-Type":
                 f"multipart/form-data; boundary={boundary}"})
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.status, len(r.read())


def main():
    seconds, clients, recycle = 360.0, 12, 150
    supervised = "--no_supervisor" not in sys.argv
    tiny = "--tiny" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--seconds="):
            seconds = float(a.split("=")[1])
        elif a.startswith("--clients="):
            clients = int(a.split("=")[1])
        elif a.startswith("--recycle="):
            recycle = int(a.split("=")[1])

    if tiny:
        # CPU-runnable flow test: pin the WHOLE tree to CPU — the env var
        # reaches supervised worker children (which would otherwise attach
        # the axon tunnel and burn minutes of remote compile on a script
        # test), jax.config covers this in-process parent
        os.environ["DDSP_SVC_TPU_PLATFORM"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    if supervised and not os.environ.get("DDSP_SVC_TPU_PLATFORM"):
        # the PARENT never touches the accelerator in supervised mode
        # (ckpt building + HTTP only) — pin it to CPU so only the worker
        # children attach the tunnel; children read the env, not this
        # in-process config
        import jax

        jax.config.update("jax_platforms", "cpu")
    ck = _ckpt_dir(tiny=tiny)
    from ddsp_svc_tpu.cli import api as api_cli

    # ONE bucket sized for the soak's request length: worker warmup (and
    # every recycle's cache load) covers one bucket's shapes, not four
    bucket = "256" if tiny else "512"
    argv = ["-m", ck, "-p", "0", "--batch", "16", "--batch_wait_ms", "200",
            "--batch_buckets", bucket,
            "--batch_mulaw", "--batch_f16_in", "--batch_pipeline", "3",
            "--batch_encoder", "--device_f0", "--audio_i16", "--voc_bf16",
            "--warmup"]
    if supervised:
        argv += ["--worker_max_requests", str(recycle),
                 "--worker_max_rss_mb", "6000"]
    holder, ready = {}, threading.Event()

    def ready_cb(server):
        holder["server"] = server
        ready.set()

    th = threading.Thread(target=api_cli.main, args=(argv,),
                          kwargs={"ready_cb": ready_cb}, daemon=True)
    th.start()
    assert ready.wait(timeout=120)
    server = holder["server"]
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    # wait for worker health (first spawn compiles/warms; cache-assisted)
    deadline = time.monotonic() + 3600
    while time.monotonic() < deadline:
        try:
            with urllib.request.urlopen(f"{base}/health", timeout=5):
                break
        except Exception:
            time.sleep(2)
    print("serving healthy; soaking", flush=True)

    wav = _wav_bytes(seconds=1.0 if tiny else 5.0,
                     sr=16000 if tiny else 44100)
    stop = time.monotonic() + seconds
    lat, errs = [], []
    rss_samples = []

    def client():
        while time.monotonic() < stop:
            t0 = time.perf_counter()
            try:
                status, _ = _post(base, wav)
                if status == 200:
                    lat.append(time.perf_counter() - t0)
                else:
                    errs.append(status)
            except Exception as e:
                errs.append(str(e)[:60])

    threads = [threading.Thread(target=client) for _ in range(clients)]
    t_start = time.monotonic()
    for t in threads:
        t.start()
    while time.monotonic() < stop:
        if supervised:
            cur = server._current
            pid = cur["proc"].pid if cur else None
            gen = server.generations
        else:
            pid, gen = os.getpid(), 1
        rss_samples.append({
            "t": round(time.monotonic() - t_start, 1),
            "gen": gen, "pid": pid,
            "worker_rss_mb": round(_rss_mb(pid), 1) if pid else None,
            "self_rss_mb": round(_rss_mb(os.getpid()), 1),
        })
        print(json.dumps(rss_samples[-1]), flush=True)
        time.sleep(5)
    for t in threads:
        t.join(timeout=600)
    wall = time.monotonic() - t_start
    worker_rss = [s["worker_rss_mb"] for s in rss_samples
                  if s["worker_rss_mb"]]
    summary = {
        "metric": "serving_soak_supervised" if supervised
                  else "serving_soak_single_process",
        "requests_ok": len(lat), "errors": len(errs),
        "req_per_s": round(len(lat) / wall, 2),
        "aggregate_x_realtime": round(len(lat) * 5.0 / wall, 1),
        "p50_ms": round(1000 * float(np.percentile(lat, 50)), 1) if lat
                  else None,
        "p99_ms": round(1000 * float(np.percentile(lat, 99)), 1) if lat
                  else None,
        "recycles": (server.generations - 1) if supervised else 0,
        "worker_rss_max_mb": max(worker_rss) if worker_rss else None,
        "worker_rss_last_mb": worker_rss[-1] if worker_rss else None,
        "soak_seconds": round(wall, 1),
        "err_sample": errs[:3],
    }
    print(json.dumps(summary), flush=True)
    if supervised:
        server.shutdown()


if __name__ == "__main__":
    main()
