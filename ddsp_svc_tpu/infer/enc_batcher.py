"""Dynamic request batching for the units encoder.

Full-stack serving's remaining serial cost is one HuBERT dispatch per
request (bench_serving_diffusion; each dispatch is a device-queue slot and,
on the tunneled backend, an RTT).  This engine collects concurrent encode
requests, zero-pads each to an audio bucket, and runs ONE jitted masked
forward per (bucket, sample_rate, hop) group.  The masked HubertModel
forward (features/hubert.py) computes the same mathematical function as
each row's solo encode — on CPU f32 they agree to reduction noise (~1e-6
rel at the production contentvec768l12 size; tests/test_hubert_batched.py).
On TPU at the DEFAULT matmul precision the agreement is ~7.5e-3 rel
(`TPU_CHECKS.json encoder_batched`): the MXU rounds f32 matmuls through
bf16 passes and that rounding is shape-dependent, so the padded bucket
shape tiles (and rounds) differently from the solo shape through 12
transformer layers — the same default-vs-HIGHEST gap the `nsf_subpixel`
check records.  With `jax.default_matmul_precision('highest')` the two
paths agree at f32-reduction level on TPU too (measured by the check's
`max_rel_err_highest` field).  Not a masking bug: the masking itself is
exact.

The reference has no serving batcher at all (flask_api.py handles one POST
at a time); this composes with the synthesis batcher (infer/batcher.py) for
an end-to-end batched request path.
"""
from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.codec import mulaw_decode, mulaw_encode_u8
from .batcher import deadline_chunks, right_sized_slots


@dataclass
class _EncRequest:
    audio: np.ndarray  # (L,) float32 host audio
    sample_rate: int
    hop_size: int
    bucket_len: int  # padded sample count (group key)
    index: np.ndarray  # per-request synth-grid gather index
    want_f0: bool = False  # encode_with_f0 request (bucket-length contract)
    shift: float = 0.0  # keyshift semitones, applied to f0 in-graph
    done: threading.Event = field(default_factory=threading.Event)
    result: object = None  # (1, t, C) or (1, b, C) device array
    result_f0: object = None  # (1, b, 1) device array (want_f0 mode)
    error: Exception | None = None

    @property
    def group(self) -> tuple:
        return (self.bucket_len, self.sample_rate, self.hop_size)


class BatchedEncoder:
    """Thread-safe batching front-end for UnitsEncoder.encode.

    ``encode()`` blocks the calling thread until its request's batch has
    run; the result stays DEVICE-resident (it feeds the synthesis
    batcher's device staging — no host round trip)."""

    def __init__(
        self,
        units_encoder,
        frame_buckets: tuple[int, ...] = (128, 256, 512, 1024),
        max_batch: int = 8,
        max_wait_ms: float = 5.0,
        with_f0: bool = False,
        f0_min: float = 50.0,
        f0_max: float = 1100.0,
        transfer_in: str = "f32",
        mesh=None,
    ):
        """``with_f0``: fuse a vmapped on-device YIN
        (features/yin_jax.py) into the same batched dispatch — the whole
        per-request device front-end (pitch + units) becomes ONE program
        per batch. Measured motivation (PERF.md r4): at B=1 each YIN is
        ~10-20 ms and each encode ~17 ms of serial device time, so 16
        concurrent requests spend ~480 ms of chip time on front-end
        programs alone; the batched fusion amortizes both."""
        self.enc = units_encoder
        self.frame_buckets = tuple(sorted(frame_buckets))
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self.with_f0 = bool(with_f0)
        self.f0_min, self.f0_max = float(f0_min), float(f0_max)
        # host->device codec for the batch AUDIO matrix — 'f32' or 'i16'
        # (upload int16, dequantize in-graph). Measured motivation
        # (PERF.md r4): at mb16 x 5 s requests the f32 audio upload is
        # ~14 MB/batch, the single largest wire cost of the fused
        # front-end on a ~30 MB/s tunnel; source audio is 16-bit to begin
        # with, so the quantization is below the material's own floor.
        # 'mulaw' (r5): 8-bit G.711-style companded upload — halves the
        # batch audio matrix vs i16 (the dominant h2d cost of the fused
        # front-end); ~38 dB SNR on speech-scale signals, quality-gated
        # end-to-end by TPU_CHECKS serving_chain_quality_au8
        if transfer_in not in ("f32", "i16", "mulaw"):
            raise ValueError(f"unknown transfer_in codec {transfer_in!r}")
        self.transfer_in = transfer_in
        # optional 1-axis mesh: the fused front-end program runs SPMD with
        # batch rows split across devices (encoder weights replicated) —
        # the dp-serving analogue of BatchedSynth's mesh mode. Slots stay
        # right-sized but mesh-divisible (_batch_slots).
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            (axis,) = mesh.axis_names
            if max_batch % mesh.devices.size:
                raise ValueError(
                    f"max_batch {max_batch} not divisible by mesh size "
                    f"{mesh.devices.size}")
            self._row_sharding = NamedSharding(mesh, P(axis))
            self._replicated = NamedSharding(mesh, P())
            self.enc.variables = jax.device_put(self.enc.variables,
                                                self._replicated)
        self._solo_f0_fns: dict = {}
        self._solo_enc_fns: dict = {}  # over-bucket grid-padded encodes
        self._fns: dict = {}  # (bucket_len, sample_rate) -> jitted fn
        self._q: queue.Queue = queue.Queue()
        self._pending: list[_EncRequest] = []
        self._stop = False
        self._stats_lock = threading.Lock()
        self._n_requests = 0
        self._n_batches = 0
        self._n_rows = 0
        self._n_slots = 0
        self._batch_trace: list[dict] = []  # per-batch wall breakdown ring
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    # ---- public ---------------------------------------------------------
    def encode(self, audio: np.ndarray, sample_rate: int, hop_size: int):
        """audio (L,) host float -> (1, t, C) device units on the synth hop
        grid (same contract as UnitsEncoder.encode).  Requests longer than
        the largest bucket fall back to the solo path."""
        if isinstance(audio, jnp.ndarray) and not isinstance(audio, np.ndarray):
            jax.effects_barrier()  # axon: a d2h fetch needs a barrier first
        audio = np.asarray(audio, np.float32).reshape(-1)
        t = audio.shape[0] // hop_size + 1
        bucket = None
        for b in self.frame_buckets:
            if t <= b:
                bucket = b
                break
        if bucket is None or self._stop:
            return self._solo_encode(audio, sample_rate, hop_size)
        idx = self.enc.align_index(audio.shape[0], sample_rate, hop_size)
        audio = self._encode_wire(audio)
        req = _EncRequest(
            audio, sample_rate, hop_size, bucket * hop_size, idx,
        )
        self._q.put(req)
        while not req.done.wait(timeout=1.0):
            if self._stop and not req.done.is_set():
                raise RuntimeError("BatchedEncoder closed")
        with self._stats_lock:
            self._n_requests += 1
        if req.error is not None:
            raise req.error
        return req.result

    def encode_with_f0(self, audio, sample_rate: int, hop_size: int,
                       shift: float = 0.0):
        """audio (L,) host float -> (units (1, b, C), f0 (1, b, 1)), both
        device-resident, bucket-length (b = frame bucket), computed in ONE
        batched dispatch (requires ``with_f0=True``).

        The keyshift multiply, the synth-grid gather, AND the synthesis
        batcher's padding convention (units 0 / f0 220 beyond the
        request's frames) all happen inside the fused graph, so the
        submitting thread performs ZERO per-request device ops — measured
        motivation (PERF.md r4): under concurrency, per-request eager
        enqueues serialize on the tunneled backend's submission path and
        stall the batch dispatch by seconds. The result rows feed
        BatchedSynth.infer(..., n_frames=t) unchanged. Valid frames match
        the solo device-YIN (make_pipeline_f0_fn): YIN is frame-local and
        the zero-padded tail is unvoiced, so the per-row unvoiced
        interpolation sees the same voiced support. Requests longer than
        the largest bucket fall back to solo dispatches (t-length rows)."""
        if not self.with_f0:
            raise RuntimeError("BatchedEncoder built without with_f0")
        if isinstance(audio, jnp.ndarray) and not isinstance(audio, np.ndarray):
            jax.effects_barrier()
        audio = np.asarray(audio, np.float32).reshape(-1)
        t = audio.shape[0] // hop_size + 1
        bucket = None
        for b in self.frame_buckets:
            if t <= b:
                bucket = b
                break
        if bucket is None or self._stop:
            units = self._solo_encode(audio, sample_rate, hop_size)
            f0 = self._solo_f0(audio, sample_rate, hop_size, shift)
            return units, f0
        idx = self.enc.align_index(audio.shape[0], sample_rate, hop_size)
        idx = np.pad(idx, (0, bucket - idx.shape[0]), mode="edge")
        audio = self._encode_wire(audio)
        req = _EncRequest(
            audio, sample_rate, hop_size, bucket * hop_size, idx,
            want_f0=True, shift=float(shift),
        )
        self._q.put(req)
        while not req.done.wait(timeout=1.0):
            if self._stop and not req.done.is_set():
                raise RuntimeError("BatchedEncoder closed")
        with self._stats_lock:
            self._n_requests += 1
        if req.error is not None:
            raise req.error
        return req.result, req.result_f0

    def _encode_wire(self, audio: np.ndarray) -> np.ndarray:
        """Submit-side wire codec (numpy releases the GIL: the work runs
        in parallel across client threads instead of serializing in the
        worker's batch-staging critical path)."""
        if self.transfer_in == "i16":
            return np.clip(np.rint(audio * 32767.0), -32768,
                           32767).astype(np.int16)
        if self.transfer_in == "mulaw":
            return mulaw_encode_u8(audio)
        return audio

    def _solo_encode(self, audio: np.ndarray, sample_rate: int,
                     hop_size: int):
        """Over-bucket solo encode on a coarse length grid (~0.5 s): the
        masked batched forward (B=1, valid_samples=n) reproduces the
        unpadded solo encode EXACTLY (the encoder batcher's masking
        contract), so grid padding costs nothing in accuracy while a
        stream of varying over-bucket lengths shares a handful of
        compiled executables instead of one per length (ADVICE r4)."""
        n = audio.shape[0]
        grid = max(hop_size, (sample_rate // (2 * hop_size)) * hop_size)
        padded_len = -(-n // grid) * grid
        key = ("enc", padded_len, sample_rate)
        fn = self._solo_enc_fns.pop(key, None)
        if fn is None:
            fn = jax.jit(self.enc.make_batched_encode_fn(
                sample_rate, padded_len))
        self._solo_enc_fns[key] = fn  # newest-last (LRU order)
        while len(self._solo_enc_fns) > 8:
            self._solo_enc_fns.pop(next(iter(self._solo_enc_fns)))
        a = np.zeros(padded_len, np.float32)
        a[:n] = audio
        units = fn(self.enc.variables, jnp.asarray(a)[None],
                   jnp.asarray([n], jnp.int32))
        idx = self.enc.align_index(n, sample_rate, hop_size)
        return jnp.take(units[0], jnp.asarray(idx), axis=0)[None]

    def _solo_f0(self, audio: np.ndarray, sample_rate: int, hop_size: int,
                 shift: float = 0.0):
        from ..features.yin_jax import make_pipeline_f0_fn

        t = audio.shape[0] // hop_size + 1
        # over-bucket solo requests pad up to a coarse length grid (~0.5 s)
        # so a stream of varying lengths shares a handful of compiled
        # lengths instead of one minutes-long remote compile each (ADVICE
        # r4). Zero-padding is f0-exact for the first t frames: YIN is
        # frame-local and the padded tail is unvoiced, so the voiced
        # support of the unvoiced-fill interpolation is unchanged.
        grid = max(hop_size, (sample_rate // (2 * hop_size)) * hop_size)
        padded_len = -(-audio.shape[0] // grid) * grid
        if padded_len > audio.shape[0]:
            audio = np.pad(audio, (0, padded_len - audio.shape[0]))
        key = (audio.shape[0], sample_rate, hop_size)
        fn = self._solo_f0_fns.pop(key, None)
        if fn is None:
            fn = jax.jit(make_pipeline_f0_fn(
                audio.shape[0], sample_rate, hop_size,
                self.f0_min, self.f0_max))
        self._solo_f0_fns[key] = fn  # re-insert: newest-last (LRU order)
        while len(self._solo_f0_fns) > 8:
            self._solo_f0_fns.pop(next(iter(self._solo_f0_fns)))
        f0 = fn(jnp.asarray(audio))[None, :t, None]
        if shift:
            f0 = f0 * float(2.0 ** (shift / 12.0))
        return f0

    def warmup(self, sample_rate: int, hop_size: int) -> None:
        """Compile each bucket's batched graph before traffic arrives —
        every right-sized pow-2 row count (see _batch_slots), so a load
        spike never pays a compile inside the serving window."""
        for b in self.frame_buckets:
            n = (b - 1) * hop_size
            self.encode(np.zeros(n, np.float32), sample_rate, hop_size)
            bucket_len = b * hop_size
            sizes = sorted({self._batch_slots(k)
                            for k in range(1, self.max_batch + 1)})
            fn = self._fn(bucket_len, sample_rate, hop_size)
            wire_dtype = {"i16": jnp.int16, "mulaw": jnp.uint8}.get(
                self.transfer_in, jnp.float32)
            for rows in sizes:
                args = [self.enc.variables,
                        jnp.zeros((rows, bucket_len), wire_dtype),
                        jnp.full((rows,), bucket_len, jnp.int32)]
                if self.with_f0:
                    args += [jnp.zeros((rows, b), jnp.int32),
                             jnp.zeros((rows,), jnp.float32),
                             jnp.full((rows,), b, jnp.int32)]
                fn(*args)
            jax.effects_barrier()

    def reset_stats(self) -> None:
        """Zero counters/traces after the warmup traffic drill (same
        rationale as BatchedSynth.reset_stats)."""
        with self._stats_lock:
            self._n_requests = 0
            self._n_batches = 0
            self._n_rows = 0
            self._n_slots = 0
            self._batch_trace.clear()

    def stats(self) -> dict:
        with self._stats_lock:
            n_req, n_b = self._n_requests, self._n_batches
            n_rows, n_slots = self._n_rows, self._n_slots
        return {
            "requests": n_req,
            "batches": n_b,
            # rows / dispatched (right-sized) slots = dummy-row waste;
            # fill = rows / max_batch capacity (formation tuning signal)
            "mean_batch_occupancy": (
                round(n_rows / max(n_slots, 1), 4) if n_b else None
            ),
            "mean_batch_fill": (
                round(n_rows / (n_b * self.max_batch), 4) if n_b else None
            ),
            "compiled_signatures": len(self._fns),
            "recent_batches": list(self._batch_trace[-16:]),
        }

    def close(self):
        self._stop = True
        self._q.put(None)
        self._worker.join(timeout=5)
        leftovers = list(self._pending)
        self._pending.clear()
        while True:
            try:
                r = self._q.get_nowait()
            except queue.Empty:
                break
            if r is not None:
                leftovers.append(r)
        for r in leftovers:
            r.error = RuntimeError("BatchedEncoder closed")
            r.done.set()

    # ---- internals ------------------------------------------------------
    def _fn(self, bucket_len: int, sample_rate: int, hop_size: int):
        key = (bucket_len, sample_rate, hop_size)
        fn = self._fns.get(key)
        if fn is None:
            enc_fn = self.enc.make_batched_encode_fn(sample_rate, bucket_len)

            def dequant(audio):
                # wire codecs: dequantize INSIDE the graph (trace-time
                # dtype dispatch, no extra executable for f32 callers)
                if audio.dtype == jnp.int16:
                    return audio.astype(jnp.float32) * (1.0 / 32767.0)
                if audio.dtype == jnp.uint8:  # mu-law expansion
                    return mulaw_decode(audio, xp=jnp)
                return audio

            if self.with_f0:
                from ..features.yin_jax import make_pipeline_f0_fn

                yin = make_pipeline_f0_fn(bucket_len, sample_rate, hop_size,
                                          self.f0_min, self.f0_max)
                b_frames = bucket_len // hop_size  # synth frame bucket

                def fused(variables, audio, valid, index, shift, tframes):
                    """One program for the whole batch front-end: wire
                    decode + masked units encode + vmapped YIN + keyshift
                    + synth-grid gather + the synthesis batcher's padding
                    convention (units 0 / f0 220 beyond each row's
                    tframes). Returns (units_enc (B, t_enc, C) for plain
                    encode() rows, units_g (B, b, C), f0 (B, b))."""
                    audio = dequant(audio)
                    units = enc_fn(variables, audio, valid)
                    f0 = jax.vmap(yin)(audio)[:, :b_frames]
                    f0 = f0 * (2.0 ** (shift / 12.0))[:, None]
                    ug = jnp.take_along_axis(units, index[..., None], axis=1)
                    live = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (index.shape[0], b_frames), 1
                        ) < tframes[:, None]
                    )
                    ug = jnp.where(live[..., None], ug, 0.0)
                    f0 = jnp.where(live, f0, 220.0)
                    return units, ug, f0

                if self.mesh is not None:
                    rs, rep = self._row_sharding, self._replicated
                    fn = jax.jit(fused,
                                 in_shardings=(rep, rs, rs, rs, rs, rs),
                                 out_shardings=(rs, rs, rs))
                else:
                    fn = jax.jit(fused)
            else:
                plain = lambda v, a, valid: enc_fn(v, dequant(a), valid)  # noqa: E731
                if self.mesh is not None:
                    rs, rep = self._row_sharding, self._replicated
                    fn = jax.jit(plain, in_shardings=(rep, rs, rs),
                                 out_shardings=rs)
                else:
                    fn = jax.jit(plain)
            self._fns[key] = fn
        return fn

    def _collect(self) -> list[_EncRequest]:
        if self._pending:
            first = self._pending.pop(0)
        else:
            first = self._q.get()
            if first is None:
                return []
        batch = [first]
        for r in list(self._pending):
            if len(batch) >= self.max_batch:
                break
            if r.group == first.group:
                self._pending.remove(r)
                batch.append(r)
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                r = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if r is None:
                self._q.put(None)
                break
            if r.group == first.group:
                batch.append(r)
            else:
                self._pending.append(r)
        return batch

    def _chunks(self, batch: list[_EncRequest]) -> list[list[_EncRequest]]:
        """deadline_chunks with this engine's sizing (the fused YIN makes
        a dummy front-end row as expensive as a real one); mesh batches
        stay whole."""
        if self.mesh is not None:
            return [batch]
        return deadline_chunks(batch, self._batch_slots)

    def _loop(self):
        while not self._stop:
            batch = self._collect()
            if not batch:
                continue
            for chunk in self._chunks(batch):
                try:
                    self._run(chunk)
                except Exception as e:
                    for r in chunk:
                        r.error = e
                        r.done.set()

    def _batch_slots(self, n_real: int) -> int:
        """Padded row count: next power of two >= n_real (same rationale
        as BatchedSynth._batch_slots — full-width padding synthesized
        1/occupancy x dummy front-end compute, and the fused YIN makes a
        dummy row as expensive as a real one). On a mesh: right-sized but
        mesh-divisible (smallest pow-2 per-device count x mesh size)."""
        return right_sized_slots(n_real, self.max_batch, self.mesh)

    def _run(self, batch: list[_EncRequest]):
        t_formed = time.monotonic()
        bucket_len, sample_rate, hop = batch[0].group
        n = self._batch_slots(len(batch))
        in_dtype = {"i16": np.int16, "mulaw": np.uint8}.get(
            self.transfer_in, np.float32)
        fill = 128 if in_dtype == np.uint8 else 0  # mu-law zero point
        audio = np.full((n, bucket_len), fill, in_dtype)
        valid = np.full((n,), bucket_len, np.int32)  # dummy rows: full length
        for i, r in enumerate(batch):
            a = r.audio
            if a.dtype != in_dtype:
                # batched submit paths pre-quantize in the client thread;
                # this covers direct callers handing float rows
                a = self._encode_wire(np.asarray(a, np.float32))
            audio[i, : a.shape[0]] = a
            valid[i] = a.shape[0]
        if self.with_f0:
            b_frames = bucket_len // hop
            index = np.zeros((n, b_frames), np.int32)
            shift = np.zeros((n,), np.float32)
            tframes = np.full((n,), b_frames, np.int32)
            for i, r in enumerate(batch):
                if r.want_f0:
                    index[i] = r.index
                    shift[i] = r.shift
                    tframes[i] = r.audio.shape[0] // hop + 1
            t_staged = time.monotonic()
            units, units_g, f0b = self._fn(bucket_len, sample_rate, hop)(
                self.enc.variables, jnp.asarray(audio), jnp.asarray(valid),
                jnp.asarray(index), jnp.asarray(shift), jnp.asarray(tframes),
            )
        else:
            t_staged = time.monotonic()
            units = self._fn(bucket_len, sample_rate, hop)(
                self.enc.variables, jnp.asarray(audio), jnp.asarray(valid)
            )
            units_g = f0b = None
        with self._stats_lock:
            self._n_batches += 1
            self._n_rows += len(batch)
            self._n_slots += n
            # stage = host staging (copies into the batch matrix),
            # dispatch = jit call (async enqueue; results stay on device,
            # so there is no barrier/fetch leg here)
            self._batch_trace.append({
                "rows": len(batch), "slots": n,
                "stage_ms": round(1e3 * (t_staged - t_formed), 1),
                "dispatch_ms": round(1e3 * (time.monotonic() - t_staged), 1),
            })
            if len(self._batch_trace) > 64:
                del self._batch_trace[:-64]
        for i, r in enumerate(batch):
            if r.want_f0:
                # bucket-length rows, already gathered/padded in-graph:
                # the ONLY per-request device ops are these two row views
                r.result = units_g[i][None]
                r.result_f0 = f0b[i][None, :, None]
            else:
                # async device gather: result rows stay on device for the
                # synthesis batcher's device staging
                r.result = jnp.take(units[i], jnp.asarray(r.index),
                                    axis=0)[None]
            r.done.set()
