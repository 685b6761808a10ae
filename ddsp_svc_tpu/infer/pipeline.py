"""End-to-end voice-conversion pipeline object.

The reusable core behind the offline CLI, the realtime engine, and the HTTP
API — the equivalent of gui.py's SvcDDSP.infer (gui.py:75-147): audio in ->
f0/volume/units -> model -> (enhancer | vocoder) -> audio out.
"""
from __future__ import annotations

import threading

import numpy as np

import jax
import jax.numpy as jnp

from ..features.f0 import F0Extractor
from ..features.volume import VolumeExtractor
from ..models.registry import load_model
from ..models.vocoder import Enhancer, Vocoder
from ..ops.interp import upsample
from ..train.solver import model_family


class SvcPipeline:
    def __init__(
        self,
        model_path: str,
        pitch_extractor: str = "yin",
        f0_min: float = 50.0,
        f0_max: float = 1100.0,
        enhance: bool = False,
        vocoder_bf16: bool = False,
        device_f0: bool = False,
    ):
        from ..cli.common import build_units_encoder

        model, variables, args = load_model(model_path)
        self._init_from_parts(model, variables, args,
                              build_units_encoder(args),
                              pitch_extractor, f0_min, f0_max, enhance,
                              vocoder_bf16, device_f0)

    @classmethod
    def from_parts(
        cls,
        model,
        variables,
        args,
        units_encoder,
        pitch_extractor: str = "yin",
        f0_min: float = 50.0,
        f0_max: float = 1100.0,
        enhance: bool = False,
        vocoder_bf16: bool = False,
        device_f0: bool = False,
    ) -> "SvcPipeline":
        """Build a pipeline from in-memory objects (no checkpoint on disk) —
        used by benchmarks and tests with random-init weights."""
        self = cls.__new__(cls)
        self._init_from_parts(model, variables, args, units_encoder,
                              pitch_extractor, f0_min, f0_max, enhance,
                              vocoder_bf16, device_f0)
        return self

    def _init_from_parts(self, model, variables, args, units_encoder,
                         pitch_extractor, f0_min, f0_max, enhance,
                         vocoder_bf16: bool = False,
                         device_f0: bool = False):
        self.model, self.variables, self.args = model, variables, args
        self.family = model_family(self.args.model.type)
        self.units_encoder = units_encoder
        self.pitch_extractor_name = pitch_extractor
        self.f0_min, self.f0_max = f0_min, f0_max
        # on-device YIN front-end (features/yin_jax.py): each request's f0
        # becomes one async device dispatch instead of ~23 ms of GIL-bound
        # host numpy — the measured binder of full-stack serving (PERF.md)
        self.device_f0 = bool(device_f0) and pitch_extractor == "yin"
        self._f0_extractors: dict[int, F0Extractor] = {}
        self.enhancer = None
        self.vocoder = None
        if self.family == "ddsp" and enhance and self.args.enhancer:
            # vocoder_bf16 applies to the enhancer's generator for the
            # ddsp family (the mel families' Vocoder below uses it the
            # same way; quality gate: TPU_CHECKS nsf_bf16_quality)
            self.enhancer = Enhancer(
                self.args.enhancer.type, self.args.enhancer.ckpt,
                dtype=jnp.bfloat16 if vocoder_bf16 else None,
            )
        if self.family != "ddsp":
            vc = self.args.vocoder or {}
            # bf16 vocoder activations: +26 % measured on the e2e chain
            # (645.6x vs 513.9x same-window; quality gated on hardware by
            # TPU_CHECKS.json nsf_bf16_quality) — opt-in, params stay f32
            self.vocoder = Vocoder(
                vc.get("type", "nsf-hifigan"), vc.get("ckpt"),
                dtype=jnp.bfloat16 if vocoder_bf16 else None,
            )
        # per-request PRNG state lives on the HOST backend: an eager
        # random.split on the accelerator is one more remote enqueue per
        # request on the tunneled backend's contended submission path; the
        # key uploads as part of the worker's single stack enqueue instead
        self._cpu_dev = jax.local_devices(backend="cpu")[0]
        with jax.default_device(self._cpu_dev):
            self._key = jax.random.PRNGKey(0)
        self._key_lock = threading.Lock()  # infer() is called from server threads
        # jit cache per static signature: realtime feeds fixed-context
        # blocks, so after the first block every call hits a compiled
        # executable (the reference recompiles nothing because torch is
        # eager; under XLA an uncached apply would retrace per call)
        self._jit_fwd: dict[tuple, object] = {}
        self.batcher = None
        self.enc_batcher = None

    def enable_batching(self, buckets=(128, 256, 512, 1024), max_batch: int = 8,
                        max_wait_ms: float = 5.0, mesh=None,
                        max_signatures: int = 4, transfer_int16: bool = False,
                        transfer: str | None = None, transfer_in: str = "f32",
                        device_stage: bool = True,
                        pipeline_depth: int = 1, batch_encoder: bool = False,
                        audio_in: str = "f32",
                        mask_threshold: float = -60.0,
                        **model_kwargs):
        """Route synthesis through the dynamic request batcher
        (infer/batcher.py): concurrent `infer()` callers sharing a frame
        bucket ride one device call. The reference's flask_api serves one
        request per model pass; on TPU a single request leaves the chip
        mostly idle (see PERF.md roofline), so batching is the serving
        throughput lever.

        For diffusion/reflow families the sampler settings
        (``model_kwargs``: speedup/method/k_step or
        infer_step/method/t_start) become a static *signature*: requests
        batch with same-signature peers, so the per-request sampler fields
        of flask_api_diff.py:39-56 still ride batched graphs. Each distinct
        signature costs one XLA compile per bucket; at most
        ``max_signatures`` distinct signatures total (including the
        enable-time default) are admitted — further novel settings fall
        back to the direct path. The batched
        graph is a vmap of the identical single-request cascade+vocoder
        computation, so each request's output is independent of its batch."""
        from .batcher import BatchedSynth

        if self.batcher is not None:
            self.batcher.close()
        if self.enc_batcher is not None:
            self.enc_batcher.close()
            self.enc_batcher = None
        if (batch_encoder or self.device_f0) and hasattr(
                self.units_encoder, "make_batched_encode_fn"):
            # batch the units encoder across requests too (exact masked
            # forward, infer/enc_batcher.py) — full-stack serving's
            # remaining per-request device dispatch.
            # device_f0 + batching ALWAYS takes this fused front-end:
            # a per-request solo device-YIN chain under concurrency
            # floods the async submission path (measured r4: 12-15 s
            # dispatch stalls, 3x aggregate vs 87x fused — the host-f0
            # path only survives because its ~30 ms of host FFT work
            # staggers the client threads)
            from .enc_batcher import BatchedEncoder

            self.enc_batcher = BatchedEncoder(
                self.units_encoder, frame_buckets=buckets,
                max_batch=max_batch, max_wait_ms=max_wait_ms, mesh=mesh,
                # --device_f0 + --batch_encoder compose: the vmapped YIN
                # fuses into the same batched dispatch, so the whole
                # per-request device front-end (pitch + units) is ONE
                # program per batch (PERF.md r4 attribution)
                with_f0=self.device_f0, f0_min=self.f0_min,
                f0_max=self.f0_max,
                # 'i16' halves+halves the dominant h2d cost (the audio
                # batch matrix) on constrained links; source audio is
                # 16-bit to begin with
                transfer_in=audio_in,
            )
        if self.family == "ddsp":
            builder = None
            params = self.variables["params"]
            out_hop = None
            self._enh_in_batch = False
            if self.enhancer is not None:
                ev = self.enhancer.vocoder
                same_grid = (
                    ev.vocoder_sample_rate == int(self.args.data.sampling_rate)
                    and ev.vocoder_hop_size == int(self.args.data.block_size)
                )
                if same_grid:
                    # flask_api.py:83-84,136-142 serves CombSub + Enhancer
                    # end to end; a per-request eager enhancer would be
                    # the serving serialization killer (one device chain
                    # per request), so the WHOLE chain — synth -> volume
                    # mask (gui.py:114-119, BEFORE the enhancer) -> mel ->
                    # NSF-HiFiGAN — runs inside the batched graph, one
                    # program per batch. Static adaptive_key=0 / equal
                    # grids only (the reference default); other settings
                    # keep the eager per-request form via the direct path.
                    model = self.model
                    block = int(self.args.data.block_size)
                    self._enh_in_batch = True
                    self._batch_sigs = {
                        (("mask_threshold", float(mask_threshold)),)
                    }
                    self._batch_max_sigs = max_signatures
                    self._batch_sig_lock = threading.Lock()

                    def builder(bucket, sig):
                        gate = 10.0 ** (dict(sig)["mask_threshold"] / 20.0)

                        def single(params, u, f, v, s, k, t):
                            # per-row live-frame mask: padded dummy frames
                            # must not color the request's tail through
                            # the mel window + generator receptive field
                            # (the r5 padded-tail finding)
                            live = (jnp.arange(bucket) < t).astype(
                                jnp.float32)
                            noise = jax.random.normal(
                                k, (bucket * model.block_size,), jnp.float32
                            )
                            audio, _, _ = model.apply(
                                {"params": params["model"]}, u[None],
                                f[None], v[None], spk_id=s[None],
                                infer=True, noise=noise[None],
                            )
                            # frame gate + edge pad + max-dilate +
                            # upsample, applied BEFORE the enhancer
                            # (gui.py:114-135 order; the in-graph twin of
                            # VolumeExtractor.get_mask)
                            from ..features.volume import get_mask_jnp

                            m = get_mask_jnp(v[None, :, 0], gate)
                            m = m * live[None, :]
                            m = upsample(m[..., None], block)[..., 0]
                            audio = audio * m[:, : audio.shape[-1]]
                            # zero mel rows beyond the request (the eager
                            # path's conv zero-padding at its true length)
                            mel = ev.extract(audio) * live[None, :, None]
                            if ev.type == "nsf-hifigan-log10":
                                # Vocoder.infer parity: extract() scaled
                                # the log-mel by log10(e); invert before
                                # the generator
                                mel = mel / 0.434294
                            # the eager Enhancer path vocodes with the
                            # fixed PRNGKey(0) (Vocoder.infer default) —
                            # same here, so batched == solo exactly
                            f0g = f[None, : mel.shape[1], 0] * (
                                live[None, : mel.shape[1]])
                            return ev.model.apply(
                                {"params": params["enh"]}, mel, f0g,
                                key=jax.random.PRNGKey(0),
                            )[0]

                        def fwd(params, units, f0, volume, spk, keys,
                                tframes):
                            return jax.vmap(
                                single, in_axes=(None, 0, 0, 0, 0, 0, 0)
                            )(params, units, f0, volume, spk, keys, tframes)

                        return fwd

                    params = {"model": self.variables["params"],
                              "enh": ev.params}
                    out_hop = ev.vocoder_hop_size
            self.batcher = BatchedSynth(
                self.model, params, buckets=buckets,
                max_batch=max_batch, max_wait_ms=max_wait_ms, mesh=mesh,
                forward_builder=builder, out_hop=out_hop,
                transfer_int16=transfer_int16, transfer=transfer,
                transfer_in=transfer_in, device_stage=device_stage,
                pipeline_depth=pipeline_depth,
            )
            return self.batcher

        kwargs = self._sampler_kwargs(model_kwargs)
        vocoder = self.vocoder
        model = self.model
        family = self.family
        self._batch_sigs = {self._static_sig(kwargs)}  # admitted signatures
        self._batch_max_sigs = max_signatures
        self._batch_sig_lock = threading.Lock()

        def builder(bucket, sig):
            kw = dict(sig)  # the signature IS the static sampler kwargs
            if family != "unit2mel":
                kw["mel_extract_fn"] = (
                    lambda wav: vocoder.extract(
                        wav, self.args.data.sampling_rate
                    )
                )

            def single(params, u, f, v, s, k, t):
                mel = model.apply(
                    {"params": params["model"]}, u[None], f[None], v[None],
                    spk_id=s[None], spk_mix_dict=None, infer=True,
                    key=k, rngs={"noise": k}, **kw,
                )
                if vocoder.type == "nsf-hifigan-log10":  # Vocoder.infer parity
                    mel = mel / 0.434294
                # per-row live-frame mask: zero the mel rows and silence
                # the source f0 beyond the request's real frames, so the
                # padded dummy frames (units 0 / f0 220 convention) don't
                # color the returned tail through the vocoder's receptive
                # field (the r5 padded-tail finding; mirrors the direct
                # path's conv zero-padding at its true length)
                live = (jnp.arange(bucket) < t).astype(mel.dtype)
                mel = mel * live[None, :, None]
                f0g = f[None, :, 0] * live[None, :]
                audio = vocoder.model.apply(
                    {"params": params["vocoder"]}, mel, f0g,
                    key=k,
                )
                return audio[0]

            def fwd(params, units, f0, volume, spk, keys, tframes):
                return jax.vmap(
                    single, in_axes=(None, 0, 0, 0, 0, 0, 0)
                )(params, units, f0, volume, spk, keys, tframes)

            return fwd

        self.batcher = BatchedSynth(
            self.model,
            {"model": self.variables["params"], "vocoder": vocoder.params},
            buckets=buckets, max_batch=max_batch, max_wait_ms=max_wait_ms,
            mesh=mesh, forward_builder=builder,
            out_hop=vocoder.vocoder_hop_size, transfer_int16=transfer_int16,
            transfer=transfer, transfer_in=transfer_in,
            device_stage=device_stage, pipeline_depth=pipeline_depth,
        )
        return self.batcher

    def warmup_batching(self, traffic_drill: bool = True,
                        **infer_kwargs) -> None:
        """Precompile every batching bucket (cli/api --warmup): runs one
        dummy request per bucket under the enable-time default signature, so
        the first live request never pays a compile.

        ``traffic_drill``: additionally push ``max_batch`` CONCURRENT
        dummy requests through the full ``infer()`` chain (front-end +
        batcher + codecs). Measured r4: even with every executable
        compiled, the first concurrent window after startup pays one-time
        costs the per-graph warmup can't reach (first execution of the
        full chain under load; 5-9 s dispatch/fetch stalls on the first
        few batches) — a single drill absorbs them before live traffic.
        ``infer_kwargs`` are forwarded (sampler settings for non-default
        signatures)."""
        if self.batcher is None:
            raise RuntimeError("enable_batching() first")
        sig = ()
        if getattr(self, "_batch_sigs", None):
            # non-ddsp sampler signatures AND the fused ddsp+enhancer
            # mask-threshold signature both pre-admit their default
            with self._batch_sig_lock:
                sig = next(iter(self._batch_sigs))
        self.batcher.warmup(int(self.args.data.encoder_out_channels), sig)
        if self.enc_batcher is not None:
            self.enc_batcher.warmup(
                int(self.args.data.sampling_rate),
                int(self.args.data.block_size),
            )
        if traffic_drill:
            if not infer_kwargs and sig:
                # drive the drill under the ADMITTED signature (a novel
                # default would burn a max_signatures slot + compiles)
                name_map = {"infer_speedup": "speedup", "sampler": "method",
                            "mask_threshold": "threhold"}
                infer_kwargs = {name_map.get(k, k): v for k, v in sig}
            sr = int(self.args.data.sampling_rate)
            hop = int(self.args.data.block_size)
            n = (min(self.batcher.buckets) - 1) * hop
            audio = np.zeros(n, np.float32)
            errs = []

            def one():
                try:
                    self.infer(audio, sr, spk_id=1, **infer_kwargs)
                except Exception as e:  # pragma: no cover - surface below
                    errs.append(e)

            threads = [threading.Thread(target=one)
                       for _ in range(self.batcher.max_batch)]
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            if errs:
                raise errs[0]
            # ALSO drill one solo request: a lone arrival forms a 1-slot
            # batch through the fused front-end — a distinct executable
            # chain the concurrent drill never exercises (measured r5: a
            # 61 s first-solo compile INSIDE the serving window without
            # this)
            one()
            if errs:
                raise errs[0]
            # the drill's (deliberate) startup stalls must not sit in
            # /stats as p99s for traffic that never happened
            self.batcher.reset_stats()
            if self.enc_batcher is not None:
                self.enc_batcher.reset_stats()

    @staticmethod
    def _static_sig(sampler_kwargs) -> tuple:
        """Hashable batching signature: the static sampler settings
        (mel_extract_fn closures are per-instance and identical across
        requests, so they are rebuilt inside the batched graph instead)."""
        return tuple(sorted(
            (k, v) for k, v in sampler_kwargs.items() if k != "mel_extract_fn"
        ))

    def _admit_sig(self, sig: tuple) -> bool:
        """Admit a request's signature for batching, capped at
        ``max_signatures`` distinct values total (each costs one compile
        per bucket); non-admitted signatures use the direct path."""
        sigs = getattr(self, "_batch_sigs", None)
        if sigs is None:
            return False
        with self._batch_sig_lock:
            if sig in sigs:
                return True
            if len(sigs) < self._batch_max_sigs:
                sigs.add(sig)
                return True
        return False

    def _sampler_kwargs(self, model_kwargs):
        """The static sampler settings for a non-ddsp forward (the same
        resolution rules as the direct path in infer())."""
        args = self.args
        if self.family in ("diffusion", "unit2mel"):
            kwargs = dict(
                infer_speedup=model_kwargs.get("speedup", 10),
                sampler=model_kwargs.get("method", "dpm-solver"),
                # main_diff.py:307-315: k_step defaults to (and is clamped
                # by) k_step_max; a full-diffusion model (no k_step_max)
                # runs the whole 1000-step chain — keep this identical to
                # cli/infer.py so both drivers produce the same output
                k_step=min(
                    int(model_kwargs.get("k_step")
                        or args.model.k_step_max or 1000),
                    int(args.model.k_step_max or 1000),
                ),
            )
        else:
            kwargs = dict(
                infer_step=model_kwargs.get("infer_step", 20),
                sampler=model_kwargs.get("method", "euler"),
                t_start=model_kwargs.get(
                    "t_start", float(args.model.t_start or 0.0)
                ),
            )
        if self.family != "unit2mel":
            kwargs["mel_extract_fn"] = (
                lambda wav: self.vocoder.extract(wav, args.data.sampling_rate)
            )
        return kwargs

    def _ddsp_forward_masked(self):
        """Direct-path flagship forward with the volume mask fused in: one
        device dispatch per call instead of forward + eager upsample +
        multiply — per-dispatch tunnel jitter is the realtime block-latency
        tail (PERF.md)."""
        fn = self._jit_fwd.get("ddsp_masked")
        if fn is None:
            block = self.args.data.block_size

            def fwd(params, units, f0, volume, spk, key, frame_mask):
                out, _, _ = self.model.apply(
                    {"params": params}, units, f0, volume, spk_id=spk,
                    infer=True, rngs={"noise": key},
                )
                mask = upsample(frame_mask[None, :, None], block)[..., 0]
                return out * mask[:, : out.shape[-1]]

            fn = jax.jit(fwd)
            self._jit_fwd["ddsp_masked"] = fn
        return fn

    def _ddsp_forward_enc_masked(self, sample_rate: int, hop: int,
                                 audio_len: int, devf0_start: int | None = None):
        """Single-dispatch flagship path with the units encoder fused in:
        encoder + synth + volume mask as ONE jitted graph (see
        make_encode_fn; the per-dispatch tunnel RTT is the realtime
        block-latency tail). With ``devf0_start`` (device_f0 on the fused
        path) the YIN f0 front-end runs INSIDE the same graph — the block
        stays one device call and the host does no pitch work at all; the
        f0 slot of the returned fn takes the key_shift scalar instead."""
        key = ("ddsp_enc_masked", sample_rate, hop, audio_len, devf0_start)
        fn = self._jit_fwd.get(key)
        if fn is None:
            block = self.args.data.block_size
            encode = self.units_encoder.make_encode_fn(
                sample_rate, hop, audio_len
            )
            f0_fn = None
            if devf0_start is not None:
                from ..features.yin_jax import make_pipeline_f0_fn

                f0_fn = make_pipeline_f0_fn(
                    audio_len, sample_rate, hop,
                    self.f0_min, self.f0_max, devf0_start,
                )

            def fwd(params, enc_vars, audio, f0, volume, spk, key_,
                    frame_mask):
                units = encode(enc_vars, audio)
                if f0_fn is not None:  # f0 arg is the key_shift scalar
                    f0 = (f0_fn(audio[0])[None, :, None]
                          * 2.0 ** (f0 / 12.0))[:, : volume.shape[1]]
                out, _, _ = self.model.apply(
                    {"params": params}, units, f0, volume, spk_id=spk,
                    infer=True, rngs={"noise": key_},
                )
                mask = upsample(frame_mask[None, :, None], block)[..., 0]
                return out * mask[:, : out.shape[-1]]

            fn = jax.jit(fwd)
            self._jit_fwd[key] = fn
        return fn

    def _f0_extractor(self, sample_rate: int, hop: int) -> F0Extractor:
        if sample_rate not in self._f0_extractors:
            self._f0_extractors[sample_rate] = F0Extractor(
                self.pitch_extractor_name, sample_rate, hop, self.f0_min, self.f0_max
            )
        return self._f0_extractors[sample_rate]

    def infer(
        self,
        audio: np.ndarray,
        sample_rate: int,
        spk_id: int = 1,
        key_shift: float = 0.0,
        threhold: float = -60.0,
        silence_front: float = 0.0,
        enhancer_adaptive_key: float = 0.0,
        spk_mix_dict=None,
        use_silence: bool = False,
        key=None,
        **model_kwargs,
    ) -> tuple[np.ndarray, int]:
        """1-D float audio -> (converted audio, out_sample_rate).

        ``silence_front`` (non-ddsp families): the reference never vocodes
        the stale prefix — DiffGtMel crops the output mel to
        [start_frame:] before NSF-HiFiGAN and re-pads the audio with
        silence (diffusion/infer_gt_mel.py:53-59). With
        ``use_silence=True`` (the GUI's 'diff silence' checkbox,
        gui_diff.py:282) the WHOLE cascade runs on the cropped frames
        (infer_gt_mel.py:62-79) — the realtime latency lever for
        diffusion/reflow models, at some quality cost at the boundary."""
        args = self.args
        hop = int(args.data.block_size * sample_rate / args.data.sampling_rate)

        batcher = self.batcher  # read once: enable_batching/close may race
        # direct paths fuse the units encoder INTO the synthesis graph:
        # one device dispatch per call instead of encode + synth (each
        # dispatch's tunnel RTT is realtime block-latency tail, PERF.md);
        # batched paths stage units on the host for the batcher instead
        fuse_encoder = (
            batcher is None
            and spk_mix_dict is None
            and hasattr(self.units_encoder, "make_encode_fn")
        )
        start_frame_f0 = int(silence_front * sample_rate / hop)
        # device_f0 on a fused direct path: fold the YIN INTO the single
        # jitted block graph — the block stays ONE device call and the host
        # does no pitch work at all. The enhancer consumes the f0 track
        # after synthesis, so it keeps the standalone-dispatch form.
        fold_f0 = self.device_f0 and fuse_encoder and self.enhancer is None
        # batched front-end: device_f0 + BatchedEncoder(with_f0) — f0 comes
        # out of the SAME batched dispatch as the units (one program per
        # batch for the whole front-end). Snapshot the batcher once: a
        # concurrent close() between this check and the encode call must
        # not strand the request with f0=None.
        enc_batcher = self.enc_batcher
        batch_fe = (
            self.device_f0 and not fuse_encoder
            and enc_batcher is not None
            and getattr(enc_batcher, "with_f0", False)
            and start_frame_f0 == 0
            # spk-mix requests run the eager direct path, which consumes
            # t-length rows — keep them on the solo front-end
            and spk_mix_dict is None
        )
        if fold_f0 or batch_fe:
            f0 = None
        elif self.device_f0:
            # jitted YIN on the accelerator (features/yin_jax.py): the f0
            # stays device-resident all the way into the batcher staging /
            # fused forward — no host FFTs, no barrier, no fetch
            cache_key = ("yin_dev", len(audio), sample_rate, hop,
                         start_frame_f0)
            f0_fn = self._jit_fwd.get(cache_key)
            if f0_fn is None:
                from ..features.yin_jax import make_pipeline_f0_fn

                f0_fn = jax.jit(make_pipeline_f0_fn(
                    len(audio), sample_rate, hop,
                    self.f0_min, self.f0_max, start_frame_f0,
                ))
                self._jit_fwd[cache_key] = f0_fn
            f0 = f0_fn(jnp.asarray(audio, jnp.float32))[None, :, None]
            f0 = f0 * 2 ** (key_shift / 12.0)
        else:
            f0 = self._f0_extractor(sample_rate, hop).extract(
                audio, uv_interp=True, silence_front=silence_front
            )
            # stays a HOST array: it uploads as part of the consuming
            # dispatch (direct path) or the worker's stack enqueue
            # (batched path) — not as its own per-request remote op
            f0 = np.asarray(f0, np.float32)[None, :, None]
            f0 = f0 * np.float32(2 ** (key_shift / 12.0))

        vx = VolumeExtractor(hop)
        volume = vx.extract(audio)
        frame_mask = vx.get_mask(volume, threhold)

        def upsampled_mask(on_host: bool):
            """Sample-rate mask, built where it is consumed: batched results
            come back host-resident, so masking them on the host avoids a
            full audio-size h2d+d2h round trip (the serving path is
            d2h-bound, PERF.md); direct paths keep the tiny frame-level
            upload + on-device upsample."""
            if on_host:
                with jax.default_device(jax.local_devices(backend="cpu")[0]):
                    m = upsample(
                        jnp.asarray(frame_mask, jnp.float32)[None, :, None],
                        args.data.block_size,
                    )[..., 0]
                    return np.asarray(m)
            return upsample(
                jnp.asarray(frame_mask, jnp.float32)[None, :, None],
                args.data.block_size,
            )[..., 0]

        # host arrays throughout the staging path (same rationale as f0:
        # uploads ride the consuming dispatch, not per-request ops)
        volume_j = np.asarray(volume, np.float32)[None, :, None]
        n_samples = int(np.shape(audio)[-1])
        audio_j = np.asarray(audio, np.float32).reshape(1, -1)
        if fuse_encoder:
            units = None
            t = n_samples // hop + 1  # encode()'s frame contract
        else:
            if enc_batcher is not None and batch_fe:
                # one batched dispatch for the whole front-end: masked
                # units encode + vmapped YIN + keyshift + synth-grid
                # gather + batch-padding convention, all in-graph
                # (enc_batcher.encode_with_f0) — the submit thread does
                # zero device ops. Rows come back BUCKET-length; the
                # real frame count t is computed host-side and travels
                # as batcher.infer(..., n_frames=t).
                units, f0 = enc_batcher.encode_with_f0(
                    audio, sample_rate, hop, key_shift)
                t = n_samples // hop + 1
            elif enc_batcher is not None:
                # batched masked encode (exact vs solo); result is device-
                # resident and feeds the synth batcher's device staging
                units = enc_batcher.encode(audio, sample_rate, hop)
                t = units.shape[1]
            else:
                units = self.units_encoder.encode(
                    jnp.asarray(audio_j), sample_rate, hop)
                t = units.shape[1]
        if f0 is not None and not batch_fe:
            f0 = f0[:, :t]
        volume_j = volume_j[:, :t]

        # silent-prefix frame count (reference DiffGtMel.infer start_frame,
        # on the vocoder grid — equal to the synth grid here)
        start_frame = 0
        if self.family != "ddsp" and silence_front > 0:
            v = self.vocoder
            start_frame = min(
                int(silence_front * v.vocoder_sample_rate
                    / v.vocoder_hop_size),
                t - 1,
            )
        if use_silence and start_frame > 0:
            # crop the whole cascade input (infer_gt_mel.py:66-71); the
            # output is re-padded with silence below. In realtime the
            # prefix length is constant, so this is ONE static shape.
            if units is not None:
                units = units[:, start_frame:]
            if f0 is not None:
                f0 = f0[:, start_frame:]
            volume_j = volume_j[:, start_frame:]
            t = t - start_frame

        if key is not None:
            # explicit per-request key (reproducibility under concurrency:
            # the auto-split's request->key assignment follows thread
            # scheduling; deterministic serving checks pin it instead)
            sub = np.asarray(key)
        else:
            with self._key_lock:
                with jax.default_device(self._cpu_dev):  # host-backend split
                    self._key, sub = jax.random.split(self._key)
            # uncommitted host array: a CPU-COMMITTED key would give the
            # consuming jit a different (device-keyed) executable-cache
            # entry than its warmup compiled — measured as a ~20 s
            # first-traffic retrace+load stall inside the serving window
            sub = np.asarray(sub)
        spk = np.array([[spk_id]], np.int32)
        common = dict(spk_id=spk, spk_mix_dict=spk_mix_dict, infer=True)

        def crop_fe_rows():
            # bucket-length fused-front-end rows about to run a DIRECT
            # path (non-admitted sampler signature, or a batcher closed
            # mid-request): crop to the request's frames so they line up
            # with the t-length volume (two eager slices on a rare path)
            nonlocal units, f0
            if batch_fe and units is not None and units.shape[1] > t:
                units = units[:, :t]
                f0 = f0[:, :t]

        mask_done = False
        if self.family == "ddsp":
            if spk_mix_dict is None:
                if batcher is not None and t > batcher.buckets[-1]:
                    # longer than the largest bucket: run direct rather
                    # than fail the request (jit's own shape cache applies)
                    out = self._ddsp_forward_masked()(
                        self.variables["params"], units, f0, volume_j, spk,
                        sub, np.asarray(frame_mask, np.float32),
                    )
                    mask_done = True
                elif batcher is not None and getattr(
                        self, "_enh_in_batch", False):
                    # CombSub + Enhancer fused into the batched graph
                    # (flask_api.py:83-84,136-142 chain): the result comes
                    # back masked AND enhanced; the threshold is a static
                    # signature so per-request thresholds batch with
                    # same-threshold peers. The fused graph hardcodes
                    # adaptive_key=0 and no silence skip — requests using
                    # those levers take the direct + eager-enhancer path
                    sig = (("mask_threshold", float(threhold)),)
                    if (enhancer_adaptive_key in (0, 0.0)
                            and silence_front == 0.0
                            and self._admit_sig(sig)):
                        out = batcher.infer(
                            units[0], f0[0], volume_j[0], spk_id, sub,
                            sig=sig, n_frames=t,
                        )[None, :]
                        return out[0], self.enhancer.vocoder.vocoder_sample_rate
                    # non-admitted threshold: direct masked + eager enhancer
                    crop_fe_rows()
                    out = self._ddsp_forward_masked()(
                        self.variables["params"], units, f0, volume_j, spk,
                        sub, np.asarray(frame_mask, np.float32),
                    )
                    mask_done = True
                elif batcher is not None:
                    # device-resident submit: the encoder output never
                    # round-trips to the host (batcher pads/stacks with
                    # async jnp ops; a per-request barrier+fetch+re-upload
                    # was the dominant serial cost of full-stack serving)
                    out = batcher.infer(
                        units[0], f0[0], volume_j[0], spk_id, sub,
                        n_frames=t,
                    )[None, :]
                elif fuse_encoder:
                    out = self._ddsp_forward_enc_masked(
                        sample_rate, hop, audio_j.shape[-1],
                        devf0_start=start_frame_f0 if fold_f0 else None,
                    )(
                        self.variables["params"],
                        self.units_encoder.variables, audio_j,
                        jnp.float32(key_shift) if fold_f0 else f0,
                        volume_j, spk, sub,
                        np.asarray(frame_mask, np.float32),
                    )
                    mask_done = True
                else:
                    crop_fe_rows()
                    out = self._ddsp_forward_masked()(
                        self.variables["params"], units, f0, volume_j, spk,
                        sub, np.asarray(frame_mask, np.float32),
                    )
                    mask_done = True
            else:  # rare path: mixture dict is per-call, keep it eager
                out, _, _ = self.model.apply(
                    {"params": self.variables["params"]},
                    units, f0, volume_j, rngs={"noise": sub}, **common,
                )
            out_sr = args.data.sampling_rate
        else:
            sampler_kwargs = self._sampler_kwargs(model_kwargs)
            kwargs = dict(common)
            kwargs.update(sampler_kwargs)
            sig = self._static_sig(sampler_kwargs)
            if (batcher is not None and spk_mix_dict is None
                    and t <= batcher.buckets[-1]
                    and self._admit_sig(sig)):
                # device-resident submit (no per-request barrier/fetch)
                out = batcher.infer(
                    units[0], f0[0], volume_j[0], spk_id, sub, sig=sig,
                    n_frames=t,
                )[None, :]
                out_sr = self.vocoder.vocoder_sample_rate
                if use_silence and start_frame > 0:
                    # inputs were cropped pre-batcher: re-pad with silence
                    out = np.pad(
                        out,
                        ((0, 0),
                         (start_frame * self.vocoder.vocoder_hop_size, 0)),
                    )
                mask = upsampled_mask(on_host=True)
                out = out * mask[:, : out.shape[-1]]
                return out[0], out_sr
            crop_fe_rows()
            if spk_mix_dict is None:
                # ONE jitted graph for the whole block: cascade -> prefix
                # crop -> NSF-HiFiGAN -> silence re-pad -> volume mask.
                # The realtime loop is tunnel-RTT-bound (PERF.md): every
                # separate device call (and every eager pad/upsample/mul)
                # is a round trip whose jitter lands straight in the block
                # p95, so the direct path dispatches exactly one call here.
                static_key = tuple(
                    (k, v) for k, v in sorted(kwargs.items())
                    if k not in ("spk_id", "spk_mix_dict", "mel_extract_fn")
                ) + ("__full__", start_frame, bool(use_silence))
                if fuse_encoder:
                    static_key += ("__enc__", sample_rate, hop,
                                   audio_j.shape[-1])
                if fold_f0:
                    static_key += ("__devf0__", start_frame_f0)
                fn = self._jit_fwd.get(static_key)
                if fn is None:
                    jit_kwargs = dict(kwargs)
                    jit_kwargs.pop("spk_id", None)
                    jit_kwargs["spk_mix_dict"] = None
                    vocoder = self.vocoder
                    block = args.data.block_size
                    encode = (
                        self.units_encoder.make_encode_fn(
                            sample_rate, hop, audio_j.shape[-1]
                        )
                        if fuse_encoder else None
                    )
                    f0_fn = None
                    if fold_f0:  # YIN inside the same graph (device_f0)
                        from ..features.yin_jax import make_pipeline_f0_fn

                        f0_fn = make_pipeline_f0_fn(
                            audio_j.shape[-1], sample_rate, hop,
                            self.f0_min, self.f0_max, start_frame_f0,
                        )

                    def fwd(params, voc_params, enc_vars, units, f0, volume,
                            spk, key, frame_mask, _kw=jit_kwargs,
                            _sf=start_frame, _sil=bool(use_silence)):
                        if f0_fn is not None:  # f0 arg is key_shift scalar
                            f0 = (f0_fn(units[0])[None, :, None]
                                  * 2.0 ** (f0 / 12.0))
                            f0 = f0[:, : volume.shape[1]
                                    + (_sf if _sil else 0)]
                            if _sil and _sf > 0:
                                f0 = f0[:, _sf:]
                        if encode is not None:
                            units = encode(enc_vars, units)  # units == audio
                            units = units[:, : f0.shape[1] + (_sf if _sil
                                                              else 0)]
                            if _sil and _sf > 0:
                                units = units[:, _sf:]
                        mel = self.model.apply(
                            {"params": params}, units, f0, volume,
                            key=key, rngs={"noise": key}, spk_id=spk, **_kw,
                        )
                        f0v = f0
                        if not _sil and _sf > 0:
                            # never vocode the stale prefix
                            # (infer_gt_mel.py:53-59): crop the mel before
                            # NSF-HiFiGAN, re-pad the audio with silence
                            mel = mel[:, _sf:]
                            f0v = f0[:, _sf:]
                        if vocoder.type == "nsf-hifigan-log10":
                            mel = mel / 0.434294
                        audio = vocoder.model.apply(
                            {"params": voc_params}, mel,
                            f0v[:, : mel.shape[1], 0], key=key,
                        )
                        if _sf > 0:
                            audio = jnp.pad(
                                audio,
                                ((0, 0), (_sf * vocoder.vocoder_hop_size, 0)),
                            )
                        mask = upsample(
                            frame_mask[None, :, None], block
                        )[..., 0]
                        return audio * mask[:, : audio.shape[-1]]

                    fn = jax.jit(fwd)
                    self._jit_fwd[static_key] = fn
                out = fn(
                    self.variables["params"], self.vocoder.params,
                    # the encoder pytree rides only when it's in the graph:
                    # flattening hundreds of dead leaves costs dispatch time
                    # on exactly the latency path this fusion optimizes
                    self.units_encoder.variables if fuse_encoder else None,
                    audio_j if fuse_encoder else units,
                    jnp.float32(key_shift) if fold_f0 else f0,
                    volume_j, spk, sub,
                    np.asarray(frame_mask, np.float32),
                )
                out_sr = self.vocoder.vocoder_sample_rate
                if self.enhancer is None:
                    jax.effects_barrier()
                    return np.asarray(out)[0], out_sr
                mask_done = True
            else:
                mel = self.model.apply(
                    {"params": self.variables["params"]},
                    units, f0, volume_j, key=sub, rngs={"noise": sub},
                    **kwargs,
                )
                if not use_silence and start_frame > 0:
                    # never vocode the stale prefix (infer_gt_mel.py:53-59):
                    # crop the mel before NSF-HiFiGAN, re-pad with silence
                    mel = mel[:, start_frame:]
                    f0 = f0[:, start_frame:]
                out = self.vocoder.infer(mel, f0, key=sub)
                out_sr = self.vocoder.vocoder_sample_rate
                if start_frame > 0:
                    out = jnp.pad(
                        out,
                        ((0, 0),
                         (start_frame * self.vocoder.vocoder_hop_size, 0)),
                    )

        if isinstance(out, np.ndarray):  # host-resident batched result
            out = out * upsampled_mask(on_host=True)[:, : out.shape[-1]]
            if self.enhancer is None:
                return out[0], out_sr
            out = jnp.asarray(out)  # only the enhancer needs the device
        elif not mask_done:
            mask = upsampled_mask(on_host=False)
            out = out * mask[:, : out.shape[-1]]
        if self.enhancer is not None:
            if batch_fe:  # bucket-length fused-front-end f0: crop for the
                f0 = f0[:, :t]  # enhancer's frame-aligned consumption
            out, out_sr = self.enhancer.enhance(
                out, args.data.sampling_rate, f0, args.data.block_size,
                adaptive_key=enhancer_adaptive_key, silence_front=silence_front,
            )
        # device->host: on the tunneled axon backend a fetch only completes
        # after an effects barrier (no-op cost elsewhere)
        jax.effects_barrier()
        return np.asarray(out)[0], out_sr
