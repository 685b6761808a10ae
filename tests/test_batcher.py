"""Dynamic-batching serving engine (infer/batcher.py): batch-independence,
bucket padding, concurrency, error delivery."""
import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddsp_svc_tpu.infer.batcher import BatchedSynth
from ddsp_svc_tpu.models.ddsp import CombSubSuperFast
from helpers import StubUnitsEncoder

SR, HOP, WIN, N_UNIT = 16000, 64, 256, 16


@pytest.fixture(scope="module")
def synth():
    model = CombSubSuperFast(SR, HOP, WIN, n_unit=N_UNIT, n_spk=4)
    params = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        jnp.zeros((1, 16, N_UNIT)), 220.0 * jnp.ones((1, 16, 1)),
        jnp.ones((1, 16, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
    )["params"]
    eng = BatchedSynth(model, params, buckets=(32, 64), max_batch=4,
                       max_wait_ms=20.0)
    yield eng, model, params
    eng.close()


def _req(rng, t):
    return (
        rng.standard_normal((t, N_UNIT)).astype(np.float32),
        (220.0 * np.exp(0.1 * rng.standard_normal((t, 1)))).astype(np.float32),
        (0.5 * np.ones((t, 1))).astype(np.float32),
    )


def test_matches_direct_padded_forward(synth):
    eng, model, params = synth
    rng = np.random.default_rng(0)
    t = 20  # pads to bucket 32
    units, f0, vol = _req(rng, t)
    key = jax.random.PRNGKey(7)
    got = eng.infer(units, f0, vol, spk_id=2, key=key)
    assert got.shape == (t * HOP,)

    # direct single-request reference at the same bucket
    bucket = 32
    u = np.zeros((1, bucket, N_UNIT), np.float32)
    u[0, :t] = units
    f = np.full((1, bucket, 1), 220.0, np.float32)
    f[0, :t] = f0
    v = np.zeros((1, bucket, 1), np.float32)
    v[0, :t] = vol
    noise = jax.random.normal(key, (1, bucket * HOP), jnp.float32)
    ref, _, _ = model.apply(
        {"params": params}, jnp.asarray(u), jnp.asarray(f), jnp.asarray(v),
        spk_id=2 * jnp.ones((1, 1), jnp.int32), infer=True, noise=noise,
    )
    np.testing.assert_allclose(got, np.asarray(ref)[0, : t * HOP],
                               rtol=2e-4, atol=2e-5)


def test_concurrent_requests_batch_independent(synth):
    eng, _, _ = synth
    rng = np.random.default_rng(1)
    reqs = [(_req(rng, 24), jax.random.PRNGKey(100 + i), 1 + i % 4)
            for i in range(8)]

    # serial outputs (each in its own batch)
    serial = [
        eng.infer(u, f, v, spk_id=s, key=k) for (u, f, v), k, s in reqs
    ]

    # concurrent: all 8 submitted at once -> batches of up to 4
    results = [None] * 8

    def worker(i):
        (u, f, v), k, s = reqs[i]
        results[i] = eng.infer(u, f, v, spk_id=s, key=k)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    for i in range(8):
        np.testing.assert_allclose(results[i], serial[i], rtol=2e-4,
                                   atol=2e-5, err_msg=str(i))


def test_bucket_selection_and_overflow(synth):
    eng, _, _ = synth
    rng = np.random.default_rng(2)
    u, f, v = _req(rng, 50)  # -> bucket 64
    out = eng.infer(u, f, v, spk_id=1, key=jax.random.PRNGKey(0))
    assert out.shape == (50 * HOP,)
    u, f, v = _req(rng, 80)  # exceeds the largest bucket
    with pytest.raises(ValueError):
        eng.infer(u, f, v, spk_id=1, key=jax.random.PRNGKey(0))


def test_pipeline_batched_matches_direct():
    """SvcPipeline.enable_batching wiring: same audio in -> same audio out
    as the jitted direct path. The two paths draw exciter noise differently
    (rngs fold-in vs per-request key), so the noise filter is zeroed via the
    dense_out bias (exp(-30)~1e-13), making both outputs the deterministic
    harmonic chain; audio length is exactly one bucket so padding cannot
    bleed through the OLA tail."""
    from ddsp_svc_tpu.infer.pipeline import SvcPipeline
    from ddsp_svc_tpu.utils.config import DotDict

    args = DotDict({
        "data": {"sampling_rate": SR, "block_size": HOP,
                 "encoder_out_channels": N_UNIT},
        "model": {"type": "CombSubSuperFast", "win_length": WIN, "n_spk": 4},
        "enhancer": None,
    })
    model = CombSubSuperFast(SR, HOP, WIN, n_unit=N_UNIT, n_spk=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        jnp.zeros((1, 16, N_UNIT)), 220.0 * jnp.ones((1, 16, 1)),
        jnp.ones((1, 16, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
    )
    # zero the noise branch: bias slice [2F:3F] of dense_out is
    # noise_magnitude (split order in CombSubSuperFast.controls)
    f_bins = WIN // 2 + 1
    variables = jax.tree_util.tree_map(lambda a: a, variables)  # copy tree
    bias = np.array(variables["params"]["unit2ctrl"]["dense_out"]["bias"])
    bias[2 * f_bins : 3 * f_bins] = -30.0
    variables["params"]["unit2ctrl"]["dense_out"]["bias"] = jnp.asarray(bias)

    pipe = SvcPipeline.from_parts(model, variables, args, StubUnitsEncoder(N_UNIT, channel_ramp=True))

    bucket = 64
    n = np.arange(bucket * HOP)
    audio = (0.3 * np.sin(2 * np.pi * 220.0 * n / SR)).astype(np.float32)
    audio += (0.05 * np.sin(2 * np.pi * 3.1 * n / SR)).astype(np.float32)

    pipe._key = jax.random.PRNGKey(42)
    direct, sr_direct = pipe.infer(audio, SR, spk_id=2)

    batcher = pipe.enable_batching(buckets=(bucket,), max_batch=2,
                                   max_wait_ms=5.0)
    try:
        pipe._key = jax.random.PRNGKey(42)
        batched, sr_batched = pipe.infer(audio, SR, spk_id=2)
    finally:
        batcher.close()
        pipe.batcher = None

    assert sr_direct == sr_batched
    assert batched.shape == direct.shape
    np.testing.assert_allclose(batched, direct, rtol=2e-4, atol=2e-6)


def test_transfer_int16_matches_f32(synth):
    """int16 device->host transfer (the d2h-bandwidth lever) reproduces the
    f32 path within one 16-bit LSB."""
    eng, model, params = synth
    eng16 = BatchedSynth(model, params, buckets=(32,), max_batch=2,
                         max_wait_ms=5.0, transfer_int16=True)
    try:
        rng = np.random.default_rng(21)
        u, f, v = _req(rng, 24)
        key = jax.random.PRNGKey(13)
        ref = eng.infer(u, f, v, spk_id=2, key=key)
        got = eng16.infer(u, f, v, spk_id=2, key=key)
        assert got.shape == ref.shape
        # the int16 path clips to full-scale, like the wav output does
        ref = np.clip(ref, -32768.0 / 32767.0, 1.0)
        np.testing.assert_allclose(got, ref, atol=1.01 / 32767.0)
    finally:
        eng16.close()


def test_transfer_mulaw_matches_f32(synth):
    """8-bit μ-law device->host transfer (the lever past i16) reproduces the
    f32 path within one companding step at each sample's level, and ~38 dB
    SNR overall."""
    eng, model, params = synth
    engm = BatchedSynth(model, params, buckets=(32,), max_batch=2,
                        max_wait_ms=5.0, transfer="mulaw")
    try:
        rng = np.random.default_rng(22)
        u, f, v = _req(rng, 24)
        key = jax.random.PRNGKey(14)
        ref = np.clip(eng.infer(u, f, v, spk_id=2, key=key), -1.0, 1.0)
        got = engm.infer(u, f, v, spk_id=2, key=key)
        assert got.shape == ref.shape
        step = np.log(256.0) / 255.0 * (1.0 / 255.0 + np.abs(ref))
        assert (np.abs(got - ref) <= step * 1.01).mean() >= 0.999
        snr = 10 * np.log10(
            (ref ** 2).sum() / max(((got - ref) ** 2).sum(), 1e-20)
        )
        assert snr > 30.0, snr
    finally:
        engm.close()


def test_transfer_rejects_unknown_codec(synth):
    _, model, params = synth
    with pytest.raises(ValueError):
        BatchedSynth(model, params, buckets=(32,), transfer="opus")


def test_error_delivery(synth):
    eng, _, _ = synth
    rng = np.random.default_rng(3)
    u, f, v = _req(rng, 16)
    with pytest.raises(Exception):
        eng.infer(u[:, :4], f, v, spk_id=1, key=jax.random.PRNGKey(0))
    # engine survives the failure
    out = eng.infer(u, f, v, spk_id=1, key=jax.random.PRNGKey(0))
    assert out.shape == (16 * HOP,)


def test_mesh_sharded_serving_matches_single_device(synth):
    """Data-parallel serving: a 4-device mesh engine returns the same audio
    as the single-device engine for identical requests (params replicated,
    batch rows sharded)."""
    from jax.sharding import Mesh

    eng, model, params = synth
    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("data",))
    eng_mesh = BatchedSynth(model, params, buckets=(32, 64), max_batch=4,
                            max_wait_ms=20.0, mesh=mesh)
    try:
        rng = np.random.default_rng(7)
        reqs = [(_req(rng, 24), jax.random.PRNGKey(500 + i), 1 + i % 4)
                for i in range(4)]
        single = [eng.infer(u, f, v, spk_id=s, key=k)
                  for (u, f, v), k, s in reqs]

        results = [None] * 4

        def worker(i):
            (u, f, v), k, s = reqs[i]
            results[i] = eng_mesh.infer(u, f, v, spk_id=s, key=k)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        for i in range(4):
            np.testing.assert_allclose(results[i], single[i], rtol=2e-4,
                                       atol=2e-5, err_msg=str(i))
    finally:
        eng_mesh.close()


def test_mesh_max_batch_divisibility(synth):
    from jax.sharding import Mesh

    _, model, params = synth
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    with pytest.raises(ValueError):
        BatchedSynth(model, params, buckets=(32,), max_batch=3, mesh=mesh)


def test_no_cross_bucket_starvation(synth):
    """A request in a different bucket must complete while same-bucket
    traffic keeps arriving (worker serves its pending list first)."""
    eng, _, _ = synth
    rng = np.random.default_rng(9)
    results = {}

    def small(i):
        u, f, v = _req(rng, 24)  # bucket 32
        results[f"s{i}"] = eng.infer(u, f, v, spk_id=1,
                                     key=jax.random.PRNGKey(i))

    def big():
        u, f, v = _req(rng, 50)  # bucket 64
        results["big"] = eng.infer(u, f, v, spk_id=1,
                                   key=jax.random.PRNGKey(99))

    threads = [threading.Thread(target=small, args=(i,)) for i in range(6)]
    tb = threading.Thread(target=big)
    threads[0].start()
    tb.start()
    for th in threads[1:]:
        th.start()
    tb.join(timeout=120)
    assert not tb.is_alive(), "big-bucket request starved"
    for th in threads:
        th.join(timeout=120)
    assert results["big"].shape == (50 * HOP,)


def test_close_fails_queued_requests():
    """close() must not leave blocked callers hanging."""
    model = CombSubSuperFast(SR, HOP, WIN, n_unit=N_UNIT, n_spk=1)
    params = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        jnp.zeros((1, 16, N_UNIT)), 220.0 * jnp.ones((1, 16, 1)),
        jnp.ones((1, 16, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
    )["params"]
    eng = BatchedSynth(model, params, buckets=(32,), max_batch=2,
                       max_wait_ms=5.0)
    rng = np.random.default_rng(11)
    u, f, v = _req(rng, 16)
    eng.infer(u, f, v, spk_id=1, key=jax.random.PRNGKey(0))  # warm/compile

    outcomes = []

    def caller(i):
        try:
            eng.infer(u, f, v, spk_id=1, key=jax.random.PRNGKey(i))
            outcomes.append("ok")
        except RuntimeError:
            outcomes.append("closed")

    threads = [threading.Thread(target=caller, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    eng.close()
    for th in threads:
        th.join(timeout=60)
    assert all(not th.is_alive() for th in threads), "caller hung after close"
    assert len(outcomes) == 4


def _tiny_vocoder_ckpt(tmp_path):
    """A small NSF-HiFiGAN checkpoint on disk (hop 64 at 16 kHz, 16 mels)."""
    from flax import serialization

    from ddsp_svc_tpu.models.nsf_hifigan import Generator

    cfg = dict(
        sampling_rate=SR, num_mels=16, n_fft=WIN, win_size=WIN,
        hop_size=HOP, fmin=40, fmax=7000,
        upsample_rates=(4, 4, 4), upsample_kernel_sizes=(8, 8, 8),
        upsample_initial_channel=16, resblock="1",
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )
    gen = Generator(
        sampling_rate=cfg["sampling_rate"], num_mels=cfg["num_mels"],
        upsample_rates=cfg["upsample_rates"],
        upsample_kernel_sizes=cfg["upsample_kernel_sizes"],
        upsample_initial_channel=cfg["upsample_initial_channel"],
        resblock=cfg["resblock"],
        resblock_kernel_sizes=cfg["resblock_kernel_sizes"],
        resblock_dilation_sizes=cfg["resblock_dilation_sizes"],
    )
    params = gen.init(
        {"params": jax.random.PRNGKey(3), "noise": jax.random.PRNGKey(4)},
        jnp.zeros((1, 8, 16)), 220.0 * jnp.ones((1, 8)),
    )["params"]
    cfg_ser = {k: list(v) if isinstance(v, tuple) else v
               for k, v in cfg.items()}
    cfg_ser["resblock_dilation_sizes"] = [
        list(d) for d in cfg["resblock_dilation_sizes"]
    ]
    path = tmp_path / "voc.msgpack"
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            {"params": jax.device_get(params), "config": cfg_ser}
        ))
    return str(path)


def test_pipeline_batched_diffusion_matches_direct(tmp_path):
    """Mel-family batching: the batched (vmapped cascade+vocoder) path must
    reproduce the direct path exactly (same per-request key, t == bucket)."""
    from ddsp_svc_tpu.infer.pipeline import SvcPipeline
    from ddsp_svc_tpu.models.cascade import Unit2Mel
    from ddsp_svc_tpu.utils.config import DotDict

    voc_path = _tiny_vocoder_ckpt(tmp_path)
    args = DotDict({
        "data": {"sampling_rate": SR, "block_size": HOP,
                 "encoder_out_channels": N_UNIT},
        "model": {"type": "Diffusion", "n_spk": 2, "k_step_max": 20},
        "vocoder": {"type": "nsf-hifigan", "ckpt": voc_path},
        "enhancer": None,
    })
    model = Unit2Mel(N_UNIT, 2, False, 16, n_layers=2, n_chans=16,
                     n_hidden=16, k_step_max=20)
    t = 16
    variables = {"params": model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, t, N_UNIT)), 220.0 * jnp.ones((1, t, 1)),
        jnp.ones((1, t, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
        gt_spec=jnp.zeros((1, t, 16)), infer=False,
    )["params"]}

    pipe = SvcPipeline.from_parts(model, variables, args, StubUnitsEncoder(N_UNIT, channel_ramp=True))

    bucket = 32
    n = np.arange(bucket * HOP)
    audio = (0.3 * np.sin(2 * np.pi * 220.0 * n / SR)).astype(np.float32)

    settings = dict(k_step=10, method="ddim", speedup=2)
    other_settings = dict(k_step=4, method="ddim", speedup=2)
    pipe._key = jax.random.PRNGKey(77)
    direct, sr_direct = pipe.infer(audio, SR, spk_id=2, **settings)
    pipe._key = jax.random.PRNGKey(77)
    other_direct, _ = pipe.infer(audio, SR, spk_id=2, **other_settings)

    batcher = pipe.enable_batching(buckets=(bucket,), max_batch=2,
                                   max_wait_ms=5.0, max_signatures=2,
                                   **settings)
    try:
        pipe._key = jax.random.PRNGKey(77)
        batched, sr_batched = pipe.infer(audio, SR, spk_id=2, **settings)

        # per-request sampler settings batch under their own signature
        # (flask_api_diff fields) and must reproduce the direct path
        pipe._key = jax.random.PRNGKey(77)
        other, _ = pipe.infer(audio, SR, spk_id=2, **other_settings)
        assert len(pipe._batch_sigs) == 2

        # the signature cap: a third distinct setting falls back direct
        pipe._key = jax.random.PRNGKey(77)
        capped, _ = pipe.infer(audio, SR, spk_id=2, k_step=6, method="ddim",
                               speedup=2)
        assert len(pipe._batch_sigs) == 2  # not admitted
    finally:
        batcher.close()
        pipe.batcher = None

    assert sr_direct == sr_batched == SR
    assert batched.shape == direct.shape
    np.testing.assert_allclose(batched, direct, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(other, other_direct, rtol=2e-4, atol=2e-5)
    assert capped.shape == direct.shape  # fallback worked


def test_fuzz_mixed_sig_concurrency(tmp_path):
    """Concurrency fuzz for signature-grouped batching: threads fire
    requests with two different sampler settings interleaved; every output
    must equal the same request run serialized through the batcher (batch
    composition and signature grouping must not leak between requests)."""
    from ddsp_svc_tpu.infer.pipeline import SvcPipeline
    from ddsp_svc_tpu.models.cascade import Unit2Mel
    from ddsp_svc_tpu.utils.config import DotDict

    voc_path = _tiny_vocoder_ckpt(tmp_path)
    args = DotDict({
        "data": {"sampling_rate": SR, "block_size": HOP,
                 "encoder_out_channels": N_UNIT},
        "model": {"type": "Diffusion", "n_spk": 2, "k_step_max": 20},
        "vocoder": {"type": "nsf-hifigan", "ckpt": voc_path},
        "enhancer": None,
    })
    model = Unit2Mel(N_UNIT, 2, False, 16, n_layers=2, n_chans=16,
                     n_hidden=16, k_step_max=20)
    t = 16
    variables = {"params": model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, t, N_UNIT)), 220.0 * jnp.ones((1, t, 1)),
        jnp.ones((1, t, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
        gt_spec=jnp.zeros((1, t, 16)), infer=False,
    )["params"]}
    pipe = SvcPipeline.from_parts(model, variables, args,
                                  StubUnitsEncoder(N_UNIT, channel_ramp=True))

    bucket = 32
    n = np.arange(bucket * HOP)
    sig_sets = [dict(k_step=10, method="ddim", speedup=2),
                dict(k_step=4, method="ddim", speedup=2)]
    jobs = []  # (audio, settings, key_seed)
    rng = np.random.default_rng(3)
    for i in range(8):
        freq = 180.0 + 30.0 * rng.random()
        audio = (0.3 * np.sin(2 * np.pi * freq * n / SR)).astype(np.float32)
        jobs.append((audio, sig_sets[i % 2], 1000 + i))

    batcher = pipe.enable_batching(buckets=(bucket,), max_batch=4,
                                   max_wait_ms=20.0, max_signatures=2,
                                   **sig_sets[0])
    try:
        results = [None] * len(jobs)
        errors = []

        def worker(i):
            audio, settings, seed = jobs[i]
            try:
                # pipeline.infer draws keys from a shared PRNG whose split
                # order is nondeterministic across threads, so drive the
                # batcher directly with the request's own pinned key
                hop = HOP
                f0 = pipe._f0_extractor(SR, hop).extract(audio, uv_interp=True)
                from ddsp_svc_tpu.features.volume import VolumeExtractor
                vol = VolumeExtractor(hop).extract(audio)
                units = pipe.units_encoder.encode(
                    jnp.asarray(audio, jnp.float32)[None, :], SR, hop)
                tt = units.shape[1]
                sig = pipe._static_sig(pipe._sampler_kwargs(settings))
                assert pipe._admit_sig(sig)
                key = jax.random.split(jax.random.PRNGKey(seed))[1]
                results[i] = batcher.infer(
                    np.asarray(units)[0],
                    np.asarray(f0, np.float32)[:tt, None],
                    np.asarray(vol, np.float32)[:tt, None],
                    1, key, sig=sig)
            except Exception as e:
                errors.append((i, e))

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(jobs))]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=600)
        assert not errors, errors[0]
        # solo path = pipeline.infer applies the volume mask; compare the
        # batcher output against the same request driven solo through the
        # batcher instead (exact same graph), serialized
        for i, (audio, settings, seed) in enumerate(jobs):
            f0 = pipe._f0_extractor(SR, HOP).extract(audio, uv_interp=True)
            from ddsp_svc_tpu.features.volume import VolumeExtractor
            vol = VolumeExtractor(HOP).extract(audio)
            units = pipe.units_encoder.encode(
                jnp.asarray(audio, jnp.float32)[None, :], SR, HOP)
            tt = units.shape[1]
            sig = pipe._static_sig(pipe._sampler_kwargs(settings))
            key = jax.random.split(jax.random.PRNGKey(seed))[1]
            ref = batcher.infer(
                np.asarray(units)[0],
                np.asarray(f0, np.float32)[:tt, None],
                np.asarray(vol, np.float32)[:tt, None],
                1, key, sig=sig)
            np.testing.assert_allclose(results[i], ref, rtol=2e-4,
                                       atol=2e-5, err_msg=str(i))
    finally:
        batcher.close()
        pipe.batcher = None


def test_warmup_excluded_from_stats(synth):
    """Warmup traffic (multi-minute first compiles on some backends) must
    not pollute the /stats request counters or latency percentiles."""
    eng, model, params = synth
    before = eng.stats()
    eng.warmup(N_UNIT)
    after = eng.stats()
    assert after["requests"] == before["requests"]
    assert after["latency_ms_p99"] == before["latency_ms_p99"]
    # warmup did compile every bucket's graph
    assert after["compiled_signatures"] >= len(eng.buckets)


def test_pipelined_matches_serial(synth):
    """pipeline_depth>=2 (delivery thread fetches batch N while N+1
    computes) must be invisible to callers: same results as the serial
    engine, in-order delivery, multiple batches in flight."""
    _, model, params = synth
    rng = np.random.default_rng(5)
    reqs = [(_req(rng, 20 + (i % 3)), jax.random.PRNGKey(100 + i))
            for i in range(10)]

    def run_all(depth):
        eng = BatchedSynth(model, params, buckets=(32,), max_batch=2,
                           max_wait_ms=5.0, pipeline_depth=depth)
        try:
            outs = [None] * len(reqs)
            errs = []

            def one(i):
                (u, f, v), k = reqs[i]
                try:
                    outs[i] = eng.infer(u, f, v, spk_id=1, key=k)
                except Exception as e:
                    errs.append(e)

            ths = [threading.Thread(target=one, args=(i,))
                   for i in range(len(reqs))]
            for t in ths:
                t.start()
            for t in ths:
                t.join()
            assert not errs
            return outs
        finally:
            eng.close()

    serial = run_all(1)
    pipelined = run_all(3)
    for a, b in zip(serial, pipelined):
        # per-request noise is key-derived (exact across runs), but since
        # r4's right-sized batches a request's SLOT-count depends on how
        # the batch formed, and XLA tiles different batch shapes with
        # ulp-level numeric differences — so cross-run agreement is at
        # slot-shape-numerics tolerance, not bitwise (bitwise holds
        # whenever compositions match; see test_request_independent_*)
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)


def test_pipelined_close_drains_in_flight(synth):
    """close() must deliver already-dispatched batches and fail queued
    ones — no caller may hang on a pipelined engine being shut down."""
    _, model, params = synth
    eng = BatchedSynth(model, params, buckets=(32,), max_batch=1,
                       max_wait_ms=1.0, pipeline_depth=2)
    rng = np.random.default_rng(6)
    results, errors = [], []

    def one():
        u, f, v = _req(rng, 16)
        try:
            results.append(eng.infer(u, f, v, spk_id=1, key=jax.random.PRNGKey(0)))
        except Exception as e:
            errors.append(e)

    ths = [threading.Thread(target=one) for _ in range(6)]
    for t in ths:
        t.start()
    time.sleep(0.2)  # let some dispatch
    eng.close()
    for t in ths:
        t.join(timeout=30)
        assert not t.is_alive(), "caller hung across close()"
    assert len(results) + len(errors) == 6


def test_mesh_plus_pipelined_serving_matches_single_device(synth):
    """Production combo: data-parallel mesh sharding AND overlapped-fetch
    pipelining must still match the plain single-device engine."""
    from jax.sharding import Mesh

    eng, model, params = synth
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    eng_mp = BatchedSynth(model, params, buckets=(32, 64), max_batch=4,
                          max_wait_ms=20.0, mesh=mesh, pipeline_depth=2)
    try:
        rng = np.random.default_rng(8)
        reqs = [(_req(rng, 24), jax.random.PRNGKey(900 + i), 1 + i % 4)
                for i in range(8)]
        single = [eng.infer(u, f, v, spk_id=s, key=k)
                  for (u, f, v), k, s in reqs]
        results = [None] * len(reqs)

        def worker(i):
            (u, f, v), k, s = reqs[i]
            results[i] = eng_mp.infer(u, f, v, spk_id=s, key=k)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(reqs))]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        for i in range(len(reqs)):
            np.testing.assert_allclose(results[i], single[i], rtol=2e-4,
                                       atol=2e-5, err_msg=str(i))
    finally:
        eng_mp.close()


def test_pipeline_silence_front_skips_vocoding(tmp_path):
    """Reference DiffGtMel semantics: with silence_front the stale prefix
    is never vocoded — output prefix is exact silence (then masked), and
    use_silence=True crops the whole cascade (infer_gt_mel.py:53-79)."""
    from ddsp_svc_tpu.infer.pipeline import SvcPipeline
    from ddsp_svc_tpu.models.cascade import Unit2Mel
    from ddsp_svc_tpu.utils.config import DotDict

    voc_path = _tiny_vocoder_ckpt(tmp_path)
    args = DotDict({
        "data": {"sampling_rate": SR, "block_size": HOP,
                 "encoder_out_channels": N_UNIT},
        "model": {"type": "Diffusion", "n_spk": 2, "k_step_max": 20},
        "vocoder": {"type": "nsf-hifigan", "ckpt": voc_path},
        "enhancer": None,
    })
    model = Unit2Mel(N_UNIT, 2, False, 16, n_layers=2, n_chans=16,
                     n_hidden=16, k_step_max=20)
    t = 16
    variables = {"params": model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, t, N_UNIT)), 220.0 * jnp.ones((1, t, 1)),
        jnp.ones((1, t, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
        gt_spec=jnp.zeros((1, t, 16)), infer=False,
    )["params"]}
    pipe = SvcPipeline.from_parts(
        model, variables, args, StubUnitsEncoder(N_UNIT, channel_ramp=True)
    )

    frames = 32
    n = np.arange(frames * HOP)
    audio = (0.3 * np.sin(2 * np.pi * 220.0 * n / SR)).astype(np.float32)
    silence_front = 8 * HOP / SR  # 8 frames of stale prefix
    settings = dict(k_step=10, method="ddim", speedup=2)

    out, sr = pipe.infer(audio, SR, spk_id=2, threhold=-90.0,
                         silence_front=silence_front, **settings)
    assert sr == SR and out.shape == audio.shape
    assert np.abs(out[: 8 * HOP]).max() == 0.0  # prefix never vocoded
    assert np.abs(out[8 * HOP :]).max() > 0.0

    out2, _ = pipe.infer(audio, SR, spk_id=2, threhold=-90.0,
                         silence_front=silence_front, use_silence=True,
                         **settings)
    assert out2.shape == audio.shape
    assert np.abs(out2[: 8 * HOP]).max() == 0.0
    assert np.abs(out2[8 * HOP :]).max() > 0.0


def test_batch_slots_right_sizing():
    """_batch_slots: next pow-2 >= real rows, capped at max_batch; the
    mesh path keeps full width (sharding divisibility). Every size the
    collector can produce must be warmed by warmup() (r4: an unwarmed
    slot shape = a minutes-long remote compile inside the serving
    window)."""
    from ddsp_svc_tpu.infer.batcher import BatchedSynth

    eng = BatchedSynth.__new__(BatchedSynth)
    eng.mesh = None
    eng.max_batch = 8
    got = {n: eng._batch_slots(n) for n in range(1, 9)}
    assert got == {1: 1, 2: 2, 3: 4, 4: 4, 5: 8, 6: 8, 7: 8, 8: 8}
    eng.max_batch = 6  # non-pow2 cap still never exceeds max_batch
    assert [eng._batch_slots(n) for n in (5, 6)] == [6, 6]

    class _Dev:
        size = 2

    class _M:  # mesh path (r5): right-sized but mesh-divisible
        devices = _Dev()

    eng.mesh = _M()
    eng.max_batch = 8
    assert [eng._batch_slots(n) for n in (1, 3, 5, 8)] == [2, 4, 8, 8]
    _Dev.size = 4
    assert [eng._batch_slots(n) for n in (1, 3, 5, 8)] == [4, 4, 8, 8]


def test_chunks_deadline_aware_split():
    """_chunks (r5, VERDICT item 2): a deadline-expired partial batch
    splits into a pow-2 prefix + right-sized remainder when that saves
    >=2 dummy slots; full/pow-2 batches and the mesh path never split."""
    eng = BatchedSynth.__new__(BatchedSynth)
    eng.mesh = None
    eng.max_batch = 16

    def sizes(n):
        return [len(c) for c in eng._chunks(list(range(n)))]

    assert sizes(16) == [16]
    assert sizes(8) == [8]
    assert sizes(9) == [8, 1]      # 9 slots instead of 16
    assert sizes(11) == [8, 3]     # 12 slots instead of 16
    assert sizes(13) == [13]       # 8+8 saves nothing over 16
    assert sizes(5) == [4, 1]      # 5 slots instead of 8
    assert sizes(3) == [3]         # waste 1 < 2: keep one dispatch
    assert sizes(2) == [2]
    assert sizes(1) == [1]

    class _M:
        pass

    eng.mesh = _M()  # sharded serving: divisibility requires full width
    assert sizes(9) == [9]


def test_split_batch_outputs_match_solo(synth):
    """3 concurrent same-bucket requests at max_wait expiry may dispatch
    as chunks; every request must still equal its solo-bucket forward
    (per-request keys make rows batch-independent)."""
    eng, model, params = synth
    rng = np.random.default_rng(42)
    reqs = [_req(rng, 20) for _ in range(3)]
    keys = [jax.random.PRNGKey(100 + i) for i in range(3)]
    solo = [eng.infer(u, f, v, spk_id=1, key=k)
            for (u, f, v), k in zip(reqs, keys)]
    got = [None] * 3

    def run(i):
        u, f, v = reqs[i]
        got[i] = eng.infer(u, f, v, spk_id=1, key=keys[i])

    threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    for i in range(3):
        np.testing.assert_allclose(got[i], solo[i], rtol=2e-4, atol=2e-5)


def test_ddsp_enhancer_fused_batching_matches_eager(tmp_path):
    """flask_api.py's literal chain (CombSub + Enhancer) batched: with
    equal grids + adaptive_key 0 the WHOLE chain (synth -> volume mask ->
    mel -> NSF-HiFiGAN) fuses into the batched graph; results must equal
    the eager path (mask BEFORE enhancer, gui.py:114-142 order), and a
    non-admitted threshold falls back to direct + eager enhancer."""
    from ddsp_svc_tpu.infer.pipeline import SvcPipeline
    from ddsp_svc_tpu.utils.config import DotDict

    voc_path = _tiny_vocoder_ckpt(tmp_path)
    args = DotDict({
        "data": {"sampling_rate": SR, "block_size": HOP,
                 "encoder_out_channels": N_UNIT},
        "model": {"type": "CombSubSuperFast", "win_length": WIN, "n_spk": 2},
        "enhancer": {"type": "nsf-hifigan", "ckpt": voc_path},
    })
    model = CombSubSuperFast(SR, HOP, WIN, n_unit=N_UNIT, n_spk=2)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        jnp.zeros((1, 16, N_UNIT)), 220.0 * jnp.ones((1, 16, 1)),
        jnp.ones((1, 16, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
    )
    # zero the exciter-noise branch (dense_out bias slice = noise
    # magnitude): direct and batched paths draw that noise differently by
    # design (rngs fold-in vs per-request key) — same device as
    # test_pipeline_batched_matches_direct
    f_bins = WIN // 2 + 1
    variables = dict(variables)
    bias = np.array(variables["params"]["unit2ctrl"]["dense_out"]["bias"])
    bias[2 * f_bins: 3 * f_bins] = -30.0
    variables["params"]["unit2ctrl"]["dense_out"]["bias"] = jnp.asarray(bias)
    pipe = SvcPipeline.from_parts(
        model, variables, args, StubUnitsEncoder(N_UNIT,
                                                 channel_ramp=True),
        enhance=True)
    assert pipe.enhancer is not None

    bucket = 32
    # t == bucket pins exactness (the repo's batched-tail convention: a
    # padded row's dummy-frame synth colors the last ~STFT-window of a
    # shorter request's tail, same as the cascade serving path — partial
    # rows are checked tail-cropped below). The stub encoder yields
    # n//hop frames, so bucket*HOP samples -> exactly bucket rows.
    n = np.arange(bucket * HOP)
    audio = (0.3 * np.sin(2 * np.pi * 220.0 * n / SR)).astype(np.float32)
    key = np.asarray(jax.random.PRNGKey(5))
    eager, sr_eager = pipe.infer(audio, SR, spk_id=1, key=key)

    batcher = pipe.enable_batching(buckets=(bucket,), max_batch=2,
                                   max_wait_ms=5.0, max_signatures=2)
    try:
        assert pipe._enh_in_batch
        fused, sr_fused = pipe.infer(audio, SR, spk_id=1, key=key)
        assert sr_fused == sr_eager
        assert fused.shape == eager.shape
        # vmapped-fused vs eager chain: XLA lowers the mel/vocoder stages
        # differently (the documented eager-vs-jit variance, amplified by
        # the random-init tiny generator) — gate on an SNR bound
        np.testing.assert_allclose(fused, eager, rtol=5e-2, atol=5e-3)
        snr = 10 * np.log10(float((eager ** 2).sum())
                            / max(float(((fused - eager) ** 2).sum()), 1e-20))
        assert snr > 50.0, snr

        # a distinct threshold batches under its own signature
        pipe.batcher = None  # direct path reference
        eager2, _ = pipe.infer(audio, SR, spk_id=1, key=key, threhold=-40.0)
        pipe.batcher = batcher
        fused2, _ = pipe.infer(audio, SR, spk_id=1, key=key, threhold=-40.0)
        np.testing.assert_allclose(fused2, eager2, rtol=5e-2, atol=5e-3)

        # signature cap: a third distinct threshold falls back to the
        # direct masked + eager enhancer path (same numbers either way)
        fused3, _ = pipe.infer(audio, SR, spk_id=1, key=key, threhold=-50.0)
        pipe.batcher = None
        eager3, _ = pipe.infer(audio, SR, spk_id=1, key=key, threhold=-50.0)
        pipe.batcher = batcher
        np.testing.assert_allclose(fused3, eager3, rtol=5e-2, atol=5e-3)

        # per-request levers the fused graph cannot honor fall back to
        # the direct + eager-enhancer path (silently-dropped parameters
        # were the r5 review's finding)
        fused5, _ = pipe.infer(audio, SR, spk_id=1, key=key,
                               enhancer_adaptive_key=2.0)
        pipe.batcher = None
        eager5, _ = pipe.infer(audio, SR, spk_id=1, key=key,
                               enhancer_adaptive_key=2.0)
        pipe.batcher = batcher
        L5 = min(len(fused5), len(eager5))
        np.testing.assert_allclose(fused5[:L5], eager5[:L5],
                                   rtol=5e-2, atol=5e-3)

        # partial row (t < bucket): equality holds away from the padded
        # tail (the dummy-frame bleed is bounded by the mel window +
        # vocoder receptive field)
        short = audio[: (bucket - 8) * HOP]
        fused4, _ = pipe.infer(short, SR, spk_id=1, key=key)
        pipe.batcher = None
        eager4, _ = pipe.infer(short, SR, spk_id=1, key=key)
        pipe.batcher = batcher
        t4 = short.shape[0] // HOP
        body = slice(0, (t4 - 12) * HOP)
        L = min(len(fused4), len(eager4))
        e4, f4 = eager4[:L][body], fused4[:L][body]
        snr4 = 10 * np.log10(float((e4 ** 2).sum())
                             / max(float(((f4 - e4) ** 2).sum()), 1e-20))
        assert snr4 > 40.0, snr4
        # FULL-length bound incl. the tail: the in-graph live-frame
        # masking (r5 padded-tail fix) keeps even the receptive-field
        # boundary within ~35 dB of the eager path (was ~26 dB unmasked)
        ef, ff = eager4[:L], fused4[:L]
        snr_full = 10 * np.log10(float((ef ** 2).sum())
                                 / max(float(((ff - ef) ** 2).sum()), 1e-20))
        assert snr_full > 28.0, snr_full
    finally:
        batcher.close()
        pipe.batcher = None
