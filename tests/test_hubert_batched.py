"""Batched masked HuBERT encode == solo encode, exactly.

Full-stack serving batches the units encoder across requests
(infer/enc_batcher.py). The contract is EXACTNESS: a zero-padded batch row
must reproduce the solo (unpadded) forward, which requires masked
statistics at every non-frame-local stage — input normalization,
the time-global conv0 GroupNorm, the positional conv's zero context, and
self-attention keys (features/hubert.py)."""
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddsp_svc_tpu.features.hubert import (
    HubertConfig,
    HubertModel,
    UnitsEncoder,
    conv_out_frames,
)

TINY = dict(dim=32, heads=4, ffn_dim=64, num_layers=2)

VARIANTS = {
    # each exercises a distinct non-frame-local hazard
    "soft": HubertConfig(**TINY, proj_dim=16),  # pad_center + GroupNorm
    "fish": HubertConfig(**TINY, proj_dim=16, pad_center=False,
                         input_normalize=True, topk_gate=3),
    "large": HubertConfig(**TINY, pre_norm=True, extractor_layer_norm=True,
                          pad_center=False, output_layer=2),
    "base": HubertConfig(**TINY, output_layer=1, pad_center=False),
    # pad_center AND input_normalize together: the normalized batch padding
    # is nonzero and must be re-zeroed or it leaks into pad_center's right
    # zeros (regression: features/hubert.py input_normalize masking)
    "soft_norm": HubertConfig(**TINY, proj_dim=16, input_normalize=True),
}


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_masked_batch_row_equals_solo(name):
    cfg = VARIANTS[name]
    model = HubertModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 800)))
    rng = np.random.default_rng(0)
    lengths = [900, 1531, 2000]
    batch = np.zeros((3, max(lengths)), np.float32)
    audio = [rng.standard_normal(n).astype(np.float32) for n in lengths]
    for i, a in enumerate(audio):
        batch[i, : len(a)] = a
    out = model.apply(params, jnp.asarray(batch),
                      valid_samples=jnp.asarray(lengths, jnp.int32))
    for i, a in enumerate(audio):
        solo = model.apply(params, jnp.asarray(a[None]))
        tv = conv_out_frames(len(a) + (80 if cfg.pad_center else 0))
        assert solo.shape[1] == tv
        np.testing.assert_allclose(
            np.asarray(out[i, :tv]), np.asarray(solo[0]), rtol=0, atol=1e-5
        )


def _tiny_encoder():
    enc = UnitsEncoder.__new__(UnitsEncoder)
    enc.model = HubertModel(HubertConfig(**TINY, proj_dim=16))
    enc.encoder_sample_rate = 16000
    enc.encoder_hop_size = 320
    enc.variables = enc.model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 800), jnp.float32))
    enc._apply = jax.jit(lambda v, a: enc.model.apply(v, a))
    return enc


def test_batched_encode_fn_with_resampling():
    """make_batched_encode_fn at 44.1 kHz input: each padded row, gathered
    with its own align_index, equals the solo encode() contract."""
    enc = _tiny_encoder()
    sr, hop = 44100, 512
    rng = np.random.default_rng(1)
    lengths = [3000, 5000, 8192]
    l_pad = max(lengths)
    batch = np.zeros((3, l_pad), np.float32)
    audio = [rng.standard_normal(n).astype(np.float32) * 0.3 for n in lengths]
    for i, a in enumerate(audio):
        batch[i, : len(a)] = a

    fn = jax.jit(enc.make_batched_encode_fn(sr, l_pad))
    units = fn(enc.variables, jnp.asarray(batch),
               jnp.asarray(lengths, jnp.int32))
    for i, a in enumerate(audio):
        solo = enc.encode(jnp.asarray(a[None]), sr, hop)
        idx = enc.align_index(len(a), sr, hop)
        row = jnp.take(units[i], jnp.asarray(idx), axis=0)
        assert row.shape == solo[0].shape
        np.testing.assert_allclose(np.asarray(row), np.asarray(solo[0]),
                                   rtol=0, atol=1e-5)


def test_batched_encoder_concurrent_requests():
    """BatchedEncoder under concurrency: mixed lengths, same result as the
    solo path; oversized requests fall back; occupancy counted."""
    from ddsp_svc_tpu.infer.enc_batcher import BatchedEncoder

    enc = _tiny_encoder()
    sr, hop = 16000, 320
    b = BatchedEncoder(enc, frame_buckets=(16, 32), max_batch=4,
                       max_wait_ms=30.0)
    try:
        rng = np.random.default_rng(2)
        lengths = [3000, 5000, 9000, 9999, 4000, 7000]
        audio = [rng.standard_normal(n).astype(np.float32) for n in lengths]
        results = [None] * len(audio)

        def run(i):
            results[i] = np.asarray(b.encode(audio[i], sr, hop))

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(audio))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, a in enumerate(audio):
            solo = np.asarray(enc.encode(jnp.asarray(a[None]), sr, hop))
            np.testing.assert_allclose(results[i], solo, rtol=0, atol=1e-5)
        stats = b.stats()
        assert stats["requests"] == len(audio)
        assert stats["batches"] >= 1

        # oversized: frames > largest bucket * hop -> direct fallback
        big = rng.standard_normal(32 * hop + hop).astype(np.float32)
        got = np.asarray(b.encode(big, sr, hop))
        solo = np.asarray(enc.encode(jnp.asarray(big[None]), sr, hop))
        np.testing.assert_allclose(got, solo, rtol=0, atol=1e-5)
    finally:
        b.close()


def test_batched_encoder_close_fails_pending():
    from ddsp_svc_tpu.infer.enc_batcher import BatchedEncoder

    enc = _tiny_encoder()
    b = BatchedEncoder(enc, frame_buckets=(16,), max_batch=2)
    b.close()
    out = b.encode(np.zeros(1000, np.float32), 16000, 320)  # falls back solo
    assert out.shape[1] == 1000 // 320 + 1


def test_batched_encoder_with_f0():
    """with_f0 mode: the fused batched dispatch's per-row YIN must match
    the solo device-YIN (make_pipeline_f0_fn) on every valid frame — YIN
    is frame-local and padded tails are unvoiced, so batching must not
    change a request's pitch track. The r4 contract is bucket-length rows
    with the synthesis batcher's padding convention computed IN-GRAPH
    (units 0 / f0 220 beyond each request's frames, keyshift folded in),
    so the submitting thread does zero per-request device ops."""
    from ddsp_svc_tpu.features.yin_jax import make_pipeline_f0_fn
    from ddsp_svc_tpu.infer.enc_batcher import BatchedEncoder

    enc = _tiny_encoder()
    sr, hop = 16000, 320
    bucket = 32
    b = BatchedEncoder(enc, frame_buckets=(bucket,), max_batch=2,
                       max_wait_ms=200.0, with_f0=True, f0_min=65.0,
                       f0_max=800.0)
    try:
        rng = np.random.default_rng(3)
        lengths = [6000, 9000]
        shifts = [0.0, 3.0]  # second request keyshifted in-graph
        audio = []
        for i, n in enumerate(lengths):
            t_ax = np.arange(n) / sr
            a = (0.4 * np.sin(2 * np.pi * (170.0 + 40 * i) * t_ax)
                 + 0.01 * rng.standard_normal(n)).astype(np.float32)
            a[: n // 8] = 0.0  # unvoiced head exercises the interpolation
            audio.append(a)
        results = [None] * len(audio)

        def run(i):
            results[i] = b.encode_with_f0(audio[i], sr, hop, shifts[i])

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(audio))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert b.stats()["batches"] == 1  # both rode one fused dispatch
        for i, a in enumerate(audio):
            units, f0 = results[i]
            t_req = a.shape[0] // hop + 1
            assert units.shape == (1, bucket, 16)  # bucket-length contract
            assert f0.shape == (1, bucket, 1)
            solo_units = np.asarray(enc.encode(jnp.asarray(a[None]), sr, hop))
            np.testing.assert_allclose(np.asarray(units)[0, :t_req],
                                       solo_units[0], rtol=0, atol=1e-5)
            # padded region carries the synthesis batcher's convention
            np.testing.assert_array_equal(np.asarray(units)[0, t_req:], 0.0)
            np.testing.assert_allclose(np.asarray(f0)[0, t_req:, 0], 220.0)
            solo_f0 = np.asarray(jax.jit(make_pipeline_f0_fn(
                a.shape[0], sr, hop, 65.0, 800.0))(jnp.asarray(a)))
            got = np.asarray(f0)[0, :t_req, 0]
            np.testing.assert_allclose(
                got, solo_f0[:t_req] * 2.0 ** (shifts[i] / 12.0),
                rtol=1e-4, atol=1e-3)
    finally:
        b.close()


def test_batched_encoder_audio_i16_codec():
    """transfer_in='i16': the fused front-end's in-graph dequantize must
    reproduce the f32 path within 16-bit quantization tolerance — the
    audio batch matrix is the dominant h2d cost of full-stack serving
    (PERF.md r4), and source audio is 16-bit to begin with."""
    from ddsp_svc_tpu.infer.enc_batcher import BatchedEncoder

    enc = _tiny_encoder()
    sr, hop = 16000, 320
    rng = np.random.default_rng(7)
    n = 6000
    a = (0.4 * np.sin(2 * np.pi * 200 * np.arange(n) / sr)
         + 0.01 * rng.standard_normal(n)).astype(np.float32)
    outs = {}
    for codec in ("f32", "i16"):
        b = BatchedEncoder(enc, frame_buckets=(32,), max_batch=2,
                           max_wait_ms=5.0, with_f0=True, f0_min=65.0,
                           f0_max=800.0, transfer_in=codec)
        try:
            outs[codec] = tuple(np.asarray(x)
                                for x in b.encode_with_f0(a, sr, hop, 0.0))
        finally:
            b.close()
    u32, f32_ = outs["f32"]
    u16, f16_ = outs["i16"]
    # unit features: quantization noise floor, far under encoder noise
    assert float(np.max(np.abs(u16 - u32))) < 2e-2
    np.testing.assert_allclose(
        u16, u32, atol=np.maximum(1e-3, 0.05 * np.abs(u32).max()))
    # pitch: sub-cent agreement
    voiced = f32_ > 100.0
    rel = np.abs(f16_[voiced] - f32_[voiced]) / f32_[voiced]
    assert float(rel.max()) < 1e-3


def test_batched_encoder_mulaw_input_codec():
    """transfer_in='mulaw' (r5): the 8-bit companded upload decodes
    in-graph; units stay within the companding noise class of the f32
    path, and the fused with_f0 mode keeps its padding convention."""
    from ddsp_svc_tpu.infer.enc_batcher import BatchedEncoder

    sr, hop = 16000, 320
    rng = np.random.default_rng(5)
    audio = (0.5 * np.sin(2 * np.pi * 220 * np.arange(4000) / sr)
             + 0.01 * rng.standard_normal(4000)).astype(np.float32)
    outs = {}
    for codec in ("f32", "mulaw"):
        enc = _tiny_encoder()
        b = BatchedEncoder(enc, frame_buckets=(16,), max_batch=2,
                           max_wait_ms=10.0, with_f0=True,
                           transfer_in=codec, f0_min=80.0)
        try:
            units, f0 = b.encode_with_f0(audio, sr, hop)
            outs[codec] = (np.asarray(units), np.asarray(f0))
        finally:
            b.close()
    u32, f32_ = outs["f32"]
    u8, f8 = outs["mulaw"]
    assert u8.shape == u32.shape and f8.shape == f32_.shape
    # companded input noise through the tiny encoder: SNR-class bound
    snr = 10 * np.log10(float((u32 ** 2).sum())
                        / max(float(((u8 - u32) ** 2).sum()), 1e-20))
    assert snr > 20.0, snr
    # pitch is robust to the companding (YIN is correlation-based)
    t = 4000 // hop + 1
    rel = np.abs(f8[0, :t, 0] - f32_[0, :t, 0]) / f32_[0, :t, 0]
    assert float(rel.max()) < 0.02, float(rel.max())
