"""On-TPU correctness checks for paths that pytest (CPU-mesh) cannot cover:
compiled (non-interpret) Pallas kernels. Results land in TPU_CHECKS.json.

Run on the tunneled chip: /opt/venv/bin/python tpu_checks.py
(pytest runs these kernels in interpret mode only — tests/test_pallas_*;
this script proves the Mosaic-compiled kernel agrees on hardware.)
"""
from __future__ import annotations

import json
import os
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

from ddsp_svc_tpu.cli.common import enable_compile_cache  # noqa: E402

enable_compile_cache()

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "TPU_CHECKS.json")


def _fetch(x):
    last = None
    for i in range(10):
        try:
            jax.effects_barrier()
            return np.asarray(x)
        except Exception as e:
            last = e
            time.sleep(min(10.0 * (i + 1), 60.0))
    raise last


def check_pallas_combtooth():
    """Compiled combtooth_pallas vs ops/source.fast_source_gen at flagship
    shapes (44.1 kHz, hop 512)."""
    from ddsp_svc_tpu.ops.pallas_source import combtooth_pallas
    from ddsp_svc_tpu.ops.source import fast_source_gen

    sr, hop = 44100, 512
    b, t = 4, 256
    rng = np.random.default_rng(0)
    f0 = (220.0 * np.exp(rng.standard_normal((b, t, 1)) * 0.2)).astype(
        np.float32
    )
    f0_j = jax.device_put(f0, jax.devices()[0])

    ref_fn = jax.jit(lambda f: fast_source_gen(f, sr, hop))
    pal_fn = jax.jit(lambda f: combtooth_pallas(f, sr, hop))
    ref_c, ref_p = ref_fn(f0_j)
    pal_c, pal_p = pal_fn(f0_j)
    ref_c, ref_p, pal_c, pal_p = map(_fetch, (ref_c, ref_p, pal_c, pal_p))
    err_c = float(np.abs(ref_c - pal_c).max())
    err_p = float(np.abs(ref_p - pal_p).max())
    ok = err_c < 1e-4 and err_p < 1e-4
    return {"ok": ok, "max_abs_err_combtooth": err_c,
            "max_abs_err_phase": err_p, "shape": [b, t, hop]}


def check_pallas_oscillator():
    """Compiled harmonic-bank kernel vs models/ddsp.sins_harmonic_bank."""
    from ddsp_svc_tpu.models.ddsp import sins_harmonic_bank
    from ddsp_svc_tpu.ops.pallas_oscillator import harmonic_bank_pallas
    from ddsp_svc_tpu.ops.source import cumsum_phase_source

    sr, block, n_harm = 44100, 512, 128
    b, t = 2, 128
    rng = np.random.default_rng(1)
    f0 = (220.0 * np.exp(rng.standard_normal((b, t, 1)) * 0.2)).astype(
        np.float32
    )
    f0_up = jnp.repeat(jnp.asarray(f0), block, axis=1)
    dev = jax.devices()[0]
    x = jax.device_put(cumsum_phase_source(f0_up, sr, block), dev)
    amps = jax.device_put(
        (0.05 * np.abs(rng.standard_normal((b, t, n_harm)))).astype(
            np.float32
        ),
        dev,
    )
    ref = _fetch(
        jax.jit(lambda x, a: sins_harmonic_bank(2.0 * np.pi * x, a, block))(
            x, amps
        )
    )
    pal = _fetch(
        jax.jit(lambda x, a: harmonic_bank_pallas(x, a, block))(x, amps)
    )
    err = float(np.abs(ref - pal).max())
    return {"ok": err < 1e-3, "max_abs_err": err,
            "shape": [b, t, block, n_harm]}


def check_nsf_bf16_quality():
    """NSF-HiFiGAN bf16 activations vs f32: output SNR must stay above the
    audibility bar (params f32 both ways, random init)."""
    from ddsp_svc_tpu.models.nsf_hifigan import Generator

    sr, hop, m = 44100, 512, 128
    b, t = 2, 64
    rng = np.random.default_rng(2)
    gen32 = Generator(sampling_rate=sr, num_mels=m)
    gen16 = Generator(sampling_rate=sr, num_mels=m, dtype=jnp.bfloat16)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = gen32.init(
            {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
            jnp.zeros((1, 16, m)), 220.0 * jnp.ones((1, 16)),
            key=jax.random.PRNGKey(0),
        )["params"]
    dev = jax.devices()[0]
    mel = jax.device_put(
        (rng.standard_normal((b, t, m)) * 2.0 - 6.0).astype(np.float32), dev
    )
    f0 = jax.device_put(220.0 * np.ones((b, t), np.float32), dev)
    params = jax.tree.map(lambda a: jax.device_put(np.asarray(a), dev), params)
    key = jax.random.PRNGKey(3)
    y32 = _fetch(jax.jit(
        lambda p, mel, f0: gen32.apply({"params": p}, mel, f0, key=key)
    )(params, mel, f0))
    y16 = _fetch(jax.jit(
        lambda p, mel, f0: gen16.apply({"params": p}, mel, f0, key=key)
    )(params, mel, f0)).astype(np.float32)
    snr = float(10.0 * np.log10(
        float((y32 ** 2).sum()) / max(float(((y32 - y16) ** 2).sum()), 1e-20)
    ))
    return {"ok": bool(snr > 25.0), "snr_db_bf16_vs_f32": round(snr, 2)}


def check_combsub_bf16_quality():
    """Flagship CombSubSuperFast bf16 activations vs f32: output SNR."""
    from ddsp_svc_tpu.models.ddsp import CombSubSuperFast

    sr, hop, win, n_unit = 44100, 512, 2048, 768
    b, t = 2, 128
    rng = np.random.default_rng(3)
    m32 = CombSubSuperFast(sr, hop, win, n_unit=n_unit, n_spk=1)
    m16 = CombSubSuperFast(sr, hop, win, n_unit=n_unit, n_spk=1,
                           dtype=jnp.bfloat16)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = m32.init(
            {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
            jnp.zeros((1, 16, n_unit)), 220.0 * jnp.ones((1, 16, 1)),
            jnp.ones((1, 16, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
        )["params"]
    dev = jax.devices()[0]
    units = jax.device_put(
        rng.standard_normal((b, t, n_unit)).astype(np.float32), dev
    )
    f0 = jax.device_put(
        (220.0 * np.exp(0.1 * rng.standard_normal((b, t, 1)))).astype(
            np.float32
        ), dev,
    )
    vol = jax.device_put(0.5 * np.ones((b, t, 1), np.float32), dev)
    spk = jax.device_put(np.ones((b, 1), np.int32), dev)
    params = jax.tree.map(lambda a: jax.device_put(np.asarray(a), dev), params)
    key = jax.random.PRNGKey(4)

    def run(m):
        def f(p, units, f0, vol, spk):
            s, _, _ = m.apply({"params": p}, units, f0, vol, spk_id=spk,
                              infer=True, rngs={"noise": key})
            return s
        return _fetch(jax.jit(f)(params, units, f0, vol, spk))

    y32 = run(m32)
    y16 = run(m16).astype(np.float32)
    snr = float(10.0 * np.log10(
        float((y32 ** 2).sum()) / max(float(((y32 - y16) ** 2).sum()), 1e-20)
    ))
    return {"ok": bool(snr > 25.0), "snr_db_bf16_vs_f32": round(snr, 2)}




def check_batcher_serving():
    """BatchedSynth on the real chip: a padded request's output must equal
    the direct padded forward with the same per-request noise key."""
    from ddsp_svc_tpu.infer.batcher import BatchedSynth
    from ddsp_svc_tpu.models.ddsp import CombSubSuperFast

    sr, hop, win, n_unit = 44100, 512, 2048, 768
    model = CombSubSuperFast(sr, hop, win, n_unit=n_unit, n_spk=2)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = model.init(
            {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
            jnp.zeros((1, 16, n_unit)), 220.0 * jnp.ones((1, 16, 1)),
            jnp.ones((1, 16, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
        )["params"]
    dev = jax.devices()[0]
    params = jax.tree.map(lambda a: jax.device_put(np.asarray(a), dev), params)

    rng = np.random.default_rng(5)
    t, bucket = 100, 128
    units = rng.standard_normal((t, n_unit)).astype(np.float32)
    f0 = (220.0 * np.exp(0.1 * rng.standard_normal((t, 1)))).astype(np.float32)
    vol = 0.5 * np.ones((t, 1), np.float32)
    key = jax.random.PRNGKey(9)

    eng = BatchedSynth(model, params, buckets=(bucket,), max_batch=2,
                       max_wait_ms=5.0)
    try:
        got = eng.infer(units, f0, vol, spk_id=1, key=key)
    finally:
        eng.close()

    u = np.zeros((1, bucket, n_unit), np.float32); u[0, :t] = units
    f = np.full((1, bucket, 1), 220.0, np.float32); f[0, :t] = f0
    v = np.zeros((1, bucket, 1), np.float32); v[0, :t] = vol
    noise = jax.random.normal(key, (1, bucket * hop), jnp.float32)

    def direct(p, u, f, v, n):
        sig, _, _ = model.apply(
            {"params": p}, u, f, v, spk_id=jnp.ones((1, 1), jnp.int32),
            infer=True, noise=n,
        )
        return sig

    ref = _fetch(jax.jit(direct)(params, jnp.asarray(u), jnp.asarray(f),
                                 jnp.asarray(v), noise))[0, : t * hop]
    denom = max(float(np.abs(ref).max()), 1e-9)
    rel = float(np.abs(got - ref).max()) / denom
    return {"ok": bool(rel < 1e-4), "max_rel_err": rel}


def check_nsf_subpixel():
    """Subpixel Generator upsamplers (matmul + depth-to-space,
    models/nn.py ConvTranspose1d.subpixel) vs the lhs-dilated lowering ON
    HARDWARE: same params, same function.

    Compared under matmul_precision='highest': at the TPU default the MXU
    rounds conv inputs to bf16 and the two lowerings contract in different
    orders, so they each sit ~4e-3 from the f32 function and ~2.6e-3 from
    each other (measured) — a property of the default precision, not of the
    lowering. At 'highest' both agree with CPU f32 to ~3e-5 and with each
    other to ~1e-5. The default-precision spread is reported as info."""
    from ddsp_svc_tpu.models.nsf_hifigan import Generator

    sr, m = 44100, 128
    b, t = 2, 64
    rng = np.random.default_rng(5)
    gen_ref = Generator(sampling_rate=sr, num_mels=m)
    gen_sub = Generator(sampling_rate=sr, num_mels=m, subpixel_upsample=True)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = gen_ref.init(
            {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
            jnp.zeros((1, 16, m)), 220.0 * jnp.ones((1, 16)),
            key=jax.random.PRNGKey(0),
        )["params"]
    dev = jax.devices()[0]
    mel = jax.device_put(
        (rng.standard_normal((b, t, m)) * 2.0 - 6.0).astype(np.float32), dev
    )
    f0 = jax.device_put(220.0 * np.ones((b, t), np.float32), dev)
    params = jax.tree.map(lambda a: jax.device_put(np.asarray(a), dev), params)
    key = jax.random.PRNGKey(3)
    def run(gen, precision):
        def f(p, mel, f0):
            with jax.default_matmul_precision(precision):
                return gen.apply({"params": p}, mel, f0, key=key)
        return _fetch(jax.jit(f)(params, mel, f0))

    y_ref = run(gen_ref, "highest")
    y_sub = run(gen_sub, "highest")
    denom = max(float(np.abs(y_ref).max()), 1e-9)
    rel = float(np.abs(y_sub - y_ref).max()) / denom
    rel_default = float(
        np.abs(run(gen_sub, "default") - run(gen_ref, "default")).max()
    ) / denom
    return {"ok": bool(rel < 1e-4), "max_rel_err_highest": rel,
            "max_rel_err_default_precision": rel_default}


def check_nsf_fused_resblock():
    """Fused Pallas resblock Generator (ops/pallas_resblock.py) vs the stock
    XLA conv path ON HARDWARE: same params, same function. Both lowerings
    run the MXU at default precision (bf16 passes for f32 inputs), so they
    each sit a few 1e-3 from CPU f32 and from each other — the fused kernel
    was measured CLOSER to CPU f32 than the stock path (2.5e-3 vs 6.4e-3).
    The gate compares both TPU lowerings against the CPU f32 function."""
    from ddsp_svc_tpu.models.nsf_hifigan import Generator

    sr, m = 44100, 128
    b, t = 2, 64
    rng = np.random.default_rng(7)
    gen_ref = Generator(sampling_rate=sr, num_mels=m)
    gen_fused = Generator(sampling_rate=sr, num_mels=m, use_pallas_resblock=True)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = gen_ref.init(
            {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
            jnp.zeros((1, 16, m)), 220.0 * jnp.ones((1, 16)),
            key=jax.random.PRNGKey(0),
        )["params"]
    mel_h = (rng.standard_normal((b, t, m)) * 2.0 - 6.0).astype(np.float32)
    f0_h = 220.0 * np.ones((b, t), np.float32)
    key = jax.random.PRNGKey(3)
    with jax.default_device(cpu):
        y_cpu = np.asarray(
            jax.jit(lambda p, mel, f0: gen_ref.apply(
                {"params": p}, mel, f0, key=key))(params, mel_h, f0_h)
        )
    dev = jax.devices()[0]
    mel = jax.device_put(mel_h, dev)
    f0 = jax.device_put(f0_h, dev)
    params_d = jax.tree.map(lambda a: jax.device_put(np.asarray(a), dev), params)
    def run(gen):
        return _fetch(jax.jit(
            lambda p, mel, f0: gen.apply({"params": p}, mel, f0, key=key)
        )(params_d, mel, f0))
    y_ref = run(gen_ref)
    y_fused = run(gen_fused)
    denom = max(float(np.abs(y_cpu).max()), 1e-9)
    rel_fused = float(np.abs(y_fused - y_cpu).max()) / denom
    rel_stock = float(np.abs(y_ref - y_cpu).max()) / denom
    return {
        "ok": bool(rel_fused < max(2.0 * rel_stock, 1e-2)),
        "max_rel_err_fused_vs_cpu_f32": rel_fused,
        "max_rel_err_stock_vs_cpu_f32": rel_stock,
    }


def check_streamed_vocoder_fused():
    """Fused Pallas resblocks INSIDE the shard_map'd streamed vocoder driver
    ON HARDWARE (1-device mesh on the real chip): streamed output must match
    the whole-utterance fused forward — the streaming-consistency invariant
    (CLAUDE.md) must survive the kernel swap. CPU-mesh tests can't cover
    this combination (Pallas compiles for TPU only)."""
    import numpy as np

    from jax.sharding import Mesh

    from ddsp_svc_tpu.models.nsf_hifigan import Generator
    from ddsp_svc_tpu.parallel.stream_vocoder import (
        nsf_hifigan_padded_forward,
        streamed_nsf_hifigan,
    )

    sr, m, t = 44100, 128, 64
    gen = Generator(sampling_rate=sr, num_mels=m, use_pallas_resblock=True)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = gen.init(
            {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
            jnp.zeros((1, 16, m)), 220.0 * jnp.ones((1, 16)),
            key=jax.random.PRNGKey(0),
        )["params"]
    dev = jax.devices()[0]
    rng = np.random.default_rng(21)
    mel = jax.device_put(
        (rng.standard_normal((1, t, m)) * 2.0 - 6.0).astype(np.float32), dev
    )
    f0 = jax.device_put(220.0 * np.ones((1, t), np.float32), dev)
    params = jax.tree.map(lambda a: jax.device_put(np.asarray(a), dev), params)
    key = jax.random.PRNGKey(5)
    mesh = Mesh(np.array([dev]), ("time",))
    streamed = _fetch(streamed_nsf_hifigan(gen, params, mel, f0, key, mesh))
    whole = _fetch(nsf_hifigan_padded_forward(gen, params, mel, f0, key))
    rel = float(np.abs(streamed - whole).max() / max(np.abs(whole).max(), 1e-9))
    return {"ok": bool(rel < 1e-5), "max_rel_err": rel}


def check_batcher_i16():
    """int16 d2h transfer vs f32 through the batcher ON HARDWARE: one
    16-bit LSB agreement (the --batch_i16 serving lever)."""
    from ddsp_svc_tpu.infer.batcher import BatchedSynth
    from ddsp_svc_tpu.models.ddsp import CombSubSuperFast

    sr, hop, win, n_unit = 44100, 512, 2048, 768
    t = 64
    model = CombSubSuperFast(sr, hop, win, n_unit=n_unit, n_spk=1)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = model.init(
            {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
            jnp.zeros((1, 16, n_unit)), 220.0 * jnp.ones((1, 16, 1)),
            jnp.ones((1, 16, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
        )["params"]
    dev = jax.devices()[0]
    params = jax.tree.map(lambda a: jax.device_put(np.asarray(a), dev), params)
    rng = np.random.default_rng(11)
    units = rng.standard_normal((t, n_unit)).astype(np.float32)
    f0 = (220.0 * np.exp(0.1 * rng.standard_normal((t, 1)))).astype(np.float32)
    vol = 0.5 * np.ones((t, 1), np.float32)
    key = jax.random.PRNGKey(7)
    eng = BatchedSynth(model, params, buckets=(t,), max_batch=1,
                       max_wait_ms=1.0)
    eng16 = BatchedSynth(model, params, buckets=(t,), max_batch=1,
                         max_wait_ms=1.0, transfer_int16=True)
    try:
        ref = eng.infer(units, f0, vol, spk_id=1, key=key)
        got = eng16.infer(units, f0, vol, spk_id=1, key=key)
    finally:
        eng.close()
        eng16.close()
    ref = np.clip(ref, -32768.0 / 32767.0, 1.0)
    err = float(np.abs(got - ref).max())
    return {"ok": bool(err <= 1.01 / 32767.0), "max_abs_err": err}


def check_batcher_mulaw():
    """8-bit μ-law d2h transfer vs f32 through the batcher ON HARDWARE: the
    --batch_mulaw lever's quality cost, reported as SNR of the decoded
    output vs the f32 transfer. μ-law with μ=255 holds ~38 dB SNR on
    speech-scale material (companding noise tracks signal level) — audible
    transparency for VC serving is debatable above ~35 dB; this is an
    opt-in throughput lever, gated here at >= 30 dB plus a hard bound of
    one μ-law step on the max abs error."""
    from ddsp_svc_tpu.infer.batcher import BatchedSynth
    from ddsp_svc_tpu.models.ddsp import CombSubSuperFast

    sr, hop, win, n_unit = 44100, 512, 2048, 768
    t = 64
    model = CombSubSuperFast(sr, hop, win, n_unit=n_unit, n_spk=1)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = model.init(
            {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
            jnp.zeros((1, 16, n_unit)), 220.0 * jnp.ones((1, 16, 1)),
            jnp.ones((1, 16, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
        )["params"]
    dev = jax.devices()[0]
    params = jax.tree.map(lambda a: jax.device_put(np.asarray(a), dev), params)
    rng = np.random.default_rng(13)
    units = rng.standard_normal((t, n_unit)).astype(np.float32)
    f0 = (220.0 * np.exp(0.1 * rng.standard_normal((t, 1)))).astype(np.float32)
    vol = 0.5 * np.ones((t, 1), np.float32)
    key = jax.random.PRNGKey(7)
    eng = BatchedSynth(model, params, buckets=(t,), max_batch=1,
                       max_wait_ms=1.0)
    engm = BatchedSynth(model, params, buckets=(t,), max_batch=1,
                        max_wait_ms=1.0, transfer="mulaw")
    try:
        ref = eng.infer(units, f0, vol, spk_id=1, key=key)
        got = engm.infer(units, f0, vol, spk_id=1, key=key)
    finally:
        eng.close()
        engm.close()
    ref = np.clip(ref, -1.0, 1.0)
    noise = got - ref
    snr_db = float(
        10.0 * np.log10((ref ** 2).sum() / max((noise ** 2).sum(), 1e-20))
    )
    # one μ-law step at |x|: Δx ≈ ln(256)/255 · (1/255 + |x|)
    step = np.log(256.0) / 255.0 * (1.0 / 255.0 + np.abs(ref))
    within = float((np.abs(noise) <= step * 1.01).mean())
    return {"ok": bool(snr_db >= 30.0 and within >= 0.999),
            "snr_db": snr_db, "frac_within_one_step": within}


def check_batcher_f16in():
    """f16 unit-feature upload vs f32 through the batcher ON HARDWARE: the
    --batch_f16_in lever's quality cost, reported as SNR vs the f32-upload
    output. Unit features carry encoder noise far above f16 rounding; gate
    at >= 40 dB on the synthesized audio."""
    from ddsp_svc_tpu.infer.batcher import BatchedSynth
    from ddsp_svc_tpu.models.ddsp import CombSubSuperFast

    sr, hop, win, n_unit = 44100, 512, 2048, 768
    t = 64
    model = CombSubSuperFast(sr, hop, win, n_unit=n_unit, n_spk=1)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = model.init(
            {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
            jnp.zeros((1, 16, n_unit)), 220.0 * jnp.ones((1, 16, 1)),
            jnp.ones((1, 16, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
        )["params"]
    dev = jax.devices()[0]
    params = jax.tree.map(lambda a: jax.device_put(np.asarray(a), dev), params)
    rng = np.random.default_rng(17)
    units = rng.standard_normal((t, n_unit)).astype(np.float32)
    f0 = (220.0 * np.exp(0.1 * rng.standard_normal((t, 1)))).astype(np.float32)
    vol = 0.5 * np.ones((t, 1), np.float32)
    key = jax.random.PRNGKey(7)
    eng = BatchedSynth(model, params, buckets=(t,), max_batch=1,
                       max_wait_ms=1.0)
    engf = BatchedSynth(model, params, buckets=(t,), max_batch=1,
                        max_wait_ms=1.0, transfer_in="f16")
    try:
        ref = eng.infer(units, f0, vol, spk_id=1, key=key)
        got = engf.infer(units, f0, vol, spk_id=1, key=key)
    finally:
        eng.close()
        engf.close()
    noise = got - ref
    snr_db = float(
        10.0 * np.log10((ref ** 2).sum() / max((noise ** 2).sum(), 1e-20))
    )
    return {"ok": bool(snr_db >= 40.0), "snr_db": snr_db}


def check_batcher_pipelined():
    """Overlapped-fetch pipelining (pipeline_depth=3) ON HARDWARE: four
    concurrent requests through the pipelined engine must be bit-identical
    to the serial (depth=1) engine — the delivery thread's barrier+fetch
    while the worker dispatches the next batch must not change anything."""
    import threading

    from ddsp_svc_tpu.infer.batcher import BatchedSynth
    from ddsp_svc_tpu.models.ddsp import CombSubSuperFast

    sr, hop, win, n_unit = 44100, 512, 2048, 768
    t = 64
    model = CombSubSuperFast(sr, hop, win, n_unit=n_unit, n_spk=1)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = model.init(
            {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
            jnp.zeros((1, 16, n_unit)), 220.0 * jnp.ones((1, 16, 1)),
            jnp.ones((1, 16, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
        )["params"]
    dev = jax.devices()[0]
    params = jax.tree.map(lambda a: jax.device_put(np.asarray(a), dev), params)
    rng = np.random.default_rng(13)
    reqs = [
        (rng.standard_normal((t, n_unit)).astype(np.float32),
         (220.0 * np.exp(0.1 * rng.standard_normal((t, 1)))).astype(np.float32),
         0.5 * np.ones((t, 1), np.float32),
         jax.random.PRNGKey(40 + i))
        for i in range(4)
    ]

    def run_all(depth):
        eng = BatchedSynth(model, params, buckets=(t,), max_batch=2,
                           max_wait_ms=5.0, pipeline_depth=depth)
        outs = [None] * len(reqs)
        try:
            ths = [
                threading.Thread(
                    target=lambda i=i: outs.__setitem__(
                        i, eng.infer(*reqs[i][:3], spk_id=1, key=reqs[i][3]))
                )
                for i in range(len(reqs))
            ]
            for th in ths:
                th.start()
            for th in ths:
                th.join()
        finally:
            eng.close()
        return outs

    serial = run_all(1)
    pipelined = run_all(3)
    err = max(float(np.abs(a - b).max()) for a, b in zip(serial, pipelined))
    return {"ok": bool(err == 0.0), "max_abs_err": err}


def check_encoder_batched():
    """BatchedEncoder on the real chip: a zero-padded batch row's units must
    match the solo encode of the unpadded request (masked HuBERT forward,
    features/hubert.py) at the production encoder size (contentvec768l12).

    Two precision regimes, because the delta's ROOT CAUSE is precision, not
    masking (CPU f32 agrees to ~1e-6): at the TPU's default matmul precision
    the MXU's bf16-pass rounding is shape-dependent, so the padded bucket
    shape rounds differently from the solo shape through the 12 layers
    (~7.5e-3 rel measured).  With `jax.default_matmul_precision('highest')`
    both shapes use full-f32 passes and must agree at reduction-noise level
    — that field is the masking-exactness gate (<=1e-4, VERDICT r3 item 4)."""
    from ddsp_svc_tpu.features.hubert import UnitsEncoder
    from ddsp_svc_tpu.infer.enc_batcher import BatchedEncoder

    sr, hop = 44100, 512
    rng = np.random.default_rng(7)
    lengths = [int(0.8 * sr), int(1.4 * sr)]
    audio = [
        (0.3 * np.sin(2 * np.pi * 200.0 * np.arange(n) / sr)
         + 0.02 * rng.standard_normal(n)).astype(np.float32)
        for n in lengths
    ]
    bucket = lengths[-1] // hop + 1

    def run_regime():
        # fresh encoder + engine per regime: their jits trace (and bake the
        # ambient matmul precision) on first call
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            enc = UnitsEncoder("contentvec768l12")
        dev = jax.devices()[0]
        enc.variables = jax.tree.map(
            lambda a: jax.device_put(np.asarray(a), dev), dict(enc.variables)
        )
        eng = BatchedEncoder(enc, frame_buckets=(bucket,), max_batch=2,
                             max_wait_ms=1000.0)
        try:
            import threading

            results = [None, None]

            def run(i):
                results[i] = _fetch(eng.encode(audio[i], sr, hop))

            threads = [threading.Thread(target=run, args=(i,))
                       for i in (0, 1)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            stats = eng.stats()
        finally:
            eng.close()
        worst = 0.0
        for i, a in enumerate(audio):
            ref = _fetch(enc.encode(jnp.asarray(a)[None], sr, hop))
            denom = max(float(np.abs(ref).max()), 1e-9)
            worst = max(worst,
                        float(np.abs(results[i] - ref).max()) / denom)
        return worst, stats["batches"]

    worst_default, batches = run_regime()
    # NOT the `jax.default_matmul_precision(...)` context manager: that is
    # thread-local, and the BatchedEncoder compiles its forward in its own
    # worker thread (which would silently stay at default precision while
    # the solo side compiled at highest — measured exactly that skew:
    # 1.5e-2 'highest' vs 7.5e-3 default). The config.update form is
    # process-global and reaches the worker thread.
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        worst_highest, _ = run_regime()
    finally:
        jax.config.update("jax_default_matmul_precision", None)
    return {"ok": bool(worst_highest < 1e-4 and worst_default < 2e-2
                       and batches == 1),
            "max_rel_err_highest": worst_highest,
            "max_rel_err_default_precision": worst_default,
            "batches": batches}

def check_cascade_bf16_quality():
    """DiffusionFast cascade bf16 activations vs f32: refined-mel SNR (the
    quality gate for the cascade_bf16/reflow_bf16 bench configs — the
    cascades sit at the f32 memory roofline, so bf16 is the bytes lever)."""
    from ddsp_svc_tpu.models.cascade import Unit2WavFast
    from ddsp_svc_tpu.ops.mel import LogMelSpectrogram

    sr, hop, win, n_unit, m_bins = 44100, 512, 2048, 768, 128
    b, t = 2, 128
    rng = np.random.default_rng(11)
    mel_x = LogMelSpectrogram(sr=sr, n_mels=m_bins, n_fft=2048, win_size=2048,
                              hop_length=hop, fmin=40.0, fmax=16000.0)
    kwargs = dict(k_step=100, infer_speedup=10, sampler="dpm-solver")

    def build(dtype):
        return Unit2WavFast(sr, hop, win, n_unit, 1, out_dims=m_bins,
                            n_layers=6, n_chans=512, k_step_max=100,
                            dtype=dtype)

    m32, m16 = build(None), build(jnp.bfloat16)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = m32.init(
            {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
            jnp.zeros((1, 16, n_unit)), 220.0 * jnp.ones((1, 16, 1)),
            jnp.ones((1, 16, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
            mel_extract_fn=mel_x.extract, infer=True,
            key=jax.random.PRNGKey(3), **kwargs,
        )["params"]
    dev = jax.devices()[0]
    params = jax.tree.map(lambda a: jax.device_put(np.asarray(a), dev), params)
    units = jax.device_put(
        rng.standard_normal((b, t, n_unit)).astype(np.float32), dev)
    f0 = jax.device_put(
        (220.0 * np.exp(0.1 * rng.standard_normal((b, t, 1)))).astype(
            np.float32), dev)
    vol = jax.device_put(0.5 * np.ones((b, t, 1), np.float32), dev)
    spk = jax.device_put(np.ones((b, 1), np.int32), dev)
    key = jax.random.PRNGKey(4)

    def run(m):
        def f(p, units, f0, vol, spk):
            return m.apply({"params": p}, units, f0, vol, spk_id=spk,
                           mel_extract_fn=mel_x.extract, infer=True, key=key,
                           rngs={"noise": key}, **kwargs)
        return _fetch(jax.jit(f)(params, units, f0, vol, spk))

    y32 = run(m32)
    y16 = run(m16).astype(np.float32)
    snr = float(10.0 * np.log10(
        float((y32 ** 2).sum()) / max(float(((y32 - y16) ** 2).sum()), 1e-20)
    ))
    return {"ok": bool(snr > 25.0), "snr_db_bf16_vs_f32": round(snr, 2)}

def check_fused_conformer():
    """Fused Pallas conformer-layer trunk (ops/pallas_conformer) vs the
    stock XLA chain on hardware: the full DiffusionFast refined-mel output
    with trunk_pallas on/off from IDENTICAL params. Two regimes recorded
    (the encoder_batched lesson): default matmul precision (MXU bf16-pass
    rounding differs between the kernel's dot_generals and XLA's fused
    convs) and float32-precision dots, which pin any real math bug."""
    from ddsp_svc_tpu.models.cascade import Unit2WavFast
    from ddsp_svc_tpu.ops.mel import LogMelSpectrogram

    sr, hop, win, n_unit, m_bins = 44100, 512, 2048, 768, 128
    b, t = 2, 128
    rng = np.random.default_rng(13)
    mel_x = LogMelSpectrogram(sr=sr, n_mels=m_bins, n_fft=2048, win_size=2048,
                              hop_length=hop, fmin=40.0, fmax=16000.0)
    kwargs = dict(k_step=100, infer_speedup=10, sampler="dpm-solver")

    def build(fused, exact=False):
        return Unit2WavFast(sr, hop, win, n_unit, 1, out_dims=m_bins,
                            n_layers=6, n_chans=512, k_step_max=100,
                            trunk_pallas=fused, trunk_pallas_exact=exact)

    stock, fused = build(False), build(True)
    fused_exact = build(True, exact=True)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = stock.init(
            {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
            jnp.zeros((1, 16, n_unit)), 220.0 * jnp.ones((1, 16, 1)),
            jnp.ones((1, 16, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
            mel_extract_fn=mel_x.extract, infer=True,
            key=jax.random.PRNGKey(3), **kwargs,
        )["params"]
    dev = jax.devices()[0]
    params = jax.tree.map(lambda a: jax.device_put(np.asarray(a), dev), params)
    units = jax.device_put(
        rng.standard_normal((b, t, n_unit)).astype(np.float32), dev)
    f0 = jax.device_put(
        (220.0 * np.exp(0.1 * rng.standard_normal((b, t, 1)))).astype(
            np.float32), dev)
    vol = jax.device_put(0.5 * np.ones((b, t, 1), np.float32), dev)
    spk = jax.device_put(np.ones((b, 1), np.int32), dev)
    key = jax.random.PRNGKey(4)

    def run(m, precision=None):
        def f(p, units, f0, vol, spk):
            return m.apply({"params": p}, units, f0, vol, spk_id=spk,
                           mel_extract_fn=mel_x.extract, infer=True, key=key,
                           rngs={"noise": key}, **kwargs)
        if precision:
            with jax.default_matmul_precision(precision):
                return _fetch(jax.jit(f)(params, units, f0, vol, spk))
        return _fetch(jax.jit(f)(params, units, f0, vol, spk))

    out = {}
    # shipped mode: kernel bf16 MXU passes vs stock at ITS default
    # precision — same precision class, so the delta is bf16-pass
    # rounding through 10 sampler steps (quality-class bound)
    for label, prec, m in (("default", None, fused),
                           ("highest", "float32", fused_exact)):
        ys = run(stock, prec)
        yf = run(m, prec)
        denom = float(np.abs(ys).max()) or 1.0
        rel = float(np.abs(ys - yf).max()) / denom
        snr = float(10.0 * np.log10(
            float((ys ** 2).sum())
            / max(float(((ys - yf) ** 2).sum()), 1e-20)))
        out[f"max_rel_err_{label}"] = rel
        out[f"snr_db_{label}"] = round(snr, 2)
    # highest-precision agreement (f32 passes both sides) pins the math;
    # the default-regime delta is bf16-pass rounding (same mechanism as
    # encoder_batched / nsf_subpixel), bounded as a quality class
    out["ok"] = bool(out["max_rel_err_highest"] < 3e-4
                     and out["snr_db_default"] > 25.0)
    return out


def check_device_yin():
    """Jitted on-device YIN (features/yin_jax.py) vs the host numpy tracker
    on hardware: the serving front-end lever (--device_f0) must reproduce
    the host voicing decisions and pitch within f32-FFT noise on the real
    chip, not just the CPU-mesh tests."""
    from ddsp_svc_tpu.features.f0 import F0Extractor
    from ddsp_svc_tpu.features.yin_jax import make_pipeline_f0_fn

    sr, hop = 44100, 512
    rng = np.random.default_rng(5)
    t = np.arange(sr * 5) / sr
    f_inst = 220.0 * (1 + 0.03 * np.sin(2 * np.pi * 5 * t))
    a = (0.3 * np.sin(2 * np.pi * np.cumsum(f_inst) / sr)
         + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
    a[sr:sr + sr // 2] = 0.0
    host = F0Extractor("yin", sr, hop, 50.0, 1100.0).extract(
        a, uv_interp=True)
    fn = jax.jit(make_pipeline_f0_fn(len(a), sr, hop, 50.0, 1100.0))
    dev = _fetch(fn(jax.device_put(a, jax.devices()[0])))
    cents = np.abs(1200.0 * np.log2(
        np.maximum(dev, 1e-6) / np.maximum(host, 1e-6)))
    return {
        "ok": bool(cents.max() < 1.0),
        "max_cents_vs_host": round(float(cents.max()), 4),
        "mean_cents_vs_host": round(float(cents.mean()), 5),
    }


def check_front_fused():
    """r4 fused serving front-end on hardware: encode_with_f0's ONE
    program (i16 wire decode + masked HuBERT + vmapped YIN + keyshift +
    synth-grid gather + batch-padding convention) must reproduce the solo
    encode + solo device-YIN per request — the path every batched
    `--device_f0` serving request rides (infer/enc_batcher.py)."""
    from ddsp_svc_tpu.features.hubert import UnitsEncoder
    from ddsp_svc_tpu.features.yin_jax import make_pipeline_f0_fn
    from ddsp_svc_tpu.infer.enc_batcher import BatchedEncoder

    sr, hop = 44100, 512
    rng = np.random.default_rng(11)
    lengths = [int(0.9 * sr), int(1.3 * sr)]
    shifts = [0.0, 2.0]
    audio = [
        (0.3 * np.sin(2 * np.pi * (196.0 + 30 * i) * np.arange(n) / sr)
         + 0.01 * rng.standard_normal(n)).astype(np.float32)
        for i, n in enumerate(lengths)
    ]
    bucket = lengths[-1] // hop + 1
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        enc = UnitsEncoder("contentvec768l12")
    enc.variables = jax.device_put(enc.variables, jax.devices()[0])
    eng = BatchedEncoder(enc, frame_buckets=(bucket,), max_batch=2,
                         max_wait_ms=400.0, with_f0=True, f0_min=50.0,
                         f0_max=1100.0, transfer_in="i16")
    try:
        results = [None, None]
        threads = [
            threading.Thread(
                target=lambda i=i: results.__setitem__(
                    i, eng.encode_with_f0(audio[i], sr, hop, shifts[i])))
            for i in range(2)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        max_rel_u, max_cents = 0.0, 0.0
        for i, a in enumerate(audio):
            t_req = a.shape[0] // hop + 1
            units = _fetch(results[i][0])[0, :t_req]
            f0 = _fetch(results[i][1])[0, :t_req, 0]
            # solo with the same i16 quantization (isolates fusion from
            # the codec, whose own delta check_encoder-style tests carry)
            a16 = (np.clip(np.rint(a * 32767.0), -32768, 32767)
                   .astype(np.int16)
                   .astype(np.float32) / 32767.0)
            solo_u = _fetch(enc.encode(
                jnp.asarray(a16)[None], sr, hop))[0]
            solo_f = _fetch(jax.jit(make_pipeline_f0_fn(
                len(a16), sr, hop, 50.0, 1100.0))(jnp.asarray(a16)))
            solo_f = solo_f * 2.0 ** (shifts[i] / 12.0)
            rel = np.abs(units - solo_u) / (np.abs(solo_u).max() + 1e-9)
            max_rel_u = max(max_rel_u, float(rel.max()))
            cents = np.abs(1200.0 * np.log2(
                np.maximum(f0, 1e-6) / np.maximum(solo_f[:t_req], 1e-6)))
            max_cents = max(max_cents, float(cents.max()))
        batched_once = eng.stats()["batches"] == 1
    finally:
        eng.close()
    # default matmul precision: the MXU's shape-dependent bf16-pass
    # rounding bounds units agreement (same mechanism encoder_batched
    # documents); pitch must be sub-cent
    return {
        "ok": bool(max_rel_u < 2e-2 and max_cents < 1.0 and batched_once),
        "max_rel_units_vs_solo": round(max_rel_u, 6),
        "max_cents_vs_solo": round(max_cents, 4),
        "one_fused_dispatch": batched_once,
    }


def _chain_quality(family: str, transfer: str, bound_db: float,
                   trunk_pallas: bool = False, audio_in: str = "i16",
                   with_control: bool = False):
    """End-to-end quality of a shipped serving composition on hardware:
    the same request through (a) the direct unbatched pipeline (one fused
    f32 graph, f32 d2h) and (b) the full serving composition
    (--device_f0 + --batch_encoder + --audio_i16 + --batch_f16_in +
    voc_bf16, transfer codec per tier).

    r5 attribution (scripts + the tier matrix): the floor these
    compositions share (~26-27 dB at random-init) is NOT the μ-law
    companding, NOT the padded tail (masked in-graph since r5), and NOT
    MXU precision (the all-f32 control measures 33.5 dB at default and
    31.8 dB at HIGHEST matmul precision) — it is the structural
    batched-vs-direct lowering variance amplified by the 10-step
    nonlinear sampler at random init, plus ~1-6 dB for the activation
    codecs (f16 units / bf16 vocoder) through the same amplifier. Each
    codec is individually bounded by its own per-lever gate
    (nsf_bf16_quality 58 dB, batcher_mulaw 37.6 dB, batcher_f16in), so
    the ``with_control`` tier gates the COMPOSITION cost instead of an
    absolute number: codec cost vs the uncoded batched control must stay
    ≤ 8 dB (and the absolute body SNR ≥ the tier bound)."""
    import bench_suite as bs

    sr, hop = bs.SR, bs.HOP

    def build(vbf16):
        # the SAME rigs the bench and probes use (one definition)
        if family == "ddsp":
            return bs.make_ddsp_serving_pipeline(device_f0=True,
                                                 vocoder_bf16=vbf16)
        return bs.make_diffusion_serving_pipeline(
            device_f0=True, vocoder_bf16=vbf16, family=family,
            trunk_pallas=trunk_pallas and vbf16)

    n = int(2.0 * sr)
    t_ax = np.arange(n) / sr
    f_inst = 196.0 * (1 + 0.02 * np.sin(2 * np.pi * 5 * t_ax))
    audio = (0.3 * np.sin(2 * np.pi * np.cumsum(f_inst) / sr)
             + 0.005 * np.random.default_rng(3).standard_normal(n)
             ).astype(np.float32)

    if family == "diffusion":
        kw = dict(spk_id=1, k_step=100, speedup=10, method="dpm-solver")
    elif family == "reflow":
        kw = dict(spk_id=1, infer_step=20, method="euler", t_start=0.7)
    else:
        kw = dict(spk_id=1)
    cpu = jax.local_devices(backend="cpu")[0]

    def seed(pipe):
        # seed on the HOST backend: a device-committed key would make the
        # pipeline's CPU-context split run on the accelerator and its
        # np.asarray fetch hit the unbarriered-d2h hazard
        with jax.default_device(cpu):
            pipe._key = jax.random.PRNGKey(7)

    key = np.asarray(jax.random.PRNGKey(7))
    # (a) direct path: fused one-graph forward, f32 everything
    pd = build(False)
    seed(pd)
    ref, _ = pd.infer(audio, sr, key=key, **kw)
    # (b) the shipped serving composition
    ps = build(True)
    bucket = n // hop + 2
    req_kw = {k: v for k, v in kw.items() if k != "spk_id"}
    batcher = ps.enable_batching(
        buckets=(bucket,), max_batch=2, max_wait_ms=5.0, transfer=transfer,
        transfer_in="f16", pipeline_depth=2, batch_encoder=True,
        audio_in=audio_in, **req_kw,
    )
    try:
        seed(ps)
        got, _ = ps.infer(audio, sr, key=key, **kw)
    finally:
        batcher.close()
        if ps.enc_batcher is not None:
            ps.enc_batcher.close()
    ln = min(len(ref), len(got))
    ref, got = ref[:ln], got[:ln]

    def snr_of(a, b):
        return float(10.0 * np.log10(
            float((a ** 2).sum())
            / max(float(((b - a) ** 2).sum()), 1e-20)))

    snr_full = snr_of(ref, got)
    control = None
    if with_control:
        # the uncoded batched leg (all-f32 wire, same fused front-end +
        # batching): what batching alone costs vs direct — the codecs'
        # composition cost is measured against THIS, not against zero
        pc = build(False)
        bc = pc.enable_batching(
            buckets=(bucket,), max_batch=2, max_wait_ms=5.0,
            transfer="f32", transfer_in="f32", pipeline_depth=1,
            batch_encoder=True, audio_in="f32", **req_kw,
        )
        try:
            seed(pc)
            ctl, _ = pc.infer(audio, sr, key=key, **kw)
        finally:
            bc.close()
            if pc.enc_batcher is not None:
                pc.enc_batcher.close()
        control = ctl
    # the request does not fill its frame bucket, so the batch row's
    # dummy-frame synth colors the last ~mel-window + vocoder receptive
    # field of the returned tail (the engine's documented padded-tail
    # convention; r5 finding: this — NOT the μ-law companding — is the
    # ~26 dB full-length floor every codec tier shares). The codec gate
    # is therefore the BODY SNR; the full-length number is reported as
    # the padded-tail metric.
    tail = 16 * hop
    body = slice(0, max(ln - tail, 1))
    snr_body = snr_of(ref[body], got[body])
    out = {"ok": bool(snr_body > bound_db),
           "snr_db_body": round(snr_body, 2),
           "snr_db_full_incl_padded_tail": round(snr_full, 2),
           "family": family, "transfer": transfer, "audio_in": audio_in,
           "bound_db": bound_db}
    if control is not None:
        # codec cost gates on BODY SNRs of both legs over a COMMON length:
        # the padded-tail region is excluded from gating (its residual
        # differs between legs and is not a codec effect), mirroring the
        # body-vs-full split above
        lb = min(ln, len(control))
        body_c = slice(0, max(lb - tail, 1))
        control_body = snr_of(ref[body_c], control[body_c])
        coded_body = snr_of(ref[body_c], got[body_c])
        cost = control_body - coded_body
        out["snr_db_uncoded_batched_control_body"] = round(control_body, 2)
        out["codec_cost_db_vs_control"] = round(cost, 2)
        out["ok"] = bool(snr_body > bound_db and cost <= 8.0)
    return out


def check_serving_chain_quality():
    """The 203x diffusion composition (serving_diffusion_max), μ-law tier."""
    return _chain_quality("diffusion", "mulaw", 25.0)


def check_serving_chain_quality_reflow():
    """The reflow composition (serving_reflow_max), μ-law tier (VERDICT r4
    item 6a)."""
    return _chain_quality("reflow", "mulaw", 25.0)


def check_serving_chain_quality_hifi():
    """The no-μ-law quality tier (audio-i16 + f16-units + bf16 vocoder,
    f32 out) a quality-sensitive deployment runs — never composed before
    r5 (VERDICT r4 item 6b). Gated against the uncoded batched control
    (see _chain_quality's r5 attribution): absolute body ≥ 22 dB AND the
    codec composition costs ≤ 8 dB over batching alone."""
    return _chain_quality("diffusion", "f32", 22.0, with_control=True)


def check_serving_chain_quality_au8():
    """The r5 mu-law INPUT tier (8-bit audio upload — halves the dominant
    h2d cost vs i16 on degraded tunnel windows): the full diffusion
    composition with companded input + mu-law output. The input
    companding rides through YIN + HuBERT + the cascade, so the bound is
    looser than the i16 tier's."""
    return _chain_quality("diffusion", "mulaw", 18.0, audio_in="mulaw")


def check_serving_chain_quality_ddsp():
    """The flask_api.py literal chain (CombSub + Enhancer) through the
    fused batched graph + full codec ladder (serving_ddsp_max)."""
    return _chain_quality("ddsp", "mulaw", 25.0)


CHECKS = {
    "pallas_combtooth": check_pallas_combtooth,
    "pallas_oscillator": check_pallas_oscillator,
    "nsf_bf16_quality": check_nsf_bf16_quality,
    "combsub_bf16_quality": check_combsub_bf16_quality,
    "batcher_serving": check_batcher_serving,
    "nsf_subpixel": check_nsf_subpixel,
    "nsf_fused_resblock": check_nsf_fused_resblock,
    "streamed_vocoder_fused": check_streamed_vocoder_fused,
    "batcher_i16": check_batcher_i16,
    "batcher_mulaw": check_batcher_mulaw,
    "batcher_f16in": check_batcher_f16in,
    "batcher_pipelined": check_batcher_pipelined,
    "encoder_batched": check_encoder_batched,
    "cascade_bf16_quality": check_cascade_bf16_quality,
    "fused_conformer": check_fused_conformer,
    "device_yin": check_device_yin,
    "front_fused": check_front_fused,
    "serving_chain_quality": check_serving_chain_quality,
    "serving_chain_quality_reflow": check_serving_chain_quality_reflow,
    "serving_chain_quality_hifi": check_serving_chain_quality_hifi,
    "serving_chain_quality_ddsp": check_serving_chain_quality_ddsp,
    "serving_chain_quality_au8": check_serving_chain_quality_au8,
}


def main(names=None):
    try:
        with open(RESULTS) as f:
            results = json.load(f)
    except Exception:
        results = {}
    for name in names or list(CHECKS):
        # transient tunnel failures (remote_compile HTTP 500, UNIMPLEMENTED
        # d2h) recover within minutes — retry the whole check before
        # recording a failure (round-3's device_yin was recorded failed on
        # a single 500 that a retry would have cleared)
        for attempt in range(3):
            try:
                out = CHECKS[name]()
                out["platform"] = jax.devices()[0].platform
                out["measured_at_unix"] = time.time()
                break
            except Exception as e:
                out = {"ok": False, "error": str(e)[:300]}
                msg = str(e)
                transient = any(s in msg for s in (
                    "remote_compile", "UNIMPLEMENTED", "INTERNAL",
                    "DEADLINE_EXCEEDED", "UNAVAILABLE"))
                if not transient or attempt == 2:
                    break
                wait = 60.0 * (attempt + 1)
                print(f" [!] {name} transient failure (attempt "
                      f"{attempt + 1}/3), retrying in {wait:.0f}s: "
                      f"{msg[:120]}", flush=True)
                time.sleep(wait)
        results[name] = out
        with open(RESULTS, "w") as f:
            json.dump(results, f, indent=1, default=lambda o: (
                bool(o) if isinstance(o, np.bool_) else float(o)
            ))
        print(json.dumps({name: out}), flush=True)


if __name__ == "__main__":
    import sys

    main(sys.argv[1:] or None)
