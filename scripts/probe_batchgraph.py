"""Attribute the serving batch program's wall: times, at the serving
shapes (16 x 5 s requests, bucket 431), (a) the enc fused front-end
program, (b) the synthesis batcher's vmap(single)-form graph, and (c) a
direct-batched apply of the same cascade+vocoder chain (the
_bench_cascade form, one key for the whole batch) — to locate the gap
between serving's per-batch barrier (~0.55-1.1 s) and the pure-compute
e2e rate (~0.12 s for the same audio volume).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench_suite as bs  # noqa: E402


def sync(x):
    jax.effects_barrier()
    for i in range(5):
        try:
            np.asarray(x)
            return
        except Exception:
            time.sleep(2)


def timeit(fn, *args, reps=6):
    out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out if not isinstance(out, tuple) else out[0])
        times.append(time.perf_counter() - t0)
    return min(times), float(np.median(times))


def main():
    from ddsp_svc_tpu.models.cascade import Unit2WavFast
    from ddsp_svc_tpu.ops.mel import LogMelSpectrogram
    from ddsp_svc_tpu.models.vocoder import Vocoder

    SR, HOP, WIN, N_UNIT, M = bs.SR, bs.HOP, bs.WIN, bs.N_UNIT, bs.M
    B, seconds = 16, 5.0
    bucket = int(seconds * SR) // HOP + 1
    voc_dtype = jnp.bfloat16 if "--voc_bf16" in sys.argv else None
    pipeline = bs.make_diffusion_serving_pipeline(
        device_f0=True, vocoder_bf16=voc_dtype is not None)
    model = pipeline.model
    variables = pipeline.variables
    enc = pipeline.units_encoder
    batcher = pipeline.enable_batching(
        buckets=(bucket,), max_batch=B, max_wait_ms=30.0,
        transfer="mulaw", transfer_in="f16", device_stage=True,
        pipeline_depth=1, batch_encoder=True, audio_in="i16",
        k_step=100, speedup=10, method="dpm-solver",
    )
    audio_len = bucket * HOP

    # (a) enc fused front-end at B rows
    ef = pipeline.enc_batcher._fn(audio_len, SR, HOP)
    enc_args = (enc.variables,
                jnp.zeros((B, audio_len), jnp.int16),
                jnp.full((B,), audio_len - HOP, jnp.int32),
                jnp.zeros((B, bucket), jnp.int32),
                jnp.zeros((B,), jnp.float32),
                jnp.full((B,), bucket, jnp.int32))
    t_enc = timeit(lambda: ef(*enc_args))
    print(f"enc fused fn B={B}: min {t_enc[0]*1e3:.0f} ms "
          f"median {t_enc[1]*1e3:.0f} ms", flush=True)

    # (b) the serving vmap(single) graph
    sig = next(iter(pipeline._batch_sigs))
    sf = batcher._fn(bucket, sig)
    rng = np.random.default_rng(0)
    units = jnp.asarray(rng.standard_normal((B, bucket, N_UNIT))
                        .astype(np.float32))
    f0 = jnp.asarray(220.0 * np.ones((B, bucket, 1), np.float32))
    vol = jnp.asarray(0.5 * np.ones((B, bucket, 1), np.float32))
    spk = jnp.ones((B, 1), jnp.int32)
    keys = jnp.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(B)])
    tfr = jnp.full((B,), bucket, jnp.int32)
    t_vmap = timeit(lambda: sf(batcher.params, units, f0, vol, spk, keys,
                               tfr))
    print(f"serving vmap graph B={B}: min {t_vmap[0]*1e3:.0f} ms "
          f"median {t_vmap[1]*1e3:.0f} ms", flush=True)

    # (c) direct batched apply (e2e-style): one key, native batch dims
    mel_x = LogMelSpectrogram(sr=SR, n_mels=M, n_fft=2048, win_size=2048,
                              hop_length=HOP, fmin=40.0, fmax=16000.0)
    with bs._cpu():
        voc = Vocoder("nsf-hifigan", dtype=voc_dtype)
    voc.params = bs._put(voc.params)

    @jax.jit
    def direct(params, voc_params, key, units, f0, vol, spk):
        mel = model.apply(
            {"params": params["model"]}, units, f0, vol, spk_id=spk,
            mel_extract_fn=mel_x.extract, infer=True, key=key,
            rngs={"noise": key}, k_step=100, infer_speedup=10,
            sampler="dpm-solver",
        )
        return voc.model.apply({"params": voc_params}, mel, f0[..., 0],
                               key=key)

    t_dir = timeit(lambda: direct(
        {"model": variables["params"], "vocoder": None}, voc.params,
        jax.random.PRNGKey(0), units, f0, vol, spk))
    print(f"direct batched graph B={B}: min {t_dir[0]*1e3:.0f} ms "
          f"median {t_dir[1]*1e3:.0f} ms", flush=True)
    audio_s = B * seconds
    for name, t in (("enc", t_enc), ("vmap", t_vmap), ("direct", t_dir)):
        print(f"  {name}: {audio_s/t[0]:.0f}x best / {audio_s/t[1]:.0f}x med",
              flush=True)
    batcher.close()
    pipeline.enc_batcher.close()


if __name__ == "__main__":
    main()
