"""Micro-probe for the fused conformer-layer kernel vs the stock XLA
chain at production trunk sizes (B=8, T=861, C=512, Hc=128, k=31), both
dtypes, several block sizes. In-graph scalar reduction timing (the r4
clean-measurement rule).

Usage: /opt/venv/bin/python scripts/probe_conformer_kernel.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ddsp_svc_tpu.cli.common import enable_compile_cache
from ddsp_svc_tpu.ops.pallas_conformer import (
    _stock_layer,
    fused_conformer_layer,
)

enable_compile_cache()


def sync(x):
    jax.effects_barrier()
    for _ in range(10):
        try:
            return float(x)
        except Exception:
            time.sleep(2)
            jax.effects_barrier()
    return float(x)


def bench(fn, args, iters=30):
    jfn = jax.jit(fn)  # ONE wrapper: a per-iteration jax.jit() retraces
    out = jfn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    b, t, c, hc, k = 8, 861, 512, 128, 31
    inner = 2 * c
    rng = np.random.default_rng(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.standard_normal((b, t, c)), dtype)
        cond = jnp.asarray(rng.standard_normal((b, t, hc)), dtype)
        sv = jnp.asarray(rng.standard_normal((b, c)), dtype)
        w = tuple(jnp.asarray(a, dtype) for a in (
            rng.standard_normal((hc, c)) * 0.1,
            rng.standard_normal((c,)) * 0.1,
            rng.standard_normal((c, 2 * inner)) * 0.05,
            rng.standard_normal((2 * inner,)) * 0.1,
            rng.standard_normal((k, inner)) * 0.2,
            rng.standard_normal((inner,)) * 0.1,
            rng.standard_normal((inner, c)) * 0.05,
            rng.standard_normal((c,)) * 0.1,
        ))
        ms = bench(lambda x_, c_, s_: jnp.sum(jnp.abs(
            _stock_layer(x_, c_, s_, w))), (x, cond, sv))
        print(f"stock  {jnp.dtype(dtype).name}: {ms:7.3f} ms", flush=True)
        for bl in (128, 256, 512, 896):
            try:
                ms = bench(lambda x_, c_, s_, _bl=bl: jnp.sum(jnp.abs(
                    fused_conformer_layer(x_, c_, s_, w, block_rows=_bl))),
                    (x, cond, sv))
                print(f"fused  {jnp.dtype(dtype).name} bl={bl}: {ms:7.3f} ms",
                      flush=True)
            except Exception as e:
                print(f"fused  {jnp.dtype(dtype).name} bl={bl}: FAILED "
                      f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__" and "--trunk" not in sys.argv:
    main()


def trunk_probe():
    """The REAL object: the 6-layer NaiveV2Diff denoiser (B=8, T=861,
    production dims) as one jit, stock vs fused — in-context XLA can
    pipeline across layers, which the single-layer probe can't see."""
    from ddsp_svc_tpu.models.naive_v2_diff import NaiveV2Diff

    b, t, m, hc = 8, 861, 128, 128
    rng = np.random.default_rng(1)
    spec = jnp.asarray(rng.standard_normal((b, t, m)), jnp.float32)
    step = jnp.asarray(rng.uniform(0, 100, (b,)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, t, hc)), jnp.float32)
    kw = dict(mel_channels=m, dim=512, use_mlp=False, condition_dim=hc,
              num_layers=6)
    stock = NaiveV2Diff(**kw)
    params = jax.jit(stock.init)(jax.random.PRNGKey(0), spec, step, cond)
    for label, mod in (
        ("stock", stock),
        ("fused bl256", NaiveV2Diff(**kw, use_pallas=True)),
        ("fused bl512", NaiveV2Diff(**kw, use_pallas=True,
                                    pallas_block_rows=512)),
        ("fused exact", NaiveV2Diff(**kw, use_pallas=True,
                                    pallas_mxu_bf16=False)),
    ):
        ms = bench(lambda p, s_, st, c_, _m=mod: jnp.sum(jnp.abs(
            _m.apply(p, s_, st, c_))), (params, spec, step, cond))
        print(f"trunk6 {label}: {ms:7.3f} ms", flush=True)


if __name__ == "__main__" and "--trunk" in sys.argv:
    trunk_probe()
