"""Fused NaiveV2Diff conformer-layer kernel (ops/pallas_conformer.py):
interpret-mode equality vs the stock jnp chain, edge zero-padding parity,
gradient path, and the module-level wiring."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddsp_svc_tpu.ops.pallas_conformer import (
    _stock_layer,
    fused_conformer_layer,
)


def _mk(b=2, t=40, c=128, hc=32, k=7, seed=0):
    rng = np.random.default_rng(seed)
    inner = 2 * c
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    cond = rng.standard_normal((b, t, hc)).astype(np.float32)
    sv = rng.standard_normal((b, c)).astype(np.float32)
    w = (
        rng.standard_normal((hc, c)).astype(np.float32) * 0.1,
        rng.standard_normal((c,)).astype(np.float32) * 0.1,
        rng.standard_normal((c, 2 * inner)).astype(np.float32) * 0.05,
        rng.standard_normal((2 * inner,)).astype(np.float32) * 0.1,
        rng.standard_normal((k, inner)).astype(np.float32) * 0.2,
        rng.standard_normal((inner,)).astype(np.float32) * 0.1,
        rng.standard_normal((inner, c)).astype(np.float32) * 0.05,
        rng.standard_normal((c,)).astype(np.float32) * 0.1,
    )
    return (jnp.asarray(x), jnp.asarray(cond), jnp.asarray(sv),
            tuple(jnp.asarray(a) for a in w))


@pytest.mark.parametrize("t,block_rows", [(40, 16), (64, 32), (33, 16)])
def test_fused_matches_stock_interpret(t, block_rows):
    """Every (T, block) geometry incl. a ragged tail block: fused ==
    stock to f32 reduction noise, edges included (utterance zero-pad
    parity)."""
    x, cond, sv, w = _mk(t=t)
    want = _stock_layer(x, cond, sv, w)
    got = fused_conformer_layer(x, cond, sv, w, block_rows=block_rows,
                                interpret=True, mxu_bf16=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_grad_matches_stock():
    """The custom VJP differentiates the identical stock chain."""
    x, cond, sv, w = _mk(t=24, c=128, hc=32, k=7)

    def loss_fused(x_, sv_):
        return jnp.sum(fused_conformer_layer(
            x_, cond, sv_, w, block_rows=16, interpret=True,
            mxu_bf16=False) ** 2)

    def loss_stock(x_, sv_):
        return jnp.sum(_stock_layer(x_, cond, sv_, w) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, sv)
    gs = jax.grad(loss_stock, argnums=(0, 1))(x, sv)
    for a, b in zip(gf, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_module_fused_path_matches_stock():
    """NaiveV2Diff(use_pallas=True) == the stock module forward: identical
    params either way (the fold_only accessor declares the same tree)."""
    from ddsp_svc_tpu.models.naive_v2_diff import NaiveV2Diff

    b, t, m, dim, hc = 2, 40, 16, 128, 16
    rng = np.random.default_rng(3)
    spec = jnp.asarray(rng.standard_normal((b, t, m)), jnp.float32)
    step = jnp.asarray(rng.uniform(0, 100, (b,)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, t, hc)), jnp.float32)

    kw = dict(mel_channels=m, dim=dim, use_mlp=False, condition_dim=hc,
              num_layers=2, kernel_size=7)
    stock = NaiveV2Diff(**kw)
    fused = NaiveV2Diff(**kw, use_pallas=True, pallas_interpret=True,
                        pallas_block_rows=16, pallas_mxu_bf16=False)
    params = stock.init(jax.random.PRNGKey(0), spec, step, cond)
    # identical param trees: the fused path must restore stock checkpoints
    params_f = fused.init(jax.random.PRNGKey(0), spec, step, cond)
    assert jax.tree.structure(params) == jax.tree.structure(params_f)

    want = stock.apply(params, spec, step, cond)
    got = fused.apply(params, spec, step, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_fused_mxu_bf16_quality_class():
    """The default bf16-MXU-pass mode (the stock convs' default-precision
    class on TPU) stays within bf16 rounding of the exact chain."""
    x, cond, sv, w = _mk(t=48, c=128, hc=32, k=7, seed=9)
    exact = fused_conformer_layer(x, cond, sv, w, block_rows=16,
                                  interpret=True, mxu_bf16=False)
    fast = fused_conformer_layer(x, cond, sv, w, block_rows=16,
                                 interpret=True, mxu_bf16=True)
    snr = 10 * np.log10(float(jnp.sum(exact ** 2))
                        / max(float(jnp.sum((fast - exact) ** 2)), 1e-20))
    assert snr > 35.0, snr
