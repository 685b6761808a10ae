"""Shape/sanity tests for the DDSP synthesizer model zoo."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ddsp_svc_tpu.models.ddsp import Sins, CombSub, CombSubFast, CombSubSuperFast

B, T, UNIT = 2, 20, 768
SR, BLOCK, WIN = 44100, 512, 2048


def _inputs(n_unit=UNIT, seed=0):
    rng = np.random.default_rng(seed)
    units = jnp.asarray(rng.standard_normal((B, T, n_unit)).astype(np.float32))
    f0 = jnp.asarray((220 + 100 * rng.random((B, T, 1))).astype(np.float32))
    vol = jnp.asarray(rng.random((B, T, 1)).astype(np.float32) * 0.5)
    spk = jnp.zeros((B, 1), jnp.int32) + 1
    return units, f0, vol, spk


def _run(model, **kw):
    units, f0, vol, spk = _inputs()
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    variables = model.init(rngs, units, f0, vol, spk_id=spk, **kw)
    signal, hidden, _ = model.apply(
        variables, units, f0, vol, spk_id=spk, rngs={"noise": jax.random.PRNGKey(2)}, **kw
    )
    return signal, hidden


def test_combsub_superfast_shapes():
    model = CombSubSuperFast(SR, BLOCK, WIN, n_unit=UNIT, n_spk=2)
    signal, hidden = _run(model)
    assert signal.shape == (B, T * BLOCK)
    assert hidden.shape == (B, T, 256)
    assert np.isfinite(np.asarray(signal)).all()
    assert float(jnp.abs(signal).max()) > 0


def test_combsub_fast_shapes():
    model = CombSubFast(SR, BLOCK, n_unit=UNIT, n_spk=1)
    signal, hidden = _run(model)
    assert signal.shape == (B, T * BLOCK)
    assert hidden.shape == (B, T, 256)
    assert np.isfinite(np.asarray(signal)).all()


def test_sins_shapes():
    model = Sins(SR, BLOCK, n_harmonics=64, n_mag_allpass=128, n_mag_noise=80,
                 n_unit=UNIT, n_spk=1)
    signal, hidden = _run(model)
    assert signal.shape == (B, T * BLOCK)
    assert np.isfinite(np.asarray(signal)).all()


def test_combsub_old_shapes():
    model = CombSub(SR, BLOCK, n_mag_allpass=128, n_mag_harmonic=256, n_mag_noise=80,
                    n_unit=UNIT, n_spk=1)
    signal, hidden = _run(model)
    assert signal.shape == (B, T * BLOCK)
    assert np.isfinite(np.asarray(signal)).all()


def test_combsub_superfast_jit_and_grad():
    model = CombSubSuperFast(SR, BLOCK, WIN, n_unit=UNIT, n_spk=1)
    units, f0, vol, spk = _inputs()
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    variables = model.init(rngs, units, f0, vol, spk_id=spk)

    @jax.jit
    def loss_fn(params, key):
        out, _, _ = model.apply(
            {"params": params}, units, f0, vol, spk_id=spk, rngs={"noise": key}
        )
        return jnp.mean(out**2)

    g = jax.grad(loss_fn)(variables["params"], jax.random.PRNGKey(3))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_spk_mix_matches_single_speaker():
    model = CombSubSuperFast(SR, BLOCK, WIN, n_unit=UNIT, n_spk=4)
    units, f0, vol, spk = _inputs()
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    variables = model.init(rngs, units, f0, vol, spk_id=spk)
    nkey = {"noise": jax.random.PRNGKey(7)}
    out_id, _, _ = model.apply(variables, units, f0, vol, spk_id=spk, rngs=nkey)
    out_mix, _, _ = model.apply(
        variables, units, f0, vol, spk_mix_dict={1: 1.0}, rngs=nkey
    )
    np.testing.assert_allclose(np.asarray(out_id), np.asarray(out_mix), atol=1e-5)
