"""Pallas combtooth kernel vs the reference jnp implementation
(interpret mode on CPU; the same kernel compiles for TPU)."""
import numpy as np

import jax
import jax.numpy as jnp

from ddsp_svc_tpu.ops.pallas_source import combtooth_pallas
from ddsp_svc_tpu.ops.source import fast_source_gen


def test_matches_fast_source_gen():
    key = jax.random.PRNGKey(0)
    b, t, block, sr = 2, 37, 64, 16000  # t chosen to need row padding
    f0 = 150.0 * jnp.exp(0.4 * jax.random.normal(key, (b, t, 1)))
    ref_comb, ref_phase = fast_source_gen(f0, sr, block)
    pal_comb, pal_phase = combtooth_pallas(f0, sr, block, interpret=True)
    # elementwise fusion order differs slightly between the XLA and Pallas
    # lowerings of the phase ramp; bound is well below audibility (-90 dB)
    np.testing.assert_allclose(
        np.asarray(pal_comb), np.asarray(ref_comb), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(pal_phase), np.asarray(ref_phase), atol=5e-5
    )


def test_carry_offset():
    b, t, block, sr = 1, 16, 32, 16000
    f0 = 220.0 * jnp.ones((b, t, 1))
    from ddsp_svc_tpu.ops.source import frame_phase_increments_q

    q = frame_phase_increments_q(f0, sr, block)
    offset = jnp.sum(q[:, :8], axis=1, keepdims=True)
    whole, _ = combtooth_pallas(f0, sr, block, interpret=True)
    half, _ = combtooth_pallas(
        f0[:, 8:], sr, block, carry_offset_q=offset, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(whole[:, 8 * block :]), np.asarray(half), atol=2e-6
    )
