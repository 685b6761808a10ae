"""Pallas harmonic-bank kernel vs the jnp reference path."""
import numpy as np

import jax
import jax.numpy as jnp

from ddsp_svc_tpu.models.ddsp import sins_harmonic_bank
from ddsp_svc_tpu.ops.pallas_oscillator import harmonic_bank_pallas
from ddsp_svc_tpu.ops.source import cumsum_phase_source


def test_matches_reference_bank():
    b, t, block, n_harm = 2, 13, 64, 24  # odd row count exercises padding
    key = jax.random.PRNGKey(0)
    f0 = 150.0 * jnp.exp(0.3 * jax.random.normal(key, (b, t, 1)))
    f0_up = jnp.repeat(f0, block, axis=1)
    x = cumsum_phase_source(f0_up, 16000, block)
    amps = jax.nn.softplus(jax.random.normal(key, (b, t, n_harm))) * 0.05

    ref = sins_harmonic_bank(2.0 * np.pi * x, amps, block)
    pal = harmonic_bank_pallas(x, amps, block, interpret=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=3e-5)
