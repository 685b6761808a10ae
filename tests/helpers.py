"""Shared test helpers (imported as `helpers` — pytest's prepend import
mode puts the test dir on sys.path)."""
import numpy as np

import jax.numpy as jnp


class StubUnitsEncoder:
    """Deterministic tiny stand-in for UnitsEncoder: per-frame RMS tiled to
    n_unit channels (optionally scaled across channels)."""

    def __init__(self, n_unit: int, channel_ramp: bool = False):
        self.n_unit = n_unit
        self.channel_ramp = channel_ramp

    def encode(self, audio, sample_rate, hop):
        t = audio.shape[-1] // hop
        frames = np.asarray(audio)[0, : t * hop].reshape(t, hop)
        base = jnp.asarray(frames.std(axis=1, keepdims=True), jnp.float32)
        units = jnp.tile(base, (1, self.n_unit))[None]
        if self.channel_ramp:
            units = units * jnp.linspace(0.5, 1.5, self.n_unit)
        return units
