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


class StubUnitsEncoderFused(StubUnitsEncoder):
    """Stub with the fused-path contract (make_encode_fn, like the real
    UnitsEncoder): per-frame std on the n_frames = len//hop + 1 grid, so
    SvcPipeline's single-dispatch direct paths (fuse_encoder) are
    exercised. encode() matches the fused grid for shape consistency."""

    variables = None

    def encode(self, audio, sample_rate, hop):
        return self.make_encode_fn(sample_rate, hop, audio.shape[-1])(
            None, jnp.asarray(audio)
        )

    def make_encode_fn(self, sample_rate: int, hop_size: int, audio_len: int):
        n_frames = audio_len // hop_size + 1
        n_unit, ramp = self.n_unit, self.channel_ramp

        def fn(variables, audio):
            pad = jnp.pad(
                audio, ((0, 0), (0, n_frames * hop_size - audio_len))
            )
            frames = pad[0].reshape(n_frames, hop_size)
            units = jnp.tile(frames.std(axis=1, keepdims=True), (1, n_unit))
            if ramp:
                units = units * jnp.linspace(0.5, 1.5, n_unit)
            return units[None].astype(jnp.float32)

        return fn
