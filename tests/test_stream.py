"""Streamed-blocks vs whole-utterance consistency (BASELINE contract).

Covers parallel/stream.py: ppermute frame/sample halos, exact int-quantized
phase carries, psum GroupNorm stats, edge-mask padding semantics, blocked
STFT/iSTFT overlap-add.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ddsp_svc_tpu.models.ddsp import CombSubSuperFast
from ddsp_svc_tpu.ops.source import (
    carry_from_increments_q,
    fast_source_gen,
    frame_phase_increments_q,
)
from ddsp_svc_tpu.parallel.stream import (
    blocked_noise,
    streamed_combsub_forward,
    whole_utterance_reference,
)


def make_inputs(b, t, n_unit, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    units = jax.random.normal(k1, (b, t, n_unit), jnp.float32)
    f0 = 200.0 * jnp.exp(0.3 * jnp.sin(jnp.arange(t) / 7.0))[None, :, None]
    f0 = jnp.broadcast_to(f0, (b, t, 1)).astype(jnp.float32)
    volume = 0.5 * jnp.ones((b, t, 1), jnp.float32)
    return units, f0, volume, k2


class TestExactPhaseCarry:
    def test_blocked_prefix_bit_identical(self):
        """Int-quantized carries: whole cumsum == per-block prefix, exactly."""
        _, f0, _, _ = make_inputs(2, 128, 8)
        sr, hop = 16000, 64
        q = frame_phase_increments_q(f0, sr, hop)
        whole = carry_from_increments_q(q)

        n_blocks, tb = 4, 32
        outs = []
        for i in range(n_blocks):
            qb = q[:, i * tb : (i + 1) * tb]
            offset = jnp.sum(q[:, : i * tb], axis=1, keepdims=True)
            acc = jnp.cumsum(qb, axis=1)
            carry_q = jnp.pad(acc[:, :-1, :], ((0, 0), (1, 0), (0, 0))) + offset
            from ddsp_svc_tpu.ops.source import _dequantize_carry

            outs.append(_dequantize_carry(carry_q))
        blocked = jnp.concatenate(outs, axis=1)
        assert (np.asarray(whole) == np.asarray(blocked)).all()

    def test_carry_offset_shifts_source(self):
        _, f0, _, _ = make_inputs(1, 64, 8)
        sr, hop = 16000, 64
        whole_c, whole_p = fast_source_gen(f0, sr, hop)
        q = frame_phase_increments_q(f0, sr, hop)
        # second half with the exact prefix offset == whole's second half
        offset = jnp.sum(q[:, :32], axis=1, keepdims=True)
        half_c, half_p = fast_source_gen(f0[:, 32:], sr, hop, carry_offset_q=offset)
        np.testing.assert_array_equal(
            np.asarray(whole_c[:, 32 * hop :]), np.asarray(half_c)
        )
        np.testing.assert_array_equal(
            np.asarray(whole_p[:, 32:]), np.asarray(half_p)
        )


class TestBlockedNoise:
    def test_blocking_invariant(self):
        key = jax.random.PRNGKey(3)
        whole = blocked_noise(key, 2, 16, 32)
        keys = jax.random.split(key, 16)
        parts = []
        for i in range(0, 16, 4):
            sub = jax.vmap(lambda k: jax.random.normal(k, (2, 32), jnp.float32))(
                keys[i : i + 4]
            )
            parts.append(sub.transpose(1, 0, 2).reshape(2, -1))
        np.testing.assert_array_equal(
            np.asarray(whole), np.asarray(jnp.concatenate(parts, axis=1))
        )


class TestStreamedForward:
    @pytest.fixture(scope="class")
    def setup(self):
        b, t, n_unit = 2, 192, 32
        model = CombSubSuperFast(
            sampling_rate=16000, block_size=64, win_length=256,
            n_unit=n_unit, n_spk=1,
        )
        units, f0, volume, key = make_inputs(b, t, n_unit)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            units, f0, volume,
        )
        return model, variables, units, f0, volume, key

    def test_streamed_matches_whole(self, setup):
        model, variables, units, f0, volume, key = setup
        whole = np.asarray(
            whole_utterance_reference(model, variables, units, f0, volume, key)
        )
        mesh = Mesh(np.array(jax.devices()[:4]), ("time",))
        streamed = np.asarray(
            streamed_combsub_forward(
                model, variables, units, f0, volume, key, mesh=mesh
            )
        )
        assert streamed.shape == whole.shape
        denom = np.abs(whole).max()
        err = np.abs(streamed - whole).max() / denom
        assert err < 1e-6, f"relative error {err}"

    @pytest.mark.slow
    def test_device_count_invariance(self, setup):
        """Output must not depend on how many devices shard the time axis."""
        model, variables, units, f0, volume, key = setup
        outs = []
        for n in (2, 4):
            mesh = Mesh(np.array(jax.devices()[:n]), ("time",))
            outs.append(
                np.asarray(
                    streamed_combsub_forward(
                        model, variables, units, f0, volume, key, mesh=mesh
                    )
                )
            )
        denom = np.abs(outs[0]).max()
        err = np.abs(outs[0] - outs[1]).max() / denom
        assert err < 1e-6, f"relative error {err}"


def test_jitted_driver_cache_is_bounded(monkeypatch):
    """stream_core._cached_jit is a bounded LRU (VERDICT r2 weak #6): a
    process sweeping many (model, shape) keys must not grow executables
    without limit, and reuse must refresh recency."""
    from ddsp_svc_tpu.parallel import stream_core

    monkeypatch.setattr(stream_core, "_JITTED_MAX", 4)
    monkeypatch.setattr(stream_core, "_JITTED", type(stream_core._JITTED)())

    def make(i):
        return lambda: (lambda x: x + i)

    for i in range(6):
        stream_core._cached_jit(("k", i), make(i))
    assert len(stream_core._JITTED) == 4
    assert ("k", 0) not in stream_core._JITTED  # oldest evicted
    # touch ("k", 2), then insert: ("k", 3) becomes the eviction victim
    stream_core._cached_jit(("k", 2), make(2))
    stream_core._cached_jit(("k", 9), make(9))
    assert ("k", 2) in stream_core._JITTED
    assert ("k", 3) not in stream_core._JITTED
