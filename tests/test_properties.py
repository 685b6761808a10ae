"""Property-based tests (hypothesis) for the core DSP ops."""
import numpy as np
from hypothesis import given, settings, strategies as st

import jax
import jax.numpy as jnp

SETTINGS = dict(max_examples=20, deadline=None)


@given(
    n_frames=st.integers(4, 24),
    hop_pow=st.integers(3, 6),
    seed=st.integers(0, 1000),
)
@settings(**SETTINGS)
def test_stft_istft_roundtrip(n_frames, hop_pow, seed):
    """istft(stft(x)) == x for hop = win/4 (the model regime)."""
    from ddsp_svc_tpu.ops.spectral import istft, stft
    from ddsp_svc_tpu.ops.window import hann_window

    hop = 2 ** hop_pow
    win = 4 * hop
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((1, n_frames * hop)).astype(np.float32)
    w = jnp.asarray(hann_window(win))
    y = istft(stft(jnp.asarray(x), win, hop, window=w), win, hop, window=w)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-5)


@given(
    n_frames=st.integers(2, 12),
    r=st.integers(2, 6),
    hop=st.sampled_from([8, 16, 32]),
    seed=st.integers(0, 1000),
)
@settings(**SETTINGS)
def test_overlap_add_matches_naive(n_frames, r, hop, seed):
    """The shifted-sum OLA equals a naive python scatter-add."""
    from ddsp_svc_tpu.ops.spectral import overlap_add

    rng = np.random.default_rng(seed)
    frames = rng.standard_normal((1, n_frames, r * hop)).astype(np.float32)
    got = np.asarray(overlap_add(jnp.asarray(frames), hop))
    expected = np.zeros((1, (n_frames - 1) * hop + r * hop), np.float32)
    for t in range(n_frames):
        expected[0, t * hop : t * hop + r * hop] += frames[0, t]
    np.testing.assert_allclose(got, expected, atol=1e-5)


@given(
    t=st.integers(2, 20),
    factor=st.sampled_from([2, 4, 8, 16]),
    seed=st.integers(0, 1000),
)
@settings(**SETTINGS)
def test_upsample_endpoints_and_monotone(t, factor, seed):
    """Linear upsampling hits the frame values exactly at frame starts and
    stays within the local min/max between adjacent frames."""
    from ddsp_svc_tpu.ops.interp import upsample

    rng = np.random.default_rng(seed)
    sig = rng.standard_normal((1, t, 1)).astype(np.float32)
    up = np.asarray(upsample(jnp.asarray(sig), factor))
    np.testing.assert_allclose(up[0, ::factor, 0], sig[0, :, 0], atol=1e-6)
    for i in range(t - 1):
        seg = up[0, i * factor : (i + 1) * factor + 1, 0]
        lo, hi = min(sig[0, i, 0], sig[0, i + 1, 0]), max(sig[0, i, 0], sig[0, i + 1, 0])
        assert seg.min() >= lo - 1e-5 and seg.max() <= hi + 1e-5


@given(
    t=st.integers(4, 64),
    split=st.integers(1, 63),
    seed=st.integers(0, 1000),
)
@settings(**SETTINGS)
def test_phase_carry_split_invariance(t, split, seed):
    """Int-quantized phase carries are identical for ANY split point."""
    from ddsp_svc_tpu.ops.source import (
        carry_from_increments_q,
        frame_phase_increments_q,
    )

    split = min(split, t - 1)
    rng = np.random.default_rng(seed)
    f0 = (50 + 900 * rng.random((1, t, 1))).astype(np.float32)
    q = frame_phase_increments_q(jnp.asarray(f0), 44100, 512)
    whole = np.asarray(carry_from_increments_q(q))
    left = carry_from_increments_q(q[:, :split])
    offset = jnp.sum(q[:, :split], axis=1, keepdims=True)
    acc = jnp.cumsum(q[:, split:], axis=1)
    carry_q = jnp.pad(acc[:, :-1, :], ((0, 0), (1, 0), (0, 0))) + offset
    from ddsp_svc_tpu.ops.source import _dequantize_carry

    right = _dequantize_carry(carry_q)
    blocked = np.concatenate([np.asarray(left), np.asarray(right)], axis=1)
    np.testing.assert_array_equal(whole, blocked)
