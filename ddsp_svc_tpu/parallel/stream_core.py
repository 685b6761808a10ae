"""Shared toolkit for the streamed (overlap-save) synthesis drivers.

Halo exchange, blocking-invariant noise, exact int32 phase-carry prefix
sums, and the bounded jitted-driver cache used by every per-family driver
(stream_combsub / stream_legacy / stream_cascade / stream_vocoder).
Split out of the former parallel/stream.py monolith (VERDICT r2 weak #6);
the public entry points still live in parallel/stream.py.
"""
from __future__ import annotations

from collections import OrderedDict

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.spectral import frame_signal
from ..ops.window import hann_window

FRAME_HALO = 48  # conv stack (2) + 3 conformer layers (15 each) + margin
DENOISER_HALO = 96  # NaiveV2Diff: 6 conv layers x (k=31)//2 = 90 + margin
WAVENET_HALO = 24  # 20 layers x k=3 d=1 -> 20 frames + margin

# jitted-driver cache: the streamed/whole entry points close over static
# configuration (model, mesh, shapes, sampler kwargs), so each distinct key
# compiles ONE executable instead of dispatching the whole graph eagerly
# op-by-op (~1000 tiny compiles per call on a fresh process). Keys hold
# flax modules (hashable dataclasses), Mesh, shapes. Bounded LRU: a process
# that sweeps many (model, shape) combinations (tests, long-lived servers)
# must not grow device-memory-holding executables without limit.
_JITTED_MAX = 64
_JITTED: OrderedDict = OrderedDict()


def _cached_jit(key, make_fn):
    fn = _JITTED.get(key)
    if fn is None:
        fn = jax.jit(make_fn())
        _JITTED[key] = fn
        while len(_JITTED) > _JITTED_MAX:
            _JITTED.popitem(last=False)
    else:
        _JITTED.move_to_end(key)
    return fn

def blocked_noise(key: jax.Array, batch: int, n_frames: int, hop: int) -> jnp.ndarray:
    """(B, n_frames*hop) unit normal drawn per hop-block from split keys —
    identical values under any time-blocking."""
    keys = jax.random.split(key, n_frames)

    def one(k):
        return jax.random.normal(k, (batch, hop), jnp.float32)

    blocks = jax.vmap(one)(keys)  # (T, B, hop)
    return blocks.transpose(1, 0, 2).reshape(batch, n_frames * hop)


def _frame_halo(x, h_left, h_right, axis, d, n_dev, edge_value=0.0):
    """Exchange h frames with ring neighbors along ``axis`` (frame axis 1).

    Global-edge halos (device 0 left / device D-1 right) are filled with
    ``edge_value`` (scalar) or edge-replication when edge_value is None.
    """
    parts = []
    if h_left:
        left = lax.ppermute(
            x[:, -h_left:], axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
        )
        if edge_value is None:
            fill = jnp.repeat(x[:, :1], h_left, axis=1)
        else:
            fill = jnp.full_like(left, edge_value)
        parts.append(jnp.where(d == 0, fill, left))
    parts.append(x)
    if h_right:
        right = lax.ppermute(
            x[:, :h_right], axis, [(i, (i - 1) % n_dev) for i in range(n_dev)]
        )
        if edge_value is None:
            fill = jnp.repeat(x[:, -1:], h_right, axis=1)
        else:
            fill = jnp.full_like(right, edge_value)
        parts.append(jnp.where(d == n_dev - 1, fill, right))
    return jnp.concatenate(parts, axis=1)


def _sample_halo_reflect(x, hs, axis, d, n_dev):
    """Sample-level halo with torch-reflect fill at the global edges
    (emulates torch.stft center=True padding). x: (B, L_local)."""
    left = lax.ppermute(
        x[:, -hs:], axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
    )
    right = lax.ppermute(
        x[:, :hs], axis, [(i, (i - 1) % n_dev) for i in range(n_dev)]
    )
    left_reflect = x[:, 1 : hs + 1][:, ::-1]
    right_reflect = x[:, -hs - 1 : -1][:, ::-1]
    left = jnp.where(d == 0, left_reflect, left)
    right = jnp.where(d == n_dev - 1, right_reflect, right)
    return jnp.concatenate([left, x, right], axis=1)


def blocked_noise_frames(
    key: jax.Array, batch: int, n_frames: int, dim: int
) -> jnp.ndarray:
    """(B, n_frames, dim) unit normal drawn per frame from split keys."""
    keys = jax.random.split(key, n_frames)
    blocks = jax.vmap(lambda k: jax.random.normal(k, (batch, dim), jnp.float32))(
        keys
    )  # (T, B, dim)
    return blocks.transpose(1, 0, 2)


def _carry_prefix_offset(q_own, q_left, axis, d, n_dev):
    """Exact phase-carry offset for a haloed block: sum of every previous
    device's own int32 increments (all_gather + masked prefix — integer
    arithmetic is associative, so this is blocking-invariant) minus this
    block's left-halo increments. q_own: (B, tb, 1); q_left: (B, h, 1)."""
    s_own = jnp.sum(q_own, axis=1, keepdims=True)  # (B,1,1) int32
    gathered = lax.all_gather(s_own, axis)  # (D, B, 1, 1)
    dev_mask = (jnp.arange(n_dev) < d).astype(jnp.int32)
    prefix = jnp.tensordot(dev_mask, gathered, axes=(0, 0))  # (B,1,1)
    return prefix - jnp.sum(q_left, axis=1, keepdims=True)


def blocked_uniform(key: jax.Array, batch: int, n_frames: int, hop: int) -> jnp.ndarray:
    """(B, n_frames*hop) uniform(-1,1) drawn per hop-block from split keys."""
    keys = jax.random.split(key, n_frames)
    blocks = jax.vmap(
        lambda k: jax.random.uniform(k, (batch, hop), jnp.float32) * 2.0 - 1.0
    )(keys)
    return blocks.transpose(1, 0, 2).reshape(batch, n_frames * hop)


def _blocked_logmel(audio_own, mel, axis, d, n_dev, tb):
    """Per-device log-mel on sample-haloed audio, matching
    ops/mel.LogMelSpectrogram.extract frame-for-frame.

    audio_own: (B, tb*hop) -> (B, tb, M).
    """
    w, h = mel.win_size, mel.hop_length
    pad_left = (w - h) // 2
    h2 = pad_left + h  # halo; first wanted window starts at ext[h]
    assert h2 >= w - h - pad_left, "halo too small for mel framing"
    ext = _sample_halo_reflect(audio_own, h2, axis, d, n_dev)
    window = jnp.asarray(hann_window(w))
    frames = frame_signal(ext, w, h)[:, 1 : 1 + tb] * window
    spec = jnp.fft.rfft(frames, w, axis=-1)
    mag = jnp.sqrt(spec.real**2 + spec.imag**2 + 1e-9)  # (B, tb, F)
    melspec = jnp.matmul(mag, mel.mel_basis.T)
    return jnp.log(jnp.clip(melspec, min=mel.clip_val))


# ---------------------------------------------------------------------------
# Streamed NSF-HiFiGAN vocoder: mel time blocks -> 44.1 kHz audio
# ---------------------------------------------------------------------------

VOCODER_HALO = 32  # mel frames; must exceed the Generator's receptive field


def _sine_noise_from_keys(keys, batch, upp, dim):
    """Per-frame keyed sine-source noise: (n, 2) keys -> (B, n*upp, dim)."""
    blocks = jax.vmap(
        lambda k: jax.random.normal(k, (batch, upp, dim), jnp.float32)
    )(keys)  # (n, B, upp, dim)
    n = blocks.shape[0]
    return blocks.transpose(1, 0, 2, 3).reshape(batch, n * upp, dim)


def _sine_rand_ini(key, dim):
    rand_ini = jax.random.uniform(key, (1, 1, dim), jnp.float32)
    return rand_ini.at[..., 0].set(0.0)


