"""Sequence-parallel streamed synthesis: overlap-save time blocks + ppermute
halo exchange, consistent with whole-utterance output.

This is the TPU-native replacement for the reference's sliding-window + SOLA
splicing (gui.py:393-456): instead of re-encoding a rolling context window
and hiding seams with cross-correlation splices, the utterance's time axis
is sharded over the mesh and every boundary quantity is exchanged explicitly
(SURVEY.md §2.9):

  - frame halos (48) for the Unit2Control conv stack + conv-only conformer
    (receptive field 47 frames), with ``edge_mask`` zeroing emulating the
    whole-utterance SAME-conv zero padding at the global edges;
  - GroupNorm statistics psum'd over the time axis (torch GroupNorm spans
    the whole sequence — see models/nn.py);
  - phase-accumulator carries as int32-quantized increments whose prefix
    sums are exactly associative, so blocked phases are bit-identical to the
    whole-utterance computation (ops/source.frame_phase_increments_q);
  - sample halos (3*hop + win/2) for the STFT/iSTFT overlap-add, with the
    global reflect padding (torch.stft center=True) reproduced at the edge
    devices;
  - noise generated per hop-block from split keys, so every device draws
    the identical samples the whole-utterance pass draws.

The consistency contract: interior arithmetic is identical op-for-op; the
only cross-device reductions (GroupNorm stats, int carries) are integer-
exact or differ from the single-device reduction only in float summation
order. ``tests/test_stream.py`` asserts whole-vs-blocked agreement.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..models.ddsp import CombSubSuperFast
from ..ops.source import fast_source_gen, frame_phase_increments_q
from ..ops.spectral import frame_signal, overlap_add
from ..ops.window import hann_window

FRAME_HALO = 48  # conv stack (2) + 3 conformer layers (15 each) + margin


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


def streamed_combsub_forward(
    model: CombSubSuperFast,
    variables,
    units: jnp.ndarray,  # (B, T, C)
    f0: jnp.ndarray,  # (B, T, 1)
    volume: jnp.ndarray,  # (B, T, 1)
    key: jax.Array,
    spk_id=None,
    mesh: Mesh | None = None,
    axis: str = "time",
) -> jnp.ndarray:
    """Time-sharded CombSubSuperFast synthesis over ``mesh[axis]`` devices.

    Returns (B, T*hop) audio matching
    ``model.apply(..., noise=blocked_noise(key, B, T, hop))``.
    """
    b, t, _ = units.shape
    hop, win = model.block_size, model.win_length
    n_dev = mesh.shape[axis]
    assert t % n_dev == 0, f"frames {t} not divisible by {n_dev} devices"
    tb = t // n_dev
    hf = FRAME_HALO
    hs = 3 * hop + win // 2  # sample halo: istft frame reach
    assert tb >= max(hf, 4) and tb * hop >= hs, (
        f"block of {tb} frames too small for halos (need >= {hf} frames and "
        f">= {hs} samples)"
    )
    window = jnp.asarray(hann_window(win))
    noise_keys = jax.random.split(key, t)  # (T, 2) uint32

    if spk_id is None:
        spk_id = jnp.ones((b, 1), jnp.int32)

    def block(variables, units_b, f0_b, vol_b, keys_b, spk_id_b):
        d = lax.axis_index(axis)

        # ---- control nets on frame-haloed inputs --------------------------
        f0_ext = _frame_halo(f0_b, hf, hf, axis, d, n_dev, edge_value=None)
        units_ext = _frame_halo(units_b, hf, hf, axis, d, n_dev, edge_value=0.0)
        vol_ext = _frame_halo(vol_b, hf, hf, axis, d, n_dev, edge_value=0.0)

        # exact phase carry: int32 increments, cross-device prefix
        q_ext = frame_phase_increments_q(f0_ext, model.sampling_rate, hop)
        q_own = q_ext[:, hf : hf + tb]
        s_own = jnp.sum(q_own, axis=1, keepdims=True)  # (B,1,1) int32
        gathered = lax.all_gather(s_own, axis)  # (D, B, 1, 1)
        dev_mask = (jnp.arange(n_dev) < d).astype(jnp.int32)
        prefix = jnp.tensordot(dev_mask, gathered, axes=(0, 0))  # (B,1,1)
        offset_ext = prefix - jnp.sum(q_ext[:, :hf], axis=1, keepdims=True)

        combtooth_ext, phase_ext = fast_source_gen(
            f0_ext, model.sampling_rate, hop, carry_offset_q=offset_ext
        )

        kg = jnp.arange(tb + 2 * hf) + d * tb - hf  # global frame index
        edge_mask = ((kg >= 0) & (kg < t)).astype(units_b.dtype)[None, :, None]
        frame_mask = jnp.zeros((tb + 2 * hf,), units_b.dtype)
        frame_mask = frame_mask.at[hf : hf + tb].set(1.0)[None, :, None]

        src_f_ext, noise_f_ext, hidden_ext = model.apply(
            variables,
            units_ext,
            f0_ext,
            phase_ext,
            vol_ext,
            spk_id=spk_id_b,
            frame_mask=jnp.broadcast_to(frame_mask, (b, tb + 2 * hf, 1)),
            stream_axis=axis,
            edge_mask=jnp.broadcast_to(edge_mask, (b, tb + 2 * hf, 1)),
            method=CombSubSuperFast.controls,
        )
        src_own = src_f_ext[:, hf : hf + tb]
        nf_own = noise_f_ext[:, hf : hf + tb]

        # ---- filters for stft frames [s-3, e+3] ---------------------------
        # (frame T uses the duplicated last filter, ddsp/vocoder.py:732)
        src_fr = _frame_halo(src_own, 3, 4, axis, d, n_dev, edge_value=None)
        nf_fr = _frame_halo(nf_own, 3, 4, axis, d, n_dev, edge_value=None)

        # ---- sources on sample-haloed blocks ------------------------------
        comb_own = combtooth_ext[:, hf * hop : (hf + tb) * hop]
        noise_blocks = jax.vmap(
            lambda k: jax.random.normal(k, (b, hop), jnp.float32)
        )(keys_b)
        noise_own = noise_blocks.transpose(1, 0, 2).reshape(b, tb * hop)

        comb_sh = _sample_halo_reflect(comb_own, hs, axis, d, n_dev)
        noise_sh = _sample_halo_reflect(noise_own, hs, axis, d, n_dev)

        # ---- blocked STFT filter iSTFT ------------------------------------
        comb_frames = frame_signal(comb_sh, win, hop) * window
        noise_frames = frame_signal(noise_sh, win, hop) * window
        s_comb = jnp.fft.rfft(comb_frames, win, axis=-1)
        s_noise = jnp.fft.rfft(noise_frames, win, axis=-1)
        sig_spec = s_comb * src_fr + s_noise * nf_fr  # (B, tb+7, F)

        y_frames = jnp.fft.irfft(sig_spec, win, axis=-1) * window
        fg = jnp.arange(tb + 7) + d * tb - 3  # global stft frame index
        valid = ((fg >= 0) & (fg <= t)).astype(y_frames.dtype)[None, :, None]
        y_frames = y_frames * valid

        y = overlap_add(y_frames, hop)
        wsq = jnp.broadcast_to((window * window)[None, None, :], (1, tb + 7, win))
        norm = overlap_add(wsq * valid[:1], hop)
        y = y / jnp.maximum(norm, 1e-11)
        return y[:, hs : hs + tb * hop]

    spec_frames = P(None, axis, None)
    fn = jax.shard_map(
        block,
        mesh=mesh,
        in_specs=(P(), spec_frames, spec_frames, spec_frames, P(axis, None), P()),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return fn(variables, units, f0, volume, noise_keys, spk_id)


def whole_utterance_reference(model, variables, units, f0, volume, key, spk_id=None):
    """The matching whole-utterance forward (same per-frame noise draw)."""
    b, t, _ = units.shape
    noise = blocked_noise(key, b, t, model.block_size)
    signal, _, _ = model.apply(
        variables, units, f0, volume, spk_id=spk_id, infer=True, noise=noise
    )
    return signal
