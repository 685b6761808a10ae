"""Streamed CombSubSuperFast / CombSubFast drivers (overlap-save blocks).

Split out of parallel/stream.py; see stream_core for the toolkit and
parallel/stream.py for the dispatch + consistency contract.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..models.ddsp import CombSubSuperFast
from ..ops.source import fast_source_gen, frame_phase_increments_q
from ..ops.spectral import frame_signal, overlap_add
from ..ops.window import hann_window, sqrt_hann_window
from .stream_core import (
    FRAME_HALO,
    _cached_jit,
    _carry_prefix_offset,
    _frame_halo,
    _sample_halo_reflect,
    blocked_noise,
    blocked_uniform,
)

def _combsub_block(
    model, variables, units_b, f0_b, vol_b, keys_b, spk_id_b, axis, n_dev, t, tb,
    aug_shift_b=None,
):
    """Per-device CombSubSuperFast synthesis on haloed blocks — the body of
    streamed_combsub_forward, reusable by the cascade engine. Returns own
    audio (B, tb*hop)."""
    hop, win = model.block_size, model.win_length
    hf = FRAME_HALO
    hs = 3 * hop + win // 2
    b = units_b.shape[0]
    window = jnp.asarray(hann_window(win))
    d = lax.axis_index(axis)

    # ---- control nets on frame-haloed inputs ------------------------------
    f0_ext = _frame_halo(f0_b, hf, hf, axis, d, n_dev, edge_value=None)
    units_ext = _frame_halo(units_b, hf, hf, axis, d, n_dev, edge_value=0.0)
    vol_ext = _frame_halo(vol_b, hf, hf, axis, d, n_dev, edge_value=0.0)

    # exact phase carry: int32 increments, cross-device prefix
    q_ext = frame_phase_increments_q(f0_ext, model.sampling_rate, hop)
    offset_ext = _carry_prefix_offset(
        q_ext[:, hf : hf + tb], q_ext[:, :hf], axis, d, n_dev
    )

    combtooth_ext, phase_ext = fast_source_gen(
        f0_ext, model.sampling_rate, hop, carry_offset_q=offset_ext
    )

    kg = jnp.arange(tb + 2 * hf) + d * tb - hf  # global frame index
    edge_mask = ((kg >= 0) & (kg < t)).astype(units_b.dtype)[None, :, None]
    frame_mask = jnp.zeros((tb + 2 * hf,), units_b.dtype)
    frame_mask = frame_mask.at[hf : hf + tb].set(1.0)[None, :, None]

    src_f_ext, noise_f_ext, _hidden_ext = model.apply(
        variables,
        units_ext,
        f0_ext,
        phase_ext,
        vol_ext,
        spk_id=spk_id_b,
        aug_shift=aug_shift_b,
        frame_mask=jnp.broadcast_to(frame_mask, (b, tb + 2 * hf, 1)),
        stream_axis=axis,
        edge_mask=jnp.broadcast_to(edge_mask, (b, tb + 2 * hf, 1)),
        method=CombSubSuperFast.controls,
    )
    src_own = src_f_ext[:, hf : hf + tb]
    nf_own = noise_f_ext[:, hf : hf + tb]

    # ---- filters for stft frames [s-3, e+3] -------------------------------
    # (frame T uses the duplicated last filter, ddsp/vocoder.py:732)
    src_fr = _frame_halo(src_own, 3, 4, axis, d, n_dev, edge_value=None)
    nf_fr = _frame_halo(nf_own, 3, 4, axis, d, n_dev, edge_value=None)

    # ---- sources on sample-haloed blocks ----------------------------------
    comb_own = combtooth_ext[:, hf * hop : (hf + tb) * hop]
    noise_blocks = jax.vmap(
        lambda k: jax.random.normal(k, (b, hop), jnp.float32)
    )(keys_b)
    noise_own = noise_blocks.transpose(1, 0, 2).reshape(b, tb * hop)

    comb_sh = _sample_halo_reflect(comb_own, hs, axis, d, n_dev)
    noise_sh = _sample_halo_reflect(noise_own, hs, axis, d, n_dev)

    # ---- blocked STFT filter iSTFT ----------------------------------------
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
    hs = 3 * hop + win // 2
    assert tb >= max(hf, 4) and tb * hop >= hs, (
        f"block of {tb} frames too small for halos (need >= {hf} frames and "
        f">= {hs} samples)"
    )
    noise_keys = jax.random.split(key, t)  # (T, 2) uint32
    if spk_id is None:
        spk_id = jnp.ones((b, 1), jnp.int32)

    def block(variables, units_b, f0_b, vol_b, keys_b, spk_id_b):
        return _combsub_block(
            model, variables, units_b, f0_b, vol_b, keys_b, spk_id_b,
            axis, n_dev, t, tb,
        )

    spec_frames = P(None, axis, None)
    fn = _cached_jit(
        ("combsub", model, mesh, axis, units.shape),
        lambda: jax.shard_map(
            block,
            mesh=mesh,
            in_specs=(P(), spec_frames, spec_frames, spec_frames,
                      P(axis, None), P()),
            out_specs=P(None, axis),
            check_vma=False,
        ),
    )
    return fn(variables, units, f0, volume, noise_keys, spk_id)


def whole_utterance_reference(model, variables, units, f0, volume, key, spk_id=None):
    """The matching whole-utterance forward (same per-frame noise draw)."""
    b, t, _ = units.shape

    def make():
        def run(variables, units, f0, volume, key, spk_id):
            noise = blocked_noise(key, b, t, model.block_size)
            signal, _, _ = model.apply(
                variables, units, f0, volume, spk_id=spk_id, infer=True,
                noise=noise,
            )
            return signal

        return run

    fn = _cached_jit(("combsub_whole", model, units.shape), make)
    return fn(variables, units, f0, volume, key, spk_id)


# ---------------------------------------------------------------------------
# Streamed cascade: DDSP -> blocked log-mel -> halo-exchanging diffusion /
# rectified-flow sampling (BASELINE "reflow euler/rk4 streamed blocks")
# ---------------------------------------------------------------------------



def _combsubfast_block(
    model, variables, units_b, f0_b, vol_b, keys_b, spk_id_b, axis, n_dev, t, tb
):
    """Per-device CombSubFast synthesis on haloed blocks.

    PCmer's FAVOR+ attention is handled by masked psum of its global k/v
    sums (models/pcmer.linear_attention) — no attention halo needed; the
    conformer convs use FRAME_HALO like the naive decoder.

    Returns (own audio (B, tb*block), own hidden (B, tb, 256)).
    """
    from ..models.ddsp import CombSubFast, combsub_fast_synthesis
    from ..ops.interp import upsample
    from ..ops.source import cumsum_increments_q, cumsum_phase_source

    block = model.block_size
    hf = FRAME_HALO
    b = units_b.shape[0]
    d = lax.axis_index(axis)

    f0_ext = _frame_halo(f0_b, hf, hf, axis, d, n_dev, edge_value=None)
    units_ext = _frame_halo(units_b, hf, hf, axis, d, n_dev, edge_value=0.0)
    vol_ext = _frame_halo(vol_b, hf, hf, axis, d, n_dev, edge_value=0.0)

    f0_up_ext = upsample(f0_ext, block)
    q_ext = cumsum_increments_q(f0_up_ext, model.sampling_rate, block)
    offset_ext = _carry_prefix_offset(
        q_ext[:, hf : hf + tb], q_ext[:, :hf], axis, d, n_dev
    )

    x_ext = cumsum_phase_source(
        f0_up_ext, model.sampling_rate, block, carry_offset_q=offset_ext
    )
    phase_ext = 2.0 * np.pi * x_ext[:, ::block, :]

    kg = jnp.arange(tb + 2 * hf) + d * tb - hf
    edge_mask = ((kg >= 0) & (kg < t)).astype(units_b.dtype)[None, :, None]
    edge_mask = jnp.broadcast_to(edge_mask, (b, tb + 2 * hf, 1))
    frame_mask = jnp.zeros((tb + 2 * hf,), units_b.dtype)
    frame_mask = frame_mask.at[hf : hf + tb].set(1.0)[None, :, None]
    frame_mask = jnp.broadcast_to(frame_mask, (b, tb + 2 * hf, 1))

    src_ext, nf_ext, hidden_ext = model.apply(
        variables, units_ext, f0_ext, phase_ext, vol_ext,
        spk_id=spk_id_b,
        frame_mask=frame_mask, stream_axis=axis, edge_mask=edge_mask,
        method=CombSubFast.controls,
    )
    src_own = src_ext[:, hf : hf + tb]
    nf_own = nf_ext[:, hf : hf + tb]
    hidden_own = hidden_ext[:, hf : hf + tb]
    # filters for synthesis frames [s, e] (dup of last at the global end)
    src_fr = _frame_halo(src_own, 0, 1, axis, d, n_dev, edge_value=None)
    nf_fr = _frame_halo(nf_own, 0, 1, axis, d, n_dev, edge_value=None)

    # sources for samples [s*B - B, e*B + B); zero outside the utterance
    # (the whole path zero-pads one block on each side, ddsp/vocoder.py:763)
    comb_all = jnp.sinc(
        model.sampling_rate * x_ext / (f0_up_ext + 1e-3)
    )[..., 0]
    comb = comb_all[:, (hf - 1) * block : (hf + tb + 1) * block]
    pos = jnp.arange((tb + 2) * block) + (d * tb - 1) * block
    smask = ((pos >= 0) & (pos < t * block)).astype(comb.dtype)[None, :]
    comb = comb * smask

    keys_ext = _frame_halo(
        keys_b[None, :, :], 1, 1, axis, d, n_dev, edge_value=0
    )[0]
    noise_blocks = jax.vmap(
        lambda k: jax.random.uniform(k, (b, block), jnp.float32) * 2.0 - 1.0
    )(keys_ext)
    noise = noise_blocks.transpose(1, 0, 2).reshape(b, (tb + 2) * block) * smask

    # framed synthesis without re-padding: ext already carries the one-block
    # margins, frame j here == whole-path padded frame s + j
    window = jnp.asarray(sqrt_hann_window(2 * block))
    def filtered(sig, filt):
        frames = frame_signal(sig, 2 * block, block) * window
        fft = jnp.fft.rfft(frames, 2 * block, axis=-1)
        return jnp.fft.irfft(fft * filt, 2 * block, axis=-1) * window

    frames_sum = filtered(comb, src_fr) + filtered(noise, nf_fr + 0j)
    y = overlap_add(frames_sum, block)
    return y[:, block : block + tb * block], hidden_own


def streamed_combsub_fast_forward(
    model,  # CombSubFast
    variables,
    units: jnp.ndarray,  # (B, T, C)
    f0: jnp.ndarray,  # (B, T, 1)
    volume: jnp.ndarray,  # (B, T, 1)
    key: jax.Array,
    spk_id=None,
    mesh: Mesh | None = None,
    axis: str = "time",
) -> jnp.ndarray:
    """Time-sharded standalone CombSubFast synthesis (ddsp/vocoder.py:712-786).

    Returns (B, T*block) audio matching
    ``model.apply(..., noise=blocked_uniform(key, B, T, block))`` — the same
    blocked engine the DiffusionNew cascade rides (_combsubfast_block)."""
    b, t, _ = units.shape
    n_dev = mesh.shape[axis]
    assert t % n_dev == 0, f"frames {t} not divisible by {n_dev} devices"
    tb = t // n_dev
    assert tb >= max(FRAME_HALO, 4), (
        f"block of {tb} frames too small (needs >= {max(FRAME_HALO, 4)})"
    )
    noise_keys = jax.random.split(key, t)  # (T, 2)
    if spk_id is None:
        spk_id = jnp.ones((b, 1), jnp.int32)

    def block(variables, units_b, f0_b, vol_b, keys_b, spk_id_b):
        audio, _hidden = _combsubfast_block(
            model, variables, units_b, f0_b, vol_b, keys_b, spk_id_b,
            axis, n_dev, t, tb,
        )
        return audio

    spec_frames = P(None, axis, None)
    fn = _cached_jit(
        ("combsubfast", model, mesh, axis, units.shape),
        lambda: jax.shard_map(
            block,
            mesh=mesh,
            in_specs=(P(), spec_frames, spec_frames, spec_frames,
                      P(axis, None), P()),
            out_specs=P(None, axis),
            check_vma=False,
        ),
    )
    return fn(variables, units, f0, volume, noise_keys, spk_id)


