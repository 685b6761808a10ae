"""Streamed Sins / CombSub (old) drivers (overlap-save blocks).

Split out of parallel/stream.py; see stream_core for the toolkit and
parallel/stream.py for the dispatch + consistency contract.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.spectral import frame_signal, overlap_add
from .stream_core import (
    FRAME_HALO,
    _cached_jit,
    _carry_prefix_offset,
    _frame_halo,
    _sample_halo_reflect,
    blocked_noise,
    blocked_uniform,
)

def _blocked_fft_convolve(
    audio_slice, ir_slice, kg0, t, tb, block, hf2, out_halo=0
):
    """Blocked ops/fir.fft_convolve: per-device frames [kg0, kg0 + tb + 2*hf2]
    of the whole padded-signal framing.

    audio_slice: (B, (tb + 2*hf2 + 2) * block) — samples
        [kg0*block - block, (kg0 + tb + 2*hf2)*block + block), zeros outside
        the utterance (the whole path pads one hop of zeros each side).
    ir_slice: (B, tb + 2*hf2 + 1, ir_size) — the IR for each frame (caller
        already duplicates the last frame's IR at index T).
    kg0: global index of the first frame (s - hf2).
    out_halo: also return this many extra frames of output on each side
        (for chained filters); requires hf2 margin to cover them.
    Returns (B, (tb + 2*out_halo)*block) — samples
        [(s - out_halo)*block, (e + out_halo)*block), zeros outside [0, L).
    """
    from ..ops.fir import get_fft_size
    from ..ops.window import bartlett_window

    b = audio_slice.shape[0]
    ir_size = ir_slice.shape[-1]
    n_frames = tb + 2 * hf2 + 1
    fft_size = get_fft_size(2 * block, ir_size)

    frames = frame_signal(audio_slice, 2 * block, block)  # (B, n_frames, 2B)
    frames = frames * jnp.asarray(bartlett_window(2 * block), frames.dtype)
    audio_fft = jnp.fft.rfft(frames, fft_size, axis=-1)
    ir_fft = jnp.fft.rfft(ir_slice, fft_size, axis=-1)
    out_frames = jnp.fft.irfft(audio_fft * ir_fft, fft_size, axis=-1)

    kg = jnp.arange(n_frames) + kg0
    valid = ((kg >= 0) & (kg <= t)).astype(out_frames.dtype)[None, :, None]
    y = overlap_add(out_frames * valid, block)
    start = (hf2 - out_halo) * block + block + ir_size // 2
    out = y[:, start : start + (tb + 2 * out_halo) * block]
    if out_halo:
        pos = jnp.arange(out.shape[1]) + (kg0 + hf2 - out_halo) * block
        mask = ((pos >= 0) & (pos < t * block)).astype(out.dtype)[None, :]
        out = out * mask
    return out


def streamed_sins_forward(
    model,  # Sins
    variables,
    units, f0, volume,
    key: jax.Array,
    spk_id=None,
    mesh: Mesh | None = None,
    axis: str = "time",
    max_upsample_dim: int = 32,
) -> jnp.ndarray:
    """Time-sharded Sins synthesis matching
    ``model.apply(..., noise=blocked_uniform(key, B, T, block))``."""
    from ..models.ddsp import Sins, sins_harmonic_bank
    from ..ops.fir import frequency_impulse_response, get_fft_size
    from ..ops.interp import upsample
    from ..ops.source import cumsum_increments_q, cumsum_phase_source

    b, t, _ = units.shape
    block = model.block_size
    n_dev = mesh.shape[axis]
    assert t % n_dev == 0
    tb = t // n_dev
    hf = FRAME_HALO
    ir_h = 2 * (model.n_mag_allpass - 1)
    ir_n = 2 * (model.n_mag_noise - 1)
    hf2_h = get_fft_size(2 * block, ir_h) // block + 2
    hf2_n = get_fft_size(2 * block, ir_n) // block + 2
    assert tb >= hf and hf >= max(hf2_h, hf2_n) + 1, (
        f"halos: tb={tb}, hf={hf}, need > {max(hf2_h, hf2_n) + 1}"
    )
    noise_keys = jax.random.split(key, t)
    if spk_id is None:
        spk_id = jnp.ones((b, 1), jnp.int32)

    def block_fn(variables, units_b, f0_b, vol_b, keys_b, spk_id_b):
        d = lax.axis_index(axis)
        ext_t = tb + 2 * hf
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
        phase_ext = 2.0 * np.pi * x_ext

        kg_ext = jnp.arange(ext_t) + d * tb - hf
        edge_mask = ((kg_ext >= 0) & (kg_ext < t)).astype(units_b.dtype)
        edge_mask_b = jnp.broadcast_to(edge_mask[None, :, None], (b, ext_t, 1))
        frame_mask = jnp.zeros((ext_t,), units_b.dtype)
        frame_mask = frame_mask.at[hf : hf + tb].set(1.0)
        frame_mask_b = jnp.broadcast_to(frame_mask[None, :, None], (b, ext_t, 1))

        amps, gd, nmag, _hidden = model.apply(
            variables, units_ext, f0_ext, phase_ext[:, ::block, :], vol_ext,
            spk_id=spk_id_b,
            frame_mask=frame_mask_b, stream_axis=axis, edge_mask=edge_mask_b,
            method=Sins.controls,
        )
        # beyond the utterance end the whole path duplicates the last frame
        # (upsample edge-repeat + IR frame dup)
        last_sel = (kg_ext >= t - 1)[None, :, None]
        own_last = lambda a: jnp.sum(
            a * (kg_ext == t - 1).astype(a.dtype)[None, :, None],
            axis=1, keepdims=True,
        )

        def fix_tail(a):
            return jnp.where(last_sel, own_last(a), a)

        amps = fix_tail(amps)
        gd = fix_tail(gd)
        nmag = fix_tail(nmag)

        sin_ext = sins_harmonic_bank(phase_ext, amps, block, max_upsample_dim)
        pos = jnp.arange(ext_t * block) + (d * tb - hf) * block
        smask = ((pos >= 0) & (pos < t * block)).astype(sin_ext.dtype)[None, :]
        sin_ext = sin_ext * smask

        noise_keys_ext = _frame_halo(
            keys_b[None, :, :], hf, hf, axis, d, n_dev, edge_value=0
        )[0]
        noise_blocks = jax.vmap(
            lambda k: jax.random.uniform(k, (b, block), jnp.float32) * 2.0 - 1.0
        )(noise_keys_ext)
        noise_ext = (
            noise_blocks.transpose(1, 0, 2).reshape(b, ext_t * block) * smask
        )

        ir_harm = frequency_impulse_response(
            jnp.exp(1j * jnp.cumsum(gd, axis=-1)), hann_window_flag=False
        )
        ir_noise = frequency_impulse_response(nmag + 0j, hann_window_flag=True)

        def run_filter(sig_ext, ir_ext, hf2):
            a0 = (hf - hf2 - 1) * block
            a1 = (hf + tb + hf2 + 1) * block
            return _blocked_fft_convolve(
                sig_ext[:, a0:a1],
                ir_ext[:, hf - hf2 : hf + tb + hf2 + 1],
                d * tb - hf2, t, tb, block, hf2,
            )

        harmonic = run_filter(sin_ext, ir_harm, hf2_h)
        noise = run_filter(noise_ext, ir_noise, hf2_n)
        return harmonic + noise

    spec_frames = P(None, axis, None)
    fn = _cached_jit(
        ("sins", model, mesh, axis, units.shape),
        lambda: jax.shard_map(
            block_fn,
            mesh=mesh,
            in_specs=(P(), spec_frames, spec_frames, spec_frames, P(axis, None), P()),
            out_specs=P(None, axis),
            check_vma=False,
        )
    )
    return fn(variables, units, f0, volume, noise_keys, spk_id)


def streamed_combsub_old_forward(
    model,  # CombSub (the legacy LTV-FIR version)
    variables,
    units, f0, volume,
    key: jax.Array,
    spk_id=None,
    mesh: Mesh | None = None,
    axis: str = "time",
) -> jnp.ndarray:
    """Time-sharded legacy CombSub: combtooth -> all-pass group-delay filter
    -> dynamic-window source filter (chained blocked LTV-FIR) + noise filter.
    Matches ``model.apply(..., noise=blocked_uniform(key, B, T, block))``."""
    from ..models.ddsp import CombSub
    from ..ops.fir import (
        apply_dynamic_window_to_impulse_response,
        frequency_impulse_response,
        get_fft_size,
    )
    from ..ops.interp import upsample
    from ..ops.source import cumsum_increments_q, cumsum_phase_source

    b, t, _ = units.shape
    block = model.block_size
    n_dev = mesh.shape[axis]
    assert t % n_dev == 0
    tb = t // n_dev
    hf = FRAME_HALO
    ir1 = 2 * (model.n_mag_allpass - 1)
    ir2 = 2 * (model.n_mag_harmonic - 1)
    ir3 = 2 * (model.n_mag_noise - 1)
    hf2_2 = get_fft_size(2 * block, ir2) // block + 2
    out_halo1 = hf2_2 + 1
    hf2_1 = get_fft_size(2 * block, ir1) // block + 2 + out_halo1
    hf2_3 = get_fft_size(2 * block, ir3) // block + 2
    assert tb >= hf and hf >= max(hf2_1, hf2_3) + 1
    noise_keys = jax.random.split(key, t)
    if spk_id is None:
        spk_id = jnp.ones((b, 1), jnp.int32)

    def block_fn(variables, units_b, f0_b, vol_b, keys_b, spk_id_b):
        d = lax.axis_index(axis)
        ext_t = tb + 2 * hf
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

        kg_ext = jnp.arange(ext_t) + d * tb - hf
        edge_mask = ((kg_ext >= 0) & (kg_ext < t)).astype(units_b.dtype)
        edge_mask_b = jnp.broadcast_to(edge_mask[None, :, None], (b, ext_t, 1))
        frame_mask = jnp.zeros((ext_t,), units_b.dtype)
        frame_mask = frame_mask.at[hf : hf + tb].set(1.0)
        frame_mask_b = jnp.broadcast_to(frame_mask[None, :, None], (b, ext_t, 1))

        gd, src_param, noise_param, _hidden = model.apply(
            variables, units_ext, f0_ext,
            2.0 * np.pi * x_ext[:, ::block, :], vol_ext,
            spk_id=spk_id_b,
            frame_mask=frame_mask_b, stream_axis=axis, edge_mask=edge_mask_b,
            method=CombSub.controls,
        )
        last_sel = (kg_ext >= t - 1)[None, :, None]

        def fix_tail(a):
            own_last = jnp.sum(
                a * (kg_ext == t - 1).astype(a.dtype)[None, :, None],
                axis=1, keepdims=True,
            )
            return jnp.where(last_sel, own_last, a)

        gd = fix_tail(gd)
        src_param = fix_tail(src_param)
        noise_param = fix_tail(noise_param)
        half_width = fix_tail(1.5 * model.sampling_rate / (f0_ext + 1e-3))

        comb_ext = jnp.sinc(
            model.sampling_rate * x_ext / (f0_up_ext + 1e-3)
        )[..., 0]
        pos = jnp.arange(ext_t * block) + (d * tb - hf) * block
        smask = ((pos >= 0) & (pos < t * block)).astype(comb_ext.dtype)[None, :]
        comb_ext = comb_ext * smask

        ir_ap = frequency_impulse_response(
            jnp.exp(1j * jnp.cumsum(gd, axis=-1)), hann_window_flag=False
        )
        ir_src = frequency_impulse_response(
            src_param + 0j, hann_window_flag=True, half_width_frames=half_width
        )
        ir_noise = frequency_impulse_response(noise_param + 0j, hann_window_flag=True)

        def run(sig_ext, sig_off, ir_ext, hf2, out_halo=0):
            # sig_ext covers samples starting at (d*tb - sig_off)*block
            lo = (sig_off - hf2 - 1) * block
            hi = lo + (tb + 2 * hf2 + 2) * block
            return _blocked_fft_convolve(
                sig_ext[:, lo:hi],
                ir_ext[:, hf - hf2 : hf + tb + hf2 + 1],
                d * tb - hf2, t, tb, block, hf2, out_halo=out_halo,
            )

        harmonic_ext = run(comb_ext, hf, ir_ap, hf2_1, out_halo=out_halo1)
        harmonic = run(harmonic_ext, out_halo1, ir_src, hf2_2)

        noise_keys_ext = _frame_halo(
            keys_b[None, :, :], hf, hf, axis, d, n_dev, edge_value=0
        )[0]
        noise_blocks = jax.vmap(
            lambda k: jax.random.uniform(k, (b, block), jnp.float32) * 2.0 - 1.0
        )(noise_keys_ext)
        noise_ext = (
            noise_blocks.transpose(1, 0, 2).reshape(b, ext_t * block) * smask
        )
        noise = run(noise_ext, hf, ir_noise, hf2_3)
        return harmonic + noise

    spec_frames = P(None, axis, None)
    fn = _cached_jit(
        ("combsub_old", model, mesh, axis, units.shape),
        lambda: jax.shard_map(
            block_fn,
            mesh=mesh,
            in_specs=(P(), spec_frames, spec_frames, spec_frames, P(axis, None), P()),
            out_specs=P(None, axis),
            check_vma=False,
        )
    )
    return fn(variables, units, f0, volume, noise_keys, spk_id)


