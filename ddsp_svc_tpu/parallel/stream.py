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

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..models.ddsp import CombSubSuperFast
from ..ops.source import fast_source_gen, frame_phase_increments_q
from ..ops.spectral import frame_signal, overlap_add
from ..ops.window import hann_window, sqrt_hann_window

FRAME_HALO = 48  # conv stack (2) + 3 conformer layers (15 each) + margin

# jitted-driver cache: the streamed/whole entry points below close over
# static configuration (model, mesh, shapes, sampler kwargs), so each
# distinct key compiles ONE executable instead of dispatching the whole
# graph eagerly op-by-op (~1000 tiny compiles per call on a fresh process;
# eager dispatch is also what made the persistent compile cache useless
# here). Keys hold flax modules (hashable dataclasses), Mesh, shapes.
_JITTED: dict = {}


def _cached_jit(key, make_fn):
    fn = _JITTED.get(key)
    if fn is None:
        fn = jax.jit(make_fn())
        _JITTED[key] = fn
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

DENOISER_HALO = 96  # NaiveV2Diff: 6 conv layers x (k=31)//2 = 90 + margin


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


def streamed_cascade_mel(
    model,  # Unit2WavFast or ReflowUnit2Wav
    variables,
    units: jnp.ndarray,  # (B, T, C)
    f0: jnp.ndarray,  # (B, T, 1)
    volume: jnp.ndarray,  # (B, T, 1)
    key: jax.Array,
    mel,  # ops/mel.LogMelSpectrogram with hop == model.block_size
    spk_id=None,
    mesh: Mesh | None = None,
    axis: str = "time",
    family: str = "reflow",  # 'reflow' | 'diffusion'
    infer_step: int = 10,
    sampler: str | None = None,
    t_start: float = 0.7,
    k_step: int = 100,
    infer_speedup: int = 10,
) -> jnp.ndarray:
    """Time-sharded cascade inference to refined mel (B, T, M).

    Every denoiser evaluation exchanges DENOISER_HALO frames of the evolving
    x_t with ring neighbors (ppermute), so the conv-only denoiser computes
    exactly the whole-utterance values for its own frames; the initial noise
    is drawn per frame (blocking-invariant) and the ODE/ancestral updates
    are elementwise — the streamed sample path equals the whole-utterance
    path up to float summation order.
    """
    from ..models.ddsp import combsub_stft_synthesis  # noqa: F401 (doc link)
    from ..models.diffusion import GaussianDiffusion
    from ..models.naive_v2_diff import NaiveV2Diff
    from ..models.reflow import RectifiedFlow

    b, t, _ = units.shape
    hop = model.block_size
    n_dev = mesh.shape[axis]
    assert t % n_dev == 0, f"frames {t} not divisible by {n_dev} devices"
    tb = t // n_dev
    hd = DENOISER_HALO
    assert tb >= max(FRAME_HALO, hd), (
        f"block of {tb} frames too small (needs >= {max(FRAME_HALO, hd)})"
    )
    assert mel.hop_length == hop and mel.sr == model.sampling_rate
    if family != "reflow" and infer_speedup <= 1:
        raise NotImplementedError(
            "streamed diffusion requires infer_speedup >= 2: the full "
            "ancestral chain draws fresh noise per step, which is not "
            "blocking-invariant (the accelerated samplers are ODE-like "
            "given the per-frame init noise); run whole-utterance for "
            "speedup 1"
        )

    key_ddsp, key_init = jax.random.split(key)
    ddsp_keys = jax.random.split(key_ddsp, t)  # (T, 2)
    init_keys = jax.random.split(key_init, t)  # (T, 2)
    if spk_id is None:
        spk_id = jnp.ones((b, 1), jnp.int32)

    ddsp_module = CombSubSuperFast(
        sampling_rate=model.sampling_rate,
        block_size=model.block_size,
        win_length=model.win_length,
        n_unit=model.n_unit,
        n_spk=model.n_spk,
        use_pitch_aug=model.use_pitch_aug,
        dtype=model.dtype,
    )
    net_key = "velocity_fn" if family == "reflow" else "denoise_fn"
    naive = NaiveV2Diff(
        mel_channels=model.out_dims, dim=model.n_chans,
        num_layers=model.n_layers, condition_dim=model.out_dims,
        use_mlp=False, dtype=model.dtype, name=net_key,
    )
    if family == "reflow":
        net_mod = RectifiedFlow(naive, out_dims=model.out_dims)
    else:
        net_mod = GaussianDiffusion(
            naive, out_dims=model.out_dims, timesteps=model.timesteps,
            k_step=model.k_step_max,
        )

    def block(variables, units_b, f0_b, vol_b, dkeys_b, ikeys_b, spk_id_b):
        d = lax.axis_index(axis)
        p = variables["params"]
        audio_own = _combsub_block(
            ddsp_module, {"params": p["ddsp_model"]},
            units_b, f0_b, vol_b, dkeys_b, spk_id_b, axis, n_dev, t, tb,
        )
        mel_own = _blocked_logmel(audio_own, mel, axis, d, n_dev, tb)

        # blocking-invariant initial noise (per frame)
        noise_own = jax.vmap(
            lambda k: jax.random.normal(k, (b, model.out_dims), jnp.float32)
        )(ikeys_b).transpose(1, 0, 2)

        kg = jnp.arange(tb + 2 * hd) + d * tb - hd
        edge_ext = ((kg >= 0) & (kg < t)).astype(mel_own.dtype)[None, :, None]
        edge_ext = jnp.broadcast_to(edge_ext, (b, tb + 2 * hd, 1))
        p_net = p[net_key]

        def cond_halo(x):
            return _frame_halo(x, hd, hd, axis, d, n_dev, edge_value=0.0)

        cond_ext = cond_halo(mel_own)

        def wrapper(_inner):
            def fn(x, tv):
                x_ext = cond_halo(x)
                tt = 1000.0 * tv if family == "reflow" else tv
                out = naive.apply(
                    {"params": p_net}, x_ext, tt, cond_ext, edge_mask=edge_ext
                )
                return out[:, hd : hd + tb]

            return fn

        kwargs = dict(
            gt_spec=mel_own, infer=True, key=jax.random.PRNGKey(0),
            init_noise=noise_own,
        )
        net_vars = {"params": {net_key: p_net}}
        if family == "reflow":
            out = net_mod.apply(
                net_vars, mel_own,
                infer_step=infer_step, sampler=sampler or "euler",
                t_start=t_start, velocity_wrapper=wrapper, **kwargs,
            )
        else:
            out = net_mod.apply(
                net_vars, mel_own,
                infer_speedup=infer_speedup, sampler=sampler or "dpm-solver",
                k_step=k_step, denoise_wrapper=wrapper, **kwargs,
            )
        return out

    spec_frames = P(None, axis, None)
    fn = _cached_jit(
        ("cascade", model, mesh, axis, units.shape, mel.cache_key(), family, infer_step, sampler, t_start, k_step, infer_speedup),
        lambda: jax.shard_map(
            block,
            mesh=mesh,
            in_specs=(
                P(), spec_frames, spec_frames, spec_frames,
                P(axis, None), P(axis, None), P(),
            ),
            out_specs=spec_frames,
            check_vma=False,
        )
    )
    return fn(variables, units, f0, volume, ddsp_keys, init_keys, spk_id)


def whole_cascade_reference(
    model, variables, units, f0, volume, key, mel, spk_id=None,
    family: str = "reflow", **kwargs,
):
    """Whole-utterance cascade with the identical blocking-invariant noise
    draws, for consistency checks against streamed_cascade_mel."""
    b, t, _ = units.shape

    def make():
        def run(variables, units, f0, volume, key, spk_id):
            key_ddsp, key_init = jax.random.split(key)
            ddsp_noise = blocked_noise(key_ddsp, b, t, model.block_size)
            init_noise = blocked_noise_frames(key_init, b, t, model.out_dims)
            extra = (
                dict(velocity_wrapper=None) if family == "reflow" else dict()
            )
            return model.apply(
                variables, units, f0, volume, spk_id=spk_id,
                mel_extract_fn=mel.extract, infer=True,
                key=jax.random.PRNGKey(0), ddsp_noise=ddsp_noise,
                init_noise=init_noise, **extra, **kwargs,
            )

        return run

    fn = _cached_jit(
        ("cascade_whole", model, units.shape, mel.cache_key(), family,
         tuple(sorted(kwargs.items()))),
        make,
    )
    return fn(variables, units, f0, volume, key, spk_id)


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


def nsf_hifigan_padded_forward(gen, params, mel, f0, key, halo=VOCODER_HALO):
    """Whole-utterance reference for the streamed vocoder: the generator run
    with ``halo`` zero mel-frames of context on each side (cropped after).

    This silence padding makes the utterance-level operator shift-invariant,
    so blocked and whole execution see literally identical arrays — the
    price is edge output that differs from the unpadded reference within
    the receptive field of the utterance boundaries (silence context
    instead of SAME-conv zeros), which is the same kind of boundary choice
    the reference makes implicitly.
    """
    b, t, _ = mel.shape
    upp = gen.upp
    dim = 9  # 8 harmonics + fundamental (m_source harmonic_num=8)

    def make():
        def run(params, mel, f0, key):
            key_ini, key_noise = jax.random.split(key)
            rand_ini = _sine_rand_ini(key_ini, dim)
            keys_all = jax.random.split(key_noise, t + 2 * halo)
            noise = _sine_noise_from_keys(keys_all, b, upp, dim)
            mel_pad = jnp.pad(mel, ((0, 0), (halo, halo), (0, 0)))
            f0_pad = jnp.pad(f0, ((0, 0), (halo, halo)))
            audio = gen.apply(
                {"params": params}, mel_pad, f0_pad,
                sine_kwargs=dict(rand_ini=rand_ini, noise=noise),
            )
            return audio[:, halo * upp : (halo + t) * upp]

        return run

    fn = _cached_jit(("nsf_whole", gen, mel.shape, halo), make)
    return fn(params, mel, f0, key)


def streamed_nsf_hifigan(
    gen,
    params,
    mel: jnp.ndarray,  # (B, T, M)
    f0: jnp.ndarray,  # (B, T)
    key: jax.Array,
    mesh: Mesh,
    axis: str = "time",
    halo: int = VOCODER_HALO,
) -> jnp.ndarray:
    """Time-sharded NSF-HiFiGAN synthesis matching nsf_hifigan_padded_forward.

    The generator is norm-free (convs + elementwise only), so a halo of
    real neighbor frames >= its receptive field makes interior outputs
    exact; the sine source uses the int32 phase-carry prefix and per-frame
    keyed noise so the excitation is blocking-invariant.
    """
    from ..ops.source import sine_increments_q

    b, t, _ = mel.shape
    upp = gen.upp
    dim = 9
    n_dev = mesh.shape[axis]
    assert t % n_dev == 0
    tb = t // n_dev
    assert tb >= halo, f"block of {tb} frames < vocoder halo {halo}"

    key_ini, key_noise = jax.random.split(key)
    rand_ini = _sine_rand_ini(key_ini, dim)
    keys_all = jax.random.split(key_noise, t + 2 * halo)  # frames [-H, T+H)

    def block(params, mel_b, f0_b, keys_all_b, rand_ini_b):
        d = lax.axis_index(axis)
        mel_ext = _frame_halo(mel_b, halo, halo, axis, d, n_dev, edge_value=0.0)
        f0_ext = _frame_halo(
            f0_b[..., None], halo, halo, axis, d, n_dev, edge_value=0.0
        )[..., 0]

        # exact sine-phase carry prefix over devices
        q_own = sine_increments_q(f0_b, upp, gen.sampling_rate)
        q_ext = sine_increments_q(f0_ext, upp, gen.sampling_rate)
        offset_ext = _carry_prefix_offset(
            q_own, q_ext[:, :halo], axis, d, n_dev
        )

        # per-frame keyed noise for ext frames: padded coords [d*tb, ...)
        keys_ext = lax.dynamic_slice(
            keys_all_b, (d * tb, 0), (tb + 2 * halo, 2)
        )
        noise_ext = _sine_noise_from_keys(keys_ext, b, upp, dim)

        audio_ext = gen.apply(
            {"params": params}, mel_ext, f0_ext,
            sine_kwargs=dict(
                rand_ini=rand_ini_b, noise=noise_ext, carry_offset_q=offset_ext
            ),
        )
        return audio_ext[:, halo * upp : (halo + tb) * upp]

    fn = _cached_jit(
        ("nsf", gen, mesh, axis, mel.shape, halo),
        lambda: jax.shard_map(
            block,
            mesh=mesh,
            in_specs=(P(), P(None, axis, None), P(None, axis), P(), P()),
            out_specs=P(None, axis),
            check_vma=False,
        )
    )
    return fn(params, mel, f0, keys_all, rand_ini)


# ---------------------------------------------------------------------------
# Streamed CombSubFast (PCmer decoder) + DiffusionNew / Unit2Mel cascades
# ---------------------------------------------------------------------------

WAVENET_HALO = 24  # 20 layers x k=3 d=1 -> 20 frames + margin


def blocked_uniform(key: jax.Array, batch: int, n_frames: int, hop: int) -> jnp.ndarray:
    """(B, n_frames*hop) uniform(-1,1) drawn per hop-block from split keys."""
    keys = jax.random.split(key, n_frames)
    blocks = jax.vmap(
        lambda k: jax.random.uniform(k, (batch, hop), jnp.float32) * 2.0 - 1.0
    )(keys)
    return blocks.transpose(1, 0, 2).reshape(batch, n_frames * hop)


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


def streamed_unit2wav_new_mel(
    model,  # Unit2Wav (DiffusionNew)
    variables,
    units, f0, volume,
    key: jax.Array,
    mel,  # LogMelSpectrogram, hop == block_size
    spk_id=None,
    mesh: Mesh | None = None,
    axis: str = "time",
    k_step: int = 100,
    infer_speedup: int = 10,
    sampler: str = "dpm-solver",
) -> jnp.ndarray:
    """Time-sharded DiffusionNew inference: CombSubFast -> mel; WaveNet
    diffusion conditioned on the DDSP hidden (diffusion/vocoder.py:221-266),
    denoiser halos exchanged every sampler step."""
    from ..models.ddsp import CombSubFast
    from ..models.diffusion import GaussianDiffusion
    from ..models.wavenet import WaveNet

    b, t, _ = units.shape
    n_dev = mesh.shape[axis]
    assert t % n_dev == 0
    tb = t // n_dev
    hd = WAVENET_HALO
    assert tb >= max(FRAME_HALO, hd)
    assert mel.hop_length == model.block_size and mel.sr == model.sampling_rate
    if infer_speedup <= 1:
        raise NotImplementedError(
            "streamed diffusion requires infer_speedup >= 2 "
            "(ancestral per-step noise is not blocking-invariant)"
        )

    key_ddsp, key_init = jax.random.split(key)
    ddsp_keys = jax.random.split(key_ddsp, t)
    init_keys = jax.random.split(key_init, t)
    if spk_id is None:
        spk_id = jnp.ones((b, 1), jnp.int32)

    ddsp_module = CombSubFast(
        sampling_rate=model.sampling_rate, block_size=model.block_size,
        n_unit=model.n_unit, n_spk=model.n_spk,
        use_pitch_aug=model.use_pitch_aug, pcmer_norm=model.pcmer_norm,
        dtype=model.dtype,
    )
    wavenet = WaveNet(model.out_dims, model.n_layers, model.n_chans, 256,
                      dtype=model.dtype, name="denoise_fn")
    net_mod = GaussianDiffusion(wavenet, out_dims=model.out_dims,
                                timesteps=model.timesteps,
                                k_step=model.k_step_max)

    def block(variables, units_b, f0_b, vol_b, dkeys_b, ikeys_b, spk_id_b):
        d = lax.axis_index(axis)
        p = variables["params"]
        ddsp_vars = {"params": p["ddsp_model"]}
        if "buffers" in variables:
            ddsp_vars["buffers"] = variables["buffers"]["ddsp_model"]
        audio_own, hidden_own = _combsubfast_block(
            ddsp_module, ddsp_vars, units_b, f0_b, vol_b, dkeys_b, spk_id_b,
            axis, n_dev, t, tb,
        )
        mel_own = _blocked_logmel(audio_own, mel, axis, d, n_dev, tb)
        noise_own = jax.vmap(
            lambda k: jax.random.normal(k, (b, model.out_dims), jnp.float32)
        )(ikeys_b).transpose(1, 0, 2)

        kg = jnp.arange(tb + 2 * hd) + d * tb - hd
        edge_ext = ((kg >= 0) & (kg < t)).astype(mel_own.dtype)[None, :, None]
        edge_ext = jnp.broadcast_to(edge_ext, (b, tb + 2 * hd, 1))

        def hhalo(x):
            return _frame_halo(x, hd, hd, axis, d, n_dev, edge_value=0.0)

        cond_ext = hhalo(hidden_own)
        p_net = p["denoise_fn"]

        def wrapper(_inner):
            def fn(x, tv):
                out = wavenet.apply(
                    {"params": p_net}, hhalo(x), tv, cond_ext,
                    edge_mask=edge_ext,
                )
                return out[:, hd : hd + tb]

            return fn

        return net_mod.apply(
            {"params": {"denoise_fn": p_net}}, hidden_own,
            gt_spec=mel_own, infer=True, infer_speedup=infer_speedup,
            sampler=sampler, k_step=k_step, key=jax.random.PRNGKey(0),
            init_noise=noise_own, denoise_wrapper=wrapper,
        )

    spec_frames = P(None, axis, None)
    fn = _cached_jit(
        ("unit2wav_new", model, mesh, axis, units.shape, mel.cache_key(), k_step, infer_speedup, sampler),
        lambda: jax.shard_map(
            block,
            mesh=mesh,
            in_specs=(
                P(), spec_frames, spec_frames, spec_frames,
                P(axis, None), P(axis, None), P(),
            ),
            out_specs=spec_frames,
            check_vma=False,
        )
    )
    return fn(variables, units, f0, volume, ddsp_keys, init_keys, spk_id)


def whole_unit2wav_new_reference(
    model, variables, units, f0, volume, key, mel, spk_id=None, **kwargs
):
    b, t, _ = units.shape

    def make():
        def run(variables, units, f0, volume, key, spk_id):
            key_ddsp, key_init = jax.random.split(key)
            return model.apply(
                variables, units, f0, volume, spk_id=spk_id,
                mel_extract_fn=mel.extract, infer=True,
                key=jax.random.PRNGKey(0),
                ddsp_noise=blocked_uniform(key_ddsp, b, t, model.block_size),
                init_noise=blocked_noise_frames(
                    key_init, b, t, model.out_dims
                ),
                **kwargs,
            )

        return run

    fn = _cached_jit(
        ("unit2wav_new_whole", model, units.shape, mel.cache_key(),
         tuple(sorted(kwargs.items()))),
        make,
    )
    return fn(variables, units, f0, volume, key, spk_id)


# ---------------------------------------------------------------------------
# Streamed Sins: harmonic bank + blocked LTV-FIR (fft_convolve) filtering
# ---------------------------------------------------------------------------


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


def streamed_unit2mel(
    model,  # Unit2Mel
    variables,
    units, f0, volume,
    gt_spec,  # (B, T, M) input mel (external ddsp / gt), or None for full
    key: jax.Array,
    spk_id=None,
    mesh: Mesh | None = None,
    axis: str = "time",
    k_step: int = 100,
    infer_speedup: int = 10,
    sampler: str = "dpm-solver",
) -> jnp.ndarray:
    """Time-sharded pure-diffusion Unit2Mel inference. The condition embeds
    are pointwise (diffusion/vocoder.py:186-199) — computed locally per
    frame; only the WaveNet denoiser needs halos."""
    from ..models.diffusion import GaussianDiffusion
    from ..models.wavenet import WaveNet

    b, t, _ = units.shape
    n_dev = mesh.shape[axis]
    assert t % n_dev == 0
    tb = t // n_dev
    hd = WAVENET_HALO
    assert tb >= hd
    if infer_speedup <= 1:
        raise NotImplementedError(
            "streamed diffusion requires infer_speedup >= 2 "
            "(ancestral per-step noise is not blocking-invariant)"
        )
    init_keys = jax.random.split(key, t)
    if spk_id is None:
        spk_id = jnp.ones((b, 1), jnp.int32)

    wavenet = WaveNet(model.out_dims, model.n_layers, model.n_chans,
                      model.n_hidden, dtype=model.dtype, name="denoise_fn")
    net_mod = GaussianDiffusion(wavenet, out_dims=model.out_dims,
                                timesteps=model.timesteps,
                                k_step=model.k_step_max)

    def block(variables, units_b, f0_b, vol_b, gt_b, ikeys_b, spk_id_b):
        d = lax.axis_index(axis)
        p = variables["params"]

        def dense(name, x):
            return x @ p[name]["kernel"] + p[name]["bias"]

        cond = (
            dense("unit_embed", units_b)
            + dense("f0_embed", jnp.log1p(f0_b / 700.0))
            + dense("volume_embed", vol_b)
        )
        if "spk_embed" in p:
            cond = cond + p["spk_embed"]["embedding"][spk_id_b[:, 0] - 1][:, None, :]

        noise_own = jax.vmap(
            lambda k: jax.random.normal(k, (b, model.out_dims), jnp.float32)
        )(ikeys_b).transpose(1, 0, 2)

        kg = jnp.arange(tb + 2 * hd) + d * tb - hd
        edge_ext = ((kg >= 0) & (kg < t)).astype(cond.dtype)[None, :, None]
        edge_ext = jnp.broadcast_to(edge_ext, (b, tb + 2 * hd, 1))

        def hhalo(x):
            return _frame_halo(x, hd, hd, axis, d, n_dev, edge_value=0.0)

        cond_ext = hhalo(cond)
        p_net = p["denoise_fn"]

        def wrapper(_inner):
            def fn(x, tv):
                out = wavenet.apply(
                    {"params": p_net}, hhalo(x), tv, cond_ext,
                    edge_mask=edge_ext,
                )
                return out[:, hd : hd + tb]

            return fn

        return net_mod.apply(
            {"params": {"denoise_fn": p_net}}, cond,
            gt_spec=gt_b, infer=True, infer_speedup=infer_speedup,
            sampler=sampler, k_step=k_step, key=jax.random.PRNGKey(0),
            init_noise=noise_own, denoise_wrapper=wrapper,
        )

    spec_frames = P(None, axis, None)
    fn = _cached_jit(
        ("unit2mel", model, mesh, axis, units.shape, k_step, infer_speedup, sampler, gt_spec is None),
        lambda: jax.shard_map(
            block,
            mesh=mesh,
            in_specs=(
                P(), spec_frames, spec_frames, spec_frames, spec_frames,
                P(axis, None), P(),
            ),
            out_specs=spec_frames,
            check_vma=False,
        )
    )
    return fn(variables, units, f0, volume, gt_spec, init_keys, spk_id)


def streamed_forward(model, variables, units, f0, volume, key, mesh,
                     axis: str = "time", mel=None, spk_id=None, **kwargs):
    """Dispatch time-sharded synthesis by model class.

    DDSP synths return audio; cascades return refined mel (pass ``mel``,
    the LogMelSpectrogram whose hop == block_size). Chain with
    streamed_nsf_hifigan for audio out of the cascades.
    """
    from ..models.cascade import ReflowUnit2Wav, Unit2Mel, Unit2Wav, Unit2WavFast
    from ..models.ddsp import CombSub, CombSubFast, CombSubSuperFast, Sins

    if isinstance(model, CombSubSuperFast):
        return streamed_combsub_forward(
            model, variables, units, f0, volume, key, spk_id=spk_id,
            mesh=mesh, axis=axis,
        )
    if isinstance(model, Sins):
        return streamed_sins_forward(
            model, variables, units, f0, volume, key, spk_id=spk_id,
            mesh=mesh, axis=axis, **kwargs,
        )
    if isinstance(model, CombSub):
        return streamed_combsub_old_forward(
            model, variables, units, f0, volume, key, spk_id=spk_id,
            mesh=mesh, axis=axis,
        )
    if isinstance(model, CombSubFast):
        return streamed_combsub_fast_forward(
            model, variables, units, f0, volume, key, spk_id=spk_id,
            mesh=mesh, axis=axis,
        )
    if isinstance(model, (Unit2WavFast, ReflowUnit2Wav)):
        family = "reflow" if isinstance(model, ReflowUnit2Wav) else "diffusion"
        return streamed_cascade_mel(
            model, variables, units, f0, volume, key, mel, spk_id=spk_id,
            mesh=mesh, axis=axis, family=family, **kwargs,
        )
    if isinstance(model, Unit2Wav):
        return streamed_unit2wav_new_mel(
            model, variables, units, f0, volume, key, mel, spk_id=spk_id,
            mesh=mesh, axis=axis, **kwargs,
        )
    if isinstance(model, Unit2Mel):
        return streamed_unit2mel(
            model, variables, units, f0, volume,
            kwargs.pop("gt_spec", None), key, spk_id=spk_id, mesh=mesh,
            axis=axis, **kwargs,
        )
    raise NotImplementedError(type(model).__name__)
