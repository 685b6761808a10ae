"""Streamed diffusion / reflow cascade drivers (overlap-save mel blocks).

Split out of parallel/stream.py; see stream_core for the toolkit and
parallel/stream.py for the dispatch + consistency contract.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..models.ddsp import CombSubSuperFast
from .stream_core import (
    DENOISER_HALO,
    FRAME_HALO,
    WAVENET_HALO,
    _blocked_logmel,
    _cached_jit,
    _frame_halo,
    blocked_noise,
    blocked_noise_frames,
    blocked_uniform,
)
from .stream_combsub import _combsub_block, _combsubfast_block

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


