"""Streamed NSF-HiFiGAN vocoder driver: mel time blocks -> audio.

Split out of parallel/stream.py; see stream_core for the toolkit and
parallel/stream.py for the dispatch + consistency contract.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .stream_core import (
    VOCODER_HALO,
    _carry_prefix_offset,
    _cached_jit,
    _frame_halo,
    _sine_noise_from_keys,
    _sine_rand_ini,
)

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



