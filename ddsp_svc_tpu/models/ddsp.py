"""DDSP synthesizer models: Sins, CombSub, CombSubFast, CombSubSuperFast.

Reference: ddsp/vocoder.py:532-862. All four models share the pattern
   exciter source  ->  Unit2Control-predicted filters  ->  filtered + noise.

TPU design notes:
  - Exciter phase uses the f32-safe wrapped-carry accumulation
    (ops/source.py) instead of the reference's float64 cumsum at inference
    (ddsp/vocoder.py:566,745,821) — TPUs have no fast f64.
  - CombSubSuperFast's STFT filtering runs through ops/spectral.stft/istft
    (torch.stft-parity, static shapes); the sqrt-hann framed rFFT/OLA path
    of CombSubFast reuses the same frame/OLA kernels.
  - Noise exciters draw from the 'noise' RNG collection; distributions match
    the reference (uniform*2-1 / unit normal), streams are jax.random.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fir import frequency_filter
from ..ops.interp import remove_above_fmax, upsample
from ..ops.source import cumsum_phase_source, fast_source_gen
from ..ops.spectral import frame_signal, istft, overlap_add, stft
from ..ops.window import hann_window, sqrt_hann_window
from .unit2control import Unit2Control


def sins_harmonic_bank(phase, amplitudes_frames, block_size, max_upsample_dim=32):
    """Harmonic sine bank summed in chunks (ddsp/vocoder.py:589-594).

    phase: (B, L, 1) radians; amplitudes_frames: (B, T, n_harm) -> (B, L).
    """
    n_harmonic = amplitudes_frames.shape[-1]
    level_harmonic = jnp.arange(1, n_harmonic + 1, dtype=phase.dtype)
    sinusoids = 0.0
    for n in range((n_harmonic - 1) // max_upsample_dim + 1):
        start = n * max_upsample_dim
        end = (n + 1) * max_upsample_dim
        phases = phase * level_harmonic[start:end]
        amplitudes = upsample(amplitudes_frames[:, :, start:end], block_size)
        sinusoids += jnp.sum(jnp.sin(phases) * amplitudes, axis=-1)
    return sinusoids


class Sins(nn.Module):
    """Sinusoids additive synthesiser (ddsp/vocoder.py:532-611)."""

    sampling_rate: int
    block_size: int
    n_harmonics: int
    n_mag_allpass: int
    n_mag_noise: int
    n_unit: int = 256
    n_spk: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def controls(
        self,
        units_frames,
        f0_frames,
        phase_frames,
        volume_frames,
        spk_id=None,
        spk_mix_dict=None,
        deterministic=True,
        frame_mask=None,
        stream_axis=None,
        edge_mask=None,
    ):
        """-> (amplitudes, group_delay, noise_param, hidden); amplitudes are
        exp-scaled and fmax-masked."""
        ctrls, hidden = Unit2Control(
            self.n_unit,
            self.n_spk,
            {
                "amplitudes": self.n_harmonics,
                "group_delay": self.n_mag_allpass,
                "noise_magnitude": self.n_mag_noise,
            },
            dtype=self.dtype,
            name="unit2ctrl",
        )(
            units_frames,
            f0_frames,
            phase_frames,
            volume_frames,
            spk_id=spk_id,
            spk_mix_dict=spk_mix_dict,
            deterministic=deterministic,
            frame_mask=frame_mask,
            stream_axis=stream_axis,
            edge_mask=edge_mask,
        )
        amplitudes_frames = jnp.exp(ctrls["amplitudes"]) / 128.0
        group_delay = np.pi * jnp.tanh(ctrls["group_delay"])
        noise_param = jnp.exp(ctrls["noise_magnitude"]) / 128.0
        amplitudes_frames = remove_above_fmax(
            amplitudes_frames, f0_frames, self.sampling_rate / 2, level_start=1
        )
        return amplitudes_frames, group_delay, noise_param, hidden

    def __call__(
        self,
        units_frames,
        f0_frames,
        volume_frames,
        spk_id=None,
        spk_mix_dict=None,
        initial_phase=None,
        infer=True,
        max_upsample_dim=32,
        deterministic=True,
        noise=None,
    ):
        f0 = upsample(f0_frames, self.block_size)
        x = cumsum_phase_source(f0, self.sampling_rate, self.block_size, initial_phase)
        phase = 2.0 * np.pi * x
        phase_frames = phase[:, :: self.block_size, :]

        amplitudes_frames, group_delay, noise_param, hidden = self.controls(
            units_frames,
            f0_frames,
            phase_frames,
            volume_frames,
            spk_id=spk_id,
            spk_mix_dict=spk_mix_dict,
            deterministic=deterministic,
        )

        sinusoids = sins_harmonic_bank(
            phase, amplitudes_frames, self.block_size, max_upsample_dim
        )
        harmonic = frequency_filter(
            sinusoids,
            jnp.exp(1j * jnp.cumsum(group_delay, axis=-1)),
            hann_window_flag=False,
        )
        if noise is None:
            noise = (
                jax.random.uniform(
                    self.make_rng("noise"), harmonic.shape, harmonic.dtype
                )
                * 2.0
                - 1.0
            )
        noise = frequency_filter(noise, noise_param + 0j, hann_window_flag=True)
        signal = harmonic + noise
        return signal, hidden, (harmonic, noise)


def combsub_stft_synthesis(
    combtooth, noise, src_filter, noise_filter, win_length, block_size,
    pad_mode="reflect",
):
    """Parameter-free STFT-domain filtering (ddsp/vocoder.py:676-708):
    stft(comb)*H_src + stft(noise)*H_noise -> istft. Filters: (B, T+1, F)."""
    window = jnp.asarray(hann_window(win_length))
    combtooth_stft = stft(
        combtooth, win_length, block_size, window=window, pad_mode=pad_mode
    )
    noise_stft = stft(
        noise, win_length, block_size, window=window, pad_mode=pad_mode
    )
    signal_stft = combtooth_stft * src_filter.transpose(
        0, 2, 1
    ) + noise_stft * noise_filter.transpose(0, 2, 1)
    return istft(signal_stft, win_length, block_size, window=window)


class CombSubSuperFast(nn.Module):
    """Combtooth subtractive synthesiser, STFT-domain (ddsp/vocoder.py:613-710).

    The flagship/default model (configs/combsub.yaml). The forward is split
    into ``controls`` (the parameterized Unit2Control part — finite receptive
    field over frames) and the pure ``combsub_stft_synthesis`` so the
    streaming engine (parallel/stream.py) can run both on haloed time blocks.
    """

    sampling_rate: int
    block_size: int
    win_length: int
    n_unit: int = 256
    n_spk: int = 1
    use_pitch_aug: bool = False
    use_pallas_source: bool = False  # fused TPU exciter (ops/pallas_source)
    dtype: jnp.dtype | None = None

    @nn.compact
    def controls(
        self,
        units_frames,
        f0_frames,
        phase_frames,
        volume_frames,
        spk_id=None,
        spk_mix_dict=None,
        aug_shift=None,
        deterministic=True,
        frame_mask=None,
        stream_axis=None,
        edge_mask=None,
    ):
        """(B, T, ...) frames -> (src_filter, noise_filter, hidden), filters
        (B, T, win//2+1) complex (without the reference's +1 edge frame)."""
        ctrls, hidden = Unit2Control(
            self.n_unit,
            self.n_spk,
            {
                "harmonic_magnitude": self.win_length // 2 + 1,
                "harmonic_phase": self.win_length // 2 + 1,
                "noise_magnitude": self.win_length // 2 + 1,
                "noise_phase": self.win_length // 2 + 1,
            },
            use_pitch_aug=self.use_pitch_aug,
            use_naive_v2=True,
            use_conv_stack=True,
            dtype=self.dtype,
            name="unit2ctrl",
        )(
            units_frames,
            f0_frames,
            phase_frames,
            volume_frames,
            spk_id=spk_id,
            spk_mix_dict=spk_mix_dict,
            aug_shift=aug_shift,
            deterministic=deterministic,
            frame_mask=frame_mask,
            stream_axis=stream_axis,
            edge_mask=edge_mask,
        )
        src_filter = jnp.exp(
            ctrls["harmonic_magnitude"] + 1j * np.pi * ctrls["harmonic_phase"]
        )
        noise_filter = (
            jnp.exp(ctrls["noise_magnitude"] + 1j * np.pi * ctrls["noise_phase"]) / 128.0
        )
        return src_filter, noise_filter, hidden

    def __call__(
        self,
        units_frames,
        f0_frames,
        volume_frames,
        spk_id=None,
        spk_mix_dict=None,
        aug_shift=None,
        initial_phase=None,
        infer=True,
        deterministic=True,
        noise_key=None,
        noise=None,
    ):
        if self.use_pallas_source:
            from ..ops.pallas_source import combtooth_pallas

            combtooth, phase_frames = combtooth_pallas(
                f0_frames, self.sampling_rate, self.block_size
            )
        else:
            combtooth, phase_frames = fast_source_gen(
                f0_frames, self.sampling_rate, self.block_size
            )
        src_filter, noise_filter, hidden = self.controls(
            units_frames,
            f0_frames,
            phase_frames,
            volume_frames,
            spk_id=spk_id,
            spk_mix_dict=spk_mix_dict,
            aug_shift=aug_shift,
            deterministic=deterministic,
        )
        # duplicate the last filter frame for the (T+1)-th stft frame
        src_filter = jnp.concatenate([src_filter, src_filter[:, -1:, :]], axis=1)
        noise_filter = jnp.concatenate(
            [noise_filter, noise_filter[:, -1:, :]], axis=1
        )
        if noise is None:
            if noise_key is None:
                noise_key = self.make_rng("noise")
            noise = jax.random.normal(noise_key, combtooth.shape, combtooth.dtype)
        pad_mode = (
            "reflect" if combtooth.shape[-1] > self.win_length // 2 else "constant"
        )
        signal = combsub_stft_synthesis(
            combtooth, noise, src_filter, noise_filter,
            self.win_length, self.block_size, pad_mode,
        )
        return signal, hidden, (signal, signal)


def combsub_fast_synthesis(combtooth, noise, src_filter, noise_filter, block):
    """Parameter-free framed-rFFT filtering + OLA (ddsp/vocoder.py:763-784).

    Filters: (B, T+1, block+1); signals (B, T*block) -> (B, T*block).
    """
    window = jnp.asarray(sqrt_hann_window(2 * block))

    def filtered_frames(sig, filt):
        frames = frame_signal(jnp.pad(sig, ((0, 0), (block, block))), 2 * block, block)
        frames = frames * window
        fft = jnp.fft.rfft(frames, 2 * block, axis=-1)
        return jnp.fft.irfft(fft * filt, 2 * block, axis=-1) * window

    ct_frames = filtered_frames(combtooth, src_filter)
    ns_frames = filtered_frames(noise, noise_filter + 0j)
    return overlap_add(ct_frames + ns_frames, block)[:, block:-block]


class CombSubFast(nn.Module):
    """Combtooth subtractive synthesiser, framed-rFFT OLA (ddsp/vocoder.py:712-786).

    Split into ``controls`` + pure ``combsub_fast_synthesis`` for the
    streaming engine, like CombSubSuperFast.
    """

    sampling_rate: int
    block_size: int
    n_unit: int = 256
    n_spk: int = 1
    use_pitch_aug: bool = False
    pcmer_norm: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def controls(
        self,
        units_frames,
        f0_frames,
        phase_frames,
        volume_frames,
        spk_id=None,
        spk_mix_dict=None,
        aug_shift=None,
        deterministic=True,
        frame_mask=None,
        stream_axis=None,
        edge_mask=None,
    ):
        """-> (src_filter complex, noise_filter real, hidden), filters
        (B, T, block+1) without the +1 edge frame."""
        block = self.block_size
        ctrls, hidden = Unit2Control(
            self.n_unit,
            self.n_spk,
            {
                "harmonic_magnitude": block + 1,
                "harmonic_phase": block + 1,
                "noise_magnitude": block + 1,
            },
            use_pitch_aug=self.use_pitch_aug,
            pcmer_norm=self.pcmer_norm,
            dtype=self.dtype,
            name="unit2ctrl",
        )(
            units_frames,
            f0_frames,
            phase_frames,
            volume_frames,
            spk_id=spk_id,
            spk_mix_dict=spk_mix_dict,
            aug_shift=aug_shift,
            deterministic=deterministic,
            frame_mask=frame_mask,
            stream_axis=stream_axis,
            edge_mask=edge_mask,
        )
        src_filter = jnp.exp(
            ctrls["harmonic_magnitude"] + 1j * np.pi * ctrls["harmonic_phase"]
        )
        noise_filter = jnp.exp(ctrls["noise_magnitude"]) / 128.0
        return src_filter, noise_filter, hidden

    def __call__(
        self,
        units_frames,
        f0_frames,
        volume_frames,
        spk_id=None,
        spk_mix_dict=None,
        aug_shift=None,
        initial_phase=None,
        infer=True,
        deterministic=True,
        noise_key=None,
        noise=None,
    ):
        block = self.block_size
        f0 = upsample(f0_frames, block)
        x = cumsum_phase_source(f0, self.sampling_rate, block, initial_phase)
        phase_frames = 2.0 * np.pi * x[:, ::block, :]

        src_filter, noise_filter, hidden = self.controls(
            units_frames,
            f0_frames,
            phase_frames,
            volume_frames,
            spk_id=spk_id,
            spk_mix_dict=spk_mix_dict,
            aug_shift=aug_shift,
            deterministic=deterministic,
        )
        src_filter = jnp.concatenate([src_filter, src_filter[:, -1:, :]], axis=1)
        noise_filter = jnp.concatenate([noise_filter, noise_filter[:, -1:, :]], axis=1)

        combtooth = jnp.sinc(self.sampling_rate * x / (f0 + 1e-3))[..., 0]
        if noise is None:
            if noise_key is None:
                noise_key = self.make_rng("noise")
            noise = (
                jax.random.uniform(noise_key, combtooth.shape, combtooth.dtype) * 2.0
                - 1.0
            )
        signal = combsub_fast_synthesis(
            combtooth, noise, src_filter, noise_filter, block
        )
        return signal, hidden, (signal, signal)


class CombSub(nn.Module):
    """Combtooth subtractive synthesiser, LTV-FIR (old version,
    ddsp/vocoder.py:788-862)."""

    sampling_rate: int
    block_size: int
    n_mag_allpass: int
    n_mag_harmonic: int
    n_mag_noise: int
    n_unit: int = 256
    n_spk: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def controls(
        self,
        units_frames,
        f0_frames,
        phase_frames,
        volume_frames,
        spk_id=None,
        spk_mix_dict=None,
        deterministic=True,
        frame_mask=None,
        stream_axis=None,
        edge_mask=None,
    ):
        """-> (group_delay, src_param, noise_param, hidden)."""
        ctrls, hidden = Unit2Control(
            self.n_unit,
            self.n_spk,
            {
                "group_delay": self.n_mag_allpass,
                "harmonic_magnitude": self.n_mag_harmonic,
                "noise_magnitude": self.n_mag_noise,
            },
            dtype=self.dtype,
            name="unit2ctrl",
        )(
            units_frames,
            f0_frames,
            phase_frames,
            volume_frames,
            spk_id=spk_id,
            spk_mix_dict=spk_mix_dict,
            deterministic=deterministic,
            frame_mask=frame_mask,
            stream_axis=stream_axis,
            edge_mask=edge_mask,
        )
        group_delay = np.pi * jnp.tanh(ctrls["group_delay"])
        src_param = jnp.exp(ctrls["harmonic_magnitude"])
        noise_param = jnp.exp(ctrls["noise_magnitude"]) / 128.0
        return group_delay, src_param, noise_param, hidden

    def __call__(
        self,
        units_frames,
        f0_frames,
        volume_frames,
        spk_id=None,
        spk_mix_dict=None,
        initial_phase=None,
        infer=True,
        deterministic=True,
        noise=None,
    ):
        f0 = upsample(f0_frames, self.block_size)
        x = cumsum_phase_source(f0, self.sampling_rate, self.block_size, initial_phase)
        phase_frames = 2.0 * np.pi * x[:, :: self.block_size, :]

        group_delay, src_param, noise_param, hidden = self.controls(
            units_frames,
            f0_frames,
            phase_frames,
            volume_frames,
            spk_id=spk_id,
            spk_mix_dict=spk_mix_dict,
            deterministic=deterministic,
        )

        combtooth = jnp.sinc(self.sampling_rate * x / (f0 + 1e-3))[..., 0]

        harmonic = frequency_filter(
            combtooth,
            jnp.exp(1j * jnp.cumsum(group_delay, axis=-1)),
            hann_window_flag=False,
        )
        harmonic = frequency_filter(
            harmonic,
            src_param + 0j,
            hann_window_flag=True,
            half_width_frames=1.5 * self.sampling_rate / (f0_frames + 1e-3),
        )
        if noise is None:
            noise = (
                jax.random.uniform(
                    self.make_rng("noise"), harmonic.shape, harmonic.dtype
                )
                * 2.0
                - 1.0
            )
        noise = frequency_filter(noise, noise_param + 0j, hann_window_flag=True)
        signal = harmonic + noise
        return signal, hidden, (harmonic, noise)
