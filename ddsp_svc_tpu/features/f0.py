"""F0 extraction front-end.

Reference dispatch: F0_Extractor (ddsp/vocoder.py:22-144) over parselmouth /
dio / harvest / crepe / rmvpe / fcpe. This image ships none of those native
pip libraries, so the framework provides:

  - 'yin'  — a built-in dependency-free vectorized YIN (de Cheveigné &
             Kawahara 2002) on the exact synth hop grid; the default when no
             external extractor is installed.
  - 'rmvpe' — the reference's default extractor, as a JAX port of the RMVPE
             net (features/rmvpe.py); needs converted pretrained weights.
  - 'praat' (+ 'parselmouth' fallback) — native Boersma autocorrelation
             tracker (features/praat.py), the algorithm the parselmouth
             wheel wraps.
  - 'dio'  — native DIO + StoneMask (features/dio.py) when pyworld is absent.
  - 'harvest' — native Harvest port (features/harvest.py, Morise 2017
             candidate-bank structure) when pyworld is absent.
  - 'fcpe' — JAX CFNaiveMelPE port (features/fcpe.py); needs converted
             pretrained weights (convert/fcpe.py).
  - 'parselmouth' / 'dio' / 'harvest' / 'crepe' / 'fcpe' — the wheel paths
             with the reference's exact parameters, used when installed.

All paths share the reference's framing contract: n_frames = len//hop + 1,
silence_front frame skipping (ddsp/vocoder.py:50-52), optional unvoiced
interpolation + f0_min floor (ddsp/vocoder.py:139-144).
"""
from __future__ import annotations

import numpy as np


def decimation_filter(factor: int) -> np.ndarray:
    """Windowed-sinc low-pass taps for polyphase decimation by ``factor``
    (Kaiser beta=9, cutoff 0.92 of the decimated Nyquist, 32*factor+1 taps,
    unit DC gain). Shared by the host YIN (yin_f0 below) and the on-device
    mirror (features/yin_jax.py) so the two front-ends stay numerically
    identical: designed host-side in f64, applied in f32 by both. A brick-
    wall FFT resampler would be marginally sharper but needs a full-length
    non-power-of-2 FFT, which the TPU backend cannot compile (XLA lowers it
    to an O(n^2) DFT; PERF.md devf0 note) — and YIN's pitch lattice only
    needs the band below sr/(2*factor) preserved, which this filter does to
    ~90 dB stopband."""
    taps = 32 * factor + 1
    cutoff = 0.92 * 0.5 / factor  # cycles/sample at the ORIGINAL rate
    t = np.arange(taps, dtype=np.float64) - (taps - 1) / 2
    h = 2.0 * cutoff * np.sinc(2.0 * cutoff * t) * np.kaiser(taps, 9.0)
    return (h / h.sum()).astype(np.float32)


def _decimate_fir(audio: np.ndarray, factor: int) -> np.ndarray:
    """Polyphase FIR decimation: y[m] = sum_t h[t] x[m*factor + t - T//2]
    (zero-padded edges), n_out = len(audio)//factor — the host half of the
    shared-decimator contract above."""
    h = decimation_filter(factor)
    half = len(h) // 2
    x = np.pad(np.asarray(audio, np.float32), (half, half))
    n_out = len(audio) // factor
    windows = np.lib.stride_tricks.sliding_window_view(x, len(h))[
        : n_out * factor : factor
    ]
    return windows @ h


def _interp_unvoiced(f0: np.ndarray) -> np.ndarray:
    uv = f0 == 0
    if (~uv).any():
        f0 = f0.copy()
        f0[uv] = np.interp(np.where(uv)[0], np.where(~uv)[0], f0[~uv])
    return f0


def _regrid_10ms(f0: np.ndarray, uv: np.ndarray, hop_size: int, sample_rate: int,
                 n_out: int) -> np.ndarray:
    """Map a 10 ms-grid f0 track onto the synth hop grid
    (ddsp/vocoder.py:110-118 rmvpe path)."""
    f0 = _interp_unvoiced(f0)
    origin_time = 0.01 * np.arange(len(f0))
    target_time = hop_size / sample_rate * np.arange(n_out)
    out = np.interp(target_time, origin_time, f0)
    uv_t = np.interp(target_time, origin_time, uv.astype(float)) > 0.5
    out[uv_t] = 0
    return out


def yin_f0(
    audio: np.ndarray,
    sample_rate: int,
    hop_size: int,
    f0_min: float = 65.0,
    f0_max: float = 800.0,
    threshold: float = 0.1,
    voicing_threshold: float = 0.35,
    decimate: bool = True,
) -> np.ndarray:
    """Vectorized YIN pitch tracker on the hop grid.

    Returns (n_frames,) f0 in Hz with 0 for unvoiced,
    n_frames = len(audio)//hop + 1.

    ``decimate`` halves the analysis rate while tau resolution stays
    >= 16 samples/period at f0_max (parabolic interpolation keeps the
    sub-sample estimate; the accuracy suite bounds stay green) — YIN is
    the host-side front-end of every realtime block and serving request,
    so its wall time is on the serving critical path (~4x faster with
    decimation + f32 FFTs; see bench_serving_diffusion).
    """
    factor = 1
    if decimate:
        while (
            sample_rate / (factor * 2) >= 16.0 * f0_max
            and hop_size % (factor * 2) == 0
            and len(audio) > 4 * factor
        ):
            factor *= 2
    if factor > 1:
        # polyphase FIR decimation (strided samples of the original grid:
        # the effective rate is exactly sample_rate/factor, no skew term) —
        # the same taps drive the on-device mirror (features/yin_jax.py),
        # keeping host and device YIN numerically identical
        audio = _decimate_fir(audio, factor)
        sample_rate = sample_rate / factor
        hop_size //= factor
    # f32 in fast (decimated) mode; decimate=False keeps the original f64
    # numerics (cmndf is a difference of large cumsums — callers opting out
    # of the fast path get the cancellation-safe dtype back)
    audio = np.asarray(audio, dtype=np.float32 if decimate else np.float64)
    tau_max = int(sample_rate / f0_min) + 1
    tau_min = max(int(sample_rate / f0_max), 2)
    win = tau_max  # integration window
    frame_len = win + tau_max
    n_frames = int(len(audio) // hop_size) + 1

    pad = frame_len
    x = np.pad(audio, (frame_len // 2, pad))
    idx = np.arange(n_frames)[:, None] * hop_size + np.arange(frame_len)[None, :]
    frames = x[idx]  # (T, frame_len)

    # difference function d(tau) = sum_{j<win} (x[j] - x[j+tau])^2
    #   = e0 + e_tau - 2 * c(tau),  c(tau) = sum_{j<win} x[j] x[j+tau]
    # computed with one FFT cross-correlation per frame
    n_fft = 1 << int(np.ceil(np.log2(2 * frame_len)))
    head = np.fft.rfft(frames[:, :win], n_fft, axis=1)
    full = np.fft.rfft(frames, n_fft, axis=1)
    corr = np.fft.irfft(np.conj(head) * full, n_fft, axis=1)[:, :tau_max]  # (T, tau)
    csum = np.cumsum(frames**2, axis=1)
    csum = np.pad(csum, ((0, 0), (1, 0)))
    e0 = csum[:, win] - csum[:, 0]  # scalar per frame
    taus = np.arange(tau_max)
    e_tau = csum[:, taus + win] - csum[:, taus]  # (T, tau)
    d = e0[:, None] + e_tau - 2.0 * corr
    d = np.maximum(d, 0.0)

    # cumulative-mean-normalized difference
    dsum = np.cumsum(d[:, 1:], axis=1)
    cmndf = np.ones_like(d)
    cmndf[:, 1:] = d[:, 1:] * np.arange(1, tau_max) / np.maximum(dsum, 1e-12)

    region = cmndf[:, tau_min:tau_max]
    n_tau = region.shape[1]
    t_idx = np.arange(region.shape[0])
    below = region < threshold
    first = np.where(below.any(axis=1), below.argmax(axis=1), region.argmin(axis=1))
    # descend to the first local minimum at/after the crossing point:
    # the first index q >= first where cmndf stops decreasing
    rising = np.concatenate(
        [region[:, 1:] >= region[:, :-1], np.ones((region.shape[0], 1), bool)], axis=1
    )
    eligible = rising & (np.arange(n_tau)[None, :] >= first[:, None])
    cur = eligible.argmax(axis=1)  # first rising point >= first (always exists)
    tau = cur + tau_min

    # parabolic interpolation around tau
    tau_c = np.clip(tau, tau_min + 1, tau_max - 2)
    d0 = cmndf[t_idx, tau_c - 1]
    d1 = cmndf[t_idx, tau_c]
    d2 = cmndf[t_idx, tau_c + 1]
    denom = d0 + d2 - 2.0 * d1
    delta = np.where(np.abs(denom) > 1e-12, 0.5 * (d0 - d2) / np.maximum(np.abs(denom), 1e-12) * np.sign(denom), 0.0)
    delta = np.clip(delta, -1.0, 1.0)
    tau_f = tau_c + np.where(tau == tau_c, delta, 0.0)

    f0 = sample_rate / np.maximum(tau_f, 1e-6)
    voiced = (cmndf[t_idx, tau_c] < voicing_threshold) & (f0 >= f0_min) & (f0 <= f0_max)
    # also require actual signal energy
    voiced &= e0 > 1e-8
    return np.where(voiced, f0, 0.0).astype(np.float32)


class F0Extractor:
    """Reference-compatible F0 front-end (ddsp/vocoder.py:22-144)."""

    def __init__(
        self,
        f0_extractor: str,
        sample_rate: int = 44100,
        hop_size: int = 512,
        f0_min: float = 65.0,
        f0_max: float = 800.0,
        model_params=None,  # converted weights for rmvpe / crepe
        use_viterbi: bool = False,  # rmvpe: viterbi-smoothed bin path
    ):
        self.sample_rate = sample_rate
        self.hop_size = hop_size
        self.f0_min = f0_min
        self.f0_max = f0_max
        self.use_viterbi = use_viterbi
        if f0_extractor == "fcpe" and model_params is None:
            # prefer the torchfcpe wheel when installed (reference parity);
            # otherwise use the native JAX port with converted weights
            try:
                import torchfcpe  # noqa: F401
            except ImportError:
                pass
            else:
                self._fcpe_wheel = True
        if (
            f0_extractor in ("rmvpe", "crepe")
            or (f0_extractor == "fcpe" and not getattr(self, "_fcpe_wheel", False))
        ) and model_params is None:
            # pretrained nets are useless at random init: auto-load the
            # converted weights, else fall back to the built-in YIN with a
            # warning (never silently extract pitch with a random net)
            import os

            default = {
                "rmvpe": "pretrain/rmvpe/model.msgpack",
                "crepe": "pretrain/crepe/full.msgpack",
                "fcpe": "pretrain/fcpe/fcpe.msgpack",
            }[f0_extractor]
            path = os.environ.get(
                f"DDSP_SVC_TPU_{f0_extractor.upper()}_CKPT", default
            )
            from ..utils.params import load_params

            model_params = load_params(path)
            if model_params is None:
                print(
                    f" [!] no converted {f0_extractor} weights at {path!r} — "
                    "falling back to the built-in YIN extractor"
                )
                f0_extractor = "yin"
        self.f0_extractor = f0_extractor
        if f0_extractor == "rmvpe":
            from .rmvpe import RMVPE

            self.rmvpe = RMVPE(model_params)
        if f0_extractor == "crepe":
            from .crepe import CrepeInfer

            self.crepe = CrepeInfer(model_params)
        if f0_extractor == "fcpe" and model_params is not None:
            from .fcpe import FCPEInfer

            self.fcpe = FCPEInfer(model_params)

    def _pyworld_f0(self, pw, audio, kind, n_frames, start_frame):
        """pyworld wheel path (ddsp/vocoder.py:77-97 parity)."""
        if kind == "dio":
            _f0, t = pw.dio(
                audio.astype("double"), self.sample_rate,
                f0_floor=self.f0_min, f0_ceil=self.f0_max,
                channels_in_octave=2,
                frame_period=(1000 * self.hop_size / self.sample_rate),
            )
            f0 = pw.stonemask(audio.astype("double"), _f0, t, self.sample_rate)
        else:
            f0, _ = pw.harvest(
                audio.astype("double"), self.sample_rate,
                f0_floor=self.f0_min, f0_ceil=self.f0_max,
                frame_period=(1000 * self.hop_size / self.sample_rate),
            )
        return np.pad(
            f0.astype("float"), (start_frame, n_frames - len(f0) - start_frame)
        )

    def extract(
        self,
        audio: np.ndarray,
        uv_interp: bool = False,
        silence_front: float = 0.0,
    ) -> np.ndarray:
        n_frames = int(len(audio) // self.hop_size) + 1
        start_frame = int(silence_front * self.sample_rate / self.hop_size)
        real_silence_front = start_frame * self.hop_size / self.sample_rate
        audio = audio[int(np.round(real_silence_front * self.sample_rate)) :]

        kind = self.f0_extractor
        if kind == "yin":
            f0 = yin_f0(
                audio, self.sample_rate, self.hop_size, self.f0_min, self.f0_max
            )[: n_frames - start_frame]
            f0 = np.pad(f0, (start_frame, max(0, n_frames - start_frame - len(f0))))
        elif kind == "crepe":
            import jax.numpy as jnp

            from ..ops.interp import masked_avg_pool_1d, median_pool_1d

            f0_5ms, pd = self.crepe.infer_from_audio(
                audio, self.sample_rate, fmin=self.f0_min, fmax=self.f0_max
            )
            # median-pool periodicity, threshold at 0.05, masked-average
            # smoothing (ddsp/vocoder.py:92-105)
            pd = np.asarray(median_pool_1d(jnp.asarray(pd)[None, :], 4))[0]
            f0_5ms = np.where(pd < 0.05, np.nan, f0_5ms)
            f0_s = np.asarray(
                masked_avg_pool_1d(jnp.asarray(f0_5ms)[None, :], 4)
            )[0]
            n_out = n_frames - start_frame
            idx = np.minimum(
                np.round(
                    np.arange(n_out) * self.hop_size / self.sample_rate / 0.005
                ).astype(int),
                len(f0_s) - 1,
            )
            f0 = np.nan_to_num(f0_s[idx])
            f0 = np.pad(f0, (start_frame, 0))
        elif kind == "rmvpe":
            f0_10ms = self.rmvpe.infer_from_audio(
                audio, self.sample_rate, thred=0.03,
                use_viterbi=self.use_viterbi,
            )
            uv = f0_10ms == 0
            f0 = _regrid_10ms(
                f0_10ms, uv, self.hop_size, self.sample_rate, n_frames - start_frame
            )
            f0 = np.pad(f0, (start_frame, 0))
        elif kind in ("parselmouth", "praat"):
            try:
                if kind == "praat":
                    raise ImportError  # native path requested explicitly
                import parselmouth
            except ImportError:
                # native Boersma AC tracker (features/praat.py) — same
                # algorithm the parselmouth wheel wraps
                from .praat import praat_ac_f0

                f0 = praat_ac_f0(
                    audio, self.sample_rate, self.hop_size,
                    self.f0_min, self.f0_max,
                )[: n_frames - start_frame]
                f0 = np.pad(
                    f0, (start_frame, n_frames - start_frame - len(f0))
                )
            else:
                l_pad = int(np.ceil(1.5 / self.f0_min * self.sample_rate))
                r_pad = (
                    self.hop_size * ((len(audio) - 1) // self.hop_size + 1)
                    - len(audio) + l_pad + 1
                )
                s = parselmouth.Sound(
                    np.pad(audio, (l_pad, r_pad)), self.sample_rate
                ).to_pitch_ac(
                    time_step=self.hop_size / self.sample_rate,
                    voicing_threshold=0.6,
                    pitch_floor=self.f0_min,
                    pitch_ceiling=self.f0_max,
                )
                assert np.abs(s.t1 - 1.5 / self.f0_min) < 0.001
                f0 = np.pad(s.selected_array["frequency"], (start_frame, 0))
                if len(f0) < n_frames:
                    f0 = np.pad(f0, (0, n_frames - len(f0)))
                f0 = f0[:n_frames]
        elif kind in ("dio", "harvest"):
            try:
                import pyworld as pw
            except ImportError:
                # native trackers: DIO + StoneMask (features/dio.py) and a
                # real Harvest port (features/harvest.py) — no aliasing
                if kind == "dio":
                    from .dio import dio_stonemask_f0 as native_f0
                else:
                    from .harvest import harvest_stonemask_f0 as native_f0

                f0 = native_f0(
                    audio, self.sample_rate, self.hop_size,
                    self.f0_min, self.f0_max,
                )[: n_frames - start_frame]
                f0 = np.pad(
                    f0, (start_frame, n_frames - start_frame - len(f0))
                )
            else:
                f0 = self._pyworld_f0(pw, audio, kind, n_frames, start_frame)
        elif kind == "fcpe":
            if getattr(self, "fcpe", None) is not None:
                # native JAX port (features/fcpe.py), converted weights
                f0_10ms = self.fcpe.infer_from_audio(
                    audio, self.sample_rate, threshold=0.006
                )
            else:
                # wheel path (ddsp/vocoder.py:121-133 parity)
                import torch
                from torchfcpe import spawn_bundled_infer_model

                fcpe = spawn_bundled_infer_model(device="cpu")
                f0_10ms = (
                    fcpe(
                        torch.from_numpy(audio).unsqueeze(0),
                        sr=self.sample_rate,
                        decoder_mode="local_argmax", threshold=0.006,
                    )
                    .squeeze()
                    .cpu()
                    .numpy()
                )
            uv = f0_10ms == 0
            f0 = _regrid_10ms(
                f0_10ms, uv, self.hop_size, self.sample_rate, n_frames - start_frame
            )
            f0 = np.pad(f0, (start_frame, 0))
        else:
            raise ValueError(
                f" [x] Unknown or unavailable f0 extractor: {kind} "
                "(built-ins: yin, rmvpe, crepe; optional: parselmouth, dio, "
                "harvest, fcpe)"
            )

        f0 = np.asarray(f0, dtype=np.float32)
        if uv_interp:
            f0 = _interp_unvoiced(f0)
            f0[f0 < self.f0_min] = self.f0_min
        return f0
