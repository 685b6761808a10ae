"""On-device (jittable) YIN pitch tracker.

A jnp mirror of ``features/f0.py::yin_f0`` (de Cheveigne & Kawahara 2002;
the framework's built-in extractor behind the reference's F0_Extractor
dispatch, ddsp/vocoder.py:22-144). Motivation (PERF.md full-stack serving
ladder): the host YIN is ~23 ms of serial GIL-bound numpy per request and
threads barely overlap it (1.31x concurrency speedup measured), while
device dispatches from concurrent request threads DO overlap on the async
queue. Running YIN as one jitted graph per request keeps the whole
front-end device-resident: no host FFTs, no barrier, no d2h fetch — the
f0 array flows straight into the batcher's device staging.

Static-shape contract: everything that shapes the graph (decimation
factor, tau range, frame count) is resolved host-side in ``make_yin_fn``
from the audio length, so XLA sees a fixed lattice — one compile per
(n_samples, sample_rate, hop) signature, which serving buckets and the
realtime fixed-context blocks already pin.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def interp_unvoiced(f0: jnp.ndarray) -> jnp.ndarray:
    """jnp mirror of features/f0.py::_interp_unvoiced (np.interp over the
    voiced frames, clamped at the edges; all-unvoiced input is returned
    unchanged). 1-D (T,) in, (T,) out."""
    n = f0.shape[0]
    voiced = f0 > 0
    idx = jnp.arange(n)
    # nearest voiced index at/before i (-1: none), at/after i (n: none)
    prev = jax.lax.cummax(jnp.where(voiced, idx, -1))
    nxt_rev = jax.lax.cummax(jnp.where(voiced[::-1], idx, -1))[::-1]
    nxt = jnp.where(nxt_rev >= 0, (n - 1) - nxt_rev, n)
    fp = f0[jnp.clip(prev, 0, n - 1)]
    fn_ = f0[jnp.clip(nxt, 0, n - 1)]
    have_p = prev >= 0
    have_n = nxt <= n - 1
    denom = jnp.maximum(nxt - prev, 1).astype(f0.dtype)
    t = (idx - prev).astype(f0.dtype) / denom
    interp = jnp.where(
        have_p & have_n, fp + (fn_ - fp) * t,
        jnp.where(have_p, fp, jnp.where(have_n, fn_, 0.0)),
    )
    return jnp.where(voiced, f0, interp)


def make_yin_fn(
    n_samples: int,
    sample_rate: int,
    hop_size: int,
    f0_min: float = 65.0,
    f0_max: float = 800.0,
    threshold: float = 0.1,
    voicing_threshold: float = 0.35,
    decimate: bool = True,
):
    """Build a jittable ``fn(audio[(n_samples,)]) -> f0[(n_frames,)]``
    matching ``yin_f0(audio, sample_rate, hop_size, ...)`` (0 = unvoiced,
    n_frames = n_samples // hop_size + 1). All shape-determining setup
    (decimation factor, tau lattice, FFT size) happens here on the host;
    the returned closure is pure jnp and can be jitted or embedded in a
    larger graph (the serving batcher / realtime block dispatch)."""
    from .f0 import decimation_filter

    factor = 1
    if decimate:
        while (
            sample_rate / (factor * 2) >= 16.0 * f0_max
            and hop_size % (factor * 2) == 0
            and n_samples > 4 * factor
        ):
            factor *= 2
    n_frames_out = n_samples // hop_size + 1
    n_dec = n_samples // factor
    sr_eff = sample_rate / factor
    hop_dec = hop_size // factor
    # polyphase FIR decimator shared bit-for-bit with the host yin_f0
    # (features/f0.py decimation_filter — full-length non-pow2 FFT resample
    # does not compile on the TPU backend; XLA lowers it to an O(n^2) DFT)
    dec_taps = jnp.asarray(decimation_filter(factor)) if factor > 1 else None

    tau_max = int(sr_eff / f0_min) + 1
    tau_min = max(int(sr_eff / f0_max), 2)
    win = tau_max
    frame_len = win + tau_max
    n_frames = n_dec // hop_dec + 1
    n_fft = 1 << int(np.ceil(np.log2(2 * frame_len)))
    taus = jnp.arange(tau_max)

    def fn(audio: jnp.ndarray) -> jnp.ndarray:
        audio = audio.astype(jnp.float32)
        if factor > 1:
            # strided conv = the polyphase decimator (host _decimate_fir);
            # conv lowering, not a (n_dec, taps) gather — the gather form
            # compiles pathologically on the TPU backend at serving sizes
            half = dec_taps.shape[0] // 2
            audio = jax.lax.conv_general_dilated(
                audio[None, None, :], dec_taps[None, None, :],
                window_strides=(factor,), padding=[(half, half)],
            )[0, 0, :n_dec]
        x = jnp.pad(audio, (frame_len // 2, frame_len))
        idx = (
            jnp.arange(n_frames)[:, None] * hop_dec
            + jnp.arange(frame_len)[None, :]
        )
        frames = x[idx]  # (T, frame_len)

        # d(tau) = e0 + e_tau - 2 c(tau) via one FFT xcorr per frame
        head = jnp.fft.rfft(frames[:, :win], n_fft, axis=1)
        full = jnp.fft.rfft(frames, n_fft, axis=1)
        corr = jnp.fft.irfft(jnp.conj(head) * full, n_fft, axis=1)[:, :tau_max]
        csum = jnp.cumsum(frames**2, axis=1)
        csum = jnp.pad(csum, ((0, 0), (1, 0)))
        e0 = csum[:, win] - csum[:, 0]
        e_tau = csum[:, taus + win] - csum[:, taus]
        d = jnp.maximum(e0[:, None] + e_tau - 2.0 * corr, 0.0)

        dsum = jnp.cumsum(d[:, 1:], axis=1)
        cmndf = jnp.concatenate(
            [
                jnp.ones((n_frames, 1), d.dtype),
                d[:, 1:] * jnp.arange(1, tau_max) / jnp.maximum(dsum, 1e-12),
            ],
            axis=1,
        )

        region = cmndf[:, tau_min:tau_max]
        n_tau = region.shape[1]
        below = region < threshold
        first = jnp.where(
            below.any(axis=1), below.argmax(axis=1), region.argmin(axis=1)
        )
        rising = jnp.concatenate(
            [region[:, 1:] >= region[:, :-1],
             jnp.ones((n_frames, 1), bool)], axis=1
        )
        eligible = rising & (jnp.arange(n_tau)[None, :] >= first[:, None])
        cur = eligible.argmax(axis=1)
        tau = cur + tau_min

        tau_c = jnp.clip(tau, tau_min + 1, tau_max - 2)
        take = lambda col: jnp.take_along_axis(  # noqa: E731
            cmndf, col[:, None], axis=1
        )[:, 0]
        d0 = take(tau_c - 1)
        d1 = take(tau_c)
        d2 = take(tau_c + 1)
        denom = d0 + d2 - 2.0 * d1
        delta = jnp.where(
            jnp.abs(denom) > 1e-12,
            0.5 * (d0 - d2) / jnp.maximum(jnp.abs(denom), 1e-12)
            * jnp.sign(denom),
            0.0,
        )
        delta = jnp.clip(delta, -1.0, 1.0)
        tau_f = tau_c + jnp.where(tau == tau_c, delta, 0.0)

        f0 = sr_eff / jnp.maximum(tau_f, 1e-6)
        voiced = (
            (d1 < voicing_threshold)
            & (f0 >= f0_min)
            & (f0 <= f0_max)
            & (e0 > 1e-8)
        )
        f0 = jnp.where(voiced, f0, 0.0).astype(jnp.float32)
        return f0[:n_frames_out]

    return fn


def make_pipeline_f0_fn(
    n_samples: int,
    sample_rate: int,
    hop_size: int,
    f0_min: float,
    f0_max: float,
    start_frame: int = 0,
):
    """The full pipeline f0 front-end as one jittable closure:
    silence_front suffix YIN + front zero-pad + unvoiced interpolation +
    f0_min floor — the exact host sequence of
    F0Extractor.extract(..., uv_interp=True, silence_front=...) for the
    'yin' extractor (see features/f0.py:246-262, 387-391), shapes pinned
    host-side. ``fn(audio[(n_samples,)]) -> f0[(n_frames,)]``."""
    n_frames = n_samples // hop_size + 1
    n_suffix = n_samples - start_frame * hop_size
    yin = make_yin_fn(n_suffix, sample_rate, hop_size, f0_min, f0_max)
    n_keep = n_frames - start_frame

    def fn(audio: jnp.ndarray) -> jnp.ndarray:
        f0 = yin(audio[n_samples - n_suffix:])[:n_keep]
        f0 = jnp.pad(f0, (start_frame, max(0, n_keep - f0.shape[0])))
        f0 = interp_unvoiced(f0)
        return jnp.maximum(f0, f0_min)

    return fn
