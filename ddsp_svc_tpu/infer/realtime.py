"""Realtime sliding-window voice conversion with SOLA splicing.

The engine behind the reference GUI's audio callback (gui.py:336-460),
decoupled from any audio backend:

  - rolling input buffer of block + extra-context seconds (gui.py:399-400);
  - f0/enhancer skip the stale context via silence_front (gui.py:95-107);
  - per block: run the pipeline on the whole context, take the tail window,
    find the SOLA offset by normalized cross-correlation over a 10 ms search
    range (gui.py:434-440), splice with a hann crossfade or the phase
    vocoder (gui.py:15-32, 443-452), carry the tail as the next SOLA buffer.

Drive it live with any audio IO (cli/realtime.py uses sounddevice when
installed) or offline with ``process_file``-style block feeding — the
engine is backend-free and deterministic.
"""
from __future__ import annotations

import numpy as np

from .pipeline import SvcPipeline


def phase_vocoder(a: np.ndarray, b: np.ndarray, fade_out: np.ndarray,
                  fade_in: np.ndarray) -> np.ndarray:
    """Phase-vocoder crossfade of equal-length windows (gui.py:15-32)."""
    n = a.shape[0]
    window = np.sqrt(fade_out * fade_in)
    fa = np.fft.rfft(a * window)
    fb = np.fft.rfft(b * window)
    absab = np.abs(fa) + np.abs(fb)
    if n % 2 == 0:
        absab[1:-1] *= 2
    else:
        absab[1:] *= 2
    phia = np.angle(fa)
    phib = np.angle(fb)
    deltaphase = phib - phia
    deltaphase -= 2 * np.pi * np.floor(deltaphase / 2 / np.pi + 0.5)
    w = 2 * np.pi * np.arange(n // 2 + 1) + deltaphase
    t = np.arange(n) / n
    result = (
        a * (fade_out**2)
        + b * (fade_in**2)
        + np.sum(absab[:, None] * np.cos(w[:, None] * t[None, :] + phia[:, None]),
                 axis=0) * window / n
    )
    return result


class RealtimeVC:
    def __init__(
        self,
        pipeline: SvcPipeline,
        sample_rate: int = 44100,
        block_time: float = 0.3,
        crossfade_time: float = 0.04,
        extra_time: float = 2.0,
        sola_search_time: float = 0.01,
        use_phase_vocoder: bool = False,
        spk_id: int = 1,
        key_shift: float = 0.0,
        threhold: float = -45.0,
        **infer_kwargs,
    ):
        self.pipeline = pipeline
        self.sr = sample_rate
        self.block_frame = int(block_time * sample_rate)
        self.crossfade_frame = int(crossfade_time * sample_rate)
        self.sola_search_frame = int(sola_search_time * sample_rate)
        self.extra_frame = int(extra_time * sample_rate)
        self.use_phase_vocoder = use_phase_vocoder
        self.spk_id = spk_id
        self.key_shift = key_shift
        self.threhold = threhold
        self.infer_kwargs = infer_kwargs

        self.input_wav = np.zeros(
            self.extra_frame + self.block_frame, dtype=np.float32
        )
        # the last ~20 ms of each inference is edge-contaminated (conv
        # right-edge padding, f0 edge frames) and never reaches the output
        # (gui.py:339, 431-432: temp_wav excludes last_delay_frame)
        self.last_delay_frame = int(0.02 * sample_rate)
        self.sola_buffer = np.zeros(self.crossfade_frame, dtype=np.float32)
        self.fade_in = np.sin(
            np.pi * np.arange(self.crossfade_frame) / self.crossfade_frame / 2
        ) ** 2
        self.fade_out = 1.0 - self.fade_in
        # f0/enhancer may skip the stale prefix (gui.py:344)
        self.safe_prefix_pad_length = max(
            extra_time - crossfade_time - sola_search_time - 0.02, 0.0
        )
        self._first = True

    def warmup(self, extra_variants: list[dict] | None = None) -> None:
        """Compile the fixed-context block path before going live: run one
        silent block through the full pipeline so the first real callback
        hits cached executables (the context length is constant, so every
        subsequent block reuses the same compiled graphs).

        For diffusion/reflow engines, BOTH 'diff silence' variants
        (gui_diff.py:282) are precompiled — toggling the checkbox mid-stream
        must never pay a compile inside a 0.3 s budget — plus any
        ``extra_variants`` (kwargs overrides, e.g. alternate sampler
        settings the GUI sliders can reach), so every reachable signature is
        a cache hit and the block-latency tail stays jitter-only."""
        state = (self.input_wav.copy(), self.sola_buffer.copy(), self._first)
        variants: list[dict] = [{}]
        if getattr(self.pipeline, "family", "ddsp") != "ddsp":
            cur = bool(self.infer_kwargs.get("use_silence", False))
            variants.append({"use_silence": not cur})
        variants.extend(extra_variants or [])
        saved_kwargs = dict(self.infer_kwargs)
        try:
            for var in variants:
                self.infer_kwargs = {**saved_kwargs, **var}
                self.input_wav = state[0].copy()
                self.sola_buffer = state[1].copy()
                self.process_block(
                    np.zeros(self.block_frame, dtype=np.float32)
                )
        finally:
            self.infer_kwargs = saved_kwargs
            self.input_wav, self.sola_buffer, self._first = state

    def process_block(self, block: np.ndarray) -> np.ndarray:
        """One callback: ``block`` (block_frame samples in) -> same-size out."""
        assert len(block) == self.block_frame
        self.input_wav = np.roll(self.input_wav, -self.block_frame)
        self.input_wav[-self.block_frame :] = block

        out, out_sr = self.pipeline.infer(
            self.input_wav,
            self.sr,
            spk_id=self.spk_id,
            key_shift=self.key_shift,
            threhold=self.threhold,
            # 0.03 s margin before the pad boundary so windowed f0 trackers
            # keep real left context at the head of the output window
            # (gui.py:95-98: silence_front = safe_prefix_pad_length - 0.03)
            silence_front=max(self.safe_prefix_pad_length - 0.03, 0.0),
            **self.infer_kwargs,
        )
        if out_sr != self.sr:
            # resample to IO rate
            import jax.numpy as jnp

            from ..ops.resample import resample

            out = np.asarray(resample(jnp.asarray(out)[None, :], out_sr, self.sr))[0]

        # take the window just BEFORE the edge-contaminated tail
        # (gui.py:431-432: [-(block+cf+search+last_delay):-last_delay])
        need = self.block_frame + self.crossfade_frame + self.sola_search_frame
        ld = self.last_delay_frame
        if len(out) >= need + ld:
            infer_tail = out[-(need + ld) : -ld]
        else:
            tail = out[:-ld] if ld and len(out) > ld else out
            infer_tail = np.pad(tail, (max(0, need - len(tail)), 0))[-need:]

        # SOLA offset by normalized cross-correlation (gui.py:434-440)
        cf = self.crossfade_frame
        if self.sola_search_frame > 0 and not self._first:
            cor_nom = np.correlate(
                infer_tail[: self.sola_search_frame + cf], self.sola_buffer, "valid"
            )
            energy = np.convolve(
                infer_tail[: self.sola_search_frame + cf] ** 2,
                np.ones(cf), "valid",
            )
            cor_den = np.sqrt(energy + 1e-8)
            sola_offset = int(np.argmax(cor_nom / cor_den))
        else:
            sola_offset = 0

        seg = infer_tail[sola_offset : sola_offset + self.block_frame].copy()
        if not self._first:
            head = infer_tail[sola_offset : sola_offset + cf]
            if self.use_phase_vocoder:
                seg[:cf] = phase_vocoder(
                    self.sola_buffer, head, self.fade_out, self.fade_in
                )
            else:
                seg[:cf] = self.sola_buffer * self.fade_out + head * self.fade_in
        tail_start = sola_offset + self.block_frame
        tail = infer_tail[tail_start : tail_start + cf]
        self.sola_buffer = (
            np.pad(tail, (0, cf - len(tail))) if len(tail) < cf else tail.copy()
        )
        self._first = False
        return seg

    def process_stream(self, audio: np.ndarray) -> np.ndarray:
        """Feed a whole recording through the block engine (offline test /
        file mode). Pads to a block multiple; returns the spliced output."""
        out, _ = drive_blocks(self, audio)
        return out


def drive_blocks(
    vc: "RealtimeVC", audio: np.ndarray
) -> tuple[np.ndarray, dict]:
    """File-mode driver shared by cli/realtime.py and the web GUI: pad to a
    block multiple, run every block with per-block wall timing (the
    reference GUI's live infer_time readout, gui.py:457-460).

    Returns (spliced output trimmed to len(audio), stats dict with
    block_ms/rtf measured over steady-state blocks — the first two blocks
    pay compiles and are excluded when there are more)."""
    import time

    n_blocks = int(np.ceil(len(audio) / vc.block_frame))
    padded = np.pad(
        audio, (0, n_blocks * vc.block_frame - len(audio))
    ).astype(np.float32)
    out, times = [], []
    for i in range(n_blocks):
        t0 = time.perf_counter()
        out.append(
            vc.process_block(
                padded[i * vc.block_frame : (i + 1) * vc.block_frame]
            )
        )
        times.append(time.perf_counter() - t0)
    steady = times[2:] or times
    block_ms = 1000.0 * float(np.mean(steady)) if steady else 0.0
    stats = {
        "block_ms": round(block_ms, 2),
        "rtf": round(1000.0 * vc.block_frame / vc.sr / block_ms, 2)
        if block_ms else None,
        "blocks": n_blocks,
        "times_s": times,
    }
    return np.concatenate(out)[: len(audio)], stats
