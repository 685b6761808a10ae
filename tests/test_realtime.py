"""Realtime SOLA engine tests with a passthrough pipeline — the realized
version of the reference's commented-out SOLA self-test (gui.py:417-423)."""
import numpy as np

from ddsp_svc_tpu.infer.realtime import RealtimeVC, phase_vocoder


class PassthroughPipeline:
    """Identity 'conversion': returns its rolling context unchanged."""

    def infer(self, audio, sample_rate, **kwargs):
        return audio.copy(), sample_rate


class JitterPipeline:
    """Identity plus a constant small delay — SOLA must re-align it."""

    def __init__(self, shift):
        self.shift = shift

    def infer(self, audio, sample_rate, **kwargs):
        return np.roll(audio, self.shift), sample_rate


def run_engine(pipeline, audio, sr, **kw):
    vc = RealtimeVC(
        pipeline, sample_rate=sr, block_time=0.1, crossfade_time=0.02,
        extra_time=0.4, **kw,
    )
    return vc.process_stream(audio), vc


def test_passthrough_reconstruction():
    sr = 16000
    t = np.arange(sr * 2) / sr
    audio = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    out, vc = run_engine(PassthroughPipeline(), audio, sr)
    assert out.shape == audio.shape
    # the engine's intrinsic latency is crossfade + SOLA search +
    # last-delay (the output block is taken that far before the context
    # end, excluding the edge-contaminated tail, gui.py:431-432)
    lag = vc.crossfade_frame + vc.sola_search_frame + vc.last_delay_frame
    mid = slice(int(0.5 * sr), int(1.8 * sr))
    err = np.abs(out[mid] - audio[mid.start - lag : mid.stop - lag]).max()
    assert err < 1e-3, err


def test_sola_absorbs_constant_shift():
    sr = 16000
    t = np.arange(sr * 2) / sr
    audio = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    out, _ = run_engine(JitterPipeline(shift=37), audio, sr)
    mid = out[int(0.5 * sr) : int(1.8 * sr)]
    # output must stay a clean continuous sinusoid: no splice
    # discontinuities -> sample-to-sample diff bounded by the sine slope
    max_slope = 0.5 * 2 * np.pi * 220 / sr * 1.5
    assert np.abs(np.diff(mid)).max() < max_slope, np.abs(np.diff(mid)).max()


def test_phase_vocoder_endpoints():
    n = 256
    fade_in = np.sin(np.pi * np.arange(n) / n / 2) ** 2
    fade_out = 1.0 - fade_in
    a = np.sin(2 * np.pi * 0.03 * np.arange(n)).astype(np.float64)
    b = np.sin(2 * np.pi * 0.03 * np.arange(n) + 0.4).astype(np.float64)
    out = phase_vocoder(a, b, fade_out, fade_in)
    # endpoints follow the dominant signal on each side
    assert abs(out[0] - a[0]) < 0.05
    assert abs(out[-1] - b[-1]) < 0.05
