"""Native Harvest tracker (features/harvest.py) — the cases that motivated
a real Harvest port over the old DIO alias (VERDICT r2 missing #2):
breathy (noise-heavy) and rough (jittery/shimmery) voices, plus the
dispatch contract (ddsp/vocoder.py:82-89 parity framing)."""
import numpy as np
import pytest

from ddsp_svc_tpu.features.harvest import harvest_f0, harvest_stonemask_f0

SR, HOP = 44100, 512


def _cents(f0, truth, lo, hi, min_voiced=0.9):
    sl = slice(lo, hi)
    voiced = f0[sl] > 0
    assert voiced.mean() > min_voiced, voiced.mean()
    return 1200 * np.abs(np.log2(f0[sl][voiced] / truth[sl][voiced]))


def _harmonic_voice(t, inst_f0, n_harm=8, decay=0.7):
    phase = 2 * np.pi * np.cumsum(inst_f0) / SR
    sig = sum(decay ** (h - 1) * np.sin(h * phase) for h in range(1, n_harm + 1))
    return (0.25 * sig / n_harm).astype(np.float32)


def test_breathy_voice_10db():
    """Harmonic-rich voice buried in 10 dB SNR breath noise — the regime
    Harvest's dense candidate bank targets."""
    rng = np.random.default_rng(0)
    t = np.arange(int(SR * 2.0)) / SR
    inst = 180.0 * 2 ** (np.sin(2 * np.pi * 4.0 * t) * 30 / 1200)
    clean = _harmonic_voice(t, inst)
    noise = rng.standard_normal(len(clean)).astype(np.float32)
    noise *= np.sqrt((clean ** 2).mean() / (noise ** 2).mean()) / 10 ** (10 / 20)
    f0 = harvest_stonemask_f0(clean + noise, SR, HOP, 50.0, 1100.0)
    truth = inst[::HOP][: len(f0)]
    err = _cents(f0, truth, 10, len(f0) - 10, min_voiced=0.85)
    assert np.median(err) < 15.0, np.median(err)
    assert np.percentile(err, 95) < 60.0, np.percentile(err, 95)


def test_rough_voice_jitter_shimmer():
    """Cycle-level jitter (2 %) + shimmer (20 %) — rough phonation."""
    rng = np.random.default_rng(1)
    t = np.arange(int(SR * 2.0)) / SR
    jitter = 1.0 + 0.02 * np.repeat(
        rng.standard_normal(len(t) // 256 + 1), 256
    )[: len(t)]
    inst = 140.0 * jitter
    clean = _harmonic_voice(t, inst, n_harm=10)
    shimmer = 1.0 + 0.2 * np.repeat(
        rng.standard_normal(len(t) // 512 + 1), 512
    )[: len(t)]
    audio = (clean * shimmer).astype(np.float32)
    f0 = harvest_stonemask_f0(audio, SR, HOP, 50.0, 1100.0)
    truth = np.full(len(f0), 140.0)
    err = _cents(f0, truth, 10, len(f0) - 10)
    assert np.median(err) < 20.0, np.median(err)


def test_octave_stability_missing_fundamental():
    """Energy concentrated in harmonics 2-6 (weak fundamental): the DP
    contour must not octave-jump."""
    t = np.arange(int(SR * 1.5)) / SR
    phase = 2 * np.pi * 110.0 * t
    sig = sum(np.sin(h * phase) for h in (2, 3, 4, 5, 6))
    audio = (0.1 * sig).astype(np.float32)
    f0 = harvest_f0(audio, SR, HOP, 50.0, 1100.0)
    mid = f0[10:-10]
    voiced = mid[mid > 0]
    assert len(voiced) > 0.8 * len(mid)
    err = 1200 * np.abs(np.log2(voiced / 110.0))
    assert np.median(err) < 30.0, np.median(err)


def test_contract_and_silence():
    audio = np.zeros(SR, np.float32)
    f0 = harvest_f0(audio, SR, HOP)
    assert f0.shape == (int(np.ceil(SR / HOP)),)
    assert (f0 == 0).all()
    assert harvest_f0(np.zeros(0, np.float32), SR, HOP).shape == (0,)


def test_tone_silence_tone_voicing():
    t = np.arange(SR // 2) / SR
    tone = (0.4 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    audio = np.concatenate([tone, np.zeros(SR // 2, np.float32), tone])
    f0 = harvest_f0(audio, SR, HOP)
    third = len(f0) // 3
    assert (f0[5 : third - 5] > 0).mean() > 0.9
    assert (f0[third + 5 : 2 * third - 5] == 0).mean() > 0.9


def test_dispatch_uses_native_harvest(monkeypatch):
    """F0Extractor('harvest') without pyworld runs features/harvest.py,
    not the DIO alias."""
    import ddsp_svc_tpu.features.harvest as hv
    from ddsp_svc_tpu.features.f0 import F0Extractor

    called = {}
    orig = hv.harvest_stonemask_f0

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(hv, "harvest_stonemask_f0", spy)
    ex = F0Extractor("harvest", sample_rate=SR, hop_size=HOP)
    t = np.arange(SR) / SR
    audio = (0.4 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    f0 = ex.extract(audio)
    assert called.get("yes")
    assert f0.shape == (SR // HOP + 1,)
    mid = f0[5:-5]
    assert (np.abs(1200 * np.log2(np.where(mid > 0, mid, 220) / 220.0)) < 20).all()
