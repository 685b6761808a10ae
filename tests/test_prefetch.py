"""Native C++ prefetch loader (data/_prefetch.cpp via data/prefetch.py):
bit-identical batches to the in-memory BatchSampler, async slot rotation."""
import os

import numpy as np
import pytest

from ddsp_svc_tpu.data.dataset import AudioDataset, BatchSampler
from ddsp_svc_tpu.features.audio import save_wav

SR, HOP, N_UNIT = 16000, 160, 8
SEC = 0.5  # crop length


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_data")
    rng = np.random.default_rng(0)
    for spk, name in ((1, "a"), (2, "b"), (1, "c")):
        dur = rng.uniform(1.2, 2.0)
        n = int(dur * SR)
        n_frames = n // HOP + 1
        audio = (0.3 * np.sin(2 * np.pi * 220 * np.arange(n) / SR)
                 + 0.05 * rng.standard_normal(n)).astype(np.float32)
        d = root / "audio" / str(spk)
        d.mkdir(parents=True, exist_ok=True)
        save_wav(str(d / f"{name}.wav"), audio, SR)  # PCM16
        for kind, arr in (
            ("units", rng.standard_normal((n_frames, N_UNIT)).astype(np.float32)),
            ("f0", (220.0 * np.ones(n_frames)).astype(np.float32)),
            ("volume", (0.3 * np.ones(n_frames)).astype(np.float32)),
        ):
            kd = root / kind / str(spk)
            kd.mkdir(parents=True, exist_ok=True)
            np.save(str(kd / f"{name}.wav.npy"), arr)
    return str(root)


def _dataset(root, load_all):
    return AudioDataset(
        root, waveform_sec=SEC, hop_size=HOP, sample_rate=SR,
        load_all_data=load_all, n_spk=2, use_aug=True,
    )


def test_batches_match_cached_sampler(corpus):
    from ddsp_svc_tpu.data.prefetch import PrefetchBatchSampler

    ref = BatchSampler(_dataset(corpus, True), batch_size=4, seed=7)
    pf = PrefetchBatchSampler(_dataset(corpus, False), batch_size=4, seed=7)
    try:
        for _ in range(5):
            a = ref.sample()
            b = pf.sample()
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_allclose(
                    a[k], b[k], rtol=0, atol=1e-7, err_msg=k
                )
    finally:
        pf.close()


def test_pcm16_range_read_matches_wav(corpus):
    from ddsp_svc_tpu.data.prefetch import wav_index

    name = sorted(os.listdir(os.path.join(corpus, "audio", "1")))[0]
    path = os.path.join(corpus, "audio", "1", name)
    off, n, kind, rate = wav_index(path)
    assert kind == "pcm16" and rate > 0
    raw = np.fromfile(path, np.int16, count=n, offset=off)
    from ddsp_svc_tpu.features.audio import load_wav

    audio, _ = load_wav(path)
    np.testing.assert_allclose(raw / 32768.0, audio, atol=1e-7)


def test_npy_index(corpus):
    from ddsp_svc_tpu.data.prefetch import npy_index

    path = os.path.join(corpus, "units", "1")
    f = os.path.join(path, sorted(os.listdir(path))[0])
    off, shape, descr = npy_index(f)
    arr = np.load(f)
    assert shape == arr.shape and descr == "<f4"
    raw = np.fromfile(f, np.float32, offset=off).reshape(shape)
    np.testing.assert_array_equal(raw, arr)


def test_slots_rotate_and_overlap(corpus):
    from ddsp_svc_tpu.data.prefetch import PrefetchBatchSampler

    pf = PrefetchBatchSampler(
        _dataset(corpus, False), batch_size=2, seed=1, n_slots=3, n_threads=2
    )
    try:
        seen = [pf.sample() for _ in range(7)]  # > 2 full rotations
        assert len({s["audio"].tobytes() for s in seen}) == 7  # all distinct
    finally:
        pf.close()
