"""Data pipeline tests: dataset crops, augmentation, batch assembly,
speaker-id parsing, preprocess round-trip."""
import os

import numpy as np
import pytest

from ddsp_svc_tpu.features.audio import save_wav


def make_layout(root, names, sr=16000, seconds=3.0, hop=64, with_mel=False,
                n_mels=8, keyshift=2.0):
    rng = np.random.default_rng(0)
    aug_dict = {}
    for name in names:
        audio = (0.3 * rng.standard_normal(int(sr * seconds))).astype(np.float32)
        wav = os.path.join(root, "audio", name)
        os.makedirs(os.path.dirname(wav), exist_ok=True)
        save_wav(wav, audio, sr)
        n_frames = len(audio) // hop + 1
        feats = {
            "f0": 200 + 50 * rng.random(n_frames),
            "volume": rng.random(n_frames),
        }
        feats["units"] = rng.standard_normal((n_frames, 16)).astype(np.float32)
        if with_mel:
            feats["mel"] = rng.standard_normal((n_frames, n_mels)).astype(np.float32)
            feats["aug_mel"] = rng.standard_normal((n_frames, n_mels)).astype(np.float32)
            feats["aug_vol"] = rng.random(n_frames)
            aug_dict[name] = keyshift
        for kind, arr in feats.items():
            p = os.path.join(root, kind, name + ".npy")
            os.makedirs(os.path.dirname(p), exist_ok=True)
            np.save(p, arr)
    if with_mel:
        np.save(os.path.join(root, "pitch_aug_dict.npy"), aug_dict)


class TestAudioDataset:
    def test_crop_shapes(self, tmp_path):
        from ddsp_svc_tpu.data.dataset import AudioDataset, BatchSampler

        make_layout(str(tmp_path), ["a.wav", "b.wav"])
        ds = AudioDataset(str(tmp_path), waveform_sec=1.0, hop_size=64,
                          sample_rate=16000, load_all_data=True)
        sampler = BatchSampler(ds, batch_size=3, seed=0)
        batch = sampler.sample()
        tf = ds.crop_frames
        assert batch["units"].shape == (3, tf, 16)
        assert batch["f0"].shape == (3, tf, 1)
        assert batch["volume"].shape == (3, tf, 1)
        assert batch["audio"].shape == (3, tf * 64)
        assert batch["spk_id"].shape == (3, 1)

    def test_short_file_skipped(self, tmp_path):
        from ddsp_svc_tpu.data.dataset import AudioDataset

        make_layout(str(tmp_path), ["long.wav"], seconds=3.0)
        make_layout(str(tmp_path), ["short.wav"], seconds=0.5)
        ds = AudioDataset(str(tmp_path), waveform_sec=1.0, hop_size=64,
                          sample_rate=16000, load_all_data=True)
        assert "short.wav" not in ds.usable()
        assert "long.wav" in ds.usable()

    def test_mel_aug_pair(self, tmp_path):
        from ddsp_svc_tpu.data.dataset import AudioDataset

        make_layout(str(tmp_path), ["a.wav"], with_mel=True, keyshift=2.0)
        ds = AudioDataset(str(tmp_path), waveform_sec=1.0, hop_size=64,
                          sample_rate=16000, load_all_data=True,
                          with_mel=True, use_aug=True)
        rng = np.random.default_rng(1)
        seen_shift = set()
        for _ in range(20):
            item = ds.sample_crop("a.wav", rng)
            assert item["mel"].shape[-1] == 8
            shift = float(item["aug_shift"][0, 0])
            seen_shift.add(shift)
            if shift != 0.0:
                assert shift == 2.0  # the recorded keyshift
        assert seen_shift == {0.0, 2.0}  # both branches exercised

    def test_spk_id_from_dirname(self, tmp_path):
        from ddsp_svc_tpu.data.dataset import AudioDataset

        make_layout(str(tmp_path), ["1/a.wav", "2/b.wav"])
        ds = AudioDataset(str(tmp_path), waveform_sec=1.0, hop_size=64,
                          sample_rate=16000, load_all_data=True, n_spk=2)
        assert ds.buffer["1/a.wav"]["spk_id"][0] == 1
        assert ds.buffer["2/b.wav"]["spk_id"][0] == 2

    def test_bad_spk_id_raises(self, tmp_path):
        from ddsp_svc_tpu.data.dataset import AudioDataset

        make_layout(str(tmp_path), ["7/a.wav"])
        with pytest.raises(ValueError):
            AudioDataset(str(tmp_path), waveform_sec=1.0, hop_size=64,
                         sample_rate=16000, load_all_data=True, n_spk=2)

    def test_host_sharding_partitions_files(self, tmp_path):
        from ddsp_svc_tpu.data.dataset import AudioDataset

        make_layout(str(tmp_path), [f"{c}.wav" for c in "abcd"])
        parts = [
            AudioDataset(str(tmp_path), waveform_sec=1.0, hop_size=64,
                         sample_rate=16000, load_all_data=False,
                         rank=r, world_size=2).paths
            for r in range(2)
        ]
        assert sorted(parts[0] + parts[1]) == sorted(f"{c}.wav" for c in "abcd")
        assert not set(parts[0]) & set(parts[1])


class TestSpeakerMix:
    def test_spk_mix_forward(self):
        import jax
        import jax.numpy as jnp

        from ddsp_svc_tpu.models.ddsp import CombSubSuperFast

        model = CombSubSuperFast(16000, 64, 256, n_unit=16, n_spk=4)
        t = 8
        units = jnp.zeros((1, t, 16))
        f0 = 220.0 * jnp.ones((1, t, 1))
        vol = jnp.ones((1, t, 1))
        spk = jnp.array([[2]], jnp.int32)
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            units, f0, vol, spk_id=spk,
        )
        out_single, _, _ = model.apply(
            v, units, f0, vol, spk_id=spk, rngs={"noise": jax.random.PRNGKey(2)}
        )
        out_mix, _, _ = model.apply(
            v, units, f0, vol, spk_mix_dict={1: 0.3, 3: 0.7},
            rngs={"noise": jax.random.PRNGKey(2)},
        )
        assert np.isfinite(np.asarray(out_single)).all()
        assert np.isfinite(np.asarray(out_mix)).all()
        # different speaker conditioning must change the output
        assert not np.allclose(np.asarray(out_single), np.asarray(out_mix))


class TestPreprocessResume:
    def test_skip_existing(self, tmp_path):
        """--resume: files with complete outputs are skipped; deleted
        outputs are regenerated."""
        from ddsp_svc_tpu.data.preprocess import preprocess
        from ddsp_svc_tpu.features.f0 import F0Extractor
        from ddsp_svc_tpu.features.volume import VolumeExtractor

        sr, hop = 16000, 64
        root = str(tmp_path)
        rng = np.random.default_rng(1)
        for name in ("a.wav", "b.wav"):
            n = np.arange(sr)
            audio = (0.3 * np.sin(2 * np.pi * 220 * n / sr)).astype(
                np.float32
            ) + 0.01 * rng.standard_normal(sr).astype(np.float32)
            wav = os.path.join(root, "audio", name)
            os.makedirs(os.path.dirname(wav), exist_ok=True)
            save_wav(wav, audio, sr)

        f0x = F0Extractor("yin", sr, hop, 65, 800)
        volx = VolumeExtractor(hop)
        preprocess(root, f0x, volx, sample_rate=sr, hop_size=hop)

        f0_a = os.path.join(root, "f0", "a.wav.npy")
        f0_b = os.path.join(root, "f0", "b.wav.npy")
        mtime_a = os.path.getmtime(f0_a)
        os.remove(f0_b)

        import time

        time.sleep(0.05)
        preprocess(root, f0x, volx, sample_rate=sr, hop_size=hop,
                   skip_existing=True)
        assert os.path.getmtime(f0_a) == mtime_a, "a.wav was reprocessed"
        assert os.path.exists(f0_b), "b.wav was not regenerated"


class TestUncachedPaths:
    def test_mel_family_uncached_lazy_load(self, tmp_path):
        """Regression: diffusion/reflow datasets with cache_all_data=False
        previously raised KeyError('aug_mel'/'mel') on the first crop and
        silently dropped the recorded keyshift."""
        from ddsp_svc_tpu.data.dataset import AudioDataset, BatchSampler

        make_layout(str(tmp_path), ["a.wav"], with_mel=True, keyshift=3.0)
        cached = AudioDataset(str(tmp_path), waveform_sec=1.0, hop_size=64,
                              sample_rate=16000, load_all_data=True,
                              with_mel=True, use_aug=True)
        lazy = AudioDataset(str(tmp_path), waveform_sec=1.0, hop_size=64,
                            sample_rate=16000, load_all_data=False,
                            with_mel=True, use_aug=True)
        for _ in range(10):  # same rng -> identical crops both ways
            a = cached.sample_crop("a.wav", np.random.default_rng(7))
            b = lazy.sample_crop("a.wav", np.random.default_rng(7))
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        shifts = {
            float(lazy.sample_crop("a.wav", np.random.default_rng(i))
                  ["aug_shift"][0, 0])
            for i in range(20)
        }
        assert 3.0 in shifts  # keyshift read lazily from pitch_aug_dict
        BatchSampler(lazy, batch_size=2, seed=0).sample()  # end-to-end

    def test_lazy_audio_rejects_wrong_sample_rate(self, tmp_path):
        from ddsp_svc_tpu.data.dataset import AudioDataset

        make_layout(str(tmp_path), ["a.wav"], sr=16000)
        ds = AudioDataset(str(tmp_path), waveform_sec=1.0, hop_size=64,
                          sample_rate=8000, load_all_data=False)
        with pytest.raises(AssertionError, match="wav rate"):
            ds.sample_crop("a.wav", np.random.default_rng(0))

    def test_prefetcher_rejects_wrong_sample_rate(self, tmp_path):
        from ddsp_svc_tpu.data.dataset import AudioDataset
        from ddsp_svc_tpu.data.prefetch import PrefetchBatchSampler

        make_layout(str(tmp_path), ["a.wav"], sr=16000)
        ds = AudioDataset(str(tmp_path), waveform_sec=1.0, hop_size=64,
                          sample_rate=8000, load_all_data=False)
        with pytest.raises(ValueError, match="wav rate"):
            PrefetchBatchSampler(ds, batch_size=2)
