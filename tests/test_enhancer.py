"""Vocoder wrapper + Enhancer behavioral tests (tiny generator config)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ddsp_svc_tpu.models.vocoder as V


def tiny_cfg():
    return dict(
        sampling_rate=16000, num_mels=16, n_fft=256, win_size=256,
        hop_size=64, fmin=40, fmax=7000,
        upsample_rates=(4, 4, 2, 2), upsample_kernel_sizes=(8, 8, 4, 4),
        upsample_initial_channel=32, resblock="1",
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )


def make_vocoder(monkeypatch, vtype="nsf-hifigan"):
    monkeypatch.setattr(V, "DEFAULT_NSF_CONFIG", tiny_cfg())
    return V.Vocoder(vtype)


class TestVocoder:
    def test_extract_infer_shapes(self, monkeypatch):
        voc = make_vocoder(monkeypatch)
        audio = jnp.zeros((1, 16000), jnp.float32)
        mel = voc.extract(audio)
        assert mel.shape[2] == 16
        f0 = 220.0 * jnp.ones((1, mel.shape[1], 1))
        out = voc.infer(mel, f0)
        assert out.shape == (1, mel.shape[1] * 64)
        assert np.isfinite(np.asarray(out)).all()

    def test_log10_variant_scaling(self, monkeypatch):
        voc = make_vocoder(monkeypatch)
        voc10 = make_vocoder(monkeypatch, "nsf-hifigan-log10")
        audio = 0.1 * jnp.ones((1, 8000), jnp.float32)
        m1 = np.asarray(voc.extract(audio))
        m2 = np.asarray(voc10.extract(audio))
        np.testing.assert_allclose(m2, 0.434294 * m1, rtol=1e-5)

    def test_extract_resamples_input(self, monkeypatch):
        voc = make_vocoder(monkeypatch)
        audio = jnp.zeros((1, 8000), jnp.float32)  # 8 kHz in
        mel = voc.extract(audio, sample_rate=8000)
        # resampled to 16 kHz -> same frame count as 16000-sample input
        assert mel.shape[1] == voc.extract(jnp.zeros((1, 16000))).shape[1]


class TestEnhancer:
    def test_enhance_roundtrip(self, monkeypatch):
        monkeypatch.setattr(V, "DEFAULT_NSF_CONFIG", tiny_cfg())
        enh = V.Enhancer("nsf-hifigan")
        sr, hop = 16000, 64
        t = 64
        audio = 0.1 * jnp.ones((1, t * hop), jnp.float32)
        f0 = 220.0 * jnp.ones((1, t, 1), jnp.float32)
        out, out_sr = enh.enhance(audio, sr, f0, hop, adaptive_key=0)
        assert out_sr == sr
        assert np.isfinite(np.asarray(out)).all()
        assert abs(out.shape[1] - audio.shape[1]) <= hop * 2

    @pytest.mark.slow
    def test_adaptive_key_auto(self, monkeypatch):
        monkeypatch.setattr(V, "DEFAULT_NSF_CONFIG", tiny_cfg())
        enh = V.Enhancer("nsf-hifigan")
        sr, hop, t = 16000, 64, 64
        audio = 0.1 * jnp.ones((1, t * hop), jnp.float32)
        # f0 above the 760 Hz pivot forces a positive adaptive key
        f0 = 900.0 * jnp.ones((1, t, 1), jnp.float32)
        out, out_sr = enh.enhance(audio, sr, f0, hop, adaptive_key="auto")
        assert out_sr == sr
        assert np.isfinite(np.asarray(out)).all()

    def test_silence_front_repads(self, monkeypatch):
        monkeypatch.setattr(V, "DEFAULT_NSF_CONFIG", tiny_cfg())
        enh = V.Enhancer("nsf-hifigan")
        sr, hop, t = 16000, 64, 64
        audio = 0.1 * jnp.ones((1, t * hop), jnp.float32)
        f0 = 220.0 * jnp.ones((1, t, 1), jnp.float32)
        out, _ = enh.enhance(audio, sr, f0, hop, silence_front=0.1)
        pad = int(np.round(int(0.1 * sr / hop) * hop))
        assert np.allclose(np.asarray(out)[:, : pad - hop], 0.0)


class TestAdaptiveKeyDirection:
    def test_adaptive_key_scales_f0_down_and_upsamples(self, monkeypatch):
        """Regression (enhancer.py:37-47 semantics): adaptive_key=12 must
        UPSAMPLE the ddsp audio to ~2x the vocoder rate and feed the
        vocoder an apparent f0 scaled DOWN by ~2 (bringing high pitch into
        its range) — an earlier port inverted both directions."""
        monkeypatch.setattr(V, "DEFAULT_NSF_CONFIG", tiny_cfg())
        enh = V.Enhancer("nsf-hifigan")
        v = enh.vocoder
        sr, hop, t = 16000, 64, 64
        audio = 0.1 * jnp.ones((1, t * hop), jnp.float32)
        f0 = 1520.0 * jnp.ones((1, t, 1), jnp.float32)

        captured = {}
        orig_infer = v.infer

        def spy_infer(mel, f0_grid, key=None):
            captured["mel_frames"] = mel.shape[1]
            captured["f0_max"] = float(jnp.max(f0_grid))
            return orig_infer(mel, f0_grid, key=key)

        monkeypatch.setattr(v, "infer", spy_infer)
        out, out_sr = enh.enhance(audio, sr, f0, hop, adaptive_key=12)
        assert out_sr == v.vocoder_sample_rate
        # apparent f0 halved (real_factor ~ 0.5, rounding to 100 Hz rates)
        assert 700.0 < captured["f0_max"] < 820.0
        # audio upsampled ~2x -> ~2x the mel frames of the unshifted pass
        base_frames = v.extract(audio).shape[1]
        assert captured["mel_frames"] > 1.8 * base_frames
        # duration restored by the output resample (within one hop)
        assert abs(out.shape[-1] - audio.shape[-1]) <= v.vocoder_hop_size * 2
