"""On-device YIN front-end (features/yin_jax.py): jnp mirror of the host
yin_f0 / _interp_unvoiced / F0Extractor 'yin' chain (features/f0.py), the
full-stack serving front-end lever (PERF.md). Parity is asserted against
the host implementations frame-by-frame."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddsp_svc_tpu.features.f0 import F0Extractor, _interp_unvoiced, yin_f0
from ddsp_svc_tpu.features.yin_jax import (
    interp_unvoiced,
    make_pipeline_f0_fn,
    make_yin_fn,
)

SR, HOP = 44100, 512


def _vibrato(seconds=3.0, hz=220.0, noise=0.01, gap=None, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * seconds)) / SR
    f_inst = hz * (1 + 0.03 * np.sin(2 * np.pi * 5 * t))
    a = 0.3 * np.sin(2 * np.pi * np.cumsum(f_inst) / SR)
    a = (a + noise * rng.standard_normal(len(t))).astype(np.float32)
    if gap is not None:
        a[gap[0]:gap[1]] = 0.0
    return a


class TestYinJaxParity:
    @pytest.mark.parametrize("hz,gap", [(220.0, None), (440.0, (SR, SR + SR // 2))])
    def test_matches_host_yin(self, hz, gap):
        a = _vibrato(hz=hz, gap=gap)
        ref = yin_f0(a, SR, HOP, 50.0, 1100.0)
        fn = jax.jit(make_yin_fn(len(a), SR, HOP, 50.0, 1100.0))
        out = np.asarray(fn(jnp.asarray(a)))
        assert out.shape == ref.shape
        # voicing decisions identical; voiced pitch within f32-FFT noise
        assert ((ref > 0) == (out > 0)).all()
        both = (ref > 0) & (out > 0)
        cents = np.abs(1200 * np.log2(out[both] / ref[both]))
        assert cents.max() < 0.05

    def test_silence_all_unvoiced(self):
        a = np.zeros(SR, np.float32)
        fn = jax.jit(make_yin_fn(len(a), SR, HOP, 50.0, 1100.0))
        assert (np.asarray(fn(jnp.asarray(a))) == 0).all()

    def test_undecimatable_length_matches(self):
        # odd lengths / hops that block decimation still mirror the host
        a = _vibrato(seconds=1.0)[: SR - 37]
        ref = yin_f0(a, SR, 441, 50.0, 1100.0)
        out = np.asarray(jax.jit(make_yin_fn(len(a), SR, 441, 50.0, 1100.0))(
            jnp.asarray(a)))
        assert out.shape == ref.shape
        assert ((ref > 0) == (out > 0)).all()


class TestInterpUnvoiced:
    @pytest.mark.parametrize(
        "pat",
        [
            np.array([0, 0, 100, 0, 0, 200, 0, 0], np.float32),
            np.zeros(16, np.float32),  # all unvoiced: unchanged
            np.full(16, 150.0, np.float32),  # all voiced: unchanged
            np.array([100.0, 0, 0, 0], np.float32),  # trailing clamp
            np.array([0, 0, 0, 300.0], np.float32),  # leading clamp
        ],
    )
    def test_matches_host(self, pat):
        host = _interp_unvoiced(pat.copy())
        dev = np.asarray(interp_unvoiced(jnp.asarray(pat)))
        np.testing.assert_allclose(dev, host, rtol=1e-6, atol=1e-6)

    def test_random_patterns(self):
        rng = np.random.default_rng(3)
        for _ in range(20):
            pat = np.where(
                rng.random(64) < 0.4,
                rng.uniform(80, 600, 64),
                0.0,
            ).astype(np.float32)
            host = _interp_unvoiced(pat.copy())
            dev = np.asarray(interp_unvoiced(jnp.asarray(pat)))
            np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-4)


class TestPipelineF0Fn:
    @pytest.mark.parametrize("silence_front", [0.0, 0.5, 1.0])
    def test_matches_extractor_chain(self, silence_front):
        a = _vibrato(seconds=2.3, hz=200.0, seed=1)
        a[: SR // 2] = 0.0
        ref = F0Extractor("yin", SR, HOP, 50.0, 1100.0).extract(
            a, uv_interp=True, silence_front=silence_front
        )
        start = int(silence_front * SR / HOP)
        fn = jax.jit(make_pipeline_f0_fn(len(a), SR, HOP, 50.0, 1100.0, start))
        out = np.asarray(fn(jnp.asarray(a)))
        assert out.shape == ref.shape
        cents = np.abs(1200 * np.log2(out / ref))
        assert cents.max() < 0.05


class TestPipelineDeviceF0:
    def test_pipeline_output_matches_host_f0_path(self):
        """SvcPipeline(device_f0=True) produces the same audio as the host
        YIN path (same model, same key) within f32 front-end noise."""
        from helpers import StubUnitsEncoder

        from ddsp_svc_tpu.infer.pipeline import SvcPipeline
        from ddsp_svc_tpu.models.ddsp import CombSubSuperFast
        from ddsp_svc_tpu.utils.config import DotDict

        sr, hop, win, n_unit = 16000, 64, 256, 16
        args = DotDict({
            "data": {"sampling_rate": sr, "block_size": hop,
                     "encoder_out_channels": n_unit},
            "model": {"type": "CombSubSuperFast", "win_length": win,
                      "n_spk": 1},
            "enhancer": None,
        })
        model = CombSubSuperFast(sr, hop, win, n_unit=n_unit, n_spk=1)
        variables = model.init(
            {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
            jnp.zeros((1, 16, n_unit)), 220.0 * jnp.ones((1, 16, 1)),
            jnp.ones((1, 16, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
        )
        t = np.arange(sr) / sr
        a = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)

        outs = {}
        for dev in (False, True):
            pipe = SvcPipeline.from_parts(
                model, variables, args, StubUnitsEncoder(n_unit),
                device_f0=dev,
            )
            pipe._key = jax.random.PRNGKey(7)
            outs[dev], _ = pipe.infer(a, sr, spk_id=1)
        err = np.abs(outs[True] - outs[False]).max()
        scale = np.abs(outs[False]).max() + 1e-9
        assert err / scale < 5e-3

    def test_fused_ddsp_fold_single_dispatch(self):
        """On the fused direct flagship path, device_f0 folds YIN INTO the
        one jitted block graph: output matches the host-f0 fused path, no
        standalone f0 executable exists, and key_shift is a traced scalar
        (changing it does not grow the jit cache)."""
        from helpers import StubUnitsEncoderFused

        from ddsp_svc_tpu.infer.pipeline import SvcPipeline
        from ddsp_svc_tpu.models.ddsp import CombSubSuperFast
        from ddsp_svc_tpu.utils.config import DotDict

        sr, hop, win, n_unit = 16000, 64, 256, 16
        args = DotDict({
            "data": {"sampling_rate": sr, "block_size": hop,
                     "encoder_out_channels": n_unit},
            "model": {"type": "CombSubSuperFast", "win_length": win,
                      "n_spk": 1},
            "enhancer": None,
        })
        model = CombSubSuperFast(sr, hop, win, n_unit=n_unit, n_spk=1)
        variables = model.init(
            {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
            jnp.zeros((1, 16, n_unit)), 220.0 * jnp.ones((1, 16, 1)),
            jnp.ones((1, 16, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
        )
        t = np.arange(sr) / sr
        a = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)

        outs = {}
        pipes = {}
        for dev in (False, True):
            pipe = SvcPipeline.from_parts(
                model, variables, args, StubUnitsEncoderFused(n_unit),
                device_f0=dev,
            )
            pipe._key = jax.random.PRNGKey(7)
            outs[dev], _ = pipe.infer(a, sr, spk_id=1, key_shift=3.0)
            pipes[dev] = pipe
        err = np.abs(outs[True] - outs[False]).max()
        scale = np.abs(outs[False]).max() + 1e-9
        assert err / scale < 5e-3

        keys = list(pipes[True]._jit_fwd)
        assert not any(k[0] == "yin_dev" for k in keys)  # folded, not solo
        assert any(k[0] == "ddsp_enc_masked" and k[-1] is not None
                   for k in keys)
        n_before = len(pipes[True]._jit_fwd)
        pipes[True].infer(a, sr, spk_id=1, key_shift=-2.0)
        assert len(pipes[True]._jit_fwd) == n_before  # traced key_shift

    @pytest.mark.parametrize("use_silence", [False, True])
    def test_fused_cascade_fold_matches_host(self, tmp_path, use_silence):
        """Non-ddsp fused direct path (cascade -> vocoder as one graph) with
        device_f0: output matches the host-f0 variant, including the
        silence_front prefix handling of both diff-silence modes."""
        from helpers import StubUnitsEncoderFused
        from test_batcher import _tiny_vocoder_ckpt

        from ddsp_svc_tpu.infer.pipeline import SvcPipeline
        from ddsp_svc_tpu.models.cascade import Unit2Mel
        from ddsp_svc_tpu.utils.config import DotDict

        sr, hop, n_unit = 16000, 64, 16
        voc_path = _tiny_vocoder_ckpt(tmp_path)
        args = DotDict({
            "data": {"sampling_rate": sr, "block_size": hop,
                     "encoder_out_channels": n_unit},
            "model": {"type": "Diffusion", "n_spk": 1, "k_step_max": 20},
            "vocoder": {"type": "nsf-hifigan", "ckpt": voc_path},
            "enhancer": None,
        })
        model = Unit2Mel(n_unit, 1, False, 16, n_layers=2, n_chans=16,
                         n_hidden=16, k_step_max=20)
        variables = {"params": model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 16, n_unit)), 220.0 * jnp.ones((1, 16, 1)),
            jnp.ones((1, 16, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
            gt_spec=jnp.zeros((1, 16, 16)), infer=False,
        )["params"]}
        t = np.arange(sr) / sr
        a = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)

        outs = {}
        for dev in (False, True):
            pipe = SvcPipeline.from_parts(
                model, variables, args, StubUnitsEncoderFused(n_unit),
                device_f0=dev,
            )
            pipe._key = jax.random.PRNGKey(7)
            outs[dev], _ = pipe.infer(
                a, sr, spk_id=1, k_step=10, speedup=2, method="dpm-solver",
                silence_front=0.25, use_silence=use_silence,
            )
        assert outs[True].shape == outs[False].shape
        err = np.abs(outs[True] - outs[False]).max()
        scale = np.abs(outs[False]).max() + 1e-9
        assert err / scale < 5e-3

    def test_flag_requires_yin(self):
        """device_f0 silently stays off for non-yin extractors (they have
        their own device paths or host algorithms)."""
        from helpers import StubUnitsEncoder

        from ddsp_svc_tpu.infer.pipeline import SvcPipeline
        from ddsp_svc_tpu.models.ddsp import CombSubSuperFast
        from ddsp_svc_tpu.utils.config import DotDict

        sr, hop, win, n_unit = 16000, 64, 256, 16
        args = DotDict({
            "data": {"sampling_rate": sr, "block_size": hop,
                     "encoder_out_channels": n_unit},
            "model": {"type": "CombSubSuperFast", "win_length": win,
                      "n_spk": 1},
            "enhancer": None,
        })
        model = CombSubSuperFast(sr, hop, win, n_unit=n_unit, n_spk=1)
        variables = model.init(
            {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
            jnp.zeros((1, 16, n_unit)), 220.0 * jnp.ones((1, 16, 1)),
            jnp.ones((1, 16, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
        )
        pipe = SvcPipeline.from_parts(
            model, variables, args, StubUnitsEncoder(n_unit),
            pitch_extractor="praat", device_f0=True,
        )
        assert pipe.device_f0 is False
