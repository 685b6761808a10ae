"""Golden-value tests: neural modules vs the reference torch code itself.

The reference's model files are importable in-image (nsf_hifigan/models.py
directly; ddsp/unit2control.py, ddsp/pcmer.py, diffusion/wavenet.py,
diffusion/naive_v2_diff.py after stubbing gin/local_attention; the full
ddsp/vocoder.py after stubbing the extractor-only wheels). These tests build
a reference torch module with seeded random init, convert its state_dict
through convert/models.py, and assert forward agreement with our flax
modules on identical inputs — the strongest converter validation available
without pretrained checkpoints (VERDICT r1 missing-item #2).

Stochastic paths (noise exciters, sine-bank phases) are made deterministic
by injecting the same arrays on both sides: our models take explicit
``noise=``/``sine_kwargs=`` arguments; the reference's ``torch.rand`` /
``torch.rand_like`` / ``torch.randn_like`` calls are monkeypatched.
"""
import importlib.machinery
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"


def _stub(name, pkg=False):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=pkg)
    if pkg:
        m.__path__ = []
    sys.modules[name] = m
    return m


@pytest.fixture(scope="module")
def ref():
    """Import the reference model modules (read-only, stubs for absent
    wheels). Stubs WE add are removed at teardown — other test files (e.g.
    the extractor wheel-dispatch tests) must keep seeing those wheels as
    absent when they share an xdist worker with this module."""
    added = []

    def stub_once(name, pkg=False):
        if name in sys.modules:
            return sys.modules[name]
        added.append(name)
        return _stub(name, pkg)

    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in ("gin", "pyworld", "parselmouth", "torchcrepe", "resampy"):
        stub_once(name)
    if "local_attention" not in sys.modules:
        stub_once("local_attention").LocalAttention = object
    if "fairseq" not in sys.modules:
        stub_once("fairseq").checkpoint_utils = types.SimpleNamespace()
    if "torchaudio" not in sys.modules:
        ta = stub_once("torchaudio", pkg=True)
        tat = stub_once("torchaudio.transforms")
        tat.Resample = type("Resample", (), {"__init__": lambda self, *a, **k: None})
        ta.transforms = tat
    import ddsp.unit2control as ref_u2c
    import ddsp.vocoder as ref_vocoder
    import diffusion.naive_v2_diff as ref_nv2
    import diffusion.wavenet as ref_wavenet
    import nsf_hifigan.models as ref_nsf
    yield types.SimpleNamespace(
        u2c=ref_u2c, vocoder=ref_vocoder, nv2=ref_nv2, wavenet=ref_wavenet,
        nsf=ref_nsf,
    )
    for name in added:
        sys.modules.pop(name, None)


def sd_numpy(module: torch.nn.Module) -> dict:
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def rand_f32(rng, shape):
    return rng.standard_normal(shape).astype(np.float32)


def make_frame_inputs(rng, b, t, n_unit):
    units = rand_f32(rng, (b, t, n_unit))
    f0 = (220.0 * np.exp(0.1 * rand_f32(rng, (b, t, 1)))).astype(np.float32)
    phase = (np.pi * (2 * rng.random((b, t, 1)) - 1)).astype(np.float32)
    volume = rng.random((b, t, 1)).astype(np.float32)
    return units, f0, phase, volume


class _PatchedNoise:
    """Monkeypatch torch.{rand,rand_like,randn_like} to fixed arrays."""

    def __init__(self, rand=None, rand_like=None, randn_like=None):
        self.vals = {"rand": rand, "rand_like": rand_like, "randn_like": randn_like}

    def __enter__(self):
        self.saved = {k: getattr(torch, k) for k in self.vals}
        for k, v in self.vals.items():
            if v is None:
                continue
            arr = torch.from_numpy(np.ascontiguousarray(v))

            def fn(*a, _arr=arr, **kw):
                return _arr.clone()

            setattr(torch, k, fn)
        return self

    def __exit__(self, *exc):
        for k, f in self.saved.items():
            setattr(torch, k, f)
        return False


class TestUnit2Control:
    def test_naive_v2_forward(self, ref):
        """ddsp/unit2control.py:26-109 (use_naive_v2) vs models/unit2control.py."""
        from ddsp_svc_tpu.convert.models import convert_unit2control
        from ddsp_svc_tpu.models.unit2control import Unit2Control

        splits = {"a": 8, "b": 12}
        torch.manual_seed(0)
        tm = ref.u2c.Unit2Control(
            64, 3, splits, use_pitch_aug=True, use_naive_v2=True,
            use_conv_stack=True,
        ).eval()
        params = convert_unit2control(sd_numpy(tm), "")

        rng = np.random.default_rng(0)
        units, f0, phase, volume = make_frame_inputs(rng, 2, 16, 64)
        spk_id = np.array([[2], [3]], dtype=np.int64)
        aug = rand_f32(rng, (2, 1, 1))

        with torch.no_grad():
            g_ctrls, g_hidden = tm(
                torch.from_numpy(units), torch.from_numpy(f0),
                torch.from_numpy(phase), torch.from_numpy(volume),
                spk_id=torch.from_numpy(spk_id),
                aug_shift=torch.from_numpy(aug),
            )

        fm = Unit2Control(64, 3, splits, use_pitch_aug=True, use_naive_v2=True,
                          use_conv_stack=True)
        ctrls, hidden = fm.apply(
            {"params": params}, jnp.asarray(units), jnp.asarray(f0),
            jnp.asarray(phase), jnp.asarray(volume),
            spk_id=jnp.asarray(spk_id, jnp.int32), aug_shift=jnp.asarray(aug),
        )
        np.testing.assert_allclose(
            np.asarray(hidden), g_hidden.numpy(), atol=2e-4, rtol=1e-3
        )
        for k in splits:
            np.testing.assert_allclose(
                np.asarray(ctrls[k]), g_ctrls[k].numpy(), atol=2e-4, rtol=1e-3
            )

    def test_pcmer_forward(self, ref):
        """Legacy PCmer decoder (ddsp/pcmer.py FAVOR+) vs models/pcmer.py,
        sharing the projection_matrix buffer through the converter."""
        from ddsp_svc_tpu.convert.models import convert_unit2control_pcmer
        from ddsp_svc_tpu.models.unit2control import Unit2Control

        splits = {"x": 6, "y": 10}
        torch.manual_seed(1)
        tm = ref.u2c.Unit2Control(
            48, 2, splits, use_pitch_aug=False, use_naive_v2=False,
            use_conv_stack=True,
        ).eval()
        sd = sd_numpy(tm)
        params, buffers = convert_unit2control_pcmer(sd, "")

        rng = np.random.default_rng(1)
        units, f0, phase, volume = make_frame_inputs(rng, 2, 16, 48)
        spk_id = np.array([[1], [2]], dtype=np.int64)

        with torch.no_grad():
            g_ctrls, g_hidden = tm(
                torch.from_numpy(units), torch.from_numpy(f0),
                torch.from_numpy(phase), torch.from_numpy(volume),
                spk_id=torch.from_numpy(spk_id),
            )

        fm = Unit2Control(48, 2, splits, use_naive_v2=False, use_conv_stack=True)
        ctrls, hidden = fm.apply(
            {"params": params, "buffers": buffers},
            jnp.asarray(units), jnp.asarray(f0), jnp.asarray(phase),
            jnp.asarray(volume), spk_id=jnp.asarray(spk_id, jnp.int32),
        )
        np.testing.assert_allclose(
            np.asarray(hidden), g_hidden.numpy(), atol=5e-4, rtol=1e-3
        )
        for k in splits:
            np.testing.assert_allclose(
                np.asarray(ctrls[k]), g_ctrls[k].numpy(), atol=5e-4, rtol=1e-3
            )


class TestFullSynths:
    def test_combsub_superfast(self, ref):
        """Full CombSubSuperFast forward (ddsp/vocoder.py:613-710) with
        injected noise, weights via convert_combsub_superfast."""
        from ddsp_svc_tpu.convert.models import convert_combsub_superfast
        from ddsp_svc_tpu.models.ddsp import CombSubSuperFast

        sr, block, win, n_unit, b, t = 16000, 64, 128, 32, 2, 32
        torch.manual_seed(2)
        tm = ref.vocoder.CombSubSuperFast(sr, block, win, n_unit, n_spk=1).eval()
        params = convert_combsub_superfast(sd_numpy(tm))

        rng = np.random.default_rng(2)
        units, f0, _, volume = make_frame_inputs(rng, b, t, n_unit)
        noise = rand_f32(rng, (b, t * block))

        with _PatchedNoise(randn_like=noise), torch.no_grad():
            g_signal, _, _ = tm(
                torch.from_numpy(units), torch.from_numpy(f0),
                torch.from_numpy(volume), infer=True,
            )

        fm = CombSubSuperFast(sampling_rate=sr, block_size=block, win_length=win,
                              n_unit=n_unit, n_spk=1)
        signal, _, _ = fm.apply(
            {"params": params}, jnp.asarray(units), jnp.asarray(f0),
            jnp.asarray(volume), infer=True, noise=jnp.asarray(noise),
        )
        g = g_signal.numpy()
        ours = np.asarray(signal)
        rel = np.linalg.norm(ours - g) / np.linalg.norm(g)
        assert rel < 1e-4, rel

    def test_combsub_fast(self, ref):
        """Full CombSubFast forward (ddsp/vocoder.py:712-786), PCmer decoder."""
        from ddsp_svc_tpu.convert.models import convert_unit2control_pcmer
        from ddsp_svc_tpu.models.ddsp import CombSubFast

        sr, block, n_unit, b, t = 16000, 64, 32, 2, 24
        torch.manual_seed(3)
        tm = ref.vocoder.CombSubFast(sr, block, n_unit, n_spk=1).eval()
        u2c_p, u2c_b = convert_unit2control_pcmer(sd_numpy(tm), "unit2ctrl.")

        rng = np.random.default_rng(3)
        units, f0, _, volume = make_frame_inputs(rng, b, t, n_unit)
        noise = rng.random((b, t * block)).astype(np.float32)

        with _PatchedNoise(rand_like=noise), torch.no_grad():
            g_signal, _, _ = tm(
                torch.from_numpy(units), torch.from_numpy(f0),
                torch.from_numpy(volume), infer=True,
            )

        fm = CombSubFast(sampling_rate=sr, block_size=block, n_unit=n_unit, n_spk=1)
        signal, _, _ = fm.apply(
            {"params": {"unit2ctrl": u2c_p}, "buffers": {"unit2ctrl": u2c_b}},
            jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
            infer=True, noise=jnp.asarray(noise * 2.0 - 1.0),
        )
        g = g_signal.numpy()
        ours = np.asarray(signal)
        rel = np.linalg.norm(ours - g) / np.linalg.norm(g)
        assert rel < 1e-4, rel


    def test_combsub_old(self, ref):
        """Full legacy CombSub forward (ddsp/vocoder.py:788-862):
        group-delay allpass + dynamic-window LTV-FIR chain."""
        from ddsp_svc_tpu.convert.models import convert_unit2control_pcmer
        from ddsp_svc_tpu.models.ddsp import CombSub

        sr, block, n_unit, b, t = 16000, 64, 32, 2, 24
        n_allpass, n_harm, n_noise = 16, 24, 16
        torch.manual_seed(5)
        tm = ref.vocoder.CombSub(sr, block, n_allpass, n_harm, n_noise,
                                 n_unit, n_spk=1).eval()
        u2c_p, u2c_b = convert_unit2control_pcmer(sd_numpy(tm), "unit2ctrl.")

        rng = np.random.default_rng(5)
        units, f0, _, volume = make_frame_inputs(rng, b, t, n_unit)
        noise = rng.random((b, t * block)).astype(np.float32)

        with _PatchedNoise(rand_like=noise), torch.no_grad():
            g_signal, _, _ = tm(
                torch.from_numpy(units), torch.from_numpy(f0),
                torch.from_numpy(volume), infer=True,
            )

        fm = CombSub(sampling_rate=sr, block_size=block,
                     n_mag_allpass=n_allpass, n_mag_harmonic=n_harm,
                     n_mag_noise=n_noise, n_unit=n_unit, n_spk=1)
        signal, _, _ = fm.apply(
            {"params": {"unit2ctrl": u2c_p}, "buffers": {"unit2ctrl": u2c_b}},
            jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
            infer=True, noise=jnp.asarray(noise * 2.0 - 1.0),
        )
        g = g_signal.numpy()
        ours = np.asarray(signal)
        rel = np.linalg.norm(ours - g) / np.linalg.norm(g)
        assert rel < 5e-4, rel

    def test_sins(self, ref):
        """Full Sins forward (ddsp/vocoder.py:532-611), PCmer decoder."""
        from ddsp_svc_tpu.convert.models import convert_unit2control_pcmer
        from ddsp_svc_tpu.models.ddsp import Sins

        sr, block, n_unit, b, t = 16000, 64, 32, 2, 24
        n_harm, n_allpass, n_noise = 24, 16, 16
        torch.manual_seed(4)
        tm = ref.vocoder.Sins(sr, block, n_harm, n_allpass, n_noise, n_unit,
                              n_spk=1).eval()
        u2c_p, u2c_b = convert_unit2control_pcmer(sd_numpy(tm), "unit2ctrl.")

        rng = np.random.default_rng(4)
        units, f0, _, volume = make_frame_inputs(rng, b, t, n_unit)
        noise = rng.random((b, t * block)).astype(np.float32)

        with _PatchedNoise(rand_like=noise), torch.no_grad():
            g_signal, _, _ = tm(
                torch.from_numpy(units), torch.from_numpy(f0),
                torch.from_numpy(volume), infer=True,
            )

        fm = Sins(sampling_rate=sr, block_size=block, n_harmonics=n_harm,
                  n_mag_allpass=n_allpass, n_mag_noise=n_noise, n_unit=n_unit,
                  n_spk=1)
        signal, _, _ = fm.apply(
            {"params": {"unit2ctrl": u2c_p}, "buffers": {"unit2ctrl": u2c_b}},
            jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
            infer=True, noise=jnp.asarray(noise * 2.0 - 1.0),
        )
        g = g_signal.numpy()
        ours = np.asarray(signal)
        rel = np.linalg.norm(ours - g) / np.linalg.norm(g)
        assert rel < 5e-4, rel


class TestDenoisers:
    def test_wavenet(self, ref):
        """diffusion/wavenet.py WaveNet vs models/wavenet.py."""
        from ddsp_svc_tpu.convert.models import convert_wavenet
        from ddsp_svc_tpu.models.wavenet import WaveNet

        m_dims, n_layers, n_chans, n_hidden, b, t = 32, 4, 48, 24, 2, 16
        torch.manual_seed(5)
        tm = ref.wavenet.WaveNet(m_dims, n_layers, n_chans, n_hidden).eval()
        params = convert_wavenet(sd_numpy(tm), "", n_layers)

        rng = np.random.default_rng(5)
        spec = rand_f32(rng, (b, t, m_dims))
        cond = rand_f32(rng, (b, t, n_hidden))
        step = np.array([3.0, 17.0], dtype=np.float32)

        with torch.no_grad():
            g = tm(
                torch.from_numpy(spec.transpose(0, 2, 1))[:, None],
                torch.from_numpy(step),
                torch.from_numpy(cond.transpose(0, 2, 1)),
            )[:, 0].numpy().transpose(0, 2, 1)

        fm = WaveNet(in_dims=m_dims, n_layers=n_layers, n_chans=n_chans,
                     n_hidden=n_hidden)
        ours = np.asarray(
            fm.apply({"params": params}, jnp.asarray(spec), jnp.asarray(step),
                     jnp.asarray(cond))
        )
        np.testing.assert_allclose(ours, g, atol=2e-4, rtol=1e-3)

    def test_naive_v2_diff(self, ref):
        """diffusion/naive_v2_diff.py NaiveV2Diff (use_mlp=False) vs
        models/naive_v2_diff.py."""
        from ddsp_svc_tpu.convert.models import convert_naive_v2_diff
        from ddsp_svc_tpu.models.naive_v2_diff import NaiveV2Diff

        mel, dim, n_layers, cond_dim, b, t = 32, 64, 2, 24, 2, 40
        torch.manual_seed(6)
        tm = ref.nv2.NaiveV2Diff(
            mel_channels=mel, dim=dim, use_mlp=False, condition_dim=cond_dim,
            num_layers=n_layers,
        ).eval()
        params = convert_naive_v2_diff(sd_numpy(tm), "", n_layers)

        rng = np.random.default_rng(6)
        spec = rand_f32(rng, (b, t, mel))
        cond = rand_f32(rng, (b, t, cond_dim))
        step = np.array([5.0, 250.0], dtype=np.float32)

        with torch.no_grad():
            g = tm(
                torch.from_numpy(spec.transpose(0, 2, 1)),
                torch.from_numpy(step),
                torch.from_numpy(cond.transpose(0, 2, 1)),
            ).numpy().transpose(0, 2, 1)

        fm = NaiveV2Diff(mel_channels=mel, dim=dim, use_mlp=False,
                         condition_dim=cond_dim, num_layers=n_layers)
        ours = np.asarray(
            fm.apply({"params": params}, jnp.asarray(spec), jnp.asarray(step),
                     jnp.asarray(cond))
        )
        np.testing.assert_allclose(ours, g, atol=2e-4, rtol=1e-3)


class TestNSFHiFiGAN:
    def test_generator(self, ref):
        """nsf_hifigan/models.py:207-274 Generator vs models/nsf_hifigan.py,
        sine-bank randomness injected on both sides."""
        from ddsp_svc_tpu.convert.nsf_hifigan import convert_nsf_hifigan_state_dict
        from ddsp_svc_tpu.models.nsf_hifigan import Generator

        config = {
            "sampling_rate": 16000,
            "num_mels": 16,
            "upsample_rates": [4, 4, 2],
            "upsample_kernel_sizes": [8, 8, 4],
            "upsample_initial_channel": 64,
            "resblock": "1",
            "resblock_kernel_sizes": [3, 7],
            "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5]],
        }
        h = types.SimpleNamespace(**config)
        torch.manual_seed(7)
        tm = ref.nsf.Generator(h).eval()
        params = convert_nsf_hifigan_state_dict(sd_numpy(tm), config)

        b, t = 2, 16
        upp = int(np.prod(config["upsample_rates"]))
        dim = 8 + 1  # harmonic_num=8 fixed in both (models.py:213-216)
        rng = np.random.default_rng(7)
        mel = rand_f32(rng, (b, t, config["num_mels"]))
        f0 = (200.0 + 100.0 * rng.random((b, t))).astype(np.float32)
        rand_ini = rng.random((1, 1, dim)).astype(np.float32)
        noise = rand_f32(rng, (b, t * upp, dim))

        with _PatchedNoise(rand=rand_ini, randn_like=noise), torch.no_grad():
            g = tm(
                torch.from_numpy(mel.transpose(0, 2, 1)), torch.from_numpy(f0)
            )[:, 0].numpy()

        rand_ini_jnp = jnp.asarray(rand_ini).at[..., 0].set(0.0)
        fm = Generator(sampling_rate=config["sampling_rate"], **{
            k: v for k, v in config.items()
            if k not in ("sampling_rate", "num_mels")
        }, num_mels=config["num_mels"])
        ours = np.asarray(
            fm.apply(
                {"params": params}, jnp.asarray(mel), jnp.asarray(f0),
                sine_kwargs={"rand_ini": rand_ini_jnp,
                             "noise": jnp.asarray(noise)},
            )
        )
        rel = np.linalg.norm(ours - g) / np.linalg.norm(g)
        assert rel < 1e-3, rel


class TestRMVPE:
    def test_e2e0_forward(self, ref):
        """encoder/rmvpe/model.py:36-60 E2E0 (DeepUnet0 + CNN + BiGRU + fc)
        vs features/rmvpe.py, random-init weights through
        convert/rmvpe.convert_rmvpe_state_dict — value-validates the
        converter (PARITY ◐ item; no pretrained ckpt in-image)."""
        import importlib.machinery
        import sys
        import types

        # other golden tests (test_golden_diffusion.py) may already have
        # installed a librosa stub without `filters` — augment whatever is
        # there rather than assume a fresh sys.modules
        if "librosa" not in sys.modules:
            lib = types.ModuleType("librosa")
            lib.__spec__ = importlib.machinery.ModuleSpec(
                "librosa", None, is_package=True
            )
            lib.__path__ = []
            sys.modules["librosa"] = lib
        lib = sys.modules["librosa"]
        if not hasattr(lib, "__path__"):
            lib.__path__ = []
        if "librosa.filters" not in sys.modules:
            filters = types.ModuleType("librosa.filters")

            def _mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kw):
                from ddsp_svc_tpu.ops.mel import mel_filterbank

                return np.asarray(
                    mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
                )

            filters.mel = _mel
            lib.filters = filters
            sys.modules["librosa.filters"] = filters
        from encoder.rmvpe.model import E2E0 as RefE2E0

        from ddsp_svc_tpu.convert.rmvpe import convert_rmvpe_state_dict
        from ddsp_svc_tpu.features.rmvpe import E2E0

        torch.manual_seed(0)
        tm = RefE2E0(4, 1, (2, 2)).eval()
        variables = jax.tree_util.tree_map(
            jnp.asarray, convert_rmvpe_state_dict(sd_numpy(tm))
        )

        rng = np.random.default_rng(0)
        b, t = 1, 32
        mel = rand_f32(rng, (b, t, 128))
        with torch.no_grad():
            g = tm(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()

        ours = np.asarray(E2E0().apply(variables, jnp.asarray(mel)))
        assert ours.shape == g.shape == (b, t, 360)
        np.testing.assert_allclose(ours, g, atol=5e-5, rtol=1e-3)


class TestHubertSoft:
    """Golden forward agreement for the default units encoder: the
    reference's self-contained HuBERT-Soft net (encoder/hubert/model.py:19-80)
    at seeded random init, converted through convert/hubert.py (bshall
    layout), compared over the full units() path (pad(40,40) + conv
    extractor + 12-layer transformer + 256-proj) — value-validates the
    converter that was previously only shape-checked."""

    def test_hubert_soft_units(self, ref):
        import encoder.hubert.model as ref_hubert

        from ddsp_svc_tpu.convert.hubert import convert_hubert_state_dict
        from ddsp_svc_tpu.features.hubert import ENCODER_CONFIGS, HubertModel

        torch.manual_seed(3)
        tm = ref_hubert.HubertSoft().eval()
        rng = np.random.default_rng(11)
        wav = (0.1 * rng.standard_normal((1, 3200))).astype(np.float32)
        with torch.inference_mode():
            want = tm.units(torch.from_numpy(wav).unsqueeze(1)).numpy()

        cfg = ENCODER_CONFIGS["hubertsoft"]
        variables = jax.tree_util.tree_map(
            jnp.asarray, convert_hubert_state_dict(sd_numpy(tm), cfg)
        )
        got = np.asarray(HubertModel(cfg).apply(variables, jnp.asarray(wav)))
        assert got.shape == want.shape == (1, 10, 256)
        # abs-only bound: f32 accumulation noise through 12 random-init
        # post-norm layers reaches ~3e-3 on an O(2) output (writing this
        # test caught a real bug — flax LayerNorm eps 1e-6 vs torch 1e-5);
        # a mapping/transpose error produces O(1) differences
        np.testing.assert_allclose(got, want, atol=5e-3, rtol=0)
