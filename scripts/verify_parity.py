#!/opt/venv/bin/python
"""One-command end-to-end parity harness vs the reference torch pipeline.

The BASELINE requires output "within the reference's audible SNR bound".
Every module is golden-tested piecewise (tests/test_golden_*.py), but this
is the single entry point that chains them: given a reference checkpoint and
a wav it converts the weights, runs BOTH pipelines stage by stage on
identical inputs, and prints per-stage SNR against the bound — the harness
to run the day real pretrained weights appear (VERDICT r2 missing #4).

Modes
-----
  --self-check [--seconds S] [--families f1,f2]
      No checkpoints needed (runs in this image today): builds the
      reference's own torch modules (/root/reference, read-only, wheels
      stubbed) at seeded random init, converts their state dicts through
      convert/, and runs each family's chain on synthetic features. All
      five reference families are covered: diffusion_fast (main_diff.py:
      196-389: CombSubSuperFast -> mel -> shallow dpm-solver NaiveV2Diff ->
      NSF-HiFiGAN), reflow (main_reflow.py euler chain), unit2mel (the
      pure-diffusion 'Diffusion' model), and the legacy sins/combsub
      synths of main.py.

  --model model_<step>.pt --config config.yaml --wav in.wav
      [--vocoder-ckpt nsf.ckpt] [--pitch yin]
      Converts the real checkpoint, extracts features once with our
      front-end, feeds the SAME features to the reference torch model and
      to ours, and reports per-stage SNR. (Feature extractors are
      golden-tested separately; sharing features isolates model parity
      from extractor wheels.)

Exit code 0 iff every stage meets its bound.
"""
from __future__ import annotations

import argparse
import importlib.machinery
import sys
import types

import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
BOUNDS_DB = {  # f32 forward-agreement bounds (converter noise only)
    "ddsp_wav": 60.0,
    "ddsp_mel": 50.0,
    "sampled_mel": 45.0,
    "vocoder_wav": 45.0,
    "final_wav": 40.0,
}


def _stub(name, pkg=False):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=pkg)
    if pkg:
        m.__path__ = []
    sys.modules[name] = m
    return m


def import_reference():
    """Import the reference model modules with absent wheels stubbed
    (same recipe as tests/test_golden_torch_modules.py)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in ("gin", "pyworld", "parselmouth", "torchcrepe", "resampy",
                 "soundfile", "tqdm"):
        try:  # stub only what the image truly lacks (a fake tqdm would
            __import__(name)  # break transformers' `from tqdm.auto import`)
        except ImportError:
            _stub(name)
    if "tqdm" in sys.modules and not hasattr(sys.modules["tqdm"], "tqdm"):
        sys.modules["tqdm"].tqdm = lambda x, *a, **k: x
        auto = _stub("tqdm.auto")
        auto.tqdm = sys.modules["tqdm"].tqdm
        sys.modules["tqdm"].auto = auto
    _stub("local_attention").LocalAttention = object
    _stub("fairseq").checkpoint_utils = types.SimpleNamespace()
    ta = _stub("torchaudio", pkg=True)
    tat = _stub("torchaudio.transforms")
    tat.Resample = type("Resample", (), {"__init__": lambda self, *a, **k: None})
    ta.transforms = tat
    lb = _stub("librosa", pkg=True)
    lb.sequence = _stub("librosa.sequence")
    lu = _stub("librosa.util")
    lu.normalize = lambda x, **k: x
    lf = _stub("librosa.filters")
    lf.mel = None  # never called (mel extraction stays on our side)
    lb.util, lb.filters = lu, lf
    import ddsp.vocoder as ref_vocoder
    import diffusion.naive_v2_diff as ref_nv2  # noqa: F401 (registers import)
    import diffusion.vocoder as ref_diff_vocoder
    import nsf_hifigan.models as ref_nsf
    import reflow.vocoder as ref_reflow_vocoder

    return types.SimpleNamespace(
        vocoder=ref_vocoder, diff_vocoder=ref_diff_vocoder, nsf=ref_nsf,
        reflow_vocoder=ref_reflow_vocoder,
    )


class PatchedNoise:
    """Monkeypatch torch.{rand,rand_like,randn_like} to fixed arrays."""

    def __init__(self, **vals):
        self.vals = vals

    def __enter__(self):
        import torch

        self.saved = {k: getattr(torch, k) for k in self.vals}
        for k, v in self.vals.items():
            arr = torch.from_numpy(np.ascontiguousarray(v))
            setattr(torch, k, lambda *a, _arr=arr, **kw: _arr.clone())
        return self

    def __exit__(self, *exc):
        import torch

        for k, f in self.saved.items():
            setattr(torch, k, f)
        return False


def snr_db(ref: np.ndarray, got: np.ndarray) -> float:
    ref = np.asarray(ref, np.float64)
    got = np.asarray(got, np.float64)
    err = ((got - ref) ** 2).sum()
    sig = (ref ** 2).sum()
    if err == 0:
        return float("inf")
    return float(10.0 * np.log10(max(sig, 1e-30) / err))


class Report:
    def __init__(self):
        self.rows = []

    def add(self, stage: str, value: float, bound: float):
        ok = value >= bound
        self.rows.append((stage, value, bound, ok))
        mark = "ok " if ok else "FAIL"
        print(f"  [{mark}] {stage:<14} SNR {value:7.1f} dB  (bound {bound:.0f})")

    @property
    def ok(self) -> bool:
        return all(r[3] for r in self.rows)


def _mel_extractor(sr, hop, n_mels=128):
    from ddsp_svc_tpu.ops.mel import LogMelSpectrogram

    return LogMelSpectrogram(sr=sr, n_mels=n_mels, n_fft=2048, win_size=2048,
                             hop_length=hop, fmin=40.0, fmax=16000.0)


def run_chain_parity(ref, torch_cascade, our_params, args_cfg, units, f0,
                     volume, report, torch_vocoder=None, our_vocoder=None,
                     k_step=100, speedup=10):
    """Shared stage chain: torch DiffusionFast cascade (+ optional vocoder)
    vs ours, on identical features + injected noise. All arrays numpy."""
    import torch

    import jax
    import jax.numpy as jnp

    sr = args_cfg.data.sampling_rate
    hop = args_cfg.data.block_size
    b, t, n_unit = units.shape
    rng = np.random.default_rng(99)
    ddsp_noise = rng.standard_normal((b, t * hop)).astype(np.float32)
    m = args_cfg.model.out_dims
    init_noise = rng.standard_normal((b, 1, m, t)).astype(np.float32)

    mel_x = _mel_extractor(sr, hop, m)

    # --- torch side -------------------------------------------------------
    tu = torch.from_numpy(units)
    tf = torch.from_numpy(f0)
    tv = torch.from_numpy(volume)
    with PatchedNoise(randn_like=ddsp_noise), torch.no_grad():
        t_ddsp_wav, _, (_, _) = torch_cascade.ddsp_model(tu, tf, tv, infer=True)
    t_mel = np.asarray(
        mel_x.extract(jnp.asarray(t_ddsp_wav.numpy()))
    )  # shared mel front-end (golden-tested vs nvSTFT separately)
    with PatchedNoise(randn_like=init_noise), torch.no_grad():
        t_sampled = torch_cascade.diff_model(
            torch.from_numpy(t_mel), gt_spec=torch.from_numpy(t_mel),
            infer=True, infer_speedup=speedup, method="dpm-solver",
            k_step=k_step, use_tqdm=False,
        ).numpy()

    # --- our side: the cascade's submodules applied stage-wise -------------
    from ddsp_svc_tpu.models.ddsp import CombSubSuperFast

    ddsp = CombSubSuperFast(
        sampling_rate=sr, block_size=hop,
        win_length=args_cfg.model.win_length, n_unit=n_unit,
        n_spk=args_cfg.model.n_spk,
    )
    o_ddsp_wav, _, _ = ddsp.apply(
        {"params": our_params["ddsp_model"]}, jnp.asarray(units),
        jnp.asarray(f0), jnp.asarray(volume), infer=True,
        noise=jnp.asarray(ddsp_noise),
    )
    o_ddsp_wav = np.asarray(o_ddsp_wav)
    report.add("ddsp_wav", snr_db(t_ddsp_wav.numpy(), o_ddsp_wav),
               BOUNDS_DB["ddsp_wav"])

    o_mel = np.asarray(mel_x.extract(jnp.asarray(o_ddsp_wav)))
    report.add("ddsp_mel", snr_db(t_mel, o_mel), BOUNDS_DB["ddsp_mel"])

    from ddsp_svc_tpu.models.diffusion import GaussianDiffusion
    from ddsp_svc_tpu.models.naive_v2_diff import NaiveV2Diff

    gd = GaussianDiffusion(
        NaiveV2Diff(mel_channels=m, dim=args_cfg.model.n_chans,
                    num_layers=args_cfg.model.n_layers, condition_dim=m,
                    use_mlp=False),
        out_dims=m, timesteps=1000, k_step=k_step,
    )
    o_sampled = np.asarray(
        gd.apply(
            {"params": {"denoise_fn": our_params["denoise_fn"]}},
            jnp.asarray(o_mel), gt_spec=jnp.asarray(o_mel), infer=True,
            infer_speedup=speedup, sampler="dpm-solver", k_step=k_step,
            key=jax.random.PRNGKey(0),
            init_noise=jnp.asarray(init_noise[:, 0].transpose(0, 2, 1)),
        )
    )
    report.add("sampled_mel", snr_db(t_sampled, o_sampled),
               BOUNDS_DB["sampled_mel"])

    if torch_vocoder is None or our_vocoder is None:
        return t_sampled, o_sampled
    torch_gen, sine_kwargs = torch_vocoder
    gen, gen_params = our_vocoder
    f0_voc = f0[..., 0]
    with torch.no_grad():
        t_wav = torch_gen(
            torch.from_numpy(t_sampled).transpose(1, 2),
            torch.from_numpy(f0_voc),
        ).squeeze(1).numpy()
    o_wav = np.asarray(
        gen.apply({"params": gen_params}, jnp.asarray(o_sampled),
                  jnp.asarray(f0_voc), sine_kwargs=sine_kwargs)
    )
    # vocoder stage isolated: the SAME mel into both vocoders
    o_wav_iso = np.asarray(
        gen.apply({"params": gen_params}, jnp.asarray(t_sampled),
                  jnp.asarray(f0_voc), sine_kwargs=sine_kwargs)
    )
    report.add("vocoder_wav", snr_db(t_wav, o_wav_iso),
               BOUNDS_DB["vocoder_wav"])
    report.add("final_wav", snr_db(t_wav, o_wav), BOUNDS_DB["final_wav"])
    return t_sampled, o_sampled


def make_torch_vocoder(ref, sr, m, seed=5):
    """Seeded random-init reference NSF-HiFiGAN + our converted twin, with
    the sine source made deterministic on both sides (the golden-test
    recipe: inject uniform phases + zero noise via sine_kwargs)."""
    import torch

    import jax.numpy as jnp

    from ddsp_svc_tpu.convert.nsf_hifigan import convert_nsf_hifigan_state_dict
    from ddsp_svc_tpu.models.nsf_hifigan import Generator

    class H(dict):
        __getattr__ = dict.__getitem__

    h = H(resblock="1", upsample_rates=[8, 8, 2, 2, 2],
          upsample_kernel_sizes=[16, 16, 4, 4, 4],
          upsample_initial_channel=128,
          resblock_kernel_sizes=[3, 7, 11],
          resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
          num_mels=m, sampling_rate=sr)
    torch.manual_seed(seed)
    tgen = ref.nsf.Generator(h).eval()
    params = convert_nsf_hifigan_state_dict(
        {k: v.detach().numpy() for k, v in tgen.state_dict().items()}, h
    )
    gen = Generator(sampling_rate=sr, num_mels=m,
                    upsample_initial_channel=128)
    rng = np.random.default_rng(seed)
    rand_ini = rng.random((1, 1, 9)).astype(np.float32)
    rand_ini[..., 0] = 0.0
    sine_kwargs = dict(
        rand_ini=jnp.asarray(rand_ini),
        noise=jnp.zeros((1, 1, 1), np.float32),
    )

    class TorchDeterministic(torch.nn.Module):
        def __init__(self, g):
            super().__init__()
            self.g = g

        def forward(self, mel, f0):
            with PatchedNoise(
                rand=rand_ini,
                randn_like=np.zeros((1, 1, 1), np.float32),
            ):
                return self.g(mel, f0)

    return (TorchDeterministic(tgen), sine_kwargs), (gen, params)


def _convert_torch(tcasc, args_cfg):
    """state_dict -> convert_reference_model through a real model_<step>.pt
    file (the exact path a user's checkpoint takes)."""
    import tempfile

    import torch

    from ddsp_svc_tpu.convert.models import convert_reference_model

    with tempfile.NamedTemporaryFile(suffix="model_0.pt") as f:
        torch.save({"model": tcasc.state_dict()}, f.name)
        return convert_reference_model(f.name, args_cfg)


def _seeded_inputs(seconds, sr, hop, n_unit, seed=7):
    t = max(16, int(seconds * sr) // hop)
    rng = np.random.default_rng(seed)
    units = rng.standard_normal((1, t, n_unit)).astype(np.float32)
    f0 = (220.0 * np.exp(
        0.2 * np.sin(np.arange(t) / 9.0))).astype(np.float32)[None, :, None]
    volume = (0.5 + 0.3 * rng.random((1, t, 1))).astype(np.float32)
    return t, units, f0, volume


def check_diffusion_fast(ref, report, seconds):
    """main_diff.py:196-389 DiffusionFast chain: CombSubSuperFast -> mel ->
    shallow dpm-solver diffusion (NaiveV2Diff) -> NSF-HiFiGAN."""
    import torch

    from ddsp_svc_tpu.utils.config import DotDict

    sr, hop, win, n_unit, m = 44100, 512, 2048, 64, 32
    args_cfg = DotDict({
        "data": {"sampling_rate": sr, "block_size": hop},
        "model": {"type": "DiffusionFast", "win_length": win, "n_spk": 1,
                  "n_layers": 3, "n_chans": 64, "k_step_max": 100,
                  "out_dims": m},
    })
    torch.manual_seed(3)
    tcasc = ref.diff_vocoder.Unit2WavFast(
        sr, hop, win, n_unit, 1, out_dims=m, n_layers=3, n_chans=64,
    ).eval()
    our_params = _convert_torch(tcasc, args_cfg)
    _, units, f0, volume = _seeded_inputs(seconds, sr, hop, n_unit)
    torch_voc, our_voc = make_torch_vocoder(ref, sr, m)
    run_chain_parity(ref, tcasc, our_params, args_cfg, units, f0, volume,
                     report, torch_vocoder=torch_voc, our_vocoder=our_voc)


def check_reflow(ref, report, seconds):
    """main_reflow.py chain: CombSubSuperFast -> mel -> RectifiedFlow
    (euler, t_start 0.7) per reflow/vocoder.py:149-198."""
    import torch

    import jax
    import jax.numpy as jnp

    from ddsp_svc_tpu.models.ddsp import CombSubSuperFast
    from ddsp_svc_tpu.models.naive_v2_diff import NaiveV2Diff
    from ddsp_svc_tpu.models.reflow import RectifiedFlow
    from ddsp_svc_tpu.utils.config import DotDict

    sr, hop, win, n_unit, m = 44100, 512, 2048, 64, 32
    args_cfg = DotDict({
        "data": {"sampling_rate": sr, "block_size": hop},
        "model": {"type": "RectifiedFlow", "win_length": win, "n_spk": 1,
                  "n_layers": 3, "n_chans": 64, "out_dims": m,
                  "t_start": 0.7},
    })
    torch.manual_seed(6)
    tcasc = ref.reflow_vocoder.Unit2Wav(
        sr, hop, win, n_unit, 1, out_dims=m, n_layers=3, n_chans=64,
    ).eval()
    our_params = _convert_torch(tcasc, args_cfg)
    t, units, f0, volume = _seeded_inputs(seconds, sr, hop, n_unit, seed=8)
    rng = np.random.default_rng(199)
    ddsp_noise = rng.standard_normal((1, t * hop)).astype(np.float32)
    init_noise = rng.standard_normal((1, 1, m, t)).astype(np.float32)
    mel_x = _mel_extractor(sr, hop, m)

    tu, tf, tv = map(torch.from_numpy, (units, f0, volume))
    with PatchedNoise(randn_like=ddsp_noise), torch.no_grad():
        t_wav, _, _ = tcasc.ddsp_model(tu, tf, tv, infer=True)
    t_mel = np.asarray(mel_x.extract(jnp.asarray(t_wav.numpy())))
    with PatchedNoise(randn=init_noise), torch.no_grad():
        t_sampled = tcasc.reflow_model(
            torch.from_numpy(t_mel), gt_spec=torch.from_numpy(t_mel),
            infer=True, infer_step=20, method="euler", t_start=0.7,
            use_tqdm=False,
        ).numpy()

    ddsp = CombSubSuperFast(sampling_rate=sr, block_size=hop, win_length=win,
                            n_unit=n_unit, n_spk=1)
    o_wav, _, _ = ddsp.apply(
        {"params": our_params["ddsp_model"]}, jnp.asarray(units),
        jnp.asarray(f0), jnp.asarray(volume), infer=True,
        noise=jnp.asarray(ddsp_noise),
    )
    o_wav = np.asarray(o_wav)
    report.add("reflow/ddsp_wav", snr_db(t_wav.numpy(), o_wav),
               BOUNDS_DB["ddsp_wav"])
    o_mel = np.asarray(mel_x.extract(jnp.asarray(o_wav)))
    report.add("reflow/ddsp_mel", snr_db(t_mel, o_mel),
               BOUNDS_DB["ddsp_mel"])

    rf = RectifiedFlow(
        NaiveV2Diff(mel_channels=m, dim=64, num_layers=3, condition_dim=m,
                    use_mlp=False),
        out_dims=m,
    )
    o_sampled = np.asarray(rf.apply(
        {"params": {"velocity_fn": our_params["velocity_fn"]}},
        jnp.asarray(o_mel), gt_spec=jnp.asarray(o_mel), infer=True,
        infer_step=20, sampler="euler", t_start=0.7,
        key=jax.random.PRNGKey(0),
        init_noise=jnp.asarray(init_noise[:, 0].transpose(0, 2, 1)),
    ))
    report.add("reflow/sampled_mel", snr_db(t_sampled, o_sampled),
               BOUNDS_DB["sampled_mel"])


def check_unit2mel(ref, report, seconds):
    """main_diff.py pure-diffusion model ('Diffusion' = Unit2Mel,
    diffusion/vocoder.py:171-218): embeds -> GaussianDiffusion(WaveNet),
    shallow start from a provided gt mel."""
    import torch

    import jax
    import jax.numpy as jnp

    from ddsp_svc_tpu.models.cascade import Unit2Mel
    from ddsp_svc_tpu.utils.config import DotDict

    sr, hop, n_unit, m, hid, layers, chans = 44100, 512, 64, 32, 48, 4, 48
    args_cfg = DotDict({
        "data": {"sampling_rate": sr, "block_size": hop},
        "model": {"type": "Diffusion", "n_spk": 2, "n_layers": layers,
                  "n_chans": chans, "n_hidden": hid, "out_dims": m},
    })
    torch.manual_seed(9)
    tmod = ref.diff_vocoder.Unit2Mel(
        n_unit, 2, False, m, n_layers=layers, n_chans=chans, n_hidden=hid,
    ).eval()
    our_params = _convert_torch(tmod, args_cfg)
    t, units, f0, volume = _seeded_inputs(seconds, sr, hop, n_unit, seed=10)
    rng = np.random.default_rng(299)
    gt_spec = (-4.0 + 2.0 * rng.standard_normal((1, t, m))).astype(np.float32)
    init_noise = rng.standard_normal((1, 1, m, t)).astype(np.float32)

    with PatchedNoise(randn_like=init_noise), torch.no_grad():
        t_sampled = tmod(
            torch.from_numpy(units), torch.from_numpy(f0),
            torch.from_numpy(volume),
            spk_id=torch.LongTensor([[1]]),
            gt_spec=torch.from_numpy(gt_spec), infer=True, infer_speedup=10,
            method="dpm-solver", k_step=100, use_tqdm=False,
        ).numpy()

    fmod = Unit2Mel(n_unit, 2, False, m, n_layers=layers, n_chans=chans,
                    n_hidden=hid)
    o_sampled = np.asarray(fmod.apply(
        {"params": our_params},
        jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
        spk_id=jnp.array([[1]], jnp.int32),
        gt_spec=jnp.asarray(gt_spec), infer=True, infer_speedup=10,
        sampler="dpm-solver", k_step=100, key=jax.random.PRNGKey(0),
        init_noise=jnp.asarray(init_noise[:, 0].transpose(0, 2, 1)),
    ))
    report.add("unit2mel/sampled_mel", snr_db(t_sampled, o_sampled),
               BOUNDS_DB["sampled_mel"])


def _check_legacy(ref, report, seconds, which):
    """main.py legacy DDSP synths (Sins / CombSub, PCmer decoder,
    ddsp/vocoder.py:532-611 / :788-862) through convert_reference_model."""
    import torch

    import jax.numpy as jnp

    from ddsp_svc_tpu.models.ddsp import CombSub, Sins
    from ddsp_svc_tpu.utils.config import DotDict

    sr, hop, n_unit = 16000, 64, 32
    n_harm, n_allpass, n_noise = 24, 16, 16
    t = max(16, int(seconds * sr) // hop)
    args_cfg = DotDict({
        "data": {"sampling_rate": sr, "block_size": hop},
        "model": {"type": {"sins": "Sins", "combsub": "CombSub"}[which]},
    })
    torch.manual_seed({"sins": 4, "combsub": 5}[which])
    if which == "sins":
        tm = ref.vocoder.Sins(sr, hop, n_harm, n_allpass, n_noise, n_unit,
                              n_spk=1).eval()
        fm = Sins(sampling_rate=sr, block_size=hop, n_harmonics=n_harm,
                  n_mag_allpass=n_allpass, n_mag_noise=n_noise,
                  n_unit=n_unit, n_spk=1)
    else:
        tm = ref.vocoder.CombSub(sr, hop, n_allpass, n_harm, n_noise,
                                 n_unit, n_spk=1).eval()
        fm = CombSub(sampling_rate=sr, block_size=hop,
                     n_mag_allpass=n_allpass, n_mag_harmonic=n_harm,
                     n_mag_noise=n_noise, n_unit=n_unit, n_spk=1)
    params, buffers = _convert_torch(tm, args_cfg)
    _, units, f0, volume = _seeded_inputs(
        seconds, sr, hop, n_unit, seed={"sins": 4, "combsub": 5}[which])
    rng = np.random.default_rng(399)
    noise = rng.random((1, t * hop)).astype(np.float32)

    with PatchedNoise(rand_like=noise), torch.no_grad():
        t_wav, _, _ = tm(
            torch.from_numpy(units), torch.from_numpy(f0),
            torch.from_numpy(volume), infer=True,
        )
    import jax

    o_wav, _, _ = fm.apply(
        {"params": params, "buffers": buffers},
        jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
        infer=True, noise=jnp.asarray(noise * 2.0 - 1.0),
        rngs={"noise": jax.random.PRNGKey(0)},
    )
    report.add(f"{which}/wav", snr_db(t_wav.numpy(), np.asarray(o_wav)),
               BOUNDS_DB["ddsp_wav"])


FAMILY_CHECKS = {
    "diffusion_fast": check_diffusion_fast,
    "reflow": check_reflow,
    "unit2mel": check_unit2mel,
    "sins": lambda ref, rep, s: _check_legacy(ref, rep, s, "sins"),
    "combsub": lambda ref, rep, s: _check_legacy(ref, rep, s, "combsub"),
}


def self_check(seconds: float, families=None) -> int:
    print("verify_parity --self-check: reference torch modules at seeded "
          "random init -> convert/ -> per-stage SNR")
    ref = import_reference()
    report = Report()
    for fam in families or FAMILY_CHECKS:
        print(f"-- family: {fam}")
        FAMILY_CHECKS[fam](ref, report, seconds)
    print("self-check:", "PASS" if report.ok else "FAIL")
    return 0 if report.ok else 1


def real_weights(cmd) -> int:
    import jax.numpy as jnp

    from ddsp_svc_tpu.convert.models import convert_reference_model
    from ddsp_svc_tpu.features.audio import load_wav
    from ddsp_svc_tpu.features.f0 import F0Extractor
    from ddsp_svc_tpu.features.volume import VolumeExtractor
    from ddsp_svc_tpu.utils.config import load_config

    print(f"verify_parity: {cmd.model} vs reference torch chain on {cmd.wav}")
    ref = import_reference()
    args_cfg = load_config(cmd.config)
    if args_cfg.model.type != "DiffusionFast":
        raise SystemExit(
            "real-weights mode currently drives the DiffusionFast chain "
            f"(main_diff.py); got {args_cfg.model.type} — use the family "
            "golden tests for other types"
        )
    our_params = convert_reference_model(cmd.model, args_cfg)

    import torch

    sd = torch.load(cmd.model, map_location="cpu", weights_only=False)
    sd = sd.get("model", sd)
    sr = args_cfg.data.sampling_rate
    hop = args_cfg.data.block_size
    tcasc = ref.diff_vocoder.Unit2WavFast(
        sr, hop, args_cfg.model.win_length,
        args_cfg.data.encoder_out_channels, args_cfg.model.n_spk,
        out_dims=args_cfg.model.out_dims, n_layers=args_cfg.model.n_layers,
        n_chans=args_cfg.model.n_chans,
    ).eval()
    tcasc.load_state_dict(sd)

    audio, in_sr = load_wav(cmd.wav)
    if in_sr != sr:
        from ddsp_svc_tpu.ops.resample import resample

        audio = np.asarray(resample(jnp.asarray(audio)[None], in_sr, sr))[0]
    f0 = F0Extractor(cmd.pitch, sr, hop).extract(audio, uv_interp=True)
    volume = VolumeExtractor(hop).extract(audio)
    t = len(f0)
    from ddsp_svc_tpu.cli.common import build_units_encoder

    if cmd.encoder_ckpt:
        args_cfg.data.encoder_ckpt = cmd.encoder_ckpt
    enc = build_units_encoder(args_cfg)
    units = np.asarray(enc.encode(jnp.asarray(audio)[None], sr, hop))
    t = min(t, units.shape[1])
    units, f0, volume = (units[:, :t], f0[None, :t, None],
                         volume[None, :t, None].astype(np.float32))

    torch_voc = our_voc = None
    if cmd.vocoder_ckpt:
        raise SystemExit(
            "--vocoder-ckpt wiring pends real checkpoint layouts; convert "
            "it with `ddsp-svc-convert nsf-hifigan` and A/B via "
            "tests/test_golden_torch_modules.py::TestNSFHiFiGAN meanwhile"
        )
    report = Report()
    run_chain_parity(ref, tcasc, our_params, args_cfg, units,
                     f0.astype(np.float32), volume, report,
                     torch_vocoder=torch_voc, our_vocoder=our_voc,
                     k_step=args_cfg.model.k_step_max)
    print("parity:", "PASS" if report.ok else "FAIL")
    return 0 if report.ok else 1


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--self-check", action="store_true")
    p.add_argument("--families", default=None,
                   help="comma list of self-check families (default all): "
                        + ",".join(FAMILY_CHECKS))
    p.add_argument("--seconds", type=float, default=0.5)
    p.add_argument("--model")
    p.add_argument("--config")
    p.add_argument("--wav")
    p.add_argument("--pitch", default="yin")
    p.add_argument("--vocoder-ckpt")
    p.add_argument("--encoder-ckpt")
    p.add_argument("--tpu", action="store_true",
                   help="run the JAX side on the TPU (default: CPU — the "
                        "torch side is CPU, and parity is platform-free)")
    cmd = p.parse_args(argv)
    if not cmd.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if cmd.self_check:
        fams = None
        if cmd.families:
            fams = [f.strip() for f in cmd.families.split(",") if f.strip()]
            unknown = set(fams) - set(FAMILY_CHECKS)
            if unknown:
                p.error(f"unknown families: {sorted(unknown)}")
        return self_check(cmd.seconds, fams)
    if not (cmd.model and cmd.config and cmd.wav):
        p.error("--model/--config/--wav required (or --self-check)")
    return real_weights(cmd)


if __name__ == "__main__":
    sys.exit(main())
