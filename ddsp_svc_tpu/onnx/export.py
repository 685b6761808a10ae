"""Emit the reference's four ONNX graphs from one of our checkpoints.

Reproduces the export surface of diffusion/onnx_export.py:126-160 +
diffusion/diffusion_onnx.py:474-564 — file names ``{project}_encoder.onnx``
/ ``_denoise.onnx`` / ``_pred.onnx`` / ``_after.onnx``, the same
input/output names, shapes, dynamic axes, and opset 16 — so the artifacts
drop into the same external apps (MoeVoiceStudio / MoeSS-style PNDM hosts).

Covers the 'Diffusion' (Unit2Mel) model family, the only family the
reference exports to ONNX.  Other families are served by the StableHLO
exporter (cli/export.py).
"""
from __future__ import annotations

import os

from ..models.registry import load_model
from .reverse import encoder_state_dict, to_torch, wavenet_state_dict

GRAPHS = ("encoder", "denoise", "pred", "after")
OPSET = 16


def build_mirrors(params: dict, args, model):
    """Construct the four torch mirror modules loaded with our weights.

    ``params`` is the checkpoint's flax param tree; ``model`` the built
    Unit2Mel (for timesteps / out_dims / hidden sizes).
    """
    import torch

    from ..models.diffusion import linear_schedule
    from .mirrors import AfterMirror, EncoderMirror, PredMirror, WaveNetMirror

    n_spk = args.model.n_spk
    enc = EncoderMirror(args.data.encoder_out_channels, n_spk, model.n_hidden)
    enc.load_state_dict(to_torch(encoder_state_dict(params, n_spk)))

    den = WaveNetMirror(model.out_dims, model.n_layers, model.n_chans, model.n_hidden)
    den.load_state_dict(to_torch(wavenet_state_dict(params["denoise_fn"], model.n_layers)))

    sched = linear_schedule(model.timesteps)
    pred = PredMirror(sched["alphas_cumprod"])

    vocoder_type = args.vocoder.type if args.vocoder else None
    scale = 0.434294 if vocoder_type == "nsf-hifigan-log10" else 1.0
    after = AfterMirror(spec_min=-12.0, spec_max=2.0, scale=scale)

    for m in (enc, den, pred, after):
        m.eval()
    return {"encoder": enc, "denoise": den, "pred": pred, "after": after}


def export_onnx(
    model_path: str,
    project_name: str | None = None,
    out_dir: str | None = None,
    n_frames: int = 100,
    graphs=GRAPHS,
) -> dict:
    """Export checkpoint -> {graph: path}.  Paths are
    ``{out_dir}/{project_name}_{graph}.onnx``."""
    import torch

    from .shim import torch_onnx_export

    model, variables, args = load_model(model_path)
    if args.model.type != "Diffusion":
        raise ValueError(
            f"ONNX export covers the 'Diffusion' (Unit2Mel) family — the "
            f"reference's export surface; got model.type={args.model.type!r}. "
            "Use the StableHLO exporter (python -m ddsp_svc_tpu.cli.export) "
            "for other families."
        )
    mirrors = build_mirrors(variables["params"], args, model)

    if project_name is None:
        project_name = os.path.splitext(os.path.basename(model_path))[0]
    out_dir = out_dir or os.path.dirname(model_path) or "."
    os.makedirs(out_dir, exist_ok=True)

    t = n_frames
    u = args.data.encoder_out_channels
    n_spk = max(int(args.model.n_spk or 1), 1)
    mel_bins = model.out_dims
    hidden = model.n_hidden

    torch.manual_seed(0)
    hubert = torch.randn(1, t, u)
    mel2ph = torch.arange(1, t + 1, dtype=torch.long).unsqueeze(0)
    f0 = torch.rand(1, t) * 400.0 + 80.0
    volume = torch.rand(1, t)
    spk_mix = torch.full((t, n_spk), 1.0 / n_spk)
    noise = torch.randn(1, 1, mel_bins, t)
    noise_pred = torch.randn(1, 1, mel_bins, t)
    cond = torch.randn(1, hidden, t)
    time = torch.full((1,), model.k_step_max - 1, dtype=torch.long)
    time_prev = torch.full((1,), max(model.k_step_max - 1 - 100, 0), dtype=torch.long)

    specs = {
        "encoder": dict(
            args=(hubert, mel2ph, f0, volume, spk_mix),
            input_names=["hubert", "mel2ph", "f0", "volume", "spk_mix"],
            output_names=["mel_pred"],
            dynamic_axes={
                "hubert": [1],
                "mel2ph": [1],
                "f0": [1],
                "volume": [1],
                "spk_mix": [0],
            },
        ),
        "denoise": dict(
            args=(noise, time, cond),
            input_names=["noise", "time", "condition"],
            output_names=["noise_pred"],
            dynamic_axes={"noise": [3], "condition": [2]},
        ),
        "pred": dict(
            args=(noise, noise_pred, time, time_prev),
            input_names=["noise", "noise_pred", "time", "time_prev"],
            output_names=["noise_pred_o"],
            dynamic_axes={"noise": [3], "noise_pred": [3]},
        ),
        "after": dict(
            args=(noise,),
            input_names=["x"],
            output_names=["mel_out"],
            dynamic_axes={"x": [3]},
        ),
    }

    paths = {}
    for name in graphs:
        spec = specs[name]
        path = os.path.join(out_dir, f"{project_name}_{name}.onnx")
        with torch.no_grad():
            torch_onnx_export(
                mirrors[name],
                spec["args"],
                path,
                input_names=spec["input_names"],
                output_names=spec["output_names"],
                dynamic_axes=spec["dynamic_axes"],
                opset_version=OPSET,
            )
        paths[name] = path
    return paths
