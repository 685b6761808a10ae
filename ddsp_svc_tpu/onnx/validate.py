"""End-to-end validation of exported ONNX artifacts, wheel-free.

Drives the four exported graphs through the external app's PNDM loop
(the host loop of diffusion/diffusion_onnx.py:566-608 — what
MoeVoiceStudio-style hosts implement) with the numpy runtime, and compares
the produced mel against the JAX Unit2Mel sampling the same chain with the
same initial noise.  This is the proof that the .onnx files reproduce the
checkpoint they were exported from.
"""
from __future__ import annotations

import numpy as np

from .reader import load_model_file
from .runtime import run_model


def pndm_infer_onnx(
    graph_paths: dict,
    hubert: np.ndarray,  # (1, T, U)
    mel2ph: np.ndarray,  # (1, T) int64
    f0: np.ndarray,  # (1, T)
    volume: np.ndarray,  # (1, T)
    spk_mix: np.ndarray | None,  # (T, n_spk) or None
    init_noise: np.ndarray,  # (1, 1, M, T)
    k_step: int,
    speedup: int,
) -> np.ndarray:
    """Run the full exported chain; returns the denormalized mel (1, M, T)."""
    models = {k: load_model_file(p) for k, p in graph_paths.items()}

    enc_feeds = {
        "hubert": hubert.astype(np.float32),
        "mel2ph": mel2ph.astype(np.int64),
        "f0": f0.astype(np.float32),
        "volume": volume.astype(np.float32),
    }
    enc_inputs = {vi.name for vi in models["encoder"].graph.inputs}
    if "spk_mix" in enc_inputs:
        enc_feeds["spk_mix"] = spk_mix.astype(np.float32)
    cond = run_model(models["encoder"], enc_feeds)["mel_pred"]

    def denoise(x, t):
        return run_model(
            models["denoise"],
            {"noise": x, "time": t, "condition": cond},
        )["noise_pred"]

    def pred(x, eps, t, t_prev):
        return run_model(
            models["pred"],
            {"noise": x, "noise_pred": eps, "time": t, "time_prev": t_prev},
        )["noise_pred_o"]

    x = init_noise.astype(np.float32)
    noise_list: list[np.ndarray] = []
    for i in reversed(range(0, k_step, speedup)):
        t = np.array([i], np.int64)
        t_prev = np.array([max(i - speedup, 0)], np.int64)
        eps = denoise(x, t)
        if len(noise_list) == 0:
            x_p = pred(x, eps, t, t_prev)
            eps_prev = denoise(x_p, t_prev)
            eps_prime = (eps + eps_prev) / 2.0
        elif len(noise_list) == 1:
            eps_prime = (3.0 * eps - noise_list[-1]) / 2.0
        elif len(noise_list) == 2:
            eps_prime = (23.0 * eps - 16.0 * noise_list[-1] + 5.0 * noise_list[-2]) / 12.0
        else:
            eps_prime = (
                55.0 * eps
                - 59.0 * noise_list[-1]
                + 37.0 * noise_list[-2]
                - 9.0 * noise_list[-3]
            ) / 24.0
        x = pred(x, eps_prime, t, t_prev)
        noise_list.append(eps)
        noise_list = noise_list[-3:]
    return run_model(models["after"], {"x": x})["mel_out"]


def validate_export(
    model_path: str,
    graph_paths: dict,
    n_frames: int = 24,
    speedup: int | None = None,
    seed: int = 0,
) -> dict:
    """Export self-check: ONNX chain vs the JAX checkpoint, same init noise.

    Returns {"snr_db": float, "max_abs": float, "ref_rms": float}.
    """
    import jax
    import jax.numpy as jnp

    from ..models.registry import load_model

    model, variables, args = load_model(model_path)
    rng = np.random.default_rng(seed)
    t = n_frames
    u = args.data.encoder_out_channels
    n_spk = max(int(args.model.n_spk or 1), 1)
    mel_bins = model.out_dims
    k_step = model.k_step_max
    if speedup is None:
        # >1: the JAX reference path routes speedup<=1 to the stochastic
        # ancestral chain (models/diffusion.py:177-189), not PNDM
        speedup = max(k_step // 10, 2)

    hubert = rng.standard_normal((1, t, u)).astype(np.float32)
    mel2ph = np.arange(1, t + 1, dtype=np.int64)[None]  # identity alignment
    f0 = (rng.random((1, t)) * 300.0 + 80.0).astype(np.float32)
    volume = rng.random((1, t)).astype(np.float32)
    init_noise = rng.standard_normal((1, 1, mel_bins, t)).astype(np.float32)
    if n_spk > 1:
        mix = rng.random(n_spk).astype(np.float32)
        mix /= mix.sum()
        spk_mix = np.tile(mix[None], (t, 1))
        spk_mix_dict = {k + 1: float(mix[k]) for k in range(n_spk)}
    else:
        spk_mix = None
        spk_mix_dict = None

    onnx_mel = pndm_infer_onnx(
        graph_paths, hubert, mel2ph, f0, volume, spk_mix, init_noise,
        k_step, speedup,
    )  # (1, M, T)

    jax_mel = model.apply(
        variables,
        jnp.asarray(hubert),
        jnp.asarray(f0)[..., None],
        jnp.asarray(volume)[..., None],
        spk_id=jnp.ones((1, 1), jnp.int32),
        spk_mix_dict=spk_mix_dict,
        infer=True,
        infer_speedup=speedup,
        sampler="pndm",
        init_noise=jnp.asarray(init_noise[:, 0].transpose(0, 2, 1)),  # (1,T,M)
        rngs={"noise": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
    )  # (1, T, M), natural-log mel

    vocoder_type = args.vocoder.type if args.vocoder else None
    scale = 0.434294 if vocoder_type == "nsf-hifigan-log10" else 1.0
    ref = np.asarray(jax_mel)[0].T * scale  # (M, T)
    got = onnx_mel[0]
    err = got - ref
    ref_rms = float(np.sqrt(np.mean(ref**2)) + 1e-12)
    err_rms = float(np.sqrt(np.mean(err**2)) + 1e-20)
    return {
        "snr_db": 20.0 * float(np.log10(ref_rms / err_rms)),
        "max_abs": float(np.abs(err).max()),
        "ref_rms": ref_rms,
        "steps": int(np.ceil(k_step / speedup)),
    }
