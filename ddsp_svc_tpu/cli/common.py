"""Shared CLI helpers: building extractors/models from a config."""
from __future__ import annotations

import os

import numpy as np

from ..features.f0 import F0Extractor
from ..features.hubert import UnitsEncoder
from ..features.volume import VolumeExtractor
from ..ops.mel import LogMelSpectrogram
from ..utils.config import DotDict


def default_compile_cache_dir() -> str:
    """Per-user cache directory: a fixed world-shared /tmp name would let
    another local user pre-create or poison the directory of deserialized
    XLA executables."""
    return f"/tmp/ddsp_svc_tpu_jax_cache_{os.getuid()}"


def enable_compile_cache(path: str | None = None) -> str | None:
    """Persist XLA executables across process restarts so serving/inference
    startup skips recompiles (first compile of the big graphs takes minutes
    on some backends). Precedence: explicit ``path`` > DDSP_SVC_TPU_CACHE
    env (``0`` disables) > per-user /tmp default (shared with bench.py)."""
    import jax

    if path is None:
        env = os.environ.get("DDSP_SVC_TPU_CACHE", "")
        if env == "0":
            return None
        if not env and str(
            jax.config.jax_platforms or ""
        ).startswith("cpu"):
            # explicitly-forced CPU (tests/dev loops): XLA:CPU AOT reloads
            # log machine-feature-mismatch errors — opt in via env/path
            # instead. (reading the config does not initialize the backend)
            return None
        path = env or default_compile_cache_dir()

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache even fast/small compiles: serving restarts re-pay every one
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path


def load_encoder_params(path: str | None):
    """Load converted flax params (.npz/.msgpack) if present, else None
    (random init with a warning — converters live in convert/)."""
    from ..utils.params import load_params

    if not path:
        return None
    params = load_params(path)
    if params is None:
        print(f" [!] encoder checkpoint {path!r} not found/convertible — "
              "using random init (convert with python -m ddsp_svc_tpu.convert)")
    return params


def build_f0_extractor(args: DotDict) -> F0Extractor:
    kind = args.data.f0_extractor
    model_params = None
    pretrained = {"rmvpe": "pretrain/rmvpe/model.msgpack",
                  "crepe": "pretrain/crepe/full.msgpack"}
    if kind in pretrained:
        ckpt = pretrained[kind]
        if os.path.exists(ckpt):
            model_params = load_encoder_params(ckpt)
        else:
            print(f" [!] no converted {kind} weights found — falling back to "
                  "the built-in YIN extractor")
            kind = "yin"
    return F0Extractor(
        kind,
        sample_rate=args.data.sampling_rate,
        hop_size=args.data.block_size,
        f0_min=args.data.f0_min,
        f0_max=args.data.f0_max,
        model_params=model_params,
    )


def build_units_encoder(args: DotDict) -> UnitsEncoder:
    return UnitsEncoder(
        args.data.encoder,
        params=load_encoder_params(args.data.encoder_ckpt),
        encoder_sample_rate=args.data.encoder_sample_rate,
        encoder_hop_size=args.data.encoder_hop_size,
        cnhubertsoft_gate=args.data.cnhubertsoft_gate or 10,
    )


def build_mel_extractor(args: DotDict) -> LogMelSpectrogram:
    return LogMelSpectrogram(
        sr=args.data.sampling_rate,
        n_mels=128,
        n_fft=2048,
        win_size=2048,
        hop_length=args.data.block_size,
        fmin=40.0,
        fmax=16000.0,
    )


def needs_mel(args: DotDict) -> bool:
    return args.model.type in (
        "Diffusion", "DiffusionNew", "DiffusionFast", "RectifiedFlow"
    )
