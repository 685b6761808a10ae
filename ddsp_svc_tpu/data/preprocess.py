"""Offline feature-extraction job.

On-disk layout identical to the reference (preprocess.py:35-141):
  <root>/audio/**.wav  ->  units/ f0/ volume/ [mel/ aug_mel/ aug_vol/] *.npy,
  pitch_aug_dict.npy, un-pitchable files moved to skip/.

Differences by design (TPU-first):
  - extractors are the framework's own (features/): YIN or JAX RMVPE f0,
    flax HuBERT units, XLA log-mel — batched on-device per file;
  - pure numpy/jax, no torch.
"""
from __future__ import annotations

import os
import shutil

import numpy as np

from ..features.audio import load_wav
from ..features.f0 import F0Extractor
from ..features.volume import VolumeExtractor
from ..utils.config import traverse_dir


def preprocess(
    path: str,
    f0_extractor: F0Extractor,
    volume_extractor: VolumeExtractor,
    mel_extractor=None,
    units_encoder=None,
    sample_rate: int = 44100,
    hop_size: int = 512,
    use_pitch_aug: bool = False,
    extensions: tuple[str, ...] = ("wav",),
    rng: np.random.Generator | None = None,
    skip_existing: bool = False,
) -> None:
    import jax.numpy as jnp
    from tqdm import tqdm

    rng = rng or np.random.default_rng()
    path_srcdir = os.path.join(path, "audio")
    filelist = traverse_dir(
        path_srcdir, extensions=list(extensions), is_pure=True, is_sort=True
    )
    pitch_aug_dict = {}
    aug_dict_path = os.path.join(path, "pitch_aug_dict.npy")
    if skip_existing and os.path.exists(aug_dict_path):
        # resume: keep recorded keyshifts for files we will skip
        pitch_aug_dict = dict(
            np.load(aug_dict_path, allow_pickle=True).item()
        )

    def out_path(kind, file):
        return os.path.join(path, kind, file + ".npy")

    def save(kind, file, arr):
        p = out_path(kind, file)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        np.save(p, arr)

    for file in tqdm(filelist, desc=f"preprocess {path_srcdir}"):
        if skip_existing:
            expected = ["f0", "volume"]
            if units_encoder is not None:
                expected.append("units")
            if mel_extractor is not None:
                expected += ["mel", "aug_mel", "aug_vol"]
            done = all(os.path.exists(out_path(k, file)) for k in expected)
            if done and (mel_extractor is None or file in pitch_aug_dict):
                continue
        audio, sr = load_wav(os.path.join(path_srcdir, file))
        if sr != sample_rate:
            from ..ops.resample import resample

            audio = np.asarray(resample(jnp.asarray(audio)[None, :], sr, sample_rate))[0]

        # f0 viability first: files destined for skip/ must not pay the
        # mel/HuBERT extraction cost (the dominant preprocessing work)
        f0 = f0_extractor.extract(audio, uv_interp=False)
        uv = f0 == 0
        if not (~uv).any():
            print(f"\n[Error] F0 extraction failed: {file}")
            skip_dir = os.path.join(path, "skip")
            os.makedirs(skip_dir, exist_ok=True)
            shutil.move(os.path.join(path_srcdir, file), skip_dir)
            continue
        f0[uv] = np.interp(np.where(uv)[0], np.where(~uv)[0], f0[~uv])

        volume = volume_extractor.extract(audio)

        keyshift = 0.0
        if mel_extractor is not None:
            audio_j = jnp.asarray(audio)[None, :]
            mel = np.asarray(mel_extractor.extract(audio_j))[0]

            max_amp = float(np.max(np.abs(audio))) + 1e-5
            max_shift = min(1.0, np.log10(1.0 / max_amp))
            log10_vol_shift = rng.uniform(-1.0, max_shift)
            if use_pitch_aug:
                keyshift = float(rng.uniform(-5.0, 5.0))
            gain = 10.0**log10_vol_shift
            aug_mel = np.asarray(
                mel_extractor.extract(audio_j * gain, keyshift=keyshift)
            )[0]
            aug_vol = volume_extractor.extract(audio * gain)

        if units_encoder is not None:
            units = np.asarray(
                units_encoder.encode(jnp.asarray(audio)[None, :], sample_rate, hop_size)
            )[0]
        else:
            units = None

        if units is not None:
            save("units", file, units)
        save("f0", file, f0)
        save("volume", file, volume)
        if mel_extractor is not None:
            pitch_aug_dict[file] = keyshift
            save("mel", file, mel)
            save("aug_mel", file, aug_mel)
            save("aug_vol", file, aug_vol)

    if mel_extractor is not None:
        np.save(aug_dict_path, pitch_aug_dict)
