"""Directory-recursive batch inference (batch_infer.py parity: whole-file
conversion of every wav under an input tree, mirrored to the output tree).

python -m ddsp_svc_tpu.cli.batch_infer -m model.ckpt -i in_dir -o out_dir [...]
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from ..features.audio import load_wav, save_wav
from ..infer.pipeline import SvcPipeline
from ..utils.config import traverse_dir


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("-i", "--input_dir", required=True)
    p.add_argument("-o", "--output_dir", required=True)
    p.add_argument("-id", "--spk_id", type=int, default=1)
    p.add_argument("-k", "--key", type=float, default=0.0)
    p.add_argument("-th", "--threhold", type=float, default=-60.0)
    p.add_argument("-pe", "--pitch_extractor", default="yin")
    p.add_argument("-kstep", "--k_step", type=int, default=None)
    p.add_argument("-method", "--method", default=None)
    p.add_argument("-step", "--infer_step", type=int, default=None)
    cmd = p.parse_args(argv)

    from .common import enable_compile_cache

    enable_compile_cache()

    pipeline = SvcPipeline(cmd.model_path, pitch_extractor=cmd.pitch_extractor)
    kwargs = {}
    if cmd.k_step:
        kwargs["k_step"] = cmd.k_step
    if cmd.method:
        kwargs["method"] = cmd.method
    if cmd.infer_step:
        kwargs["infer_step"] = cmd.infer_step

    files = traverse_dir(cmd.input_dir, extensions=["wav"], is_pure=True, is_sort=True)
    print(f"{len(files)} files")
    for rel in files:
        audio, sr = load_wav(os.path.join(cmd.input_dir, rel))
        out, out_sr = pipeline.infer(
            audio.astype(np.float32), sr, spk_id=cmd.spk_id, key_shift=cmd.key,
            threhold=cmd.threhold, **kwargs,
        )
        dst = os.path.join(cmd.output_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        save_wav(dst, out, out_sr)
        print(f"  {rel} -> {dst}")


if __name__ == "__main__":
    main()
