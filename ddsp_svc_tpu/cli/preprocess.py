"""Preprocess CLI: python -m ddsp_svc_tpu.cli.preprocess -c configs/combsub.yaml

Reference contract: preprocess.py __main__ (:143-197) — runs the feature
job over train_path then valid_path.
"""
from __future__ import annotations

import argparse

from ..data.preprocess import preprocess
from ..features.volume import VolumeExtractor
from ..utils.config import load_config
from .common import build_f0_extractor, build_mel_extractor, build_units_encoder, needs_mel


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--resume", action="store_true",
                        help="skip files whose outputs already exist "
                             "(beyond-reference: the reference always "
                             "reprocesses the whole corpus)")
    cmd = parser.parse_args(argv)

    from .common import enable_compile_cache

    enable_compile_cache()
    args = load_config(cmd.config)

    f0_extractor = build_f0_extractor(args)
    volume_extractor = VolumeExtractor(args.data.block_size)
    mel_extractor = build_mel_extractor(args) if needs_mel(args) else None
    units_encoder = build_units_encoder(args)

    for path in (args.data.train_path, args.data.valid_path):
        preprocess(
            path,
            f0_extractor,
            volume_extractor,
            mel_extractor,
            units_encoder,
            sample_rate=args.data.sampling_rate,
            hop_size=args.data.block_size,
            use_pitch_aug=bool(args.model.use_pitch_aug),
            extensions=tuple(args.data.extensions or ["wav"]),
            skip_existing=cmd.resume,
        )


if __name__ == "__main__":
    main()
