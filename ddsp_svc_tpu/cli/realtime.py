"""Realtime VC CLI (the gui.py replacement, audio-backend optional).

File mode (always available — drives the exact realtime block engine):
  python -m ddsp_svc_tpu.cli.realtime -m model.ckpt -i in.wav -o out.wav

Live mode (requires the optional sounddevice wheel):
  python -m ddsp_svc_tpu.cli.realtime -m model.ckpt --live
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("-i", "--input")
    p.add_argument("-o", "--output")
    p.add_argument("--live", action="store_true")
    p.add_argument("-id", "--spk_id", type=int, default=1)
    p.add_argument("-k", "--key", type=float, default=0.0)
    p.add_argument("-th", "--threhold", type=float, default=-45.0)
    p.add_argument("-pe", "--pitch_extractor", default="yin")
    p.add_argument("--block_time", type=float, default=0.3)
    p.add_argument("--crossfade_time", type=float, default=0.04)
    p.add_argument("--extra_time", type=float, default=2.0)
    p.add_argument("--phase_vocoder", action="store_true")
    p.add_argument("--diff_silence", action="store_true",
                   help="diffusion/reflow: run the cascade only on the "
                        "fresh (non-silence-front) frames — the reference "
                        "GUI's 'diff silence' checkbox (gui_diff.py:282); "
                        "faster blocks, slight boundary quality cost")
    p.add_argument("--voc_bf16", action="store_true",
                   help="bf16 vocoder activations (+26%% on the diffusion "
                        "chain, nsf_bf16_quality-gated)")
    p.add_argument("--device_f0", action="store_true",
                   help="fold the YIN f0 front-end into the block's single "
                        "jitted device call (yin extractor only): the host "
                        "does no pitch work per block — removes the host "
                        "YIN share of block latency")
    cmd = p.parse_args(argv)

    from .common import enable_compile_cache

    enable_compile_cache()

    from ..infer.pipeline import SvcPipeline
    from ..infer.realtime import RealtimeVC

    pipeline = SvcPipeline(cmd.model_path, pitch_extractor=cmd.pitch_extractor,
                           vocoder_bf16=cmd.voc_bf16,
                           device_f0=cmd.device_f0)
    sr = pipeline.args.data.sampling_rate
    vc = RealtimeVC(
        pipeline,
        sample_rate=sr,
        block_time=cmd.block_time,
        crossfade_time=cmd.crossfade_time,
        extra_time=cmd.extra_time,
        use_phase_vocoder=cmd.phase_vocoder,
        spk_id=cmd.spk_id,
        key_shift=cmd.key,
        threhold=cmd.threhold,
        use_silence=cmd.diff_silence,
    )

    if cmd.live:
        import sounddevice as sd  # optional dependency

        def callback(indata, outdata, frames, time_info, status):
            out = vc.process_block(indata[:, 0].astype(np.float32))
            outdata[:, 0] = out

        with sd.Stream(
            samplerate=sr, blocksize=vc.block_frame, channels=1, callback=callback
        ):
            print("realtime VC running — Ctrl-C to stop")
            import time

            while True:
                time.sleep(1)
    else:
        import time

        from ..features.audio import load_wav, save_wav
        from ..ops.resample import resample
        import jax.numpy as jnp

        audio, in_sr = load_wav(cmd.input)
        if in_sr != sr:
            audio = np.asarray(resample(jnp.asarray(audio)[None, :], in_sr, sr))[0]
        audio = audio.astype(np.float32)
        from ..infer.realtime import drive_blocks

        out, stats = drive_blocks(vc, audio)
        save_wav(cmd.output, out, sr)
        steady = stats["times_s"][2:] or stats["times_s"]
        print(
            f"Saved: {cmd.output} ({len(out) / sr:.2f}s, "
            f"{stats['blocks']} blocks; block {cmd.block_time * 1e3:.0f} ms, "
            f"infer mean {stats['block_ms']:.1f} ms, "
            f"max {np.max(steady) * 1e3:.1f} ms)"
        )


if __name__ == "__main__":
    main()
