"""Offline voice-conversion CLI — one driver for every model family.

python -m ddsp_svc_tpu.cli.infer -m exp/model_10000.ckpt -i in.wav -o out.wav \\
    [-k 0] [-id 1] [-mix "{1:0.5, 2:0.5}"] [-th -60] [-pe yin] \\
    [-kstep 100] [-method dpm-solver] [-speedup 10] [-step 20] [-ts 0.7] \\
    [-e true -eak 0]

Reference contracts unified here: main.py:140-281 (DDSP + enhancer),
main_diff.py (shallow-diffusion cascade + vocoder), main_reflow.py
(rectified flow): MD5-keyed f0 cache, key shift, volume mask with 9-frame
max-dilation, silence-split segmentation, zero-fill / linear cross-fade
splicing.
"""
from __future__ import annotations

import argparse
import hashlib
import os
from ast import literal_eval

import numpy as np

import jax
import jax.numpy as jnp

from ..features.audio import load_wav, save_wav
from ..features.f0 import F0Extractor
from ..features.slicer import split_audio
from ..features.volume import VolumeExtractor
from ..models.registry import load_model
from ..models.vocoder import Enhancer, Vocoder
from ..ops.interp import upsample
from ..train.solver import model_family
from .common import build_units_encoder


def cross_fade(a: np.ndarray, b: np.ndarray, idx: int) -> np.ndarray:
    """Linear cross-fade splice (main.py:140-148)."""
    result = np.zeros(idx + b.shape[0])
    fade_len = a.shape[0] - idx
    result[:idx] = a[:idx]
    k = np.linspace(0, 1.0, num=fade_len, endpoint=True)
    result[idx : a.shape[0]] = (1 - k) * a[idx:] + k * b[:fade_len]
    result[a.shape[0] :] = b[fade_len:]
    return result


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", required=True)
    # separately-trained DDSP model whose output mel seeds the diffusion
    # (main_diff.py -ddsp / diffusion/infer_gt_mel.py flow)
    p.add_argument("-ddsp", "--ddsp_model_path", default=None)
    p.add_argument("-id", "--spk_id", type=int, default=1)
    p.add_argument("-mix", "--spk_mix_dict", default="None")
    # diffusion-stage speaker id (main_diff.py:132-139); 'auto' = same as -id
    p.add_argument("-diffid", "--diff_spk_id", default="auto")
    p.add_argument("-k", "--key", type=float, default=0.0)
    p.add_argument("-e", "--enhance", default="true")
    p.add_argument("--voc_bf16", action="store_true",
                   help="run the NSF-HiFiGAN vocoder with bf16 activations "
                        "(+26%% measured on the full diffusion chain; "
                        "quality gated by TPU_CHECKS.json nsf_bf16_quality)")
    p.add_argument("-pe", "--pitch_extractor", default="yin")
    p.add_argument("-fmin", "--f0_min", type=float, default=50.0)
    p.add_argument("-fmax", "--f0_max", type=float, default=1100.0)
    p.add_argument("-th", "--threhold", type=float, default=-60.0)
    p.add_argument("-eak", "--enhancer_adaptive_key", default="0")
    # diffusion / reflow options
    p.add_argument("-fs", "--formant_shift_key", type=float, default=0.0)
    p.add_argument("-kstep", "--k_step", type=int, default=None)
    p.add_argument("-speedup", "--speedup", type=int, default=10)
    p.add_argument("-method", "--method", default=None)
    p.add_argument("-step", "--infer_step", type=int, default=None)
    p.add_argument("-ts", "--t_start", type=float, default=None)
    # sequence-parallel synthesis over N devices (time-sharded shard_map
    # engines, parallel/stream.py); DDSP families only
    p.add_argument("--stream", type=int, default=0, metavar="N_DEVICES")
    return p.parse_args(argv)


def main(argv=None):
    cmd = parse_args(argv)

    from .common import enable_compile_cache

    enable_compile_cache()
    model, variables, args = load_model(cmd.model_path)
    family = model_family(args.model.type)

    audio, sample_rate = load_wav(cmd.input)
    hop_size = int(args.data.block_size * sample_rate / args.data.sampling_rate)

    # f0 with MD5 cache (main.py:168-199)
    with open(cmd.input, "rb") as f:
        md5_hash = hashlib.md5(f.read()).hexdigest()
    cache_dir = os.path.join(os.path.dirname(cmd.output) or ".", "cache")
    cache_file = os.path.join(
        cache_dir,
        f"{cmd.pitch_extractor}_{hop_size}_{cmd.f0_min}_{cmd.f0_max}_{md5_hash}.npy",
    )
    if os.path.exists(cache_file):
        f0 = np.load(cache_file)
    else:
        extractor = F0Extractor(
            cmd.pitch_extractor, sample_rate, hop_size, cmd.f0_min, cmd.f0_max
        )
        f0 = extractor.extract(audio, uv_interp=True)
        os.makedirs(cache_dir, exist_ok=True)
        np.save(cache_file, f0)
    f0 = jnp.asarray(f0, jnp.float32)[None, :, None]
    f0 = f0 * 2 ** (cmd.key / 12.0)  # key change (main.py:204)

    # volume + mask (main.py:207-214)
    volume_extractor = VolumeExtractor(hop_size)
    volume = volume_extractor.extract(audio)
    mask = volume_extractor.get_mask(volume, cmd.threhold)
    mask = upsample(jnp.asarray(mask)[None, :, None], args.data.block_size)[..., 0]
    volume = jnp.asarray(volume, jnp.float32)[None, :, None]

    units_encoder = build_units_encoder(args)

    use_enhancer = family == "ddsp" and cmd.enhance == "true"
    if use_enhancer and args.enhancer:
        enhancer = Enhancer(args.enhancer.type, args.enhancer.ckpt)
    else:
        enhancer = None
    vocoder = None
    if family != "ddsp":
        vc = args.vocoder or {}
        vocoder = Vocoder(vc.get("type", "nsf-hifigan"), vc.get("ckpt"),
                          dtype=jnp.bfloat16 if cmd.voc_bf16 else None)
    ddsp_ext = None
    if cmd.ddsp_model_path:
        ddsp_model, ddsp_vars, ddsp_args = load_model(cmd.ddsp_model_path)
        # config compatibility (main_diff.py:17-27)
        for k in ("sampling_rate", "block_size", "encoder"):
            assert ddsp_args.data[k] == args.data[k], (
                f" [x] DDSP/diffusion config mismatch on data.{k}"
            )
        ddsp_ext = (ddsp_model, ddsp_vars)

    spk_mix_dict = literal_eval(cmd.spk_mix_dict)
    spk_id = jnp.array([[cmd.spk_id]], jnp.int32)
    diff_spk_id = (
        spk_id if cmd.diff_spk_id == "auto"
        else jnp.array([[int(cmd.diff_spk_id)]], jnp.int32)
    )  # main_diff.py:280-283

    segments = split_audio(audio, sample_rate)
    print(f"Cut the input audio into {len(segments)} slices")
    result = np.zeros(0)
    current_length = 0
    key = jax.random.PRNGKey(0)
    for start_sample, seg in segments:
        start_frame = start_sample // hop_size
        seg_input = jnp.asarray(seg, jnp.float32)[None, :]
        seg_units = units_encoder.encode(seg_input, sample_rate, hop_size)
        t_seg = seg_units.shape[1]
        seg_f0 = f0[:, start_frame : start_frame + t_seg]
        seg_volume = volume[:, start_frame : start_frame + t_seg]
        key, sub = jax.random.split(key)

        stage_spk = spk_id if family == "ddsp" else diff_spk_id
        common = dict(spk_id=stage_spk, spk_mix_dict=spk_mix_dict, infer=True)
        if family != "ddsp" and cmd.formant_shift_key:
            # formant change via the pitch-aug embedding (main_diff.py:356-371)
            common["aug_shift"] = jnp.full((1, 1, 1), cmd.formant_shift_key)
        if family == "ddsp":
            if cmd.stream > 1:
                from jax.sharding import Mesh

                from ..parallel.stream import FRAME_HALO, streamed_forward

                n_dev = cmd.stream
                pad_t = (-t_seg) % n_dev
                min_t = n_dev * (FRAME_HALO + 8)
                if t_seg + pad_t < min_t:
                    pad_t = min_t - t_seg  # short segment: pad up to halo min
                    pad_t += (-(t_seg + pad_t)) % n_dev
                # pad with edge replication (units; real neighboring frames
                # for f0/volume, which exist utterance-wide). The padded
                # tail is trimmed after synthesis; within the final
                # receptive-field window (~FRAME_HALO frames) the streamed
                # output may differ from the non-streamed segment, which
                # has its own conv edge there — the cross-fade splicing
                # hides segment seams exactly as the reference's does
                total_t = f0.shape[1]
                ext = min(pad_t, total_t - (start_frame + t_seg))
                syn = pad_t - ext
                e1 = start_frame + t_seg + ext
                seg_units_p = jnp.pad(
                    seg_units, ((0, 0), (0, pad_t), (0, 0)), mode="edge"
                )
                seg_f0_p = jnp.pad(
                    f0[:, start_frame:e1], ((0, 0), (0, syn), (0, 0)),
                    mode="edge",
                )
                seg_volume_p = jnp.pad(
                    volume[:, start_frame:e1], ((0, 0), (0, syn), (0, 0)),
                    mode="edge",
                )
                if spk_mix_dict is not None:
                    raise NotImplementedError(
                        "-mix is not supported with --stream: the streamed "
                        "engines take a single spk_id (drop --stream or "
                        "use -id)"
                    )
                mesh = Mesh(np.array(jax.devices()[:n_dev]), ("time",))
                seg_output = streamed_forward(
                    model, variables, seg_units_p, seg_f0_p, seg_volume_p,
                    sub, mesh=mesh, spk_id=spk_id,
                )[:, : t_seg * args.data.block_size]
            else:
                seg_output, _, _ = model.apply(
                    {"params": variables["params"]},
                    seg_units, seg_f0, seg_volume,
                    rngs={"noise": sub}, **common,
                )
            output_sample_rate = args.data.sampling_rate
        else:
            if family in ("diffusion", "unit2mel"):
                kwargs = dict(
                    infer_speedup=cmd.speedup,
                    sampler=cmd.method or args.infer.method or "dpm-solver",
                    # k_step_max clamps -kstep (main_diff.py:307-315)
                    k_step=min(
                        int(cmd.k_step or args.model.k_step_max or 1000),
                        int(args.model.k_step_max or 1000),
                    ),
                )
            else:
                t_start = float(args.model.t_start or 0.0)
                if cmd.t_start is not None:
                    t_start = max(cmd.t_start, t_start)  # main_reflow.py:282-290
                kwargs = dict(
                    infer_step=cmd.infer_step or args.infer.infer_step or 20,
                    sampler=cmd.method or args.infer.method or "euler",
                    t_start=t_start,
                )
            if family != "unit2mel":
                kwargs["mel_extract_fn"] = (
                    lambda wav: vocoder.extract(wav, args.data.sampling_rate)
                )
            if ddsp_ext is not None:
                # external DDSP -> mel seeds the (shallow) diffusion; the
                # formant shift moves DDSP f0 down and the mel keyshift up
                # (main_diff.py:356-359). Only the pure-diffusion model
                # consumes an external init mel; cascades embed their own DDSP.
                assert family == "unit2mel", (
                    " [x] -ddsp applies to 'Diffusion' (Unit2Mel) models; "
                    "cascades already contain a DDSP stage"
                )
                dm, dv = ddsp_ext
                seg_ddsp_f0 = 2 ** (-cmd.formant_shift_key / 12.0) * seg_f0
                ddsp_out, _, _ = dm.apply(
                    {"params": dv["params"]},
                    seg_units, seg_ddsp_f0, seg_volume,
                    spk_id=spk_id, spk_mix_dict=spk_mix_dict, infer=True,
                    rngs={"noise": sub},
                )
                kwargs["gt_spec"] = vocoder.extract(
                    ddsp_out, args.data.sampling_rate,
                    keyshift=cmd.formant_shift_key,
                )
            seg_mel = model.apply(
                {"params": variables["params"]},
                seg_units, seg_f0, seg_volume,
                key=sub, rngs={"noise": sub}, **common, **kwargs,
            )
            seg_output = vocoder.infer(seg_mel, seg_f0, key=sub)
            output_sample_rate = vocoder.vocoder_sample_rate

        seg_output = seg_output * mask[
            :, start_frame * args.data.block_size :
            start_frame * args.data.block_size + seg_output.shape[-1]
        ]
        if enhancer is not None:
            seg_output, output_sample_rate = enhancer.enhance(
                seg_output, args.data.sampling_rate, seg_f0,
                args.data.block_size,
                adaptive_key=(
                    cmd.enhancer_adaptive_key
                    if cmd.enhancer_adaptive_key == "auto"
                    else float(cmd.enhancer_adaptive_key)
                ),
            )
        seg_out_np = np.asarray(seg_output)[0]

        # splice (main.py:274-280)
        silent_length = (
            round(
                start_frame * args.data.block_size
                * output_sample_rate / args.data.sampling_rate
            )
            - current_length
        )
        if silent_length >= 0:
            result = np.append(result, np.zeros(silent_length))
            result = np.append(result, seg_out_np)
        else:
            result = cross_fade(result, seg_out_np, current_length + silent_length)
        current_length = current_length + silent_length + len(seg_out_np)
    save_wav(cmd.output, result.astype(np.float32), output_sample_rate)
    print(f"Saved: {cmd.output} ({len(result) / output_sample_rate:.2f}s)")


if __name__ == "__main__":
    main()
