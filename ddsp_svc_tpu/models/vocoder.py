"""Vocoder wrapper (NSF-HiFiGAN) and the legacy output Enhancer.

Reference parity:
  - Vocoder: diffusion/vocoder.py:80-168 — ``extract(audio) -> mel`` with
    cached resampling, ``infer(mel, f0) -> audio``; NsfHifiGANLog10 variant
    scales mel by log10(e) (:160-168).
  - Enhancer: enhancer.py:8-115 — NSF-HiFiGAN re-synthesis of DDSP output
    with ``adaptive_key`` sample-rate shifting to extend vocal range,
    f0 re-interpolation onto the enhancer hop grid, silence_front skipping.

Weights come from convert/nsf_hifigan.py (torch ckpt -> msgpack); without
weights the wrapper still runs with random init for shape/pipeline tests.
"""
from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.interp import upsample
from ..ops.mel import LogMelSpectrogram
from ..ops.resample import resample
from .nsf_hifigan import Generator

DEFAULT_NSF_CONFIG = dict(
    sampling_rate=44100,
    num_mels=128,
    n_fft=2048,
    win_size=2048,
    hop_size=512,
    fmin=40,
    fmax=16000,
    upsample_rates=(8, 8, 2, 2, 2),
    upsample_kernel_sizes=(16, 16, 4, 4, 4),
    upsample_initial_channel=512,
    resblock="1",
    resblock_kernel_sizes=(3, 7, 11),
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
)


def load_vocoder_params(ckpt_path: str | None):
    """Converted flax params + config for an NSF-HiFiGAN checkpoint dir/file."""
    if not ckpt_path:
        return None, dict(DEFAULT_NSF_CONFIG)
    path = ckpt_path if ckpt_path.endswith(".msgpack") else ckpt_path + ".msgpack"
    if os.path.exists(path):
        from flax import serialization

        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        config = dict(DEFAULT_NSF_CONFIG)
        config.update(payload.get("config", {}))
        return payload["params"], config
    print(f" [!] vocoder checkpoint {path!r} not found — random init")
    return None, dict(DEFAULT_NSF_CONFIG)


class Vocoder:
    """type: 'nsf-hifigan' | 'nsf-hifigan-log10' (diffusion/vocoder.py:80-96)."""

    def __init__(self, vocoder_type: str = "nsf-hifigan", ckpt: str | None = None,
                 dtype=None, use_pallas_resblock: bool | str = "auto"):
        """``dtype=jnp.bfloat16`` runs the generator with bf16 activations
        (params stay f32): measured +27% RTF at 49.9 dB SNR vs f32 on
        TPU v5e (PERF.md / TPU_CHECKS.json nsf_bf16_quality).

        ``use_pallas_resblock='auto'`` enables the fused Pallas resblock
        stages (ops/pallas_resblock: 2.5x generator RTF, PERF.md round 3)
        whenever the default backend is a TPU; inference params are
        identical either way and equivalence is hardware-checked
        (TPU_CHECKS.json nsf_fused_resblock). CPU backends keep the stock
        XLA path (Pallas compiles for TPU only). Set
        DDSP_SVC_TPU_NO_FUSED_VOCODER=1 to force it off."""
        if vocoder_type not in ("nsf-hifigan", "nsf-hifigan-log10"):
            raise ValueError(f" [x] Unknown vocoder: {vocoder_type}")
        self.type = vocoder_type
        self._dtype = dtype
        if use_pallas_resblock == "auto":
            import os

            use_pallas_resblock = (
                jax.default_backend() == "tpu"
                and not os.environ.get("DDSP_SVC_TPU_NO_FUSED_VOCODER")
            )
        params, cfg = load_vocoder_params(ckpt)
        self.config = cfg
        self.vocoder_sample_rate = cfg["sampling_rate"]
        self.vocoder_hop_size = cfg["hop_size"]
        self.dimension = cfg["num_mels"]
        self.mel = LogMelSpectrogram(
            sr=cfg["sampling_rate"],
            n_mels=cfg["num_mels"],
            n_fft=cfg["n_fft"],
            win_size=cfg["win_size"],
            hop_length=cfg["hop_size"],
            fmin=cfg["fmin"],
            fmax=cfg["fmax"],
        )
        self.model = Generator(
            sampling_rate=cfg["sampling_rate"],
            num_mels=cfg["num_mels"],
            upsample_rates=tuple(cfg["upsample_rates"]),
            upsample_kernel_sizes=tuple(cfg["upsample_kernel_sizes"]),
            upsample_initial_channel=cfg["upsample_initial_channel"],
            resblock=str(cfg["resblock"]),
            resblock_kernel_sizes=tuple(cfg["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in cfg["resblock_dilation_sizes"]
            ),
            dtype=self._dtype,
            use_pallas_resblock=bool(use_pallas_resblock),
        )
        if params is None:
            mel0 = jnp.zeros((1, 8, self.dimension), jnp.float32)
            f00 = 220.0 * jnp.ones((1, 8), jnp.float32)
            params = jax.jit(lambda: self.model.init(
                {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                mel0, f00,
            )["params"])()
        self.params = params
        self._infer = jax.jit(
            lambda p, mel, f0, key: self.model.apply(
                {"params": p}, mel, f0, key=key
            )
        )

    def extract(self, audio: jnp.ndarray, sample_rate: int = 0, keyshift: float = 0):
        """audio (B, L) -> mel (B, T, M) (diffusion/vocoder.py:98-111)."""
        if sample_rate not in (0, self.vocoder_sample_rate):
            audio = resample(audio, sample_rate, self.vocoder_sample_rate)
        mel = self.mel.extract(audio, keyshift=keyshift)
        if self.type == "nsf-hifigan-log10":
            mel = 0.434294 * mel
        return mel

    def infer(self, mel: jnp.ndarray, f0: jnp.ndarray, key=None):
        """mel (B, T, M), f0 (B, T', 1) or (B, T') -> audio (B, T*hop).

        f0 is trimmed to the mel frame count like the reference
        (diffusion/vocoder.py:114 ``f0[:, :mel.size(1), 0]``) — callers
        commonly pass the full-track f0 with a segment mel."""
        if self.type == "nsf-hifigan-log10":
            mel = mel / 0.434294
        if f0.ndim == 3:
            f0 = f0[..., 0]
        f0 = f0[:, : mel.shape[1]]
        if key is None:
            key = jax.random.PRNGKey(0)
        return self._infer(self.params, mel, f0, key)


class Enhancer:
    """NSF-HiFiGAN output enhancer for the pure-DDSP models
    (enhancer.py:8-115)."""

    def __init__(self, enhancer_type: str = "nsf-hifigan", ckpt: str | None = None,
                 dtype=None):
        if enhancer_type not in ("nsf-hifigan", "nsf-hifigan-log10"):
            raise ValueError(f" [x] Unknown enhancer: {enhancer_type}")
        # dtype=bfloat16: bf16 generator activations (params f32) — the
        # same lever (and the same nsf_bf16_quality hardware gate) as the
        # mel-family Vocoder's vocoder_bf16
        self.vocoder = Vocoder(enhancer_type, ckpt, dtype=dtype)

    def enhance(
        self,
        audio: jnp.ndarray,  # (B, L)
        sample_rate: int,
        f0: jnp.ndarray,  # (B, T, 1) on the caller's hop grid
        hop_size: int,
        adaptive_key: float | str = 0,
        silence_front: float = 0,
    ):
        v = self.vocoder
        # leading-silence skip (enhancer.py:31-35)
        start_frame = int(silence_front * sample_rate / hop_size)
        real_silence_front = start_frame * hop_size / sample_rate
        audio = audio[:, int(np.round(real_silence_front * sample_rate)) :]
        f0 = f0[:, start_frame:, :]

        # adaptive key (enhancer.py:37-47): the ddsp output is UPSAMPLED to
        # adaptive_sr = enh_sr * 2^(key/12); played back at the vocoder's
        # nominal rate that stream is slowed, so its apparent f0 is scaled
        # DOWN by real_factor — bringing high pitches into the pretrained
        # vocoder's range. The output resample restores duration and pitch.
        if adaptive_key == "auto":
            adaptive_key = 12 * np.log2(float(jnp.max(f0)) / 760.0)
            adaptive_key = max(0.0, float(np.ceil(adaptive_key)))
        adaptive_key = float(adaptive_key)
        adaptive_factor = 2 ** (-adaptive_key / 12.0)
        adaptive_sr = 100 * int(
            np.round(v.vocoder_sample_rate / adaptive_factor / 100)
        )
        real_factor = v.vocoder_sample_rate / adaptive_sr

        if sample_rate != adaptive_sr:
            audio_res = resample(audio, sample_rate, adaptive_sr)
        else:
            audio_res = audio
        n_frames = int(audio_res.shape[-1] // v.vocoder_hop_size + 1)
        mel = v.extract(audio_res)

        # f0 onto the enhancer hop grid (enhancer.py:60-69): scale by
        # real_factor, stretch source times by 1/real_factor, edge fill
        if (hop_size == v.vocoder_hop_size
                and sample_rate == v.vocoder_sample_rate
                and sample_rate == adaptive_sr):
            f0_grid = np.asarray(f0)[:, :, 0]
        else:
            f0_np = np.asarray(f0)[:, :, 0] * real_factor
            src_t = (hop_size / sample_rate) * np.arange(
                f0_np.shape[1]
            ) / real_factor
            tgt_t = (v.vocoder_hop_size / v.vocoder_sample_rate) * np.arange(
                n_frames
            )
            f0_grid = np.stack(
                [np.interp(tgt_t, src_t, row, left=row[0], right=row[-1])
                 for row in f0_np],
                axis=0,
            )
        enhanced = v.infer(mel, jnp.asarray(f0_grid, jnp.float32))

        # restore duration/pitch + re-pad the silent prefix at the OUTPUT
        # rate (enhancer.py:74-83; the reference returns enhancer_sample_rate)
        out_sr = v.vocoder_sample_rate
        if adaptive_sr != out_sr:
            enhanced = resample(enhanced, adaptive_sr, out_sr)
        if start_frame > 0:
            pad = int(np.round(out_sr * real_silence_front))
            enhanced = jnp.pad(enhanced, ((0, 0), (pad, 0)))
        return enhanced, out_sr
