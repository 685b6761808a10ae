"""HuBERT / ContentVec speech encoders in flax + the Units_Encoder wrapper.

One parameterized implementation covers the reference's 9 encoder variants
(ddsp/vocoder.py:228-464): HuBERT-Soft (bshall, encoder/hubert/model.py),
HuBERT-Base/Large and ContentVec{,768,768L12} (fairseq checkpoints):

  - 7-layer strided conv FeatureExtractor (10/5, 3/2 x4, 2/2 x2), GroupNorm
    on the first layer (encoder/hubert/model.py:96-116)
  - FeatureProjection 512 -> d_model (LN + Linear [+ dropout])
  - PositionalConvEmbedding k=128 g=16, weight-normed, GELU, drop last step
    (encoder/hubert/model.py:133-148)
  - N transformer layers, post-LN (base/soft) or pre-LN (large),
    early exit at ``output_layer`` (encoder/hubert/model.py:151-173)
  - optional final projection (768->256 soft / fairseq final_proj)

Units_Encoder.encode contract (ddsp/vocoder.py:202-226): resample input to
the encoder rate (cached polyphase kernels), pad to >= 400 samples, run the
net, then nearest-index align encoder frames onto the synth hop grid.
"""
from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resample import resample


CONV_SPECS = [(10, 5), (3, 2), (3, 2), (3, 2), (3, 2), (2, 2), (2, 2)]


def conv_out_frames(n_samples, upto: int = len(CONV_SPECS)):
    """Valid-conv frame count through the extractor stack (np or jnp ints)."""
    t = n_samples
    for k, s in CONV_SPECS[:upto]:
        t = (t - k) // s + 1
    return t


class _ChannelNorm(nn.Module):
    """Per-channel normalization over time == torch GroupNorm(C, C) on NCW
    (each group is one channel x ALL time steps — the statistics are
    time-GLOBAL, encoder/hubert/model.py:98).  ``valid_t`` restricts the
    statistics to each row's real frames so a zero-padded batch row
    reproduces the solo (unpadded) forward exactly.  Param tree matches
    flax nn.GroupNorm ({'scale','bias'}), so checkpoints are unchanged."""

    epsilon: float = 1e-5  # torch nn.GroupNorm default

    @nn.compact
    def __call__(self, x, valid_t=None):  # (B, T, C)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        if valid_t is None:
            mean = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.var(x, axis=1, keepdims=True)
        else:
            m = (jnp.arange(x.shape[1]) < valid_t[:, None])[..., None]
            cnt = jnp.maximum(valid_t, 1).astype(x.dtype)[:, None, None]
            mean = jnp.sum(jnp.where(m, x, 0.0), axis=1, keepdims=True) / cnt
            var = (
                jnp.sum(jnp.where(m, (x - mean) ** 2, 0.0), axis=1, keepdims=True)
                / cnt
            )
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


class FeatureExtractor(nn.Module):
    """7 strided 1-D convs, 16 kHz samples -> 50 Hz frames x 512.

    Two fairseq extractor modes (wav2vec2.py ConvFeatureExtractionModel):
      - default: bias-free convs, one GroupNorm(512) after conv0;
      - layer_norm (HuBERT-Large): biased convs, LayerNorm over channels
        after EVERY conv (TransposeLast + Fp32LayerNorm sandwich).

    ``valid_in`` (B,) — each row's real input length.  Convs are VALID (a
    frame never reads past its receptive field), so frames < the per-row
    valid count are already identical to a solo run on the unpadded row;
    only the time-global conv0 GroupNorm needs masked statistics.
    """

    layer_norm_mode: bool = False

    @nn.compact
    def __call__(self, x, valid_in=None):  # (B, L) -> (B, T, 512)
        x = x[..., None]  # NWC
        for i, (k, s) in enumerate(CONV_SPECS):
            x = nn.Conv(
                512, (k,), strides=(s,), padding="VALID",
                use_bias=self.layer_norm_mode,
                name=f"conv{i}",
            )(x)
            if self.layer_norm_mode:
                x = nn.LayerNorm(epsilon=1e-5, name=f"norm{i}")(x)
            elif i == 0:
                valid_t0 = (
                    None if valid_in is None else conv_out_frames(valid_in, 1)
                )
                x = _ChannelNorm(name="norm0")(x, valid_t0)
            x = nn.gelu(x, approximate=False)
        return x


class PositionalConvEmbedding(nn.Module):
    dim: int = 768

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        # k=128 grouped conv, torch padding=64 then drop the last output step
        y = nn.Conv(
            self.dim, (128,), padding=[(64, 64)], feature_group_count=16,
            name="conv",
        )(x)
        return nn.gelu(y[:, :-1, :], approximate=False)


class TransformerLayer(nn.Module):
    dim: int
    heads: int
    ffn_dim: int
    pre_norm: bool = False

    @nn.compact
    def __call__(self, x, deterministic=True, key_mask=None):
        """``key_mask`` (B, T) bool: keys a query may attend to.  Masked-out
        keys get exp(big_negative - max) == 0.0 exactly in f32, so a padded
        batch row's valid queries equal the solo (unpadded) forward."""
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, out_features=self.dim,
            name="attn",
        )
        mask = None if key_mask is None else key_mask[:, None, None, :]
        ln1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        ln2 = nn.LayerNorm(epsilon=1e-5, name="norm2")

        def ffn(h):
            h = nn.Dense(self.ffn_dim, name="fc1")(h)
            h = nn.gelu(h, approximate=False)
            return nn.Dense(self.dim, name="fc2")(h)

        if self.pre_norm:
            x = x + attn(ln1(x), mask=mask)
            x = x + ffn(ln2(x))
        else:
            x = ln1(x + attn(x, mask=mask))
            x = ln2(x + ffn(x))
        return x


@dataclass(frozen=True)
class HubertConfig:
    dim: int = 768
    heads: int = 12
    ffn_dim: int = 3072
    num_layers: int = 12
    output_layer: int | None = None  # early exit (1-based count of layers run)
    proj_dim: int | None = None  # final projection (256 for hubert-soft)
    pre_norm: bool = False  # True for hubert-large (layer_norm_first)
    extractor_layer_norm: bool = False  # HuBERT-Large conv extractor mode
    pad_center: bool = True  # hubert-soft pads (40, 40) before the convs
    input_normalize: bool = False  # HF Wav2Vec2FeatureExtractor zero-mean/unit-var
    topk_gate: int | None = None  # CNHubertSoftFish top-k gating (vocoder.py:358-362)


class HubertModel(nn.Module):
    config: HubertConfig = HubertConfig()

    @nn.compact
    def __call__(self, audio, deterministic=True, valid_samples=None):
        """audio (B, L) 16 kHz.  ``valid_samples`` (B,) int: each row's real
        (pre-padding) sample count — rows may then be zero-padded to a
        common L, and every output frame < the row's valid frame count is
        numerically identical to a solo forward of the unpadded row (the
        exactness contract batched serving relies on;
        tests/test_hubert_batched.py).  Three non-frame-local stages need
        masking: the input normalization, the time-global conv0 GroupNorm,
        the positional conv (solo sees zeros past the end — re-zeroed here),
        and self-attention (key mask)."""
        cfg = self.config
        if cfg.input_normalize:
            if valid_samples is None:
                mean = jnp.mean(audio, axis=-1, keepdims=True)
                var = jnp.var(audio, axis=-1, keepdims=True)
            else:
                m = jnp.arange(audio.shape[-1]) < valid_samples[:, None]
                cnt = jnp.maximum(valid_samples, 1).astype(audio.dtype)[:, None]
                mean = jnp.sum(jnp.where(m, audio, 0.0), -1, keepdims=True) / cnt
                var = (
                    jnp.sum(jnp.where(m, (audio - mean) ** 2, 0.0), -1,
                            keepdims=True) / cnt
                )
            audio = (audio - mean) / jnp.sqrt(var + 1e-7)
            if valid_samples is not None:
                # normalized batch padding is (0 - mean)/std != 0; solo has
                # NOTHING there (and pad_center's right pad must stay zero)
                audio = jnp.where(
                    jnp.arange(audio.shape[-1]) < valid_samples[:, None],
                    audio, 0.0,
                )
        valid_in = valid_samples
        if cfg.pad_center:
            audio = jnp.pad(audio, ((0, 0), (40, 40)))
            valid_in = None if valid_in is None else valid_in + 80
        x = FeatureExtractor(
            layer_norm_mode=cfg.extractor_layer_norm, name="feature_extractor"
        )(audio, valid_in=valid_in)
        frame_mask = None
        if valid_in is not None:
            valid_frames = conv_out_frames(valid_in)
            frame_mask = jnp.arange(x.shape[1]) < valid_frames[:, None]
        x = nn.LayerNorm(epsilon=1e-5, name="fp_norm")(x)
        x = nn.Dense(cfg.dim, name="fp_proj")(x)
        if frame_mask is not None:
            # solo's pos_conv sees zero padding past its last frame; the
            # padded batch must too (pad rows are conv outputs of zeros,
            # which are NOT zero after the biased convs + norms)
            x = jnp.where(frame_mask[..., None], x, 0.0)
        x = x + PositionalConvEmbedding(cfg.dim, name="pos_conv")(x)
        # fairseq wav2vec2 TransformerEncoder: encoder.layer_norm runs
        # BEFORE the layers only when not layer_norm_first; with
        # layer_norm_first (pre-norm layers) it runs AFTER the stack, and
        # only when no target layer is requested (extract_features skips it
        # for any explicit output_layer — the reference always passes one)
        if not cfg.pre_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        n = cfg.output_layer or cfg.num_layers
        for i in range(n):
            x = TransformerLayer(
                cfg.dim, cfg.heads, cfg.ffn_dim, cfg.pre_norm, name=f"layer{i}"
            )(x, deterministic=deterministic, key_mask=frame_mask)
        if cfg.pre_norm and cfg.output_layer is None:
            x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        if cfg.proj_dim:
            x = nn.Dense(cfg.proj_dim, name="proj")(x)
        if cfg.topk_gate:
            # keep only the top-k channels per frame, renormalize to sum 1
            # (CNHubertSoftFish gating, ddsp/vocoder.py:358-362)
            k = cfg.topk_gate
            thresh = jnp.sort(x, axis=-1)[..., -k : -k + 1] if k > 1 else jnp.max(
                x, axis=-1, keepdims=True
            )
            gated = jnp.where(x >= thresh, x, 0.0)
            x = gated / jnp.sum(gated, axis=-1, keepdims=True)
        return x


# the reference's encoder zoo (ddsp/vocoder.py:228-464 + SURVEY.md §2.2)
ENCODER_CONFIGS: dict[str, HubertConfig] = {
    "hubertsoft": HubertConfig(proj_dim=256),
    # fairseq-style encoders feed the raw waveform to extract_features with
    # no center pad (ddsp/vocoder.py:246-467) — only bshall HubertSoft.units
    # pads (400-320)//2 (encoder/hubert/model.py:78)
    "hubertbase": HubertConfig(output_layer=9, proj_dim=256,
                               pad_center=False),
    "hubertbase768": HubertConfig(output_layer=9, pad_center=False),
    "hubertbase768l12": HubertConfig(output_layer=12, pad_center=False),
    # large: layer_norm extractor + layer_norm_first encoder; the reference
    # wrapper (ddsp/vocoder.py:442-464) feeds raw audio — no waveform
    # normalization at inference
    "hubertlarge1024l24": HubertConfig(
        dim=1024, heads=16, ffn_dim=4096, num_layers=24, output_layer=24,
        pre_norm=True, extractor_layer_norm=True, pad_center=False,
    ),
    "contentvec": HubertConfig(output_layer=9, proj_dim=256,
                               pad_center=False),
    "contentvec768": HubertConfig(output_layer=9, pad_center=False),
    "contentvec768l12": HubertConfig(output_layer=12, pad_center=False),
    # chinese-hubert-base + Linear proj + top-k gate (ddsp/vocoder.py:330-364)
    "cnhubertsoftfish": HubertConfig(
        proj_dim=256, pad_center=False, input_normalize=True, topk_gate=10
    ),
    # dev/test-only miniature (NOT in the reference zoo): same I/O contract
    # as hubertsoft (256-wide units, 320-hop), 2 tiny layers — keeps the
    # smoke-tier CLI drives' compiles under a second each
    "tiny": HubertConfig(dim=64, heads=2, ffn_dim=128, num_layers=2,
                         proj_dim=256),
}


class UnitsEncoder:
    """Reference Units_Encoder (ddsp/vocoder.py:160-226)."""

    def __init__(
        self,
        encoder: str,
        params=None,
        encoder_sample_rate: int = 16000,
        encoder_hop_size: int = 320,
        cnhubertsoft_gate: int = 10,
    ):
        if encoder not in ENCODER_CONFIGS:
            raise ValueError(f" [x] Unknown units encoder: {encoder}")
        from dataclasses import replace

        cfg = ENCODER_CONFIGS[encoder]
        if cfg.topk_gate is not None:
            # gate <= 0 disables gating entirely (reference CNHubertSoftFish
            # 'if self.gate_size > 0', ddsp/vocoder.py:358-362)
            cfg = replace(
                cfg,
                topk_gate=(cnhubertsoft_gate
                           if cnhubertsoft_gate and cnhubertsoft_gate > 0
                           else None),
            )
        self.model = HubertModel(cfg)
        self.encoder_sample_rate = encoder_sample_rate
        self.encoder_hop_size = encoder_hop_size
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 800), jnp.float32)
            )
        self.variables = params
        self._apply = jax.jit(lambda v, a: self.model.apply(v, a))

    def make_encode_fn(self, sample_rate: int, hop_size: int, audio_len: int):
        """Pure jittable twin of ``encode`` for a fixed audio length:
        ``fn(variables, audio (B, audio_len)) -> units (B, n_frames, C)``.

        Lets callers fuse the encoder into a larger jitted graph — the
        realtime block path dispatches encoder + synth + vocoder as ONE
        device call per block (each separate dispatch's tunnel RTT lands in
        the block-latency tail, PERF.md)."""
        n_frames = audio_len // hop_size + 1
        ratio = (hop_size / sample_rate) / (
            self.encoder_hop_size / self.encoder_sample_rate
        )
        model = self.model
        enc_sr = self.encoder_sample_rate

        def fn(variables, audio):
            if sample_rate == enc_sr:
                audio_res = audio
            else:
                audio_res = resample(audio, sample_rate, enc_sr)
            if audio_res.shape[-1] < 400:
                audio_res = jnp.pad(
                    audio_res, ((0, 0), (0, 400 - audio_res.shape[-1]))
                )
            units = model.apply(variables, audio_res)
            index = np.clip(
                np.round(ratio * np.arange(n_frames)).astype(np.int64),
                0, units.shape[1] - 1,
            )
            return jnp.take(units, jnp.asarray(index), axis=1)

        return fn

    def valid_frames(self, n_samples: int, sample_rate: int) -> int:
        """Encoder frames a solo ``encode()`` of ``n_samples`` produces —
        also the count of exact rows in a masked batched forward."""
        n = n_samples
        if sample_rate != self.encoder_sample_rate:
            n = -((-n * self.encoder_sample_rate) // sample_rate)  # ceil
        n = max(n, 400)
        if self.model.config.pad_center:
            n += 80
        return int(conv_out_frames(n))

    def align_index(
        self, n_samples: int, sample_rate: int, hop_size: int
    ) -> np.ndarray:
        """encode()'s nearest-index alignment onto the synth hop grid
        (ddsp/vocoder.py:221-226), clipped to this request's OWN valid
        frame count — what a padded batch row must gather with."""
        n_frames = n_samples // hop_size + 1
        ratio = (hop_size / sample_rate) / (
            self.encoder_hop_size / self.encoder_sample_rate
        )
        return np.clip(
            np.round(ratio * np.arange(n_frames)).astype(np.int64),
            0, self.valid_frames(n_samples, sample_rate) - 1,
        )

    def make_batched_encode_fn(self, sample_rate: int, audio_len: int):
        """Jittable batched twin of ``encode`` for zero-padded rows:
        ``fn(variables, audio (B, audio_len), valid_samples (B,)) ->
        units (B, T, C)`` on the ENCODER grid, where each row's first
        ``valid_frames(valid_samples[i], sample_rate)`` frames are
        numerically identical to a solo encode of the unpadded row
        (masked statistics + attention key mask; the serving encoder
        batcher's exactness contract).  Align per request with
        ``align_index``."""
        model = self.model
        enc_sr = self.encoder_sample_rate

        def fn(variables, audio, valid_samples):
            if sample_rate != enc_sr:
                audio = resample(audio, sample_rate, enc_sr)
                # ceil — matches resample()'s own target-length truncation
                valid = -((-valid_samples * enc_sr) // sample_rate)
                # solo truncates at ceil(valid*enc/sr); the padded row has
                # sinc leakage past it, which pad_center's right zeros (and
                # any frame whose receptive field straddles the boundary)
                # must not see — re-zero the invalid tail
                audio = jnp.where(
                    jnp.arange(audio.shape[-1]) < valid[:, None], audio, 0.0
                )
            else:
                valid = valid_samples
            if audio.shape[-1] < 400:
                audio = jnp.pad(audio, ((0, 0), (0, 400 - audio.shape[-1])))
            valid = jnp.maximum(valid, 400)
            return model.apply(variables, audio, valid_samples=valid)

        return fn

    def encode(
        self, audio: jnp.ndarray, sample_rate: int, hop_size: int
    ) -> jnp.ndarray:
        """audio (B, L) at sample_rate -> units (B, n_frames, C) on the synth
        hop grid (nearest-index alignment, ddsp/vocoder.py:221-226)."""
        if sample_rate == self.encoder_sample_rate:
            audio_res = audio
        else:
            audio_res = resample(audio, sample_rate, self.encoder_sample_rate)
        if audio_res.shape[-1] < 400:
            audio_res = jnp.pad(audio_res, ((0, 0), (0, 400 - audio_res.shape[-1])))
        units = self._apply(self.variables, audio_res)

        n_frames = audio.shape[-1] // hop_size + 1
        ratio = (hop_size / sample_rate) / (
            self.encoder_hop_size / self.encoder_sample_rate
        )
        index = np.clip(
            np.round(ratio * np.arange(n_frames)).astype(np.int64),
            0,
            units.shape[1] - 1,
        )
        return jnp.take(units, jnp.asarray(index), axis=1)
