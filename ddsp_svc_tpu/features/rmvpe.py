"""RMVPE pitch estimator — JAX/flax port (the reference's default extractor).

Architecture parity with encoder/rmvpe/ (E2E0(4, 1, (2,2))):
  - log-mel front-end: 128 HTK mels, 16 kHz, win 1024, hop 160, fmin 30,
    fmax 8000, torch.stft center=True (spec.py:6-66, constants.py:1-9)
  - DeepUnet0: 5-encoder/4-intermediate/5-decoder U-Net of ConvBlockRes
    (conv3x3-BN-ReLU x2 + 1x1 shortcut), AvgPool(2,2) between encoder
    stages, ConvTranspose(2,2) decoders with skip concat (deepunet.py)
  - head: Conv 16->3, flatten freq, 1-layer BiGRU(384->256x2),
    Linear(512->360), sigmoid (model.py:36-60)
  - frames padded to a multiple of 32 before the net (inference.py:21-26)
  - decoding: local weighted average over +-4 bins of the argmax in cents,
    f0 = 10 * 2^(cents/1200), unvoiced when max salience < threshold
    (utils.py:106-121)

TPU design: NHWC layout (freq as W), BatchNorm folded to inference affine
(use_running_average), BiGRU as two lax.scan passes. Weights are converted
from the published torch checkpoint by convert/rmvpe.py; an uninitialized
net still runs (for shape/jit tests).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.nn import ConvTranspose2d
from ..ops.mel import mel_filterbank
from ..ops.resample import resample
from ..ops.spectral import stft
from ..ops.window import hann_window

SAMPLE_RATE = 16000
N_CLASS = 360
N_MELS = 128
MEL_FMIN = 30
MEL_FMAX = 8000
WINDOW_LENGTH = 1024
CONST = 1997.3794084376191


class ConvBlockRes(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        y = nn.Conv(self.out_channels, (3, 3), use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, momentum=0.99, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (3, 3), use_bias=False, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=True, momentum=0.99, name="bn2")(y)
        y = nn.relu(y)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="shortcut")(x)
        return y + x


class ResEncoderBlock(nn.Module):
    out_channels: int
    n_blocks: int = 1
    pool: bool = True

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_blocks):
            x = ConvBlockRes(self.out_channels, name=f"block{i}")(x)
        if self.pool:
            pooled = nn.avg_pool(x, (2, 2), strides=(2, 2))
            return x, pooled
        return x


class ResDecoderBlock(nn.Module):
    out_channels: int
    n_blocks: int = 1

    @nn.compact
    def __call__(self, x, skip):
        # torch ConvTranspose2d(k3, s2, p1, output_padding=1): exactly 2x
        # spatial size, torch padding semantics (deepunet.py:63-75)
        x = ConvTranspose2d(
            self.out_channels, (3, 3), stride=(2, 2), padding=(1, 1),
            output_padding=(1, 1), use_bias=False, name="deconv",
        )(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.99, name="bn1")(x)
        x = nn.relu(x)
        x = jnp.concatenate([x, skip], axis=-1)
        for i in range(self.n_blocks):
            x = ConvBlockRes(self.out_channels, name=f"block{i}")(x)
        return x


class DeepUnet0(nn.Module):
    """5-enc/4-inter/5-dec U-Net (deepunet.py:161-208, DeepUnet0 variant —
    TimbreFilter unused in forward)."""

    n_blocks: int = 4
    en_de_layers: int = 5
    inter_layers: int = 4
    en_out_channels: int = 16

    @nn.compact
    def __call__(self, x):  # (B, T, 128, 1)
        x = nn.BatchNorm(use_running_average=True, momentum=0.99, name="in_bn")(x)
        skips = []
        ch = self.en_out_channels
        for i in range(self.en_de_layers):
            skip, x = ResEncoderBlock(ch, self.n_blocks, name=f"enc{i}")(x)
            skips.append(skip)
            ch *= 2
        inter_ch = ch
        for i in range(self.inter_layers):
            x = ResEncoderBlock(inter_ch, self.n_blocks, pool=False, name=f"inter{i}")(x)
        for i in range(self.en_de_layers):
            ch = inter_ch // (2 ** (i + 1))
            x = ResDecoderBlock(ch, self.n_blocks, name=f"dec{i}")(x, skips[-1 - i])
        return x


class BiGRU(nn.Module):
    hidden: int = 256

    @nn.compact
    def __call__(self, x):  # (B, T, F)
        cell = nn.GRUCell(features=self.hidden, name="fw")
        cell_bw = nn.GRUCell(features=self.hidden, name="bw")
        b = x.shape[0]

        def run(cell_mod, seq):
            carry = jnp.zeros((b, self.hidden), seq.dtype)

            def step(c, xt):
                c, y = cell_mod(c, xt)
                return c, y

            _, ys = nn.scan(
                lambda m, c, xt: m(c, xt),
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=1,
                out_axes=1,
            )(cell_mod, carry, seq)
            return ys

        fw = run(cell, x)
        bw = run(cell_bw, x[:, ::-1, :])[:, ::-1, :]
        return jnp.concatenate([fw, bw], axis=-1)


class E2E0(nn.Module):
    """mel (B, T, 128) -> salience (B, T, 360) (model.py:36-60)."""

    n_blocks: int = 4
    n_gru: int = 1

    @nn.compact
    def __call__(self, mel):
        x = mel[..., None]  # (B, T, 128, 1)
        x = DeepUnet0(n_blocks=self.n_blocks, name="unet")(x)
        x = nn.Conv(3, (3, 3), name="cnn")(x)  # (B, T, 128, 3)
        b, t = x.shape[0], x.shape[1]
        # torch flattens (3, 128) channel-major: (B,T,3,128) -> 384
        x = x.transpose(0, 1, 3, 2).reshape(b, t, 3 * N_MELS)
        if self.n_gru:
            x = BiGRU(256, name="gru")(x)
        x = nn.Dense(N_CLASS, name="fc")(x)
        return nn.sigmoid(x)


def to_local_average_f0(
    hidden: np.ndarray, thred: float = 0.03, center: np.ndarray | None = None
) -> np.ndarray:
    """(T, 360) salience -> (T,) f0 Hz (utils.py:106-121).

    ``center``: optional (T,) decoded bin indices (the viterbi path); defaults
    to the per-frame argmax."""
    idx = np.arange(N_CLASS)[None, :]
    idx_cents = idx * 20 + CONST
    if center is None:
        center = hidden.argmax(axis=1, keepdims=True)
    else:
        center = np.asarray(center, np.int64).reshape(-1, 1)
    start = np.clip(center - 4, 0, None)
    end = np.clip(center + 5, None, N_CLASS)
    mask = (idx >= start) & (idx < end)
    weights = hidden * mask
    product_sum = (weights * idx_cents).sum(axis=1)
    weight_sum = weights.sum(axis=1)
    cents = product_sum / (weight_sum + (weight_sum == 0))
    f0 = 10.0 * 2.0 ** (cents / 1200.0)
    f0[hidden.max(axis=1) < thred] = 0.0
    return f0.astype(np.float32)


_VITERBI_TRANSITION: np.ndarray | None = None


def _viterbi_transition() -> np.ndarray:
    """Row-normalized triangular pitch-step prior (utils.py:88-95,123-130):
    p(j | i) ∝ max(30 - |i - j|, 0)."""
    global _VITERBI_TRANSITION
    if _VITERBI_TRANSITION is None:
        d = np.abs(np.arange(N_CLASS)[:, None] - np.arange(N_CLASS)[None, :])
        t = np.maximum(30 - d, 0).astype(np.float64)
        _VITERBI_TRANSITION = t / t.sum(axis=1, keepdims=True)
    return _VITERBI_TRANSITION


def viterbi_path(prob: np.ndarray, transition: np.ndarray) -> np.ndarray:
    """Max-likelihood state path; librosa.sequence.viterbi semantics.

    prob: (n_states, T) observation probabilities (columns need not be
    normalized — only argmaxes matter); transition: (n_states, n_states)
    row-stochastic; uniform initial distribution. Returns (T,) int64."""
    tiny = np.finfo(np.float64).tiny
    log_trans = np.log(transition + tiny)  # (N, N)
    log_prob = np.log(prob.T + tiny)  # (T, N)
    n_states, t_len = prob.shape
    value = np.empty((t_len, n_states))
    ptr = np.empty((t_len, n_states), dtype=np.int64)
    value[0] = log_prob[0] - np.log(n_states)
    for t in range(1, t_len):
        trans_out = value[t - 1][:, None] + log_trans  # (from, to)
        ptr[t] = np.argmax(trans_out, axis=0)
        value[t] = log_prob[t] + trans_out[ptr[t], np.arange(n_states)]
    path = np.empty(t_len, dtype=np.int64)
    path[-1] = np.argmax(value[-1])
    for t in range(t_len - 2, -1, -1):
        path[t] = ptr[t + 1][path[t + 1]]
    return path


def to_viterbi_f0(hidden: np.ndarray, thred: float = 0.03) -> np.ndarray:
    """(T, 360) salience -> (T,) f0 Hz via viterbi-smoothed bin path
    (encoder/rmvpe/utils.py:123-140)."""
    prob = hidden.T.astype(np.float64)
    prob = prob / prob.sum(axis=0)
    path = viterbi_path(prob, _viterbi_transition())
    return to_local_average_f0(hidden, thred=thred, center=path)


class RMVPE:
    """Inference wrapper (encoder/rmvpe/inference.py:10-51 contract)."""

    def __init__(self, params=None, hop_length: int = 160):
        self.model = E2E0()
        self.hop_length = hop_length
        self.mel_basis = jnp.asarray(
            mel_filterbank(SAMPLE_RATE, WINDOW_LENGTH, N_MELS, MEL_FMIN, MEL_FMAX,
                           htk=True)
        )
        self.window = jnp.asarray(hann_window(WINDOW_LENGTH))
        if params is None:
            # shape-only init (tests / before weights are converted)
            mel = jnp.zeros((1, 32, N_MELS))
            params = self.model.init(jax.random.PRNGKey(0), mel)
        self.variables = params
        self._apply = jax.jit(
            lambda v, mel: self.model.apply(v, mel)
        )

    def mel_from_audio16k(self, audio16k: jnp.ndarray) -> jnp.ndarray:
        """(B, L) 16 kHz audio -> log-mel (B, T, 128), center=True."""
        spec = stft(
            audio16k, WINDOW_LENGTH, self.hop_length, window=self.window,
            center=True, pad_mode="reflect",
        )
        mag = jnp.abs(spec)  # (B, F, T)
        mel = jnp.matmul(self.mel_basis, mag)
        return jnp.log(jnp.clip(mel, min=1e-5)).transpose(0, 2, 1)

    def infer_from_audio(
        self, audio: np.ndarray, sample_rate: int = 16000, thred: float = 0.03,
        use_viterbi: bool = False,
    ) -> np.ndarray:
        audio = jnp.asarray(audio, jnp.float32)[None, :]
        if sample_rate != SAMPLE_RATE:
            audio = resample(audio, sample_rate, SAMPLE_RATE)
        mel = self.mel_from_audio16k(audio)
        n_frames = mel.shape[1]
        pad_to = 32 * ((n_frames - 1) // 32 + 1)
        mel = jnp.pad(mel, ((0, 0), (0, pad_to - n_frames), (0, 0)))
        hidden = self._apply(self.variables, mel)[0, :n_frames]
        decode = to_viterbi_f0 if use_viterbi else to_local_average_f0
        return decode(np.asarray(hidden), thred=thred)
