"""Polyphase windowed-sinc resampling, torchaudio.transforms.Resample-compatible.

The reference resamples with torchaudio Resample(lowpass_filter_width=128)
everywhere audio crosses sample-rate domains (ddsp/vocoder.py:211-214,
diffusion/vocoder.py:104-107, enhancer.py:52-58). We reproduce the
'sinc_interp_hann' kernel exactly so unit alignment and mel parity hold.

The kernel is precomputed host-side per (orig_freq, new_freq) pair; the
resample itself is one grouped conv with stride = orig (polyphase), which
XLA maps onto the MXU.
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _sinc_resample_kernel(
    orig_freq: int, new_freq: int, lowpass_filter_width: int = 128, rolloff: float = 0.99
):
    """Build the torchaudio polyphase kernel. Returns (kernels, width, orig, new).

    kernels: (new, 1, kernel_len) float32 — one filter phase per output slot.
    """
    gcd = math.gcd(int(orig_freq), int(new_freq))
    orig = int(orig_freq) // gcd
    new = int(new_freq) // gcd

    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)

    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    t = (-np.arange(new, dtype=np.float64)[:, None] / new + idx) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t = t * np.pi
    kernels = np.where(t == 0.0, 1.0, np.sin(t) / np.where(t == 0.0, 1.0, t))
    kernels *= window * base_freq / orig
    return kernels.astype(np.float32)[:, None, :], width, orig, new


def resample(
    waveform: jnp.ndarray,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 128,
    rolloff: float = 0.99,
) -> jnp.ndarray:
    """Resample (B, L) audio from orig_freq to new_freq.

    Matches torchaudio's sinc_interp_hann output including edge handling and
    the ceil(new * L / orig) target length.
    """
    if orig_freq == new_freq:
        return waveform
    kernels, width, orig, new = _sinc_resample_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff
    )
    b, length = waveform.shape
    # Block-matmul polyphase (r4): the direct form is a stride-`orig`
    # conv with C_in=1 and a (2*width+orig)-tap kernel — a shape whose
    # lowering quality is backend-dependent (C_in=1 convs don't map to a
    # matmul directly). Output frame i reads the input window starting at
    # i*orig - width; the window spans at most ceil((2w+orig)/orig)+1
    # consecutive orig-sample blocks, so splitting the kernel at block
    # boundaries turns the whole op into that many dense
    # (frames, orig) @ (orig, new) matmuls — identical math (the kernel
    # is just zero-extended), guaranteed-MXU-shaped contraction. On the
    # tunneled v5e both forms measure at the RTT floor (~26 ms B=16x5s,
    # compute ≪ dispatch); the matmul form is kept for lowering
    # robustness, with parity pinned by the torchaudio tests.
    k_len = kernels.shape[-1]  # 2*width + orig
    # left-shift embedded in the kernel: pad the signal left by exactly
    # one block and move the (block - width % block) offset into K
    lead = (-width) % orig
    n_lead = (width + lead) // orig  # whole blocks of left padding
    k_pad = lead + k_len
    n_blocks_k = -(-k_pad // orig)
    kk = np.zeros((new, n_blocks_k * orig), np.float32)
    kk[:, lead:lead + k_len] = kernels[:, 0, :]
    # (n_blocks_k, orig, new): per consecutive input block, its matmul
    k_split = jnp.asarray(
        kk.reshape(new, n_blocks_k, orig).transpose(1, 2, 0))
    frames = length // orig + 1  # matches VALID conv frame count
    pad_r = (frames - 1 + n_blocks_k) * orig - (n_lead * orig + length)
    xp = jnp.pad(waveform, ((0, 0), (n_lead * orig, max(0, pad_r))))
    xb = xp.reshape(b, -1, orig)  # (B, nb, orig) non-overlapping blocks
    y = None
    for c in range(n_blocks_k):
        part = jnp.einsum(
            "bfo,on->bfn", jax.lax.slice_in_dim(xb, c, c + frames, axis=1),
            k_split[c])
        y = part if y is None else y + part
    y = y.reshape(b, -1)  # (B, frames*new) interleaved phases
    target_length = int(math.ceil(new * length / orig))
    return y[:, :target_length]
