"""Frame-level RMS volume extraction.

Parity with the reference Volume_Extractor (ddsp/vocoder.py:147-157):
n_frames = len(audio)//hop + 1; audio^2 reflect-padded by hop//2 each side;
per-hop-block mean; sqrt. Vectorized instead of the reference's per-frame
Python loop.
"""
from __future__ import annotations

import numpy as np


class VolumeExtractor:
    def __init__(self, hop_size: int = 512):
        self.hop_size = hop_size

    def extract(self, audio: np.ndarray) -> np.ndarray:
        """audio: 1-D float array -> (n_frames,) RMS volume."""
        hop = self.hop_size
        n_frames = int(len(audio) // hop) + 1
        audio2 = np.pad(audio.astype(np.float64) ** 2, (hop // 2, (hop + 1) // 2),
                        mode="reflect")
        blocks = audio2[: n_frames * hop].reshape(n_frames, hop)
        return np.sqrt(blocks.mean(axis=1)).astype(np.float32)

    def get_mask(
        self, volume: np.ndarray, threshold: float, win: int = 9
    ) -> np.ndarray:
        """Frame-level volume gate, main.py:210-214 semantics: threshold,
        EDGE-pad win//2 each side (constant_values=(mask[0], mask[-1])),
        max-dilate over `win` frames. The single implementation of this
        rule — sample-level upsampling is the caller's (host/device)
        choice; ``get_mask_jnp`` below is its jittable twin for fused
        serving graphs."""
        mask = (volume > 10 ** (threshold / 20.0)).astype(np.float32)
        pad = win // 2
        mp = np.pad(mask, (pad, pad), constant_values=(mask[0], mask[-1]))
        windows = np.lib.stride_tricks.sliding_window_view(mp, win)
        return windows.max(axis=-1)


def get_mask_jnp(volume, gate: float, win: int = 9):
    """Jittable twin of VolumeExtractor.get_mask for batched rows:
    ``volume`` (B, T), ``gate`` the already-exponentiated linear
    threshold (10^(dB/20)). Same rule: gate, edge-pad win//2, max-dilate
    over win frames — keep the two implementations in lockstep."""
    import jax
    import jax.numpy as jnp

    pad = win // 2
    m = (volume > gate).astype(jnp.float32)
    m = jnp.pad(m, ((0, 0), (pad, pad)), mode="edge")
    return jax.lax.reduce_window(m, -jnp.inf, jax.lax.max, (1, win),
                                 (1, 1), "VALID")
