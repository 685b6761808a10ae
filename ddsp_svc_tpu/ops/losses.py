"""Spectral training losses and mel quality metrics.

Reference behaviours matched:
  - SSSLoss (ddsp/loss.py:9-31): spectral-convergence + alpha * log-L1 on
    normalized magnitude STFTs (hop = n_fft, center=False).
  - RSSLoss (ddsp/loss.py:34-54): averages SSS at 4 random FFT sizes drawn
    from [fft_min, fft_max) each step.
  - mel SNR / SI-SNR / PSNR validation metrics (reflow/solver.py:12-48).

TPU note on RSS: a uniformly random n_fft is a dynamic shape, which XLA
cannot compile. We instead draw from a fixed log-spaced lattice of FFT sizes
covering the same range and dispatch with lax.switch — every lattice size
compiles exactly once inside the jitted train step, and each step still
executes only n_scale of them. The regularizing effect (loss surface
averaged over many resolutions across steps) is preserved.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .spectral import spectrogram


def sss_loss(
    x_true: jnp.ndarray,
    x_pred: jnp.ndarray,
    n_fft: int,
    alpha: float = 1.0,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Single-scale spectral loss (hop = n_fft, normalized magnitudes)."""
    s_true = spectrogram(x_true, n_fft, n_fft) + eps
    s_pred = spectrogram(x_pred, n_fft, n_fft) + eps
    converge = jnp.mean(
        jnp.linalg.norm(s_true - s_pred, axis=(1, 2))
        / jnp.linalg.norm(s_true + s_pred, axis=(1, 2))
    )
    log_term = jnp.mean(jnp.abs(jnp.log(s_true) - jnp.log(s_pred)))
    return converge + alpha * log_term


def _default_lattice(fft_min: int, fft_max: int, n_sizes: int = 16) -> tuple[int, ...]:
    sizes = np.unique(
        np.round(np.exp(np.linspace(np.log(fft_min), np.log(fft_max - 1), n_sizes)))
        .astype(int)
    )
    return tuple(int(s) for s in sizes)


class RSSLoss:
    """Random-scale spectral loss over a static FFT-size lattice.

    Each call draws ``n_scale`` sizes from the lattice (uniform, with
    replacement — the reference also samples with replacement) and averages
    their SSS losses. jit-safe: indices are traced, shapes are static.
    """

    def __init__(
        self,
        fft_min: int,
        fft_max: int,
        n_scale: int = 4,
        alpha: float = 1.0,
        eps: float = 1e-7,
        lattice: tuple[int, ...] | None = None,
    ):
        self.n_scale = n_scale
        self.alpha = alpha
        self.eps = eps
        self.sizes = lattice if lattice is not None else _default_lattice(fft_min, fft_max)

    def __call__(self, x_pred: jnp.ndarray, x_true: jnp.ndarray, key: jax.Array):
        idx = jax.random.randint(key, (self.n_scale,), 0, len(self.sizes))
        branches = [
            (lambda n_fft: (lambda xt, xp: sss_loss(xt, xp, n_fft, self.alpha, self.eps)))(s)
            for s in self.sizes
        ]

        def one(i):
            return jax.lax.switch(i, branches, x_true, x_pred)

        # n_scale is small (4): unrolled python loop, each a switch
        total = 0.0
        for k in range(self.n_scale):
            total = total + one(idx[k])
        return total / self.n_scale


def rss_loss(
    x_pred: jnp.ndarray,
    x_true: jnp.ndarray,
    key: jax.Array,
    fft_min: int = 256,
    fft_max: int = 2048,
    n_scale: int = 4,
) -> jnp.ndarray:
    return RSSLoss(fft_min, fft_max, n_scale)(x_pred, x_true, key)


def mel_snr(gt_mel: jnp.ndarray, pred_mel: jnp.ndarray) -> jnp.ndarray:
    """10*log10(mean(gt^2) / var(gt - pred)) (reflow/solver.py:12-21)."""
    err = gt_mel - pred_mel
    return 10.0 * jnp.log10(jnp.mean(gt_mel**2) / jnp.var(err))


def mel_si_snr(gt_mel: jnp.ndarray, pred_mel: jnp.ndarray) -> jnp.ndarray:
    """Scale-invariant SNR (reflow/solver.py:24-36)."""
    scale = jnp.sum(gt_mel * pred_mel) / jnp.sum(gt_mel**2)
    err = gt_mel - scale * pred_mel
    return 10.0 * jnp.log10(jnp.mean(gt_mel**2) / jnp.var(err))


def mel_psnr(gt_mel: jnp.ndarray, pred_mel: jnp.ndarray) -> jnp.ndarray:
    """10*log10(max(gt)^2 / mse) (reflow/solver.py:39-48)."""
    mse = jnp.mean((gt_mel - pred_mel) ** 2)
    return 10.0 * jnp.log10(jnp.max(gt_mel) ** 2 / mse)
