"""Window functions with torch-compatible conventions.

torch.hann_window / torch.bartlett_window default to *periodic* windows
(length-N slice of an (N+1)-point symmetric window). The reference relies on
this everywhere (ddsp/vocoder.py:629,726; ddsp/core.py:161), so we match it.
"""
from __future__ import annotations

import numpy as np


def hann_window(n: int, periodic: bool = True, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window: 0.5 * (1 - cos(2*pi*k / N))."""
    if n == 1:
        return np.ones(1, dtype=dtype)
    denom = n if periodic else n - 1
    k = np.arange(n)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * k / denom))).astype(dtype)


def sqrt_hann_window(n: int, periodic: bool = True, dtype=np.float32) -> np.ndarray:
    """sqrt(hann) analysis/synthesis window (CombSubFast, ddsp/vocoder.py:726)."""
    return np.sqrt(hann_window(n, periodic, np.float64)).astype(dtype)


def bartlett_window(n: int, periodic: bool = True, dtype=np.float32) -> np.ndarray:
    """Periodic Bartlett (triangular) window, torch convention."""
    if n == 1:
        return np.ones(1, dtype=dtype)
    denom = n if periodic else n - 1
    k = np.arange(n)
    return (1.0 - np.abs(2.0 * k / denom - 1.0)).astype(dtype)
