"""Overlap-blending weight windows.

The InfiniteDiffusion runtime sums weighted window outputs plus a weight
channel; consumers divide values by weight to recover the blended average.
These kernels match reference `world_pipeline.py:117-124` (separable linear,
eps=1e-3) and `training/evaluation/__init__.py` (constant window).
"""
from __future__ import annotations

import numpy as np


def linear_weight_window(size: int, eps: float = 1e-3, dtype=np.float32) -> np.ndarray:
    """(size, size) separable linear window: 1 at center, eps at edges."""
    mid = (size - 1) / 2
    r = np.arange(size, dtype=np.float64)
    w1 = 1 - (1 - eps) * np.clip(np.abs(r - mid) / mid, 0, 1)
    return (w1[:, None] * w1[None, :]).astype(dtype)


def constant_weight_window(size: int, dtype=np.float32) -> np.ndarray:
    return np.ones((size, size), dtype=dtype)


def normalize_weighted(arr: np.ndarray, axis: int = 0):
    """values/weight split along `axis`: arr[:-1]/arr[-1:] (reference
    `normalize_tensor`, `world_pipeline.py:269-274`)."""
    sl_num = [slice(None)] * arr.ndim
    sl_den = [slice(None)] * arr.ndim
    sl_num[axis] = slice(None, -1)
    sl_den[axis] = slice(-1, None)
    return arr[tuple(sl_num)] / arr[tuple(sl_den)]
