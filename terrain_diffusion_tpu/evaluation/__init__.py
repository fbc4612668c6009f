"""Evaluation: tiling helpers shared by bounded-canvas samplers
(reference `training/evaluation/__init__.py:1-22`)."""
from __future__ import annotations

import numpy as np


def linear_weight_window(size: int, eps: float = 1e-3) -> np.ndarray:
    from terrain_diffusion_tpu.ops.windows import linear_weight_window as _w

    return _w(size, eps)


def constant_weight_window(size: int) -> np.ndarray:
    return np.ones((size, size), dtype=np.float32)


def tile_starts(total: int, tile: int, stride: int) -> list[int]:
    """Start offsets covering [0, total) with given tile/stride; final tile
    clamped to the edge."""
    if total <= tile:
        return [0]
    starts = list(range(0, total - tile, stride))
    if starts[-1] != total - tile:
        starts.append(total - tile)
    return starts
