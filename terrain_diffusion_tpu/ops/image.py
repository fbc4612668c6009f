"""Image resampling primitives with reference-compatible semantics.

All functions operate on arrays whose last two axes are (H, W); leading axes
are batch/channel.  Semantics mirror the torchvision ops the reference uses
(`data/laplacian_encoder.py`, `world_pipeline.py`):

- ``resize_bilinear``  == torchvision ``TF.resize(..., BILINEAR)`` which with
  torchvision>=0.17 is **antialiased** on downsampling and standard
  half-pixel bilinear on upsampling.  ``jax.image.resize(method='linear')``
  implements exactly this (verified numerically against torch).
- ``gaussian_blur``    == ``TF.gaussian_blur`` (odd kernel, reflect padding).
- ``upsample_nearest`` == ``F.interpolate(mode='nearest')`` for integer factors.
- ``grid_sample_bilinear`` == ``F.grid_sample(mode='bilinear',
  padding_mode='border', align_corners=False)``.
- ``avg_pool`` / ``max_pool`` / ``min_pool`` == the torch pooling calls used
  for coarse conditioning pooling (`world_pipeline.py:996-1016`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Resize last two axes to `size` with (antialiased) bilinear filtering."""
    out_shape = (*x.shape[:-2], int(size[0]), int(size[1]))
    return jax.image.resize(x, out_shape, method="linear")


def gaussian_kernel1d(kernel_size: int, sigma: float) -> np.ndarray:
    """torchvision _get_gaussian_kernel1d: pdf at linspace(-k/2, k/2, k), normalized."""
    half = (kernel_size - 1) * 0.5
    xs = np.linspace(-half, half, kernel_size)
    pdf = np.exp(-0.5 * (xs / sigma) ** 2)
    return (pdf / pdf.sum()).astype(np.float32)


def gaussian_blur(x: jnp.ndarray, kernel_size: int, sigma: float) -> jnp.ndarray:
    """Separable gaussian blur with reflect padding (torchvision semantics)."""
    k = jnp.asarray(gaussian_kernel1d(kernel_size, sigma), dtype=x.dtype)
    pad = kernel_size // 2
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    xf = x.reshape((-1, 1, h, w))
    xf = jnp.pad(xf, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
    # depthwise separable via two 1-D convs (NCHW, OIHW)
    ky = k.reshape(1, 1, kernel_size, 1)
    kx = k.reshape(1, 1, 1, kernel_size)
    dn = jax.lax.conv_dimension_numbers(xf.shape, ky.shape, ("NCHW", "OIHW", "NCHW"))
    xf = jax.lax.conv_general_dilated(xf, ky, (1, 1), "VALID", dimension_numbers=dn, precision=jax.lax.Precision.HIGHEST)
    xf = jax.lax.conv_general_dilated(xf, kx, (1, 1), "VALID", dimension_numbers=dn, precision=jax.lax.Precision.HIGHEST)
    return xf.reshape((*lead, h, w))


def upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbor integer upsampling of the last two axes."""
    x = jnp.repeat(x, factor, axis=-2)
    return jnp.repeat(x, factor, axis=-1)


def avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Non-overlapping average pooling of the last two axes."""
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    x = x.reshape((*lead, h // k, k, w // k, k))
    return x.mean(axis=(-3, -1))


def max_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    x = x.reshape((*lead, h // k, k, w // k, k))
    return x.max(axis=(-3, -1))


def min_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    x = x.reshape((*lead, h // k, k, w // k, k))
    return x.min(axis=(-3, -1))


def avg_pool_stride1(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """`F.avg_pool2d(x, win, stride=1, padding=0)` on the last two axes."""
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    xf = x.reshape((-1, 1, h, w))
    k = jnp.full((1, 1, win, win), 1.0 / (win * win), dtype=x.dtype)
    dn = jax.lax.conv_dimension_numbers(xf.shape, k.shape, ("NCHW", "OIHW", "NCHW"))
    out = jax.lax.conv_general_dilated(xf, k, (1, 1), "VALID", dimension_numbers=dn, precision=jax.lax.Precision.HIGHEST)
    return out.reshape((*lead, h - win + 1, w - win + 1))


def grid_sample_bilinear(features: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """`F.grid_sample(features[None], grid[None], bilinear, border,
    align_corners=False)` without the batch dim.

    Args:
        features: (C, H, W)
        grid: (Hout, Wout, 2) with grid[..., 0]=x in [-1,1], grid[..., 1]=y.
    Returns:
        (C, Hout, Wout)
    """
    c, h, w = features.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    # align_corners=False unnormalization
    ix = ((gx + 1.0) * w - 1.0) * 0.5
    iy = ((gy + 1.0) * h - 1.0) * 0.5
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    tx = ix - ix0
    ty = iy - iy0

    def gather(yi, xi):
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        return features[:, yi, xi]  # (C, Hout, Wout)

    v00 = gather(iy0, ix0)
    v01 = gather(iy0, ix0 + 1)
    v10 = gather(iy0 + 1, ix0)
    v11 = gather(iy0 + 1, ix0 + 1)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty


def signed_sqrt(x):
    """sign(x) * sqrt(|x|) — the Earth-dynamic-range transform."""
    return jnp.sign(x) * jnp.sqrt(jnp.abs(x))


def signed_square(x):
    """sign(x) * x^2 — inverse of signed_sqrt."""
    return jnp.sign(x) * jnp.square(x)
