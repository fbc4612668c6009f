"""Laplacian pyramid codec for Earth-scale dynamic range stability.

JAX port of the reference codec semantics (`data/laplacian_encoder.py:63-137`):
elevation (after signed-sqrt) is split into a blurred low-resolution band and
a full-resolution residual; decoding re-upsamples the low band and adds the
residual.  ``laplacian_denoise`` re-estimates the low band from the decoded
output to kill cross-tile seam noise before final decode
(`world_pipeline.py:1306-1307`).

Operates on arrays with trailing (H, W) axes; fully jit-compatible for static
shapes.
"""
from __future__ import annotations

import jax.numpy as jnp

from terrain_diffusion_tpu.ops.image import gaussian_blur, resize_bilinear


def pad_linear_extrapolation(x: jnp.ndarray) -> jnp.ndarray:
    """Pad H and W by 1 with linear extrapolation (2*edge - next)."""
    h, w = x.shape[-2:]
    if h > 1:
        top = 2 * x[..., 0:1, :] - x[..., 1:2, :]
        bot = 2 * x[..., -1:, :] - x[..., -2:-1, :]
    else:
        top = x[..., 0:1, :]
        bot = x[..., -1:, :]
    x = jnp.concatenate([top, x, bot], axis=-2)
    if w > 1:
        left = 2 * x[..., :, 0:1] - x[..., :, 1:2]
        right = 2 * x[..., :, -1:] - x[..., :, -2:-1]
    else:
        left = x[..., :, 0:1]
        right = x[..., :, -1:]
    return jnp.concatenate([left, x, right], axis=-1)


def resize_extrapolated(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize that linearly extrapolates beyond the borders.

    Pads by one sample (linear extrapolation), resizes the padded array to
    `size + 2*scale`, then crops — so border pixels see extrapolated data
    instead of replicated edges (reference `laplacian_encoder.py:41-61`).
    """
    target_h, target_w = int(size[0]), int(size[1])
    h, w = x.shape[-2:]
    scale_h = target_h / h
    scale_w = target_w / w
    x_padded = pad_linear_extrapolation(x)
    new_h = int(round(target_h + 2 * scale_h))
    new_w = int(round(target_w + 2 * scale_w))
    out = resize_bilinear(x_padded, (new_h, new_w))
    pad_h = int(round(scale_h))
    pad_w = int(round(scale_w))
    return out[..., pad_h : pad_h + target_h, pad_w : pad_w + target_w]


def _blur_kernel_size(sigma: float) -> int:
    return int(sigma * 2) // 2 * 2 + 1


def laplacian_encode(x, downsample_size, sigma: float, extrapolate: bool = False):
    """Split x into (residual, lowres).

    lowres = blur(resize(x, downsample_size)); residual = x - upsample(lowres).
    """
    if isinstance(downsample_size, int):
        # torchvision TF.resize(int) semantics (the reference passes ints):
        # the SMALLER edge becomes downsample_size, aspect ratio preserved
        h, w = x.shape[-2:]
        if h <= w:
            downsample_size = (downsample_size,
                               max(int(round(downsample_size * w / h)), 1))
        else:
            downsample_size = (max(int(round(downsample_size * h / w)), 1),
                               downsample_size)
    lowres = resize_bilinear(x, downsample_size)
    lowres = gaussian_blur(lowres, _blur_kernel_size(sigma), sigma)
    if extrapolate:
        lowres_up = resize_extrapolated(lowres, x.shape[-2:])
    else:
        lowres_up = resize_bilinear(lowres, x.shape[-2:])
    return x - lowres_up, lowres


def laplacian_decode(residual, lowres, extrapolate: bool = False, pre_padded: bool = False):
    """residual + upsample(lowres); `pre_padded` crops a 1-lowres-pixel halo.

    With pre_padded=True, `lowres` carries one extra border sample per side;
    the upsample target is grown by the corresponding pixel count and the
    halo cropped after resize (reference `laplacian_encoder.py:108-120`).
    """
    resize_shape = residual.shape[-2:]
    if pre_padded:
        pad_pixels = residual.shape[-1] // (lowres.shape[-1] - 2)
        resize_shape = (resize_shape[0] + 2 * pad_pixels, resize_shape[1] + 2 * pad_pixels)
    if extrapolate:
        lowres_up = resize_extrapolated(lowres, resize_shape)
    else:
        lowres_up = resize_bilinear(lowres, resize_shape)
    if pre_padded:
        lowres_up = lowres_up[..., pad_pixels:-pad_pixels, pad_pixels:-pad_pixels]
    return residual + lowres_up


def laplacian_denoise(residual, lowres, sigma: float):
    """Re-estimate the low band from the decoded signal (seam denoising)."""
    decoded = laplacian_decode(residual, lowres, extrapolate=True)
    lowres_size = lowres.shape[-1]
    new_lowres = resize_bilinear(decoded, (lowres.shape[-2], lowres_size))
    new_lowres = gaussian_blur(new_lowres, _blur_kernel_size(sigma), sigma)
    return residual, new_lowres
