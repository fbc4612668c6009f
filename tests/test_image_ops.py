"""Numerics core: resize/blur/laplacian vs torch-CPU oracles, MP ops properties."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from terrain_diffusion_tpu.ops import image as im
from terrain_diffusion_tpu.ops import laplacian as lap
from terrain_diffusion_tpu.ops import mp
from terrain_diffusion_tpu.ops import windows as win


def test_resize_matches_torch_antialiased_down(rng):
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    got = np.asarray(im.resize_bilinear(jnp.asarray(x), (8, 8)))
    want = F.interpolate(torch.from_numpy(x), size=(8, 8), mode="bilinear",
                         align_corners=False, antialias=True).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_matches_torch_up(rng):
    x = rng.standard_normal((1, 2, 8, 8)).astype(np.float32)
    got = np.asarray(im.resize_bilinear(jnp.asarray(x), (64, 64)))
    want = F.interpolate(torch.from_numpy(x), size=(64, 64), mode="bilinear",
                         align_corners=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gaussian_blur_matches_torch(rng):
    x = rng.standard_normal((1, 2, 32, 32)).astype(np.float32)
    sigma = 5.0
    ksize = int(sigma * 2) // 2 * 2 + 1
    got = np.asarray(im.gaussian_blur(jnp.asarray(x), ksize, sigma))
    # torchvision gaussian_blur oracle: separable conv with reflect padding
    k1 = torch.from_numpy(im.gaussian_kernel1d(ksize, sigma))
    xt = torch.from_numpy(x).reshape(-1, 1, 32, 32)
    pad = ksize // 2
    xt = F.pad(xt, (pad, pad, pad, pad), mode="reflect")
    xt = F.conv2d(xt, k1.reshape(1, 1, ksize, 1))
    xt = F.conv2d(xt, k1.reshape(1, 1, 1, ksize))
    np.testing.assert_allclose(got, xt.reshape(1, 2, 32, 32).numpy(), rtol=1e-5, atol=1e-5)


def test_grid_sample_matches_torch(rng):
    feat = rng.standard_normal((3, 10, 12)).astype(np.float32)
    gy, gx = np.meshgrid(np.linspace(-1.3, 1.3, 7), np.linspace(-1.1, 1.2, 9), indexing="ij")
    grid = np.stack([gx, gy], axis=-1).astype(np.float32)
    got = np.asarray(im.grid_sample_bilinear(jnp.asarray(feat), jnp.asarray(grid)))
    want = F.grid_sample(torch.from_numpy(feat)[None], torch.from_numpy(grid)[None],
                         mode="bilinear", padding_mode="border",
                         align_corners=False)[0].numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pools(rng):
    x = rng.standard_normal((2, 8, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(im.avg_pool(jnp.asarray(x), 2)),
        F.avg_pool2d(torch.from_numpy(x)[None], 2)[0].numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(im.max_pool(jnp.asarray(x), 2)),
        F.max_pool2d(torch.from_numpy(x)[None], 2)[0].numpy(), rtol=1e-6)
    # min pool = reference's -max_pool(-x) (world_pipeline.py:1003-1005)
    np.testing.assert_allclose(
        np.asarray(im.min_pool(jnp.asarray(x), 2)),
        -F.max_pool2d(-torch.from_numpy(x)[None], 2)[0].numpy(), rtol=1e-6)
    # numpy block-reshape oracle for all three modes
    blocks = x.reshape(2, 4, 2, 4, 2)
    np.testing.assert_allclose(np.asarray(im.avg_pool(jnp.asarray(x), 2)),
                               blocks.mean(axis=(2, 4)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(im.max_pool(jnp.asarray(x), 2)),
                               blocks.max(axis=(2, 4)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(im.min_pool(jnp.asarray(x), 2)),
                               blocks.min(axis=(2, 4)), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(im.avg_pool_stride1(jnp.asarray(x), 3)),
        F.avg_pool2d(torch.from_numpy(x)[None], 3, stride=1)[0].numpy(),
        rtol=1e-5, atol=1e-6)


def test_laplacian_roundtrip(rng):
    x = rng.standard_normal((1, 64, 64)).astype(np.float32) * 10
    residual, lowres = lap.laplacian_encode(jnp.asarray(x), 8, sigma=5.0)
    decoded = lap.laplacian_decode(residual, lowres)
    np.testing.assert_allclose(np.asarray(decoded), x, rtol=1e-4, atol=1e-4)


def test_laplacian_denoise_stable(rng):
    x = rng.standard_normal((1, 64, 64)).astype(np.float32)
    residual, lowres = lap.laplacian_encode(jnp.asarray(x), 8, sigma=5.0)
    r2, l2 = lap.laplacian_denoise(residual, lowres, sigma=5.0)
    # denoise of a clean encode should roughly reproduce the low band
    assert float(jnp.abs(l2 - lowres).mean()) < 0.1
    decoded = lap.laplacian_decode(r2, l2)
    np.testing.assert_allclose(np.asarray(decoded), x, rtol=0.2, atol=0.5)


def test_pad_linear_extrapolation():
    x = jnp.asarray(np.arange(6, dtype=np.float32).reshape(2, 3))
    p = np.asarray(lap.pad_linear_extrapolation(x))
    assert p.shape == (4, 5)
    np.testing.assert_allclose(p[0, 1:4], [-3, -2, -1])  # 2*row0 - row1
    np.testing.assert_allclose(p[:, 0], 2 * p[:, 1] - p[:, 2])


def test_mp_normalize_matches_torch_semantics(rng):
    x = rng.standard_normal((4, 8, 3)).astype(np.float32)
    xt = torch.from_numpy(x)
    # reference semantics: eps + norm * sqrt(norm.numel()/x.numel())
    for dim in (None, 1, 2):
        got = np.asarray(mp.normalize(jnp.asarray(x), dim=dim))
        norm = torch.linalg.vector_norm(xt, dim=dim, keepdim=dim is not None)
        denom = 1e-4 + norm * np.sqrt(norm.numel() / xt.numel())
        want = (xt / denom).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_mp_silu_matches_torch(rng):
    x = rng.standard_normal(100).astype(np.float32)
    got = np.asarray(mp.mp_silu(jnp.asarray(x)))
    want = (F.silu(torch.from_numpy(x)) / 0.596).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_mp_sum_and_concat_preserve_magnitude(rng):
    a = jnp.asarray(rng.standard_normal((1024, 16)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1024, 48)).astype(np.float32))
    s = mp.mp_sum([a, a * 0 + jnp.asarray(rng.standard_normal((1024, 16)).astype(np.float32))], w=0.3)
    assert abs(float(jnp.std(s)) - 1.0) < 0.05
    c = mp.mp_concat([a, b], axis=-1, w=0.5)
    assert abs(float(jnp.std(c)) - 1.0) < 0.05
    # equal per-tensor contribution despite unequal channel counts
    ca, cb = c[:, :16], c[:, 16:]
    assert abs(float(jnp.sum(ca**2)) / float(jnp.sum(cb**2)) - 1.0) < 0.15


def test_mp_concat_matches_reference_formula(rng):
    # cross-check against a direct transcription of mp_layers.py:65-86
    a = rng.standard_normal((2, 5)).astype(np.float32)
    b = rng.standard_normal((2, 11)).astype(np.float32)
    w = [0.25, 0.75]
    got = np.asarray(mp.mp_concat([jnp.asarray(a), jnp.asarray(b)], axis=1, w=w))
    N = [5, 11]
    C = np.sqrt(sum(N) / (w[0] ** 2 + w[1] ** 2))
    want = np.concatenate([a * (C / np.sqrt(5) * w[0]), b * (C / np.sqrt(11) * w[1])], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_weight_windows():
    w = win.linear_weight_window(64)
    assert w.shape == (64, 64)
    # even sizes straddle the peak (same as reference linear_weight_window)
    assert 0.95 < w.max() < 1.0
    assert win.linear_weight_window(65).max() == pytest.approx(1.0)
    assert w[0, 0] == pytest.approx(1e-6, abs=1e-5)
    # symmetric
    np.testing.assert_allclose(w, w[::-1, ::-1])
    packed = np.concatenate([np.ones((2, 64, 64)) * w, w[None]], axis=0)
    np.testing.assert_allclose(win.normalize_weighted(packed), np.ones((2, 64, 64)), rtol=1e-6)


def test_signed_sqrt_roundtrip(rng):
    x = rng.standard_normal(50).astype(np.float32) * 1000
    y = im.signed_sqrt(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(im.signed_square(y)), x, rtol=1e-4)
