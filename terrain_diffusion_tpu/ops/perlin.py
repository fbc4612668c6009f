"""Perlin FBm noise (FastNoiseLite-compatible algorithm).

Batch API over the first-party C++ kernel (`native/src/perlin.cpp`) with an
exact vectorized NumPy fallback, plus a JAX implementation for on-device
conditioning generation.  Replaces the reference's pyfastnoiselite dependency
(`synthetic_map.py:195-229`): same published algorithm (hash-based gradient
Perlin, quintic interpolation, FBm octave stacking with fractal bounding),
same parameterization (frequency, octaves, lacunarity, gain, integer seed).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_PRIME_X = np.int32(501125321)
_PRIME_Y = np.int32(1136930381)
_HASH_MULT = np.uint32(0x27D4EB2D)


def _gradient_table() -> np.ndarray:
    """128 unit gradient pairs: 24 directions at (7.5 + 15k) deg, cycled."""
    k = np.arange(128) % 24
    a = np.deg2rad(7.5 + 15.0 * k)
    g = np.empty(256, dtype=np.float32)
    g[0::2] = np.sin(a)
    g[1::2] = np.cos(a)
    return g


_GRAD = _gradient_table()


def _hash2(seed, xp, yp):
    h = (seed ^ xp ^ yp).astype(np.int32)
    return (h.view(np.uint32) * _HASH_MULT).view(np.int32)


def _grad_coord(seed, xp, yp, xd, yd):
    h = _hash2(seed, xp, yp)
    h = h ^ (h >> np.int32(15))
    h = h & np.int32(127 << 1)
    return xd * _GRAD[h] + yd * _GRAD[h | 1]


def _quintic(t):
    return t * t * t * (t * (t * 6 - 15) + 10)


def _perlin_single_np(seed: np.int32, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    xd0 = (x - x0).astype(np.float32)
    yd0 = (y - y0).astype(np.float32)
    xd1, yd1 = xd0 - 1, yd0 - 1
    xs, ys = _quintic(xd0), _quintic(yd0)
    with np.errstate(over="ignore"):
        x0p = (x0.astype(np.int32).view(np.uint32) * _PRIME_X.view(np.uint32)).view(np.int32)
        y0p = (y0.astype(np.int32).view(np.uint32) * _PRIME_Y.view(np.uint32)).view(np.int32)
        x1p = (x0p.view(np.uint32) + _PRIME_X.view(np.uint32)).view(np.int32)
        y1p = (y0p.view(np.uint32) + _PRIME_Y.view(np.uint32)).view(np.int32)
    g00 = _grad_coord(seed, x0p, y0p, xd0, yd0)
    g10 = _grad_coord(seed, x1p, y0p, xd1, yd0)
    g01 = _grad_coord(seed, x0p, y1p, xd0, yd1)
    g11 = _grad_coord(seed, x1p, y1p, xd1, yd1)
    xf0 = g00 + xs * (g10 - g00)
    xf1 = g01 + xs * (g11 - g01)
    return (xf0 + ys * (xf1 - xf0)) * np.float32(1.4247691104677813)


def fractal_bounding(octaves: int, gain: float) -> float:
    """FBm octave normalizer: 1 / (1 + g + ... + g^(octaves-1)) — the exact
    amplitude sum, keeping |FBm| <= max|single noise| as FastNoiseLite's
    documented -1..1 output contract requires.

    KNOWN AMBIGUITY (round 5, unresolvable offline): the exact statement
    order inside FastNoiseLite's CalculateFractalBounding (accumulate-then-
    multiply vs multiply-then-accumulate, amp initialized to |gain|) decides
    whether the sum is 1+g+...+g^(o-1) or 1+g^2+...+g^o — a pure constant
    per (octaves, gain), ~25% apart at defaults.  Neither pyfastnoiselite
    nor the FastNoiseLite source is reachable in this environment, and two
    independent recollections disagreed, so this repo (a) keeps the exact
    normalization, and (b) makes the conditioning path INVARIANT to the
    constant: synthetic-map noise quantile tables are always recomputed
    from this implementation (see make_synthetic_map_factory), and the
    quantile transform cancels any uniform noise scaling when tables and
    fields share an implementation (test_quantile_transform_cancels_noise_
    scale).  The residual exposure is absolute-scale consumers only (the
    Minecraft detail-noise amplitudes)."""
    g = abs(gain)
    amp, amp_fractal = g, 1.0
    for _ in range(1, octaves):
        amp_fractal += amp
        amp *= g
    return 1.0 / amp_fractal


def perlin_fbm_np(seed: int, frequency: float, octaves: int, lacunarity: float,
                  gain: float, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Vectorized NumPy FBm at arbitrary coordinates (pre-frequency units)."""
    x = np.asarray(xs, dtype=np.float32) * frequency
    y = np.asarray(ys, dtype=np.float32) * frequency
    bounding = fractal_bounding(octaves, gain)
    total = np.zeros_like(x, dtype=np.float32)
    amp = bounding
    s = int(seed)
    for _ in range(octaves):
        s32 = ((s + 2**31) % 2**32) - 2**31  # wrap to int32 range
        total += _perlin_single_np(np.int32(s32), x, y) * amp
        s += 1
        x = x * lacunarity
        y = y * lacunarity
        amp *= gain
    return total


def _get_native():
    try:
        from terrain_diffusion_tpu.native import get_native
    except Exception:
        return None
    return get_native()


def perlin_fbm(seed: int, frequency: float, octaves: int, lacunarity: float,
               gain: float, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """FBm Perlin at coordinates; native C++ fast path, NumPy fallback."""
    nat = _get_native()
    shape = np.shape(xs)
    if nat is not None:
        out = nat.perlin_fbm_coords(
            int(np.int32(int(seed) & 0x7FFFFFFF)), frequency, octaves, lacunarity, gain,
            np.ravel(xs), np.ravel(ys))
        return out.reshape(shape)
    return perlin_fbm_np(int(seed) & 0x7FFFFFFF, frequency, octaves, lacunarity, gain, xs, ys)


# ---------------------------------------------------------------------------
# JAX (on-device) implementation — same algorithm, jit/vmap friendly
# ---------------------------------------------------------------------------

_GRAD_J = jnp.asarray(_GRAD)


def _perlin_single_jax(seed, x, y):
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    xd0 = x - x0
    yd0 = y - y0
    xd1, yd1 = xd0 - 1, yd0 - 1
    xs = _quintic(xd0)
    ys = _quintic(yd0)
    px = jnp.int32(501125321)
    py = jnp.int32(1136930381)
    x0p = x0 * px
    y0p = y0 * py
    x1p = x0p + px
    y1p = y0p + py

    def grad(xp, yp, xd, yd):
        h = (seed ^ xp ^ yp) * jnp.int32(0x27D4EB2D)
        h = h ^ (h >> 15)
        h = h & jnp.int32(127 << 1)
        return xd * _GRAD_J[h] + yd * _GRAD_J[h | 1]

    g00 = grad(x0p, y0p, xd0, yd0)
    g10 = grad(x1p, y0p, xd1, yd0)
    g01 = grad(x0p, y1p, xd0, yd1)
    g11 = grad(x1p, y1p, xd1, yd1)
    xf0 = g00 + xs * (g10 - g00)
    xf1 = g01 + xs * (g11 - g01)
    return (xf0 + ys * (xf1 - xf0)) * 1.4247691104677813


def perlin_fbm_jax(seed, frequency, octaves: int, lacunarity, gain, xs, ys):
    """FBm Perlin in JAX (octaves static)."""
    x = xs * frequency
    y = ys * frequency
    bounding = fractal_bounding(octaves, gain)
    total = jnp.zeros_like(x)
    amp = bounding
    # same positive-int32 seed domain as the host paths (perlin_fbm masks
    # identically) — 64-bit world seeds must not overflow int32, and the
    # device field must match the host field for the same nominal seed
    if hasattr(seed, "dtype"):  # traced: keep the low 31 bits, x64-safe
        s = (jnp.asarray(seed).astype(jnp.uint32)
             & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    else:
        s = jnp.int32(int(seed) & 0x7FFFFFFF)
    for i in range(octaves):
        total = total + _perlin_single_jax(s + i, x, y) * amp
        x = x * lacunarity
        y = y * lacunarity
        amp = amp * gain
    return total
