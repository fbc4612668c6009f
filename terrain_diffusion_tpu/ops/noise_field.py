"""Deterministic, O(1)-random-access tiled Gaussian noise fields.

Two interchangeable providers back every stochastic input of the pipeline
(the seed-consistency contract of InfiniteDiffusion: any tile is computable
in isolation and identical regardless of evaluation order — reference
`world_pipeline.py:58-115`):

1. ``gaussian_noise_patch`` — *portable* host path: per-tile PCG64+Marsaglia
   streams seeded by ``tile_seed(base, ty, tx)``.  Bit-exact with the
   reference's CPU implementation, used for golden-tile parity.

2. ``threefry_noise_patch`` / ``threefry_tile`` — *TPU-native* path:
   counter-based threefry (JAX's PRNG) keyed on ``(seed, ty, tx)``, evaluated
   **inside** jitted programs so batched multi-tile programs generate their
   own noise on device with no host traffic.  Bit-deterministic within a
   backend regardless of batch composition or evaluation order; across
   backends the threefry *bits* agree but the uint->normal transform uses
   backend transcendental approximations, so values agree to ~3e-5 in
   float32 (measured CPU vs TPU v5e) — far inside the pipeline's 1e-3
   parity budget.

Both support negative coordinates and arbitrary crops assembled from tile
intersections.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from terrain_diffusion_tpu.ops.rng_portable import fill_standard_normal, tile_seed


# ---------------------------------------------------------------------------
# Portable host path (PCG64 + Marsaglia per tile)
# ---------------------------------------------------------------------------

def gaussian_noise_patch(
    base_seed: int,
    y0: int,
    x0: int,
    h: int,
    w: int,
    channels: int = 1,
    tile_h: int = 256,
    tile_w: int = 256,
    dtype=np.float32,
) -> np.ndarray:
    """(C, H, W) crop of an infinite tile-seeded Gaussian field (portable RNG).

    Value at (c, y, x) depends only on (base_seed, y // tile_h, x // tile_w)
    and the position within the tile, so overlapping requests agree.
    Stream-compatible with reference `world_pipeline.py:66-115`.
    """
    out = np.empty((channels, h, w), dtype=dtype)
    ty0, ty1 = y0 // tile_h, (y0 + h - 1) // tile_h
    tx0, tx1 = x0 // tile_w, (x0 + w - 1) // tile_w
    for ty in range(ty0, ty1 + 1):
        tile_y0 = ty * tile_h
        for tx in range(tx0, tx1 + 1):
            tile_x0 = tx * tile_w
            oy0, oy1 = max(y0, tile_y0), min(y0 + h, tile_y0 + tile_h)
            ox0, ox1 = max(x0, tile_x0), min(x0 + w, tile_x0 + tile_w)
            tile = np.empty((channels, tile_h, tile_w), dtype=dtype)
            fill_standard_normal(tile_seed(base_seed, ty, tx), tile.reshape(-1))
            out[:, oy0 - y0 : oy1 - y0, ox0 - x0 : ox1 - x0] = tile[
                :, oy0 - tile_y0 : oy1 - tile_y0, ox0 - tile_x0 : ox1 - tile_x0
            ]
    return out


# ---------------------------------------------------------------------------
# TPU-native path (counter-based threefry, works under jit/vmap)
# ---------------------------------------------------------------------------

def split_seed(seed: int) -> tuple[int, int]:
    """Split a 64-bit python int seed into (lo32, hi32) for 32-bit JAX keys."""
    seed = int(seed) & 0xFFFFFFFFFFFFFFFF
    return seed & 0xFFFFFFFF, seed >> 32


def seed_to_pair(seed: int) -> np.ndarray:
    """(2,) uint32 [lo, hi] representation of a 64-bit seed.

    Seed pairs are the *traced* form of a seed: jitted programs take them as
    runtime inputs, so a seed change reuses the compiled program instead of
    retracing (the key derivation is identical to the python-int path)."""
    lo, hi = split_seed(seed)
    return np.asarray([lo, hi], dtype=np.uint32)


def _tile_key(seed, ty, tx):
    """Per-tile threefry key from (seed, ty, tx); ty/tx may be traced ints.

    ``seed`` is either a concrete python int or a (2,) uint32 [lo, hi] pair
    (possibly traced — see ``seed_to_pair``); both derive the identical key
    via the same fold_in chain, so the stream is a pure function of
    (seed, ty, tx) independent of evaluation order, batch composition, or
    whether the seed was baked or passed as data.
    """
    if isinstance(seed, (int, np.integer)):
        lo, hi = split_seed(seed)
        key = jax.random.key(jnp.uint32(lo))
        key = jax.random.fold_in(key, jnp.uint32(hi))
    else:
        seed = jnp.asarray(seed)
        key = jax.random.key(seed[0].astype(jnp.uint32))
        key = jax.random.fold_in(key, seed[1].astype(jnp.uint32))
    key = jax.random.fold_in(key, jnp.asarray(ty, dtype=jnp.int32).astype(jnp.uint32))
    key = jax.random.fold_in(key, jnp.asarray(tx, dtype=jnp.int32).astype(jnp.uint32))
    return key


def threefry_tile(seed, ty, tx, channels: int, tile_h: int, tile_w: int, dtype=jnp.float32):
    """One (C, tile_h, tile_w) tile of the threefry field. Jit/vmap friendly."""
    return jax.random.normal(_tile_key(seed, ty, tx), (channels, tile_h, tile_w), dtype=dtype)


def threefry_noise_patch(
    seed,
    y0,
    x0,
    *,
    h: int,
    w: int,
    channels: int = 1,
    tile_h: int = 256,
    tile_w: int = 256,
    dtype=jnp.float32,
):
    """(C, h, w) crop of the threefry tile field; (y0, x0) may be traced.

    ``seed`` is a python int or a (2,) uint32 [lo, hi] pair; the pair form
    may be traced, so ONE compiled program serves every seed (the stream is
    identical either way — see ``_tile_key``).  Python ints are converted to
    pairs *before* the jit boundary (64-bit seeds don't fit a traced int32).

    Generates the (static) bounding set of tiles covering any alignment of the
    crop, then dynamic-slices — branch-free, so it compiles once per shape and
    runs on device regardless of position (including negative coordinates).
    """
    if isinstance(seed, (int, np.integer)):
        seed = seed_to_pair(seed)
    return _threefry_noise_patch(
        seed, y0, x0, h=h, w=w, channels=channels,
        tile_h=tile_h, tile_w=tile_w, dtype=dtype)


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "channels", "tile_h", "tile_w", "dtype"),
)
def _threefry_noise_patch(
    seed, y0, x0, *, h, w, channels, tile_h, tile_w, dtype,
):
    ny = (h - 2) // tile_h + 2  # max tiles spanned vertically for any offset
    nx = (w - 2) // tile_w + 2
    ty0 = jnp.floor_divide(y0, tile_h)
    tx0 = jnp.floor_divide(x0, tile_w)

    tys = ty0 + jnp.arange(ny)
    txs = tx0 + jnp.arange(nx)

    def row(ty):
        return jax.vmap(lambda tx: threefry_tile(seed, ty, tx, channels, tile_h, tile_w, dtype))(txs)

    tiles = jax.vmap(row)(tys)  # (ny, nx, C, th, tw)
    canvas = jnp.transpose(tiles, (2, 0, 3, 1, 4)).reshape(channels, ny * tile_h, nx * tile_w)
    off_y = y0 - ty0 * tile_h
    off_x = x0 - tx0 * tile_w
    return jax.lax.dynamic_slice(canvas, (0, off_y, off_x), (channels, h, w))


def threefry_noise_patch_host(
    seed: int, y0: int, x0: int, h: int, w: int, channels: int = 1,
    tile_h: int = 256, tile_w: int = 256,
) -> np.ndarray:
    """Host-convenience wrapper returning numpy (same field as the jitted path)."""
    return np.asarray(
        threefry_noise_patch(
            seed=int(seed) & 0xFFFFFFFFFFFFFFFF,
            y0=y0, x0=x0, h=h, w=w, channels=channels,
            tile_h=tile_h, tile_w=tile_w,
        )
    )


class NoiseProvider:
    """Pluggable noise backend for the pipeline.

    mode='threefry' (default, device-native) or mode='portable' (PCG64 host
    bridge for parity with reference worlds).
    """

    def __init__(self, mode: str = "threefry"):
        if mode not in ("threefry", "portable"):
            raise ValueError(f"unknown noise mode {mode!r}")
        self.mode = mode

    def patch(self, base_seed, y0, x0, h, w, channels=1, tile_h=256, tile_w=256):
        if self.mode == "portable":
            return gaussian_noise_patch(base_seed, y0, x0, h, w, channels, tile_h, tile_w)
        return threefry_noise_patch_host(base_seed, y0, x0, h, w, channels, tile_h, tile_w)
