"""Native (C++) host kernels: portable RNG and Perlin FBm.

Replaces the reference's third-party native deps (numba-JIT portable RNG,
pyfastnoiselite/FastNoiseLite C++) with first-party C++ exposed over a plain
C ABI via ctypes.  Build with ``python -m terrain_diffusion_tpu.native.build``
(done automatically on first import when a compiler is available).

``lib`` is the loaded wrapper or raises ImportError if unavailable; callers
(e.g. rng_portable, perlin) fall back to vectorized NumPy implementations.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libterrain_native.so")
_SRCS = [
    os.path.join(_HERE, "src", "portable_rng.cpp"),
    os.path.join(_HERE, "src", "perlin.cpp"),
]


def build(force: bool = False) -> str:
    """Compile the native library with g++; returns the .so path."""
    if not force and os.path.exists(_SO_PATH):
        newest_src = max(os.path.getmtime(s) for s in _SRCS)
        if os.path.getmtime(_SO_PATH) >= newest_src:
            return _SO_PATH
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        *_SRCS, "-o", _SO_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO_PATH


class _NativeLib:
    def __init__(self, path: str):
        self._dll = ctypes.CDLL(path)
        d = self._dll
        d.td_fill_standard_normal_f32.argtypes = [
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        d.td_fill_standard_normal_f64.argtypes = [
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_double), ctypes.c_int64]
        d.td_tile_seed.restype = ctypes.c_uint64
        d.td_tile_seed.argtypes = [ctypes.c_uint64, ctypes.c_int32, ctypes.c_int32]
        d.td_gaussian_noise_patch_f32.argtypes = [
            ctypes.c_uint64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        d.td_perlin_fbm_grid.argtypes = [
            ctypes.c_int32, ctypes.c_float, ctypes.c_int32, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_float, ctypes.POINTER(ctypes.c_float)]
        d.td_perlin_fbm_coords.argtypes = [
            ctypes.c_int32, ctypes.c_float, ctypes.c_int32, ctypes.c_float,
            ctypes.c_float, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]

    @staticmethod
    def _fptr(a: np.ndarray):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def fill_standard_normal_f32(self, seed: int, out: np.ndarray) -> None:
        assert out.dtype == np.float32 and out.flags.c_contiguous
        self._dll.td_fill_standard_normal_f32(
            ctypes.c_uint64(seed), self._fptr(out), out.size)

    def tile_seed(self, base_seed: int, ty: int, tx: int) -> int:
        return int(self._dll.td_tile_seed(
            ctypes.c_uint64(base_seed), ty, tx))

    def gaussian_noise_patch_f32(self, base_seed, y0, x0, h, w, channels,
                                 tile_h, tile_w) -> np.ndarray:
        out = np.empty((channels, h, w), dtype=np.float32)
        scratch = np.empty(channels * tile_h * tile_w, dtype=np.float32)
        self._dll.td_gaussian_noise_patch_f32(
            ctypes.c_uint64(base_seed), y0, x0, h, w, channels, tile_h, tile_w,
            self._fptr(out), self._fptr(scratch))
        return out

    def perlin_fbm_grid(self, seed, frequency, octaves, lacunarity, gain,
                        x0, y0, nx, ny, step=1.0) -> np.ndarray:
        out = np.empty((ny, nx), dtype=np.float32)
        self._dll.td_perlin_fbm_grid(
            seed, frequency, octaves, lacunarity, gain,
            x0, y0, nx, ny, step, self._fptr(out))
        return out

    def perlin_fbm_coords(self, seed, frequency, octaves, lacunarity, gain,
                          xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
        xs = np.ascontiguousarray(xs, dtype=np.float32)
        ys = np.ascontiguousarray(ys, dtype=np.float32)
        out = np.empty(xs.size, dtype=np.float32)
        self._dll.td_perlin_fbm_coords(
            seed, frequency, octaves, lacunarity, gain,
            self._fptr(xs), self._fptr(ys), xs.size, self._fptr(out))
        return out


def _load():
    if os.environ.get("TDTPU_DISABLE_NATIVE"):
        raise ImportError("native disabled via TDTPU_DISABLE_NATIVE")
    try:
        path = build()
    except Exception as e:  # compiler unavailable etc.
        raise ImportError(f"could not build native lib: {e}") from e
    return _NativeLib(path)


try:
    lib = _load()
except ImportError:
    lib = None
    if "pytest" not in sys.modules:
        pass
