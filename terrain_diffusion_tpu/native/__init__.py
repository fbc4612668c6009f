"""Native (C++) host kernels: portable RNG and Perlin FBm.

Replaces the reference's third-party native deps (numba-JIT portable RNG,
pyfastnoiselite/FastNoiseLite C++) with first-party C++ exposed over a plain
C ABI via ctypes.  Build explicitly with
``python -m terrain_diffusion_tpu.native.build`` — importing this package
NEVER shells out to a compiler; it only loads a prebuilt
``libterrain_native.so`` if one is present.

``lib`` is the loaded wrapper, or ``None`` if the prebuilt library is absent;
callers (e.g. rng_portable, perlin) fall back to vectorized NumPy
implementations.  Fallback cost on the serving hot path: the synthetic-map
conditioning evaluates ~5 Perlin-FBm fields per coarse tile; the NumPy FBm is
~8x slower per field (~3 ms vs ~0.4 ms per 64x64 tile) — noticeable only on
coarse-stage cold starts, and amortized away by the tile caches.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libterrain_native.so")
_SRCS = [
    os.path.join(_HERE, "src", "portable_rng.cpp"),
    os.path.join(_HERE, "src", "perlin.cpp"),
]


_FAIL_MARKER = os.path.join(_HERE, ".build_failed")


def build(force: bool = False) -> str:
    """Compile the native library with g++; returns the .so path.

    Portable flags by default; set ``TDTPU_NATIVE_MARCH`` (e.g. ``native``)
    to opt in to arch-specific codegen.  Failures are cached in a marker file
    so repeated calls don't retry a known-broken toolchain until the sources
    change (pass ``force=True`` to override both caches).
    """
    newest_src = max(os.path.getmtime(s) for s in _SRCS)
    if not force:
        if (os.path.exists(_SO_PATH)
                and os.path.getmtime(_SO_PATH) >= newest_src):
            return _SO_PATH
        if (os.path.exists(_FAIL_MARKER)
                and os.path.getmtime(_FAIL_MARKER) >= newest_src):
            with open(_FAIL_MARKER) as f:
                raise RuntimeError(f"native build previously failed "
                                   f"(rm {_FAIL_MARKER} to retry):\n{f.read()}")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17"]
    march = os.environ.get("TDTPU_NATIVE_MARCH")
    if march:
        cmd.append(f"-march={march}")
    cmd += [*_SRCS, "-o", _SO_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, OSError) as e:
        detail = getattr(e, "stderr", "") or str(e)
        try:  # best-effort: a read-only package dir must not mask the
            with open(_FAIL_MARKER, "w") as f:  # actual compiler error
                f.write(f"{' '.join(cmd)}\n{detail}")
        except OSError:
            pass
        raise RuntimeError(f"native build failed: {detail}") from e
    try:
        if os.path.exists(_FAIL_MARKER):
            os.unlink(_FAIL_MARKER)
    except OSError:
        pass
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
    """Load a PREBUILT library only — no compiler invocation at import time
    (a g++ shell-out as an import side effect is fragile on serving hosts;
    build explicitly via `python -m terrain_diffusion_tpu.native.build`)."""
    if os.environ.get("TDTPU_DISABLE_NATIVE"):
        raise ImportError("native disabled via TDTPU_DISABLE_NATIVE")
    if not os.path.exists(_SO_PATH):
        raise ImportError(
            f"no prebuilt {_SO_PATH}; run "
            "`python -m terrain_diffusion_tpu.native.build`")
    newest_src = max(os.path.getmtime(s) for s in _SRCS)
    if os.path.getmtime(_SO_PATH) < newest_src:
        raise ImportError(
            f"{_SO_PATH} is older than its sources; rebuild with "
            "`python -m terrain_diffusion_tpu.native.build`")
    return _NativeLib(_SO_PATH)


try:
    lib = _load()
except ImportError:
    lib = None


def get_native():
    """The loaded native library or None — the one shared accessor for the
    ops-layer fast paths (import of this package is already lazy/fail-safe,
    so callers just guard on the None)."""
    return lib
