"""Portable RNG: PCG64 (64-bit LCG + XSH-RR 64/32) + Marsaglia polar normals.

This is the determinism contract of the framework's *portable* noise path:
the same (seed, size) must reproduce the identical float stream in Python,
C++ and Java.  Stream-compatible with the reference implementation
(`/root/reference/terrain_diffusion/inference/portable_rng.py:1-89`), which
explicitly documents C++/Java portability as the design goal.

Unlike the reference (which needs numba's LLVM JIT for speed), this module is
pure vectorized NumPy with an optional C++ fast path
(`terrain_diffusion_tpu.native`).  The vectorization is exact: LCG states are
advanced in blocks using precomputed `M^i` / increment prefix tables (64-bit
wraparound arithmetic), and the Marsaglia polar rejection loop is reproduced
by filtering accepted pairs in stream order.

The TPU-native *default* noise path is counter-based threefry
(`terrain_diffusion_tpu.ops.noise_field`); this module exists for
(a) bit-exact cross-checking against the reference's streams and
(b) host-side parity generation when matching reference worlds.
"""
from __future__ import annotations

import numpy as np

PCG64_MULT = 6364136223846793005
PCG64_INC = 1442695040888963407
_MASK64 = 0xFFFFFFFFFFFFFFFF

# Block size for vectorized LCG advancement.
_BLOCK = 8192

_U64_MULT = np.uint64(PCG64_MULT)
_U64_INC = np.uint64(PCG64_INC)


def _build_jump_tables(n: int):
    """Prefix tables: after i steps, state = mult_tab[i]*s0 + inc_tab[i] (mod 2^64)."""
    mult = np.empty(n + 1, dtype=np.uint64)
    inc = np.empty(n + 1, dtype=np.uint64)
    m, c = 1, 0
    for i in range(n + 1):
        mult[i] = m
        inc[i] = c
        m = (m * PCG64_MULT) & _MASK64
        c = (c * PCG64_MULT + PCG64_INC) & _MASK64
    return mult, inc


_JUMP_MULT, _JUMP_INC = _build_jump_tables(_BLOCK)


def pcg64_next(state: int) -> tuple[int, int]:
    """One PCG64 XSH-RR 64/32 step: (new_state, 32-bit output)."""
    state = (state * PCG64_MULT + PCG64_INC) & _MASK64
    x = (((state >> 18) ^ state) >> 27) & 0xFFFFFFFF
    rot = state >> 59
    out32 = ((x >> rot) | (x << ((32 - rot) & 31))) & 0xFFFFFFFF
    return state, out32


def next_seed(seed: int | None) -> int:
    """Derive a new 64-bit seed from a parent seed or from time when None/0.

    Matches reference `portable_rng.py:31-42`: two PCG64 outputs fill 64 bits.
    """
    state = (int(seed) & _MASK64) if seed is not None else 0
    if state == 0:
        import time

        state = int(time.perf_counter_ns()) & _MASK64
    state, lo = pcg64_next(state)
    state, hi = pcg64_next(state)
    return int(((hi << 32) | lo) & _MASK64)


def _pcg64_outputs_block(state: int, n: int) -> tuple[int, np.ndarray]:
    """Generate n 32-bit outputs starting from `state`; returns (new_state, uint32[n]).

    Output i is produced from the state after i+1 LCG steps (matching the
    sequential semantics of `pcg64_next`).
    """
    with np.errstate(over="ignore"):
        s0 = np.uint64(state)
        # states after 1..n steps
        states = _JUMP_MULT[1 : n + 1] * s0 + _JUMP_INC[1 : n + 1]
        new_state = int(states[-1])
        x = ((states >> np.uint64(18)) ^ states) >> np.uint64(27)
        x = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        rot = (states >> np.uint64(59)).astype(np.uint32)
        out = (x >> rot) | (x << ((np.uint32(32) - rot) & np.uint32(31)))
    return new_state, out


def _fill_standard_normal_numpy(seed: int, out: np.ndarray) -> None:
    """Exact vectorized Marsaglia polar fill (stream-identical to the scalar loop)."""
    n = out.size
    state = int(seed) & _MASK64
    inv_2p32 = 1.0 / 4294967296.0
    filled = 0
    buf = np.empty(0, dtype=np.float64)
    while filled < n:
        need_pairs = ((n - filled + 1) // 2) + 8
        # Accept rate is pi/4; oversample to converge in ~1 round.
        gen_pairs = max(int(need_pairs * 1.35) + 16, 64)
        gen_pairs = min(gen_pairs, _BLOCK // 2)
        state, u = _pcg64_outputs_block(state, gen_pairs * 2)
        u1 = u[0::2].astype(np.float64)
        u2 = u[1::2].astype(np.float64)
        v1 = 2.0 * (u1 + 1.0) * inv_2p32 - 1.0
        v2 = 2.0 * (u2 + 1.0) * inv_2p32 - 1.0
        s = v1 * v1 + v2 * v2
        ok = (s > 0.0) & (s < 1.0)
        if not np.any(ok):
            continue
        f = np.sqrt(-2.0 * np.log(s[ok]) / s[ok])
        # Interleave (v1*f, v2*f) preserving pair order.
        pair_norms = np.empty(ok.sum() * 2, dtype=np.float64)
        pair_norms[0::2] = v1[ok] * f
        pair_norms[1::2] = v2[ok] * f
        take = min(pair_norms.size, n - filled)
        out.ravel()[filled : filled + take] = pair_norms[:take].astype(out.dtype)
        filled += take
        if take < pair_norms.size:
            # n reached mid-stream; sequential algorithm would have stopped at
            # the same point (it fills at most up to n), so dropping the excess
            # is stream-correct.
            break


def _get_native():
    try:
        from terrain_diffusion_tpu.native import get_native
    except Exception:
        return None
    return get_native()


def fill_standard_normal(seed: int, out: np.ndarray) -> None:
    """Fill `out` (float32/float64) with standard normals from the portable stream."""
    seed = int(seed) & _MASK64
    nat = _get_native()
    if nat is not None and out.dtype == np.float32 and out.flags.c_contiguous:
        nat.fill_standard_normal_f32(seed, out)
        return
    if not out.flags.c_contiguous:
        # ravel() on a non-contiguous array is a COPY — the numpy filler
        # would silently write into a throwaway buffer
        tmp = np.empty(out.shape, dtype=out.dtype)
        _fill_standard_normal_numpy(seed, tmp)
        np.copyto(out, tmp)
        return
    _fill_standard_normal_numpy(seed, out)


def standard_normal(seed: int, size, dtype=np.float32) -> np.ndarray:
    """Portable standard normal array; (seed, size) reproduces across languages."""
    out = np.empty(size, dtype=dtype)
    if out.size == 0:
        return out
    fill_standard_normal(seed, out.reshape(-1))
    return out


def tile_seed(base_seed: int, ty: int, tx: int) -> int:
    """Portable 64-bit seed from (base_seed, tile_y, tile_x).

    Matches reference `world_pipeline.py:58-63` (golden-ratio Weyl hashing).
    """
    h = (int(base_seed) & _MASK64) * 0x9E3779B9
    h = (h + (int(ty) & 0xFFFFFFFF)) & _MASK64
    h = (h * 0x9E3779B9 + (int(tx) & 0xFFFFFFFF)) & _MASK64
    return h
