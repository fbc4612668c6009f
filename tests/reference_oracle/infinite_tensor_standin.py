"""Faithful minimal stand-in for the external ``infinite_tensor`` package.

The reference pipeline (`/root/reference/terrain_diffusion/inference/
world_pipeline.py:12`) consumes the ``infinite_tensor`` runtime, which is not
installed here.  This module re-implements the exact observable semantics the
reference code relies on (API contract: SURVEY.md §1 "Infinite-tensor
runtime" row; usage: `annotated_infinite_panorama.py:150-226`,
`world_pipeline.py:961-1270`):

- ``TensorWindow(size, stride, offset)``: window ``i`` along dim ``d`` covers
  half-open span ``[offset_d + i*stride_d, offset_d + i*stride_d + size_d)``.
- ``InfiniteTensor(shape, f, output_window, args, args_windows, batch_size,
  tile_store, tensor_id)``: lazy tensor over an unbounded integer grid.
  Reading a region evaluates every window overlapping it (once, cached in
  the tile store keyed by ``(tensor_id, ctx)``) and **sums** overlapping
  window outputs — weight-channel packing in the caller turns the sum into
  a blended average (`annotated_infinite_panorama.py:145-150`).
- ``f`` conventions: unbatched ``f(ctx, *arg_regions)`` when ``batch_size``
  is None (coarse/decoder stages), batched ``f(ctx_list, *arg_region_lists)
  -> list`` otherwise (latent stage, `world_pipeline.py:1149-1172`).
- ``args``/``args_windows``: parent tensors read at the same window index
  through their own TensorWindow geometry before ``f`` runs.
- Slices use *world coordinates* (negative start/stop are positions left of
  the origin, not python wrap-around); ``shape`` dims that are not None are
  finite (window index 0 only in reference usage).

This is a test oracle: correctness over speed, eager recursion, no LRU.
"""
from __future__ import annotations

import itertools

import torch


class TensorWindow:
    def __init__(self, size, stride, offset=None):
        self.size = tuple(int(s) for s in size)
        self.stride = tuple(int(s) for s in stride)
        self.offset = tuple(int(o) for o in (offset or (0,) * len(self.size)))
        assert len(self.size) == len(self.stride) == len(self.offset)

    def span(self, ctx):
        """Half-open world-coordinate span of window index tuple ``ctx``."""
        lo = tuple(o + i * st for o, i, st in zip(self.offset, ctx, self.stride))
        hi = tuple(l + s for l, s in zip(lo, self.size))
        return lo, hi

    def indices_overlapping(self, lo, hi, shape):
        """All window index tuples whose span intersects ``[lo, hi)``.

        For finite dims (shape[d] is not None) indices are clamped to the
        windows that fit inside ``[0, shape[d])``.
        """
        ranges = []
        for d in range(len(self.size)):
            a, b = lo[d], hi[d]
            off, st, sz = self.offset[d], self.stride[d], self.size[d]
            i_min = -((off + sz - 1 - a) // st)     # ceil((a - off - sz + 1)/st)
            i_max = (b - 1 - off) // st             # floor((b - 1 - off)/st)
            if shape[d] is not None:
                n = (shape[d] - sz) // st + 1 if shape[d] >= sz else 1
                i_min = max(i_min, 0)
                i_max = min(i_max, n - 1)
            ranges.append(range(i_min, i_max + 1))
        return itertools.product(*ranges)


class MemoryTileStore:
    """In-RAM window-output cache keyed by (tensor_id, ctx)."""

    def __init__(self, cache_size_bytes=None):
        self.cache_size_bytes = cache_size_bytes  # oracle: no eviction
        self._data = {}

    def get(self, tensor_id, ctx):
        return self._data.get((tensor_id, tuple(ctx)))

    def put(self, tensor_id, ctx, value):
        self._data[(tensor_id, tuple(ctx))] = value

    def clear(self, tensor_id=None):
        if tensor_id is None:
            self._data.clear()
        else:
            self._data = {k: v for k, v in self._data.items()
                          if k[0] != tensor_id}


class HDF5TileStore(MemoryTileStore):
    """The parity tests only exercise caching_strategy='direct'; an HDF5
    store constructed with the reference's kwargs degrades to RAM caching."""

    def __init__(self, file, mode="a", compression=None, compression_opts=None,
                 cache_size_tiles=None):
        super().__init__()
        self.file = file


_AUTO = itertools.count()


class InfiniteTensor:
    def __init__(self, shape, f, output_window, args=(), args_windows=(),
                 batch_size=None, tile_store=None, tensor_id=None):
        self.shape = tuple(shape)
        self.f = f
        self.output_window = output_window
        self.args = tuple(args)
        self.args_windows = tuple(args_windows)
        assert len(self.args) == len(self.args_windows)
        self.batch_size = batch_size
        self.tile_store = tile_store if tile_store is not None else MemoryTileStore()
        self.tensor_id = tensor_id or f"tensor_{next(_AUTO)}"

    # -- window evaluation --------------------------------------------------

    def _arg_regions(self, ctx):
        regions = []
        for arg, win in zip(self.args, self.args_windows):
            lo, hi = win.span(ctx)
            regions.append(arg[tuple(slice(a, b) for a, b in zip(lo, hi))])
        return regions

    def _compute(self, ctx):
        cached = self.tile_store.get(self.tensor_id, ctx)
        if cached is not None:
            return cached
        regions = self._arg_regions(ctx)
        if self.batch_size is not None:
            out = self.f([ctx], *[[r] for r in regions])[0]
        else:
            out = self.f(ctx, *regions)
        out = torch.as_tensor(out).float()
        assert tuple(out.shape) == self.output_window.size, (
            f"{self.tensor_id}: f returned {tuple(out.shape)}, window is "
            f"{self.output_window.size}")
        self.tile_store.put(self.tensor_id, ctx, out)
        return out

    # -- reading ------------------------------------------------------------

    def __getitem__(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)
        assert len(idx) == len(self.shape), "oracle supports full indexing only"
        lo, hi = [], []
        for d, sl in enumerate(idx):
            assert isinstance(sl, slice) and sl.step in (None, 1)
            a = sl.start if sl.start is not None else 0
            b = sl.stop if sl.stop is not None else self.shape[d]
            assert b is not None, "unbounded slice on an infinite dim"
            lo.append(int(a))
            hi.append(int(b))
        out = torch.zeros(tuple(b - a for a, b in zip(lo, hi)))
        for ctx in self.output_window.indices_overlapping(lo, hi, self.shape):
            tile = self._compute(ctx)
            wlo, whi = self.output_window.span(ctx)
            src, dst = [], []
            for d in range(len(lo)):
                s0 = max(lo[d], wlo[d])
                s1 = min(hi[d], whi[d])
                if s1 <= s0:
                    break
                src.append(slice(s0 - wlo[d], s1 - wlo[d]))
                dst.append(slice(s0 - lo[d], s1 - lo[d]))
            else:
                out[tuple(dst)] += tile[tuple(src)]
        return out

    def clear_cache(self):
        self.tile_store.clear(self.tensor_id)
