"""InfiniteTensor: lazy, unbounded, seed-consistent tiled tensors.

The centerpiece of the framework — a ground-up, TPU-first rebuild of the
InfiniteDiffusion runtime the reference consumes as the external
``infinite_tensor`` package (usage: `annotated_infinite_panorama.py:201-226`,
`world_pipeline.py:961-1270`):

- A tensor is defined by a window function ``f`` evaluated on an unbounded
  integer grid of overlapping windows (``TensorWindow`` size/stride/offset).
- Slicing sums overlapping window outputs (weight-channel packing makes the
  sum a lazy MultiDiffusion-style blended average).
- Window outputs are cached in a tile store (RAM LRU or HDF5), keyed by
  (tensor_id, window index) — identical results regardless of query order.

TPU-first design difference vs the reference runtime: evaluation is
**planned, not recursive**.  A slice first walks the dependency DAG and
collects every missing window per tensor (`_collect_needed`), then evaluates
tensors parents-first with windows grouped into padded batches
(`batch_buckets`), so each stage dispatches a few large jitted program calls
instead of per-window host round-trips.  Summation uses a canonical sorted
window order so accumulation is bit-deterministic.

Supported ``f`` conventions:
- unbatched:   ``f(ctx, *arg_regions) -> (C, h, w)`` array
- batched:     ``f(ctx_list, *arg_region_lists) -> list of arrays``
  (reference style, `world_pipeline.py:1149-1172`)
- vectorized:  ``f(ctx_array[B, ndim], *arg_stacks[B, ...]) -> out[B, C, h, w]``
  — the TPU-native convention; the runtime pads B up to the next batch
  bucket so jitted programs compile once per bucket.
"""
from __future__ import annotations

import collections
import functools

import numpy as np

from terrain_diffusion_tpu.runtime.window import TensorWindow
from terrain_diffusion_tpu.runtime.tile_store import MemoryTileStore

_AUTO_ID = 0


class DeviceTileCache:
    """LRU of window outputs kept as device arrays (HBM-resident).

    Sits in front of the host tile store: consumers that can use device
    arrays (`InfiniteTensor.read_device`) assemble without re-uploading,
    cutting the dominant host<->device traffic of the serving loop.  The
    host store stays canonical — eviction only costs a re-upload.

    Entries are (batch_array, row) references into the stage program's
    *whole* batched output, never eagerly-sliced per-window arrays: on a
    remote-device transport every slice would be its own dispatch round
    trip, so slicing is deferred into the jitted assembly program.  A batch
    stays alive until all of its rows are evicted — bounded by
    max_tiles x batch_size window bytes, which for this framework's tile
    sizes is a few tens of MB.
    """

    def __init__(self, max_tiles: int):
        self.max_tiles = max_tiles
        self._data: "collections.OrderedDict[tuple, tuple]" = collections.OrderedDict()

    def get(self, idx):
        ent = self._data.get(tuple(idx))
        if ent is not None:
            self._data.move_to_end(tuple(idx))
        return ent

    def put_batch(self, idxs, batch):
        """Record rows 0..len(idxs)-1 of a device batch (no device ops)."""
        for j, idx in enumerate(idxs):
            k = tuple(idx)
            self._data[k] = (batch, j)
            self._data.move_to_end(k)
        while len(self._data) > self.max_tiles:
            self._data.popitem(last=False)

    def clear(self):
        self._data.clear()


@functools.lru_cache(maxsize=512)
def _device_assemble_fn(spec: tuple, out_shape: tuple, n_batches: int):
    """Jitted scatter-add assembly for a fixed tile geometry.

    spec: per tile, ``(batch_pos, row, ((dst_start, src_start, size) per
    dim))`` — all static, so each distinct (query alignment x cache
    layout) compiles once and is reused; slicing rows out of the stage
    batches happens *inside* the program (single dispatch).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*batches):
        out = jnp.zeros(out_shape, jnp.float32)
        for (bp, row, dims) in spec:
            src = batches[bp][row]
            dst_sl, src_sl = [], []
            for (d0, s0, size) in dims:
                dst_sl.append(slice(d0, d0 + size))
                src_sl.append(slice(s0, s0 + size))
            out = out.at[tuple(dst_sl)].add(src[tuple(src_sl)].astype(jnp.float32))
        return out

    return run


class InfiniteTensor:
    def __init__(
        self,
        shape,
        f,
        output_window: TensorWindow,
        args: tuple = (),
        args_windows: tuple = (),
        batch_size: int = 1,
        tile_store=None,
        tensor_id: str | None = None,
        vectorized: bool = False,
        batch_buckets: tuple | None = None,
        device_cache_tiles: int = 0,
    ):
        global _AUTO_ID
        self.shape = tuple(shape)
        self.f = f
        self.output_window = output_window
        self.args = tuple(args)
        self.args_windows = tuple(args_windows)
        assert len(self.args) == len(self.args_windows)
        self.batch_size = int(batch_size)
        self.vectorized = vectorized
        if batch_buckets is None:
            if batch_size > 1:
                buckets, b = [], 1
                while b < batch_size:
                    buckets.append(b)
                    b *= 2
                buckets.append(batch_size)
                batch_buckets = tuple(buckets)
            else:
                batch_buckets = (1,)
        self.batch_buckets = tuple(sorted(set(int(b) for b in batch_buckets)))
        self.tile_store = tile_store if tile_store is not None else MemoryTileStore()
        if tensor_id is None:
            tensor_id = f"tensor_{_AUTO_ID}"
            _AUTO_ID += 1
        self.tensor_id = tensor_id
        self.ndim = len(self.shape)
        self.device_cache = (DeviceTileCache(device_cache_tiles)
                             if device_cache_tiles > 0 else None)

    # ------------------------------------------------------------------
    # Public API
    # ------------------------------------------------------------------
    def __getitem__(self, key):
        if not isinstance(key, tuple):
            key = (key,)
        assert len(key) == self.ndim, f"need {self.ndim}-d index"
        ranges = []
        for d, k in enumerate(key):
            if isinstance(k, slice):
                start = k.start
                stop = k.stop
                if start is None and stop is None and self.shape[d] is not None:
                    start, stop = 0, self.shape[d]
                assert start is not None and stop is not None, (
                    "unbounded dims need explicit start/stop (coordinates, not "
                    "wrap-around indices)")
                assert k.step in (None, 1)
                ranges.append((int(start), int(stop)))
            else:
                ranges.append((int(k), int(k) + 1))
        return self.read(ranges)

    def read(self, ranges) -> np.ndarray:
        """Assemble the summed window contributions over `ranges`."""
        self.ensure_region(ranges)
        return self._assemble(ranges)

    def clear_cache(self):
        self.tile_store.clear(self.tensor_id)
        if self.device_cache is not None:
            self.device_cache.clear()
        for a in self.args:
            a.clear_cache()

    def read_device(self, ranges):
        """Like read(), but returns a device (jax) array, assembling from the
        device tile cache when every overlapping window is resident — no
        host hop.  Falls back to uploading the host-assembled region."""
        import jax.numpy as jnp

        self.ensure_region(ranges)
        if self.device_cache is not None:
            idxs = sorted(self.output_window.windows_overlapping(ranges))
            entries = [self.device_cache.get(i) for i in idxs]
            if all(e is not None for e in entries):
                batches, batch_pos, spec = [], {}, []
                for (batch, row), idx in zip(entries, idxs):
                    bid = id(batch)
                    if bid not in batch_pos:
                        batch_pos[bid] = len(batches)
                        batches.append(batch)
                    box = self.output_window.box(idx)
                    dims = []
                    for (ws, we), (a, b) in zip(box, ranges):
                        o0, o1 = max(ws, a), min(we, b)
                        dims.append((o0 - a, o0 - ws, o1 - o0))
                    spec.append((batch_pos[bid], row, tuple(dims)))
                out_shape = tuple(b - a for a, b in ranges)
                fn = _device_assemble_fn(tuple(spec), out_shape, len(batches))
                return fn(*batches)
        return jnp.asarray(self._assemble(ranges))

    # ------------------------------------------------------------------
    # Planning
    # ------------------------------------------------------------------
    def ensure_region(self, ranges):
        need: dict[int, set] = {}
        tensors: dict[int, InfiniteTensor] = {}
        idxs = set(self.output_window.windows_overlapping(ranges))
        self._collect_needed(idxs, need, tensors)
        for t in self._topo_order():
            n = need.get(id(t))
            if n:
                t._evaluate_windows(sorted(n))

    def _collect_needed(self, idx_set, need, tensors):
        tensors[id(self)] = self
        mine = need.setdefault(id(self), set())
        new = {
            i for i in idx_set
            if i not in mine and not self.tile_store.contains(self.tensor_id, i)
        }
        if not new:
            return
        mine |= new
        for arg, win in zip(self.args, self.args_windows):
            parent_idxs = set()
            for idx in new:
                box = win.box(idx)
                parent_idxs |= set(arg.output_window.windows_overlapping(box))
            arg._collect_needed(parent_idxs, need, tensors)

    def _topo_order(self):
        """Parents-first order over the dependency DAG."""
        order, seen = [], set()

        def visit(t):
            if id(t) in seen:
                return
            seen.add(id(t))
            for a in t.args:
                visit(a)
            order.append(t)

        visit(self)
        return order

    # ------------------------------------------------------------------
    # Evaluation
    # ------------------------------------------------------------------
    def _arg_region(self, arg_i: int, idx) -> np.ndarray:
        arg = self.args[arg_i]
        win = self.args_windows[arg_i]
        return arg._assemble(win.box(idx))

    def _evaluate_windows(self, idxs):
        max_b = self.batch_buckets[-1]
        for i0 in range(0, len(idxs), max_b):
            chunk = idxs[i0 : i0 + max_b]
            self._evaluate_chunk(chunk)

    def _pick_bucket(self, n: int) -> int:
        for b in self.batch_buckets:
            if b >= n:
                return b
        return self.batch_buckets[-1]

    def _evaluate_chunk(self, chunk):
        arg_lists = [
            [self._arg_region(a, idx) for idx in chunk]
            for a in range(len(self.args))
        ]
        if self.vectorized:
            bucket = self._pick_bucket(len(chunk))
            pad = bucket - len(chunk)
            ctxs = np.asarray(list(chunk) + [chunk[-1]] * pad, dtype=np.int64)
            stacks = [
                np.stack(lst + [lst[-1]] * pad, axis=0) if lst or pad == 0 else
                np.stack([lst[-1]] * pad, axis=0)
                for lst in arg_lists
            ]
            raw = self.f(ctxs, *stacks)
            if self.device_cache is not None and not isinstance(raw, np.ndarray):
                # f returned a device array: keep (batch, row) references
                # resident — zero extra device dispatches here
                self.device_cache.put_batch(chunk, raw)
            outs = np.asarray(raw)
            outs = outs[: len(chunk)]
        elif self.batch_size > 1:
            outs = self.f(list(chunk), *arg_lists)
        else:
            outs = [
                self.f(chunk[j], *[arg_lists[a][j] for a in range(len(self.args))])
                for j in range(len(chunk))
            ]
        results = []
        for idx, out in zip(chunk, outs):
            out = np.asarray(out, dtype=np.float32)
            assert out.shape == tuple(self.output_window.size), (
                f"window fn for {self.tensor_id} returned {out.shape}, "
                f"expected {self.output_window.size}")
            self.tile_store.put(self.tensor_id, idx, out)
            results.append(out)
        return results

    # ------------------------------------------------------------------
    # Assembly
    # ------------------------------------------------------------------
    def _assemble(self, ranges) -> np.ndarray:
        shape = tuple(b - a for a, b in ranges)
        out = np.zeros(shape, dtype=np.float32)
        for idx in sorted(self.output_window.windows_overlapping(ranges)):
            arr = self.tile_store.get(self.tensor_id, idx)
            if arr is None:
                # Evicted (or never planned) — recompute on demand.  The
                # recursive parent reads inside _evaluate_chunk handle their
                # own misses the same way, so correctness holds under any
                # cache budget (a too-small LRU only costs recomputation).
                arr = self._evaluate_chunk([idx])[0]
            box = self.output_window.box(idx)
            src_sl, dst_sl = [], []
            for d, ((ws, we), (a, b)) in enumerate(zip(box, ranges)):
                o0, o1 = max(ws, a), min(we, b)
                src_sl.append(slice(o0 - ws, o1 - ws))
                dst_sl.append(slice(o0 - a, o1 - a))
            out[tuple(dst_sl)] += arr[tuple(src_sl)]
        return out
