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


class DeviceTileAtlas:
    """Fixed-capacity HBM pool of window outputs ("tile atlas").

    Sits in front of the host tile store: consumers that can use device
    arrays (`InfiniteTensor.read_device`, chained-stage input assembly)
    read straight from HBM, cutting the dominant host<->device traffic of
    the serving loop.

    Design constraint: assembly programs must NOT bake cache history into
    their compiled form, or every query pattern triggers a fresh XLA
    compile.  So tiles live at *slots* of one preallocated (capacity, C,
    h, w) device array, and programs take the slot indices as **traced**
    int32 inputs — only the window/query geometry (a small, repeating set)
    is static.  Stage batches are scattered into the pool with a single
    jitted write per chunk; eviction is LRU slot reuse (the host store —
    or recomputation — stays canonical).
    """

    # per-atlas HBM budget for on-demand growth (see grow_to)
    DEFAULT_MAX_BYTES = 1 << 30

    def __init__(self, capacity: int, max_bytes: int | None = None):
        self.capacity = int(capacity)
        self.max_bytes = int(max_bytes or self.DEFAULT_MAX_BYTES)
        self._atlas = None  # lazy: (capacity, *window_shape) f32 on device
        self._slots: "collections.OrderedDict[tuple, int]" = collections.OrderedDict()
        self._free: list | None = None

    def _ensure(self, row_shape):
        import jax
        import jax.numpy as jnp

        if self._atlas is None:
            # Commit the pool to ONE device.  Left uncommitted, the first
            # write with a mesh-sharded stage batch makes XLA silently
            # replicate the whole pool onto every mesh device (N x HBM for
            # one cache); committed, mesh batches reshard to the pool's
            # device on write (see put_batch) and per-device memory stays
            # flat as the mesh grows.
            # local_devices()[0], not devices()[0]: on a multi-host mesh
            # the global device list starts with host 0's devices, which
            # other processes cannot commit arrays to
            self._atlas = jax.device_put(
                jnp.zeros((self.capacity, *row_shape), jnp.float32),
                jax.local_devices()[0])
            self._free = list(range(self.capacity - 1, -1, -1))

    def grow_to(self, n_tiles: int, row_shape: tuple | None = None) -> int:
        """Grow the pool so >= n_tiles windows fit simultaneously (within
        the max_bytes budget); returns the resulting capacity.

        A coalesced multi-query plan can need more windows live at once
        than the configured capacity — without growth, planned parent
        windows are LRU-evicted before their consumer stage runs and every
        miss recomputes one window at a time (a ~15x slowdown observed on
        16-tile serving rows).  Growth is one `concatenate` dispatch;
        existing slot assignments stay valid.
        """
        import jax.numpy as jnp

        if n_tiles <= self.capacity:
            return self.capacity
        new_cap = _next_pow2(n_tiles)
        shape = self._atlas.shape[1:] if self._atlas is not None else row_shape
        if shape is not None:
            row_bytes = 4 * int(np.prod(shape))
            new_cap = min(new_cap, max(self.max_bytes // row_bytes, 1))
            if new_cap <= self.capacity:
                return self.capacity
        if self._atlas is not None:
            pad = jnp.zeros((new_cap - self.capacity, *self._atlas.shape[1:]),
                            jnp.float32)
            self._atlas = jnp.concatenate([self._atlas, pad], axis=0)
            self._free = (list(range(new_cap - 1, self.capacity - 1, -1))
                          + (self._free or []))
        self.capacity = new_cap
        return self.capacity

    def slot(self, idx):
        st = self._slots.get(tuple(idx))
        if st is not None:
            self._slots.move_to_end(tuple(idx))
        return st

    def reserve(self, idxs, row_shape) -> np.ndarray:
        """Assign (LRU-evicting) slots for `idxs` without writing — the
        fused-program path scatters into them inside the stage dispatch.

        If len(idxs) exceeds the capacity, slots wrap (early idxs evict
        within the batch): only the surviving tail stays mapped, which is
        safe for the host-store-backed paths (misses recompute/reload) but
        NOT for the fused path — its caller checks capacity first."""
        self._ensure(tuple(row_shape))
        slots = []
        for idx in idxs:
            k = tuple(idx)
            st = self._slots.pop(k, None)
            if st is None:
                st = self._free.pop() if self._free else self._slots.popitem(last=False)[1]
            self._slots[k] = st
            slots.append(st)
        return np.asarray(slots, np.int32)

    def put_batch(self, idxs, batch):
        """Scatter a stage batch into the pool — one device dispatch,
        compiled once per (atlas, bucket) shape pair.

        Rows past len(idxs) (bucket padding) MUST be duplicates of row
        len(idxs)-1 — the caller pads contexts by repeating the last one,
        so the stage program recomputes the same window there.  Those rows
        are aimed at the last real slot; duplicate scatter indices have an
        unspecified winner, which is fine exactly because the candidate
        values are identical.  Baking len(idxs) into the program instead
        would mint one remote compile per chunk length."""
        slots = self.reserve(idxs, tuple(batch.shape[1:]))
        padded = np.empty((batch.shape[0],), np.int32)
        n = len(idxs)
        padded[:n] = slots
        padded[n:] = slots[n - 1]
        if getattr(batch, "sharding", None) is not None and \
                batch.sharding != self._atlas.sharding:
            # mesh-sharded stage output: gather it to the pool's device
            # instead of letting jit replicate the pool across the mesh
            import jax

            batch = jax.device_put(batch, self._atlas.sharding)
        fn = _atlas_write_fn(self._atlas.shape, tuple(batch.shape))
        self._atlas = fn(self._atlas, padded, batch)

    def fetch_rows(self, slots) -> np.ndarray:
        """Device-gather the given slots and download them in ONE transfer
        (host materialization path)."""
        k = _next_pow2(len(slots))
        padded = np.zeros((k,), np.int32)
        padded[: len(slots)] = slots
        out = _atlas_gather_fn(self._atlas.shape, k)(self._atlas, padded)
        return np.asarray(out)[: len(slots)]

    def clear(self):
        self._slots.clear()
        if self._atlas is not None:
            self._free = list(range(self.capacity - 1, -1, -1))

    def __len__(self):
        return len(self._slots)


@functools.lru_cache(maxsize=256)
def _atlas_write_fn(atlas_shape: tuple, batch_shape: tuple):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(atlas, slots, batch):
        return atlas.at[slots].set(batch.astype(jnp.float32))

    return run


@functools.lru_cache(maxsize=64)
def _atlas_gather_fn(atlas_shape: tuple, k: int):
    import jax

    @jax.jit
    def run(atlas, slots):
        return atlas[slots]

    return run


def _next_pow2(n: int) -> int:
    k = 1
    while k < n:
        k *= 2
    return k


def assemble_from_atlas(atlas, slots, offs, valid, region_shape: tuple):
    """Traced-geometry window assembly, usable INSIDE any jitted program.

    Sums up to K atlas tiles into each of B regions ((B, K)-shaped slots /
    (B, K, 2) offsets / (B, K) validity, all traced data — ONE compiled
    program serves every query alignment).  Each region is assembled on a
    canvas padded by one tile size per side; every tile is added with a
    fixed-size dynamic-slice read-modify-write at its traced offset, then
    the canvas center is cropped (partial overlaps fall out of the crop).
    Summation order is the caller's slot order (sorted window index), so
    accumulation stays bit-deterministic.
    """
    import jax
    import jax.numpy as jnp

    C, th, tw = atlas.shape[1:]
    rc, rh, rw = region_shape
    assert rc == C, (atlas.shape, region_shape)
    K = slots.shape[1]

    def one(slots_k, offs_k, valid_k):
        canvas = jnp.zeros((C, rh + 2 * th, rw + 2 * tw), jnp.float32)

        def body(i, cv):
            tile = atlas[slots_k[i]] * valid_k[i]
            oy = offs_k[i, 0] + th
            ox = offs_k[i, 1] + tw
            cur = jax.lax.dynamic_slice(cv, (0, oy, ox), (C, th, tw))
            return jax.lax.dynamic_update_slice(cv, cur + tile, (0, oy, ox))

        canvas = jax.lax.fori_loop(0, K, body, canvas)
        return canvas[:, th : th + rh, tw : tw + rw]

    return jax.vmap(one)(slots, offs, valid)


@functools.lru_cache(maxsize=128)
def _traced_assemble_fn(B: int, K: int, tile_shape: tuple, region_shape: tuple):
    """Standalone jitted wrapper around `assemble_from_atlas` (host-initiated
    assembly: read_device / parent-region stacking on the unfused path).

    The earlier design baked per-window (dst, src, size) specs into the
    HLO, which forced a remote XLA compile for every previously-unseen
    alignment and dominated cold-query latency on remote-compile backends.
    """
    import jax

    @jax.jit
    def run(atlas, slots, offs, valid):
        return assemble_from_atlas(atlas, slots, offs, valid, region_shape)

    return run


def _static_k(window: TensorWindow, box) -> int:
    """Compile-stable K: an analytic upper bound on how many windows can
    overlap a region of this SHAPE at any alignment, pow2-padded.  Keeping K
    a pure function of the region shape (never of the actual overlap count)
    stops every new query alignment from minting a fresh program variant —
    on remote-compile backends those variants dominated cold latency.  The
    extra loop iterations add masked zero tiles (negligible vs the model)."""
    k = 1
    for (a, b), t, s in zip(box[1:], window.size[1:], window.stride[1:]):
        k *= -((b - a + t) // -s)  # ceil((R + T) / S)
    return _next_pow2(k)


def _traced_geometry(window: TensorWindow, boxes, slot_of):
    """(slots, offs, valid, K) arrays for _traced_assemble_fn, or None if any
    needed window lacks a device slot.  Boxes must share one shape and span
    the full channel range of the window (true for all stage geometries)."""
    per_box = []
    k_max = 1
    for box in boxes:
        idxs = sorted(window.windows_overlapping(box))
        entries = []
        for idx in idxs:
            st = slot_of(idx)
            if st is None:
                return None
            wbox = window.box(idx)
            if wbox[0] != box[0]:
                return None  # partial channel coverage: host path
            entries.append((st, wbox[1][0] - box[1][0], wbox[2][0] - box[2][0]))
        per_box.append(entries)
        k_max = max(k_max, len(entries))
    K = _static_k(window, boxes[0])
    assert k_max <= K, (k_max, K)
    B = len(boxes)
    slots = np.zeros((B, K), np.int32)
    offs = np.zeros((B, K, 2), np.int32)
    valid = np.zeros((B, K), np.float32)
    for b, entries in enumerate(per_box):
        for k, (st, oy, ox) in enumerate(entries):
            slots[b, k] = st
            offs[b, k, 0] = oy
            offs[b, k, 1] = ox
            valid[b, k] = 1.0
    return slots, offs, valid, K


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
        defer_host: bool = False,
        f_fused=None,
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
        self.device_cache = (DeviceTileAtlas(device_cache_tiles)
                             if device_cache_tiles > 0 else None)
        # defer_host: don't download window batches into the host store at
        # evaluation time — host copies materialize lazily (`_host_tile`)
        # only when a host read actually needs them.  Only sound with a
        # non-persistent store (an evicted never-downloaded tile is simply
        # recomputed); callers gate this on the in-memory caching strategy.
        self.defer_host = bool(defer_host) and self.device_cache is not None
        # f_fused(ctxs, out_atlas, out_slots, arg_views) -> new out_atlas:
        # ONE dispatch doing parent-window assembly + stage compute + atlas
        # scatter (arg_views are (atlas, slots, offs, valid) per arg, all
        # traced data).  Used when every parent window is device-resident
        # and host copies are deferred; otherwise the unfused path runs.
        self.f_fused = f_fused if self.defer_host else None

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
            geo = _traced_geometry(self.output_window, [tuple(ranges)],
                                   self.device_cache.slot)
            if geo is not None:
                slots, offs, valid, K = geo
                out_shape = tuple(b - a for a, b in ranges)
                fn = _traced_assemble_fn(1, K, tuple(self.output_window.size),
                                         out_shape)
                return fn(self.device_cache._atlas, slots, offs, valid)[0]
        return jnp.asarray(self._assemble(ranges))

    # ------------------------------------------------------------------
    # Planning
    # ------------------------------------------------------------------
    def ensure_region(self, ranges):
        self.ensure_regions([ranges])

    def ensure_regions(self, ranges_list):
        """Plan + evaluate every window needed by ALL of `ranges_list` in one
        pass: missing windows across the regions merge into shared stage
        batches (the cross-request coalescing primitive — N concurrent tile
        queries dispatch the same few large programs one query would)."""
        ensure_regions_multi([(self, ranges_list)])

    def _contains(self, idx) -> bool:
        """A window is available if the host store has it OR a device-cache
        reference exists (deferred-download mode)."""
        if self.tile_store.contains(self.tensor_id, idx):
            return True
        return self.device_cache is not None and self.device_cache.slot(idx) is not None

    def _collect_needed(self, idx_set, need, tensors, touched=None):
        tensors[id(self)] = self
        mine = need.setdefault(id(self), set())
        if touched is not None:
            touched.setdefault(id(self), set()).update(idx_set)
        new = {
            i for i in idx_set
            if i not in mine and not self._contains(i)
        }
        if not new:
            return
        mine |= new
        for arg, win in zip(self.args, self.args_windows):
            parent_idxs = set()
            for idx in new:
                box = win.box(idx)
                parent_idxs |= set(arg.output_window.windows_overlapping(box))
            arg._collect_needed(parent_idxs, need, tensors, touched)

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
        if self.device_cache is not None:
            # a chunk larger than the atlas would wrap slots WITHIN one
            # put_batch scatter — duplicate scatter indices have
            # unspecified winners, so a still-mapped window could hold
            # another window's rows.  Split instead (reachable when mesh
            # bucket scaling exceeds the per-tensor atlas capacity)
            max_b = min(max_b, self.device_cache.capacity)
        for i0 in range(0, len(idxs), max_b):
            chunk = idxs[i0 : i0 + max_b]
            self._evaluate_chunk(chunk)

    def _pick_bucket(self, n: int) -> int:
        for b in self.batch_buckets:
            if b >= n:
                return b
        return self.batch_buckets[-1]

    def _evaluate_fused(self, chunk) -> bool:
        """One-dispatch evaluation: assemble parent regions from their
        atlases, run the stage core, and scatter outputs into this tensor's
        atlas — all inside self.f_fused.  Returns False (caller falls back)
        unless every parent window of the chunk is device-resident."""
        if len(chunk) > self.device_cache.capacity:
            # in-batch LRU wrap-around would alias slots the fused scatter
            # then treats as distinct — run the staged path instead
            return False
        bucket = self._pick_bucket(len(chunk))
        pad = bucket - len(chunk)
        padded = list(chunk) + [chunk[-1]] * pad
        arg_views = []
        for a, win in zip(self.args, self.args_windows):
            if a.device_cache is None:
                return False
            boxes = [win.box(idx) for idx in padded]
            geo = _traced_geometry(a.output_window, boxes, a.device_cache.slot)
            if geo is None:
                return False
            slots, offs, valid, _K = geo
            arg_views.append((a.device_cache._atlas, slots, offs, valid))
        ctxs = np.asarray(padded, dtype=np.int64)
        out_slots = self.device_cache.reserve(
            chunk, tuple(self.output_window.size))
        # padded rows re-write the last real row's slot with the same value
        out_slots = np.concatenate(
            [out_slots, np.repeat(out_slots[-1:], pad)]).astype(np.int32)
        self.device_cache._atlas = self.f_fused(
            ctxs, self.device_cache._atlas, out_slots, arg_views)
        return True

    def _ensure_parent_windows(self, chunk):
        """Batch-evaluate every missing parent window of `chunk` (bucketed
        dispatches) instead of letting per-window `_host_tile` misses
        recompute them one at a time during assembly."""
        for a, win in zip(self.args, self.args_windows):
            needed = set()
            for idx in chunk:
                needed |= set(a.output_window.windows_overlapping(win.box(idx)))
            missing = sorted(i for i in needed if not a._contains(i))
            if missing:
                a._evaluate_windows(missing)

    def _evaluate_chunk(self, chunk):
        if self.f_fused is not None and self._evaluate_fused(chunk):
            return
        if self.args:
            # planned parents may have been LRU-evicted (or this is an
            # unplanned on-demand evaluation): restore them in batches,
            # then give the one-dispatch fused path a second chance
            self._ensure_parent_windows(chunk)
            if self.f_fused is not None and self._evaluate_fused(chunk):
                return
        if self.vectorized:
            bucket = self._pick_bucket(len(chunk))
            pad = bucket - len(chunk)
            ctxs = np.asarray(list(chunk) + [chunk[-1]] * pad, dtype=np.int64)
            stacks = []
            for a in range(len(self.args)):
                win = self.args_windows[a]
                boxes = [win.box(idx) for idx in chunk] + [win.box(chunk[-1])] * pad
                dev = self.args[a]._assemble_stack_device(boxes)
                if dev is not None:
                    # parent regions assembled in HBM — the child program
                    # consumes them without a host round trip
                    stacks.append(dev)
                else:
                    stacks.append(np.stack(
                        [self.args[a]._assemble(b) for b in boxes], axis=0))
            raw = self.f(ctxs, *stacks)
            if self.device_cache is not None and not isinstance(raw, np.ndarray):
                # f returned a device array: keep (batch, row) references
                # resident — zero extra device dispatches here
                self.device_cache.put_batch(chunk, raw)
                if self.defer_host:
                    return
            outs = np.asarray(raw)
            outs = outs[: len(chunk)]
        else:
            arg_lists = [
                [self._arg_region(a, idx) for idx in chunk]
                for a in range(len(self.args))
            ]
            if self.batch_size > 1:
                outs = self.f(list(chunk), *arg_lists)
            else:
                outs = [
                    self.f(chunk[j], *[arg_lists[a][j] for a in range(len(self.args))])
                    for j in range(len(chunk))
                ]
        for idx, out in zip(chunk, outs):
            out = np.asarray(out, dtype=np.float32)
            assert out.shape == tuple(self.output_window.size), (
                f"window fn for {self.tensor_id} returned {out.shape}, "
                f"expected {self.output_window.size}")
            self.tile_store.put(self.tensor_id, idx, out)

    def _host_tile(self, idx, _retry: bool = True) -> np.ndarray:
        """Host copy of one window: host store, else download from the
        device cache (amortized — sibling rows of the same stage batch are
        stored too), else recompute."""
        arr = self.tile_store.get(self.tensor_id, idx)
        if arr is not None:
            return arr
        if self.device_cache is not None:
            st = self.device_cache.slot(idx)
            if st is not None:
                arr = np.ascontiguousarray(self.device_cache.fetch_rows([st])[0])
                self.tile_store.put(self.tensor_id, idx, arr)
                return arr
        if not _retry:
            raise RuntimeError(
                f"window {idx} of {self.tensor_id} unavailable after recompute")
        # Evicted (or never planned) — recompute on demand.  The recursive
        # parent reads inside _evaluate_chunk handle their own misses the
        # same way, so correctness holds under any cache budget (a
        # too-small LRU only costs recomputation).
        self._evaluate_chunk([idx])
        return self._host_tile(idx, _retry=False)

    def _assemble_stack_device(self, boxes):
        """Assemble len(boxes) regions from device-resident windows and
        stack them on device (single dispatch, traced geometry — no
        per-alignment recompiles).  Returns None unless every overlapping
        window of every box is resident."""
        if self.device_cache is None:
            return None
        geo = _traced_geometry(self.output_window, boxes,
                               self.device_cache.slot)
        if geo is None:
            return None
        slots, offs, valid, K = geo
        region_shape = tuple(b - a for a, b in boxes[0])
        fn = _traced_assemble_fn(len(boxes), K,
                                 tuple(self.output_window.size), region_shape)
        return fn(self.device_cache._atlas, slots, offs, valid)

    # ------------------------------------------------------------------
    # Assembly
    # ------------------------------------------------------------------
    def _assemble(self, ranges) -> np.ndarray:
        shape = tuple(b - a for a, b in ranges)
        out = np.zeros(shape, dtype=np.float32)
        idxs = sorted(self.output_window.windows_overlapping(ranges))
        if self.device_cache is not None:
            # one gather + one download for every device-resident miss
            pairs = [(i, self.device_cache.slot(i)) for i in idxs
                     if not self.tile_store.contains(self.tensor_id, i)]
            pairs = [(i, st) for i, st in pairs if st is not None]
            if pairs:
                rows = self.device_cache.fetch_rows([st for _, st in pairs])
                for (i, _), r in zip(pairs, rows):
                    self.tile_store.put(self.tensor_id, i,
                                        np.ascontiguousarray(r))
        for idx in idxs:
            arr = self._host_tile(idx)
            box = self.output_window.box(idx)
            src_sl, dst_sl = [], []
            for d, ((ws, we), (a, b)) in enumerate(zip(box, ranges)):
                o0, o1 = max(ws, a), min(we, b)
                src_sl.append(slice(o0 - ws, o1 - ws))
                dst_sl.append(slice(o0 - a, o1 - a))
            out[tuple(dst_sl)] += arr[tuple(src_sl)]
        return out


def ensure_regions_multi(requests):
    """Plan + evaluate every window needed by ALL `(tensor, ranges_list)`
    requests in ONE coalesced pass over the shared dependency DAG.

    A sequence of per-tensor `ensure_regions` calls plans each root
    separately, so a window one root needs only directly (e.g. the latent
    regions the output composition reads) lands in its own late, padded
    dispatch after the stage that also consumes that tensor as a parent has
    already run.  Merging the roots folds those windows into the same stage
    batches (measured on the steady serving row: the trailing
    `step_latent_map` dispatches of 12/9 windows per 3-row period disappear
    into the main batches — see BENCH_NOTES round 5)."""
    need: dict[int, set] = {}
    tensors: dict[int, InfiniteTensor] = {}
    touched: dict[int, set] = {}
    roots = []
    for tensor, ranges_list in requests:
        idxs = set()
        for ranges in ranges_list:
            idxs |= set(tensor.output_window.windows_overlapping(ranges))
        tensor._collect_needed(idxs, need, tensors, touched)
        roots.append(tensor)
    order, seen = [], set()

    def visit(t):
        if id(t) in seen:
            return
        seen.add(id(t))
        for a in t.args:
            visit(a)
        order.append(t)

    for r in roots:
        visit(r)
    for t in order:
        # size the HBM pool to this plan's simultaneous working set —
        # otherwise planned windows are evicted before their consumer
        # stage runs and every miss recomputes one window at a time
        tt = touched.get(id(t))
        if tt and t.device_cache is not None:
            t.device_cache.grow_to(len(tt) + 8,
                                   tuple(t.output_window.size))
        n = need.get(id(t))
        if n:
            t._evaluate_windows(sorted(n))
