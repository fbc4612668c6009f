"""InfiniteTensor runtime: window algebra, order-invariance, batching,
dependency DAG planning, tile stores."""
import numpy as np
import pytest

from terrain_diffusion_tpu.runtime import (
    InfiniteTensor,
    MemoryTileStore,
    HDF5TileStore,
    TensorWindow,
)
from terrain_diffusion_tpu.ops.noise_field import gaussian_noise_patch
from terrain_diffusion_tpu.ops.windows import linear_weight_window, normalize_weighted


def test_window_algebra():
    w = TensorWindow(size=(7, 64, 64), stride=(7, 48, 48))
    assert w.box((0, 0, 0)) == ((0, 7), (0, 64), (0, 64))
    assert w.box((0, -1, 2)) == ((0, 7), (-48, 16), (96, 160))
    # windows overlapping a region
    idxs = list(w.windows_overlapping([(0, 7), (0, 64), (0, 64)]))
    ij = {(i, j) for _, i, j in idxs}
    # windows at stride 48 covering [0,64): i=-1 ([-48,16)), i=0, i=1 ([48,112))
    assert ij == {(a, b) for a in (-1, 0, 1) for b in (-1, 0, 1)}


def test_window_offset():
    w = TensorWindow(size=(7, 4, 4), stride=(7, 1, 1), offset=(0, -1, -1))
    assert w.box((0, 3, 5)) == ((0, 7), (2, 6), (4, 8))


def _noise_window_tensor(store, tile=32, stride=24, channels=2, seed=5):
    """Simple leaf tensor: weighted noise + weight channel."""
    wwin = linear_weight_window(tile)

    def f(ctx):
        _, i, j = ctx
        vals = gaussian_noise_patch(seed, i * stride, j * stride, tile, tile,
                                    channels=channels, tile_h=tile, tile_w=tile)
        return np.concatenate([vals * wwin[None], wwin[None]], axis=0)

    return InfiniteTensor(
        shape=(channels + 1, None, None), f=f,
        output_window=TensorWindow((channels + 1, tile, tile), (channels + 1, stride, stride)),
        tile_store=store, tensor_id="leaf")


def test_order_invariance():
    """Any slice order / partition yields identical pixels — the O(1) random
    access contract."""
    s1 = MemoryTileStore()
    t1 = _noise_window_tensor(s1)
    whole = t1[:, -30:50, -10:70]

    s2 = MemoryTileStore()
    t2 = _noise_window_tensor(s2)
    # read in scrambled small pieces first
    for y0, x0 in [(13, 37), (-30, -10), (40, 60), (0, 0)]:
        t2[:, y0 : y0 + 5, x0 : x0 + 5]
    whole2 = t2[:, -30:50, -10:70]
    np.testing.assert_array_equal(whole, whole2)

    # piecewise assembly equals whole
    top = t2[:, -30:10, -10:70]
    bot = t2[:, 10:50, -10:70]
    np.testing.assert_array_equal(np.concatenate([top, bot], axis=1), whole)


def test_weight_blending_average():
    """Blended constant field stays constant after weight normalization."""
    tile, stride = 16, 8
    wwin = linear_weight_window(tile)

    def f(ctx):
        vals = np.full((1, tile, tile), 3.25, dtype=np.float32)
        return np.concatenate([vals * wwin[None], wwin[None]], axis=0)

    t = InfiniteTensor((2, None, None), f,
                       TensorWindow((2, tile, tile), (2, stride, stride)))
    region = t[:, 0:40, 0:40]
    vals = normalize_weighted(region)
    np.testing.assert_allclose(vals, 3.25, rtol=1e-5)


def test_chained_tensors_and_planner():
    """Two-stage chain: child reads parent regions with a different stride;
    planner computes parents first; results independent of access pattern."""
    store = MemoryTileStore()
    parent = _noise_window_tensor(store)

    calls = {"n": 0}

    def child_f(ctx, parent_region):
        calls["n"] += 1
        _, i, j = ctx
        vals = normalize_weighted(parent_region)[:1] * 2.0
        w = np.ones((1, 16, 16), dtype=np.float32)
        return np.concatenate([vals * w, w], axis=0)

    child = InfiniteTensor(
        (2, None, None), child_f,
        TensorWindow((2, 16, 16), (2, 16, 16)),
        args=(parent,), args_windows=(TensorWindow((3, 16, 16), (3, 16, 16)),),
        tile_store=store, tensor_id="child")

    out = child[:, 0:32, 0:32]
    assert calls["n"] == 4  # 2x2 non-overlapping child windows
    out2 = child[:, 0:32, 0:32]
    assert calls["n"] == 4  # fully cached
    np.testing.assert_array_equal(out, out2)
    # child values = 2x blended parent channel 0
    parent_vals = normalize_weighted(parent[:, 0:32, 0:32])[:1]
    np.testing.assert_allclose(normalize_weighted(out), parent_vals * 2, rtol=1e-5)


def test_batched_convention():
    got_batches = []

    def f(ctxs, regions):
        got_batches.append(len(ctxs))
        return [np.full((1, 8, 8), float(ctx[1] * 10 + ctx[2]), dtype=np.float32)
                for ctx in ctxs]

    parent = _noise_window_tensor(MemoryTileStore(), tile=8, stride=8)
    t = InfiniteTensor((1, None, None), f,
                       TensorWindow((1, 8, 8), (1, 8, 8)),
                       args=(parent,), args_windows=(TensorWindow((3, 8, 8), (3, 8, 8)),),
                       batch_size=4, tensor_id="batched")
    out = t[:, 0:24, 0:24]  # 9 windows -> batches of <= 4
    assert sum(got_batches) == 9
    assert max(got_batches) <= 4
    np.testing.assert_allclose(out[0, 0, 0], 0.0)
    np.testing.assert_allclose(out[0, 20, 20], 22.0)


def test_vectorized_convention_with_bucket_padding():
    shapes_seen = []

    def f(ctxs, regions):
        shapes_seen.append((ctxs.shape[0], regions.shape))
        vals = ctxs[:, 1] * 10 + ctxs[:, 2]
        return np.broadcast_to(
            vals[:, None, None, None].astype(np.float32), (len(ctxs), 1, 8, 8))

    parent = _noise_window_tensor(MemoryTileStore(), tile=8, stride=8)
    t = InfiniteTensor((1, None, None), f,
                       TensorWindow((1, 8, 8), (1, 8, 8)),
                       args=(parent,), args_windows=(TensorWindow((3, 8, 8), (3, 8, 8)),),
                       batch_size=4, vectorized=True, batch_buckets=(1, 2, 4),
                       tensor_id="vec")
    out = t[:, 0:24, 0:24]  # 9 windows: chunks 4, 4, 1
    bs = [s[0] for s in shapes_seen]
    assert bs == [4, 4, 1]
    assert all(s[1] == (b, 3, 8, 8) for b, s in zip(bs, shapes_seen))
    np.testing.assert_allclose(out[0, 20, 20], 22.0)


def test_hdf5_tile_store_persistence(tmp_path):
    path = str(tmp_path / "world.h5")
    store = HDF5TileStore(path)
    t = _noise_window_tensor(store)
    a = t[:, 0:40, 0:40]
    store.set_params({"seed": 5})
    store.close()

    store2 = HDF5TileStore(path)
    assert store2.get_params() == {"seed": 5}
    calls = {"n": 0}
    t2 = _noise_window_tensor(store2)
    orig_f = t2.f

    def counting_f(ctx):
        calls["n"] += 1
        return orig_f(ctx)

    t2.f = counting_f
    b = t2[:, 0:40, 0:40]
    assert calls["n"] == 0  # fully served from the persistent store
    np.testing.assert_array_equal(a, b)
    store2.close()


def test_memory_store_lru_eviction():
    store = MemoryTileStore(cache_size_bytes=3 * 3 * 32 * 32 * 4)  # ~3 tiles
    t = _noise_window_tensor(store)
    t[:, 0:96, 0:96]
    assert len(store._data) <= 4
    # evicted tiles recompute identically
    a = t[:, 0:10, 0:10]
    b = t[:, 0:10, 0:10]
    np.testing.assert_array_equal(a, b)


def test_device_tile_cache_read_device():
    """read_device assembles from HBM-resident tiles and matches host reads
    bit-for-bit; eviction falls back to upload."""
    import jax.numpy as jnp

    tile, stride, ch = 16, 8, 2

    def f_vec(ctxs, ):
        vals = np.stack([
            gaussian_noise_patch(5, int(c[1]) * stride, int(c[2]) * stride,
                                 tile, tile, channels=ch, tile_h=tile, tile_w=tile)
            for c in ctxs])
        w = linear_weight_window(tile)
        out = np.concatenate([vals * w[None, None], np.broadcast_to(
            w, (len(ctxs), 1, tile, tile))], axis=1)
        return jnp.asarray(out)  # device array -> populates the device cache

    t = InfiniteTensor((ch + 1, None, None), f_vec,
                       TensorWindow((ch + 1, tile, tile), (ch + 1, stride, stride)),
                       batch_size=4, vectorized=True, batch_buckets=(1, 2, 4),
                       device_cache_tiles=64)
    host = t[:, -10:30, -10:30]
    assert len(t.device_cache) > 0
    dev = np.asarray(t.read_device([(0, ch + 1), (-10, 30), (-10, 30)]))
    np.testing.assert_allclose(dev, host, rtol=1e-6, atol=1e-6)

    # tiny cache: eviction path still correct via host fallback
    t2 = InfiniteTensor((ch + 1, None, None), f_vec,
                        TensorWindow((ch + 1, tile, tile), (ch + 1, stride, stride)),
                        batch_size=4, vectorized=True, batch_buckets=(1, 2, 4),
                        device_cache_tiles=1)
    host2 = t2[:, 0:40, 0:40]
    dev2 = np.asarray(t2.read_device([(0, ch + 1), (0, 40), (0, 40)]))
    np.testing.assert_allclose(dev2, host2, rtol=1e-6, atol=1e-6)

    t.clear_cache()
    assert len(t.device_cache) == 0


def test_deferred_host_chain_device_arg_stacks():
    """defer_host: child stages consume parent regions assembled on device;
    host reads materialize lazily and match the eager path bit-for-bit."""
    import jax.numpy as jnp

    tile, stride = 16, 8

    def make_chain(defer):
        def leaf_f(ctxs):
            vals = np.stack([
                gaussian_noise_patch(9, int(c[1]) * stride, int(c[2]) * stride,
                                     tile, tile, channels=2, tile_h=tile, tile_w=tile)
                for c in ctxs])
            w = linear_weight_window(tile)
            return jnp.asarray(np.concatenate(
                [vals * w[None, None], np.broadcast_to(w, (len(ctxs), 1, tile, tile))],
                axis=1))

        leaf = InfiniteTensor((3, None, None), leaf_f,
                              TensorWindow((3, tile, tile), (3, stride, stride)),
                              batch_size=4, vectorized=True, batch_buckets=(1, 2, 4),
                              device_cache_tiles=64, defer_host=defer)

        host_stacks = {"n": 0}

        def child_f(ctxs, regions):
            if isinstance(regions, np.ndarray):
                host_stacks["n"] += 1
            r = jnp.asarray(regions)
            vals = (r[:, :2] / r[:, 2:3]) * 0.5
            w = jnp.asarray(linear_weight_window(tile))
            return jnp.concatenate(
                [vals * w[None, None],
                 jnp.broadcast_to(w, (len(ctxs), 1, tile, tile))], axis=1)

        child = InfiniteTensor((3, None, None), child_f,
                               TensorWindow((3, tile, tile), (3, stride, stride)),
                               args=(leaf,),
                               args_windows=(TensorWindow((3, tile, tile), (3, stride, stride)),),
                               batch_size=4, vectorized=True, batch_buckets=(1, 2, 4),
                               device_cache_tiles=64, defer_host=defer)
        return leaf, child, host_stacks

    leaf_d, child_d, hs_d = make_chain(True)
    out_d = child_d[:, -5:30, -5:30]
    assert hs_d["n"] == 0, "deferred chain fed the child from the host"
    # leaf host store stayed empty until... child read went device-side;
    # a host read of the leaf must still work (lazy materialization)
    leaf_host = leaf_d[:, 0:20, 0:20]

    leaf_e, child_e, hs_e = make_chain(False)
    out_e = child_e[:, -5:30, -5:30]
    np.testing.assert_allclose(out_d, out_e, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(leaf_host, leaf_e[:, 0:20, 0:20], rtol=1e-6, atol=1e-6)


def test_atlas_grow_to_preserves_rows():
    """grow_to enlarges the HBM pool in place: existing slot assignments and
    row contents survive, new capacity obeys the byte budget."""
    from terrain_diffusion_tpu.runtime.infinite_tensor import DeviceTileAtlas

    at = DeviceTileAtlas(4)
    rows = np.arange(4 * 2 * 3 * 3, dtype=np.float32).reshape(4, 2, 3, 3)
    at.put_batch([(0, 0, k) for k in range(4)], rows)
    assert at.grow_to(10) == 16
    assert at.capacity == 16
    # rows written before growth are still addressable
    slots = [at.slot((0, 0, k)) for k in range(4)]
    got = at.fetch_rows(slots)
    np.testing.assert_array_equal(got, rows)
    # and new slots are usable
    at.put_batch([(1, 0, 0)], rows[:1] + 100)
    np.testing.assert_array_equal(at.fetch_rows([at.slot((1, 0, 0))])[0],
                                  rows[0] + 100)
    # byte budget clamps growth (row = 2*3*3*4 = 72 bytes)
    small = DeviceTileAtlas(2, max_bytes=72 * 5)
    small.put_batch([(0, 0, 0)], rows[:1])
    assert small.grow_to(100) == 5


def test_plan_grows_atlas_instead_of_thrashing():
    """A coalesced plan whose working set exceeds the configured atlas
    capacity must grow the pool (and batch any recomputes) — never fall
    back to one-window-at-a-time evaluation (the round-3 16-tile-row
    pathology: 289 single-window dispatches)."""
    import jax.numpy as jnp

    tile, stride = 16, 8

    def make_chain(cap):
        def leaf_f(ctxs):
            vals = np.stack([
                gaussian_noise_patch(9, int(c[1]) * stride, int(c[2]) * stride,
                                     tile, tile, channels=2, tile_h=tile,
                                     tile_w=tile)
                for c in ctxs])
            w = linear_weight_window(tile)
            return jnp.asarray(np.concatenate(
                [vals * w[None, None],
                 np.broadcast_to(w, (len(ctxs), 1, tile, tile))], axis=1))

        leaf = InfiniteTensor((3, None, None), leaf_f,
                              TensorWindow((3, tile, tile), (3, stride, stride)),
                              batch_size=4, vectorized=True,
                              batch_buckets=(1, 2, 4),
                              device_cache_tiles=cap, defer_host=True)

        def child_f(ctxs, regions):
            r = jnp.asarray(regions)
            vals = (r[:, :2] / r[:, 2:3]) * 0.5
            w = jnp.asarray(linear_weight_window(tile))
            return jnp.concatenate(
                [vals * w[None, None],
                 jnp.broadcast_to(w, (len(ctxs), 1, tile, tile))], axis=1)

        child = InfiniteTensor(
            (3, None, None), child_f,
            TensorWindow((3, tile, tile), (3, stride, stride)),
            args=(leaf,),
            args_windows=(TensorWindow((3, tile, tile), (3, stride, stride)),),
            batch_size=4, vectorized=True, batch_buckets=(1, 2, 4),
            device_cache_tiles=cap, defer_host=True)
        return leaf, child

    calls = []
    orig = InfiniteTensor._evaluate_chunk

    def patched(self, chunk):
        calls.append(len(chunk))
        return orig(self, chunk)

    leaf, child = make_chain(cap=4)  # far below the plan's working set
    region = [(0, 3), (0, 200), (0, 200)]  # ~625 leaf windows
    import unittest.mock as mock
    with mock.patch.object(InfiniteTensor, "_evaluate_chunk", patched):
        child.ensure_regions([region])
    assert calls, "plan evaluated nothing"
    assert 1 not in calls, (
        f"planner degraded to single-window evaluations: {calls}")
    assert leaf.device_cache.capacity > 4  # pool grew to the working set

    # results identical to a comfortably-sized chain
    _, child_big = make_chain(cap=2048)
    np.testing.assert_allclose(np.asarray(child[tuple(slice(a, b) for a, b in region)]),
                               np.asarray(child_big[tuple(slice(a, b) for a, b in region)]),
                               rtol=1e-6, atol=1e-6)


def test_atlas_stays_single_device_under_mesh_writes():
    """A mesh-sharded stage batch written into the pool must NOT replicate
    the pool across the mesh (round 5: an uncommitted atlas was silently
    replicated N-fold by the first sharded write — N x HBM for one cache).
    The batch reshards to the pool's device instead."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from terrain_diffusion_tpu.parallel.mesh import make_mesh
    from terrain_diffusion_tpu.runtime.infinite_tensor import DeviceTileAtlas

    n = jax.device_count()
    assert n >= 2, "virtual mesh required (conftest sets 8 CPU devices)"
    mesh = make_mesh(n)
    at = DeviceTileAtlas(16)
    batch = jax.device_put(
        jnp.arange(n * 12, dtype=jnp.float32).reshape(n, 3, 4),
        NamedSharding(mesh, P("data")))
    at.put_batch([(0, i, 0) for i in range(n)], batch)

    arr = at._atlas
    assert len(arr.sharding.device_set) == 1, (
        f"atlas replicated across {len(arr.sharding.device_set)} devices")
    # round-trip correctness through the single-device pool
    slots = [at.slot((0, i, 0)) for i in range(n)]
    got = at.fetch_rows(slots)
    import numpy as np
    np.testing.assert_array_equal(
        got, np.arange(n * 12, dtype=np.float32).reshape(n, 3, 4))


def test_ensure_regions_multi_merges_roots():
    """A multi-root plan folds windows one root reads directly into the
    SAME parent-stage evaluation pass another root triggers (mirrors
    WorldPipeline.prefetch: compose-read latent regions vs the residual
    stage's latent parents), with results identical to sequential
    per-root ensure_regions."""
    from terrain_diffusion_tpu.runtime.infinite_tensor import (
        ensure_regions_multi)

    def build():
        store = MemoryTileStore()
        parent = _noise_window_tensor(store)

        def child_f(ctx, parent_region):
            vals = normalize_weighted(parent_region)[:1] * 2.0
            w = np.ones((1, 16, 16), dtype=np.float32)
            return np.concatenate([vals * w, w], axis=0)

        child = InfiniteTensor(
            (2, None, None), child_f,
            TensorWindow((2, 16, 16), (2, 16, 16)),
            args=(parent,),
            args_windows=(TensorWindow((3, 16, 16), (3, 16, 16)),),
            tile_store=store, tensor_id="child")
        return parent, child

    def spy(tensor, log):
        orig = tensor._evaluate_windows
        tensor._evaluate_windows = lambda idxs: (log.append(list(idxs)),
                                                 orig(idxs))[1]

    child_box = [(0, 2), (0, 32), (0, 32)]
    parent_box = [(0, 3), (0, 96), (0, 96)]  # needs windows beyond child's

    # sequential per-root plans: the parent evaluates in TWO passes
    p1, c1 = build()
    seq_log = []
    spy(p1, seq_log)
    c1.ensure_regions([child_box])
    p1.ensure_regions([parent_box])
    assert len(seq_log) == 2 and seq_log[1]  # late second parent pass

    # merged plan: ONE parent pass covering the union
    p2, c2 = build()
    multi_log = []
    spy(p2, multi_log)
    ensure_regions_multi([(c2, [child_box]), (p2, [parent_box])])
    assert len(multi_log) == 1
    assert sorted(multi_log[0]) == sorted(set(seq_log[0]) | set(seq_log[1]))

    np.testing.assert_array_equal(c1[:, 0:32, 0:32], c2[:, 0:32, 0:32])
    np.testing.assert_array_equal(p1[:, 0:96, 0:96], p2[:, 0:96, 0:96])
