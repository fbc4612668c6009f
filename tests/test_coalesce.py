"""Cross-request coalescing: worker batching semantics (fake world) and the
CoalescedPipeline facade's thread-safety/ordering contract.

The generation-side win (N concurrent queries -> shared stage batches) is
covered on the real pipeline by
tests/test_pipeline.py::test_get_many_coalesces_and_matches_sequential.
"""
import threading
import time

import numpy as np

from terrain_diffusion_tpu.serving.coalesce import CoalescedPipeline, RequestCoalescer


class FakeWorld:
    """Records every pipeline touch with the calling thread; slow prefetch
    so concurrent submissions pile up behind the first batch."""

    def __init__(self, prefetch_s: float = 0.05):
        self.seed = 42
        self.tile_store = object()  # api._get_pipeline checks bind state
        self.prefetch_s = prefetch_s
        self.prefetch_batches = []
        self.get_calls = []
        self.touch_threads = set()
        self.closed = False

    def prefetch(self, queries, with_climate=True):
        self.touch_threads.add(threading.current_thread().name)
        self.prefetch_batches.append(list(queries))
        time.sleep(self.prefetch_s)

    def get_many(self, queries, with_climate=True, pack_wire=False):
        self.prefetch(queries, with_climate)
        return [self.get(*q, with_climate=with_climate, pack_wire=pack_wire)
                for q in queries]

    def get(self, i1, j1, i2, j2, with_climate=True, pack_wire=False):
        self.touch_threads.add(threading.current_thread().name)
        self.get_calls.append((i1, j1, i2, j2, pack_wire))
        elev = np.full((i2 - i1, j2 - j1), float(i1 * 1000 + j1), np.float32)
        if pack_wire:
            elev = elev.astype(np.int16)
        return {"elev": elev,
                "climate": np.zeros((5, i2 - i1, j2 - j1),
                                    np.float16 if pack_wire else np.float32)
                if with_climate else None}

    def change_seed(self, seed=None):
        self.touch_threads.add(threading.current_thread().name)
        if seed == self.seed:
            return False
        self.seed = seed
        return True

    def close(self):
        self.closed = True


def test_concurrent_requests_coalesce_into_shared_batches():
    world = FakeWorld(prefetch_s=0.2)
    c = RequestCoalescer(world, max_batch=16)
    results = {}

    def client(k):
        results[k] = c.get_terrain(k, 0, k + 8, 8)

    threads = [threading.Thread(target=client, args=(k,)) for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    c.close()

    # every client got its own tile
    for k in range(4):
        assert results[k]["elev"][0, 0] == k * 1000
    # the worker drained the queue: strictly fewer generation passes than
    # requests, and at least one pass served >= 2 queries
    assert len(world.prefetch_batches) < 4, world.prefetch_batches
    assert max(len(b) for b in world.prefetch_batches) >= 2
    # the pipeline was only ever touched by the single worker thread
    assert world.touch_threads == {"pipeline-coalescer"}


def test_mutators_run_solo_on_worker_thread():
    world = FakeWorld(prefetch_s=0.0)
    p = CoalescedPipeline(world)
    assert p.seed == 42
    assert p.change_seed(7) is True
    assert p.seed == 7
    assert p.change_seed(7) is False
    out = p.get(0, 0, 4, 4)
    assert out["elev"].shape == (4, 4)
    outs = p.get_many([(0, 0, 4, 4), (8, 0, 12, 4)])
    assert len(outs) == 2 and outs[1]["elev"][0, 0] == 8000
    assert world.touch_threads == {"pipeline-coalescer"}
    p.close()
    assert world.closed


def test_errors_propagate_to_the_caller():
    world = FakeWorld()

    def boom(w):
        raise ValueError("nope")

    c = RequestCoalescer(world)
    try:
        c.run(boom)
        raised = False
    except ValueError as e:
        raised = str(e) == "nope"
    assert raised
    # terrain errors too: when BOTH the coalesced get_many and the
    # per-job fallback fail, the caller sees the error
    world.prefetch = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("gen"))
    world.get = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("gen"))
    try:
        c.get_terrain(0, 0, 4, 4)
        raised = False
    except RuntimeError as e:
        raised = str(e) == "gen"
    assert raised
    c.close()


def test_get_many_failure_falls_back_per_job():
    """A get_many failure must not fail the whole batch: jobs are retried
    individually so one bad query cannot poison its batchmates."""
    world = FakeWorld(prefetch_s=0.0)
    world.get_many = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("gm"))
    c = RequestCoalescer(world)
    out = c.get_terrain(3, 0, 7, 4)
    assert out["elev"][0, 0] == 3000.0  # served via the per-job fallback
    c.close()


def test_per_request_seed_is_atomic():
    """?seed=X requests generate under seed X even when other clients
    change the seed concurrently — seed rides inside the terrain job."""
    world = FakeWorld(prefetch_s=0.05)
    seeds_at_get = []
    orig_get = world.get

    def record_get(*a, **k):
        seeds_at_get.append(world.seed)
        return orig_get(*a, **k)

    world.get = record_get
    c = RequestCoalescer(world)
    results = {}

    def client(k, seed):
        results[k] = c.get_terrain(k, 0, k + 4, 4, seed=seed)

    threads = [threading.Thread(target=client, args=(k, 100 + k))
               for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    c.close()
    # each get ran under ITS requested seed (order across seeds is free)
    assert sorted(seeds_at_get) == [100, 101, 102, 103], seeds_at_get


def test_multi_box_job_served_under_one_seed():
    world = FakeWorld(prefetch_s=0.0)
    c = RequestCoalescer(world)
    outs = c.get_terrain_boxes([(0, 0, 4, 4), (4, 0, 8, 4)], seed=7)
    assert len(outs) == 2 and world.seed == 7
    c.close()


def test_api_threaded_mode_uses_coalesced_pipeline():
    from terrain_diffusion_tpu.serving import api

    world = FakeWorld()
    api.configure(pipeline=world, coalesce=True)
    p = api._get_pipeline()
    assert isinstance(p, CoalescedPipeline)
    assert p.seed == 42
    out = p.get(0, 0, 4, 4)
    assert out["elev"].shape == (4, 4)
    api.configure()  # reset module state for other tests


def test_close_races_with_inflight_jobs():
    """A stop job drained into the same batch as terrain jobs must not be
    executed as a callable; drained jobs still complete, the worker exits,
    and post-close submissions fail fast instead of hanging."""
    world = FakeWorld(prefetch_s=0.15)
    c = RequestCoalescer(world, max_batch=16)
    results, errors = {}, {}

    def client(k):
        try:
            results[k] = c.get_terrain(k, 0, k + 4, 4)
        except Exception as e:  # noqa: BLE001
            errors[k] = e

    threads = [threading.Thread(target=client, args=(k,)) for k in range(3)]
    for t in threads:
        t.start()
    time.sleep(0.02)  # first batch in flight; remaining jobs queued
    c.close()
    for t in threads:
        t.join(timeout=10)
    # every pre-close job completed (none hang, none crashed the worker)
    assert len(results) == 3 and not errors
    assert not c._thread.is_alive()
    try:
        c.get_terrain(0, 0, 4, 4)
        raised = False
    except RuntimeError:
        raised = True
    assert raised, "post-close submission must fail fast"


def test_mc_api_threaded_mode_uses_coalesced_pipeline():
    from terrain_diffusion_tpu.serving import minecraft_api as mc

    world = FakeWorld()
    world.native_resolution = 90.0
    mc.configure(pipeline=world, coalesce=True)
    p = mc._get_pipeline()
    assert isinstance(p, CoalescedPipeline)
    assert p.native_resolution == 90.0  # attr proxying for handler use
    out = p.get(0, 0, 4, 4)
    assert out["elev"].shape == (4, 4)
    mc.configure()


def test_pack_wire_flows_through_facade():
    """serving/api.py requests pack_wire=True at scale 1; the coalescer
    must forward it to the underlying pipeline (regression: TypeError in
    --threaded mode)."""
    world = FakeWorld(prefetch_s=0.0)
    p = CoalescedPipeline(world)
    out = p.get(0, 0, 4, 4, pack_wire=True)
    assert out["elev"].dtype == np.int16
    assert world.get_calls[-1][-1] is True
    out = p.get_many([(0, 0, 4, 4)], pack_wire=True)
    assert out[0]["elev"].dtype == np.int16
    p.close()
