"""Cross-request coalescing for concurrent serving.

The reference serves strictly sequentially (single-threaded Flask,
`inference/api.py:249`); round 1 of this framework accepted concurrent
clients but serialized whole requests behind one lock, leaving mesh
throughput on the floor.  This module replaces that lock with a single
pipeline-owner thread and a submission queue: handler threads enqueue jobs
and block on their result, while the worker drains the queue and coalesces
all pending terrain queries into ONE `WorldPipeline.get_many` call — the
runtime planner (`InfiniteTensor.ensure_regions`) merges their missing
windows into shared stage batches, so N concurrent tile requests dispatch
the same few large jitted programs one request would (and shard them over
the mesh when `WorldPipeline(mesh=...)` is set).

Concurrency contract: the pipeline (tile stores, stage programs, seed) is
only ever touched by the worker thread, so the single-threaded-pipeline
invariant the tile stores rely on still holds.  Mutating jobs (seed change,
SNR change) run solo, between batches; ordering across *concurrent* clients
is unspecified (as for any concurrent server), while each client's own
request order is preserved by its blocking round trip.
"""
from __future__ import annotations

import queue
import threading


class _Job:
    __slots__ = ("kind", "payload", "event", "result", "error")

    def __init__(self, kind: str, payload):
        self.kind = kind
        self.payload = payload
        self.event = threading.Event()
        self.result = None
        self.error = None

    def finish(self, result=None, error=None):
        self.result = result
        self.error = error
        self.event.set()

    def wait(self):
        self.event.wait()
        if self.error is not None:
            raise self.error
        return self.result


class RequestCoalescer:
    """Single pipeline-owner worker with cross-request terrain batching.

    - ``get_terrain(i1, j1, i2, j2, with_climate)`` blocks the calling
      thread until its tile is composed; concurrent calls coalesce.
    - ``run(fn)`` submits an arbitrary pipeline-mutating callable
      ``fn(world) -> result`` executed solo on the worker thread (seed
      changes, custom conditioning, stats reads).
    - ``max_batch`` caps how many terrain queries coalesce per pass
      (the planner still chunks stage batches to the pipeline's buckets;
      this only bounds composition latency for the first client).
    """

    def __init__(self, world, max_batch: int = 16):
        self.world = world
        self.max_batch = int(max_batch)
        self._queue: "queue.Queue[_Job]" = queue.Queue()
        self._closed = False
        self._lifecycle = threading.Lock()  # serializes submit vs close
        self._thread = threading.Thread(
            target=self._loop, name="pipeline-coalescer", daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------
    # Client surface (any thread)
    # ------------------------------------------------------------------
    def get_terrain(self, i1: int, j1: int, i2: int, j2: int,
                    with_climate: bool = True, pack_wire: bool = False) -> dict:
        job = _Job("terrain", ((int(i1), int(j1), int(i2), int(j2)),
                               bool(with_climate), bool(pack_wire)))
        self._submit(job)
        return job.wait()

    def run(self, fn):
        """Execute ``fn(world)`` solo on the worker thread; returns its
        result (exceptions re-raised in the caller)."""
        job = _Job("call", fn)
        self._submit(job)
        return job.wait()

    def _submit(self, job):
        # the check and the put must be atomic wrt close(): a job enqueued
        # after the stop job would never be drained and its wait() would
        # hang the handler thread forever
        with self._lifecycle:
            if self._closed:
                raise RuntimeError("RequestCoalescer is closed")
            self._queue.put(job)

    def close(self):
        with self._lifecycle:
            if self._closed:
                return
            self._closed = True
            self._queue.put(_Job("stop", None))
        self._thread.join(timeout=5)

    # ------------------------------------------------------------------
    # Worker (owns the pipeline)
    # ------------------------------------------------------------------
    def _loop(self):
        while True:
            job = self._queue.get()
            batch = [job]
            # Drain whatever else is already queued (no waiting): jobs that
            # arrived while the previous batch was generating coalesce now.
            while len(batch) < self.max_batch:
                try:
                    batch.append(self._queue.get_nowait())
                except queue.Empty:
                    break
            if self._process(batch):  # a stop job was drained
                return

    def _process(self, batch) -> bool:
        """Run one drained batch; returns True when a stop job was seen
        (AFTER serving every other job drained alongside it — they were
        submitted before close())."""
        stop = False
        terrain_jobs = []
        # Mutating jobs first, in arrival order, each solo …
        for job in batch:
            if job.kind == "terrain":
                terrain_jobs.append(job)
                continue
            if job.kind == "stop":
                stop = True
                job.finish()
                continue
            try:
                job.finish(result=job.payload(self.world))
            except Exception as e:  # noqa: BLE001 — reraised in the caller
                job.finish(error=e)
        if not terrain_jobs:
            return stop
        # … then all terrain queries as one coalesced generation pass.
        # with_climate=True superset-plans for mixed batches (harmless).
        queries = [j.payload[0] for j in terrain_jobs]
        any_climate = any(j.payload[1] for j in terrain_jobs)
        try:
            self.world.prefetch(queries, with_climate=any_climate)
        except Exception as e:  # noqa: BLE001
            for j in terrain_jobs:
                j.finish(error=e)
            return stop
        for j in terrain_jobs:
            (i1, j1_, i2, j2), with_climate, pack_wire = j.payload
            try:
                j.finish(result=self.world.get(i1, j1_, i2, j2,
                                               with_climate=with_climate,
                                               pack_wire=pack_wire))
            except Exception as e:  # noqa: BLE001
                j.finish(error=e)
        return stop


class CoalescedPipeline:
    """Thread-safe WorldPipeline facade for concurrent servers.

    ``get()`` coalesces with other in-flight requests; known mutators
    (seed/SNR/conditioning/cache) run solo on the worker thread; everything
    else proxies read-only to the underlying pipeline.  Drop-in for the
    serving handlers — they keep calling the WorldPipeline surface.
    """

    _MUTATORS = ("change_seed", "set_cond_snr", "set_custom_conditioning_import",
                 "rebuild", "empty_cache", "warmup", "prefetch")

    def __init__(self, world, max_batch: int = 16):
        self._world = world
        self._coalescer = RequestCoalescer(world, max_batch=max_batch)

    def get(self, i1, j1, i2, j2, with_climate: bool = True,
            pack_wire: bool = False) -> dict:
        return self._coalescer.get_terrain(i1, j1, i2, j2, with_climate,
                                           pack_wire)

    def get_many(self, queries, with_climate: bool = True,
                 pack_wire: bool = False) -> list:
        return self._coalescer.run(
            lambda w: w.get_many(queries, with_climate=with_climate,
                                 pack_wire=pack_wire))

    def close(self):
        self._coalescer.close()
        self._world.close()

    def __getattr__(self, name):
        if name in self._MUTATORS:
            method = getattr(self._world, name)

            def solo(*args, **kwargs):
                return self._coalescer.run(lambda _w: method(*args, **kwargs))

            return solo
        return getattr(self._world, name)
