"""TTFT/TTST latency benchmark — the reference's speed-metric harness
(`evaluation/latency.py:19-176`): time-to-first-tile and
time-to-adjacent-second-tile over N runs at random far-apart locations,
cold cache each run; reports mean/std/p5/p50/p95 + device memory stats.
"""
from __future__ import annotations

import json
import time

import click
import numpy as np


def run_latency(world, n_runs: int = 10, tile: int = 512, separation: int = 200 * 256,
                seed: int = 0, with_climate: bool = False,
                grid_aligned: bool = False) -> dict:
    """grid_aligned snaps every query to tile multiples (the reference's
    `--grid-aligned` ablation, `evaluation/latency.py:66-71`: aligned
    queries reuse the same decoder-grid phase; unaligned ones exercise the
    general path)."""
    rng = np.random.default_rng(seed)
    ttft, ttst = [], []
    # warmup: compile all programs once (excluded from timing).  Unaligned
    # runs also pre-warm one off-grid alignment so the first measured query
    # isn't a compile.
    world.get(0, 0, tile, tile, with_climate=with_climate)
    if not grid_aligned:
        off = tile // 2 + 1
        world.get(off, off, off + tile, off + tile, with_climate=with_climate)
    for run in range(n_runs):
        ci = int(rng.integers(-20, 20)) * separation
        cj = int(rng.integers(-20, 20)) * separation
        if not grid_aligned:
            ci += int(rng.integers(0, tile))
            cj += int(rng.integers(0, tile))
        world.empty_cache()
        t0 = time.perf_counter()
        world.get(ci, cj, ci + tile, cj + tile, with_climate=with_climate)
        ttft.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        world.get(ci + tile, cj, ci + 2 * tile, cj + tile, with_climate=with_climate)
        ttst.append(time.perf_counter() - t0)

    def stats(xs):
        xs = np.asarray(xs)
        return {"mean": float(xs.mean()), "std": float(xs.std()),
                "p5": float(np.percentile(xs, 5)),
                "p50": float(np.percentile(xs, 50)),
                "p95": float(np.percentile(xs, 95))}

    return {"ttft": stats(ttft), "ttst": stats(ttst),
            "tile": tile, "n_runs": n_runs, "grid_aligned": grid_aligned,
            "memory": device_memory_stats()}


def run_http_benchmark(pipeline, *, concurrency_levels=(1, 4, 8),
                       requests_per_client: int = 8, tile: int = 512,
                       coalesce: bool = True,
                       host: str = "127.0.0.1") -> dict:
    """Requests/s through the FULL HTTP serving stack at several client
    concurrencies: `serving/api.py` endpoints (binary wire format) on the
    first-party threaded WSGI server, with concurrent tile requests
    coalesced into shared stage batches when `coalesce=True`.

    The reference's server is single-threaded Flask (`api.py:249`), so
    every concurrency level >1 here measures capability it cannot express;
    level 1 is the like-for-like comparison point.

    Per level: each client streams `requests_per_client` adjacent `tile`
    boxes at its own far-away location (steady serving regime); the first
    request per client is untimed warmup for its region.  Returns
    requests/s + per-request p50 per level.
    """
    import threading
    import urllib.request

    from terrain_diffusion_tpu.serving import api as api_mod

    api_mod.configure(pipeline=pipeline, coalesce=coalesce)
    # the PRODUCTION server plumbing (serving/httpd.py), not a re-implementation:
    # threaded accept; handlers run concurrently only when the coalescer
    # makes the pipeline thread-safe, else serialized
    httpd, _mode = api_mod.app.make_server(
        host, 0, quiet=True, threaded=True, serialize=not coalesce)
    port = httpd.server_address[1]
    server_thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    server_thread.start()

    def fetch(i1, j1):
        url = (f"http://{host}:{port}/terrain?i1={i1}&j1={j1}"
               f"&i2={i1 + tile}&j2={j1 + tile}")
        with urllib.request.urlopen(url, timeout=600) as r:
            data = r.read()
            h = int(r.headers["X-Height"])
            w = int(r.headers["X-Width"])
        expect = h * w * 2 + h * w * 16  # int16 elev + 4-ch f32 climate
        if len(data) != expect or h != tile or w != tile:
            raise AssertionError(
                f"bad payload: {len(data)} bytes ({expect} expected), "
                f"{h}x{w}")
        return len(data)

    results: dict = {"tile": tile, "requests_per_client": requests_per_client,
                     "coalesce": coalesce, "levels": {}}
    try:
        # global warmup: compile the serving programs once
        fetch(0, 0)
        sep = 500 * tile
        for level_idx, c in enumerate(concurrency_levels):
            bases = [((level_idx * 64 + k + 7) * sep, (k + 3) * sep)
                     for k in range(c)]
            for bi, bj in bases:  # per-region warmup (untimed)
                fetch(bi, bj)
            lat: list = []
            errors: list = []

            def client(bi, bj):
                try:
                    for r in range(1, requests_per_client + 1):
                        t0 = time.perf_counter()
                        fetch(bi + r * tile, bj)
                        lat.append(time.perf_counter() - t0)
                except Exception as e:  # surfaced after join
                    errors.append(e)

            threads = [threading.Thread(target=client, args=b) for b in bases]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            if errors:
                raise errors[0]
            n = c * requests_per_client
            results["levels"][str(c)] = {
                "clients": c,
                "requests": n,
                "wall_s": round(wall, 3),
                "requests_per_sec": round(n / wall, 3),
                "latency_p50_s": round(float(np.percentile(lat, 50)), 4),
            }
    finally:
        httpd.shutdown()
        httpd.server_close()
        server_thread.join(timeout=10)
    return results


def device_memory_stats() -> dict:
    """Peak/current HBM use of device 0 (reference reports peak VRAM via
    `torch.cuda.max_memory_allocated`, `evaluation/latency.py:104-106`).
    Not every PJRT backend implements memory_stats; absent keys are omitted."""
    import jax

    dev = jax.local_devices()[0]
    try:
        raw = dev.memory_stats() or {}
    except Exception:
        return {"available": False, "platform": dev.platform}
    out = {"available": True, "platform": dev.platform}
    for key, name in [("bytes_in_use", "bytes_in_use"),
                      ("peak_bytes_in_use", "peak_bytes_in_use"),
                      ("bytes_limit", "bytes_limit"),
                      ("largest_alloc_size", "largest_alloc_size")]:
        if key in raw:
            out[name] = int(raw[key])
    return out


@click.command()
@click.argument("model_path")
@click.option("--runs", type=int, default=10)
@click.option("--tile", type=int, default=512)
@click.option("--batch-size", default="1,2,4,8,16")
@click.option("--seed", type=int, default=0)
@click.option("--dtype", type=click.Choice(["fp32", "bf16", "fp16"]), default="bf16")
@click.option("--with-climate/--no-climate", default=False)
@click.option("--onestep-latent", is_flag=True, default=False)
@click.option("--t", "t_steps", type=int, default=2)
@click.option("--decoder-tile-size", type=int, default=512,
              help="decoder window size in px (reference decoder_tile_size)")
@click.option("--decoder-tile-stride", type=int, default=384,
              help="decoder window stride in px (reference "
                   "decoder_tile_stride; < size means overlap blending)")
@click.option("--max-batch-size", type=int, default=None,
              help="power-of-2 cap: use batch buckets [1, 2, ..., N] "
                   "(reference max_batch_size; overrides --batch-size)")
@click.option("--http", "http_mode", is_flag=True, default=False,
              help="Also measure requests/s through the HTTP serving stack "
                   "at 1/4/8 concurrent clients (threaded WSGI + coalescer).")
@click.option("--http-requests", type=int, default=8,
              help="Requests per client per concurrency level (--http).")
@click.option("--grid-aligned", is_flag=True, default=False,
              help="snap query boxes to tile multiples (reference ablation)")
def main(model_path, runs, tile, batch_size, seed, dtype, with_climate,
         onestep_latent, t_steps, decoder_tile_size, decoder_tile_stride,
         max_batch_size, http_mode, http_requests, grid_aligned):
    """Measure TTFT/TTST tile latency on the current device."""
    from terrain_diffusion_tpu.pipeline.world import WorldPipeline

    if max_batch_size is not None:
        assert max_batch_size & (max_batch_size - 1) == 0, \
            "--max-batch-size must be a power of 2"
        batch_sizes = [1 << i for i in range(max_batch_size.bit_length())]
    else:
        batch_sizes = ([int(x) for x in batch_size.split(",")]
                       if "," in batch_size else int(batch_size))
    world = WorldPipeline.from_pretrained(
        model_path, seed=seed, latents_batch_size=batch_sizes,
        dtype=None if dtype == "fp32" else dtype, T=t_steps,
        onestep_latent=onestep_latent,
        decoder_tile_size=decoder_tile_size,
        decoder_tile_stride=decoder_tile_stride)
    world.bind()
    out = run_latency(world, n_runs=runs, tile=tile, seed=seed,
                      with_climate=with_climate, grid_aligned=grid_aligned)
    if http_mode:
        out["http"] = run_http_benchmark(
            world, tile=tile, requests_per_client=http_requests)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
