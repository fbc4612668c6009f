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
                seed: int = 0, with_climate: bool = False) -> dict:
    rng = np.random.default_rng(seed)
    ttft, ttst = [], []
    # warmup: compile all programs once (excluded from timing)
    world.get(0, 0, tile, tile, with_climate=with_climate)
    for run in range(n_runs):
        ci = int(rng.integers(-20, 20)) * separation
        cj = int(rng.integers(-20, 20)) * separation
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
            "tile": tile, "n_runs": n_runs,
            "memory": device_memory_stats()}


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
def main(model_path, runs, tile, batch_size, seed, dtype, with_climate,
         onestep_latent, t_steps):
    """Measure TTFT/TTST tile latency on the current device."""
    from terrain_diffusion_tpu.pipeline.world import WorldPipeline

    batch_sizes = ([int(x) for x in batch_size.split(",")] if "," in batch_size
                   else int(batch_size))
    world = WorldPipeline.from_pretrained(
        model_path, seed=seed, latents_batch_size=batch_sizes,
        dtype=None if dtype == "fp32" else dtype, T=t_steps,
        onestep_latent=onestep_latent)
    world.bind()
    out = run_latency(world, n_runs=runs, tile=tile, seed=seed,
                      with_climate=with_climate)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
