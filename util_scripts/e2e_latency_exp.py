"""E2E fresh-tile latency experiment on the real chip (production widths).

Measures TTFT/TTST through WorldPipeline.get() with random weights, plus
per-stage dispatch counts — the driver-facing e2e numbers that BENCH_NOTES
tracks.  Usage:  python util_scripts/e2e_latency_exp.py [bucket_max]
"""
import json
import os
import sys
import time

os.environ.setdefault("TD_E2E", "1")

import jax
import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
jax.config.update("jax_compilation_cache_dir", os.path.join(_HERE, ".cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig
from terrain_diffusion_tpu.pipeline.world import WorldPipeline


def production_models(key=None):
    key = key or jax.random.key(7)
    k1, k2, k3 = jax.random.split(key, 3)
    coarse = EDMUnet2D(EDMUnetConfig(
        image_size=16, in_channels=11, out_channels=6, model_channels=128,
        model_channel_mults=(1,), layers_per_block=2, attn_resolutions=(),
        midblock_attention=False, concat_balance=0.5,
        conditional_inputs=tuple(("float", 64, 0.2) for _ in range(5)),
        fourier_scale="pos"))
    base = EDMUnet2D(EDMUnetConfig(
        image_size=512, in_channels=5, out_channels=5, model_channels=192,
        model_channel_mults=(1, 2, 3, 4), layers_per_block=3,
        attn_resolutions=(8, 16), midblock_attention=True, concat_balance=0.5,
        conditional_inputs=(("tensor", 58, 1.0),), fourier_scale="pos"))
    decoder = EDMUnet2D(EDMUnetConfig(
        image_size=512, in_channels=5, out_channels=1, model_channels=64,
        model_channel_mults=(1, 2, 3, 4), layers_per_block=3,
        attn_resolutions=(), midblock_attention=False, concat_balance=0.5,
        conditional_inputs=(), fourier_scale="pos"))
    return ((coarse, jax.jit(coarse.init)(k1)),
            (base, jax.jit(base.init)(k2)),
            (decoder, jax.jit(decoder.init)(k3)))


def main():
    bucket_max = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    buckets = [1]
    while buckets[-1] < bucket_max:
        buckets.append(buckets[-1] * 2)
    print(f"== buckets up to {bucket_max}: {buckets}", flush=True)

    t0 = time.perf_counter()
    models = production_models()
    print(f"model init: {time.perf_counter()-t0:.1f}s", flush=True)

    pipe = WorldPipeline(seed=1234, latents_batch_size=buckets,
                         dtype="bf16").set_models(*models)
    pipe.bind()

    results = {"bucket_max": bucket_max}
    t0 = time.perf_counter()
    pipe.get(0, 0, 512, 512)
    results["warmup_s"] = round(time.perf_counter() - t0, 2)
    print(f"warmup (incl. compiles): {results['warmup_s']}s", flush=True)

    # TTST: walk right along a row — steady-state fresh-tile cost
    ts = []
    for k in range(1, 5):
        t0 = time.perf_counter()
        pipe.get(0, k * 512, 512, (k + 1) * 512)
        ts.append(time.perf_counter() - t0)
        print(f"adjacent tile {k}: {ts[-1]:.2f}s", flush=True)
    results["ttst_mean_s"] = round(float(np.mean(ts)), 3)
    results["ttst_all"] = [round(t, 3) for t in ts]

    # TTFT: far-away fresh tile (all stages cold in that region)
    ttft = []
    for k, far in enumerate([300_000, -500_000, 900_000]):
        t0 = time.perf_counter()
        pipe.get(far, far, far + 512, far + 512)
        ttft.append(time.perf_counter() - t0)
        print(f"far tile {k}: {ttft[-1]:.2f}s", flush=True)
    results["ttft_mean_s"] = round(float(np.mean(ttft)), 3)
    results["ttft_all"] = [round(t, 3) for t in ttft]

    # coalescing: 4 fresh tiles sequentially vs one get_many pass
    base = 2_000_000
    t0 = time.perf_counter()
    for k in range(4):
        pipe.get(base, base + k * 512, base + 512, base + (k + 1) * 512)
    results["seq4_s"] = round(time.perf_counter() - t0, 3)
    base = 3_000_000
    t0 = time.perf_counter()
    pipe.get_many([(base, base + k * 512, base + 512, base + (k + 1) * 512)
                   for k in range(4)])
    results["coalesced4_s"] = round(time.perf_counter() - t0, 3)
    print(f"4 fresh tiles: sequential {results['seq4_s']}s vs "
          f"coalesced {results['coalesced4_s']}s", flush=True)
    results["stage_timings"] = pipe.timing_summary()

    print(json.dumps(results, indent=2), flush=True)
    out = os.path.join(_HERE, f".cache/e2e_exp_b{bucket_max}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
