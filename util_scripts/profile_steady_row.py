"""Profile the steady-state serving row on hardware: attribute the gap
between the analytic steady-state model (~25.8 device tiles/s) and the
measured e2e_steady_device_tiles_per_sec (~22.3) to host-side phases.

Mirrors bench.py's e2e stage setup exactly (production widths, random
weights, bf16, 512px row, stride-384 decoder grid), then times several
adjacent steady rows with per-stage `_timed` accounting reset between
rows.  On the remote ("axon") backend `_timed` captures host-side
planning+dispatch wall time (dispatch returns before compute), so the
summary separates python planning / dispatch overhead from device-bound
blocking.

Usage:  timeout 900 python util_scripts/profile_steady_row.py
NOTE: never run concurrently with the CPU-mesh test suite (BENCH_NOTES:
host contention starves the dispatch loop).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

os.makedirs(".cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(".cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig
from terrain_diffusion_tpu.pipeline.world import WorldPipeline

key = jax.random.key(7)
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
models = ((coarse, jax.jit(coarse.init)(k1)),
          (base, jax.jit(base.init)(k2)),
          (decoder, jax.jit(decoder.init)(k3)))

pipe = WorldPipeline(seed=1234, latents_batch_size=[1, 2, 4, 8, 16],
                     dtype="bf16").set_models(*models)
pipe.bind()


def row(k_tiles, n):
    base_coord = k_tiles * 512
    return [(base_coord, base_coord + k * 512, base_coord + 512,
             base_coord + (k + 1) * 512) for k in range(n)]


def device_row(r):
    pipe.prefetch(r)
    pending, fallback = pipe._compose_grouped(r, False, True)
    assert not fallback, "fused compose not resident"
    jnp.stack([elev.sum() for _, (elev, _) in pending]).block_until_ready()


# record every fused-dispatch (tensor, chunk, bucket) to expose padding waste
from terrain_diffusion_tpu.runtime import infinite_tensor as it_mod

_dispatch_log = []
_orig_fused = it_mod.InfiniteTensor._evaluate_fused


def _logged_fused(self, chunk):
    bucket = self._pick_bucket(len(chunk))
    _dispatch_log.append((self.tensor_id, len(chunk), bucket))
    return _orig_fused(self, chunk)


it_mod.InfiniteTensor._evaluate_fused = _logged_fused

t0 = time.perf_counter()
device_row(row(20_000, 16))
print(f"warm row: {time.perf_counter() - t0:.1f}s", flush=True)

# fresh row to seed the steady-state measurements
base_k = 26_000
t0 = time.perf_counter()
device_row(row(base_k, 16))
print(f"fresh row: {time.perf_counter() - t0:.2f}s", flush=True)

prev = row(base_k, 16)
for rep in range(8):
    adj = [(i2, j1, i2 + 512, j2) for (i1, j1, i2, j2) in prev]
    pipe.stage_timings.clear()
    _dispatch_log.clear()
    t0 = time.perf_counter()
    device_row(adj)
    wall = time.perf_counter() - t0
    summary = pipe.timing_summary()
    accounted = sum(v["total_s"] for v in summary.values())
    print(f"\nsteady row {rep}: wall {wall * 1000:.0f} ms "
          f"({16 / wall:.2f} tiles/s) "
          f"accounted {accounted * 1000:.0f} ms "
          f"unaccounted {(wall - accounted) * 1000:.0f} ms")
    print("dispatches (tensor, chunk, bucket):", _dispatch_log)
    print(json.dumps(summary, indent=1), flush=True)
    prev = adj
