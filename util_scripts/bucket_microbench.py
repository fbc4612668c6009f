"""Measure per-image marginal device time for the steady-state serving
stage programs at candidate batch buckets, to pick serving bucket lists.

Variants (marginal on-device time via bench.py's chained-scan protocol):
  base192  b16 (current latent bucket max) vs b32
  decoder64 XLA b8 (the Pallas batch cutover) vs XLA b16 (current
  decoder bucket max) vs XLA b32 vs Pallas b4

Usage: timeout 1800 python util_scripts/bucket_microbench.py
NOTE: never run concurrently with the CPU-mesh test suite.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

os.makedirs(".cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(".cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig

dt = jnp.bfloat16
rng = np.random.default_rng(0)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def measure(chain, args, n_long):
    # warm BOTH program variants before timing: the first call of each
    # pays compile/cache-load (up to minutes on this remote backend),
    # which must not leak into the rtt term of the marginal estimate
    float(chain(*args, n=0))
    float(chain(*args, n=n_long))
    rtt = min(_timed(lambda: float(chain(*args, n=0))) for _ in range(3))
    tN = min(_timed(lambda: float(chain(*args, n=n_long))) for _ in range(3))
    return max((tN - rtt) / n_long, 1e-6), rtt


def run_unet(name, cfg_kwargs, B, H, IC, cond_dim, n_long):
    model = EDMUnet2D(EDMUnetConfig(**cfg_kwargs))
    p = jax.jit(model.init)(jax.random.key(0))
    cond_args = ([jnp.asarray(rng.standard_normal((B, cond_dim)), jnp.float32)]
                 if cond_dim else [])

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(params, x, nl, n):
        def body(carry, _):
            out = model.apply(params, carry.astype(dt), nl.astype(dt),
                              cond_args, compute_dtype=dt)
            pad = x.shape[-1] - out.shape[-1]
            if pad:
                out = jnp.concatenate([out, carry[..., -pad:]], axis=-1)
            return out.astype(jnp.float32), ()

        out, _ = jax.lax.scan(body, x, None, length=n)
        return out.mean()

    x = jnp.asarray(rng.standard_normal((B, H, H, IC)), jnp.float32)
    nl = jnp.full((B,), 0.7, jnp.float32)
    marginal, rtt = measure(chain, (p, x, nl), n_long)
    print(f"{name:26s} b{B:<3d} {marginal * 1000:8.2f} ms/call "
          f"{marginal / B * 1000:7.3f} ms/img  (rtt {rtt * 1000:.0f} ms)",
          flush=True)
    return marginal / B


BASE = dict(image_size=512, in_channels=5, out_channels=5, model_channels=192,
            model_channel_mults=(1, 2, 3, 4), layers_per_block=3,
            attn_resolutions=(8, 16), midblock_attention=True,
            concat_balance=0.5, conditional_inputs=(("tensor", 58, 1.0),),
            fourier_scale="pos")
DEC = dict(image_size=512, in_channels=5, out_channels=1, model_channels=64,
           model_channel_mults=(1, 2, 3, 4), layers_per_block=3,
           attn_resolutions=(), midblock_attention=False, concat_balance=0.5,
           conditional_inputs=(), fourier_scale="pos")

run_unet("base192", BASE, 16, 64, 5, 58, 16)
run_unet("base192", BASE, 32, 64, 5, 58, 8)
run_unet("base192", BASE, 64, 64, 5, 58, 4)
run_unet("decoder64-xla", DEC, 8, 512, 5, 0, 4)
run_unet("decoder64-xla", DEC, 16, 512, 5, 0, 2)
run_unet("decoder64-xla", DEC, 32, 512, 5, 0, 2)
run_unet("decoder64-pallas", {**DEC, "block_kwargs": {"block_impl": "pallas"}},
         4, 512, 5, 0, 4)
