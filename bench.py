"""Benchmark: denoise-steps/sec/chip on the production-shaped 30m stack.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (BASELINE.json): denoise-steps/sec/chip — weighted U-Net
denoising forward steps per second across the three stages, measured on the
real chip with warm jitted programs.  Also reports 512x512-tile p50 latency
derived from the stage timings.

Baseline anchor: the reference's headline "9x orbital velocity" on a consumer
GPU corresponds to roughly 20 512-tiles/sec; vs_baseline is our tiles/sec
over the driver target of 20 tiles/sec/v5e-8 = 2.5 tiles/sec/chip.
"""
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jax")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _build_stage_programs():
    from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig
    from terrain_diffusion_tpu.scheduler import (
        EDMSchedulerConfig, compute_sigmas, sample_dpm,
        precondition_inputs, trigflow_precondition_noise)

    dt = jnp.bfloat16
    cfg = EDMSchedulerConfig()

    # production model shapes (SURVEY §6: coarse 128x[1]x2, base 192x[1,2,3,4]x3,
    # decoder 64x[1,2,3,4]x3)
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

    kc, kb, kd = jax.random.split(jax.random.key(0), 3)
    # jit each init into a single program: op-by-op init dispatches hundreds
    # of tiny compiles (catastrophic through a remote-device tunnel)
    pc = jax.jit(coarse.init)(kc)
    pb = jax.jit(base.init)(kb)
    pd = jax.jit(decoder.init)(kd)

    sigmas0 = float(compute_sigmas(cfg, 20)[0])

    @jax.jit
    def coarse_prog(noise, cond_img, scalars):
        def model_fn(scaled, sigma):
            cnoise = trigflow_precondition_noise(sigma, cfg.sigma_data)
            x_in = jnp.concatenate([scaled, cond_img], axis=-1).astype(dt)
            out = coarse.apply(pc, x_in, jnp.full((x_in.shape[0],), cnoise, dt),
                               scalars, compute_dtype=dt)
            return out.astype(jnp.float32)

        return sample_dpm(model_fn, noise * sigmas0, cfg, 20)

    @jax.jit
    def base_prog(x, nl, cond):
        return base.apply(pb, x.astype(dt), nl.astype(dt), [cond.astype(dt)],
                          compute_dtype=dt)

    @jax.jit
    def decoder_prog(x, nl):
        return decoder.apply(pd, x.astype(dt), nl.astype(dt), [],
                             compute_dtype=dt)

    return coarse_prog, base_prog, decoder_prog


def _time(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    coarse_prog, base_prog, decoder_prog = _build_stage_programs()
    rng = np.random.default_rng(0)

    # coarse: batch of 4 tiles, 20 denoise steps each
    cb = 4
    c_noise = jnp.asarray(rng.standard_normal((cb, 64, 64, 6)), jnp.float32)
    c_cond = jnp.asarray(rng.standard_normal((cb, 64, 64, 5)), jnp.float32)
    scalars = [jnp.full((cb,), 0.1, jnp.float32) for _ in range(5)]
    t_coarse = _time(coarse_prog, c_noise, c_cond, scalars, iters=3)

    # base: batch of 16 latent tiles, 1 step per call
    bb = 16
    b_x = jnp.asarray(rng.standard_normal((bb, 64, 64, 5)), jnp.float32)
    b_nl = jnp.full((bb,), 0.8, jnp.float32)
    b_cond = jnp.asarray(rng.standard_normal((bb, 58)), jnp.float32)
    t_base = _time(base_prog, b_x, b_nl, b_cond)

    # decoder: batch of 2 512x512 tiles, 1 step
    db = 2
    d_x = jnp.asarray(rng.standard_normal((db, 512, 512, 5)), jnp.float32)
    d_nl = jnp.full((db,), 1.2, jnp.float32)
    t_decoder = _time(decoder_prog, d_x, d_nl)

    # denoise steps/sec/chip: total model denoising forwards per second
    steps_per_sec = (cb * 20) / t_coarse + bb / t_base + db / t_decoder

    # steady-state cost of one NEW 512px output tile (stride 384):
    #   decoder: 1 tile-forward;  latent: (384/32)^2 / ... amortized:
    #   each latent tile covers 32x32 latent px stride -> (384/8)/32 = 1.5
    #   per axis -> 2.25 latent tiles per output tile, x2 phases
    #   coarse: (48/32)^2 /(48x48 cell => 384px => 1 tile per 9 outputs) ~ 0.3
    lat_tiles = 2.25 * 2
    coarse_amort = 0.3
    t_tile = (t_decoder / db) + lat_tiles * (t_base / bb) + \
        coarse_amort * (t_coarse / cb)
    tiles_per_sec = 1.0 / t_tile

    target_tiles_per_chip = 20.0 / 8.0  # v5e-8 target from BASELINE.json
    result = {
        "metric": "denoise-steps/sec/chip (30m stack)",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(tiles_per_sec / target_tiles_per_chip, 3),
        "detail": {
            "coarse_batch4_20step_s": round(t_coarse, 4),
            "base_batch16_1step_s": round(t_base, 4),
            "decoder_batch2_1step_s": round(t_decoder, 4),
            "tile_512_p50_ms": round(t_tile * 1000, 2),
            "tiles_per_sec_per_chip": round(tiles_per_sec, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
