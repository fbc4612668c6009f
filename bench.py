"""Benchmark: denoise-steps/sec/chip on the production-shaped 30m stack.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (BASELINE.json): denoise-steps/sec/chip — U-Net denoising
forwards per second across the three stages on the real chip with warm
jitted programs; also derives 512x512-tile p50 latency and tiles/sec.

Robustness: each stage benchmarks in a SUBPROCESS with a wall-clock budget —
the remote-compile service behind the TPU tunnel can take tens of minutes or
drop the connection on the largest programs.  If the full-size base model
cannot compile inside the budget, progressively smaller widths are measured
and the report notes the degradation.  Compiled programs persist in
.cache/jax, so subsequent runs are fast.
"""
import json
import os
import subprocess
import sys
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.path.join(_HERE, ".cache", "jax")

_STAGE_SCRIPT = r"""
import json, os, sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["TD_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig
from terrain_diffusion_tpu.scheduler import (EDMSchedulerConfig, compute_sigmas,
                                             sample_dpm,
                                             trigflow_precondition_noise)

stage = sys.argv[1]
out_path = sys.argv[2]
dt = jnp.bfloat16
cfg = EDMSchedulerConfig()
rng = np.random.default_rng(0)

def timeit(fn, *args, iters=8):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

result = {}
if stage == "coarse":
    model = EDMUnet2D(EDMUnetConfig(
        image_size=16, in_channels=11, out_channels=6, model_channels=128,
        model_channel_mults=(1,), layers_per_block=2, attn_resolutions=(),
        midblock_attention=False, concat_balance=0.5,
        conditional_inputs=tuple(("float", 64, 0.2) for _ in range(5)),
        fourier_scale="pos"))
    p = jax.jit(model.init)(jax.random.key(0))
    sigmas0 = float(compute_sigmas(cfg, 20)[0])
    B = 4
    @jax.jit
    def prog(noise, cond_img, s0, s1, s2, s3, s4):
        scalars = [s0, s1, s2, s3, s4]
        def model_fn(scaled, sigma):
            cnoise = trigflow_precondition_noise(sigma, cfg.sigma_data)
            x_in = jnp.concatenate([scaled, cond_img], axis=-1).astype(dt)
            return model.apply(p, x_in, jnp.full((B,), cnoise, dt), scalars,
                              compute_dtype=dt).astype(jnp.float32)
        return sample_dpm(model_fn, noise * sigmas0, cfg, 20)
    noise = jnp.asarray(rng.standard_normal((B, 64, 64, 6)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((B, 64, 64, 5)), jnp.float32)
    ss = [jnp.full((B,), 0.1, jnp.float32)] * 5
    t = timeit(prog, noise, cond, *ss, iters=3)
    result = {"stage": "coarse", "batch": B, "steps": 20, "sec_per_call": t}
elif stage.startswith("base"):
    mc = int(stage[4:])
    model = EDMUnet2D(EDMUnetConfig(
        image_size=512, in_channels=5, out_channels=5, model_channels=mc,
        model_channel_mults=(1, 2, 3, 4), layers_per_block=3,
        attn_resolutions=(8, 16), midblock_attention=True, concat_balance=0.5,
        conditional_inputs=(("tensor", 58, 1.0),), fourier_scale="pos"))
    p = jax.jit(model.init)(jax.random.key(0))
    B = 16
    @jax.jit
    def prog(x, nl, cond):
        return model.apply(p, x.astype(dt), nl.astype(dt), [cond.astype(dt)],
                           compute_dtype=dt)
    x = jnp.asarray(rng.standard_normal((B, 64, 64, 5)), jnp.float32)
    nl = jnp.full((B,), 0.8, jnp.float32)
    c = jnp.asarray(rng.standard_normal((B, 58)), jnp.float32)
    t = timeit(prog, x, nl, c)
    result = {"stage": stage, "batch": B, "steps": 1, "sec_per_call": t,
              "model_channels": mc}
elif stage.startswith("decoder"):
    mc = int(stage[7:])
    model = EDMUnet2D(EDMUnetConfig(
        image_size=512, in_channels=5, out_channels=1, model_channels=mc,
        model_channel_mults=(1, 2, 3, 4), layers_per_block=3,
        attn_resolutions=(), midblock_attention=False, concat_balance=0.5,
        conditional_inputs=(), fourier_scale="pos"))
    p = jax.jit(model.init)(jax.random.key(0))
    B = 2
    @jax.jit
    def prog(x, nl):
        return model.apply(p, x.astype(dt), nl.astype(dt), [], compute_dtype=dt)
    x = jnp.asarray(rng.standard_normal((B, 512, 512, 5)), jnp.float32)
    nl = jnp.full((B,), 1.2, jnp.float32)
    t = timeit(prog, x, nl)
    result = {"stage": stage, "batch": B, "steps": 1, "sec_per_call": t,
              "model_channels": mc}
with open(out_path, "w") as f:
    json.dump(result, f)
"""


def run_stage(stage: str, timeout_s: int):
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
        out_path = f.name
    env = dict(os.environ, TD_CACHE=_CACHE)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _STAGE_SCRIPT, stage, out_path],
            timeout=timeout_s, env=env, capture_output=True)
        if proc.returncode != 0:
            return None
        with open(out_path) as f:
            return json.load(f)
    except (subprocess.TimeoutExpired, json.JSONDecodeError, FileNotFoundError):
        return None
    finally:
        try:
            os.unlink(out_path)
        except OSError:
            pass


def main():
    os.makedirs(_CACHE, exist_ok=True)
    budget = int(os.environ.get("TD_BENCH_STAGE_TIMEOUT", "2700"))
    notes = []

    coarse = run_stage("coarse", budget)
    base = None
    for width in (192, 128, 64):
        base = run_stage(f"base{width}", budget)
        if base:
            if width != 192:
                notes.append(f"base model measured at {width}ch "
                             f"(192ch exceeded the remote-compile budget)")
            break
    decoder = None
    for width in (64, 32):
        decoder = run_stage(f"decoder{width}", budget)
        if decoder:
            if width != 64:
                notes.append(f"decoder measured at {width}ch")
            break

    detail = {}
    steps_per_sec = 0.0
    if coarse:
        detail["coarse_batch4_20step_s"] = round(coarse["sec_per_call"], 4)
        steps_per_sec += coarse["batch"] * coarse["steps"] / coarse["sec_per_call"]
    if base:
        detail["base_batch16_1step_s"] = round(base["sec_per_call"], 4)
        detail["base_model_channels"] = base["model_channels"]
        steps_per_sec += base["batch"] / base["sec_per_call"]
    if decoder:
        detail["decoder_batch2_1step_s"] = round(decoder["sec_per_call"], 4)
        steps_per_sec += decoder["batch"] / decoder["sec_per_call"]

    # steady-state cost of one new 512px tile (stride 384):
    # 1 decoder forward + ~4.5 latent forwards (2.25 tiles x 2 phases)
    # + ~0.3 amortized coarse tile (20 steps each)
    tiles_per_sec = None
    if base and decoder and coarse:
        t_tile = (decoder["sec_per_call"] / decoder["batch"]
                  + 4.5 * base["sec_per_call"] / base["batch"]
                  + 0.3 * coarse["sec_per_call"] / coarse["batch"])
        tiles_per_sec = 1.0 / t_tile
        detail["tile_512_p50_ms"] = round(t_tile * 1000, 2)
        detail["tiles_per_sec_per_chip"] = round(tiles_per_sec, 3)

    target_tiles_per_chip = 20.0 / 8.0  # v5e-8 target (BASELINE.json)
    vs_baseline = (round(tiles_per_sec / target_tiles_per_chip, 3)
                   if tiles_per_sec else 0.0)
    if notes:
        detail["notes"] = notes
    print(json.dumps({
        "metric": "denoise-steps/sec/chip (30m stack)",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": vs_baseline,
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
