"""Benchmark: denoise-steps/sec/chip on the production-shaped 30m stack.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (BASELINE.json): denoise-steps/sec/chip — U-Net denoising
forwards per second across the three stages, measured as *marginal on-device
time* (the stage core chained n times inside one jitted `lax.scan`, timing
n=1 vs n=N and differencing).  This isolates TPU compute from the
dispatch/transfer round-trip of the remote-device tunnel, which is reported
separately; `block_until_ready` alone under-reports on this platform, and
single-call timing over-reports (tunnel RTT dominates).

Robustness: each stage runs in a subprocess with a wall-clock budget;
compiled programs persist in .cache/jax so re-runs skip compilation.
Weights are always jit *arguments* (never baked HLO constants — that breaks
the remote compile service on big models).
"""
import json
import os
import subprocess
import sys
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.path.join(_HERE, ".cache", "jax")

_STAGE_SCRIPT = r"""
import functools, json, os, sys, time
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


def measure(chain, args, n_long):
    # compile both variants, then time with a forced scalar fetch
    float(chain(*args, n=1))
    float(chain(*args, n=n_long))
    t0 = time.perf_counter(); float(chain(*args, n=1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(chain(*args, n=n_long))
    tN = time.perf_counter() - t0
    marginal = max((tN - t1) / (n_long - 1), 1e-6)
    return marginal, max(t1 - marginal, 0.0)


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

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(params, noise, cond_img, scal, n):
        scalars = [scal] * 5
        def sample_once(carry, _):
            def model_fn(scaled, sigma):
                cnoise = trigflow_precondition_noise(sigma, cfg.sigma_data)
                x_in = jnp.concatenate([scaled, cond_img + carry], axis=-1).astype(dt)
                return model.apply(params, x_in, jnp.full((B,), cnoise, dt),
                                   scalars, compute_dtype=dt).astype(jnp.float32)
            out = sample_dpm(model_fn, noise * sigmas0, cfg, 20)
            return out.mean() * 1e-6, ()
        acc, _ = jax.lax.scan(sample_once, jnp.zeros(()), None, length=n)
        return acc

    noise = jnp.asarray(rng.standard_normal((B, 64, 64, 6)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((B, 64, 64, 5)), jnp.float32)
    scal = jnp.full((B,), 0.1, jnp.float32)
    marginal, rtt = measure(chain, (p, noise, cond, scal), 4)
    result = {"stage": "coarse", "batch": B, "steps": 20,
              "sec_per_call": marginal, "rtt_s": rtt}
else:
    if stage.startswith("base"):
        mc = int(stage[4:])
        model = EDMUnet2D(EDMUnetConfig(
            image_size=512, in_channels=5, out_channels=5, model_channels=mc,
            model_channel_mults=(1, 2, 3, 4), layers_per_block=3,
            attn_resolutions=(8, 16), midblock_attention=True,
            concat_balance=0.5, conditional_inputs=(("tensor", 58, 1.0),),
            fourier_scale="pos"))
        B, H, IC = 16, 64, 5
        cond_args = [jnp.asarray(rng.standard_normal((B, 58)), jnp.float32)]
    else:
        spec = stage[7:]
        use_xla = spec.endswith("xla")
        mc = int(spec[:-3] if use_xla else spec)
        # serving default (WorldPipeline block_impl) is fused Pallas
        # residual blocks; the *xla variant is the fallback measurement if
        # the Mosaic compile path is unavailable on the run host
        bk = {} if use_xla else {"block_impl": "pallas"}
        model = EDMUnet2D(EDMUnetConfig(
            image_size=512, in_channels=5, out_channels=1, model_channels=mc,
            model_channel_mults=(1, 2, 3, 4), layers_per_block=3,
            attn_resolutions=(), midblock_attention=False, concat_balance=0.5,
            conditional_inputs=(), fourier_scale="pos", block_kwargs=bk))
        B, H, IC = 2, 512, 5
        cond_args = []
    p = jax.jit(model.init)(jax.random.key(0))

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
    nl = jnp.full((B,), 0.8, jnp.float32)
    marginal, rtt = measure(chain, (p, x, nl), 16)
    result = {"stage": stage, "batch": B, "steps": 1,
              "sec_per_call": marginal, "rtt_s": rtt, "model_channels": mc}
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
                             f"(192ch exceeded the compile budget)")
            break
    decoder = None
    for variant in ("64", "64xla", "32", "32xla"):
        decoder = run_stage(f"decoder{variant}", budget)
        if decoder:
            if variant != "64":
                notes.append(f"decoder measured as decoder{variant}")
            break

    detail = {}
    steps_per_sec = 0.0
    if coarse:
        detail["coarse_b4_20step_ms"] = round(coarse["sec_per_call"] * 1000, 3)
        steps_per_sec += coarse["batch"] * coarse["steps"] / coarse["sec_per_call"]
    if base:
        detail["base_b16_fwd_ms"] = round(base["sec_per_call"] * 1000, 3)
        detail["base_model_channels"] = base["model_channels"]
        steps_per_sec += base["batch"] / base["sec_per_call"]
    if decoder:
        detail["decoder_b2_fwd_ms"] = round(decoder["sec_per_call"] * 1000, 3)
        steps_per_sec += decoder["batch"] / decoder["sec_per_call"]
    if base:
        detail["dispatch_rtt_ms"] = round(base.get("rtt_s", 0) * 1000, 1)

    # steady-state cost of one new 512px output tile (stride 384):
    # 1 decoder fwd + 4.5 latent fwds (2.25 tiles x 2 phases) + 0.3 coarse tiles
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
