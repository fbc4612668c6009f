"""Benchmark: denoise-steps/sec/chip on the production-shaped 30m stack.

Prints a JSON line after EVERY completed stage (flushed) so the driver's
tail always holds the best composite even if the process is killed:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}
The LAST line printed is the final result.

Primary metric (BASELINE.json): denoise-steps/sec/chip — U-Net denoising
forwards per second across the three stages, measured as *marginal on-device
time* (the stage core chained n times inside one jitted `lax.scan`, timing
n=1 vs n=N and differencing).  This isolates TPU compute from the
dispatch/transfer round-trip of the remote-device tunnel, which is reported
separately; `block_until_ready` alone under-reports on this platform, and
single-call timing over-reports (tunnel RTT dominates).

In addition to the analytic per-stage composite, a measured end-to-end
number is reported: `WorldPipeline.get_many` over fresh far-apart 512px
tiles on device (production widths, random weights), both raw and marginal
(batch-16 minus batch-8, to subtract the fixed dispatch/fetch overhead of
the remote tunnel).  Reference hot path: world_pipeline.py:1209-1270.

Robustness contract (learned from round 2, where one hung Mosaic remote
compile ate the driver's whole wall clock and produced zero bytes; and
round 4, where the e2e stage ran last and was the only stage lost to the
leftover budget):
  * TOTAL wall-clock budget, default 900 s (`TD_BENCH_TOTAL_BUDGET`),
    divided across stages; every subprocess timeout is clamped to the
    remaining budget.
  * The measured e2e serving stage runs FIRST with a protected budget
    slice and flushes its contract metric (steady-state device tiles/sec)
    before the wire-format numbers; an end-of-run completion pass retries
    it with whatever budget is left (resuming from the shared cache).
  * Then the per-stage marginals in ONE combo subprocess (coarse, base,
    Pallas decoder — the serving default); the XLA decoder variant is the
    hang-proof fallback if the Pallas stage fails.  A per-connection wedge
    watchdog in the runner kills + retries subprocesses that stop flushing
    progress (this backend occasionally wedges individual client
    connections at device init while serving fresh connections fine).
  * Compiled programs persist in `.cache/jax` (`TD_BENCH_CACHE` overrides,
    for cold-run testing), so re-runs skip the remote compile.
  * Exit code is 0 whenever at least one stage produced a number.
Weights are always jit *arguments* (never baked HLO constants — that breaks
the remote compile service on big models).
"""
import json
import os
import subprocess
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.environ.get("TD_BENCH_CACHE", os.path.join(_HERE, ".cache", "jax"))

_STAGE_SCRIPT = r"""
import functools, json, os, sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["TD_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
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
    # ONE compiled program per stage (remote compiles on this backend cost
    # 100-400s each, so the old n=1 + n_long pair doubled the cold-cache
    # cost); dispatch RTT comes from a trivial jitted program instead
    tiny = jax.jit(lambda v: v + 1.0)
    z = jnp.zeros((), jnp.float32)
    float(tiny(z))
    rtt = min(_timed(lambda: float(tiny(z))) for _ in range(3))
    float(chain(*args, n=n_long))  # compile
    tN = min(_timed(lambda: float(chain(*args, n=n_long))) for _ in range(2))
    marginal = max((tN - rtt) / n_long, 1e-6)
    return marginal, rtt


def _timed(fn):
    t0 = time.perf_counter(); fn()
    return time.perf_counter() - t0


def run_one(stage):
    if stage == "coarse":
        return _run_coarse()
    return _run_unet(stage)


def _run_coarse():
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
    return {"stage": "coarse", "batch": B, "steps": 20,
            "sec_per_call": marginal, "rtt_s": rtt}


def _run_unet(stage):
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
        # decoder<width><impl?><batch?>: e.g. decoder64xla, decoder64,
        # decoder64xla_b8, decoder64_b8
        spec = stage[7:]
        B = 2
        if "_b" in spec:
            spec, b = spec.split("_b")
            B = int(b)
        use_xla = spec.endswith("xla")
        mc = int(spec[:-3] if use_xla else spec)
        # serving default (WorldPipeline block_impl) is fused Pallas
        # residual blocks; the *xla variant is the hang-proof fallback the
        # runner uses when the Pallas stage fails or wedges
        bk = {} if use_xla else {"block_impl": "pallas"}
        model = EDMUnet2D(EDMUnetConfig(
            image_size=512, in_channels=5, out_channels=1, model_channels=mc,
            model_channel_mults=(1, 2, 3, 4), layers_per_block=3,
            attn_resolutions=(), midblock_attention=False, concat_balance=0.5,
            conditional_inputs=(), fourier_scale="pos", block_kwargs=bk))
        H, IC = 512, 5
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
    return {"stage": stage, "batch": B, "steps": 1,
            "sec_per_call": marginal, "rtt_s": rtt, "model_channels": mc}


def flush(result):
    with open(out_path + ".tmp", "w") as f:
        json.dump(result, f)
    os.replace(out_path + ".tmp", out_path)


# early progress markers for the runner's wedge watchdog: first flush
# proves the interpreter came up; device_up proves the backend connection
# is live (the observed wedge mode hangs exactly there)
flush({"phase": "imports"})
jax.jit(lambda v: v + 1.0)(jnp.zeros(())).block_until_ready()
flush({"phase": "device_up"})

if stage.startswith("combo:"):
    # several stages, ONE process: device init + cache loads are paid once
    # (each stage subprocess costs 100-200s of setup through the tunnel
    # even fully warm).  Results flush incrementally so a timeout keeps
    # every completed stage; the _running tick gives the watchdog a
    # progress signal at each stage boundary.
    combo = {}
    for s in stage[6:].split(","):
        combo["_running"] = s
        flush(combo)
        combo[s] = run_one(s)
        combo.pop("_running", None)
        flush(combo)
else:
    flush(run_one(stage))
"""

# Measured end-to-end: WorldPipeline.get_many over fresh far-apart 512px
# tiles (production widths, random weights, bf16, warm programs).  Two
# numbers: `e2e_wire` times the full serving path incl. the wire-format
# download (int16 elev + f16 climate, what the HTTP APIs pull), and
# `e2e_device` blocks only on per-tile on-device checksums — the chip
# throughput without the host-link bandwidth (which on this harness is a
# remote tunnel at ~20 MB/s; a co-located host pulls >1 GB/s).
# The result file is (re)written after EVERY step, so a timeout upgrade
# still surfaces whatever completed.
_E2E_SCRIPT = r"""
import json, os, sys, time
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["TD_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig
from terrain_diffusion_tpu.pipeline.world import WorldPipeline

out_path = sys.argv[1]
result = {}
_T0 = time.perf_counter()


def flush():
    result["elapsed_s"] = round(time.perf_counter() - _T0, 1)
    with open(out_path + ".tmp", "w") as f:
        json.dump(result, f)
    os.replace(out_path + ".tmp", out_path)


result["phase"] = "init"
flush()

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
    # 512-aligned bases with k = 2 (mod 3) keep every run on the same
    # decoder-grid (stride 384) alignment as the warmup, so the measured
    # region reuses compiled programs instead of minting shape variants
    base_coord = k_tiles * 512
    return [(base_coord, base_coord + k * 512, base_coord + 512,
             base_coord + (k + 1) * 512) for k in range(n)]


def device_row(r):
    # generate + compose all tiles (grouped vmapped dispatches), block only
    # on on-device checksums
    pipe.prefetch(r)
    pending, fallback = pipe._compose_grouped(r, False, True)
    assert not fallback, "fused compose not resident"
    jnp.stack([elev.sum() for _, (elev, _) in pending]).block_until_ready()


# The device-side numbers come FIRST: `e2e_steady_device_tiles_per_sec`
# is the contract metric (BASELINE.md tiles/sec target), and every flush
# below survives a timeout, so the earlier it lands the more robust the
# driver artifact is.  The warm row compiles every program the device
# measurements need AND the stage programs the wire runs reuse; there is
# deliberately no single-tile `get()` warmup — its per-query compose
# programs are not used by the row-based measurements, and on this
# remote backend even cache-warm program LOADS cost 10-20 s each.
result["phase"] = "device_warm"
flush()
t0 = time.perf_counter()
device_row(row(20_000, 16))
result["warmup_s"] = round(time.perf_counter() - t0, 2)
result["phase"] = "device_measure"
flush()

t0 = time.perf_counter()
device_row(row(26_000, 16))
t_dev = time.perf_counter() - t0
result["device16_s"] = round(t_dev, 3)
result["e2e_device_tiles_per_sec"] = round(16.0 / t_dev, 3)
flush()

# device-only steady state: adjacent row below the one just generated
adj_dev = [(i2, j1, i2 + 512, j2) for (i1, j1, i2, j2) in row(26_000, 16)]
t0 = time.perf_counter()
device_row(adj_dev)
t_dev_adj = time.perf_counter() - t0
result["device_adjacent16_s"] = round(t_dev_adj, 3)
result["e2e_steady_device_tiles_per_sec"] = round(16.0 / t_dev_adj, 3)
result["phase"] = "wire_warm"
flush()

# wire-format path (host download over the tunnel): warm the remaining
# batch buckets, then measure
pipe.get_many(row(2_000, 8), pack_wire=True)
pipe.get_many(row(-4_000, 16), pack_wire=True)
result["phase"] = "wire_measure"
flush()

t0 = time.perf_counter()
pipe.get_many(row(8_000, 8), pack_wire=True)
t8 = time.perf_counter() - t0
result["get_many8_s"] = round(t8, 3)
flush()
t0 = time.perf_counter()
pipe.get_many(row(14_000, 16), pack_wire=True)
t16 = time.perf_counter() - t0
result["get_many16_s"] = round(t16, 3)
result["e2e_wire_tiles_per_sec"] = round(16.0 / t16, 3)
result["e2e_marginal_tiles_per_sec"] = round(
    8.0 / max(t16 - t8, 1e-6), 3)
flush()

# steady-state: extend the already-generated region by the adjacent row
# below — context (coarse + most latent windows) is resident, so this is
# the serving regime the analytic tiles_per_sec_per_chip models (1 decoder
# + marginal latent/coarse per tile)
adj = [(i2, j1, i2 + 512, j2) for (i1, j1, i2, j2) in row(14_000, 16)]
t0 = time.perf_counter()
pipe.get_many(adj, pack_wire=True)
t_adj = time.perf_counter() - t0
result["adjacent_row16_s"] = round(t_adj, 3)
result["e2e_steady_wire_tiles_per_sec"] = round(16.0 / t_adj, 3)
result["phase"] = "done"
flush()
"""

# The key the driver contract (BASELINE.md tiles/sec target) reads; an e2e
# result without it is treated as incomplete and retried with leftover
# budget.
_E2E_CONTRACT_KEY = "e2e_steady_device_tiles_per_sec"


# Post-hoc diagnostics for the driver artifact: when a stage subprocess
# fails, its exit reason + stderr tail land here and the orchestrator
# copies them into the emitted notes (round-5 lesson: a crashed Pallas
# stage looked identical to a timeout because stderr was discarded).
LAST_FAILURE: dict = {}

# subprocess poll interval (seconds); tests shrink it to exercise the
# watchdog without multi-second waits
_POLL_S = 5.0
# give up after this many wedged-connection retries of one subprocess
_MAX_ATTEMPTS = 3


def _run_sub(argv_payload, timeout_s: float, tag: str = "stage",
             init_grace_s: float = 150.0, stall_s: float = 450.0):
    """Run a stage subprocess with a hard timeout AND a progress watchdog.

    Returns the parsed result file — even after a timeout or crash,
    whatever the subprocess last flushed is used (every script rewrites
    its file after each completed step) — or None if nothing was produced.
    Failure reasons (timeout vs rc + stderr tail) go to LAST_FAILURE[tag].

    Watchdog (round-5 diagnosis): on this backend an individual client
    connection occasionally wedges at device init — the subprocess sits
    futex-blocked forever while a FRESH connection from another process
    works instantly (verified with a concurrent probe).  A plain hard
    timeout turns that wedge into a full-budget loss.  So every script
    flushes early progress markers (imports -> device_up -> per-step
    results), and this runner kills + retries on a fresh connection when
    the result file never appears within init_grace_s or stops changing
    for stall_s.  Results from a killed attempt are merged under the
    retry's (the retry recomputes and re-flushes the same keys)."""
    if timeout_s < 20:
        LAST_FAILURE[tag] = f"skipped (budget {timeout_s:.0f}s < 20s)"
        return None
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
        out_path = f.name
    os.unlink(out_path)  # subprocess atomically creates it on first flush
    env = dict(os.environ, TD_CACHE=_CACHE)
    deadline = time.monotonic() + timeout_s

    def _parse():
        try:
            with open(out_path) as f:
                parsed = json.load(f)
            return parsed if isinstance(parsed, dict) and parsed else None
        except (json.JSONDecodeError, FileNotFoundError, OSError):
            return None

    best: dict = {}
    attempt = 0
    try:
        while True:
            attempt += 1
            t0 = time.monotonic()
            wedged = False
            with tempfile.TemporaryFile() as logf:
                proc = subprocess.Popen(
                    [sys.executable, "-c"] + argv_payload + [out_path],
                    env=env, stdout=logf, stderr=subprocess.STDOUT)
                last_mtime, last_change = None, t0
                while True:
                    try:
                        rc = proc.wait(timeout=_POLL_S)
                        break
                    except subprocess.TimeoutExpired:
                        pass
                    now = time.monotonic()
                    try:
                        m = os.path.getmtime(out_path)
                    except OSError:
                        m = None
                    if m is not None and m != last_mtime:
                        last_mtime, last_change = m, now
                    timed_out = now > deadline
                    no_first = (last_mtime is None
                                and now - t0 > init_grace_s)
                    stalled = (last_mtime is not None
                               and now - last_change > stall_s)
                    if timed_out or no_first or stalled:
                        proc.kill()
                        proc.wait()
                        rc = None
                        if timed_out:
                            LAST_FAILURE[tag] = (
                                f"timeout after {timeout_s:.0f}s")
                        else:
                            wedged = True
                            why = ("no first flush within "
                                   f"{init_grace_s:.0f}s" if no_first else
                                   f"no progress for {stall_s:.0f}s")
                            LAST_FAILURE[tag] = (
                                f"wedged connection killed ({why}, "
                                f"attempt {attempt})")
                        break
                if rc is not None:
                    if rc != 0:
                        logf.seek(0)
                        tail = logf.read()[-300:].decode("utf-8", "replace")
                        LAST_FAILURE[tag] = (
                            f"rc={rc} after {time.monotonic() - t0:.0f}s: "
                            f"{tail}")
                    else:
                        LAST_FAILURE.pop(tag, None)
            got = _parse()
            if got:
                best = {**best, **got}
            if (not wedged or attempt >= _MAX_ATTEMPTS
                    or deadline - time.monotonic() < 90):
                break
            # retry on a fresh connection with the remaining budget
        return best or None
    finally:
        for p in (out_path, out_path + ".tmp"):
            try:
                os.unlink(p)
            except OSError:
                pass


_PROBE_SCRIPT = r"""
import json, os, sys
import jax
# The remote-TPU plugin's registration hook overrides jax_platforms in
# sitecustomize; re-assert the env selection so JAX_PLATFORMS=cpu (tests)
# actually selects CPU.  In production the env says the TPU platform, so
# this is a no-op there.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
ds = jax.devices()
print(json.dumps({"platform": ds[0].platform, "n": len(ds)}), flush=True)
"""


def probe_devices(timeout_s: float):
    """Fast-fail device-init probe.

    On this harness the TPU is reached through a remote-device tunnel that
    can wedge in a way where `jax.devices()` hangs forever (observed round
    3: the relay accepts connections but the chip lease never resolves).
    Probing in a disposable subprocess with a hard timeout turns a 900 s
    silent budget burn into a ~2-minute diagnostic.  Returns the parsed
    probe dict, or None if device init hung/crashed.
    """
    try:
        r = subprocess.run([sys.executable, "-c", _PROBE_SCRIPT],
                           timeout=timeout_s, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return None
    for line in reversed((r.stdout or "").strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return None


def run_stage(stage: str, timeout_s: float):
    out = _run_sub([_STAGE_SCRIPT, stage], timeout_s, tag=stage)
    if (isinstance(out, dict) and not stage.startswith("combo:")
            and "stage" not in out):
        return None  # only watchdog progress markers were flushed
    return out


def run_e2e(timeout_s: float):
    # the e2e warm row can legitimately go ~520 s without a flush on a
    # cold cache, so its stall window is wider than the stage default
    return _run_sub([_E2E_SCRIPT], timeout_s, tag="e2e", stall_s=560.0)


class Bench:
    def __init__(self, total_budget_s: float):
        self.t0 = time.monotonic()
        self.deadline = self.t0 + total_budget_s
        self.coarse = None
        self.base = None
        self.decoder = None
        self.e2e = None
        self.notes = []

    def remaining(self) -> float:
        return self.deadline - time.monotonic()

    def emit(self, final: bool = False):
        """Print the current composite as one flushed JSON line."""
        detail = {}
        steps_per_sec = 0.0
        coarse, base, decoder = self.coarse, self.base, self.decoder
        if coarse:
            detail["coarse_b4_20step_ms"] = round(coarse["sec_per_call"] * 1000, 3)
            steps_per_sec += coarse["batch"] * coarse["steps"] / coarse["sec_per_call"]
        if base:
            detail["base_b16_fwd_ms"] = round(base["sec_per_call"] * 1000, 3)
            detail["base_model_channels"] = base["model_channels"]
            steps_per_sec += base["batch"] / base["sec_per_call"]
            detail["dispatch_rtt_ms"] = round(base.get("rtt_s", 0) * 1000, 1)
        if decoder:
            detail["decoder_b2_fwd_ms"] = round(decoder["sec_per_call"] * 1000, 3)
            detail["decoder_variant"] = decoder["stage"]
            steps_per_sec += decoder["batch"] / decoder["sec_per_call"]

        # steady-state cost of one new 512px output tile (stride 384):
        # 1 decoder fwd + 4.5 latent fwds (2.25 tiles x 2 phases) + 0.3
        # coarse tiles  (reference budgets: world_pipeline.py:934,1144,1252)
        tiles_per_sec = None
        if base and decoder and coarse:
            t_tile = (decoder["sec_per_call"] / decoder["batch"]
                      + 4.5 * base["sec_per_call"] / base["batch"]
                      + 0.3 * coarse["sec_per_call"] / coarse["batch"])
            tiles_per_sec = 1.0 / t_tile
            detail["tile_512_p50_ms"] = round(t_tile * 1000, 2)
            detail["tiles_per_sec_per_chip"] = round(tiles_per_sec, 3)
            # steady-state variant with HONEST per-tile window geometry,
            # measured from the steady serving row's dispatch log
            # (util_scripts/profile_steady_row.py, 3-row period on the
            # stride-384 grid): 92 decoder windows + 465 latent model
            # applies (228 init + 237 step, 64px @ stride 32, T=2) per 48
            # new tiles -> 1.92 decoder + 9.69 latent forwards per tile.
            # (The headline number above keeps the reference's 1-decoder /
            # 4.5-latent accounting, world_pipeline.py:313-314.)  Compare
            # against the measured e2e_steady_device_tiles_per_sec — round
            # 5 profiling showed the serving loop adds no material host
            # overhead (measured ~99% of this model with matched decoder
            # programs; after the decoder-bucket-16 change the serving path
            # rides a ~13% cheaper per-image decoder program than the b2
            # marginal used here, so measured may EXCEED this floor).
            t_steady = (1.92 * decoder["sec_per_call"] / decoder["batch"]
                        + 9.69 * base["sec_per_call"] / base["batch"]
                        + 0.3 * coarse["sec_per_call"] / coarse["batch"])
            detail["analytic_steady_tiles_per_sec"] = round(1.0 / t_steady, 3)
        if self.e2e:
            detail.update({k: v for k, v in self.e2e.items() if k != "phase"})
            if _E2E_CONTRACT_KEY not in self.e2e:
                detail["e2e_partial_phase"] = self.e2e.get("phase", "unknown")

        target_tiles_per_chip = 20.0 / 8.0  # v5e-8 target (BASELINE.json)
        vs_baseline = (round(tiles_per_sec / target_tiles_per_chip, 3)
                       if tiles_per_sec else 0.0)
        if self.notes:
            detail["notes"] = list(self.notes)
        detail["budget_used_s"] = round(time.monotonic() - self.t0, 1)
        if not final:
            detail["partial"] = True
        print(json.dumps({
            "metric": "denoise-steps/sec/chip (30m stack)",
            "value": round(steps_per_sec, 2),
            "unit": "steps/s",
            "vs_baseline": vs_baseline,
            "detail": detail,
        }), flush=True)


def main():
    os.makedirs(_CACHE, exist_ok=True)
    budget = float(os.environ.get("TD_BENCH_TOTAL_BUDGET", "900"))
    b = Bench(budget)

    # 0. fast-fail: if device init hangs (wedged tunnel, round-3 failure
    # mode) emit a diagnostic line and exit 0 instead of burning the whole
    # budget in silent subprocess timeouts.
    probe_timeout = float(os.environ.get("TD_BENCH_PROBE_TIMEOUT", "150"))
    probe = probe_devices(min(probe_timeout, b.remaining() - 30.0))
    if probe is None:
        print(json.dumps({
            "metric": "denoise-steps/sec/chip (30m stack)",
            "value": 0.0,
            "unit": "steps/s",
            "vs_baseline": 0.0,
            "detail": {
                "device_init": "hung",
                "probe_timeout_s": probe_timeout,
                "note": "jax.devices() did not return; remote TPU tunnel "
                        "unreachable — no stage was attempted",
            },
        }), flush=True)
        return
    b.notes.append(f"devices: {probe.get('n')}x {probe.get('platform')}")

    # 1. measured end-to-end serving FIRST (round-5 restructure): the
    # steady-state `WorldPipeline.get_many` throughput is the contract
    # metric (BASELINE.md's tiles/sec target), and in round 4 it was the
    # only stage lost when it ran last against the leftover budget.  The
    # e2e script flushes after every step with the device-side (contract)
    # numbers first, so even a timeout here keeps them; its compiles also
    # persist to the shared cache, making the end-of-run retry cheap.
    # Budgeting (round-5 measurements, fully cache-warm): the e2e run
    # needs ~350-420 s — cached program LOADS through the remote tunnel
    # cost 10-60 s each — while the warm 3-stage combo (coarse, base,
    # Pallas decoder) takes ~450-550 s, so the cap leans toward the e2e
    # completing in ONE attempt (a retry repays the program loads).
    e2e_cap = min(max(b.remaining() - 420.0, 180.0), 520.0)
    if b.remaining() > 300:
        b.e2e = run_e2e(e2e_cap)
        b.emit()

    # 2-4. the three known-safe XLA stages in ONE subprocess: device init +
    # compile-cache loads through the tunnel cost 100-200s per subprocess
    # even fully warm, so one process for all three is the difference
    # between fitting the budget and not.  The combo flushes incrementally;
    # a timeout keeps every completed stage, and the individual fallbacks
    # below re-attempt only what is missing.
    # decoder64 (Pallas) rides LAST in the same combo: the incremental
    # flush means a hung Mosaic compile there costs nothing already
    # measured, and sharing the subprocess skips a second 100-200 s device
    # init + cache-load bill — the round-5 check run lost the Pallas
    # number because the standalone upgrade's budget gate (>150 s) failed
    # silently after a slow combo.
    # the combo carries the PALLAS decoder (the serving default and the
    # headline's dominant term); the XLA decoder variant is fallback-only.
    # Rationale (round-5 measurements): one warm stage costs ~150-180 s
    # through this tunnel — mostly program loads — so the old
    # 4-stage combo (~700 s) plus a 266 s e2e did not fit the 900 s
    # budget; 3 stages (~525 s) do.  The round-2 "hung Mosaic compile"
    # hazard is now covered by the runner's wedge/stall watchdog plus the
    # standalone decoder64xla fallback below.
    combo_tag = "combo:coarse,base192,decoder64"
    combo = run_stage(combo_tag, min(700.0, b.remaining()))

    def _why(stage_tag):
        # a stage that only ever ran inside the combo has its failure
        # recorded under the combo's tag, not its own
        return LAST_FAILURE.get(stage_tag) or LAST_FAILURE.get(combo_tag, "?")

    combo = combo if isinstance(combo, dict) and "stage" not in combo else {}
    b.coarse = combo.get("coarse")
    b.decoder = combo.get("decoder64")
    b.base = combo.get("base192")
    b.emit()
    if not b.coarse and b.remaining() > 60:
        b.coarse = run_stage("coarse", min(300.0, b.remaining()))
        b.emit()
    if not b.coarse:
        b.notes.append("coarse stage failed/timed out: "
                       + _why("coarse"))
    if not b.decoder and b.remaining() > 60:
        # Pallas variant missing: fall back to the cache-warm XLA decoder
        b.decoder = run_stage("decoder64xla", min(300.0, b.remaining()))
        if b.decoder:
            b.notes.append("decoder measured with XLA fallback (Pallas "
                           "variant failed: " + _why("decoder64") + ")")
        b.emit()
    if not b.decoder:
        b.notes.append("decoder stage failed/timed out: "
                       + _why("decoder64xla"))
    base_tag = combo_tag  # who last tried base
    if not b.base:
        for width in (192, 128, 64):
            if b.remaining() < 60:
                break
            base_tag = f"base{width}"
            b.base = run_stage(base_tag, min(420.0, b.remaining()))
            if b.base:
                if width != 192:
                    b.notes.append(f"base model measured at {width}ch "
                                   f"(192ch exceeded the budget)")
                break
        b.emit()
    if not b.base:
        b.notes.append("base stage failed/timed out: "
                       + _why(base_tag))

    # 5. second chance: retry any failed stage with the leftover budget
    # (a single slow remote compile must not zero a stage for the round);
    # the decoder retry uses the XLA variant — degraded but hang-proof
    retries = [("coarse", "coarse", 240.0), ("decoder", "decoder64xla", 300.0),
               ("base", "base192", 420.0)]
    for attr, stage, cap in retries:
        if getattr(b, attr) is None and b.remaining() > 60:
            got = run_stage(stage, min(cap, b.remaining() - 20.0))
            if got:
                setattr(b, attr, got)
                b.notes.append(f"{stage} recovered on retry")
                b.emit()

    # 7. e2e completion pass: if phase 1 was skipped, failed, or stopped
    # before the contract metric, spend the leftover budget finishing it —
    # the first attempt's compiles persist in the cache, so the retry
    # resumes far faster than it started.
    e2e_done = bool(b.e2e) and _E2E_CONTRACT_KEY in b.e2e
    if not e2e_done and b.remaining() > 120:
        again = run_e2e(b.remaining() - 20.0)
        if again and (not b.e2e
                      or len(again) >= len(b.e2e)
                      or _E2E_CONTRACT_KEY in again):
            b.e2e = again
        e2e_done = bool(b.e2e) and _E2E_CONTRACT_KEY in b.e2e
    if not e2e_done:
        b.notes.append(
            "e2e get_many stage incomplete "
            f"(phase={b.e2e.get('phase', 'none') if b.e2e else 'none'}; "
            f"{LAST_FAILURE.get('e2e', '?')})")

    b.emit(final=True)


if __name__ == "__main__":
    main()
