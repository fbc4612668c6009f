"""Terrain REST API — signature- and wire-compatible with the reference
(`inference/api.py:13-254`, `API_README.md`):

- ``GET /health``                      -> {"status": "ok"}
- ``GET /seed`` / ``POST /seed``       -> current / changed world seed
- ``GET /terrain?i1&j1&i2&j2&scale[&seed]`` -> binary int16-LE elevation
  (H*W*2 bytes, floored meters, clamped) followed by float32-LE interleaved
  (H, W, 4) climate [temp, t_season, precip, p_cv]; X-Height/X-Width headers.

Supersampling ``scale > 1`` fetches the padded native region and bilinearly
upsamples (reference `_get_terrain`, `api.py:103-166`).
Single-threaded by design (same concurrency contract as the reference).
"""
from __future__ import annotations

import os
from typing import Optional

import click
import numpy as np

from terrain_diffusion_tpu.common.cli_helpers import parse_cache_size, parse_kwargs
from terrain_diffusion_tpu.serving.httpd import App, Response, jsonify

app = App("terrain-api")

_PIPELINE = None
_PIPELINE_CONFIG: dict = {}


def _get_pipeline():
    global _PIPELINE
    if _PIPELINE is not None:
        return _PIPELINE
    from terrain_diffusion_tpu.pipeline.world import WorldPipeline

    cfg = _PIPELINE_CONFIG
    caching_strategy = cfg.get("caching_strategy", "direct")
    if cfg.get("pipeline") is not None:  # injected (tests)
        _PIPELINE = cfg["pipeline"]
    else:
        _PIPELINE = WorldPipeline.from_pretrained(
            cfg.get("model_path"),
            seed=cfg.get("seed"),
            latents_batch_size=cfg.get("latents_batch_size", 4),
            log_mode=cfg.get("log_mode", "verbose"),
            dtype=cfg.get("dtype"),
            caching_strategy=caching_strategy,
            cache_limit=cfg.get("cache_limit"),
            **cfg.get("kwargs", {}),
        )
    if _PIPELINE.tile_store is None:
        hdf5_file = cfg.get("hdf5_file")
        if caching_strategy == "direct":
            _PIPELINE.bind(hdf5_file=hdf5_file)
        else:
            _PIPELINE.bind(hdf5_file or "TEMP")
    if cfg.get("coalesce"):
        from terrain_diffusion_tpu.serving.coalesce import CoalescedPipeline

        _PIPELINE = CoalescedPipeline(_PIPELINE,
                                      max_batch=cfg.get("coalesce_max_batch", 16))
    print(f"World seed: {_PIPELINE.seed}")
    return _PIPELINE


def _parse_quad(req):
    vals = []
    for name in ("i1", "j1", "i2", "j2"):
        v = req.args.get(name, type=int)
        if v is None:
            raise ValueError(f"Missing required query param '{name}'")
        vals.append(v)
    i1, j1, i2, j2 = vals
    if i2 <= i1 or j2 <= j1:
        raise ValueError("Expected i2>i1 and j2>j1")
    return i1, j1, i2, j2


def _elev_to_int16(elev: np.ndarray) -> np.ndarray:
    if elev.dtype == np.int16:  # already packed on device (pack_wire path)
        return elev.astype("<i2", copy=False)
    trans = np.floor(elev.astype(np.float32, copy=False))
    return np.clip(trans, -32768, 32767).astype("<i2", copy=False)


def _binary_response(elev: np.ndarray, climate: Optional[np.ndarray]) -> Response:
    elev_i16 = _elev_to_int16(elev)
    h, w = elev_i16.shape
    payload = elev_i16.tobytes()
    if climate is not None and climate.shape[0] >= 4:
        climate_np = np.transpose(climate[:4].astype("<f4", copy=False), (1, 2, 0))
        payload += climate_np.tobytes()
    return Response(payload, mimetype="application/octet-stream",
                    headers={"X-Height": str(h), "X-Width": str(w)})


def _bilinear_up(arr: np.ndarray, scale: int) -> np.ndarray:
    import jax.numpy as jnp

    from terrain_diffusion_tpu.ops.image import resize_bilinear

    lead = arr.shape[:-2]
    h, w = arr.shape[-2:]
    out = resize_bilinear(jnp.asarray(arr), (h * scale, w * scale))
    return np.asarray(out, dtype=np.float32).reshape(*lead, h * scale, w * scale)


def get_terrain(world, i1: int, j1: int, i2: int, j2: int, scale: int,
                seed: int | None = None) -> dict:
    """Terrain at arbitrary scale (target coords); scale>1 supersamples.

    `seed` rides inside the terrain job on coalesced pipelines so the
    request is atomic under concurrent seed changes; plain pipelines get a
    change_seed first (single-threaded serving, no race)."""
    kw = {}
    if seed is not None:
        if hasattr(world, "_coalescer"):
            kw["seed"] = seed
        elif world.change_seed(seed):
            print(f"World seed changed to: {world.seed}")
    if scale == 1:
        # pack the wire formats on device: int16 elevation (bit-identical
        # to _elev_to_int16) and f16 climate — halves tunnel/PCIe fetch
        # bytes per query
        out = world.get(i1, j1, i2, j2, with_climate=True, pack_wire=True,
                        **kw)
        return {"elev": out["elev"], "climate": out.get("climate")}
    i1n, j1n = i1 // scale, j1 // scale
    i2n, j2n = -(-i2 // scale), -(-j2 // scale)
    out_native = world.get(i1n - 1, j1n - 1, i2n + 1, j2n + 1,
                           with_climate=True, **kw)
    out_h, out_w = i2 - i1, j2 - j1
    pad_up = scale
    off_i = i1 - i1n * scale
    off_j = j1 - j1n * scale
    ci, cj = pad_up + off_i, pad_up + off_j
    elev = _bilinear_up(out_native["elev"], scale)[ci:ci + out_h, cj:cj + out_w]
    climate = None
    if out_native.get("climate") is not None:
        climate = _bilinear_up(out_native["climate"], scale)[:, ci:ci + out_h, cj:cj + out_w]
    return {"elev": elev, "climate": climate}


@app.get("/health")
def health(req):
    return jsonify({"status": "ok"})


@app.get("/seed")
def get_seed(req):
    return jsonify({"seed": _get_pipeline().seed})


@app.post("/seed")
def post_seed(req):
    world = _get_pipeline()
    body = req.get_json(silent=True) or {}
    world.change_seed(body.get("seed"))
    return jsonify({"seed": world.seed})


@app.get("/terrain")
def terrain(req):
    try:
        i1, j1, i2, j2 = _parse_quad(req)
        scale = req.args.get("scale", default=1, type=int)
        if scale < 1:
            raise ValueError("scale must be >= 1")
        world = _get_pipeline()
        seed = req.args.get("seed", type=int)
        out = get_terrain(world, i1, j1, i2, j2, scale, seed=seed)
        return _binary_response(out["elev"], out.get("climate"))
    except Exception as e:  # noqa: BLE001 — same error surface as reference
        return jsonify({"error": str(e)}, 400)


def configure(**config):
    """Set the module-level pipeline config (used by CLI and tests)."""
    global _PIPELINE, _PIPELINE_CONFIG
    _PIPELINE = None
    _PIPELINE_CONFIG = config


@click.command()
@click.argument("model_path")
@click.option("--caching-strategy", type=click.Choice(["indirect", "direct"]), default="direct")
@click.option("--hdf5-file", default=None)
@click.option("--cache-size", default="100M")
@click.option("--seed", type=int, default=None)
@click.option("--batch-size", type=str, default="1,4")
@click.option("--log-mode", type=click.Choice(["info", "verbose"]), default="verbose")
@click.option("--dtype", type=click.Choice(["fp32", "bf16", "fp16"]), default="fp32")
@click.option("--host", default="0.0.0.0")
@click.option("--port", type=int, default=int(os.getenv("PORT", "8000")))
@click.option("--threaded/--no-threaded", default=False,
              help="Accept concurrent clients; their tile requests coalesce "
                   "into shared stage batches (one generation pass serves "
                   "all in-flight queries)")
@click.option("--warmup/--no-warmup", default=False,
              help="Precompile serving programs before accepting clients")
@click.option("--kwarg", "extra_kwargs", multiple=True,
              help="Additional key=value pipeline kwargs")
def main(model_path, caching_strategy, hdf5_file, cache_size, seed, batch_size,
         log_mode, dtype, host, port, threaded, warmup, extra_kwargs):
    """Terrain API server."""
    if caching_strategy == "indirect" and hdf5_file is None:
        hdf5_file = "TEMP"
    if "," in batch_size:
        batch_sizes = [int(x.strip()) for x in batch_size.split(",")]
    else:
        batch_sizes = int(batch_size)
    configure(
        model_path=model_path,
        hdf5_file=hdf5_file,
        caching_strategy=caching_strategy,
        cache_limit=parse_cache_size(cache_size),
        seed=seed,
        latents_batch_size=batch_sizes,
        log_mode=log_mode,
        dtype=None if dtype == "fp32" else dtype,
        kwargs=parse_kwargs(extra_kwargs),
        coalesce=threaded,
    )
    pipe = _get_pipeline()
    if warmup:
        print("Warming up serving programs ...")
        print(f"Warmup done: {pipe.warmup()}")
    app.run(host=host, port=port, threaded=threaded, serialize=not threaded)


if __name__ == "__main__":
    main()
