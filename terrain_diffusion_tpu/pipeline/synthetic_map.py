"""Synthetic conditioning map: Perlin FBm fields quantile-matched to global
terrain/climate distributions, plus climate-consistency finalization.

Functional rebuild of reference `inference/synthetic_map.py:182-271`:
five FBm fields (elev / temp / temp-seasonality / precip / precip-CV) with
per-channel frequency multipliers, quantile-matched to data distributions,
then `finalize` applies lapse-rate temperature adjustment, sub-20C stretch,
seasonality re-baselining and precip-CV damping.

Stats come from (in priority order) an explicit stats dict, the reference's
JSON cache format (`data/global/synthetic_map_stats.json`), or the built-in
defaults (`terrain_diffusion_tpu.data.default_stats`).  Noise-side quantile
tables are always computed exactly from our Perlin implementation.
"""
from __future__ import annotations

import json
import os
import random

import click
import numpy as np

from terrain_diffusion_tpu.ops.perlin import perlin_fbm
from terrain_diffusion_tpu.pipeline.quantiles import build_quantiles, transform_perlin

STATS_CACHE_PATH = "data/global/synthetic_map_stats.json"

_MAP_CONFIGS = [  # (freq_base, octaves, lacunarity, gain) per channel
    (0.05, 4, 2.0, 0.5),
    (0.05, 2, 2.0, 0.5),
    (0.05, 4, 2.0, 0.5),
    (0.05, 4, 2.0, 0.5),
    (0.05, 4, 2.0, 0.5),
]

_NOISE_Q_CACHE: dict = {}


def _noise_quantiles(freq: float, octaves: int, lacunarity: float, gain: float) -> np.ndarray:
    """Exact FBm value-distribution quantiles (1024x1024 grid, fixed seed 1;
    the distribution is seed-independent, reference `synthetic_map.py:45-51`)."""
    key = (round(freq, 9), octaves, lacunarity, gain)
    if key not in _NOISE_Q_CACHE:
        size = 32 * 1024
        xs = np.arange(0, size, 32, dtype=np.float32)
        xx, yy = np.meshgrid(xs, xs)
        vals = perlin_fbm(1, freq, octaves, lacunarity, gain, xx.ravel(), yy.ravel())
        _NOISE_Q_CACHE[key] = build_quantiles(vals, n_quantiles=64, eps=1e-4)
    return _NOISE_Q_CACHE[key]


def load_stats_cache(path: str = STATS_CACHE_PATH, expect_params=None):
    """Read the reference's JSON stats cache format (`synthetic_map.py:134-157`).

    `expect_params` ({"drop_water_pct", "frequency_mult"}) rejects a cache
    whose recorded build parameters differ — the quantile tables bake those
    in, so a mismatched cache would silently serve a different conditioning
    distribution than the persisted world parameters.  Caches without a
    params record (reference-format / pre-existing) are accepted as-is.
    """
    if not os.path.exists(path):
        return None
    try:
        with open(path, "r", encoding="utf-8") as f:
            data = json.load(f)
        if expect_params is not None and "params" in data:
            got = data["params"]
            want = {k: (list(v) if isinstance(v, (list, tuple)) else v)
                    for k, v in expect_params.items()}
            if any(got.get(k) != want[k] for k in want):
                print(f"[synthetic_map] stats cache {path} was built with "
                      f"{got}, requested {want}: ignoring the cache")
                return None
        stats = {
            "a_temp_std": float(data["a_temp_std"]),
            "b_temp_std": float(data["b_temp_std"]),
            "temp_std_p1": float(data["temp_std_p1"]),
            "temp_std_p99": float(data["temp_std_p99"]),
        }
        for i, q in enumerate(data["data_quantile_tables"]):
            stats[f"base_image_quantiles_{i}"] = np.asarray(q, dtype=np.float64)
        for i, q in enumerate(data.get("noise_quantile_tables", [])):
            stats[f"noise_quantiles_{i}"] = np.asarray(q, dtype=np.float64)
        return stats
    except Exception:
        return None


def save_stats_cache(stats: dict, path: str = STATS_CACHE_PATH, params=None):
    if os.path.dirname(path):  # bare filenames have no directory to create
        os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "n_quantiles": 64,
        "noise_quantile_tables": [
            np.asarray(stats[f"noise_quantiles_{i}"]).tolist()
            for i in range(5) if f"noise_quantiles_{i}" in stats
        ],
        "data_quantile_tables": [
            np.asarray(stats[f"base_image_quantiles_{i}"]).tolist() for i in range(5)
        ],
        "a_temp_std": float(stats["a_temp_std"]),
        "b_temp_std": float(stats["b_temp_std"]),
        "temp_std_p1": float(stats["temp_std_p1"]),
        "temp_std_p99": float(stats["temp_std_p99"]),
    }
    if params is not None:
        payload["params"] = {
            k: (list(v) if isinstance(v, (list, tuple)) else v)
            for k, v in params.items()}
    with open(path, "w", encoding="utf-8") as f:
        json.dump(payload, f)


RASTER_FILES = {  # reference `synthetic_map.py:54-58`
    "elev": "etopo_10m.tif",
    "temp": "wc2.1_10m_bio_1.tif",
    "temp_std": "wc2.1_10m_bio_4.tif",
    "precip": "wc2.1_10m_bio_12.tif",
    "precip_cv": "wc2.1_10m_bio_15.tif",
}


def compute_map_stats(frequency_mult=(1.0, 1.0, 1.0, 1.0, 1.0),
                      drop_water_pct: float = 0.0,
                      data_dir: str = "data/global") -> dict:
    """Recompute quantile-matching stats from global rasters — the
    reference's exact builder (`synthetic_map.py:45-132`): ETOPO elevation +
    four WorldClim bio layers, polar sixths cropped, nodata masked,
    temp-seasonality re-baselined by a linear fit on temperature, lapse-rate
    sea-level temperature, 0.1/99.9 seasonality percentiles, 64-knot
    empirical quantile tables with a drop-water histogram mask on elevation.

    Noise-side quantiles come from our Perlin FBm on the same 1024x1024
    sample lattice (seed-independent distribution).  Rasters are read with
    the first-party GeoTIFF reader (no GDAL); download them once with
    `data/downloading` tooling or place the files in ``data_dir``.
    """
    def read(name):
        path = os.path.join(data_dir, RASTER_FILES[name])
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{path} missing - synthetic-map stats need the ETOPO/"
                "WorldClim rasters (see RASTER_FILES)")
        from terrain_diffusion_tpu.common.geotiff import read_geotiff

        arr, _t, nodata = read_geotiff(path)
        img = np.asarray(arr, dtype=np.float64)
        h = img.shape[0]
        img = img[h // 6: h - h // 6, :]  # crop polar sixths
        img[img < -30000] = np.nan
        if nodata is not None:
            img[img == nodata] = np.nan
        return img

    elev = read("elev")
    temp = read("temp")
    temp_std = read("temp_std")
    precip = read("precip")
    precip_cv = read("precip_cv")

    # joint mask: WorldClim layers have per-layer nodata (coastline/ice
    # differences) and polyfit/percentile are not NaN-aware
    valid = ~np.isnan(temp) & ~np.isnan(temp_std)
    a_temp_std, b_temp_std = np.polyfit(temp[valid], temp_std[valid], 1)
    temp_std = temp_std - (a_temp_std * temp + b_temp_std)

    lapse = np.clip(-6.5 + 0.0015 * precip, -9.8, -4.0) / 1000
    temp = temp - lapse * np.maximum(0, elev)

    temp_std_p1 = np.percentile(temp_std[valid], 0.1)
    temp_std_p99 = np.percentile(temp_std[valid], 99.9)

    rng = np.random.default_rng(0)
    hist_mask = np.logical_or(rng.random(elev.shape) > drop_water_pct,
                              elev >= 0)
    stats = {
        "a_temp_std": float(a_temp_std),
        "b_temp_std": float(b_temp_std),
        "temp_std_p1": float(temp_std_p1),
        "temp_std_p99": float(temp_std_p99),
    }
    images = [(elev, hist_mask), (temp, None), (temp_std, None),
              (precip, None), (precip_cv, None)]
    for i, ((freq_base, octaves, lac, gain), (img, mask)) in enumerate(
            zip(_MAP_CONFIGS, images)):
        freq = freq_base * frequency_mult[i]
        stats[f"noise_quantiles_{i}"] = _noise_quantiles(
            freq, octaves, lac, gain)
        vals = img[mask] if mask is not None else img
        stats[f"base_image_quantiles_{i}"] = build_quantiles(
            vals, n_quantiles=64, eps=1e-4)
    return stats


def make_synthetic_map_factory(
    frequency_mult=(1.0, 1.0, 1.0, 1.0, 1.0),
    seed: int | None = None,
    drop_water_pct: float = 0.0,
    stats: dict | None = None,
    stats_path: str = STATS_CACHE_PATH,
):
    """Returns ``sample(i1, j1, i2, j2) -> (5, i2-i1, j2-j1) float32`` with
    ``.sample_raw`` and ``.finalize`` attributes (reference API surface).

    NOTE on coordinate order: like the reference, the factory's public
    callables take (i1, j1, i2, j2) and evaluate noise on a meshgrid such
    that the output is shaped (i2-i1, j2-j1).
    """
    # One shared base seed (the reference's `seed or randint` draws a NEW
    # random base per channel when seed is None, and treats the legitimate
    # world seed 0 as unseeded — both silently break world reproducibility;
    # identical results for every seed > 0)
    base_seed = seed if seed is not None else random.randint(0, 2**30)
    actual_seeds = [(base_seed + i + 1) & 0x7FFFFFFF for i in range(5)]
    if stats is None:
        stats = load_stats_cache(stats_path, expect_params={
            "drop_water_pct": drop_water_pct,
            "frequency_mult": list(frequency_mult)})
    if stats is None:
        from terrain_diffusion_tpu.data.default_stats import default_stats

        stats = default_stats(drop_water_pct)

    a_temp_std = float(stats["a_temp_std"])
    b_temp_std = float(stats["b_temp_std"])
    temp_std_p1 = float(stats["temp_std_p1"])
    temp_std_p99 = float(stats["temp_std_p99"])

    chans = []
    for i, (freq_base, octaves, lac, gain) in enumerate(_MAP_CONFIGS):
        freq = freq_base * frequency_mult[i]
        # Noise quantile tables are ALWAYS recomputed from this repo's own
        # Perlin rather than trusted from the stats source: the table is a
        # pure function of (noise implementation, freq, octaves, lac, gain)
        # — seed-independent — so recomputing is semantically identical
        # when the implementations match, and corrective when they differ
        # by a uniform scale (e.g. the FastNoiseLite fractal-bounding
        # statement-order ambiguity, ops/perlin.py::fractal_bounding).
        # The data-side tables (real-raster quantiles) are taken from the
        # stats source verbatim — they are the valuable, impl-independent
        # part.
        nq = _noise_quantiles(freq, octaves, lac, gain)
        bq = np.asarray(stats[f"base_image_quantiles_{i}"], dtype=np.float64)
        chans.append((actual_seeds[i], freq, octaves, lac, gain, np.asarray(nq), bq))

    def _sample_channel(ch, i1, j1, i2, j2):
        # Effective field: value at world cell (i, j) = FBm(x=j, y=i) — the
        # same field the reference produces after its caller-side coordinate
        # swap (`world_pipeline.py:822-828`).  Unlike the reference factory,
        # this is position-consistent for non-square regions too.
        s, freq, octaves, lac, gain, nq, bq = ch
        ys, xs = np.meshgrid(
            np.arange(i1, i2, dtype=np.float32),
            np.arange(j1, j2, dtype=np.float32), indexing="ij")
        vals = perlin_fbm(s, freq, octaves, lac, gain, xs.ravel(), ys.ravel())
        vals = transform_perlin(vals, nq, bq)
        return vals.reshape(i2 - i1, j2 - j1).astype(np.float32)

    def sample_raw(i1, j1, i2, j2) -> np.ndarray:
        return np.stack([_sample_channel(c, i1, j1, i2, j2) for c in chans], axis=0)

    def finalize(raw_map) -> np.ndarray:
        elev = np.asarray(raw_map[0], dtype=np.float32)
        temp = np.asarray(raw_map[1], dtype=np.float32)
        temp_std = np.asarray(raw_map[2], dtype=np.float32)
        precip = np.asarray(raw_map[3], dtype=np.float32)
        precip_std = np.asarray(raw_map[4], dtype=np.float32)

        lapse_rate = np.clip(-6.5 + 0.0015 * precip, -9.8, -4.0) / 1000
        temp = temp + lapse_rate * np.maximum(0, elev)
        temp = np.clip(temp, -10, 40)
        temp = np.where(temp > 20, temp, (temp - 20) * 1.25 + 20)

        t = (temp_std - temp_std_p1) / (temp_std_p99 - temp_std_p1)
        baseline = np.maximum(temp_std_p1, -(a_temp_std * temp + b_temp_std))
        temp_std = t * (temp_std_p99 - baseline) + baseline
        temp_std = temp_std + (a_temp_std * temp + b_temp_std)
        temp_std = np.maximum(temp_std, 20)

        precip_std = precip_std * np.maximum(0, (185 - 0.04111 * precip) / 185)
        return np.stack([elev, temp, temp_std, precip, precip_std], axis=0)

    def sample_full(i1, j1, i2, j2) -> np.ndarray:
        m = finalize(sample_raw(i1, j1, i2, j2))
        m[0] = np.sign(m[0]) * np.sqrt(np.abs(m[0]))
        return m.astype(np.float32)

    sample_full.sample_raw = sample_raw
    sample_full.finalize = finalize
    return sample_full


@click.command("build-synthetic-stats")
@click.option("--data-dir", default="data/global",
              help="directory with the ETOPO/WorldClim rasters")
@click.option("--out", default=STATS_CACHE_PATH)
@click.option("--frequency-mult", default="1.5,3,3,3,3",
              help="per-channel frequency multipliers")
@click.option("--drop-water-pct", type=float, default=0.5)
def build_stats_main(data_dir, out, frequency_mult, drop_water_pct):
    """Recompute the synthetic-map quantile stats from global rasters and
    write the JSON cache (replaces the parametric default tables with the
    reference-exact conditioning distributions)."""
    fm = [float(x) for x in frequency_mult.split(",")]
    stats = compute_map_stats(fm, drop_water_pct, data_dir)
    save_stats_cache(stats, out, params={"drop_water_pct": drop_water_pct,
                                         "frequency_mult": fm})
    print(f"wrote {out} (a={stats['a_temp_std']:.4f} "
          f"b={stats['b_temp_std']:.2f} "
          f"p1={stats['temp_std_p1']:.2f} p99={stats['temp_std_p99']:.2f})")
