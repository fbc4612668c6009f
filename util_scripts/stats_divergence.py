"""Quantify the synthetic-map stats fallback divergence.

The conditioning distribution of generated worlds is set by the
quantile-matching stats (reference `inference/synthetic_map.py:134-180`):
without the reference's `synthetic_map_stats.json` (built from the
ETOPO/WorldClim rasters, unobtainable in this environment), the framework
falls back to parametric default tables (`data/default_stats.py`).

This script turns that divergence from an adjective into numbers.  Given a
reference-format stats JSON it reports, per coarse channel:

- quantile-table RMSE between the JSON's data tables and the defaults,
  normalized by the JSON channel's std (scale-free), and
- the conditioning-field histogram distance actually induced: both stats
  drive the SAME Perlin field through `transform_perlin`, and we report the
  Wasserstein-1 distance between the two value distributions, again
  normalized by channel std.

Usage:
    python util_scripts/stats_divergence.py path/to/synthetic_map_stats.json
        [--drop-water-pct 0.5] [--frequency-mult 1.5,3,3,3,3]

Run it the moment a stats file (or the rasters to build one via
`python -m terrain_diffusion_tpu build-synthetic-stats`) becomes available,
and record the table in BENCH_NOTES.md.
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np

CHANNELS = ["elev", "temp", "temp_std", "precip", "precip_cv"]


def _quantile_rmse(a, b, n: int = 256):
    """RMSE between two quantile functions evaluated on a common p-grid."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    p = (np.arange(n) + 0.5) / n
    qa = np.interp(p, np.linspace(0, 1, len(a)), a)
    qb = np.interp(p, np.linspace(0, 1, len(b)), b)
    return float(np.sqrt(np.mean((qa - qb) ** 2)))


def _field_w1(stats_a, stats_b, ch: int, freq: float, octaves: int,
              lac: float, gain: float, size: int = 512):
    """Wasserstein-1 between conditioning fields generated from two stats
    tables over the same Perlin field."""
    from terrain_diffusion_tpu.ops.perlin import perlin_fbm
    from terrain_diffusion_tpu.pipeline.quantiles import transform_perlin

    xs = np.arange(size, dtype=np.float32)
    xx, yy = np.meshgrid(xs, xs)
    vals = perlin_fbm(ch + 1, freq, octaves, lac, gain, xx.ravel(), yy.ravel())

    def tf(stats):
        nq = np.asarray(stats[f"noise_quantiles_{ch}"], np.float64)
        bq = np.asarray(stats[f"base_image_quantiles_{ch}"], np.float64)
        return np.sort(transform_perlin(vals, nq, bq))

    a, b = tf(stats_a), tf(stats_b)
    return float(np.mean(np.abs(a - b)))


def compare(ref_stats: dict, drop_water_pct: float, frequency_mult) -> list[dict]:
    from terrain_diffusion_tpu.data.default_stats import default_stats
    from terrain_diffusion_tpu.pipeline.synthetic_map import (_MAP_CONFIGS,
                                                              _noise_quantiles)

    defaults = default_stats(drop_water_pct)
    rows = []
    for ch, (fb, octaves, lac, gain) in enumerate(_MAP_CONFIGS):
        freq = fb * frequency_mult[ch]
        for stats in (ref_stats, defaults):
            if stats.get(f"noise_quantiles_{ch}") is None:
                stats[f"noise_quantiles_{ch}"] = _noise_quantiles(
                    freq, octaves, lac, gain)
        ref_q = np.asarray(ref_stats[f"base_image_quantiles_{ch}"], np.float64)
        std = max(float(np.std(ref_q)), 1e-9)
        rows.append({
            "channel": CHANNELS[ch],
            "quantile_rmse": _quantile_rmse(
                ref_q, defaults[f"base_image_quantiles_{ch}"]),
            "quantile_rmse_over_std": _quantile_rmse(
                ref_q, defaults[f"base_image_quantiles_{ch}"]) / std,
            "field_w1_over_std": _field_w1(ref_stats, defaults, ch, freq,
                                           octaves, lac, gain) / std,
        })
    return rows


def load_reference_json(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    stats = {
        "a_temp_std": float(data["a_temp_std"]),
        "b_temp_std": float(data["b_temp_std"]),
        "temp_std_p1": float(data["temp_std_p1"]),
        "temp_std_p99": float(data["temp_std_p99"]),
    }
    for i, q in enumerate(data["noise_quantile_tables"]):
        stats[f"noise_quantiles_{i}"] = np.asarray(q, np.float64)
    for i, q in enumerate(data["data_quantile_tables"]):
        stats[f"base_image_quantiles_{i}"] = np.asarray(q, np.float64)
    return stats


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("stats_json")
    ap.add_argument("--drop-water-pct", type=float, default=0.5)
    ap.add_argument("--frequency-mult", default="1.5,3,3,3,3")
    args = ap.parse_args(argv)
    fm = [float(x) for x in args.frequency_mult.split(",")]

    rows = compare(load_reference_json(args.stats_json),
                   args.drop_water_pct, fm)
    hdr = f"{'channel':<10} {'q-RMSE':>12} {'q-RMSE/std':>12} {'W1/std':>10}"
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        print(f"{r['channel']:<10} {r['quantile_rmse']:>12.4f} "
              f"{r['quantile_rmse_over_std']:>12.4f} "
              f"{r['field_w1_over_std']:>10.4f}")
    print(json.dumps(rows))
    return rows


if __name__ == "__main__":
    main(sys.argv[1:])
