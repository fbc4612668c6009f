"""Perlin FBm + synthetic conditioning map tests."""
import numpy as np
import pytest

from terrain_diffusion_tpu.ops import perlin as pl
from terrain_diffusion_tpu.pipeline.quantiles import build_quantiles, transform_perlin
from terrain_diffusion_tpu.pipeline.synthetic_map import make_synthetic_map_factory


def test_perlin_np_properties():
    xs, ys = np.meshgrid(np.arange(64, dtype=np.float32), np.arange(64, dtype=np.float32))
    v = pl.perlin_fbm_np(3, 0.05, 4, 2.0, 0.5, xs.ravel(), ys.ravel()).reshape(64, 64)
    assert v.shape == (64, 64)
    assert np.abs(v).max() <= 1.01  # exact fractal bounding keeps |v| <= ~1
    assert v.std() > 0.05
    # determinism + seed sensitivity
    v2 = pl.perlin_fbm_np(3, 0.05, 4, 2.0, 0.5, xs.ravel(), ys.ravel()).reshape(64, 64)
    np.testing.assert_array_equal(v, v2)
    v3 = pl.perlin_fbm_np(4, 0.05, 4, 2.0, 0.5, xs.ravel(), ys.ravel()).reshape(64, 64)
    assert not np.array_equal(v, v3)
    # smoothness: neighboring samples highly correlated at low frequency
    d = np.abs(np.diff(v, axis=0)).mean()
    assert d < 0.1


def test_perlin_native_matches_numpy():
    from terrain_diffusion_tpu import native

    if native.lib is None:
        pytest.skip("native unavailable")
    xs = np.linspace(-100, 100, 500).astype(np.float32)
    ys = np.linspace(50, -70, 500).astype(np.float32)
    a = pl.perlin_fbm_np(7, 0.05, 4, 2.0, 0.5, xs, ys)
    b = native.lib.perlin_fbm_coords(7, 0.05, 4, 2.0, 0.5, xs, ys)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_perlin_jax_matches_numpy():
    import jax.numpy as jnp

    xs = np.linspace(-50, 80, 300).astype(np.float32)
    ys = np.linspace(-30, 60, 300).astype(np.float32)
    a = pl.perlin_fbm_np(11, 0.08, 3, 2.0, 0.5, xs, ys)
    b = np.asarray(pl.perlin_fbm_jax(11, 0.08, 3, 2.0, 0.5, jnp.asarray(xs), jnp.asarray(ys)))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_quantile_transform_roundtrip(rng):
    src = rng.standard_normal(100000)
    tgt = rng.gamma(2.0, 3.0, 100000)
    sq = build_quantiles(src, 64)
    tq = build_quantiles(tgt, 64)
    out = transform_perlin(src, sq, tq)
    # output distribution close to target
    assert abs(np.median(out) - np.median(tgt)) < 0.3
    assert out.min() >= tq[0] and out.max() <= tq[-1]


def test_synthetic_map_factory():
    f = make_synthetic_map_factory(seed=42, frequency_mult=[1.5, 3, 3, 3, 3],
                                   drop_water_pct=0.5)
    m = f(0, 0, 64, 64)
    assert m.shape == (5, 64, 64)
    # channel 0 is signed-sqrt elevation: plausible range
    assert -110 < m[0].min() and m[0].max() < 100
    # temp within clip+stretch range
    assert m[1].min() >= -17.6 and m[1].max() <= 40.1
    # temp_std floor
    assert m[2].min() >= 20
    assert m[3].min() >= 0  # precip nonnegative

    raw = f.sample_raw(0, 0, 32, 32)
    assert raw.shape == (5, 32, 32)
    fin = f.finalize(raw)
    assert fin.shape == (5, 32, 32)

    # crop consistency (seed-position determinism)
    m2 = f(10, 20, 40, 50)
    np.testing.assert_allclose(m[:, 10:40, 20:50], m2, atol=1e-5)

    # different seeds differ
    g = make_synthetic_map_factory(seed=43)
    assert not np.allclose(g(0, 0, 16, 16), f(0, 0, 16, 16))


def test_compute_map_stats_from_rasters(tmp_path):
    """The recompute-from-rasters stats builder (reference
    `synthetic_map.py:45-132`): synthetic ETOPO/WorldClim rasters written
    with the first-party GeoTIFF writer drive the full pipeline — polyfit
    re-baseline, lapse-rate sea-level temp, percentiles, drop-water-masked
    64-knot quantile tables — and the resulting stats round-trip through
    the JSON cache into a working factory."""
    from terrain_diffusion_tpu.common.geotiff import write_geotiff
    from terrain_diffusion_tpu.pipeline.synthetic_map import (
        compute_map_stats, load_stats_cache, make_synthetic_map_factory,
        save_stats_cache, RASTER_FILES)

    rng = np.random.default_rng(0)
    H, W = 120, 240
    lat = np.linspace(60, -60, H)[:, None] * np.ones((1, W))
    elev = (rng.normal(-2000, 2500, (H, W)) +
            3000 * np.exp(-((lat / 30) ** 2)))
    temp = 28 - 0.45 * np.abs(lat) + rng.normal(0, 2, (H, W))
    temp_std = 120 + 14 * np.abs(lat) + rng.normal(0, 40, (H, W))
    precip = np.maximum(rng.normal(900, 500, (H, W)), 0)
    precip_cv = np.maximum(rng.normal(60, 25, (H, W)), 1)
    data = {"elev": elev, "temp": temp, "temp_std": temp_std,
            "precip": precip, "precip_cv": precip_cv}
    for name, arr in data.items():
        write_geotiff(str(tmp_path / RASTER_FILES[name]),
                      arr.astype(np.float32))

    stats = compute_map_stats((1.0,) * 5, drop_water_pct=0.5,
                              data_dir=str(tmp_path))
    # polyfit recovered the seasonality-latitude trend through temperature
    assert stats["a_temp_std"] < 0  # colder -> more seasonal
    assert stats["temp_std_p1"] < 0 < stats["temp_std_p99"]
    for i in range(5):
        q = stats[f"base_image_quantiles_{i}"]
        assert q.shape == (64,) and np.all(np.diff(q) > 0)
    # drop-water mask biases the elevation table landward vs unmasked
    stats_all = compute_map_stats((1.0,) * 5, drop_water_pct=0.0,
                                  data_dir=str(tmp_path))
    assert np.median(stats["base_image_quantiles_0"]) > np.median(
        stats_all["base_image_quantiles_0"])

    # JSON round trip -> factory consumes it
    cache = str(tmp_path / "stats.json")
    save_stats_cache(stats, cache)
    loaded = load_stats_cache(cache)
    np.testing.assert_allclose(loaded["base_image_quantiles_0"],
                               stats["base_image_quantiles_0"])
    f = make_synthetic_map_factory(seed=42, stats=loaded)
    m = f(0, 0, 32, 32)
    assert m.shape == (5, 32, 32) and np.isfinite(m).all()


def test_stats_divergence_script(tmp_path):
    """util_scripts/stats_divergence.py: zero distance vs itself, clearly
    nonzero vs a shifted/scaled stats table."""
    import json
    import sys

    sys.path.insert(0, "util_scripts")
    import stats_divergence as sd

    from terrain_diffusion_tpu.data.default_stats import default_stats
    from terrain_diffusion_tpu.pipeline.synthetic_map import _MAP_CONFIGS, _noise_quantiles

    fm = [1.5, 3, 3, 3, 3]
    stats = default_stats(0.5)
    noise_tables = []
    for i, (fb, octv, lac, gain) in enumerate(_MAP_CONFIGS):
        noise_tables.append(np.asarray(
            _noise_quantiles(fb * fm[i], octv, lac, gain), np.float64).tolist())
    payload = {
        "n_quantiles": 64,
        "noise_quantile_tables": noise_tables,
        "data_quantile_tables": [
            np.asarray(stats[f"base_image_quantiles_{i}"], np.float64).tolist()
            for i in range(5)],
        "a_temp_std": stats["a_temp_std"], "b_temp_std": stats["b_temp_std"],
        "temp_std_p1": stats["temp_std_p1"], "temp_std_p99": stats["temp_std_p99"],
    }
    p_same = tmp_path / "same.json"
    p_same.write_text(json.dumps(payload))
    rows = sd.compare(sd.load_reference_json(str(p_same)), 0.5, fm)
    for r in rows:
        assert r["quantile_rmse"] < 1e-9
        assert r["field_w1_over_std"] < 1e-9

    shifted = dict(payload)
    shifted["data_quantile_tables"] = [
        (np.asarray(t) * 1.3 + 5.0).tolist()
        for t in payload["data_quantile_tables"]]
    p_shift = tmp_path / "shift.json"
    p_shift.write_text(json.dumps(shifted))
    rows = sd.compare(sd.load_reference_json(str(p_shift)), 0.5, fm)
    for r in rows:
        assert r["quantile_rmse_over_std"] > 0.01
        assert r["field_w1_over_std"] > 0.01


# ---------------------------------------------------------------------------
# Independent anchor for FastNoiseLite equivalence (round 5).
#
# pyfastnoiselite is not installable here, so every in-repo Perlin variant
# (numpy/C++/JAX) descends from one transcription — a shared transcription
# bug would be invisible to their cross-checks.  The scalar implementation
# below is a second, self-contained derivation of FastNoiseLite's 2-D
# Perlin FBm written directly from the published algorithm (Auburn/
# FastNoiseLite: hash primes 501125321/1136930381, hash mult 0x27d4eb2d,
# 32-bit wrapping int arithmetic, quintic smoothing, the 24-direction
# gradient table at 82.5-15k degrees cycled over 128 pairs, the 1.42476911
# single-noise scale, seed++ per octave, and CalculateFractalBounding's
# multiply-before-accumulate loop).  It imports nothing from ops/perlin.
# ---------------------------------------------------------------------------

def _fnl_scalar_fbm(seed, freq, octaves, lacunarity, gain, x, y):
    import math

    def i32(v):
        return ((v + 0x80000000) & 0xFFFFFFFF) - 0x80000000

    def imul32(a, b):
        return i32((a * b) & 0xFFFFFFFF)

    PRIME_X, PRIME_Y, HMULT = 501125321, 1136930381, 0x27D4EB2D
    dirs = [(math.cos(math.radians(82.5 - 15.0 * k)),
             math.sin(math.radians(82.5 - 15.0 * k))) for k in range(24)]
    grad = []
    for i in range(128):
        grad.extend(dirs[i % 24])

    def grad_coord(seed, xp, yp, xd, yd):
        h = imul32(i32(seed ^ xp ^ yp), HMULT)
        h ^= h >> 15  # python's >> on negative ints is arithmetic, as C++
        h &= 127 << 1
        return xd * grad[h] + yd * grad[h | 1]

    def quintic(t):
        return t * t * t * (t * (t * 6 - 15) + 10)

    def single(seed, x, y):
        x0 = math.floor(x)
        y0 = math.floor(y)
        xd0, yd0 = x - x0, y - y0
        xd1, yd1 = xd0 - 1.0, yd0 - 1.0
        xs, ys = quintic(xd0), quintic(yd0)
        x0 = imul32(int(x0), PRIME_X)
        y0 = imul32(int(y0), PRIME_Y)
        x1, y1 = i32(x0 + PRIME_X), i32(y0 + PRIME_Y)
        xf0 = (1 - xs) * grad_coord(seed, x0, y0, xd0, yd0) \
            + xs * grad_coord(seed, x1, y0, xd1, yd0)
        xf1 = (1 - xs) * grad_coord(seed, x0, y1, xd0, yd1) \
            + xs * grad_coord(seed, x1, y1, xd1, yd1)
        return ((1 - ys) * xf0 + ys * xf1) * 1.4247691104677813

    # NOTE: the exact statement order of FastNoiseLite's
    # CalculateFractalBounding could not be verified offline (see
    # ops/perlin.py::fractal_bounding); this rederivation pins every OTHER
    # ingredient independently, and uses the exact-normalization order the
    # repo standardizes on.  The conditioning path is invariant to this
    # constant by construction.
    amp = abs(gain)
    amp_fractal = 1.0
    for _ in range(1, octaves):
        amp_fractal += amp
        amp *= abs(gain)
    x, y = x * freq, y * freq
    total, amp = 0.0, 1.0 / amp_fractal
    for i in range(octaves):
        total += single(i32(seed + i), x, y) * amp
        x *= lacunarity
        y *= lacunarity
        amp *= gain
    return total


def test_perlin_matches_independent_scalar_rederivation():
    """Golden-vector anchor that does not touch ops/perlin internals: 20
    random (seed, freq, octaves, lacunarity, gain) configs x 3 coordinates,
    f32-precision agreement with the blind scalar derivation above."""
    rng = np.random.default_rng(0)
    worst = 0.0
    for _ in range(20):
        seed = int(rng.integers(0, 2**31))
        freq = float(rng.uniform(0.01, 0.3))
        octaves = int(rng.integers(1, 5))
        lac = float(rng.uniform(1.5, 2.5))
        gain = float(rng.uniform(0.3, 0.7))
        xs = rng.uniform(-1000, 1000, 3).astype(np.float32)
        ys = rng.uniform(-1000, 1000, 3).astype(np.float32)
        got = np.asarray(pl.perlin_fbm(seed, freq, octaves, lac, gain, xs, ys),
                         np.float64)
        want = np.asarray([_fnl_scalar_fbm(seed, freq, octaves, lac, gain,
                                           float(x), float(y))
                           for x, y in zip(xs, ys)])
        worst = max(worst, float(np.max(np.abs(got - want))))
    assert worst < 5e-4, worst  # f32 kernel vs f64 scalar


def test_quantile_transform_cancels_noise_scale():
    """Why the fractal-bounding constant cannot skew default pipelines: the
    quantile transform is invariant to any uniform scaling of the noise as
    long as the noise quantile table comes from the SAME implementation as
    the field (synthetic_map recomputes tables live from ops/perlin)."""
    rng = np.random.default_rng(3)
    samples = rng.standard_normal(20_000).astype(np.float32)
    field = rng.standard_normal((32, 32)).astype(np.float32)
    data_q = np.sort(rng.uniform(-3000, 3000, 64)).astype(np.float64)

    base = transform_perlin(field, build_quantiles(samples, 64), data_q)
    for c in (0.5714 / 0.7273, 3.7):
        scaled = transform_perlin(
            np.float32(c) * field,
            build_quantiles(np.float32(c) * samples, 64), data_q)
        np.testing.assert_allclose(scaled, base, rtol=1e-4, atol=1e-2)
