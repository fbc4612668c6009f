"""Serving layer: API wire formats, explorer endpoints, mc-api biome
classifier, geotiff IO, azgaar conversion. Drives the WSGI apps in-process."""
import io
import json

import numpy as np
import pytest

from helpers import tiny_models

pytestmark = pytest.mark.slow


def _wsgi_get(app, path, body=None, method="GET"):
    """Minimal WSGI test client."""
    from urllib.parse import urlsplit

    parts = urlsplit(path)
    environ = {
        "REQUEST_METHOD": method,
        "PATH_INFO": parts.path,
        "QUERY_STRING": parts.query,
        "wsgi.input": io.BytesIO(body or b""),
        "CONTENT_LENGTH": str(len(body or b"")),
    }
    status_headers = {}

    def start_response(status, headers):
        status_headers["status"] = status
        status_headers["headers"] = dict(headers)

    chunks = app.wsgi(environ, start_response)
    return status_headers["status"], status_headers["headers"], b"".join(chunks)


@pytest.fixture(scope="module")
def pipe():
    from terrain_diffusion_tpu.pipeline.world import WorldPipeline

    p = WorldPipeline(seed=77, latents_batch_size=[1, 2, 4],
                      decoder_tile_size=64, decoder_tile_stride=48)
    p.set_models(*tiny_models(decoder_tile=64))
    p.bind()
    return p


def test_api_terrain_wire_format(pipe):
    from terrain_diffusion_tpu.serving import api

    api.configure(pipeline=pipe)
    status, headers, body = _wsgi_get(api.app, "/health")
    assert status.startswith("200")
    assert json.loads(body) == {"status": "ok"}

    status, headers, body = _wsgi_get(api.app, "/terrain?i1=0&j1=0&i2=16&j2=16")
    assert status.startswith("200")
    h = int(headers["X-Height"])
    w = int(headers["X-Width"])
    assert (h, w) == (16, 16)
    assert len(body) == h * w * 2 + h * w * 4 * 4
    elev = np.frombuffer(body[: h * w * 2], dtype="<i2").reshape(h, w)
    climate = np.frombuffer(body[h * w * 2:], dtype="<f4").reshape(h, w, 4)
    assert np.isfinite(climate).all()
    assert elev.min() > -12000 and elev.max() < 10000

    # seed endpoints
    status, _, body = _wsgi_get(api.app, "/seed")
    assert json.loads(body)["seed"] == pipe.seed
    # error paths
    status, _, body = _wsgi_get(api.app, "/terrain?i1=0&j1=0")
    assert status.startswith("400")
    assert "error" in json.loads(body)
    status, _, body = _wsgi_get(api.app, "/terrain?i1=5&j1=0&i2=1&j2=9")
    assert status.startswith("400")


def test_api_supersampling(pipe):
    from terrain_diffusion_tpu.serving import api

    api.configure(pipeline=pipe)
    status, headers, body = _wsgi_get(api.app, "/terrain?i1=0&j1=0&i2=16&j2=16&scale=2")
    assert status.startswith("200")
    assert int(headers["X-Height"]) == 16


def test_explorer_endpoints(pipe):
    from terrain_diffusion_tpu.serving.explorer import server

    server.configure(pipeline=pipe)
    status, _, body = _wsgi_get(server.app, "/api/status")
    assert status.startswith("200")
    data = json.loads(body)
    assert data["channels"][0] == "Elev"

    status, headers, body = _wsgi_get(
        server.app, "/api/coarse.png?channel=0&ci0=0&ci1=4&cj0=0&cj1=4")
    assert status.startswith("200")
    assert body[:8] == b"\x89PNG\r\n\x1a\n"
    assert "X-Vmin" in headers

    status, _, body = _wsgi_get(
        server.app, "/api/coarse_data.json?ci0=0&ci1=4&cj0=0&cj1=4")
    data = json.loads(body)
    assert len(data["channels"]["Elev"]) == 4

    status, _, body = _wsgi_get(
        server.app, "/api/coarse_stats?ci0=0&ci1=4&cj0=0&cj1=4")
    assert "0" in json.loads(body)

    # index page served
    status, _, body = _wsgi_get(server.app, "/")
    assert b"Terrain Explorer" in body


def test_mc_api_biome_classifier():
    from terrain_diffusion_tpu.serving.minecraft_api import classify_biome, BIOME_ID

    h = w = 32
    elev = np.full((h, w), 100.0, np.float32)
    elev_padded = np.pad(elev, 1, mode="edge")
    # hot humid tropics -> jungle-ish; cold dry -> snowy/grove
    climate = np.stack([
        np.full((h, w), 27.0, np.float32),      # temp
        np.full((h, w), 200.0, np.float32),     # t_season (std*100)
        np.full((h, w), 2500.0, np.float32),    # precip
        np.full((h, w), 30.0, np.float32),      # p_cv
    ])
    biomes = classify_biome(elev, climate, 0, 0, elev_padded)
    assert biomes.dtype == np.int16
    assert (biomes == BIOME_ID["jungle"]).mean() > 0.5

    climate_cold = np.stack([
        np.full((h, w), -12.0, np.float32),
        np.full((h, w), 900.0, np.float32),
        np.full((h, w), 400.0, np.float32),
        np.full((h, w), 40.0, np.float32),
    ])
    biomes_cold = classify_biome(elev, climate_cold, 0, 0, elev_padded)
    assert (biomes_cold == BIOME_ID["snowy_plains"]).mean() > 0.5

    ocean = classify_biome(np.full((h, w), -500.0, np.float32), climate, 0, 0,
                           np.full((h + 2, w + 2), -500.0, np.float32))
    assert (ocean == 41).mean() > 0.9  # warm ocean

    # mountains
    mtn = classify_biome(np.full((h, w), 3000.0, np.float32), climate_cold, 0, 0,
                         np.full((h + 2, w + 2), 3000.0, np.float32))
    assert np.isin(mtn, [BIOME_ID["snowy_slopes"], BIOME_ID["snowy_taiga_sparse"],
                         BIOME_ID["snowy_taiga"], BIOME_ID["windswept_hills"],
                         BIOME_ID["grove"], BIOME_ID["frozen_peaks"],
                         BIOME_ID["stony_peaks"], BIOME_ID["plains"],
                         BIOME_ID["taiga_sparse"], BIOME_ID["taiga"]]).all()


def test_mc_api_wire(pipe):
    from terrain_diffusion_tpu.serving import minecraft_api as mc

    mc.configure(pipeline=pipe)
    status, headers, body = _wsgi_get(mc.app, "/terrain?i1=0&j1=0&i2=16&j2=16")
    assert status.startswith("200")
    h, w = int(headers["X-Height"]), int(headers["X-Width"])
    assert len(body) == h * w * 2 * 2  # elev int16 + biome int16
    biome = np.frombuffer(body[h * w * 2:], dtype="<i2").reshape(h, w)
    assert biome.min() >= 1

    # legacy endpoint + upsampled with detail noise
    status, headers, body = _wsgi_get(mc.app, "/45?i1=0&j1=0&i2=16&j2=16&noise=1.0")
    assert status.startswith("200")
    assert len(body) == 16 * 16 * 2 * 2


def test_geotiff_roundtrip(tmp_path):
    from terrain_diffusion_tpu.common.geotiff import (
        Affine, read_geotiff, write_geotiff)

    arr = np.random.default_rng(0).standard_normal((20, 30)).astype(np.float32)
    t = Affine.from_bounds(-10, 40, 5, 50, 30, 20)
    write_geotiff(tmp_path / "f.tif", arr, t, nodata=-9999.0)
    back, t2, nodata = read_geotiff(tmp_path / "f.tif")
    np.testing.assert_array_equal(back, arr)
    assert nodata == -9999.0
    assert t2.a == pytest.approx(t.a)
    assert t2.c == pytest.approx(t.c)
    assert t2.e == pytest.approx(t.e)

    # int16 with signed sample format
    arr16 = (np.random.default_rng(1).integers(-5000, 5000, (8, 8))).astype(np.int16)
    write_geotiff(tmp_path / "i.tif", arr16, t)
    back16, _, _ = read_geotiff(tmp_path / "i.tif")
    np.testing.assert_array_equal(back16, arr16)
    assert back16.dtype == np.int16


def test_azgaar_to_tiff(tmp_path):
    from terrain_diffusion_tpu.serving.azgaar_to_tiff import convert

    # minimal synthetic Azgaar export: two square cells (ocean + land)
    azg = {
        "info": {"width": 100, "height": 100},
        "mapCoordinates": {"lonW": 0, "lonE": 10, "latS": 40, "latN": 50},
        "settings": {"heightExponent": "1.8"},
        "pack": {
            "vertices": [{"i": i, "p": p} for i, p in enumerate(
                [[0, 0], [100, 0], [100, 100], [0, 100], [50, 0], [50, 100]])],
            "cells": [
                {"i": 0, "v": [0, 4, 5, 3], "biome": 0},
                {"i": 1, "v": [4, 1, 2, 5], "biome": 6},
            ],
        },
        "grid": {
            "vertices": [{"i": i, "p": p} for i, p in enumerate(
                [[0, 0], [100, 0], [100, 100], [0, 100], [50, 0], [50, 100]])],
            "cells": [
                {"i": 0, "v": [0, 4, 5, 3], "h": 10, "temp": 15, "prec": 8},
                {"i": 1, "v": [4, 1, 2, 5], "h": 40, "temp": 22, "prec": 12},
            ],
        },
    }
    src = tmp_path / "map.json"
    src.write_text(json.dumps(azg))
    out = convert(src, tmp_path / "tiffs", scale=100.0)
    hm = out["heightmap"]
    assert hm.shape[0] >= 1 and hm.shape[1] >= 1
    assert hm.min() < 0  # ocean cell
    assert hm.max() > 0  # land cell: (40-18)^1.8
    assert (tmp_path / "tiffs" / "temperature.tif").exists()
    assert out["precipitation"].max() == pytest.approx(1200.0)


def test_tiff_export_pipeline(tmp_path, pipe):
    """tiff-export end to end with a tiny world (256x upsampling of 1 cell)."""
    from terrain_diffusion_tpu.common.geotiff import Affine, write_geotiff
    from terrain_diffusion_tpu.serving import tiff_export

    # Use a small PIXELS_PER_CELL for test speed
    old_ppc, old_pad = tiff_export.PIXELS_PER_CELL, tiff_export.PADDING
    tiff_export.PIXELS_PER_CELL, tiff_export.PADDING = 16, 2
    try:
        tdir = tmp_path / "cond"
        tdir.mkdir()
        t = Affine.from_bounds(0, 0, 1, 1, 2, 2)
        write_geotiff(tdir / "heightmap.tif",
                      np.array([[500.0, -1000.0], [200.0, 900.0]], np.float32), t)
        # save pipeline for from_pretrained
        mdir = tmp_path / "model"
        pipe.save_pretrained(str(mdir))
        canvas = tiff_export.export(
            str(mdir), str(tdir), str(tmp_path / "out.tif"), seed=5,
            batch_size="1,2,4", chunk_size=32)
        assert canvas.shape == (32, 32)
        assert (tmp_path / "out.tif").exists()
    finally:
        tiff_export.PIXELS_PER_CELL, tiff_export.PADDING = old_ppc, old_pad


def test_explorer_detail_endpoints(pipe):
    from terrain_diffusion_tpu.serving.explorer import server

    server.configure(pipeline=pipe)
    for mode in ("relief", "elevation"):
        status, _, body = _wsgi_get(
            server.app, f"/api/detail.png?ci=0&cj=0&detail_size=16&mode={mode}")
        assert status.startswith("200"), body
        assert body[:8] == b"\x89PNG\r\n\x1a\n"

    status, headers, body = _wsgi_get(
        server.app, "/api/detail_raw?ci=0&cj=0&detail_size=16")
    assert status.startswith("200")
    h, w = int(headers["X-Height"]), int(headers["X-Width"])
    assert (h, w) == (16, 16)
    expected = h * w * 2 + (h * w * 4 if headers["X-Has-Temp"] == "1" else 0)
    assert len(body) == expected


def test_explorer_ui_references_all_api_routes():
    """The static app must exercise every server endpoint (UI completeness
    smoke test — no browser needed)."""
    import os
    import re

    from terrain_diffusion_tpu.serving.explorer import server

    static = os.path.join(os.path.dirname(server.__file__), "static",
                          "index.html")
    with open(static) as f:
        html = f.read()
    routes = [r for r in server.app.routes() if r.startswith("/api/")]
    assert routes, "explorer server exposes no /api routes?"
    for route in routes:
        assert route in html, f"explorer UI never calls {route}"
    # capability markers: filters, hover readout, pan/zoom, detail modes
    for marker in ["coarse_stats", "_min=", "_max=", "pan_i", "detail_size",
                   "mousemove", "Zoom", "mode=", "clipboard"]:
        assert re.search(marker, html), f"UI capability missing: {marker}"


def test_http_benchmark_real_sockets(pipe):
    """`latency --http`: the requests/s benchmark drives the REAL stack —
    threaded WSGI server on a live socket, coalesced pipeline, binary wire
    responses — at 1 and 2 concurrent clients, and reports sane numbers."""
    from terrain_diffusion_tpu.evaluation.latency import run_http_benchmark

    out = run_http_benchmark(pipe, concurrency_levels=(1, 2),
                             requests_per_client=2, tile=24)
    assert out["coalesce"] is True
    assert set(out["levels"]) == {"1", "2"}
    for c, lvl in out["levels"].items():
        assert lvl["requests"] == int(c) * 2
        assert lvl["requests_per_sec"] > 0
        assert lvl["latency_p50_s"] > 0


def test_world_generator_populates_persistent_store(tmp_path, monkeypatch):
    """`generate` CLI core (reference `world_generator.py:8-76`): walking
    residual slices over the coarse window persists every generated tile
    into the HDF5 world store."""
    import h5py

    from terrain_diffusion_tpu.pipeline.world import WorldPipeline
    from terrain_diffusion_tpu.serving import world_generator as wg

    def fake_from_pretrained(model_path, seed=None, caching_strategy="direct",
                             **kwargs):
        kwargs.pop("log_mode", None)
        p = WorldPipeline(seed=seed or 99, latents_batch_size=[1, 2, 4],
                          decoder_tile_size=64, decoder_tile_stride=48,
                          caching_strategy=caching_strategy, **kwargs)
        return p.set_models(*tiny_models(decoder_tile=64))

    monkeypatch.setattr(wg.WorldPipeline, "from_pretrained",
                        staticmethod(fake_from_pretrained))
    h5 = str(tmp_path / "world.h5")
    wg.generate_world("unused", hdf5_file=h5, seed=7, coarse_window=1,
                      caching_strategy="indirect", tile_size=256)

    with h5py.File(h5, "r") as f:
        names = []
        f.visit(lambda n: names.append(n) if isinstance(
            f.get(n, getclass=True), type) and f.get(n, getclass=True)
            is h5py.Dataset else None)
        datasets = [n for n in names]
    assert datasets, "generator must persist tiles into the world store"

    import pytest as _pytest
    with _pytest.raises(ValueError, match="multiple of 256"):
        wg.generate_world("unused", hdf5_file=str(tmp_path / "w2.h5"),
                          caching_strategy="indirect", tile_size=128)


def test_random_sampler_yields_separated_finite_tiles(pipe):
    """Land-biased random sampling (reference `random_sampler.py:17-239`):
    yields n tiles at centers separated by >= `separation`, each a full
    elev+climate region."""
    from terrain_diffusion_tpu.serving.random_sampler import sample_random_tiles

    tiles = list(sample_random_tiles(pipe, n=2, tile=24, seed=3,
                                     separation=2 * 256))
    assert len(tiles) == 2
    (ci0, cj0), (ci1, cj1) = tiles[0]["center"], tiles[1]["center"]
    assert max(abs(ci0 - ci1), abs(cj0 - cj1)) >= 2 * 256
    for t in tiles:
        assert t["elev"].shape == (24, 24)
        assert np.isfinite(t["elev"]).all()
        assert t["climate"].shape[1:] == (24, 24)


def test_relief_map_renders_rgb():
    """Relief renderer: multi-azimuth hillshade over synthetic terrain
    produces an (H, W, 3) uint8 image with real shading variation."""
    from terrain_diffusion_tpu.serving.relief_map import get_relief_map

    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    elev = 800 * np.sin(xx / 9.0) * np.cos(yy / 7.0) + 200
    img = np.asarray(get_relief_map(elev))
    assert img.shape == (64, 64, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0  # float RGB in [0, 1]
    assert img.std() > 0.02  # not a flat fill
