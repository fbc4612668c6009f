"""First-party CRS engine + CRS-aware raster extraction
(reference parity: `data/preprocessing/elevation_dataset.py:34-161`)."""
import numpy as np
import pytest

from terrain_diffusion_tpu.common.crs import CRS, UnsupportedCRSError
from terrain_diffusion_tpu.common.geotiff import (Affine, read_geotiff_info,
                                                  write_geotiff)
from terrain_diffusion_tpu.data.preprocessing.elevation import (
    extract_mask_from_tiffs)


class TestCRSEngine:
    def test_utm_known_points(self):
        crs = CRS("EPSG:32631")  # UTM 31N, central meridian 3E
        e, n = crs.from_wgs84(3.0, 0.0)
        assert abs(e - 500000.0) < 1e-3 and abs(n) < 1e-3
        # EPSG test point: zone edge, equator
        e, n = crs.from_wgs84(0.0, 0.0)
        assert abs(e - 166021.443) < 0.01 and abs(n) < 1e-3

    def test_utm_south_false_northing(self):
        crs = CRS(32733)  # UTM 33S
        _, n = crs.from_wgs84(15.0, -0.0001)
        assert 9_999_900 < n < 10_000_000

    @pytest.mark.parametrize("code,lon_range,lat_range", [
        (32631, (0.1, 5.9), (-79, 83)),
        (32733, (12.1, 17.9), (-79, -1)),
        (3857, (-179, 179), (-84, 84)),
        (3031, (-179, 179), (-89, -61)),
        (3413, (-179, 179), (55, 89)),
    ])
    def test_roundtrip(self, code, lon_range, lat_range):
        rng = np.random.default_rng(code)
        lon = rng.uniform(*lon_range, 200)
        lat = rng.uniform(*lat_range, 200)
        crs = CRS(code)
        x, y = crs.from_wgs84(lon, lat)
        lon2, lat2 = crs.to_wgs84(x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-8)
        np.testing.assert_allclose(lat2, lat, atol=1e-8)

    def test_web_mercator_known(self):
        crs = CRS("EPSG:3857")
        x, _ = crs.from_wgs84(180.0, 0.0)
        assert abs(x - 20037508.342789244) < 1e-3

    def test_polar_origin(self):
        x, y = CRS(3031).from_wgs84(0.0, -90.0)
        assert abs(x) < 1e-6 and abs(y) < 1e-6
        x, y = CRS(3413).from_wgs84(0.0, 90.0)
        assert abs(x) < 1e-6 and abs(y) < 1e-6

    def test_unsupported_raises(self):
        with pytest.raises(UnsupportedCRSError):
            CRS("EPSG:2154")  # Lambert-93

    def test_transform_bounds_contains_region(self):
        crs = CRS(32631)
        x0, y0, x1, y1 = crs.transform_bounds(1.0, 44.0, 5.0, 46.0)
        for lon, lat in [(1, 44), (5, 46), (3, 45), (1, 46), (5, 44)]:
            x, y = crs.from_wgs84(lon, lat)
            assert x0 - 1 <= x <= x1 + 1 and y0 - 1 <= y <= y1 + 1


def _field(lon, lat):
    """Smooth synthetic 'elevation' with unambiguous lon/lat structure."""
    return (np.sin(np.radians(lon) * 40) * 100
            + np.cos(np.radians(lat) * 30) * 80 + lon * 5 - lat * 3)


def _write_projected_raster(path, crs_code, lon0, lat0, lon1, lat1, n=320):
    crs = CRS(crs_code)
    x0, y0, x1, y1 = crs.transform_bounds(lon0, lat0, lon1, lat1)
    t = Affine((x1 - x0) / n, 0.0, x0, 0.0, (y0 - y1) / n, y1)
    cols, rows = np.meshgrid(np.arange(n) + 0.5, np.arange(n) + 0.5)
    px = t.a * cols + t.c
    py = t.e * rows + t.f
    lon, lat = crs.to_wgs84(px, py)
    write_geotiff(path, _field(lon, lat).astype(np.float32), transform=t,
                  crs=f"EPSG:{crs_code}")


class TestExtractMaskFromTiffs:
    def test_projected_crs_roundtrip(self, tmp_path):
        """A UTM raster extracts onto the 4326 grid within interpolation
        error of the analytic field."""
        p = str(tmp_path / "utm.tif")
        _write_projected_raster(p, 32631, 2.0, 44.0, 4.0, 45.5)
        # read back: CRS key survives the file round trip
        _, _, _, crs = read_geotiff_info(p)
        assert crs == "EPSG:32631"

        bounds = (2.4, 44.3, 3.6, 45.1)
        out = extract_mask_from_tiffs(p, bounds)
        assert out.ndim == 2 and min(out.shape) > 50
        h, w = out.shape
        lons = bounds[0] + (np.arange(w) + 0.5) * (bounds[2] - bounds[0]) / w
        lats = bounds[3] - (np.arange(h) + 0.5) * (bounds[3] - bounds[1]) / h
        lon_g, lat_g = np.meshgrid(lons, lats)
        expect = _field(lon_g, lat_g)
        assert np.isfinite(out).all()
        err = np.abs(out - expect)
        assert float(err.max()) < 1.0, float(err.max())  # field range ~±200

    def test_geographic_passthrough_and_nodata(self, tmp_path):
        p = str(tmp_path / "wgs.tif")
        n = 200
        t = Affine(2.0 / n, 0.0, 10.0, 0.0, -2.0 / n, 50.0)
        cols, rows = np.meshgrid(np.arange(n) + 0.5, np.arange(n) + 0.5)
        lon = t.a * cols + t.c
        lat = t.e * rows + t.f
        arr = _field(lon, lat).astype(np.float32)
        arr[:5, :5] = -9999.0
        write_geotiff(p, arr, transform=t, crs="EPSG:4326", nodata=-9999.0)
        out = extract_mask_from_tiffs(p, (10.0, 48.0, 12.0, 50.0))
        assert out.shape == (n, n)
        assert np.isnan(out[:5, :5]).all()
        np.testing.assert_allclose(out[10:, 10:], arr[10:, 10:], rtol=1e-6)

    def test_directory_mosaic(self, tmp_path):
        for i, (lo0, lo1) in enumerate([(0.5, 1.5), (1.5, 2.5)]):
            _write_projected_raster(str(tmp_path / f"t{i}.tif"), 32631,
                                    lo0, 44.0, lo1, 45.0, n=160)
        out = extract_mask_from_tiffs(str(tmp_path), (0.8, 44.2, 2.2, 44.8))
        assert np.isfinite(out).all()
        h, w = out.shape
        lons = 0.8 + (np.arange(w) + 0.5) * 1.4 / w
        lats = 44.8 - (np.arange(h) + 0.5) * 0.6 / h
        lon_g, lat_g = np.meshgrid(lons, lats)
        assert float(np.abs(out - _field(lon_g, lat_g)).max()) < 1.5

    def test_nonintersecting_raises(self, tmp_path):
        p = str(tmp_path / "utm.tif")
        _write_projected_raster(p, 32631, 2.0, 44.0, 4.0, 45.5, n=64)
        with pytest.raises(ValueError):
            extract_mask_from_tiffs(p, (100.0, 10.0, 101.0, 11.0))
