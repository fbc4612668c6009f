"""Per-cell elevation preprocessing (reference
`data/preprocessing/elevation_dataset.py:163-301`):

read MERIT/Copernicus DEM cell + ETOPO lowres context, void-fill with
distance feathering toward the lowres field, signed-sqrt transform,
Laplacian encode into (residual, lowfreq), block-median `lowres_exact`,
19 WorldClim bio layers, split into subchunks with pct_land.

Uses the first-party GeoTIFF reader + scipy (no rasterio/skimage).
"""
from __future__ import annotations

import os

import numpy as np
import scipy.ndimage as ndi

import jax.numpy as jnp

from terrain_diffusion_tpu.common.geotiff import read_geotiff
from terrain_diffusion_tpu.ops.laplacian import laplacian_encode


def _resize(arr: np.ndarray, size: tuple[int, int], order: int = 1) -> np.ndarray:
    zoom = (size[0] / arr.shape[0], size[1] / arr.shape[1])
    return ndi.zoom(arr, zoom, order=order, grid_mode=True, mode="nearest")


def _block_median(arr: np.ndarray, k: int) -> np.ndarray:
    h, w = arr.shape
    return np.median(arr[: h // k * k, : w // k * k]
                     .reshape(h // k, k, w // k, k), axis=(1, 3))


def extract_window(path: str, bounds) -> np.ndarray | None:
    """Crop a global raster to (min_lon, min_lat, max_lon, max_lat)."""
    arr, transform, nodata = read_geotiff(path)
    if transform is None:
        return None
    min_lon, min_lat, max_lon, max_lat = bounds
    col0 = int((min_lon - transform.c) / transform.a)
    col1 = int(np.ceil((max_lon - transform.c) / transform.a))
    row0 = int((max_lat - transform.f) / transform.e)
    row1 = int(np.ceil((min_lat - transform.f) / transform.e))
    row0, row1 = sorted((row0, row1))
    col0, col1 = sorted((col0, col1))
    # clamp BOTH ends (extract.py:29-30 does the same): a negative slice
    # end would silently wrap and select a huge wrong window
    row0, col0 = max(row0, 0), max(col0, 0)
    row1 = min(max(row1, 0), arr.shape[0])
    col1 = min(max(col1, 0), arr.shape[1])
    out = arr[row0:row1, col0:col1].astype(np.float32)
    if nodata is not None:
        out[out == nodata] = np.nan
    return out


def process_single_cell(
    chunk_id: str,
    bounds,
    highres_elevation_folder: str,
    lowres_elevation_file: str,
    highres_size: int,
    lowres_size: int,
    lowres_sigma: float,
    num_chunks: int = 1,
    climate_folder: str | None = None,
    edge_margin: int = 0,
    data_source: str = "merit",
) -> list[dict]:
    assert highres_size % lowres_size == 0
    prefix = "dem_" if data_source == "merit" else "copernicus_"
    highres_margin = edge_margin * highres_size // lowres_size
    path = os.path.join(highres_elevation_folder, prefix + chunk_id + ".tif")

    if os.path.exists(path):
        dem, _, nodata = read_geotiff(path)
        dem = dem.astype(np.float32)
        if data_source == "merit":
            dem = np.where(dem < -1000, np.nan, dem)
        else:
            dem = np.where(dem == 0.0, np.nan, dem)
        if not np.isnan(dem).all():
            dem = _resize_nan(dem, (highres_size, highres_size))
        else:
            dem = np.full((highres_size, highres_size), np.nan, np.float32)
    else:
        dem = np.full((highres_size, highres_size), np.nan, np.float32)
    if highres_margin > 0:
        dem = dem[highres_margin:-highres_margin, highres_margin:-highres_margin]

    low = extract_window(lowres_elevation_file, bounds)
    low = np.where(low > -1, -1.0, low).astype(np.float32)
    low = _resize(np.nan_to_num(low, nan=-1.0), (lowres_size, lowres_size))
    low = ndi.gaussian_filter(low, sigma=lowres_sigma)
    low_up = _resize(low, (highres_size, highres_size))
    if highres_margin > 0:
        low_up = low_up[highres_margin:-highres_margin, highres_margin:-highres_margin]

    if np.isnan(dem).all():
        dem = low_up
    elif np.isnan(dem).any():
        nan_mask = np.isnan(dem)
        distance = ndi.distance_transform_edt(nan_mask)
        alpha = np.minimum(1, distance[nan_mask] / 32)
        dem[nan_mask] = low_up[nan_mask] * alpha

    climate = None
    if climate_folder is not None:
        layers = []
        for i in range(1, 20):
            fp = os.path.join(climate_folder, f"wc2.1_30s_bio_{i}.tif")
            c = extract_window(fp, bounds)
            if c is None or np.isnan(c).all():
                c = np.full((lowres_size, lowres_size), np.nan, np.float32)
            else:
                c = _resize(np.nan_to_num(c, nan=np.nanmean(c)),
                            (lowres_size, lowres_size), order=0)
            layers.append(c)
        climate = np.stack(layers, axis=0)
        if edge_margin > 0:
            climate = climate[..., edge_margin:-edge_margin, edge_margin:-edge_margin]

    ratio = highres_size // lowres_size
    dem = np.sign(dem) * np.sqrt(np.abs(dem))
    lowres_exact = _block_median(dem, ratio)
    residual, lowfreq = (np.asarray(a) for a in laplacian_encode(
        jnp.asarray(dem)[None], lowres_size - edge_margin * 2, lowres_sigma))
    residual, lowfreq = residual[0], lowfreq[0]

    hcs = (highres_size - highres_margin * 2) // num_chunks
    lcs = (lowres_size - edge_margin * 2) // num_chunks
    out = []
    for ch in range(num_chunks):
        for cw in range(num_chunks):
            h0, w0 = ch * hcs, cw * hcs
            l0, l1 = ch * lcs, cw * lcs
            lf = lowfreq[l0:l0 + lcs, l1:l1 + lcs]
            out.append({
                "residual": residual[h0:h0 + hcs, w0:w0 + hcs],
                "lowfreq": lf,
                "climate": (climate[:, l0:l0 + lcs, l1:l1 + lcs]
                            if climate is not None else None),
                "lowres_exact": lowres_exact[l0:l0 + lcs, l1:l1 + lcs],
                "pct_land": float((lf > 0).mean()),
                "chunk_id": chunk_id,
                "subchunk_id": f"chunk_{ch}_{cw}",
            })
    return out


def _resize_nan(arr: np.ndarray, size) -> np.ndarray:
    """NaN-preserving bilinear resize: interpolates valid values, keeps a
    resized NaN mask."""
    mask = np.isnan(arr)
    filled = np.where(mask, 0.0, arr)
    w = _resize((~mask).astype(np.float32), size)
    v = _resize(filled, size)
    out = np.where(w > 0.5, v / np.maximum(w, 1e-6), np.nan)
    return out.astype(np.float32)
