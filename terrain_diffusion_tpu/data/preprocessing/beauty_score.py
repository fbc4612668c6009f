"""Beauty score: FFT band-power heuristic -> per-subchunk 1-5 score attr
(reference `data/preprocessing/beauty_score.py:9-154`), used by the
stratified sampler in H5LatentsDataset.  NumPy FFT implementation.
"""
from __future__ import annotations

import click
import numpy as np

import jax.numpy as jnp

from terrain_diffusion_tpu.ops.laplacian import laplacian_decode

# Linear model fit on manual labels (reference `beauty_score.py:76-84`)
COEFFICIENTS = [0.551959, -1.774091, 3.117426, -1.835090,
                -1.996856, -0.053519, 0.488380]
INTERCEPT = 4.44


def analyze_terrain_frequency(heightmap: np.ndarray, bins: int):
    """Mean log-power of the FFT spectrum in radial distance bins."""
    fft = np.fft.fftshift(np.fft.fft2(heightmap))
    h, w = heightmap.shape
    y, x = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                       indexing="ij")
    dist = np.sqrt(x**2 + y**2)
    power = np.log(np.abs(fft) + 1e-12)
    edges = np.linspace(0, 1, bins + 1)
    centers = ((edges[:-1] + edges[1:]) / 2).tolist()
    powers = []
    for i in range(bins):
        mask = (dist >= edges[i]) & (dist < edges[i + 1])
        powers.append(float(power[mask].mean()) if mask.any() else 0.0)
    return centers, powers


def calculate_beauty_score(lowfreq: np.ndarray, residual: np.ndarray) -> float:
    decoded = np.asarray(laplacian_decode(
        jnp.asarray(residual)[None], jnp.asarray(lowfreq)[None]))[0]
    decoded = np.sign(decoded) * decoded**2
    if (decoded <= 0).mean() > 0.99:
        return 1.0
    decoded = np.where(decoded < 0, 0.0, decoded)
    _, powers = analyze_terrain_frequency(decoded, bins=4)
    std = float(decoded.std())
    features = powers + [np.log(std), 250 / std, np.sqrt(std)]
    score = sum(c * f for c, f in zip(COEFFICIENTS, features)) + INTERCEPT
    return float(score)


def score_dataset(h5_file: str, resolution: int | None = None,
                  manual_scores_csv: str | None = None):
    import csv
    import h5py

    manual = {}
    if manual_scores_csv:
        with open(manual_scores_csv) as f:
            for row in csv.reader(f):
                if len(row) >= 2:
                    manual[row[0]] = float(row[1])
    with h5py.File(h5_file, "a") as f:
        res_keys = [str(resolution)] if resolution else list(f.keys())
        count = 0
        for rk in res_keys:
            for cid in f[rk]:
                for sub in f[rk][cid]:
                    g = f[rk][cid][sub]
                    if "residual" not in g or "lowfreq" not in g:
                        continue
                    key = f"{rk}/{cid}/{sub}"
                    if key in manual:
                        score = manual[key]
                    else:
                        score = calculate_beauty_score(
                            np.asarray(g["lowfreq"], np.float32),
                            np.asarray(g["residual"], np.float32))
                    g.attrs["beauty_score"] = float(np.clip(score, 1.0, 5.0))
                    count += 1
        print(f"scored {count} subchunks")


@click.command()
@click.argument("dataset-file", type=click.Path(exists=True))
@click.option("--resolution", type=int, default=None)
@click.option("--manual-scores", default=None,
              help="CSV of manual labels (path,score) overriding the heuristic")
def main(dataset_file, resolution, manual_scores):
    """Compute beauty scores for every subchunk of a dataset."""
    score_dataset(dataset_file, resolution, manual_scores)


if __name__ == "__main__":
    main()
