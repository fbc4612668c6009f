"""InfiniteDiffusion output-quality evaluation + tiling ablations
(reference `evaluation/infinite_consistency.py:74-302` and the
`infinite_consistency_naive*.py` ablation scripts).

Pipeline: tiled 2-step consistency sampling of base latents over an
extended canvas (64-px tiles / 32 stride), central 64-px crop,
consistency-decode x8, signed-square, then KID/FID of decoded terrain
against real DEM crops from the validation dataset.

Ablation modes:
- ``blend``    — full InfiniteDiffusion phase blending (linear windows)
- ``constant`` — constant blend windows
- ``naive``    — independent per-tile sampling, no inter-phase blending
- ``skip-edge``— skip blending on the final phase
"""
from __future__ import annotations

import json

import click
import numpy as np

import jax

from terrain_diffusion_tpu.evaluation import (constant_weight_window,
                                              linear_weight_window)
from terrain_diffusion_tpu.evaluation.metrics import (compute_fid_kid,
                                                      normalize_terrain_for_metric)
from terrain_diffusion_tpu.evaluation.samplers import (
    compose_terrain,
    sample_base_consistency,
    sample_decoder_consistency_tiled,
)


def generate_samples(base_model, base_params, decoder_model, decoder_params,
                     cond_imgs, cond_means, cond_stds, *, key,
                     canvas: int = 192, crop: int = 64, mode: str = "blend",
                     inter_t: float = float(np.arctan(0.35 / 0.5)),
                     latent_compression: int = 8) -> np.ndarray:
    """Generate decoded terrain crops for a batch of conditioning images.

    ``naive`` mode reproduces the reference's seam-ablation baseline
    (`infinite_consistency_naive.py:176-247`): a 2x2 grid of INDEPENDENTLY
    sampled crop-size tiles (shared global conditioning, per-tile windows at
    2-block stride), decoded independently and stitched — the tile seams
    land inside the metric image.  The other modes tile the full canvas
    with overlap blending and central-crop.
    """
    if crop != 64:
        # the conditioning geometry is hardwired to the reference's layout:
        # blend modes advance the 4x4 cond window one px per 32-latent-px
        # tile step (crop/2), and naive mode samples a 2x2 grid at
        # 2-cond-px stride from a 6x6 center crop — both only line up for
        # 64-latent-px tiles (reference image_size=64)
        raise ValueError(
            f"crop={crop} unsupported: the tile/conditioning geometry is "
            "only defined for the reference's 64-latent-px tiles")
    B = cond_imgs.shape[0]
    key, k1, k2 = jax.random.split(key, 3)
    if mode == "naive":
        from terrain_diffusion_tpu.evaluation.samplers import process_cond_img

        # central-crop the conditioning image to the 6x6 the 2x2 grid needs
        # (reference crops 8x8 -> 6x6, `infinite_consistency_naive.py:163`)
        cw = cond_imgs.shape[-1]
        assert cw >= 6, f"naive mode needs a >=6-wide cond image, got {cw}"
        c0 = (cw - 6) // 2
        cond6 = cond_imgs[:, :, c0:c0 + 6, c0:c0 + 6]
        rows = []
        for gi in range(2):
            row = []
            for gj in range(2):
                vec = process_cond_img(
                    cond6[:, :, gi * 2:gi * 2 + 4, gj * 2:gj * 2 + 4],
                    np.zeros(5, np.float32), cond_means, cond_stds)
                k1, sub = jax.random.split(k1)
                tile_lat = sample_base_consistency(
                    base_model, base_params, (B, crop, crop, 5), [vec],
                    key=sub, inter_t=inter_t, tile_size=None)
                row.append(np.asarray(tile_lat))
            rows.append(np.concatenate(row, axis=2))
        latents = np.concatenate(rows, axis=1)  # (B, 2*crop, 2*crop, 5)
    else:
        wfn = (constant_weight_window if mode == "constant"
               else linear_weight_window)
        latents = sample_base_consistency(
            base_model, base_params, (B, canvas, canvas, 5), cond_imgs,
            key=k1, inter_t=inter_t, tile_size=crop,
            cond_means=cond_means, cond_stds=cond_stds,
            histogram_raw=np.zeros(5, np.float32),
            weight_window_fn=wfn, skip_blend_last=(mode == "skip-edge"))
        c0 = (latents.shape[1] - crop) // 2
        latents = latents[:, c0:c0 + crop, c0:c0 + crop, :]
    lat4 = latents[..., :4]
    # tile == stride == crop*8: each crop-size latent block decodes
    # independently (no overlap), preserving naive-mode seams
    residual = sample_decoder_consistency_tiled(
        decoder_model, decoder_params, lat4, key=k2,
        tile_size=crop * latent_compression, stride=crop * latent_compression,
        latent_compression=latent_compression)
    # full composition to meters — the real side (dataset ground_truth) is
    # laplacian-decoded elevation, so the fake side must be too (the
    # reference's _decode_latents_to_terrain + signed square,
    # infinite_consistency.py:36-72,254); the generated lowfreq channel
    # (latents[..., 4], normalized units) supplies the low band
    terrain = compose_terrain(np.asarray(residual)[..., 0],
                              latents[..., 4],
                              lowfreq_normalized=True)[..., None]
    if mode == "naive":
        # central-crop the 2x2-stitched output to the same resolution as the
        # blended modes (crop*8 px) so FID/KID features are computed at one
        # scale; the seam cross stays in frame (reference keeps seams in the
        # metric image, `infinite_consistency_naive.py:240-247`)
        out = crop * latent_compression
        t0 = (terrain.shape[1] - out) // 2
        terrain = terrain[:, t0:t0 + out, t0:t0 + out, :]
    return terrain


def real_terrain_batch(items, out_size: int) -> np.ndarray:
    """(B, out_size, out_size, 1) real terrain in meters from dataset items.

    Uses the dataset's `ground_truth` key — the raw DEM residual crop at x8
    the latent coords laplacian-decoded against the raw lowfreq (produced by
    `H5LatentsDataset(val_dset=True)`; reference
    `evaluation/infinite_consistency.py:256-265` + `h5_latents_dataset.py:
    330-340`) — signed-squares it back to meters and central-crops to the
    generated-output resolution.  Raises if the dataset provides no real
    residual data: the metric is meaningless against a fabricated real side.
    """
    gts = []
    for item in items:
        if "ground_truth" not in item:
            raise ValueError(
                "dataset item has no 'ground_truth' — construct the dataset "
                "with val_dset=True (and an HDF5 carrying 'residual') so the "
                "real side comes from real DEM residual crops")
        gt = np.asarray(item["ground_truth"], np.float32)
        if gt.shape[0] < out_size or gt.shape[1] < out_size:
            raise ValueError(
                f"ground truth {gt.shape[:2]} smaller than the generated "
                f"output {out_size}; use dataset crop_size >= canvas")
        gt = np.sign(gt) * np.square(gt)  # signed-sqrt space -> meters
        y0 = (gt.shape[0] - out_size) // 2
        x0 = (gt.shape[1] - out_size) // 2
        gts.append(gt[y0:y0 + out_size, x0:x0 + out_size, :1])
    return np.stack(gts)


def evaluate(base_path: str, decoder_path: str, dataset_kwargs: dict, *,
             n_images: int = 256, batch: int = 8, mode: str = "blend",
             seed: int = 0, features="terrain", canvas: int = 192,
             crop: int = 64) -> dict:
    from terrain_diffusion_tpu.nn import torch_compat
    from terrain_diffusion_tpu.training.datasets import H5LatentsDataset

    base_model, base_params = torch_compat.load_model(base_path)
    decoder_model, decoder_params = torch_compat.load_model(decoder_path)
    # crop_size = canvas so the conditioning image covers every tile window
    # and ground_truth spans the full canvas at x8 (reference sets
    # results_dataset crop_size=192, `infinite_consistency.py:97`)
    ds = H5LatentsDataset(**{**dataset_kwargs, "val_dset": True,
                             "crop_size": canvas})

    real, fake = [], []
    key = jax.random.key(seed)
    rng = np.random.default_rng(seed)
    while len(fake) * batch < n_images:
        items = [ds[int(rng.integers(1 << 31))] for _ in range(batch)]
        cond_imgs = np.stack([i["cond_inputs_img"] for i in items])
        key, sub = jax.random.split(key)
        # the dataset already standardized cond_inputs_img (it always
        # resolves cond_input_mean/std), so the sampler-side normalization
        # must be identity — the reference does the same, passing
        # zeros/ones into _process_cond_img (infinite_consistency.py:221)
        terrain = generate_samples(
            base_model, base_params, decoder_model, decoder_params,
            cond_imgs, np.zeros(7, np.float32), np.ones(7, np.float32),
            key=sub, mode=mode, canvas=canvas, crop=crop)
        fake.append(terrain)
        real.append(real_terrain_batch(items, terrain.shape[1]))
    real = normalize_terrain_for_metric(np.concatenate(real)[..., :1])
    fake = normalize_terrain_for_metric(np.concatenate(fake)[..., :1])
    from terrain_diffusion_tpu.evaluation.metrics import resolve_feature_fn

    feature_fn = resolve_feature_fn(features)
    fid, kid_mean, kid_std = compute_fid_kid(real, fake,
                                             feature_fn=feature_fn)
    return {"mode": mode, "n_images": len(fake), "kid_mean": kid_mean,
            "kid_std": kid_std, "fid": fid,
            "features": features if isinstance(features, str) else "custom"}


@click.command()
@click.argument("base_path")
@click.argument("decoder_path")
@click.option("--h5-file", required=True)
@click.option("--n-images", type=int, default=256)
@click.option("--batch", type=int, default=8)
@click.option("--mode", type=click.Choice(["blend", "constant", "naive",
                                           "skip-edge"]), default="blend")
@click.option("--seed", type=int, default=0)
@click.option("--features", default="terrain",
              help="'terrain' or 'inception[:/path/to/weights]'")
@click.option("--canvas", type=int, default=192,
              help="latent-px canvas the tiled modes generate before the "
                   "central crop (reference image_size=192)")
@click.option("--crop", type=int, default=64,
              help="latent-px tile / final crop size (reference 64)")
def main(base_path, decoder_path, h5_file, n_images, batch, mode, seed,
         features, canvas, crop):
    """FID/KID of InfiniteDiffusion tiled generation vs real DEM crops."""
    dataset_kwargs = dict(
        h5_file=h5_file, pct_land_ranges=[[0.01, 1]],
        subset_resolutions=[90], subset_weights=[1.0],
        latents_mean=[0, 0, 0, 0], latents_std=[1, 1, 1, 1], split="val",
        # full-canvas crops may span whole chunks — edge rows then need the
        # extrapolated laplacian decode rather than a 1-px clip border
        clip_edges=False)
    out = evaluate(base_path, decoder_path, dataset_kwargs,
                   n_images=n_images, batch=batch, mode=mode, seed=seed,
                   features=features, canvas=canvas, crop=crop)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
