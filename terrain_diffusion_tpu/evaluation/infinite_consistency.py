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
from terrain_diffusion_tpu.evaluation.metrics import (compute_fid, compute_kid,
                                                      normalize_terrain_for_metric)
from terrain_diffusion_tpu.evaluation.samplers import (
    sample_base_consistency,
    sample_decoder_consistency_tiled,
)


def generate_samples(base_model, base_params, decoder_model, decoder_params,
                     cond_imgs, cond_means, cond_stds, *, key,
                     canvas: int = 192, crop: int = 64, mode: str = "blend",
                     inter_t: float = float(np.arctan(0.35 / 0.5)),
                     latent_compression: int = 8) -> np.ndarray:
    """Generate decoded terrain crops for a batch of conditioning images."""
    B = cond_imgs.shape[0]
    wfn = constant_weight_window if mode == "constant" else linear_weight_window
    tile = None if mode == "naive" else crop
    shape = (B, canvas if mode != "naive" else crop,
             canvas if mode != "naive" else crop, 5)
    key, k1, k2 = jax.random.split(key, 3)
    latents = sample_base_consistency(
        base_model, base_params, shape,
        cond_imgs if mode != "naive" else
        [np.zeros((B, 58), np.float32)],
        key=k1, inter_t=inter_t, tile_size=tile,
        cond_means=cond_means, cond_stds=cond_stds,
        histogram_raw=np.zeros(5, np.float32),
        weight_window_fn=wfn, skip_blend_last=(mode == "skip-edge"))
    if mode != "naive":
        c0 = (latents.shape[1] - crop) // 2
        latents = latents[:, c0:c0 + crop, c0:c0 + crop, :]
    lat4 = latents[..., :4]
    residual = sample_decoder_consistency_tiled(
        decoder_model, decoder_params, lat4, key=k2,
        tile_size=crop * latent_compression, stride=crop * latent_compression,
        latent_compression=latent_compression)
    terrain = np.sign(np.asarray(residual)) * np.asarray(residual) ** 2
    return terrain


def evaluate(base_path: str, decoder_path: str, dataset_kwargs: dict, *,
             n_images: int = 256, batch: int = 8, mode: str = "blend",
             seed: int = 0, features="terrain") -> dict:
    from terrain_diffusion_tpu.nn import torch_compat
    from terrain_diffusion_tpu.training.datasets import H5LatentsDataset

    base_model, base_params = torch_compat.load_model(base_path)
    decoder_model, decoder_params = torch_compat.load_model(decoder_path)
    ds = H5LatentsDataset(**{**dataset_kwargs, "val_dset": True})

    real, fake = [], []
    key = jax.random.key(seed)
    rng = np.random.default_rng(seed)
    while len(fake) * batch < n_images:
        items = [ds[int(rng.integers(1 << 31))] for _ in range(batch)]
        cond_imgs = np.stack([i["cond_inputs_img"] for i in items])
        gt = np.stack([np.asarray(i.get("ground_truth", i["image"][..., :1]))
                       for i in items])
        key, sub = jax.random.split(key)
        terrain = generate_samples(
            base_model, base_params, decoder_model, decoder_params,
            cond_imgs, ds.cond_input_mean, ds.cond_input_std,
            key=sub, mode=mode)
        fake.append(terrain)
        real.append(gt.reshape(gt.shape[0], terrain.shape[1], terrain.shape[2], -1)
                    if gt.size == terrain[..., :1].size else
                    np.resize(gt, terrain.shape))
    real = normalize_terrain_for_metric(np.concatenate(real)[..., :1])
    fake = normalize_terrain_for_metric(np.concatenate(fake)[..., :1])
    from terrain_diffusion_tpu.evaluation.metrics import resolve_feature_fn

    feature_fn = resolve_feature_fn(features)
    kid_mean, kid_std = compute_kid(real, fake, feature_fn=feature_fn)
    fid = compute_fid(real, fake, feature_fn=feature_fn)
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
def main(base_path, decoder_path, h5_file, n_images, batch, mode, seed, features):
    """FID/KID of InfiniteDiffusion tiled generation vs real DEM crops."""
    dataset_kwargs = dict(
        h5_file=h5_file, crop_size=64, pct_land_ranges=[[0.01, 1]],
        subset_resolutions=[90], subset_weights=[1.0],
        latents_mean=[0, 0, 0, 0], latents_std=[1, 1, 1, 1], split="val")
    out = evaluate(base_path, decoder_path, dataset_kwargs,
                   n_images=n_images, batch=batch, mode=mode, seed=seed,
                   features=features)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
