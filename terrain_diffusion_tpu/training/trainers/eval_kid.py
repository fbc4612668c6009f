"""In-training KID evaluation (reference `trainers/diffusion.py:184-286`,
`trainers/consistency.py:273-378`): sample the model on validation
conditioning, decode latents to terrain when a decoder is available, and
compute KID against REAL validation terrain with EMA weights.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from terrain_diffusion_tpu.evaluation.metrics import (compute_kid,
                                                      normalize_terrain_for_metric)
from terrain_diffusion_tpu.evaluation.samplers import (
    compose_terrain,
    sample_base_consistency,
    sample_base_diffusion,
    sample_decoder_consistency_tiled,
)


def _latents_to_terrain(latents_unit, decoder_model, decoder_params, key, *,
                        latents_mean=None, latents_std=None,
                        residual_mean=0.0, residual_std=1.1678,
                        latent_compression=8):
    """Decode sampled latents to terrain (reference
    `diffusion.py:184-217` `_decode_latents_to_terrain` + signed square).

    latents_unit: sampler output — `denoised / sigma_data`, i.e. channels
    0:4 are NORMALIZED VAE latents ((raw - mean)/std) and channel 4 is the
    normalized lowfreq.  The decoder was trained on raw VAE latents
    (H5DecoderTerrainDataset cond), so conditioning is de-normalized first;
    its output is a normalized residual, de-normalized with residual stats
    before the laplacian compose (same chain as the serving composition,
    `pipeline/world.py _compose_fused_core`).
    """
    lat = np.asarray(latents_unit[..., :4], np.float32)
    if latents_std is not None:
        # mathematically-correct inverse of (raw - mean)/std; the reference
        # writes `/std + mean` (diffusion.py:192), identical for the
        # shipped configs' mean=0/std=1
        lat = lat * np.asarray(latents_std, np.float32).reshape(1, 1, 1, -1)
    if latents_mean is not None:
        lat = lat + np.asarray(latents_mean, np.float32).reshape(1, 1, 1, -1)
    residual_unit = sample_decoder_consistency_tiled(
        decoder_model, decoder_params, lat, key=key,
        tile_size=lat.shape[1] * latent_compression,
        stride=lat.shape[1] * latent_compression,
        latent_compression=latent_compression)  # (B, H, W, 1), normalized
    return compose_terrain(
        np.asarray(residual_unit)[..., 0], latents_unit[..., 4],
        lowfreq_normalized=True, residual_mean=residual_mean,
        residual_std=residual_std)


def evaluate_kid(model, params, val_dataset, key, *, mode: str = "base",
                 n_images: int = 128, batch: int = 8, steps: int = 12,
                 sampler: str = "diffusion", inter_t: float | None = None,
                 decoder=None, guide=None, guidance_scale: float = 1.0,
                 features="terrain", sigma_data: float = 0.5) -> dict:
    """KID of model samples vs validation data.

    mode='base' with `decoder=(model, params)`: sampled latents decode to
    terrain and compare against the dataset's REAL `ground_truth` terrain
    (signed-squared), exactly like the reference's `_calculate_base_kid`.
    Without a decoder, sampled latents compare against the dataset latent
    images in the dataset's own (sigma_data-scaled) space.
    """
    rng = np.random.default_rng(0)
    real, fake = [], []
    guide_model, guide_params = guide if guide else (None, None)
    lat_mean = getattr(val_dataset, "latents_mean", None)
    lat_std = getattr(val_dataset, "latents_std", None)
    while len(fake) * batch < n_images:
        items = [val_dataset[int(rng.integers(1 << 31))] for _ in range(batch)]
        conds = [np.stack([i["cond_inputs"][0] for i in items])]
        gt = np.stack([i["image"] for i in items])
        key, sub = jax.random.split(key)
        if sampler == "consistency":
            out = sample_base_consistency(model, params, gt.shape, conds,
                                          key=sub, inter_t=inter_t)
        else:
            out = sample_base_diffusion(
                model, params, gt.shape, conds, key=sub, steps=steps,
                guide_model=guide_model, guide_params=guide_params,
                guidance_scale=guidance_scale)
        out = np.asarray(out)  # denoised / sigma_data (normalized units)
        if mode == "base" and decoder is not None and gt.shape[-1] >= 5:
            key, k1 = jax.random.split(key)
            fake.append(_latents_to_terrain(
                out, decoder[0], decoder[1], k1,
                latents_mean=lat_mean, latents_std=lat_std)[..., None])
            if all("ground_truth" in i for i in items):
                # real side = REAL validation terrain (reference
                # diffusion.py:268-270), not re-decoded latents
                gt_sqrt = np.stack([
                    np.asarray(i["ground_truth"], np.float32)[..., 0]
                    for i in items])
                real.append((np.sign(gt_sqrt) * gt_sqrt ** 2)[..., None])
            else:  # latents-only val set: decode the gt latents instead
                key, k2 = jax.random.split(key)
                real.append(_latents_to_terrain(
                    gt / sigma_data, decoder[0], decoder[1], k2,
                    latents_mean=lat_mean, latents_std=lat_std)[..., None])
        else:
            # latent-space KID: compare in the dataset's image space
            # (gt = (raw-mean)/std * sigma_data; sampler out is /sigma_data)
            fake.append(out * sigma_data)
            real.append(gt)
    real = normalize_terrain_for_metric(np.concatenate(real)[..., :1])
    fake = normalize_terrain_for_metric(np.concatenate(fake)[..., :1])
    from terrain_diffusion_tpu.evaluation.metrics import resolve_feature_fn

    kid_mean, kid_std = compute_kid(real, fake, n_subsets=50,
                                    subset_size=min(len(real), 64),
                                    feature_fn=resolve_feature_fn(features))
    return {"kid_mean": kid_mean, "kid_std": kid_std, "n_images": len(fake)}
