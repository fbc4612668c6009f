"""In-training KID evaluation (reference `trainers/diffusion.py:184-352`,
`trainers/consistency.py:273-378`): sample the model on validation
conditioning, decode latents to terrain when a decoder is available, and
compute KID against the validation ground truth with EMA weights.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from terrain_diffusion_tpu.evaluation.metrics import (compute_kid,
                                                      normalize_terrain_for_metric)
from terrain_diffusion_tpu.evaluation.samplers import (
    sample_base_consistency,
    sample_base_diffusion,
    sample_decoder_consistency_tiled,
)
from terrain_diffusion_tpu.ops.laplacian import laplacian_decode


def _latents_to_terrain(latents, decoder_model, decoder_params, key,
                        latent_compression=8, lowfreq_mean=-31.4,
                        lowfreq_std=38.6, sigma_data=0.5):
    """Decode sampled (B,h,w,5) latents (4 VAE + 1 lowfreq) to terrain."""
    lat4 = latents[..., :4]
    residual = sample_decoder_consistency_tiled(
        decoder_model, decoder_params, lat4, key=key,
        tile_size=lat4.shape[1] * latent_compression,
        stride=lat4.shape[1] * latent_compression,
        latent_compression=latent_compression)
    lf = jnp.asarray(latents[..., 4]) / sigma_data * lowfreq_std + lowfreq_mean
    elev = laplacian_decode(jnp.moveaxis(residual, -1, 1)[:, 0], lf)
    return np.sign(np.asarray(elev)) * np.asarray(elev) ** 2


def evaluate_kid(model, params, val_dataset, key, *, mode: str = "base",
                 n_images: int = 128, batch: int = 8, steps: int = 12,
                 sampler: str = "diffusion", inter_t: float | None = None,
                 decoder=None, guide=None, guidance_scale: float = 1.0,
                 features="terrain") -> dict:
    """KID of model samples vs validation images.

    mode='base': sample latents on val conditioning, optionally decode to
    terrain via `decoder=(model, params)`.  mode='decoder': n/a here (use
    evaluation.stage_eval).  `guide=(model, params)` enables AutoGuidance.
    """
    rng = np.random.default_rng(0)
    real, fake = [], []
    guide_model, guide_params = guide if guide else (None, None)
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
        out = np.asarray(out)
        if mode == "base" and decoder is not None and gt.shape[-1] >= 5:
            key, k1, k2 = jax.random.split(key, 3)
            fake.append(_latents_to_terrain(out, decoder[0], decoder[1], k1)[..., None])
            real.append(_latents_to_terrain(gt, decoder[0], decoder[1], k2)[..., None])
        else:
            fake.append(out)
            real.append(gt)
    real = normalize_terrain_for_metric(np.concatenate(real)[..., :1])
    fake = normalize_terrain_for_metric(np.concatenate(fake)[..., :1])
    from terrain_diffusion_tpu.evaluation.metrics import resolve_feature_fn

    kid_mean, kid_std = compute_kid(real, fake, n_subsets=50,
                                    subset_size=min(len(real), 64),
                                    feature_fn=resolve_feature_fn(features))
    return {"kid_mean": kid_mean, "kid_std": kid_std, "n_images": len(fake)}
