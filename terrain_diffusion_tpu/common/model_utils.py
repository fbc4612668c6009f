"""Model path resolution + checkpoint loading helpers
(reference `common/model_utils.py:6-46`)."""
from __future__ import annotations

import os

# Local-checkpoint defaults -> published weight ids.  The hub ids are the
# reference's published checkpoints; loading them requires converting the
# repo locally (weights are torch-format safetensors, which
# `nn.torch_compat.load_model` reads directly once downloaded).
MODEL_PATHS = {
    "coarse": ("checkpoints/models/diffusion_coarse",
               "xandergos/TerrainDiffusion-Diffusion-Coarse-128A"),
    "base": ("checkpoints/models/consistency_base-192x3",
             "xandergos/TerrainDiffusion-Consistency-Base-192x3"),
    "decoder": ("checkpoints/models/consistency_decoder-64x3",
                "xandergos/TerrainDiffusion-Consistency-Decoder-64x3"),
    "diffusion_base": ("checkpoints/models/diffusion_base-192x3",
                       "xandergos/TerrainDiffusion-Diffusion-Base-192x3"),
    "diffusion_base_guide": ("checkpoints/models/diffusion_base-128x3",
                             "xandergos/TerrainDiffusion-Diffusion-Base-128x3"),
}


def resolve_model_path(user_path: str | None, local_default: str,
                       hub_id: str) -> str:
    """user override -> local default -> hub id (download out of scope here)."""
    if user_path is not None:
        return user_path
    if os.path.exists(local_default):
        return local_default
    return hub_id


def get_default_model_path(name: str) -> str:
    local, hub = MODEL_PATHS[name]
    return local if os.path.exists(local) else hub


def get_model(checkpoint_path: str, sigma_rel: float | None = None,
              ema_step: int | None = None):
    """Load (model, params), optionally synthesizing a post-hoc EMA
    (reference `get_model`, model_utils.py:38-46)."""
    from terrain_diffusion_tpu.nn import torch_compat
    from terrain_diffusion_tpu.training.phema import PostHocEMA

    model, params = torch_compat.load_model(
        os.path.join(checkpoint_path, "saved_model")
        if os.path.isdir(os.path.join(checkpoint_path, "saved_model"))
        else checkpoint_path)
    if sigma_rel is not None:
        cands = (os.path.join(checkpoint_path, "..", "phema"),
                 os.path.join(checkpoint_path, "phema"))
        for cand in cands:
            if os.path.isdir(cand):
                params = PostHocEMA.synthesize_from_folder(cand, sigma_rel, ema_step)
                break
        else:
            # silently returning the RAW weights when EMA was explicitly
            # requested would degrade eval/serving quality with no signal
            raise FileNotFoundError(
                f"sigma_rel={sigma_rel} requested but no phema snapshots at "
                f"{cands[0]} or {cands[1]}")
    return model, params
