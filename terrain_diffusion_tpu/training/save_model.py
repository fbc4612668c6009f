"""Synthesize a post-hoc EMA model from a training checkpoint
(reference `training/save_model.py:15-72`, TRAINING.md workflow).

``python -m terrain_diffusion_tpu save-model <checkpoint_dir> --sigma-rel 0.1``
writes ``<checkpoint_dir>/saved_model_ema/`` in HF-format (config.json +
model.safetensors) loadable by the pipeline.
"""
from __future__ import annotations

import os

import click
import jax
import numpy as np

from terrain_diffusion_tpu.nn import torch_compat
from terrain_diffusion_tpu.training.phema import PostHocEMA


@click.command()
@click.argument("checkpoint_dir", type=click.Path(exists=True))
@click.option("--sigma-rel", type=float, default=None,
              help="EMA length to synthesize (post-hoc); omit to save raw weights")
@click.option("--step", type=int, default=None,
              help="snapshot step cutoff for synthesis")
@click.option("--out", default=None, help="output directory")
def main(checkpoint_dir, sigma_rel, step, out):
    """Save an inference model (optionally post-hoc EMA) from a checkpoint."""
    model, params = torch_compat.load_model(
        os.path.join(checkpoint_dir, "saved_model"))
    if sigma_rel is not None:
        phema_dir = os.path.join(checkpoint_dir, "..", "phema")
        if not os.path.isdir(phema_dir):
            phema_dir = os.path.join(checkpoint_dir, "phema")
        params = PostHocEMA.synthesize_from_folder(phema_dir, sigma_rel, step)
        print(f"Synthesized EMA sigma_rel={sigma_rel} from {phema_dir}")
    out = out or os.path.join(checkpoint_dir, "saved_model_ema")
    torch_compat.save_model(model, jax.tree.map(np.asarray, params), out)
    print(f"Saved model to {out}")


if __name__ == "__main__":
    main()
