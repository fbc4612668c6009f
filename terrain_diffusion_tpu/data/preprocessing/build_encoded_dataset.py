"""build-encoded-dataset CLI (reference `build_encoded_dataset.py:16-154`):
runs the trained VAE encoder over every subchunk's residual with 8-fold D4
pre-augmentation, storing `latent[8, 2C, h, w]` fp16 plus per-channel
latent statistics (Welford) — batched on the accelerator.
"""
from __future__ import annotations

import click
import numpy as np
from tqdm import tqdm

import jax
import jax.numpy as jnp

from terrain_diffusion_tpu.data.welford import Welford
from terrain_diffusion_tpu.nn import torch_compat


def _d4_stack(arr: np.ndarray) -> np.ndarray:
    """(H, W) -> (8, H, W): 4 rotations x [identity, horizontal flip]."""
    out = []
    for flip in (False, True):
        a = arr[:, ::-1] if flip else arr
        for k in range(4):
            out.append(np.ascontiguousarray(np.rot90(a, k)))
    return np.stack(out)


def build_encoded_dataset(h5_file: str, model_path: str, resolution: int = 90,
                          sigma_data: float = 0.5, residual_mean: float = 0.0,
                          residual_std: float = 1.1678, batch: int = 8):
    import h5py

    ae, params = torch_compat.load_model(model_path)

    @jax.jit
    def encode(x):  # x: (B, H, W, 1)
        means, logvars = ae.preencode(params, x)
        return jnp.concatenate([means, logvars], axis=-1)

    stats = Welford(ae.config.latent_channels)
    with h5py.File(h5_file, "a") as f:
        res_group = f[str(resolution)]
        jobs = []
        for chunk_id in res_group:
            for sub_id in res_group[chunk_id]:
                g = res_group[chunk_id][sub_id]
                if "residual" in g and "latent" not in g:
                    jobs.append((chunk_id, sub_id))
        print(f"{len(jobs)} subchunks to encode")
        for chunk_id, sub_id in tqdm(jobs):
            g = res_group[chunk_id][sub_id]
            residual = np.asarray(g["residual"], np.float32)
            residual = (residual - residual_mean) / residual_std * sigma_data
            stack = _d4_stack(residual)[..., None]  # (8, H, W, 1)
            enc = np.asarray(encode(jnp.asarray(stack)), np.float32)
            enc = np.moveaxis(enc, -1, 1)  # (8, 2C, h, w)
            d = g.create_dataset("latent", data=enc.astype(np.float16),
                                 compression="lzf")
            d.attrs["pct_land"] = g["residual"].attrs["pct_land"]
            d.attrs["split"] = g["residual"].attrs.get("split", "train")
            lc = ae.config.latent_channels
            # only the identity-augmentation means (enc[0]) feed the stats
            stats.update(enc[0, :lc])
        # Never clobber dataset-wide stats on a resume: this run only saw
        # newly encoded subchunks (a no-op rerun would write zeros)
        if not stats.count.any():
            print("no new subchunks: keeping the existing stats attrs")
        elif "latents_mean" in res_group.attrs:
            print("resume: new latents NOT folded into the stored stats "
                  "attrs; delete the attrs to recompute from a full rerun")
        else:
            res_group.attrs["latents_mean"] = stats.mean.tolist()
            res_group.attrs["latents_std"] = stats.std.tolist()
    if stats.count.any():
        print(f"latent stats: mean={stats.mean} std={stats.std}")


@click.command()
@click.argument("h5_file", type=click.Path(exists=True))
@click.argument("model_path", type=click.Path(exists=True))
@click.option("--resolution", type=int, default=90)
@click.option("--sigma-data", type=float, default=0.5)
@click.option("--residual-mean", type=float, default=0.0)
@click.option("--residual-std", type=float, default=1.1678)
def main(h5_file, model_path, resolution, sigma_data, residual_mean, residual_std):
    """Encode dataset residuals with a trained VAE (8-fold pre-augmentation)."""
    build_encoded_dataset(h5_file, model_path, resolution, sigma_data,
                          residual_mean, residual_std)


if __name__ == "__main__":
    main()
