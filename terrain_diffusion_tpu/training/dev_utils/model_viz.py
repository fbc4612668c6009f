"""Model-in-the-loop visualizers (reference `visualize_autoencoder.py`,
`visualize_base_diffusion.py` / `visualize_base_dataset.py`,
`visualize_consistency_decoder.py`): run trained models on dataset samples
and page through inputs / outputs / error maps."""
from __future__ import annotations

import click
import numpy as np

import jax

from terrain_diffusion_tpu.training.dev_utils import (
    Browser, Page, decode_terrain, load_section)


def _load(model_path):
    from terrain_diffusion_tpu.nn import torch_compat

    return torch_compat.load_model(model_path)


@click.command("autoencoder")
@click.option("--config", "config_path", required=True,
              type=click.Path(exists=True))
@click.option("--model-path", required=True)
@click.option("--section", default="val_dataset")
@click.option("--n", type=int, default=4)
@click.option("--out", default="autoencoder_viz.png")
@click.option("--seed", type=int, default=548)
@click.option("--headless/--interactive", default=None)
@click.option("-o", "--override", "overrides", multiple=True)
def autoencoder(config_path, model_path, section, n, out, seed, headless,
                overrides):
    """VAE roundtrip: input residual, reconstruction, |error|, latents."""
    ds = load_section(config_path, section, overrides)
    ae, params = _load(model_path)

    @jax.jit
    def roundtrip(x, key):
        means, logvars = ae.preencode(params, x)
        z = ae.postencode(means, logvars, key=key)
        return ae.decode(params, z), means

    def page(i):
        s = ds[i]
        x = np.asarray(s["image"])[None]
        rec, means = roundtrip(x, jax.random.key(seed + i))
        rec = np.asarray(rec)[0]
        means = np.asarray(means)[0]
        err = np.abs(rec[..., 0] - x[0, ..., 0])
        p = Page(f"AE roundtrip [{i}]  MAE={err.mean():.4f}")
        p.image("input residual", x[0, ..., 0], cmap="terrain")
        p.image("reconstruction", rec[..., 0], cmap="terrain")
        p.image("|error|", err, cmap="magma")
        for c in range(min(means.shape[-1], 4)):
            p.image(f"latent mean[{c}]", means[..., c])
        return p

    Browser(page, n_pages=n, out=out, headless=headless).run()


@click.command("base-diffusion")
@click.option("--config", "config_path", required=True,
              type=click.Path(exists=True))
@click.option("--model-path", required=True, help="base diffusion model")
@click.option("--decoder-path", default=None,
              help="consistency decoder for latent->terrain decode")
@click.option("--section", default="val_dataset")
@click.option("--n", type=int, default=2)
@click.option("--steps", type=int, default=15)
@click.option("--out", default="base_diffusion_viz.png")
@click.option("--seed", type=int, default=548)
@click.option("--headless/--interactive", default=None)
@click.option("-o", "--override", "overrides", multiple=True)
def base_diffusion(config_path, model_path, decoder_path, section, n, steps,
                   out, seed, headless, overrides):
    """Sample latents on dataset conditioning with DPM-Solver++, compare to
    the dataset's ground-truth latents; optionally decode to terrain."""
    from terrain_diffusion_tpu.evaluation.samplers import (
        sample_base_diffusion, sample_decoder_consistency_tiled)

    ds = load_section(config_path, section, overrides)
    model, params = _load(model_path)
    decoder = _load(decoder_path) if decoder_path else None

    def page(i):
        s = ds[i]
        gt = np.asarray(s["image"])  # (H, W, 5): 4 latents + lowfreq
        cond = [np.asarray(c)[None] for c in s.get("cond_inputs", [])]
        key = jax.random.key(seed + i)
        lat = sample_base_diffusion(
            model, params, (1, gt.shape[0], gt.shape[1], gt.shape[-1]),
            cond, key=key, steps=steps)
        lat = np.asarray(lat)[0]
        p = Page(f"base diffusion sample [{i}]  steps={steps}")
        for c in range(min(4, lat.shape[-1])):
            p.image(f"sampled latent[{c}]", lat[..., c])
            p.image(f"gt latent[{c}]", gt[..., c])
        if lat.shape[-1] >= 5:
            p.image("sampled lowfreq", lat[..., 4], cmap="terrain")
            p.image("gt lowfreq", gt[..., 4], cmap="terrain")
        if decoder is not None and lat.shape[-1] >= 5:
            dec_model, dec_params = decoder
            sigma_data = getattr(ds, "sigma_data", 0.5)
            res = sample_decoder_consistency_tiled(
                dec_model, dec_params, lat[None, ..., :4], key=key,
                tile_size=min(512, gt.shape[0] * 8))
            res = np.asarray(res)[0, ..., 0]
            # sampler outputs are ALREADY denoised/sigma_data (normalized
            # units) — lat[..., 4] is the normalized lowfreq as-is
            terrain = decode_terrain(res, lat[..., 4])
            p.image("decoded terrain [m]", terrain, cmap="terrain")
        return p

    Browser(page, n_pages=n, out=out, headless=headless).run()


@click.command("consistency-decoder")
@click.option("--config", "config_path", required=True,
              type=click.Path(exists=True))
@click.option("--model-path", required=True, help="consistency decoder")
@click.option("--section", default="val_dataset",
              help="an H5DecoderTerrainDataset section")
@click.option("--n", type=int, default=4)
@click.option("--out", default="decoder_viz.png")
@click.option("--seed", type=int, default=548)
@click.option("--headless/--interactive", default=None)
@click.option("-o", "--override", "overrides", multiple=True)
def consistency_decoder(config_path, model_path, section, n, out, seed,
                        headless, overrides):
    """1-step consistency decode of dataset latents vs ground-truth
    residual (reference `visualize_consistency_decoder.py`)."""
    from terrain_diffusion_tpu.evaluation.samplers import (
        sample_decoder_consistency_tiled)

    ds = load_section(config_path, section, overrides)
    model, params = _load(model_path)

    def page(i):
        s = ds[i]
        sigma_data = getattr(ds, "sigma_data", 0.5)
        # dataset image = residual_norm * sigma_data; the sampler returns
        # residual_norm — compare both in normalized units
        gt = np.asarray(s["image"])[..., 0] / sigma_data
        cond = np.asarray(s["cond_img"])  # upsampled latents (H, W, 4)
        lc = max(gt.shape[0] // max(cond.shape[0], 1), 1)
        # cond is already nearest-upsampled; downsample back to latent grid
        lat = cond[::lc, ::lc, :][None] if lc > 1 else cond[None]
        res = sample_decoder_consistency_tiled(
            model, params, lat, key=jax.random.key(seed + i),
            tile_size=min(512, gt.shape[0]), latent_compression=lc)
        res = np.asarray(res)[0, ..., 0]
        err = np.abs(res - gt)
        p = Page(f"consistency decode [{i}]  MAE={err.mean():.4f}")
        p.image("gt residual", gt, cmap="terrain")
        p.image("decoded residual", res, cmap="terrain")
        p.image("|error|", err, cmap="magma")
        for c in range(min(4, cond.shape[-1])):
            p.image(f"latent cond[{c}]", cond[..., c])
        return p

    Browser(page, n_pages=n, out=out, headless=headless).run()


if __name__ == "__main__":
    autoencoder()
