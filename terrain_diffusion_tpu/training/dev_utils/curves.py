"""Per-noise-level loss curve (reference `dev_utils/noise_loss_curve.py`):
evaluate a trained diffusion model's raw v-MSE and its uncertainty-weighted
loss on a sigma grid over dataset samples — the quickest read on which part
of the noise schedule a checkpoint has (not) learned."""
from __future__ import annotations

import click
import numpy as np

import jax
import jax.numpy as jnp

from terrain_diffusion_tpu.training.dev_utils import (
    Browser, Page, load_section)


@click.command("noise-loss-curve")
@click.option("--config", "config_path", required=True,
              type=click.Path(exists=True))
@click.option("--model-path", required=True)
@click.option("--section", default="val_dataset")
@click.option("--n", type=int, default=16, help="samples averaged per sigma")
@click.option("--sigma-min", type=float, default=2e-3)
@click.option("--sigma-max", type=float, default=80.0)
@click.option("--points", type=int, default=24)
@click.option("--sigma-data", type=float, default=0.5)
@click.option("--out", default="noise_loss_curve.png")
@click.option("--seed", type=int, default=548)
@click.option("--headless/--interactive", default=None)
@click.option("-o", "--override", "overrides", multiple=True)
def main(config_path, model_path, section, n, sigma_min, sigma_max, points,
         sigma_data, out, seed, headless, overrides):
    """Loss vs sigma curve for a trained diffusion model."""
    from terrain_diffusion_tpu.nn import torch_compat
    from terrain_diffusion_tpu.training.datasets import collate

    ds = load_section(config_path, section, overrides)
    model, params = torch_compat.load_model(model_path)
    batch = collate([ds[i] for i in range(n)])
    images = jnp.asarray(batch["image"])
    cond_inputs = [jnp.asarray(c) for c in batch.get("cond_inputs", [])]
    cond_img = (jnp.asarray(batch["cond_img"])
                if batch.get("cond_img") is not None else None)
    sd = sigma_data

    @jax.jit
    def loss_at(params, sigma, key):
        t = jnp.arctan(sigma / sd)
        noise = jax.random.normal(key, images.shape) * sd
        x_t = jnp.cos(t) * images + jnp.sin(t) * noise
        x = x_t / sd
        if cond_img is not None:
            x = jnp.concatenate([x, cond_img], axis=-1)
        nl = jnp.full((images.shape[0],), t, images.dtype)
        output, logvar = model.apply(params, x, nl, cond_inputs,
                                     return_logvar=True)
        pred_v = -sd * output
        v_t = jnp.cos(t) * noise - jnp.sin(t) * images
        mse = jnp.mean((pred_v - v_t) ** 2)
        weighted = jnp.mean(
            (1.0 / (jnp.exp(logvar) * sd**2)) * (pred_v - v_t) ** 2 + logvar)
        return mse, weighted, jnp.mean(logvar)

    sigmas = np.exp(np.linspace(np.log(sigma_min), np.log(sigma_max), points))
    mses, weighteds, logvars = [], [], []
    key = jax.random.key(seed)
    for s in sigmas:
        key, sub = jax.random.split(key)
        m, w, lv = loss_at(params, jnp.float32(s), sub)
        mses.append(float(m))
        weighteds.append(float(w))
        logvars.append(float(lv))
        print(f"sigma={s:9.4f}  v-MSE={mses[-1]:.5f}  "
              f"weighted={weighteds[-1]:.5f}  logvar={logvars[-1]:.3f}")

    def page(_i):
        p = Page(f"noise-loss curve  ({n} samples/point)")
        p.curve("raw v-MSE", sigmas, mses, xlabel="sigma", ylabel="MSE",
                logx=True)
        p.curve("uncertainty-weighted loss", sigmas, weighteds,
                xlabel="sigma", ylabel="loss", logx=True)
        p.curve("learned logvar", sigmas, logvars, xlabel="sigma",
                ylabel="logvar", logx=True)
        return p

    Browser(page, n_pages=1, out=out, headless=headless).run()


if __name__ == "__main__":
    main()
