"""Autoencoder (VAE) trainer (reference `trainers/autoencoder.py:17-231`).

Loss: MAE + KL + perceptual term.  The reference uses LPIPS-Alex
(spatial=True); `nn/lpips.py` provides the same network in JAX — set
``training.perceptual = "lpips"`` plus ``training.lpips_weights`` (and
optionally ``training.lpips_lin_weights``) to use it.  Without weight files
(they are not bundled offline) the default is a multi-scale
gradient-similarity surrogate ("grad"), a documented divergence.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from terrain_diffusion_tpu.training.diffusion_core import (
    autoencoder_loss,
    make_optimizer,
    make_train_step,
)
from terrain_diffusion_tpu.training.trainers.base import TrainerBase, ema_for


def multiscale_gradient_loss(recon, target, scales=(1, 2, 4)):
    """Cheap perceptual surrogate: L1 on image gradients at multiple scales."""
    loss = 0.0
    for s in scales:
        r = recon[:, ::s, ::s, :]
        t = target[:, ::s, ::s, :]
        loss = loss + jnp.abs(jnp.diff(r, axis=1) - jnp.diff(t, axis=1)).mean()
        loss = loss + jnp.abs(jnp.diff(r, axis=2) - jnp.diff(t, axis=2)).mean()
    return loss / len(scales)


class AutoencoderTrainer(TrainerBase):
    def __init__(self, config: dict, resolved: dict):
        self.config = config
        self.model = resolved["model"]  # EDMAutoencoder
        self.lr_sched = resolved["lr_sched"]
        tr = config.get("training", {})
        self.kl_weight = float(tr.get("kl_weight", 1e-5))
        self.perceptual_weight = float(tr.get("perceptual_weight", 1.0))
        use_perceptual = bool(tr.get("use_perceptual", True))
        perceptual_kind = tr.get("perceptual", "grad")
        if not use_perceptual:
            perceptual_fn = None
        elif perceptual_kind == "lpips":
            from terrain_diffusion_tpu.nn import lpips as _lpips

            weights = tr.get("lpips_weights")
            if not weights:
                raise ValueError(
                    "training.perceptual='lpips' needs training.lpips_weights "
                    "(AlexNet backbone .pth/.safetensors; optional separate "
                    "training.lpips_lin_weights for the lpips linear heads)")
            lp = _lpips.load_torch_checkpoint(weights,
                                              tr.get("lpips_lin_weights"))
            perceptual_fn = _lpips.make_perceptual_fn(lp)
        elif perceptual_kind == "grad":
            perceptual_fn = multiscale_gradient_loss
        else:
            raise ValueError(f"unknown training.perceptual {perceptual_kind!r}")
        opt_kwargs = config.get("optimizer", {}).get("kwargs", {})
        self.optimizer = make_optimizer(
            betas=tuple(opt_kwargs.get("betas", (0.9, 0.99))),
            grad_clip=float(tr.get("gradient_clip_val", 10.0)))

        def loss_fn(params, batch, key):
            return autoencoder_loss(self.model, params, batch, key,
                                    kl_weight=self.kl_weight,
                                    perceptual_fn=perceptual_fn,
                                    perceptual_weight=self.perceptual_weight)

        self._step = jax.jit(make_train_step(loss_fn, self.optimizer))
        self._val = jax.jit(lambda p, b, k: autoencoder_loss(
            self.model, p, b, k, kl_weight=self.kl_weight,
            perceptual_fn=perceptual_fn,
            perceptual_weight=self.perceptual_weight))

    def init_state(self, key, save_dir=None) -> dict:
        params = self.model.init(key)
        return {
            "params": params,
            "opt_state": self.optimizer.init(params),
            "ema": ema_for(params, self.config, save_dir),
        }

    def train_step(self, state: dict, batch: dict, key, counters: dict) -> dict:
        lr = self.lr_sched.get(counters["seen"])
        params, opt_state, metrics = self._step(
            state["params"], state["opt_state"], {"image": batch["image"]},
            key, jnp.float32(lr))
        state["params"] = params
        state["opt_state"] = opt_state
        counters["seen"] += int(np.shape(batch["image"])[0])
        counters["step"] += 1
        if state.get("ema") is not None:
            state["ema"].update(params, counters["step"])
        metrics = {k: float(v) for k, v in metrics.items()}
        metrics["lr"] = lr
        return metrics

    def evaluate(self, state: dict, batches, key) -> dict:
        out = []
        for batch in batches:
            key, sub = jax.random.split(key)
            loss, aux = self._val(state["params"], {"image": batch["image"]}, sub)
            out.append({"val_loss": float(loss),
                        **{f"val_{k}": float(v) for k, v in aux.items()}})
        if not out:
            return {}
        return {k: float(np.mean([o[k] for o in out])) for k in out[0]}
