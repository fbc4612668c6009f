"""Diffusion trainer (TrigFlow EDM; reference `trainers/diffusion.py:19-428`)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from terrain_diffusion_tpu.training.diffusion_core import (
    DiffusionLossConfig,
    diffusion_loss,
    make_optimizer,
    make_train_step,
)
from terrain_diffusion_tpu.training.trainers.base import TrainerBase, ema_for


class DiffusionTrainer(TrainerBase):
    def __init__(self, config: dict, resolved: dict):
        self.config = config
        self.resolved = resolved
        self.model = resolved["model"]
        self.lr_sched = resolved["lr_sched"]
        tr = config.get("training", {})
        self.loss_cfg = DiffusionLossConfig(
            sigma_data=float(config.get("scheduler", {}).get("sigma_data", 0.5)
                             if isinstance(config.get("scheduler"), dict) else 0.5),
            P_mean=float(tr.get("P_mean", 0.0)),
            P_std=float(tr.get("P_std", 1.5)),
            scale_sigma=bool(tr.get("scale_sigma", False)),
            scaling_channels=tuple(tr.get("scaling_channels", ())),
            sigma_scale_eps=float(tr.get("sigma_scale_eps", 0.05)),
        )
        opt_kwargs = config.get("optimizer", {}).get("kwargs", {})
        self.optimizer = make_optimizer(
            betas=tuple(opt_kwargs.get("betas", (0.9, 0.99))),
            grad_clip=float(tr.get("gradient_clip_val", 10.0)))

        def loss_fn(params, batch, key):
            return diffusion_loss(self.model, params, batch, key, self.loss_cfg)

        self._step = jax.jit(make_train_step(loss_fn, self.optimizer))
        self._val_loss = jax.jit(
            lambda params, batch, key: diffusion_loss(
                self.model, params, batch, key, self.loss_cfg, training=False)[0])

    def init_state(self, key, save_dir=None) -> dict:
        params = self.model.init(key)
        return {
            "params": params,
            "opt_state": self.optimizer.init(params),
            "ema": ema_for(params, self.config, save_dir),
        }

    def prepare_batch(self, batch: dict) -> dict:
        out = {"image": batch["image"]}
        if batch.get("cond_img") is not None and "cond_img" in batch:
            out["cond_img"] = batch["cond_img"]
        if batch.get("cond_inputs"):
            out["cond_inputs"] = batch["cond_inputs"]
        return out

    def train_step(self, state: dict, batch: dict, key, counters: dict) -> dict:
        lr = self.lr_sched.get(counters["seen"])
        params, opt_state, metrics = self._step(
            state["params"], state["opt_state"], self.prepare_batch(batch), key,
            jnp.float32(lr))
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
        losses = []
        for batch in batches:
            key, sub = jax.random.split(key)
            losses.append(float(self._val_loss(
                state["params"], self.prepare_batch(batch), sub)))
        return {"val_loss": float(np.mean(losses))} if losses else {}

    def evaluate_full(self, state: dict, val_dataset, key) -> dict:
        """Validation loss + KID with EMA weights (reference
        `diffusion.py:355-427`): samples on val conditioning, optionally
        decoding latents to terrain via `[evaluation] kid_autoencoder_path`."""
        from terrain_diffusion_tpu.training.datasets import collate
        from terrain_diffusion_tpu.training.trainers.eval_kid import evaluate_kid

        ev = self.config.get("evaluation", {})
        n_val = int(ev.get("validation_steps", 64))
        bs = int(ev.get("kid_batch_size", 8))
        batches = [collate([val_dataset[i * bs + j] for j in range(bs)])
                   for i in range(max(n_val // bs, 1))]
        key, k1, k2 = jax.random.split(key, 3)
        out = self.evaluate(state, batches, k1)
        if not ev.get("kid_enabled", False):
            return out
        params = state["params"]
        if state.get("ema") is not None and state["ema"].emas:
            params = state["ema"].shortest()
        decoder = None
        if ev.get("kid_autoencoder_path"):
            from terrain_diffusion_tpu.nn import torch_compat

            decoder = torch_compat.load_model(ev["kid_autoencoder_path"])
        kid = evaluate_kid(
            self.model, params, val_dataset, k2,
            mode=ev.get("mode", "base"),
            n_images=int(ev.get("kid_n_images", 128)),
            batch=bs, steps=int(ev.get("kid_scheduler_steps", 12)),
            decoder=decoder)
        out.update({f"val_{k}": v for k, v in kid.items()})
        return out
