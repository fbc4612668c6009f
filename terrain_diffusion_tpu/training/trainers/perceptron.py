"""Perceptron (biome MLP) trainer (reference `trainers/perceptron.py`).
Cross-entropy on climate 4-vectors -> Koppen classes."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from terrain_diffusion_tpu.training.trainers.base import TrainerBase, ema_for


class PerceptronTrainer(TrainerBase):
    def __init__(self, config: dict, resolved: dict):
        self.config = config
        self.model = resolved["model"]
        self.lr_sched = resolved["lr_sched"]
        tr = config.get("training", {})
        self.optimizer = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.clip_by_global_norm(float(tr.get("gradient_clip_val", 10.0))),
                optax.adam(1.0),
                optax.scale(learning_rate),
            ))(learning_rate=1e-3)

        def loss_fn(params, batch, key):
            logits = self.model.apply(params, batch["image"], key=key,
                                      training=True)
            labels = batch["label"].astype(jnp.int32)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            acc = (logits.argmax(-1) == labels).mean()
            return loss, {"acc": acc}

        def step(params, opt_state, batch, key, lr):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, key)
            opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, {"loss": loss, **aux}

        self._step = jax.jit(step)

    def init_state(self, key, save_dir=None) -> dict:
        params = self.model.init(key)
        return {"params": params, "opt_state": self.optimizer.init(params),
                "ema": ema_for(params, self.config, save_dir)}

    def train_step(self, state, batch, key, counters) -> dict:
        lr = self.lr_sched.get(counters["seen"])
        params, opt_state, metrics = self._step(
            state["params"], state["opt_state"],
            {"image": batch["image"], "label": batch["label"]},
            key, jnp.float32(lr))
        state["params"] = params
        state["opt_state"] = opt_state
        counters["seen"] += int(np.shape(batch["image"])[0])
        counters["step"] += 1
        if state.get("ema") is not None:
            state["ema"].update(params, counters["step"])
        return {**{k: float(v) for k, v in metrics.items()}, "lr": lr}
