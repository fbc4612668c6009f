"""GAN trainer — full rebuild of the reference's legacy/experimental GAN path
(`/root/reference/terrain_diffusion/training/trainers/gan.py:102-343`,
FID util `:42-99`; registered but unused by shipped configs).

Capability parity, JAX-idiomatic:

- **Relativistic non-saturating losses**: d = softplus(fake_pred - real_pred),
  g = softplus(stop_grad(real_pred) - fake_pred) (reference `:239,281`).
- **R1-style gradient penalty** on the *combined* real+fake discriminator
  input (reference penalizes `all_images`, `:243-248`), applied every
  `r_interval` steps with `r_gamma` warmed from `r_gamma*r_warmup_factor`
  down to `r_gamma` over `burnin_steps` (`:122-124,171-183`).  Two jitted
  step variants (with/without the penalty) keep control flow static.
- **Per-sample random crop** of real and fake images to `crop_size`
  (`:21-39,235-236`) — vmapped dynamic_slice.
- **Inject mode** (`training.mode='inject'`): generator sees TrigFlow-noised
  real images, t ~ atan(2·exp(8u-3)) with a `pct_fixed` fraction pinned to
  atan(160) and `pct_fixed` warmed from `warmup_pct_fixed` (`:192-203`).
  Adaptation to this framework's model zoo: the generator is an EDMUnet2D
  taking concat(mixed_real, z) channels with per-sample t as noise_labels
  (the reference uses a bespoke two-input GAN generator; no shipped config
  exists for either).
- **Auxiliary generator losses**: KL-to-unit-Gaussian on generator output
  stats (`kl_weight`, `:285-293`) and a range penalty outside [-2, 3.2]
  (`range_weight`, `:296-299`).
- **Warmups & optimizers**: linear lr warmup by `lr_warmup_factor`, adam
  beta2 warmed from `1-10*(1-b2)` to `b2` over `burnin_steps` (`:125-126`),
  `disc_lr_mult`, grad clips 100 (d) / 10 (g) (`:252-255,302-305`) — lr and
  b2 enter the jitted step as traced hyperparams (optax inject_hyperparams),
  so warmups never retrace.
- **FID evaluation** with EMA weights (`calculate_fid`, `:42-99`): elevation
  denormalized with MEAN=-2607/STD=2435, clamped to [-10000, 9000], scaled
  to [0, 255]; features default to terrain statistics, `inception:<weights>`
  for literature-comparable numbers.
"""
from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import optax

from terrain_diffusion_tpu.training.trainers.base import TrainerBase, ema_for


def linear_warmup(start, end, step, total):
    """Reference `gan.py:15-19`."""
    if step >= total:
        return end
    return start + (end - start) * (step / total)


def random_crop(key, images, crop_size: int):
    """Per-sample random square crop (reference `gan.py:21-39`), NHWC."""
    B, H, W, C = images.shape
    if H == crop_size and W == crop_size:
        return images
    kh, kw = jax.random.split(key)
    hs = jax.random.randint(kh, (B,), 0, H - crop_size + 1)
    ws = jax.random.randint(kw, (B,), 0, W - crop_size + 1)

    def one(img, h0, w0):
        return jax.lax.dynamic_slice(img, (h0, w0, 0), (crop_size, crop_size, C))

    return jax.vmap(one)(images, hs, ws)


# FID processing constants (reference `gan.py:46-58`)
FID_MEAN = -2607.0
FID_STD = 2435.0
FID_MIN_ELEV = -10000.0
FID_MAX_ELEV = 9000.0


def process_for_fid(images: np.ndarray) -> np.ndarray:
    """Denormalize elevation and map to [0, 255] (reference `gan.py:52-58`);
    (B, H, W) -> (B, H, W, 1) float32 in [0, 255] (NHWC, the layout every
    feature extractor in evaluation.metrics expects)."""
    x = np.asarray(images, np.float32) * FID_STD + FID_MEAN
    x = np.clip(x, FID_MIN_ELEV, FID_MAX_ELEV)
    x = (x - FID_MIN_ELEV) * 255.0 / (FID_MAX_ELEV - FID_MIN_ELEV)
    return x[..., None]


class GANTrainer(TrainerBase):
    def __init__(self, config: dict, resolved: dict):
        self.config = config
        self.resolved = resolved
        self.generator = resolved["model"]
        self.discriminator = resolved.get("discriminator") or resolved["model"]
        self.lr_sched = resolved["lr_sched"]
        tr = config.get("training", {})
        self.latent_channels = int(tr.get("latent_channels", 1))
        self.crop_size = tr.get("crop_size")
        self.mode = tr.get("mode", "plain")
        self.r_gamma = float(tr.get("r_gamma", 0.0))
        self.r_interval = int(tr.get("r_interval", 16))
        self.r_warmup_factor = float(tr.get("r_warmup_factor", 10.0))
        self.burnin_steps = int(tr.get("burnin_steps", 0))
        self.kl_weight = float(tr.get("kl_weight", 0.0))
        self.range_weight = float(tr.get("range_weight", 1.0))
        self.pct_fixed = float(tr.get("pct_fixed", 0.5))
        self.warmup_pct_fixed = float(tr.get("warmup_pct_fixed", 0.5))
        self.lr_warmup_factor = float(tr.get("lr_warmup_factor", 1.0))
        self.disc_lr_mult = float(tr.get("disc_lr_mult", 1.0))

        g_kw = config.get("g_optimizer", {}).get("kwargs", {})
        d_kw = config.get("d_optimizer", {}).get("kwargs", {})
        g_betas = g_kw.get("betas", (0.0, 0.99))
        d_betas = d_kw.get("betas", (0.0, 0.99))
        # beta2 warmup derives from the GENERATOR betas and is applied to
        # both optimizers — reference behavior (gan.py:125-126,185-188
        # updates beta_2 "for both optimizers" from g_optimizer's value)
        self.final_beta2 = float(g_betas[1])
        self.initial_beta2 = 1.0 - 10.0 * (1.0 - self.final_beta2)

        def make_opt(b1, clip):
            # lr and b2 are injected hyperparams: warmup updates are data,
            # not recompiles
            return optax.inject_hyperparams(
                lambda learning_rate, b2: optax.chain(
                    optax.clip_by_global_norm(clip),
                    optax.adam(learning_rate, b1=b1, b2=b2),
                ))(learning_rate=1e-4, b2=self.final_beta2)

        self.opt_g = make_opt(float(g_betas[0]), 10.0)
        self.opt_d = make_opt(float(d_betas[0]), 100.0)
        self.model = self.generator  # for checkpoint protocol

        gen, disc = self.generator, self.discriminator
        mode, crop_size = self.mode, self.crop_size
        kl_weight, range_weight = self.kl_weight, self.range_weight

        def gen_forward(g_params, real, key, pct_fixed):
            """Generate fakes; returns (fake, gen_x). real is NHWC."""
            B, H, W, C = real.shape
            kz, kt, km, kzi = jax.random.split(key, 4)
            z = jax.random.normal(kz, (B, H, W, self.latent_channels))
            if mode == "inject":
                # t ~ atan(2 exp(8u-3)); pct_fixed of the batch at atan(160)
                u = jax.random.uniform(kt, (B,))
                t = jnp.arctan(2.0 * jnp.exp(8.0 * u - 3.0))
                fixed = jax.random.uniform(km, (B,)) < pct_fixed
                t = jnp.where(fixed, jnp.arctan(160.0), t)
                z_img = jax.random.normal(kzi, real.shape)
                mixed = (jnp.cos(t)[:, None, None, None] * real
                         + jnp.sin(t)[:, None, None, None] * z_img)
                x_in = jnp.concatenate([mixed, z], axis=-1)
                fake = gen.apply(g_params, x_in, t, [])
            else:
                fake = gen.apply(g_params, z, jnp.zeros((B,)), [])
            return fake, fake

        def crop(key, img):
            if crop_size is None:
                return img
            return random_crop(key, img, int(crop_size))

        def disc_pred(d_params, images):
            out = disc.apply(d_params, images, jnp.zeros((images.shape[0],)), [])
            return out.mean(axis=(1, 2, 3))

        def d_loss_fn(d_params, g_params, batch, key, pct_fixed, r_gamma,
                      with_r1: bool):
            real = batch["image"]
            B = real.shape[0]
            kg, kc1, kc2 = jax.random.split(key, 3)
            fake, _ = gen_forward(g_params, real, kg, pct_fixed)
            fake = jax.lax.stop_gradient(fake)
            real_c = crop(kc1, real)
            fake_c = crop(kc2, fake)
            all_images = jnp.concatenate([real_c, fake_c], axis=0)

            if with_r1:
                # one vjp yields both predictions and the input gradient,
                # instead of a second full discriminator forward
                pred, vjp_fn = jax.vjp(
                    lambda imgs: disc_pred(d_params, imgs), all_images)
            else:
                pred = disc_pred(d_params, all_images)
            real_pred, fake_pred = pred[:B], pred[B:]
            d_loss = jax.nn.softplus(fake_pred - real_pred).mean()
            if with_r1:
                (grad_in,) = vjp_fn(jnp.ones_like(pred))
                r_reg = 0.5 * jnp.square(grad_in).reshape(2 * B, -1).sum(1).mean()
                total = d_loss + r_gamma * r_reg
            else:
                r_reg = jnp.float32(0.0)
                total = d_loss
            return total, (d_loss, r_reg, real_pred)

        def g_loss_fn(g_params, d_params, batch, key, pct_fixed, real_pred):
            real = batch["image"]
            kg, _kc = jax.random.split(key)
            fake, gen_x = gen_forward(g_params, real, kg, pct_fixed)
            # the generator phase scores the UNCROPPED fakes (reference
            # gan.py:278) — only the discriminator phase crops (:235-236)
            fake_pred = disc_pred(d_params, fake)
            g_loss = jax.nn.softplus(
                jax.lax.stop_gradient(real_pred) - fake_pred).mean()
            mean = gen_x.mean(axis=(0, 1, 2))
            # eps inside the sqrt: at init the generator's zero out-gain
            # makes gen_x exactly constant, and d(std)/dx at std=0 is NaN
            # (the reference formula `std()+eps`, gan.py:290, has the same
            # singularity — just never hit with its non-zero-init generator)
            std = jnp.sqrt(gen_x.var(axis=(0, 1, 2)) + 1e-8)
            kl = (jnp.log(1.0 / std)
                  + (std ** 2 + mean ** 2) / 2.0 - 0.5).mean()
            below = jax.nn.relu(-2.0 - fake)
            above = jax.nn.relu(fake - 3.2)
            range_loss = (below ** 2 + above ** 2).mean()
            total = g_loss + kl_weight * kl + range_weight * range_loss
            return total, (g_loss, kl, range_loss)

        def make_step(with_r1: bool):
            def step(g_params, d_params, og, od, batch, key, lr, b2,
                     pct_fixed, r_gamma):
                og = og._replace(hyperparams={**og.hyperparams,
                                              "learning_rate": lr, "b2": b2})
                od = od._replace(hyperparams={
                    **od.hyperparams,
                    "learning_rate": lr * self.disc_lr_mult, "b2": b2})
                k1, k2 = jax.random.split(key)
                (_, (dl, r_reg, real_pred)), d_grads = jax.value_and_grad(
                    d_loss_fn, has_aux=True)(
                        d_params, g_params, batch, k1, pct_fixed, r_gamma,
                        with_r1)
                d_norm = optax.global_norm(d_grads)
                d_updates, od = self.opt_d.update(d_grads, od, d_params)
                d_params = optax.apply_updates(d_params, d_updates)
                (_, (gl, kl, range_loss)), g_grads = jax.value_and_grad(
                    g_loss_fn, has_aux=True)(
                        g_params, d_params, batch, k2, pct_fixed, real_pred)
                g_norm = optax.global_norm(g_grads)
                g_updates, og = self.opt_g.update(g_grads, og, g_params)
                g_params = optax.apply_updates(g_params, g_updates)
                return g_params, d_params, og, od, {
                    "d_loss": dl, "g_loss": gl, "kl_loss": kl,
                    "range_loss": range_loss, "r_loss": r_reg,
                    "d_grad_norm": d_norm, "g_grad_norm": g_norm}
            return jax.jit(step)

        self._step_plain = make_step(with_r1=False)
        self._step_r1 = make_step(with_r1=True) if self.r_gamma > 0 else None

    def init_state(self, key, save_dir=None) -> dict:
        k1, k2 = jax.random.split(key)
        g_params = self.generator.init(k1)
        d_params = self.discriminator.init(k2)
        return {"params": g_params, "d_params": d_params,
                "opt_state": self.opt_g.init(g_params),
                "d_opt_state": self.opt_d.init(d_params),
                "ema": ema_for(g_params, self.config, save_dir)}

    # -- schedules (host-side; enter the jitted step as data) -----------
    def _current(self, step: int):
        burnin = max(self.burnin_steps, 1)
        r_gamma = linear_warmup(self.r_gamma * self.r_warmup_factor,
                                self.r_gamma, step, self.burnin_steps) \
            if step < self.burnin_steps else self.r_gamma
        b2 = linear_warmup(self.initial_beta2, self.final_beta2, step,
                           self.burnin_steps) if step < self.burnin_steps \
            else self.final_beta2
        pct_fixed = linear_warmup(self.warmup_pct_fixed, self.pct_fixed,
                                  step, burnin)
        lr_warm = linear_warmup(self.lr_warmup_factor, 1.0, step, burnin)
        return r_gamma, b2, pct_fixed, lr_warm

    def train_step(self, state: dict, batch: dict, key, counters: dict) -> dict:
        step_i = counters["step"]
        r_gamma, b2, pct_fixed, lr_warm = self._current(step_i)
        lr = self.lr_sched.get(counters["seen"]) * lr_warm
        use_r1 = (self._step_r1 is not None
                  and step_i % self.r_interval == 0)
        fn = self._step_r1 if use_r1 else self._step_plain
        g, d, og, od, metrics = fn(
            state["params"], state["d_params"], state["opt_state"],
            state["d_opt_state"], {"image": batch["image"]}, key,
            jnp.float32(lr), jnp.float32(b2), jnp.float32(pct_fixed),
            jnp.float32(r_gamma))
        state.update(params=g, d_params=d, opt_state=og, d_opt_state=od)
        counters["seen"] += int(np.shape(batch["image"])[0])
        counters["step"] += 1
        if state.get("ema") is not None:
            state["ema"].update(g, counters["step"])
        out = {k: float(v) for k, v in metrics.items()}
        out["lr"] = lr
        return out

    # -- FID evaluation (reference calculate_fid, gan.py:42-99) ---------
    def calculate_fid(self, params, val_batches, key,
                      feature_fn="terrain") -> float:
        """FID between generated and validation elevations; both sides
        denormalized/clamped/scaled exactly as the reference (`:46-58`)."""
        from terrain_diffusion_tpu.evaluation.metrics import (
            compute_fid, resolve_feature_fn)

        reals, fakes = [], []
        gen = self.generator
        mode = self.mode
        lat_ch = self.latent_channels

        @jax.jit
        def sample(params, real, key):
            B, H, W, _ = real.shape
            kz, kzi = jax.random.split(key)
            z = jax.random.normal(kz, (B, H, W, lat_ch))
            if mode == "inject":
                t = jnp.full((B,), jnp.arctan(160.0))
                z_img = jax.random.normal(kzi, real.shape)
                mixed = (jnp.cos(t)[:, None, None, None] * real
                         + jnp.sin(t)[:, None, None, None] * z_img)
                return gen.apply(params, jnp.concatenate([mixed, z], -1), t, [])
            return gen.apply(params, z, jnp.zeros((B,)), [])

        for batch in val_batches:
            key, sub = jax.random.split(key)
            real = jnp.asarray(batch["image"])
            fake = sample(params, real, sub)
            reals.append(process_for_fid(np.asarray(real)[..., 0]))
            fakes.append(process_for_fid(np.asarray(fake)[..., 0]))
        return compute_fid(np.concatenate(reals), np.concatenate(fakes),
                           feature_fn=resolve_feature_fn(feature_fn))

    def evaluate(self, state: dict, batches, key) -> dict:
        params = state["params"]
        if state.get("ema") is not None and state["ema"].emas:
            params = state["ema"].shortest()
        ev = self.config.get("evaluation", {})
        fid = self.calculate_fid(params, batches, key,
                                 feature_fn=ev.get("feature_fn", "terrain"))
        return {"val/fid": fid}

    # -- checkpointing: the adversary must survive a resume --------------
    # (the reference persists the discriminator + its optimizer through
    # accelerate's save_state; the base protocol only covers the generator)
    def save_checkpoint(self, state: dict, path: str, counters: dict):
        super().save_checkpoint(state, path, counters)
        with open(os.path.join(path, "gan_state.pkl"), "wb") as f:
            pickle.dump({
                "d_params": jax.tree.map(np.asarray, state["d_params"]),
                "d_opt_state": jax.tree.map(np.asarray,
                                            state["d_opt_state"]),
            }, f)

    def load_checkpoint(self, state: dict, path: str) -> dict:
        counters = super().load_checkpoint(state, path)
        gan_path = os.path.join(path, "gan_state.pkl")
        if not os.path.exists(gan_path):
            raise FileNotFoundError(
                f"{gan_path} missing: a GAN checkpoint without the "
                "discriminator would resume a trained generator against a "
                "fresh adversary")
        with open(gan_path, "rb") as f:
            blob = pickle.load(f)
        state["d_params"] = blob["d_params"]
        state["d_opt_state"] = jax.tree.map(
            lambda ref, v: v, state["d_opt_state"], blob["d_opt_state"])
        return counters
