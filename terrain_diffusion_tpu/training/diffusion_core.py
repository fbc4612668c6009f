"""TrigFlow/EDM training losses and train-step factories (pure JAX).

Faithful rebuild of the reference's training math:
- diffusion: sigma ~ LogNormal(P_mean, P_std), optional per-sample sigma
  scaling, t = atan(sigma/sigma_data), x_t = cos t * x + sin t * noise,
  v-target, logvar-weighted loss (`trainers/diffusion.py:108-150`);
- consistency (sCM/TrigFlow distillation): teacher velocity (+ optional
  AutoGuidance mix), JVP through the student, tangent-normalized target with
  warmup ratio r, adaptive logvar weighting (`trainers/consistency.py:100-215`);
- autoencoder: MAE + KL (+ optional perceptual hook) (`trainers/autoencoder.py`).

All are pure functions (params, batch, key) -> (loss, aux) composing with
jit/grad/shard_map; the train-step factory adds Adam + global-norm clipping +
forced weight re-normalization after each update (EDM2 semantics).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from terrain_diffusion_tpu.nn.layers import norm_weights_tree


@dataclasses.dataclass(frozen=True)
class DiffusionLossConfig:
    sigma_data: float = 0.5
    P_mean: float = 0.0
    P_std: float = 1.5
    scale_sigma: bool = False
    scaling_channels: tuple = ()
    sigma_scale_eps: float = 0.05


def diffusion_loss(model, params, batch: dict, key, cfg: DiffusionLossConfig,
                   training: bool = True):
    """TrigFlow-style EDM loss.  batch: images (N,H,W,C) NHWC,
    optional cond_img (N,H,W,Cc), optional cond_inputs list."""
    images = batch["image"]
    cond_img = batch.get("cond_img")
    cond_inputs = batch.get("cond_inputs")
    sd = cfg.sigma_data
    n = images.shape[0]

    k_sigma, k_noise, k_drop = jax.random.split(key, 3)
    sigma = jnp.exp(jax.random.normal(k_sigma, (n, 1, 1, 1)) * cfg.P_std + cfg.P_mean)
    if cfg.scale_sigma:
        chans = jnp.stack([images[..., c] for c in cfg.scaling_channels], axis=-1)
        per_std = jnp.std(chans, axis=(1, 2, 3)).reshape(-1, 1, 1, 1)
        sigma = sigma * jnp.maximum(per_std / sd, cfg.sigma_scale_eps)

    t = jnp.arctan(sigma / sd)
    cnoise = t.reshape(-1)
    noise = jax.random.normal(k_noise, images.shape, dtype=images.dtype) * sd
    x_t = jnp.cos(t) * images + jnp.sin(t) * noise
    x = x_t / sd
    if cond_img is not None:
        x = jnp.concatenate([x, cond_img], axis=-1)

    model_output, logvar = model.apply(
        params, x, cnoise, cond_inputs, return_logvar=True,
        training=training, dropout_key=k_drop)
    pred_v_t = -sd * model_output
    v_t = jnp.cos(t) * noise - jnp.sin(t) * images
    loss = (1.0 / (jnp.exp(logvar) * sd**2)) * (pred_v_t - v_t) ** 2 + logvar
    return loss.mean(), {"sigma_mean": sigma.mean(), "logvar_mean": logvar.mean()}


@dataclasses.dataclass(frozen=True)
class ConsistencyLossConfig:
    sigma_data: float = 0.5
    P_mean: float = -1.0
    P_std: float = 1.4
    guidance_scale: float = 1.0
    warmup_steps: int = 10_000
    loss_groups: Optional[tuple] = None  # channel group sizes, or None
    use_logvar: bool = True
    const_c: float = 0.1


def consistency_loss(model, params, teacher_apply: Callable, batch: dict, key,
                     cfg: ConsistencyLossConfig, step,
                     guide_apply: Optional[Callable] = None,
                     training: bool = True):
    """sCM/TrigFlow continuous-time consistency distillation loss.

    Faithful to reference `consistency.py:102-215`: teacher velocity
    dx_t/dt = sigma_data * -pred (with optional AutoGuidance mix
    g + s*(m - g)), JVP of the negated student through (x_t/sd, t), tangent
    g = -cos^2 t (sd F- - dx/dt) - r cos t sin t x_t - r sd F_grad, per-group
    tangent normalization with +const_c, target F- + g, adaptive logvar.
    ``jax.jvp`` replaces torch.func.jvp.
    """
    images = batch["image"]
    cond_img = batch.get("cond_img")
    cond_inputs = batch.get("cond_inputs")
    sd = cfg.sigma_data
    n = images.shape[0]

    k_sigma, k_noise, k_drop = jax.random.split(key, 3)
    sigma = jnp.exp(jax.random.normal(k_sigma, (n, 1, 1, 1)) * cfg.P_std + cfg.P_mean)
    t = jnp.arctan(sigma / sd)
    z = jax.random.normal(k_noise, images.shape, dtype=images.dtype) * sd
    x_t = jnp.cos(t) * images + jnp.sin(t) * z

    def cat_cond(zz):
        return jnp.concatenate([zz, cond_img], axis=-1) if cond_img is not None else zz

    cnoise = t.reshape(-1)
    m_pred = teacher_apply(cat_cond(x_t / sd), cnoise, cond_inputs)
    if guide_apply is not None:
        g_pred = guide_apply(cat_cond(x_t / sd), cnoise, cond_inputs)
        pretrain_pred = g_pred + cfg.guidance_scale * (m_pred - g_pred)
    else:
        pretrain_pred = m_pred
    dxt_dt = jax.lax.stop_gradient(sd * -pretrain_pred)

    def model_wrapper(x_over_sd, t_in):
        pred, logvar = model.apply(params, cat_cond(x_over_sd), t_in.reshape(-1),
                                   cond_inputs, return_logvar=True,
                                   training=training, dropout_key=k_drop)
        return -pred, logvar

    v_x = jnp.cos(t) * jnp.sin(t) * dxt_dt / sd
    v_t = jnp.cos(t) * jnp.sin(t)
    (F_theta, logvar), (F_theta_grad, _) = jax.jvp(
        model_wrapper, (x_t / sd, t), (v_x, v_t))
    F_theta_grad = jax.lax.stop_gradient(F_theta_grad)
    F_theta_minus = jax.lax.stop_gradient(F_theta)
    logvar = logvar.reshape(-1, 1, 1, 1)

    r = jnp.minimum(1.0, (jnp.asarray(step, jnp.float32) + 1) / max(cfg.warmup_steps, 1))
    g = -jnp.cos(t) * jnp.cos(t) * (sd * F_theta_minus - dxt_dt)
    g = g + (-r * jnp.cos(t) * jnp.sin(t) * x_t - r * sd * F_theta_grad)

    if cfg.loss_groups is None:
        g_norm = jnp.sqrt(jnp.mean(g**2, axis=(1, 2, 3), keepdims=True))
    else:
        # the MEAN of per-group norms, applied uniformly to all channels —
        # NOT per-group normalization; this matches the reference exactly
        # (consistency.py:166-175 stacks group norms and means over them)
        norms, c = [], 0
        for gc in cfg.loss_groups:
            norms.append(jnp.sqrt(jnp.mean(g[..., c:c + gc] ** 2,
                                           axis=(1, 2, 3), keepdims=True)))
            c += gc
        g_norm = jnp.stack(norms, axis=1).mean(axis=1)
    g = g / (g_norm + cfg.const_c)

    err2 = jnp.square(F_theta - F_theta_minus - g)
    if cfg.use_logvar:
        loss = (1.0 / jnp.exp(logvar)) * err2 + logvar
    else:
        loss = err2
    if cfg.loss_groups is None:
        loss = loss.mean()
    else:
        parts, c = [], 0
        for gc in cfg.loss_groups:
            parts.append(loss[..., c:c + gc].mean())
            c += gc
        loss = jnp.stack(parts).mean()
    return loss, {"sigma_mean": sigma.mean(), "r": r,
                  "max_g_norm": g_norm.max(),
                  "max_f_grad_norm": jnp.sqrt(jnp.mean(F_theta_grad**2,
                                                       axis=(1, 2, 3))).max()}


def autoencoder_loss(ae, params, batch: dict, key, kl_weight: float = 1e-5,
                     perceptual_fn: Optional[Callable] = None,
                     perceptual_weight: float = 1.0):
    """VAE loss: MAE + KL (+ optional perceptual term)
    (reference `trainers/autoencoder.py:90-152`).  Deliberately identical
    for train and validation — the reference's val loop also draws a
    stochastic posterior sample (`autoencoder.py:209`)."""
    images = batch["image"]
    means, logvars = ae.preencode(params, images)
    z = ae.postencode(means, logvars, key=key)
    recon = ae.decode(params, z)
    mae = jnp.abs(recon - images).mean()
    kl = 0.5 * (means**2 + jnp.exp(logvars) - 1.0 - logvars).mean()
    loss = mae + kl_weight * kl
    aux = {"mae": mae, "kl": kl}
    if perceptual_fn is not None:
        p = perceptual_fn(recon, images)
        loss = loss + perceptual_weight * p
        aux["perceptual"] = p
    return loss, aux


# ---------------------------------------------------------------------------
# Train step factory
# ---------------------------------------------------------------------------

def make_optimizer(betas=(0.9, 0.99), eps: float = 1e-8,
                   grad_clip: float = 10.0) -> optax.GradientTransformation:
    """Adam with global-norm clipping and injected LR (set per step from the
    host-side LR schedule, reference `diffusion.py:149-151`)."""
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
            optax.scale(-1.0),
            optax.scale(learning_rate),
        )
    )(learning_rate=1e-4)


def make_train_step(loss_fn: Callable, optimizer: optax.GradientTransformation,
                    renorm_weights: bool = True):
    """Returns jittable ``step(params, opt_state, batch, key, lr) ->
    (params, opt_state, metrics)``.

    Data parallelism: jit this under a Mesh with the batch sharded over the
    'data' axis and params replicated — XLA inserts the gradient psum over
    ICI automatically.
    """

    def step(params, opt_state, batch, key, lr):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if renorm_weights:
            params = norm_weights_tree(params)
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": gnorm, **aux}
        return params, opt_state, metrics

    return step
