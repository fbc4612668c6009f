"""Bounded-canvas tiled sampling primitives for evaluation/sweeps — the
fixed-canvas counterpart of the InfiniteDiffusion runtime (reference
`training/evaluation/sample_diffusion_base.py`, `sample_diffusion_decoder.py`,
`sample_autoencoder.py`, `sample_coarse.py`).

JAX/NHWC; every model forward is jitted and tiles run through the same
overlap-blend algebra as the pipeline (linear weight windows, sum + divide).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from terrain_diffusion_tpu.evaluation import tile_starts
from terrain_diffusion_tpu.ops import mp
from terrain_diffusion_tpu.ops.image import upsample_nearest
from terrain_diffusion_tpu.ops.windows import linear_weight_window

LOWFREQ_MEAN, LOWFREQ_STD = -31.4, 38.6


def compose_terrain(residual_unit, lowfreq, *, lowfreq_normalized=False,
                    residual_mean: float = 0.0, residual_std: float = 1.1678,
                    denoise: bool = True, extrapolate: bool = True):
    """Normalized decoder residual (+ lowfreq) -> terrain in meters.

    The reference's `_decode_latents_to_terrain` chain
    (evaluation/infinite_consistency.py:36-72): de-normalize the residual
    with the residual stats, de-normalize the lowfreq when it is in
    normalized units, `laplacian_denoise(sigma=5)`, extrapolated
    `laplacian_decode`, signed square.  Every eval that compares decoded
    terrain against real DEM data must go through this ONE chain — scale
    mismatches between the real and fake sides silently dominate FID/KID.
    """
    from terrain_diffusion_tpu.ops.laplacian import (laplacian_decode,
                                                     laplacian_denoise)

    hf = jnp.asarray(residual_unit, jnp.float32) * residual_std + residual_mean
    lf = jnp.asarray(lowfreq, jnp.float32)
    if lowfreq_normalized:
        lf = lf * LOWFREQ_STD + LOWFREQ_MEAN
    if denoise:
        hf, lf = laplacian_denoise(hf, lf, 5.0)
    elev = np.asarray(laplacian_decode(hf, lf, extrapolate=extrapolate))
    return np.sign(elev) * elev ** 2
from terrain_diffusion_tpu.scheduler import (
    EDMSchedulerConfig,
    compute_sigmas,
    sample_dpm,
    scale_score_in_velocity,
    trigflow_precondition_noise,
)


def process_cond_img(cond_img, histogram_raw, cond_means, cond_stds,
                     noise_level: float = 0.0):
    """(B, 7, 4, 4) conditioning window -> (B, 58) vector (reference
    `_process_cond_img`; same math as the pipeline's in-program builder)."""
    cond_img = jnp.asarray(cond_img, jnp.float32)
    cm = np.asarray(cond_means, np.float32)
    m = jnp.asarray(cm).reshape(1, -1, 1, 1)
    s = jnp.asarray(cond_stds, jnp.float32).reshape(1, -1, 1, 1)
    cond = (cond_img - m) / s
    # NaN fill matches the production pipeline semantics (see
    # pipeline/world.py build_cond): every channel's NaNs become
    # cond_means[0] in normalized space.
    cond = jnp.nan_to_num(cond, nan=float(cm[0]))
    means_crop = cond[:, 0].reshape(cond.shape[0], -1)
    p5_crop = cond[:, 1].reshape(cond.shape[0], -1)
    climate = cond[:, 2:6, 1:3, 1:3].mean(axis=(2, 3))
    mask_crop = cond[:, 6].reshape(cond.shape[0], -1)
    nl = jnp.full((cond.shape[0], 1), (noise_level - 0.5) * np.sqrt(12), jnp.float32)
    hist = jnp.broadcast_to(jnp.asarray(histogram_raw, jnp.float32).reshape(1, -1),
                            (cond.shape[0], 5))
    return mp.mp_concat([means_crop, p5_crop, climate, mask_crop, hist, nl], axis=1)


def _model_with_guidance(model, params, guide_model=None, guide_params=None,
                         guidance_scale: float = 1.0):
    def fwd(x, cnoise, cond_inputs):
        out = model.apply(params, x, cnoise, cond_inputs)
        if guide_model is not None and guidance_scale != 1.0:
            g = guide_model.apply(guide_params, x, cnoise, cond_inputs)
            out = g + guidance_scale * (out - g)
        return out
    return fwd


@functools.lru_cache(maxsize=64)
def _jitted_dpm_tile(model, guide_model, guidance_scale: float, steps: int,
                     cfg: EDMSchedulerConfig):
    """Cached jitted DPM tile sampler; params are arguments (never baked)."""

    @jax.jit
    def run(params, guide_params, noise, cond_list):
        fwd = _model_with_guidance(model, params, guide_model, guide_params,
                                   guidance_scale)

        def model_fn(scaled, sigma):
            cnoise = trigflow_precondition_noise(sigma, cfg.sigma_data)
            nl = jnp.full((noise.shape[0],), cnoise, scaled.dtype)
            return fwd(scaled, nl, cond_list)

        return sample_dpm(model_fn, noise, cfg, steps)

    return run


@functools.lru_cache(maxsize=64)
def _jitted_decoder_step(model, cfg: EDMSchedulerConfig):
    @jax.jit
    def run(params, z, cond_up, t):
        sd = cfg.sigma_data
        x_t = jnp.sin(t) * z * sd
        model_in = jnp.concatenate([x_t / sd, cond_up], axis=-1)
        nl = jnp.full((z.shape[0],), t, jnp.float32)
        pred = -model.apply(params, model_in, nl, [])
        return jnp.cos(t) * x_t - jnp.sin(t) * sd * pred

    return run


@functools.lru_cache(maxsize=64)
def _jitted_dpm_cond_tile(model, guide_model, guidance_scale: float,
                          steps: int, cfg: EDMSchedulerConfig,
                          score_scaling: float):
    """Cached jitted DPM sampler for tiles with a channel-concat cond image
    (decoder / coarse paths) — ONE compile reused across every tile of
    every call, instead of re-tracing sample_dpm per tile."""

    @jax.jit
    def run(params, guide_params, noise, cond_img, cond_scalars):
        fwd = _model_with_guidance(model, params, guide_model, guide_params,
                                   guidance_scale)

        def model_fn(scaled, sigma):
            cnoise = trigflow_precondition_noise(sigma, cfg.sigma_data)
            nl = jnp.full((noise.shape[0],), cnoise, scaled.dtype)
            x_in = jnp.concatenate([scaled, cond_img], axis=-1)
            v = fwd(x_in, nl, list(cond_scalars))
            if score_scaling != 1.0:
                # the score direction needs the RAW sigma-space sample
                # (the reference passes `samples`, not the preconditioned
                # input — sample_diffusion_decoder.py:102,119)
                raw = scaled * jnp.sqrt(sigma ** 2 + cfg.sigma_data ** 2)
                v = scale_score_in_velocity(
                    v, raw, sigma, v, alpha=score_scaling,
                    sigma_data=cfg.sigma_data)
            return v

        return sample_dpm(model_fn, noise, cfg, steps)

    return run


@functools.lru_cache(maxsize=64)
def _jitted_consistency_step(model, cfg: EDMSchedulerConfig):
    @jax.jit
    def run(params, sample, z, t, cond_list):
        sd = cfg.sigma_data
        x_t = jnp.cos(t) * sample + jnp.sin(t) * z * sd
        nl = jnp.full((x_t.shape[0],), t, x_t.dtype)
        pred = -model.apply(params, x_t / sd, nl, cond_list)
        return jnp.cos(t) * x_t - jnp.sin(t) * sd * pred

    return run


def sample_base_diffusion(model, params, shape, cond_inputs, *, key,
                          steps: int = 15, cfg: EDMSchedulerConfig | None = None,
                          guide_model=None, guide_params=None,
                          guidance_scale: float = 1.0,
                          tile_size: Optional[int] = None,
                          cond_means=None, cond_stds=None, histogram_raw=None,
                          noise_level: float = 0.0,
                          weight_window_fn: Callable = linear_weight_window):
    """Sample (B, H, W, C) latents with DPM-Solver++, optionally tiled.

    `cond_inputs`: list of per-sample conditioning arrays for untiled
    sampling, or a (B, 7, Hc, Wc) conditioning image for tiled sampling
    (per-tile 4x4 windows are processed into 58-dim vectors).
    """
    cfg = cfg or EDMSchedulerConfig()
    sigmas0 = float(compute_sigmas(cfg, steps)[0])
    B, H, W, C = shape
    dpm = _jitted_dpm_tile(model, guide_model, guidance_scale, steps, cfg)

    def run_tile(noise, tile_cond):
        return dpm(params, guide_params if guide_model is not None else {},
                   noise, list(tile_cond))

    if tile_size is None:
        noise = jax.random.normal(key, shape) * sigmas0
        return run_tile(noise, cond_inputs) / cfg.sigma_data

    stride = tile_size // 2
    h_starts = tile_starts(H, tile_size, stride)
    w_starts = tile_starts(W, tile_size, stride)
    cond_img = cond_inputs
    assert cond_img.ndim == 4, "tiled sampling needs a (B,7,Hc,Wc) cond image"
    weights = jnp.asarray(weight_window_fn(tile_size))[None, :, :, None]
    initial_noise = jax.random.normal(key, shape) * sigmas0
    output = jnp.zeros(shape)
    output_w = jnp.zeros(shape)
    for ic, i0 in enumerate(h_starts):
        for jc, j0 in enumerate(w_starts):
            tc = process_cond_img(cond_img[:, :, ic:ic + 4, jc:jc + 4],
                                  histogram_raw, cond_means, cond_stds,
                                  noise_level)
            tile = run_tile(
                initial_noise[:, i0:i0 + tile_size, j0:j0 + tile_size, :], [tc])
            output = output.at[:, i0:i0 + tile_size, j0:j0 + tile_size, :].add(
                tile * weights)
            output_w = output_w.at[:, i0:i0 + tile_size, j0:j0 + tile_size, :].add(
                jnp.broadcast_to(weights, tile.shape))
    return output / output_w / cfg.sigma_data


def sample_base_consistency(model, params, shape, cond_inputs, *, key,
                            inter_t: float | None = None,
                            cfg: EDMSchedulerConfig | None = None,
                            tile_size: Optional[int] = None,
                            cond_means=None, cond_stds=None, histogram_raw=None,
                            weight_window_fn: Callable = linear_weight_window,
                            skip_blend_last: bool = False):
    """1-2 step TrigFlow consistency sampling with optional inter-step
    blending (the bounded-canvas InfiniteDiffusion analogue; reference
    `sample_base_consistency` / `evaluation/infinite_consistency.py`)."""
    cfg = cfg or EDMSchedulerConfig()
    sd = cfg.sigma_data
    sigmas0 = float(compute_sigmas(cfg, 20)[0])
    t_steps = [float(np.arctan(sigmas0 / sd))]
    if inter_t is not None:
        t_steps.append(float(inter_t))
    B, H, W, C = shape
    cstep = _jitted_consistency_step(model, cfg)

    def consistency_step(sample, z, t, tile_cond):
        return cstep(params, sample, z, jnp.float32(t), list(tile_cond))

    if tile_size is None:
        sample = jnp.zeros(shape)
        for si, t in enumerate(t_steps):
            key, sub = jax.random.split(key)
            z = jax.random.normal(sub, shape)
            sample = consistency_step(sample, z, t, cond_inputs)
        return sample / sd

    stride = tile_size // 2
    h_starts = tile_starts(H, tile_size, stride)
    w_starts = tile_starts(W, tile_size, stride)
    cond_img = cond_inputs
    weights = jnp.asarray(weight_window_fn(tile_size))[None, :, :, None]
    sample = jnp.zeros(shape)
    for si, t in enumerate(t_steps):
        key, sub = jax.random.split(key)
        z_full = jax.random.normal(sub, shape)
        out = jnp.zeros(shape)
        out_w = jnp.zeros(shape)
        last = si == len(t_steps) - 1
        for ic, i0 in enumerate(h_starts):
            for jc, j0 in enumerate(w_starts):
                tc = [process_cond_img(cond_img[:, :, ic:ic + 4, jc:jc + 4],
                                       histogram_raw, cond_means, cond_stds)]
                sl = (slice(None), slice(i0, i0 + tile_size),
                      slice(j0, j0 + tile_size), slice(None))
                tile = consistency_step(sample[sl], z_full[sl], t, tc)
                w = (jnp.ones_like(weights) if (last and skip_blend_last)
                     else weights)
                out = out.at[sl].add(tile * w)
                out_w = out_w.at[sl].add(jnp.broadcast_to(w, tile.shape))
        sample = out / out_w
    return sample / sd


def sample_decoder_consistency_tiled(model, params, latents, *, key,
                                     tile_size: int = 512, stride: int = 384,
                                     latent_compression: int = 8,
                                     cfg: EDMSchedulerConfig | None = None,
                                     weight_window_fn: Callable = linear_weight_window):
    """1-step consistency decode of (B, h, w, 4) latents to (B, H, W, 1)
    residual via overlapping pixel tiles (reference
    `sample_decoder_consistency_tiled`)."""
    cfg = cfg or EDMSchedulerConfig()
    sd = cfg.sigma_data
    sigmas0 = float(compute_sigmas(cfg, 20)[0])
    t = float(np.arctan(sigmas0 / sd))
    lc = latent_compression
    B, h, w, C = latents.shape
    H, W = h * lc, w * lc
    up = jnp.moveaxis(upsample_nearest(jnp.moveaxis(jnp.asarray(latents), -1, 1), lc), 1, -1)
    weights = jnp.asarray(weight_window_fn(tile_size))[None, :, :, None]
    key, sub = jax.random.split(key)
    z_full = jax.random.normal(sub, (B, H, W, 1))
    out = jnp.zeros((B, H, W, 1))
    out_w = jnp.zeros((B, H, W, 1))
    dec = _jitted_decoder_step(model, cfg)
    for i0 in tile_starts(H, tile_size, stride):
        for j0 in tile_starts(W, tile_size, stride):
            sl = (slice(None), slice(i0, i0 + tile_size),
                  slice(j0, j0 + tile_size), slice(None))
            tile = dec(params, z_full[sl], up[sl], jnp.float32(t))
            out = out.at[sl].add(tile * weights)
            out_w = out_w.at[sl].add(jnp.broadcast_to(weights, tile.shape))
    return out / out_w / sd


def sample_decoder_diffusion_tiled(model, params, latents, *, key,
                                   steps: int = 15, tile_size: int = 512,
                                   stride: int = 384, latent_compression: int = 8,
                                   cfg: EDMSchedulerConfig | None = None,
                                   guide_model=None, guide_params=None,
                                   guidance_scale: float = 1.0,
                                   score_scaling: float = 1.0,
                                   weight_window_fn: Callable = linear_weight_window):
    """Multi-step diffusion decode with optional AutoGuidance + score scaling
    (reference `sample_decoder_diffusion_tiled` + `_scale_score`)."""
    cfg = cfg or EDMSchedulerConfig()
    sigmas0 = float(compute_sigmas(cfg, steps)[0])
    lc = latent_compression
    B, h, w, C = latents.shape
    H, W = h * lc, w * lc
    up = jnp.moveaxis(upsample_nearest(jnp.moveaxis(latents, -1, 1), lc), 1, -1)
    weights = jnp.asarray(weight_window_fn(tile_size))[None, :, :, None]
    key, sub = jax.random.split(key)
    noise_full = jax.random.normal(sub, (B, H, W, 1)) * sigmas0
    out = jnp.zeros((B, H, W, 1))
    out_w = jnp.zeros((B, H, W, 1))
    dpm = _jitted_dpm_cond_tile(model, guide_model, guidance_scale, steps,
                                cfg, float(score_scaling))
    gp = guide_params if guide_model is not None else {}
    for i0 in tile_starts(H, tile_size, stride):
        for j0 in tile_starts(W, tile_size, stride):
            sl = (slice(None), slice(i0, i0 + tile_size),
                  slice(j0, j0 + tile_size), slice(None))
            tile = dpm(params, gp, noise_full[sl], up[sl], [])
            out = out.at[sl].add(tile * weights)
            out_w = out_w.at[sl].add(jnp.broadcast_to(weights, tile.shape))
    return out / out_w / cfg.sigma_data


def sample_autoencoder_tiled(ae, params, x, *, key=None, tile_size: int = 512,
                             stride: int = 384,
                             weight_window_fn: Callable = linear_weight_window):
    """Tiled VAE encode+decode roundtrip (reference `sample_autoencoder.py`)."""
    B, H, W, C = x.shape
    weights = jnp.asarray(weight_window_fn(tile_size))[None, :, :, None]
    out = jnp.zeros_like(x)
    out_w = jnp.zeros_like(x)
    for i0 in tile_starts(H, tile_size, stride):
        for j0 in tile_starts(W, tile_size, stride):
            sl = (slice(None), slice(i0, i0 + tile_size),
                  slice(j0, j0 + tile_size), slice(None))
            if key is not None:
                key, sub = jax.random.split(key)  # fresh noise per tile —
            else:                                 # reusing one key draws the
                sub = None                        # same field in every tile
            means, logvars = ae.preencode(params, x[sl])
            z = ae.postencode(means, logvars, key=sub)
            rec = ae.decode(params, z)
            out = out.at[sl].add(rec * weights)
            out_w = out_w.at[sl].add(jnp.broadcast_to(weights, rec.shape))
    return out / out_w


def cond_inputs_from_snr(cond_snr, batch: int = 1):
    """Coarse conditioning scalars from per-channel SNR (reference
    `sample_coarse._cond_inputs_from_snr`)."""
    t = np.arctan(np.asarray(cond_snr, np.float32))
    vals = np.log(np.tan(t) / 8.0)
    return [jnp.full((batch,), v, jnp.float32) for v in vals], t


def sample_coarse_tiled(model, params, cond_map, cond_snr, *, key,
                        steps: int = 20, tile_size: int = 64,
                        cfg: EDMSchedulerConfig | None = None,
                        weight_window_fn: Callable = linear_weight_window):
    """Tiled 20-step coarse sampling over a normalized (B, H, W, 5) cond map
    (reference `sample_coarse_tiled`)."""
    cfg = cfg or EDMSchedulerConfig()
    sigmas0 = float(compute_sigmas(cfg, steps)[0])
    B, H, W, _ = cond_map.shape
    stride = tile_size - 16
    cond_scalars, t_cond = cond_inputs_from_snr(cond_snr, batch=B)
    tc = jnp.asarray(t_cond).reshape(1, 1, 1, -1)
    key, kn = jax.random.split(key)
    cond_noise = jax.random.normal(kn, cond_map.shape)
    cond_mixed = jnp.cos(tc) * cond_map + jnp.sin(tc) * cond_noise
    weights = jnp.asarray(weight_window_fn(tile_size))[None, :, :, None]
    key, ks = jax.random.split(key)
    noise_full = jax.random.normal(ks, (B, H, W, 6)) * sigmas0
    out = jnp.zeros((B, H, W, 6))
    out_w = jnp.zeros((B, H, W, 6))
    dpm = _jitted_dpm_cond_tile(model, None, 1.0, steps, cfg, 1.0)
    for i0 in tile_starts(H, tile_size, stride):
        for j0 in tile_starts(W, tile_size, stride):
            sl = (slice(None), slice(i0, i0 + tile_size),
                  slice(j0, j0 + tile_size), slice(None))
            tile = dpm(params, {}, noise_full[sl], cond_mixed[sl],
                       list(cond_scalars))
            out = out.at[sl].add(tile * weights)
            out_w = out_w.at[sl].add(jnp.broadcast_to(weights, tile.shape))
    return out / out_w / cfg.sigma_data
