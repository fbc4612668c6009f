"""EDMAutoencoder — VAE with EDMUnet2D encoder and MP-block decoder (JAX/NHWC).

Architecture-compatible rebuild of `models/edm_autoencoder.py:13-177`:
encoder is an encode-only EDMUnet2D producing 2*latent_ch (means ++ logvars),
decoder is a stack of UNetBlocks from the latent, with optional direct-skip
channels carried losslessly through the latent (avg-pooled in, nearest
re-injected out).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

from terrain_diffusion_tpu.nn import layers as L
from terrain_diffusion_tpu.nn.edm_unet import EDMUnet2D, EDMUnetConfig
from terrain_diffusion_tpu.ops.image import avg_pool, upsample_nearest


@dataclasses.dataclass(frozen=True)
class EDMAutoencoderConfig:
    image_size: int
    in_channels: int
    latent_channels: int
    out_channels: Optional[int] = None
    model_channels: int = 128
    model_channel_mults: tuple = (1, 2, 3, 4)
    layers_per_block: Any = 3
    layers_per_block_decoder: Any = None
    attn_resolutions: tuple = ()
    midblock_attention: bool = True
    logvar_channels: int = 128
    block_kwargs: Any = dataclasses.field(default_factory=dict)
    conditional_inputs: tuple = ()
    n_logvar: int = 1
    direct_skips: tuple = ()

    def resolved(self):
        mults = tuple(self.model_channel_mults or (1, 2, 3, 4))
        out_ch = self.out_channels or self.in_channels
        lpb = self.layers_per_block
        if isinstance(lpb, int):
            lpb = [lpb] * len(mults)
        lpbd = self.layers_per_block_decoder or lpb
        if isinstance(lpbd, int):
            lpbd = [lpbd] * len(mults)
        return mults, tuple(lpb), tuple(lpbd), out_ch

    @classmethod
    def from_dict(cls, d: dict) -> "EDMAutoencoderConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in fields}
        for key in ("model_channel_mults", "attn_resolutions", "direct_skips"):
            if kw.get(key) is not None:
                kw[key] = tuple(kw[key])
        if kw.get("block_kwargs") is None:
            kw["block_kwargs"] = {}
        return cls(**kw)

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["_class_name"] = "EDMAutoencoder"
        if isinstance(d.get("block_kwargs"), dict):
            # runtime backend selectors, not architecture (see EDMUnetConfig)
            d["block_kwargs"] = {k: v for k, v in d["block_kwargs"].items()
                                 if k not in ("block_impl", "attention_impl")}
        return d


def _decoder_plan(cfg: EDMAutoencoderConfig):
    mults, lpb, lpbd, out_ch = cfg.resolved()
    block_channels = [cfg.model_channels * m for m in mults]
    plan = []
    cout = cfg.model_channels * mults[-1]
    for level, (channels, nb) in reversed(list(enumerate(zip(block_channels, lpbd)))):
        res = cfg.image_size // 2**level
        if level == len(block_channels) - 1:
            plan.append(("mid0", cout, cout, dict(mode="dec", attention=cfg.midblock_attention)))
            plan.append(("mid1", cout, cout, dict(mode="dec")))
        else:
            plan.append((f"up{level}", cout, cout, dict(mode="dec", resample_mode="up")))
        for idx in range(nb + 1):
            cin, cout = cout, channels
            plan.append((f"{res}x{res}_b{idx}", cin, cout,
                         dict(mode="dec", attention=res in cfg.attn_resolutions)))
    return plan, cout, out_ch


class EDMAutoencoder:
    def __init__(self, config: EDMAutoencoderConfig):
        self.config = config
        mults, lpb, lpbd, out_ch = config.resolved()
        self.encoder = EDMUnet2D(EDMUnetConfig(
            image_size=config.image_size,
            in_channels=config.in_channels,
            out_channels=config.latent_channels * 2,
            model_channels=config.model_channels,
            model_channel_mults=mults,
            layers_per_block=list(lpb),
            emb_channels=0,
            noise_emb_dims=0,
            attn_resolutions=config.attn_resolutions,
            midblock_attention=config.midblock_attention,
            logvar_channels=config.logvar_channels,
            block_kwargs=config.block_kwargs,
            conditional_inputs=config.conditional_inputs,
            encode_only=True,
            disable_out_gain=False,
        ))
        self.decoder_plan, self._dec_final_ch, self.out_ch = _decoder_plan(config)

    # ------------------------------------------------------------------
    def init(self, key) -> dict:
        cfg = self.config
        keys = iter(jax.random.split(key, 8 + len(self.decoder_plan)))
        p = {"encoder": self.encoder.init(next(keys))}
        # reference sets encoder out_gain to ones (edm_autoencoder.py:85)
        p["encoder"]["out_gain"] = jnp.ones(())
        latent_in = cfg.latent_channels + len(cfg.direct_skips) + 1
        # must match the first decoder block's cin = channels * mults[-1]
        # (max() disagrees for non-monotonic mults)
        p["decoder_conv"] = L.mp_conv_init(
            next(keys), latent_in,
            cfg.model_channels * cfg.model_channel_mults[-1], [1, 1])
        p["decoder"] = {}
        for name, cin, cout, opts in self.decoder_plan:
            p["decoder"][name] = L.unet_block_init(
                next(keys), cin, cout, 0, **{**cfg.block_kwargs, **opts})
        p["out_conv"] = L.mp_conv_init(next(keys), self._dec_final_ch, self.out_ch, [3, 3])
        p["out_gain"] = jnp.ones(()) * 0.1
        p["logvar"] = jnp.zeros((cfg.n_logvar,))
        return p

    # ------------------------------------------------------------------
    def preencode(self, params, x, conditional_inputs=None, compute_dtype=None):
        """x (N,H,W,C) -> (means, logvars) NHWC; direct-skip channels appended
        to means as avg-pooled copies (reference `preencode`, :107-123)."""
        cfg = self.config
        enc = self.encoder.apply(params["encoder"], x,
                                 conditional_inputs=conditional_inputs,
                                 compute_dtype=compute_dtype)
        means, logvars = jnp.split(enc, 2, axis=-1)
        extra = []
        factor = x.shape[1] // means.shape[1]
        for ch in cfg.direct_skips:
            pooled = avg_pool(jnp.moveaxis(x[..., ch : ch + 1], -1, 1), factor)
            extra.append(jnp.moveaxis(pooled, 1, -1))
        if extra:
            means = jnp.concatenate([means] + extra, axis=-1)
            pad_lv = jnp.full(
                (*logvars.shape[:-1], len(extra)), -20.0, dtype=logvars.dtype)
            logvars = jnp.concatenate([logvars, pad_lv], axis=-1)
        return means, logvars

    @staticmethod
    def postencode(means, logvars, key=None, use_mode: bool = False):
        if use_mode or key is None:
            return means
        std = jnp.exp(logvars * 0.5)
        return means + jax.random.normal(key, std.shape, dtype=std.dtype) * std

    # ------------------------------------------------------------------
    def decode(self, params, z, include_logvar: bool = False, compute_dtype=None):
        """z (N, h, w, latent+skips) -> (N, H, W, out_ch)."""
        cfg = self.config
        dt = compute_dtype or z.dtype
        direct = z[..., cfg.latent_channels :]
        z = jnp.concatenate([z, jnp.ones_like(z[..., :1])], axis=-1).astype(dt)
        z = L.mp_conv_apply(params["decoder_conv"], z, compute_dtype=dt)
        for name, cin, cout, opts in self.decoder_plan:
            z = L.unet_block_apply(params["decoder"][name], z, None,
                                   **{**cfg.block_kwargs, **opts}, compute_dtype=dt)
        out = L.mp_conv_apply(params["out_conv"], z, gain=params["out_gain"],
                              compute_dtype=dt)
        if cfg.direct_skips:
            factor = out.shape[1] // direct.shape[1]
            chans = []
            used = {int(c): i for i, c in enumerate(cfg.direct_skips)}
            for c in range(out.shape[-1]):
                if c in used:
                    up = upsample_nearest(
                        jnp.moveaxis(direct[..., used[c] : used[c] + 1], -1, 1), factor)
                    chans.append(jnp.moveaxis(up, 1, -1)[..., 0])
                else:
                    chans.append(out[..., c])
            out = jnp.stack(chans, axis=-1)
        if include_logvar:
            return out, params["logvar"].reshape(-1, 1, 1, 1)
        return out

    # ------------------------------------------------------------------
    def save_config(self, directory: str):
        os.makedirs(directory, exist_ok=True)
        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump(self.config.to_dict(), f, indent=2)

    @classmethod
    def from_config_file(cls, path: str) -> "EDMAutoencoder":
        if os.path.isdir(path):
            path = os.path.join(path, "config.json")
        with open(path) as f:
            return cls(EDMAutoencoderConfig.from_dict(json.load(f)))
