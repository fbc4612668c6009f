"""EDMUnet2D — EDM2-style magnitude-preserving U-Net, functional JAX/NHWC.

Architecture-compatible rebuild of the reference model
(`models/edm_unet.py:15-193`): identical block graph, conditioning scheme
(noise fourier/positional + float/tensor/embedding conditional inputs with
mp_sum weighting), ones-channel bias surrogate, skip concat with mp_concat,
logvar uncertainty head — so reference checkpoints load weight-for-weight
(see `terrain_diffusion_tpu.nn.torch_compat`).

TPU-first differences: NHWC activations/HWIO weights feeding the MXU,
pure-functional params (pytree) for jit/pjit/grad composition, static
config dataclass.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from terrain_diffusion_tpu.ops import mp
from terrain_diffusion_tpu.nn import layers as L


@dataclasses.dataclass(frozen=True)
class EDMUnetConfig:
    image_size: int
    in_channels: int
    out_channels: Optional[int] = None
    model_channels: int = 128
    model_channel_mults: tuple = (1, 2, 3, 4)
    layers_per_block: Any = 2
    emb_channels: Optional[int] = None
    noise_emb_dims: Optional[int] = None
    attn_resolutions: tuple = ()
    midblock_attention: bool = True
    concat_balance: float = 0.3
    logvar_channels: int = 128
    block_kwargs: Any = dataclasses.field(default_factory=dict)
    conditional_inputs: tuple = ()  # ((type, x, weight), ...)
    encode_only: bool = False
    disable_out_gain: bool = False
    fourier_scale: Any = 1
    n_logvar: int = 1

    # --- resolved helpers -------------------------------------------------
    def resolved(self):
        mults = tuple(self.model_channel_mults or (1, 2, 3, 4))
        emb = self.emb_channels or self.model_channels * max(mults)
        noise_dims = self.model_channels if self.noise_emb_dims is None else self.noise_emb_dims
        out_ch = self.out_channels or self.in_channels
        lpb = self.layers_per_block
        if isinstance(lpb, int):
            lpb = [lpb] * len(mults)
        if noise_dims == 0 and len(self.conditional_inputs) == 0:
            emb = 0
        return mults, emb, noise_dims, tuple(lpb), out_ch

    @classmethod
    def from_dict(cls, d: dict) -> "EDMUnetConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in fields}
        for key in ("model_channel_mults", "attn_resolutions"):
            if kw.get(key) is not None:
                kw[key] = tuple(kw[key])
        if kw.get("conditional_inputs"):
            kw["conditional_inputs"] = tuple(tuple(ci) for ci in kw["conditional_inputs"])
        if kw.get("block_kwargs") is None:
            kw["block_kwargs"] = {}
        return cls(**kw)

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["_class_name"] = "EDMUnet2D"
        if isinstance(d.get("block_kwargs"), dict):
            # runtime backend selectors, not architecture — keep persisted
            # configs loadable by the reference implementation
            d["block_kwargs"] = {k: v for k, v in d["block_kwargs"].items()
                                 if k not in ("block_impl", "attention_impl",
                                              "halo_mode")}
        return d


def _enc_dec_plan(cfg: EDMUnetConfig):
    """Reproduce the reference's module-name graph (edm_unet.py:107-139)."""
    mults, emb, noise_dims, lpb, out_ch = cfg.resolved()
    block_channels = [cfg.model_channels * m for m in mults]
    enc = []  # (name, kind, in, out, block_opts)
    cout = cfg.in_channels + 1
    for level, (channels, nb) in enumerate(zip(block_channels, lpb)):
        res = cfg.image_size // 2**level
        if level == 0:
            cin, cout = cout, channels
            enc.append((f"{res}x{res}_conv", "conv", cin, cout, {}))
        else:
            enc.append((f"{res}x{res}_down", "block", cout, cout,
                        dict(mode="enc", resample_mode="down")))
        for idx in range(nb):
            cin, cout = cout, channels
            enc.append((f"{res}x{res}_block{idx}", "block", cin, cout,
                        dict(mode="enc", attention=res in cfg.attn_resolutions)))
    dec = []
    skips = [e[3] for e in enc]
    if not cfg.encode_only:
        for level, (channels, nb) in reversed(list(enumerate(zip(block_channels, lpb)))):
            res = cfg.image_size // 2**level
            if level == len(block_channels) - 1:
                dec.append((f"{res}x{res}_in0", "block", cout, cout,
                            dict(mode="dec", attention=cfg.midblock_attention)))
                dec.append((f"{res}x{res}_in1", "block", cout, cout, dict(mode="dec")))
            else:
                dec.append((f"{res}x{res}_up", "block", cout, cout,
                            dict(mode="dec", resample_mode="up")))
            for idx in range(nb + 1):
                cin = cout + skips.pop()
                cout = channels
                dec.append((f"{res}x{res}_block{idx}", "block", cin, cout,
                            dict(mode="dec", attention=res in cfg.attn_resolutions)))
    return enc, dec, cout, out_ch, emb, noise_dims


class EDMUnet2D:
    """Config + init + apply bundle (stateless; params are explicit)."""

    def __init__(self, config: EDMUnetConfig):
        self.config = config
        self.enc_plan, self.dec_plan, self._final_ch, self.out_ch, self.emb_ch, self.noise_dims = _enc_dec_plan(config)

    # ------------------------------------------------------------------
    def init(self, key) -> dict:
        cfg = self.config
        keys = iter(jax.random.split(key, 64 + len(self.enc_plan) + len(self.dec_plan)))
        p: dict = {}
        if self.noise_dims > 0:
            if cfg.fourier_scale == "pos":
                p["noise_fourier"] = L.mp_positional_init(self.noise_dims)
            else:
                p["noise_fourier"] = L.mp_fourier_init(next(keys), self.noise_dims,
                                                       s=float(cfg.fourier_scale))
            p["noise_linear"] = L.mp_conv_init(next(keys), self.noise_dims, self.emb_ch, [])
        cond_layers = []
        for typ, x, _w in cfg.conditional_inputs:
            if typ == "float":
                cond_layers.append({
                    "fourier": L.mp_fourier_init(next(keys), x),
                    "linear": L.mp_conv_init(next(keys), x, self.emb_ch, []),
                })
            elif typ == "tensor":
                cond_layers.append({"linear": L.mp_conv_init(next(keys), x, self.emb_ch, [])})
            elif typ == "embedding":
                cond_layers.append({"embed": L.mp_embedding_init(next(keys), x, self.emb_ch)})
            else:
                raise ValueError(f"unknown conditional input type {typ}")
        if cond_layers:
            p["conditional_layers"] = {str(i): c for i, c in enumerate(cond_layers)}
        if not cfg.disable_out_gain:
            p["out_gain"] = jnp.zeros(())
        p["enc"] = {}
        for name, kind, cin, cout, opts in self.enc_plan:
            if kind == "conv":
                p["enc"][name] = L.mp_conv_init(next(keys), cin, cout, [3, 3])
            else:
                p["enc"][name] = L.unet_block_init(
                    next(keys), cin, cout, self.emb_ch, **{**cfg.block_kwargs, **opts})
        p["dec"] = {}
        for name, kind, cin, cout, opts in self.dec_plan:
            p["dec"][name] = L.unet_block_init(
                next(keys), cin, cout, self.emb_ch, **{**cfg.block_kwargs, **opts})
        if not cfg.encode_only or True:
            p["out_conv"] = L.mp_conv_init(next(keys), self._final_ch, self.out_ch, [3, 3])
        p["logvar_fourier"] = L.mp_fourier_init(next(keys), cfg.logvar_channels)
        p["logvar_linear"] = L.mp_conv_init(next(keys), cfg.logvar_channels, cfg.n_logvar, [])
        return p

    # ------------------------------------------------------------------
    def compute_embeddings(self, params, noise_labels, conditional_inputs):
        cfg = self.config
        conditional_inputs = conditional_inputs or []
        embeds = []
        weights = []
        if self.noise_dims > 0:
            if cfg.fourier_scale == "pos":
                nf = L.mp_positional_apply(params["noise_fourier"], noise_labels)
            else:
                nf = L.mp_fourier_apply(params["noise_fourier"], noise_labels)
            embeds.append(L.mp_conv_apply(params["noise_linear"], nf))
            weights.append(1.0)
        for i, (typ, _x, w) in enumerate(cfg.conditional_inputs):
            cp = params["conditional_layers"][str(i)]
            ci = conditional_inputs[i]
            if typ == "float":
                e = L.mp_conv_apply(cp["linear"], L.mp_fourier_apply(cp["fourier"], ci))
            elif typ == "tensor":
                e = mp.mp_silu(L.mp_conv_apply(cp["linear"], ci))
            else:
                e = L.mp_embedding_apply(cp["embed"], ci)
            embeds.append(e)
            weights.append(float(w))
        if not embeds:
            return None
        emb = mp.mp_sum(embeds, weights)
        return mp.mp_silu(emb)

    # ------------------------------------------------------------------
    def apply(self, params, x, noise_labels=None, conditional_inputs=None,
              return_logvar: bool = False, precomputed_embeds=None,
              training: bool = False, dropout_key=None, compute_dtype=None):
        """Forward pass.  x is NHWC (N, H, W, in_channels)."""
        cfg = self.config
        dt = compute_dtype or x.dtype
        x = x.astype(dt)
        emb = precomputed_embeds
        if emb is None:
            emb = self.compute_embeddings(params, noise_labels, conditional_inputs)
        if emb is not None:
            emb = emb.astype(dt)

        x = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
        skips = []
        n_blocks = len(self.enc_plan) + len(self.dec_plan)
        dkeys = (jax.random.split(dropout_key, n_blocks)
                 if (training and dropout_key is not None) else [None] * n_blocks)
        bi = 0
        for name, kind, cin, cout, opts in self.enc_plan:
            if kind == "conv":
                x = self._in_conv(params["enc"][name], x, dt)
            else:
                x = L.unet_block_apply(
                    params["enc"][name], x, emb,
                    **{**cfg.block_kwargs, **opts},
                    training=training, dropout_key=dkeys[bi], compute_dtype=dt)
            skips.append(x)
            bi += 1
        for name, kind, cin, cout, opts in self.dec_plan:
            skip = skips.pop() if "block" in name else None
            x = L.unet_block_apply(
                params["dec"][name], x, emb,
                **{**cfg.block_kwargs, **opts},
                skip_input=skip, concat_w=cfg.concat_balance,
                training=training, dropout_key=dkeys[bi], compute_dtype=dt)
            bi += 1
        gain = params["out_gain"] if "out_gain" in params else 1.0
        x = self._out_conv(params, x, gain, dt)

        if return_logvar:
            lv_in = jnp.log(jnp.tan(noise_labels) / 8.0)
            logvar = L.mp_conv_apply(
                params["logvar_linear"],
                L.mp_fourier_apply(params["logvar_fourier"], lv_in))
            logvar = logvar.reshape(-1, 1, 1, cfg.n_logvar)
            return x, logvar
        return x

    # ------------------------------------------------------------------
    def _in_conv(self, p, x, dt):
        """Input 3x3 conv; fused Pallas on large maps under block_impl
        'pallas' (same rationale as _out_conv)."""
        impl = (self.config.block_kwargs or {}).get("block_impl", "xla")
        if impl in ("pallas", "pallas_interpret"):
            interp = impl == "pallas_interpret"
            halo = self.config.block_kwargs.get("halo_mode", "carry")
            from terrain_diffusion_tpu.ops import pallas_block as pb
            if (interp or jax.default_backend() == "tpu") and \
                    pb.conv3x3_eligible(x, halo_mode=halo):
                w = mp.normalize(p["w"]) / np.sqrt(int(np.prod(p["w"].shape[:-1])))
                return pb.fused_conv3x3_apply(
                    x.astype(dt), w, interpret=interp, halo_mode=halo)
        return L.mp_conv_apply(p, x, compute_dtype=dt)

    # ------------------------------------------------------------------
    def _out_conv(self, params, x, gain, dt):
        """Output 3x3 conv; routed through the fused Pallas conv on large
        maps when block_impl is 'pallas' (XLA's space-to-batch rewrite makes
        the full-res 64->1 head cost more than its FLOPs)."""
        impl = (self.config.block_kwargs or {}).get("block_impl", "xla")
        if impl in ("pallas", "pallas_interpret"):
            interp = impl == "pallas_interpret"
            halo = self.config.block_kwargs.get("halo_mode", "carry")
            from terrain_diffusion_tpu.ops import pallas_block as pb
            if (interp or jax.default_backend() == "tpu") and \
                    pb.conv3x3_eligible(x, halo_mode=halo):
                w = params["out_conv"]["w"]
                w = mp.normalize(w) * (gain / np.sqrt(int(np.prod(w.shape[:-1]))))
                return pb.fused_conv3x3_apply(
                    x.astype(dt), w, interpret=interp, halo_mode=halo)
        return L.mp_conv_apply(params["out_conv"], x, gain=gain,
                               compute_dtype=dt)

    # ------------------------------------------------------------------
    def count_parameters(self, params) -> int:
        return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))

    # ------------------------------------------------------------------
    def save_config(self, directory: str):
        os.makedirs(directory, exist_ok=True)
        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump(self.config.to_dict(), f, indent=2)

    @classmethod
    def from_config_file(cls, path: str) -> "EDMUnet2D":
        if os.path.isdir(path):
            path = os.path.join(path, "config.json")
        with open(path) as f:
            return cls(EDMUnetConfig.from_dict(json.load(f)))
