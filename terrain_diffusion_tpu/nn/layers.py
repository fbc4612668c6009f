"""Functional magnitude-preserving layers (NHWC, param-dict style).

TPU-first re-design of the reference's MP layer modules
(`models/mp_layers.py`, `models/unet_block.py`): parameters are plain
pytrees (nested dicts of arrays), forward passes are pure functions, so
everything composes with jit/vmap/grad/shard_map without framework overhead.

Layout: activations NHWC (channels last — XLA's native TPU conv layout),
conv weights HWIO.  The torch-compat loader transposes OIHW->HWIO once at
load time.

Forced weight normalization (EDM2): the forward pass always normalizes
weights (gradients flow through the normalization, reference
`mp_layers.py:205-213`); training additionally re-normalizes the stored
weights after each optimizer step via `norm_weights_tree` (the functional
equivalent of the reference's in-place `weight.copy_(normalize(w))`).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from terrain_diffusion_tpu.ops import mp
from terrain_diffusion_tpu.ops.image import resize_bilinear


# ---------------------------------------------------------------------------
# MPConv (kernel [] == linear layer)
# ---------------------------------------------------------------------------

def mp_conv_init(key, in_channels: int, out_channels: int, kernel, groups: int = 1):
    """Params for an MPConv: HWIO weight (or (in, out) for linear)."""
    if len(kernel) == 0:
        shape = (in_channels, out_channels)
    else:
        assert len(kernel) == 2
        shape = (kernel[0], kernel[1], in_channels // groups, out_channels)
    return {"w": jax.random.normal(key, shape, dtype=jnp.float32)}


def mp_conv_apply(params, x, gain=1.0, groups: int = 1, no_padding: bool = False,
                  compute_dtype=None):
    """Magnitude-preserving conv/linear (reference `mp_layers.py:182-221`).

    Weight is globally RMS-normalized (in f32), scaled by gain/sqrt(fan_in),
    then cast to the compute dtype.
    """
    w = params["w"]
    w = mp.normalize(w)  # global norm, f32
    fan_in = int(np.prod(w.shape[:-1]))
    w = w * (gain / math.sqrt(fan_in))
    dt = compute_dtype or x.dtype
    w = w.astype(dt)
    x = x.astype(dt)
    if w.ndim == 2:
        return x @ w
    pad = "SAME" if not no_padding else "VALID"
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), pad, dimension_numbers=dn, feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(dt)


def mp_conv_resample_init(key, resample_mode: str, kernel, in_channels: int,
                          out_channels: int):
    """MPConvResample params (reference `mp_layers.py:133-156`): learned
    up/down resampling conv blended with the parameter-free path."""
    if resample_mode == "down":
        shape = (kernel[0], kernel[1], in_channels, out_channels)  # HWIO
    elif resample_mode in ("up", "up_bilinear"):
        # transposed conv: stored HWOI-style (kernel, out, in) for lax transpose
        shape = (kernel[0], kernel[1], out_channels, in_channels)
    else:
        raise ValueError("resample_mode must be 'up' or 'down'")
    return {"w": jnp.ones(shape, dtype=jnp.float32)}


def mp_conv_resample_apply(params, x, resample_mode: str, skip_weight: float = 0.0,
                           gain=1.0, compute_dtype=None):
    """Forward for MPConvResample (reference `mp_layers.py:157-176`):
    mp_sum of [learned resample conv, parameter-free resample]."""
    w = mp.normalize(params["w"])
    stride = params["w"].shape[0]
    fan = int(np.prod(w.shape[:2])) * (w.shape[2] if resample_mode == "down"
                                       else w.shape[3])
    w = w * (gain / math.sqrt(fan))
    dt = compute_dtype or x.dtype
    w = w.astype(dt)
    x = x.astype(dt)
    upsampled = resample(x, mode=resample_mode, factor=stride)
    if resample_mode == "down":
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, w, (stride, stride), "VALID", dimension_numbers=dn,
            preferred_element_type=jnp.float32).astype(dt)
    else:
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWOI", "NHWC"))
        y = jax.lax.conv_transpose(
            x, w, (stride, stride), "VALID", dimension_numbers=dn).astype(dt)
    return mp.mp_sum([y, upsampled], w=skip_weight)


def mp_embedding_init(key, num_embeddings: int, dim: int):
    return {"w": jax.random.normal(key, (num_embeddings, dim), dtype=jnp.float32)}


def mp_embedding_apply(params, idx):
    w = mp.normalize(params["w"])
    return jnp.take(w, idx, axis=0)


# ---------------------------------------------------------------------------
# Embeddings
# ---------------------------------------------------------------------------

def mp_fourier_init(key, num_channels: int, s: float = 1.0):
    k1, k2 = jax.random.split(key)
    return {
        "freqs": 2 * np.pi * jax.random.normal(k1, (num_channels,)) * s,
        "phases": 2 * np.pi * jax.random.uniform(k2, (num_channels,)),
    }


def mp_fourier_apply(params, x):
    return mp.fourier_embedding(x, params["freqs"], params["phases"])


def mp_positional_init(num_channels: int):
    return {"freqs": jnp.asarray(mp.positional_embedding_freqs(num_channels))}


def mp_positional_apply(params, x):
    return mp.positional_embedding(x, params["freqs"])


# ---------------------------------------------------------------------------
# Resampling (NHWC)
# ---------------------------------------------------------------------------

def resample(x, mode: str = "keep", factor: int = 2):
    """NHWC resample matching reference semantics (`mp_layers.py:15-30`):
    'down' = strided decimation, 'up' = nearest replication,
    'up_bilinear' = bilinear x2."""
    if mode == "keep":
        return x
    if mode == "down":
        return x[:, ::factor, ::factor, :]
    if mode == "up":
        x = jnp.repeat(x, factor, axis=1)
        return jnp.repeat(x, factor, axis=2)
    if mode == "up_bilinear":
        n, h, w, c = x.shape
        xc = jnp.moveaxis(x, -1, 1)
        xc = resize_bilinear(xc, (h * factor, w * factor))
        return jnp.moveaxis(xc, 1, -1)
    raise ValueError(f"unknown resample mode {mode}")


# ---------------------------------------------------------------------------
# UNetBlock
# ---------------------------------------------------------------------------

_ACTIVATIONS = {
    "silu": mp.mp_silu,
    "leaky_relu": lambda x: mp.mp_leaky_relu(x, 0.2),
}


def unet_block_init(
    key,
    in_channels: int,
    out_channels: int,
    emb_channels: int,
    mode: str = "enc",
    conv_type: str = "default",
    resample_mode: str = "keep",
    attention: bool = False,
    channels_per_head: int = 64,
    no_padding: bool = False,
    expansion_factor: int = 1,
    resample_type: str = "pooling",
    # NOTE: with resample_type='conv' the kernel size IS the resample
    # stride/factor (reference MPConvResample sets stride = kernel[0],
    # mp_layers.py:149) — pass resample_filter=2 for the usual 2x levels
    resample_filter: int = 4,
    **_unused,
):
    """Parameters for one MP U-Net block (reference `unet_block.py:11-100`)."""
    keys = jax.random.split(key, 8)
    p = {"emb_gain": jnp.zeros(())}
    if resample_type == "conv" and resample_mode != "keep":
        p["resample"] = mp_conv_resample_init(
            keys[7], resample_mode, [resample_filter, resample_filter],
            in_channels, out_channels)
    if conv_type in ("fused", "default"):
        p["conv_res0"] = mp_conv_init(
            keys[0], out_channels if mode == "enc" else in_channels,
            out_channels * expansion_factor, [3, 3])
    elif conv_type == "mobile":
        p["conv_res0_pw"] = mp_conv_init(
            keys[0], out_channels if mode == "enc" else in_channels,
            out_channels * expansion_factor, [1, 1])
        p["conv_res0_dw"] = mp_conv_init(
            keys[5], out_channels * expansion_factor,
            out_channels * expansion_factor, [3, 3],
            groups=out_channels * expansion_factor)
    if emb_channels > 0:
        p["emb_linear"] = mp_conv_init(keys[1], emb_channels,
                                       out_channels * expansion_factor, [])
    p["conv_res1"] = mp_conv_init(
        keys[2], out_channels * expansion_factor, out_channels,
        [3, 3] if conv_type == "default" else [1, 1])
    if in_channels != out_channels:
        p["conv_skip"] = mp_conv_init(keys[3], in_channels, out_channels, [1, 1])
    # Attention silently disables when out_channels < channels_per_head —
    # num_heads floors to 0 (reference `unet_block.py:67`) and the reference
    # instantiates no attn weights, so neither do we (checkpoint parity).
    if attention and out_channels // channels_per_head > 0:
        p["attn_qkv"] = mp_conv_init(keys[4], out_channels, out_channels * 3, [1, 1])
        p["attn_proj"] = mp_conv_init(keys[6], out_channels, out_channels, [1, 1])
    return p


def _attention(p, x, num_heads: int, compute_dtype, attention_impl: str = "xla"):
    """Pixel-norm attention (reference `unet_block.py:102-108`), NHWC.

    attention_impl='pallas' fuses norm+softmax+weighted-sum into one Pallas
    program per (batch, head) on TPU (ops/pallas_attention.py); falls back to
    the XLA path elsewhere.
    """
    n, h, w, c = x.shape
    y = mp_conv_apply(p["attn_qkv"], x, compute_dtype=compute_dtype)  # (N,H,W,3C)
    if attention_impl == "pallas":
        from terrain_diffusion_tpu.ops import pallas_attention as pa

        if pa.pallas_available() and pa.attention_eligible(y, num_heads):
            out = pa.fused_pixelnorm_attention(y, num_heads).astype(x.dtype)
            return mp_conv_apply(p["attn_proj"], out, compute_dtype=compute_dtype)
    ch = c // num_heads
    # qkv conv channels are laid out (head, channel, qkv) with qkv fastest —
    # torch `y.reshape(n, heads, -1, 3, hw)` on NCHW (reference
    # `unet_block.py:103`); mirror exactly for checkpoint parity.
    y = y.reshape(n, h * w, num_heads, ch, 3)
    y = jnp.transpose(y, (0, 2, 3, 4, 1))  # (N, heads, ch, 3, HW)
    y = mp.normalize(y, dim=2)
    q, k, v = y[:, :, :, 0], y[:, :, :, 1], y[:, :, :, 2]  # (N,heads,ch,HW)
    q32, k32, v32 = (t.astype(jnp.float32) for t in (q, k, v))
    logits = jnp.einsum("nhcq,nhck->nhqk", q32, k32 / math.sqrt(ch),
                        preferred_element_type=jnp.float32)
    wts = jax.nn.softmax(logits, axis=3)
    out = jnp.einsum("nhqk,nhck->nhcq", wts, v32,
                     preferred_element_type=jnp.float32)
    out = jnp.transpose(out, (0, 3, 1, 2)).reshape(n, h, w, c).astype(x.dtype)
    return mp_conv_apply(p["attn_proj"], out, compute_dtype=compute_dtype)


def _fused_block(p, x, emb, *, mode, conv_type, dropout, res_balance,
                 clip_act, expansion_factor, no_padding, activation,
                 training, compute_dtype, interpret, x2=None,
                 concat_scales=None, pre_upsample=1, halo_mode="carry"):
    """Route the block's conv body through the fused Pallas kernel
    (ops/pallas_block.py) when shapes/options allow; None = fall back."""
    if "conv_res0" not in p:  # mobile conv layout
        return None
    if not interpret and jax.default_backend() != "tpu":
        return None
    from terrain_diffusion_tpu.ops import pallas_block as pb

    if not pb.block_eligible(x, conv_type=conv_type, training=training,
                             dropout=dropout, no_padding=no_padding,
                             expansion_factor=expansion_factor,
                             activation=activation,
                             # interpret mode is the CPU test path; the
                             # measured large-map-only cutover is for TPU
                             min_pixels=0 if interpret else 128 * 128,
                             pre_upsample=pre_upsample,
                             halo_mode=halo_mode):
        return None
    dt = compute_dtype

    def norm_scaled(w):
        wn = mp.normalize(w)
        return wn * (1.0 / math.sqrt(int(np.prod(w.shape[:-1]))))

    w0 = norm_scaled(p["conv_res0"]["w"])
    w1 = norm_scaled(p["conv_res1"]["w"])
    wskip = None
    if "conv_skip" in p:
        ws = norm_scaled(p["conv_skip"]["w"])  # (1, 1, Cin, Cout) HWIO
        wskip = ws.reshape(ws.shape[2], ws.shape[3])
    c = None
    if "emb_linear" in p and emb is not None:
        c = mp_conv_apply(p["emb_linear"], emb, gain=p["emb_gain"],
                          compute_dtype=dt) + 1.0
        c = c / jnp.sqrt(jnp.mean(jnp.square(c), axis=-1, keepdims=True) + 1e-8)
    return pb.fused_block_apply(
        x.astype(dt), w0, w1, c, wskip,
        x2.astype(dt) if x2 is not None else None, mode=mode,
        pixel_norm=(mode == "enc"), res_balance=float(res_balance),
        clip_act=clip_act, concat_scales=concat_scales,
        pre_upsample=pre_upsample, interpret=interpret,
        halo_mode=halo_mode)


def unet_block_apply(
    p,
    x,
    emb,
    *,
    mode: str = "enc",
    conv_type: str = "default",
    resample_mode: str = "keep",
    attention: bool = False,
    channels_per_head: int = 64,
    dropout: float = 0.0,
    res_balance: float = 0.3,
    attn_balance: float = 0.3,
    clip_act: Optional[float] = 256.0,
    expansion_factor: int = 1,
    no_padding: bool = False,
    activation: str = "silu",
    training: bool = False,
    dropout_key=None,
    compute_dtype=None,
    attention_impl: str = "xla",
    block_impl: str = "xla",
    halo_mode: str = "carry",
    skip_input=None,
    concat_w: float = 0.3,
    **_unused,
):
    """Forward for one MP U-Net block (reference `unet_block.py:116-156`).

    skip_input: optional U-Net skip tensor to mp_concat onto x before the
    block (dec path).  Passing it here (instead of pre-concatenating) lets
    the fused Pallas path consume both halves without materializing the
    2C concat in HBM; the XLA path concatenates exactly as before.
    """
    act = _ACTIVATIONS[activation]
    out_channels = p["conv_res1"]["w"].shape[-1]
    num_heads = out_channels // channels_per_head if attention else 0
    dt = compute_dtype or x.dtype

    # parameter-free nearest-up can run INSIDE the fused kernel (no HBM
    # materialization of the upsampled map); defer it when pallas is on
    defer_up = (block_impl in ("pallas", "pallas_interpret")
                and resample_mode == "up" and "resample" not in p
                and skip_input is None)
    if "resample" in p:
        x = mp_conv_resample_apply(
            p["resample"], x, resample_mode,
            skip_weight=_unused.get("resample_skip_weight", 0.5),
            compute_dtype=dt)
    elif not defer_up:
        x = resample(x, resample_mode)

    if block_impl in ("pallas", "pallas_interpret"):
        x2 = cscales = None
        if skip_input is not None and skip_input.shape == x.shape:
            wv = (1.0 - concat_w, concat_w)
            ctot = math.sqrt((x.shape[-1] + skip_input.shape[-1])
                             / (wv[0] ** 2 + wv[1] ** 2))
            cscales = (ctot / math.sqrt(x.shape[-1]) * wv[0],
                       ctot / math.sqrt(skip_input.shape[-1]) * wv[1])
            x2 = skip_input
        elif skip_input is not None:
            x = mp.mp_concat([x, skip_input], axis=-1, w=concat_w)
            skip_input = None
        fused = _fused_block(p, x, emb, mode=mode, conv_type=conv_type,
                             dropout=dropout, res_balance=res_balance,
                             clip_act=None if num_heads > 0 else clip_act,
                             expansion_factor=expansion_factor,
                             no_padding=no_padding, activation=activation,
                             training=training, compute_dtype=dt,
                             interpret=block_impl == "pallas_interpret",
                             x2=x2, concat_scales=cscales,
                             pre_upsample=2 if defer_up else 1,
                             halo_mode=halo_mode)
        if fused is None and defer_up:
            x = resample(x, "up")  # kernel ineligible: XLA upsample
        if fused is not None:
            x = fused
            if num_heads > 0:
                x = mp.mp_sum(
                    [x, _attention(p, x, num_heads, dt, attention_impl)],
                    w=attn_balance)
                if clip_act is not None:
                    x = jnp.clip(x, -clip_act, clip_act)
            return x
        if x2 is not None:  # kernel ineligible: concatenate as usual
            x = mp.mp_concat([x, x2], axis=-1, w=concat_w)
    elif skip_input is not None:
        x = mp.mp_concat([x, skip_input], axis=-1, w=concat_w)
    if mode == "enc":
        if "conv_skip" in p:
            x = mp_conv_apply(p["conv_skip"], x, compute_dtype=dt)
        x = mp.normalize(x, dim=-1)  # pixel norm over channels

    if conv_type == "mobile":
        y = mp_conv_apply(p["conv_res0_pw"], act(x), compute_dtype=dt)
        y = mp_conv_apply(p["conv_res0_dw"], act(y),
                          groups=y.shape[-1], no_padding=no_padding,
                          compute_dtype=dt)
    else:
        y = mp_conv_apply(p["conv_res0"], act(x), no_padding=no_padding,
                          compute_dtype=dt)
    if "emb_linear" in p and emb is not None:
        c = mp_conv_apply(p["emb_linear"], emb, gain=p["emb_gain"],
                          compute_dtype=dt) + 1.0
        c = c / jnp.sqrt(jnp.mean(jnp.square(c), axis=-1, keepdims=True) + 1e-8)
        y = act(y * c[:, None, None, :].astype(y.dtype))
    else:
        y = act(y)
    if training and dropout > 0 and dropout_key is not None:
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout, y.shape)
        y = jnp.where(keep, y / (1.0 - dropout), 0.0)
    y = mp_conv_apply(p["conv_res1"], y, no_padding=no_padding, compute_dtype=dt)

    if mode == "dec" and "conv_skip" in p:
        x = mp_conv_apply(p["conv_skip"], x, compute_dtype=dt)

    if x.shape[1:3] != y.shape[1:3]:  # no_padding crop
        dh = x.shape[1] - y.shape[1]
        dw = x.shape[2] - y.shape[2]
        x = x[:, dh // 2 : x.shape[1] - (dh - dh // 2),
              dw // 2 : x.shape[2] - (dw - dw // 2), :]
    x = mp.mp_sum([x, y], w=res_balance)

    if num_heads > 0:
        x = mp.mp_sum([x, _attention(p, x, num_heads, dt, attention_impl)],
                      w=attn_balance)

    if clip_act is not None:
        x = jnp.clip(x, -clip_act, clip_act)
    return x


def norm_weights_tree(params):
    """Re-normalize every MP weight leaf (post-optimizer-step forced norm)."""

    def norm_leaf(path, leaf):
        if path and path[-1] == "w" and leaf.ndim >= 2:
            return mp.normalize(leaf)
        return leaf

    def walk(node, path=()):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return norm_leaf(path, node)

    return walk(params)
