"""Fused pixel-norm attention as a Pallas TPU kernel.

The MP U-Net's attention (reference `unet_block.py:102-108`) is:
    qkv -> reshape to (heads, ch, 3, HW) -> pixel-norm over ch
        -> softmax(q.k / sqrt(ch)) -> weighted sum of v

As separate XLA ops this materializes the normalized q/k/v and the (HW, HW)
logit matrix in HBM between stages.  This kernel runs the whole chain per
(batch, head) grid cell out of VMEM: one read of the qkv tensor, one write
of the output — the fusion the north-star design calls for on the U-Net's
attention path.  Numerics match the reference formulation (f32 softmax).

Usage: `unet_block_apply(..., attention_impl="pallas")` routes here on TPU;
any other backend falls back to the XLA path automatically.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas import can fail on cpu-only builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # noqa: BLE001
    _PALLAS_OK = False


def pallas_available() -> bool:
    return _PALLAS_OK and jax.default_backend() == "tpu"


def _attn_kernel(qkv_ref, out_ref, *, ch: int, hw: int, eps: float):
    """One (batch*head) cell: qkv_ref (1, 3*ch, HW) -> out_ref (1, ch, HW)."""
    qkv = qkv_ref[0].astype(jnp.float32)  # (3*ch, HW)
    q = qkv[0:ch, :]
    k = qkv[ch:2 * ch, :]
    v = qkv[2 * ch:3 * ch, :]

    def pixel_norm(x):
        # reference normalize(y, dim=2): per-(pixel, qkv-slot) channel norm
        norm = jnp.sqrt(jnp.sum(x * x, axis=0, keepdims=True))
        denom = eps + norm * (1.0 / np.sqrt(float(ch)))
        return x / denom

    q = pixel_norm(q)
    k = pixel_norm(k)
    v = pixel_norm(v)

    logits = jnp.dot(q.T, k, preferred_element_type=jnp.float32)
    logits = logits * (1.0 / math.sqrt(ch))  # (HW, HW)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    out = jnp.dot(v, p.T, preferred_element_type=jnp.float32)  # (ch, HW)
    out_ref[0] = out.astype(out_ref.dtype)


def attention_eligible(qkv, num_heads: int) -> bool:
    """VMEM feasibility: each program holds a (HW, HW) f32 logit matrix
    plus qkv slices; beyond ~2048 tokens that blows the budget and the XLA
    path handles it fine."""
    n, h, w, c3 = qkv.shape
    c = c3 // 3
    if num_heads <= 0 or c % num_heads:
        return False
    hw = h * w
    ch = c // num_heads
    # logits + softmax temporaries (~3x) + qkv/out slices, f32
    vmem = 3 * hw * hw * 4 + 4 * ch * hw * 4
    return hw <= 2048 and vmem <= 64 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("num_heads", "eps"))
def fused_pixelnorm_attention(qkv: jnp.ndarray, num_heads: int,
                              eps: float = 1e-4) -> jnp.ndarray:
    """(N, H, W, 3C) qkv -> (N, H, W, C) attention output (pre-projection).

    Grid: one Pallas program per (batch, head); each keeps its qkv slice and
    the logit matrix in VMEM.  HW and ch must satisfy VMEM limits
    (HW <= ~4096, ch <= 256 — always true for the 8x8..16x16 feature maps
    this architecture attends over).
    """
    n, h, w, c3 = qkv.shape
    c = c3 // 3
    ch = c // num_heads
    hw = h * w
    # -> (N, heads, 3*ch, HW): split channels by head, stack q/k/v per head.
    # Conv channel layout is (head, channel, qkv) with qkv fastest (torch
    # reference `unet_block.py:103`).
    y = qkv.reshape(n, hw, num_heads, ch, 3)
    y = jnp.transpose(y, (0, 2, 4, 3, 1)).reshape(n * num_heads, 3 * ch, hw)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, ch=ch, hw=hw, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n * num_heads, ch, hw), qkv.dtype),
        grid=(n * num_heads,),
        in_specs=[pl.BlockSpec((1, 3 * ch, hw), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ch, hw), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(y)
    out = out.reshape(n, num_heads, ch, hw)
    out = jnp.transpose(out, (0, 3, 1, 2)).reshape(n, h, w, c)
    return out


def reference_pixelnorm_attention(qkv: jnp.ndarray, num_heads: int,
                                  eps: float = 1e-4) -> jnp.ndarray:
    """XLA reference implementation (same math as layers._attention's core)."""
    from terrain_diffusion_tpu.ops import mp

    n, h, w, c3 = qkv.shape
    c = c3 // 3
    ch = c // num_heads
    y = qkv.reshape(n, h * w, num_heads, ch, 3)
    y = jnp.transpose(y, (0, 2, 3, 4, 1))  # (N, heads, ch, 3, HW)
    y = mp.normalize(y, dim=2)
    q, k, v = y[:, :, :, 0], y[:, :, :, 1], y[:, :, :, 2]
    logits = jnp.einsum("nhcq,nhck->nhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32) / math.sqrt(ch))
    wts = jax.nn.softmax(logits, axis=3)
    out = jnp.einsum("nhqk,nhck->nhcq", wts, v.astype(jnp.float32))
    out = jnp.transpose(out, (0, 3, 1, 2)).reshape(n, h, w, c)
    return out.astype(qkv.dtype)
