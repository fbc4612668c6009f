"""Magnitude-preserving primitives (EDM2 style).

Functional JAX counterparts of the reference's MP layer math
(`models/mp_layers.py:9-86`): forced weight normalization, MP activations,
MP sum/concat.  Pure functions over arrays — layers in
``terrain_diffusion_tpu.nn`` compose these.

Channel-dim conventions are explicit arguments (the TPU models run NHWC).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def normalize(x: jnp.ndarray, dim=None, eps: float = 1e-4) -> jnp.ndarray:
    """x / (eps + ||x||_dim * sqrt(numel(norm)/numel(x))) — RMS-style norm.

    Matches reference `mp_layers.py:9-12` exactly (including the global
    normalization when dim is None, used for forced weight norm).
    """
    x32 = x.astype(jnp.float32)
    if dim is None:
        norm = jnp.sqrt(jnp.sum(jnp.square(x32)))
        norm_numel = 1
    else:
        dims = (dim,) if isinstance(dim, int) else tuple(dim)
        norm = jnp.sqrt(jnp.sum(jnp.square(x32), axis=dims, keepdims=True))
        n = x.size
        for d in dims:
            n //= x.shape[d]
        norm_numel = n
    denom = eps + norm * np.sqrt(norm_numel / x.size)
    return (x32 / denom).astype(x.dtype)


def mp_silu(x):
    # jax.nn.sigmoid, not 1/(1+exp(-x)): the naive form overflows exp at
    # |x|>~88 and its autodiff gradient becomes inf/inf = NaN even though
    # the forward saturates cleanly (hit by large unnormalized cond inputs)
    return (x * jax.nn.sigmoid(x)) / 0.596


def mp_hardsilu(x):
    return (x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0) / 0.576


def mp_sigmoid(x):
    return jax.nn.sigmoid(x) / 0.208


def mp_leaky_relu(x, alpha: float):
    factor = math.sqrt((1 + alpha**2) / 2)
    return jnp.where(x >= 0, x, alpha * x) / factor


def _resolve_weights(n: int, w, dtype):
    if w is None:
        wv = np.full((n,), 1.0 / n, dtype=np.float64)
    elif isinstance(w, float):
        wv = np.array([1.0 - w, w], dtype=np.float64)
    else:
        wv = np.asarray(w, dtype=np.float64)
    return wv


def mp_sum(args, w=None):
    """Magnitude-preserving weighted sum: sum(a_i * w_i) / ||w||_2."""
    wv = _resolve_weights(len(args), w, args[0].dtype)
    norm = float(np.linalg.norm(wv))
    out = args[0] * float(wv[0])
    for a, wi in zip(args[1:], wv[1:]):
        out = out + a * float(wi)
    return out / norm


def mp_concat(args, axis: int = -1, w=None):
    """Magnitude-preserving concat: each arg scaled so its contribution in
    subsequent layers is proportional to w_i regardless of channel count."""
    wv = _resolve_weights(len(args), w, args[0].dtype)
    n_ch = [a.shape[axis] for a in args]
    c = math.sqrt(sum(n_ch) / float(np.sum(wv**2)))
    scaled = [
        a * float(c / math.sqrt(a.shape[axis]) * wv[i]) for i, a in enumerate(args)
    ]
    return jnp.concatenate(scaled, axis=axis)


def positional_embedding_freqs(num_channels: int) -> np.ndarray:
    """MPPositionalEmbedding frequency table (`mp_layers.py:88-94`)."""
    half = num_channels // 2
    emb = math.log(10) / (half - 1)
    return np.exp(np.arange(half) * -emb).astype(np.float32)


def positional_embedding(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Deterministic MP positional embedding: [sin(x f), cos(x f)] * sqrt(2)."""
    y = x.astype(jnp.float32)[..., None] * freqs[None, :].astype(jnp.float32)
    y = jnp.concatenate([jnp.sin(y), jnp.cos(y)], axis=-1) * math.sqrt(2.0)
    return y.astype(x.dtype)


def fourier_embedding(x: jnp.ndarray, freqs: jnp.ndarray, phases: jnp.ndarray) -> jnp.ndarray:
    """MPFourier: cos(x*f + p) * sqrt(2) with random freqs/phases buffers."""
    y = x.astype(jnp.float32)[..., None] * freqs[None, :].astype(jnp.float32)
    y = y + phases[None, :].astype(jnp.float32)
    return (jnp.cos(y) * math.sqrt(2.0)).astype(x.dtype)
