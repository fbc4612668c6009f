"""InceptionV3 feature extractor (FID variant) in JAX/NHWC.

Drop-in replacement for the Inception pool3 features the reference consumes
through torchmetrics KID (`training/trainers/diffusion.py:184-286`) and
torch-fidelity FID.  Architecture follows torchvision ``inception_v3``
with the pytorch-fid modifications that match the original TF graph:

- avg-pool branches use ``count_include_pad=False``
- ``Mixed_7c``'s pool branch is a **max** pool
- inputs are bilinearly resized to 299x299 *without* antialiasing
  (torch ``F.interpolate`` semantics) and scaled from [0,1] to [-1,1]

Weights load from a standard torchvision/pytorch-fid state dict
(``Conv2d_1a_3x3.conv.weight`` naming) via :func:`params_from_torch_state`
— BatchNorm running stats are folded into per-channel affine at load.
No pretrained weights ship with this repo (offline build); point
``load_torch_checkpoint`` at a downloaded ``pt_inception``/torchvision
``.pth``/safetensors file for literature-comparable FID/KID numbers.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

BN_EPS = 1e-3

# ---------------------------------------------------------------------------
# Architecture tables (torchvision inception_v3 layer names / shapes)
# ---------------------------------------------------------------------------

# stem: (name, in, out, kernel, stride, padding) or ("maxpool", k, s)
STEM = [
    ("Conv2d_1a_3x3", 3, 32, (3, 3), 2, (0, 0)),
    ("Conv2d_2a_3x3", 32, 32, (3, 3), 1, (0, 0)),
    ("Conv2d_2b_3x3", 32, 64, (3, 3), 1, (1, 1)),
    ("maxpool", 3, 2),
    ("Conv2d_3b_1x1", 64, 80, (1, 1), 1, (0, 0)),
    ("Conv2d_4a_3x3", 80, 192, (3, 3), 1, (0, 0)),
    ("maxpool", 3, 2),
]

# InceptionA (in, pool_features) for Mixed_5b/5c/5d
A_BLOCKS = [("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64), ("Mixed_5d", 288, 64)]
# InceptionC (in=768, c7) for Mixed_6b..6e
C_BLOCKS = [("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160), ("Mixed_6e", 192)]
E_BLOCKS = [("Mixed_7b", 1280), ("Mixed_7c", 2048)]

FEATURE_DIM = 2048
NUM_CLASSES = 1008  # pt_inception head; torchvision's is 1000


def _conv_specs():
    """Every (qualified_name, in_ch, out_ch, kernel) conv in the network."""
    specs = []
    for entry in STEM:
        if entry[0] == "maxpool":
            continue
        name, cin, cout, k, _s, _p = entry
        specs.append((name, cin, cout, k))

    def add(block, suffix, cin, cout, k):
        specs.append((f"{block}.{suffix}", cin, cout, k))

    for name, cin, pf in A_BLOCKS:
        add(name, "branch1x1", cin, 64, (1, 1))
        add(name, "branch5x5_1", cin, 48, (1, 1))
        add(name, "branch5x5_2", 48, 64, (5, 5))
        add(name, "branch3x3dbl_1", cin, 64, (1, 1))
        add(name, "branch3x3dbl_2", 64, 96, (3, 3))
        add(name, "branch3x3dbl_3", 96, 96, (3, 3))
        add(name, "branch_pool", cin, pf, (1, 1))
    # Mixed_6a (InceptionB, in=288)
    add("Mixed_6a", "branch3x3", 288, 384, (3, 3))
    add("Mixed_6a", "branch3x3dbl_1", 288, 64, (1, 1))
    add("Mixed_6a", "branch3x3dbl_2", 64, 96, (3, 3))
    add("Mixed_6a", "branch3x3dbl_3", 96, 96, (3, 3))
    for name, c7 in C_BLOCKS:
        add(name, "branch1x1", 768, 192, (1, 1))
        add(name, "branch7x7_1", 768, c7, (1, 1))
        add(name, "branch7x7_2", c7, c7, (1, 7))
        add(name, "branch7x7_3", c7, 192, (7, 1))
        add(name, "branch7x7dbl_1", 768, c7, (1, 1))
        add(name, "branch7x7dbl_2", c7, c7, (7, 1))
        add(name, "branch7x7dbl_3", c7, c7, (1, 7))
        add(name, "branch7x7dbl_4", c7, c7, (7, 1))
        add(name, "branch7x7dbl_5", c7, 192, (1, 7))
        add(name, "branch_pool", 768, 192, (1, 1))
    # Mixed_7a (InceptionD, in=768)
    add("Mixed_7a", "branch3x3_1", 768, 192, (1, 1))
    add("Mixed_7a", "branch3x3_2", 192, 320, (3, 3))
    add("Mixed_7a", "branch7x7x3_1", 768, 192, (1, 1))
    add("Mixed_7a", "branch7x7x3_2", 192, 192, (1, 7))
    add("Mixed_7a", "branch7x7x3_3", 192, 192, (7, 1))
    add("Mixed_7a", "branch7x7x3_4", 192, 192, (3, 3))
    for name, _out in E_BLOCKS:
        cin = 1280 if name == "Mixed_7b" else 2048
        add(name, "branch1x1", cin, 320, (1, 1))
        add(name, "branch3x3_1", cin, 384, (1, 1))
        add(name, "branch3x3_2a", 384, 384, (1, 3))
        add(name, "branch3x3_2b", 384, 384, (3, 1))
        add(name, "branch3x3dbl_1", cin, 448, (1, 1))
        add(name, "branch3x3dbl_2", 448, 384, (3, 3))
        add(name, "branch3x3dbl_3a", 384, 384, (1, 3))
        add(name, "branch3x3dbl_3b", 384, 384, (3, 1))
        add(name, "branch_pool", cin, 192, (1, 1))
    return specs


CONV_SPECS = _conv_specs()


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def params_from_torch_state(state: dict) -> dict:
    """Fold a torchvision-named state dict (numpy or torch tensors) into the
    apply() param tree: conv OIHW->HWIO, BN running stats -> (scale, shift)."""
    def arr(k):
        v = state[k]
        return np.asarray(v.detach().numpy() if hasattr(v, "detach") else v,
                          np.float32)

    params = {}
    for name, _cin, _cout, _k in CONV_SPECS:
        w = np.transpose(arr(f"{name}.conv.weight"), (2, 3, 1, 0))
        gamma = arr(f"{name}.bn.weight")
        beta = arr(f"{name}.bn.bias")
        mean = arr(f"{name}.bn.running_mean")
        var = arr(f"{name}.bn.running_var")
        scale = gamma / np.sqrt(var + BN_EPS)
        params[name] = {
            "w": jnp.asarray(w),
            "scale": jnp.asarray(scale),
            "shift": jnp.asarray(beta - mean * scale),
        }
    if "fc.weight" in state:
        params["fc"] = {"w": jnp.asarray(arr("fc.weight").T),
                        "b": jnp.asarray(arr("fc.bias"))}
    return params


def random_torch_state(seed: int = 0, num_classes: int = 1000) -> dict:
    """Torch-style random state dict (tests / shape reference)."""
    rng = np.random.default_rng(seed)
    state = {}
    for name, cin, cout, k in CONV_SPECS:
        fan_in = cin * k[0] * k[1]
        state[f"{name}.conv.weight"] = (
            rng.standard_normal((cout, cin, *k)) / np.sqrt(fan_in)
        ).astype(np.float32)
        state[f"{name}.bn.weight"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)
        state[f"{name}.bn.bias"] = (rng.standard_normal(cout) * 0.1).astype(np.float32)
        state[f"{name}.bn.running_mean"] = (
            rng.standard_normal(cout) * 0.1).astype(np.float32)
        state[f"{name}.bn.running_var"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)
    state["fc.weight"] = (rng.standard_normal((num_classes, FEATURE_DIM))
                          / np.sqrt(FEATURE_DIM)).astype(np.float32)
    state["fc.bias"] = np.zeros(num_classes, np.float32)
    return state


def load_torch_checkpoint(path: str) -> dict:
    """Load .pth (torch.load) or .safetensors Inception weights."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return params_from_torch_state(load_file(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return params_from_torch_state(obj)


# ---------------------------------------------------------------------------
# Ops
# ---------------------------------------------------------------------------

def _conv_bn(p, x, stride=1, padding=(0, 0)):
    kh, kw = p["w"].shape[0], p["w"].shape[1]
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape,
                                        ("NHWC", "HWIO", "NHWC"))
    pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    y = jax.lax.conv_general_dilated(x, p["w"], (stride, stride), pad,
                                     dimension_numbers=dn)
    y = y * p["scale"] + p["shift"]
    return jax.nn.relu(y)


def _max_pool(x, k=3, s=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])


def _avg_pool_3x3_s1(x):
    """3x3 stride-1 pad-1 average pooling with count_include_pad=False
    (the pytorch-fid InceptionA/C/E patch)."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    return summed / counts


def resize_bilinear_no_aa(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Plain half-pixel bilinear resize WITHOUT antialiasing — matches torch
    ``F.interpolate(mode='bilinear', align_corners=False)``, which is what
    pytorch-fid/torchmetrics apply before Inception.  x is NHWC."""
    n, h, w, c = x.shape
    oh, ow = size

    def axis_weights(in_len, out_len):
        pos = (np.arange(out_len) + 0.5) * (in_len / out_len) - 0.5
        lo = np.floor(pos).astype(np.int64)
        t = (pos - lo).astype(np.float32)
        lo0 = np.clip(lo, 0, in_len - 1)
        lo1 = np.clip(lo + 1, 0, in_len - 1)
        return lo0, lo1, t

    y0, y1, ty = axis_weights(h, oh)
    x0, x1, tx = axis_weights(w, ow)
    ty = jnp.asarray(ty)[None, :, None, None]
    tx = jnp.asarray(tx)[None, None, :, None]
    rows0 = x[:, y0]
    rows1 = x[:, y1]
    rows = rows0 * (1 - ty) + rows1 * ty
    cols0 = rows[:, :, x0]
    cols1 = rows[:, :, x1]
    return cols0 * (1 - tx) + cols1 * tx


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _block_a(p, name, x):
    b1 = _conv_bn(p[f"{name}.branch1x1"], x)
    b5 = _conv_bn(p[f"{name}.branch5x5_1"], x)
    b5 = _conv_bn(p[f"{name}.branch5x5_2"], b5, padding=(2, 2))
    bd = _conv_bn(p[f"{name}.branch3x3dbl_1"], x)
    bd = _conv_bn(p[f"{name}.branch3x3dbl_2"], bd, padding=(1, 1))
    bd = _conv_bn(p[f"{name}.branch3x3dbl_3"], bd, padding=(1, 1))
    bp = _conv_bn(p[f"{name}.branch_pool"], _avg_pool_3x3_s1(x))
    return jnp.concatenate([b1, b5, bd, bp], axis=-1)


def _block_b(p, x):
    b3 = _conv_bn(p["Mixed_6a.branch3x3"], x, stride=2)
    bd = _conv_bn(p["Mixed_6a.branch3x3dbl_1"], x)
    bd = _conv_bn(p["Mixed_6a.branch3x3dbl_2"], bd, padding=(1, 1))
    bd = _conv_bn(p["Mixed_6a.branch3x3dbl_3"], bd, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _block_c(p, name, x):
    b1 = _conv_bn(p[f"{name}.branch1x1"], x)
    b7 = _conv_bn(p[f"{name}.branch7x7_1"], x)
    b7 = _conv_bn(p[f"{name}.branch7x7_2"], b7, padding=(0, 3))
    b7 = _conv_bn(p[f"{name}.branch7x7_3"], b7, padding=(3, 0))
    bd = _conv_bn(p[f"{name}.branch7x7dbl_1"], x)
    bd = _conv_bn(p[f"{name}.branch7x7dbl_2"], bd, padding=(3, 0))
    bd = _conv_bn(p[f"{name}.branch7x7dbl_3"], bd, padding=(0, 3))
    bd = _conv_bn(p[f"{name}.branch7x7dbl_4"], bd, padding=(3, 0))
    bd = _conv_bn(p[f"{name}.branch7x7dbl_5"], bd, padding=(0, 3))
    bp = _conv_bn(p[f"{name}.branch_pool"], _avg_pool_3x3_s1(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(p, x):
    b3 = _conv_bn(p["Mixed_7a.branch3x3_1"], x)
    b3 = _conv_bn(p["Mixed_7a.branch3x3_2"], b3, stride=2)
    b7 = _conv_bn(p["Mixed_7a.branch7x7x3_1"], x)
    b7 = _conv_bn(p["Mixed_7a.branch7x7x3_2"], b7, padding=(0, 3))
    b7 = _conv_bn(p["Mixed_7a.branch7x7x3_3"], b7, padding=(3, 0))
    b7 = _conv_bn(p["Mixed_7a.branch7x7x3_4"], b7, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _block_e(p, name, x, pool: str):
    b1 = _conv_bn(p[f"{name}.branch1x1"], x)
    b3 = _conv_bn(p[f"{name}.branch3x3_1"], x)
    b3 = jnp.concatenate([
        _conv_bn(p[f"{name}.branch3x3_2a"], b3, padding=(0, 1)),
        _conv_bn(p[f"{name}.branch3x3_2b"], b3, padding=(1, 0)),
    ], axis=-1)
    bd = _conv_bn(p[f"{name}.branch3x3dbl_1"], x)
    bd = _conv_bn(p[f"{name}.branch3x3dbl_2"], bd, padding=(1, 1))
    bd = jnp.concatenate([
        _conv_bn(p[f"{name}.branch3x3dbl_3a"], bd, padding=(0, 1)),
        _conv_bn(p[f"{name}.branch3x3dbl_3b"], bd, padding=(1, 0)),
    ], axis=-1)
    if pool == "max":
        # FID variant: Mixed_7c pools with MAX (pytorch-fid FIDInceptionE_2)
        pooled = _max_pool(x, k=3, s=1, pad=1)
    else:
        pooled = _avg_pool_3x3_s1(x)
    bp = _conv_bn(p[f"{name}.branch_pool"], pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def apply(params: dict, x: jnp.ndarray, return_logits: bool = False):
    """x: (B, 299, 299, 3) in [-1, 1] -> (B, 2048) pool3 features."""
    for entry in STEM:
        if entry[0] == "maxpool":
            x = _max_pool(x)
        else:
            name, _cin, _cout, _k, stride, pad = entry
            x = _conv_bn(params[name], x, stride=stride, padding=pad)
    for name, _cin, _pf in A_BLOCKS:
        x = _block_a(params, name, x)
    x = _block_b(params, x)
    for name, _c7 in C_BLOCKS:
        x = _block_c(params, name, x)
    x = _block_d(params, x)
    x = _block_e(params, "Mixed_7b", x, pool="avg")
    x = _block_e(params, "Mixed_7c", x, pool="max")
    feats = x.mean(axis=(1, 2))  # global average pool -> (B, 2048)
    if return_logits and "fc" in params:
        return feats, feats @ params["fc"]["w"] + params["fc"]["b"]
    return feats


def preprocess(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) in [0, 255] or [0, 1] -> (B, 299, 299, 3) in [-1, 1]."""
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 3:
        x = x[..., None]
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    # [0,255] inputs (the reference's normalize_terrain path) -> [0,1]
    scale_255 = jnp.max(jnp.abs(x)) > 2.0
    x = jnp.where(scale_255, x / 255.0, x)
    x = resize_bilinear_no_aa(x, (299, 299))
    return x * 2.0 - 1.0


def make_feature_fn(params: dict):
    """feature_fn for evaluation.metrics.compute_fid/compute_kid."""
    def fn(x):
        return apply(params, preprocess(x))

    return fn


@functools.lru_cache(maxsize=1)
def _cached_params(path: str):
    return load_torch_checkpoint(path)


def inception_feature_fn(weights_path: str):
    """Feature fn bound to a weights file (cached across calls)."""
    return make_feature_fn(_cached_params(weights_path))
