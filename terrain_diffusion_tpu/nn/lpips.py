"""LPIPS perceptual distance (AlexNet variant) in JAX/NHWC.

Replaces the reference VAE trainer's ``lpips.LPIPS(net='alex',
spatial=True)`` (`training/trainers/autoencoder.py:37,98-123`).  Faithful
re-implementation of the lpips package's forward: input scaling layer,
torchvision-AlexNet feature taps after each ReLU, channel-unit-normalized
squared differences, learned non-negative 1x1 linear heads, bilinear
upsample of each spatial map to input size, sum over taps.

Pretrained weights (torchvision AlexNet + lpips linear heads) are not
bundled (offline build).  Load them with :func:`params_from_torch_state`
from a merged state dict, or :func:`load_torch_checkpoint` from .pth /
safetensors files; without weights the trainer falls back to the
multi-scale gradient surrogate.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# lpips ScalingLayer constants (lpips/lpips.py)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision alexnet.features conv layers: (torch_index, in, out, k, stride, pad)
ALEX_CONVS = [
    (0, 3, 64, 11, 4, 2),
    (3, 64, 192, 5, 1, 2),
    (6, 192, 384, 3, 1, 1),
    (8, 384, 256, 3, 1, 1),
    (10, 256, 256, 3, 1, 1),
]
TAP_CHANNELS = [64, 192, 384, 256, 256]
EPS = 1e-10


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def params_from_torch_state(state: dict) -> dict:
    """Build the param tree from torch tensors/arrays.

    Backbone keys: torchvision naming ``features.{i}.weight/bias`` (also
    accepts the lpips package's ``net.slice*``-flattened equivalent if the
    caller re-keys it).  Linear heads: ``lin{k}.model.1.weight`` (lpips
    package) or ``lin{k}.weight``.
    """
    def arr(k):
        v = state[k]
        return np.asarray(v.detach().numpy() if hasattr(v, "detach") else v,
                          np.float32)

    params = {"convs": [], "lins": []}
    for i, (ti, _cin, _cout, _k, _s, _p) in enumerate(ALEX_CONVS):
        w = np.transpose(arr(f"features.{ti}.weight"), (2, 3, 1, 0))  # HWIO
        b = arr(f"features.{ti}.bias")
        params["convs"].append({"w": jnp.asarray(w), "b": jnp.asarray(b)})
    for k in range(5):
        key = (f"lin{k}.model.1.weight" if f"lin{k}.model.1.weight" in state
               else f"lin{k}.weight")
        w = arr(key).reshape(-1)  # (1, C, 1, 1) -> (C,)
        params["lins"].append(jnp.asarray(w))
    return params


def random_torch_state(seed: int = 0) -> dict:
    """Torch-style random state dict (tests / shape reference)."""
    rng = np.random.default_rng(seed)
    state = {}
    for ti, cin, cout, k, _s, _p in ALEX_CONVS:
        fan = cin * k * k
        state[f"features.{ti}.weight"] = (
            rng.standard_normal((cout, cin, k, k)) / np.sqrt(fan)).astype(np.float32)
        state[f"features.{ti}.bias"] = (
            rng.standard_normal(cout) * 0.1).astype(np.float32)
    for k in range(5):
        state[f"lin{k}.model.1.weight"] = np.abs(
            rng.standard_normal((1, TAP_CHANNELS[k], 1, 1))).astype(np.float32)
    return state


def load_torch_checkpoint(backbone_path: str, lins_path: str | None = None) -> dict:
    """Load weights from .pth/.safetensors file(s); lpips 'lin' heads may
    live in a separate file (the lpips pip package ships only those)."""
    def load(path):
        if path.endswith(".safetensors"):
            from safetensors.numpy import load_file

            return dict(load_file(path))
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(obj, dict) and "state_dict" in obj:
            obj = obj["state_dict"]
        return dict(obj)

    state = load(backbone_path)
    if lins_path:
        state.update(load(lins_path))
    # accept lpips-package keying: "net.features.<i>.*" (torchvision dump)
    # or "net.slice<k>.<i>.*" — the lpips package registers each torchvision
    # layer under its ORIGINAL index inside sliceN, so dropping the sliceN
    # segment recovers "features.<i>.*"
    rekeyed = {}
    for k, v in state.items():
        if k.startswith("net.features"):
            k = k[len("net."):]
        elif k.startswith("net.slice"):
            idx_and_rest = k.split(".", 2)[2]  # "<i>.weight" etc.
            k = "features." + idx_and_rest
        rekeyed[k] = v
    return params_from_torch_state(rekeyed)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _conv(p, x, stride, pad):
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, p["w"], (stride, stride),
                                     [(pad, pad), (pad, pad)],
                                     dimension_numbers=dn)
    return y + p["b"]


def _max_pool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1),
                                 [(0, 0), (0, 0), (0, 0), (0, 0)])


def _alex_taps(params, x):
    """x (B,H,W,3) in [-1,1] -> 5 post-ReLU feature taps."""
    x = (x - _SHIFT) / _SCALE
    taps = []
    h = jax.nn.relu(_conv(params["convs"][0], x, 4, 2))
    taps.append(h)
    h = _max_pool(h)
    h = jax.nn.relu(_conv(params["convs"][1], h, 1, 2))
    taps.append(h)
    h = _max_pool(h)
    h = jax.nn.relu(_conv(params["convs"][2], h, 1, 1))
    taps.append(h)
    h = jax.nn.relu(_conv(params["convs"][3], h, 1, 1))
    taps.append(h)
    h = jax.nn.relu(_conv(params["convs"][4], h, 1, 1))
    taps.append(h)
    return taps


def _unit_normalize(x):
    return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + EPS)


def _upsample_bilinear(x, size):
    """torch nn.Upsample(mode='bilinear', align_corners=False) equivalence
    (upsampling only, so antialiasing is moot)."""
    from terrain_diffusion_tpu.evaluation.inception import resize_bilinear_no_aa

    return resize_bilinear_no_aa(x, size)


def lpips_distance(params: dict, x0, x1, spatial: bool = True):
    """LPIPS(x0, x1): (B, H, W, 1) map when spatial else (B,) scalars.

    Inputs are NHWC, 3 channels, scaled to [-1, 1] (lpips convention)."""
    t0 = _alex_taps(params, x0)
    t1 = _alex_taps(params, x1)
    h, w = x0.shape[1], x0.shape[2]
    total = None
    for k, (f0, f1) in enumerate(zip(t0, t1)):
        d = jnp.square(_unit_normalize(f0) - _unit_normalize(f1))
        v = jnp.sum(d * params["lins"][k], axis=-1, keepdims=True)  # 1x1 conv
        if spatial:
            v = _upsample_bilinear(v, (h, w))
        else:
            v = v.mean(axis=(1, 2), keepdims=True)
        total = v if total is None else total + v
    return total if spatial else total.reshape(-1)


def make_perceptual_fn(params: dict):
    """perceptual_fn(recon, target) for the VAE trainer — replicates the
    reference's pre-normalization exactly (`trainers/autoencoder.py:98-123`):
    per-image [-1,1] range normalization from the REFERENCE image's min/max,
    clamp of the reconstruction, grayscale->3ch repeat, spatial LPIPS mean."""
    def fn(recon, target):
        ref_min = jnp.min(target, axis=(1, 2, 3), keepdims=True)
        ref_max = jnp.max(target, axis=(1, 2, 3), keepdims=True)
        ref_range = jnp.maximum((ref_max - ref_min) * 1.1, 0.1)
        ref_center = (ref_min + ref_max) / 2
        n_ref = (target - ref_center) / ref_range * 2
        n_rec = jnp.clip((recon - ref_center) / ref_range * 2, -1, 1)
        n_ref3 = jnp.repeat(n_ref[..., :1], 3, axis=-1)
        n_rec3 = jnp.repeat(n_rec[..., :1], 3, axis=-1)
        return lpips_distance(params, n_ref3, n_rec3, spatial=True).mean()

    return fn
