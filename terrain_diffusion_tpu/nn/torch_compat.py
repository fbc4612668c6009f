"""Weight compatibility with the reference's HF/diffusers checkpoints.

Maps the reference torch `state_dict` naming (EDMUnet2D / EDMAutoencoder,
`models/edm_unet.py` / `models/edm_autoencoder.py`) to/from this package's
param pytrees, transposing conv weights OIHW->HWIO and linear weights
(out,in)->(in,out).  Reads/writes `model.safetensors` (framework-agnostic
tensor container), so checkpoints published for the reference
(`common/model_utils.py:6-12` MODEL_PATHS) load without torch installed.
"""
from __future__ import annotations

import json
import os

import numpy as np

from terrain_diffusion_tpu.nn.edm_unet import EDMUnet2D, EDMUnetConfig
from terrain_diffusion_tpu.nn.edm_autoencoder import EDMAutoencoder, EDMAutoencoderConfig


def _to_jax_weight(name_is_linear: bool, arr: np.ndarray) -> np.ndarray:
    if arr.ndim == 4:  # OIHW -> HWIO
        return np.transpose(arr, (2, 3, 1, 0))
    if arr.ndim == 2 and name_is_linear:  # (out, in) -> (in, out)
        return np.transpose(arr, (1, 0))
    return arr


def _to_torch_weight(arr: np.ndarray, linear: bool) -> np.ndarray:
    # ascontiguousarray is LOAD-BEARING: safetensors.numpy serializes the
    # underlying buffer of a non-contiguous view as-is (strides ignored),
    # silently scrambling every transposed weight on disk — and for some
    # symmetric shapes the load-side inverse transpose happens to undo it,
    # which is how the bug evaded shape-symmetric round-trip tests
    if arr.ndim == 4:  # HWIO -> OIHW
        return np.ascontiguousarray(np.transpose(arr, (3, 2, 0, 1)))
    if arr.ndim == 2 and linear:
        return np.ascontiguousarray(np.transpose(arr, (1, 0)))
    return np.ascontiguousarray(arr)


def _unet_name_map(model: EDMUnet2D):
    """(torch_name, tree_path, is_linear) triples for an EDMUnet2D."""
    cfg = model.config
    out = []
    if model.noise_dims > 0:
        out.append(("noise_fourier.freqs", ("noise_fourier", "freqs"), False))
        if cfg.fourier_scale != "pos":
            out.append(("noise_fourier.phases", ("noise_fourier", "phases"), False))
        out.append(("noise_linear.weight", ("noise_linear", "w"), True))
    for i, (typ, _x, _w) in enumerate(cfg.conditional_inputs):
        base = f"conditional_layers.{i}"
        tp = ("conditional_layers", str(i))
        if typ == "float":
            out.append((f"{base}.0.freqs", tp + ("fourier", "freqs"), False))
            out.append((f"{base}.0.phases", tp + ("fourier", "phases"), False))
            out.append((f"{base}.1.weight", tp + ("linear", "w"), True))
        elif typ == "tensor":
            out.append((f"{base}.weight", tp + ("linear", "w"), True))
        else:  # embedding: torch nn-style (num, dim), same layout
            out.append((f"{base}.weight", tp + ("embed", "w"), False))
    if not cfg.disable_out_gain:
        out.append(("out_gain", ("out_gain",), False))

    def block_entries(prefix, tree_prefix, opts, cin, cout):
        entries = [(f"{prefix}.emb_gain", tree_prefix + ("emb_gain",), False)]
        merged = {**cfg.block_kwargs, **opts}
        if (merged.get("resample_type") == "conv"
                and merged.get("resample_mode", "keep") != "keep"):
            # MPConvResample: torch down (O,I,kh,kw) / up (I,O,kh,kw) both map
            # via the standard (2,3,1,0) transpose to our HWIO / HWOI layouts
            entries.append((f"{prefix}.resample.weight",
                            tree_prefix + ("resample", "w"), False))
        conv_type = merged.get("conv_type", "default")
        if conv_type == "mobile":
            entries.append((f"{prefix}.conv_res0.0.weight", tree_prefix + ("conv_res0_pw", "w"), False))
            entries.append((f"{prefix}.conv_res0.1.weight", tree_prefix + ("conv_res0_dw", "w"), False))
        else:
            entries.append((f"{prefix}.conv_res0.weight", tree_prefix + ("conv_res0", "w"), False))
        if model.emb_ch > 0:
            entries.append((f"{prefix}.emb_linear.weight", tree_prefix + ("emb_linear", "w"), True))
        entries.append((f"{prefix}.conv_res1.weight", tree_prefix + ("conv_res1", "w"), False))
        if cin != cout:
            entries.append((f"{prefix}.conv_skip.weight", tree_prefix + ("conv_skip", "w"), False))
        cph = merged.get("channels_per_head", 64)
        if merged.get("attention") and cout // cph > 0:
            entries.append((f"{prefix}.attn_qkv.weight", tree_prefix + ("attn_qkv", "w"), False))
            entries.append((f"{prefix}.attn_proj.weight", tree_prefix + ("attn_proj", "w"), False))
        return entries

    for name, kind, cin, cout, opts in model.enc_plan:
        if kind == "conv":
            out.append((f"enc.{name}.weight", ("enc", name, "w"), False))
        else:
            out.extend(block_entries(f"enc.{name}", ("enc", name), opts, cin, cout))
    for name, kind, cin, cout, opts in model.dec_plan:
        out.extend(block_entries(f"dec.{name}", ("dec", name), opts, cin, cout))
    out.append(("out_conv.weight", ("out_conv", "w"), False))
    out.append(("logvar_fourier.freqs", ("logvar_fourier", "freqs"), False))
    out.append(("logvar_fourier.phases", ("logvar_fourier", "phases"), False))
    out.append(("logvar_linear.weight", ("logvar_linear", "w"), True))
    return out


def _autoencoder_name_map(model: EDMAutoencoder):
    out = []
    for tname, tpath, lin in _unet_name_map(model.encoder):
        out.append((f"encoder.{tname}", ("encoder",) + tpath, lin))
    out.append(("decoder_conv.weight", ("decoder_conv", "w"), False))
    cfg = model.config
    for idx, (name, cin, cout, opts) in enumerate(model.decoder_plan):
        prefix = f"decoder.{idx}"
        tp = ("decoder", name)
        merged = {**cfg.block_kwargs, **opts}
        out.append((f"{prefix}.emb_gain", tp + ("emb_gain",), False))
        if (merged.get("resample_type") == "conv"
                and merged.get("resample_mode", "keep") != "keep"):
            # learned resampling params must round-trip or a saved conv-
            # resample autoencoder silently loses them (falls back to
            # parameter-free nearest resampling on load)
            out.append((f"{prefix}.resample.weight",
                        tp + ("resample", "w"), False))
        if merged.get("conv_type", "default") == "mobile":
            out.append((f"{prefix}.conv_res0.0.weight",
                        tp + ("conv_res0_pw", "w"), False))
            out.append((f"{prefix}.conv_res0.1.weight",
                        tp + ("conv_res0_dw", "w"), False))
        else:
            out.append((f"{prefix}.conv_res0.weight", tp + ("conv_res0", "w"), False))
        out.append((f"{prefix}.conv_res1.weight", tp + ("conv_res1", "w"), False))
        if cin != cout:
            out.append((f"{prefix}.conv_skip.weight", tp + ("conv_skip", "w"), False))
        if merged.get("attention") and cout // merged.get("channels_per_head", 64) > 0:
            out.append((f"{prefix}.attn_qkv.weight", tp + ("attn_qkv", "w"), False))
            out.append((f"{prefix}.attn_proj.weight", tp + ("attn_proj", "w"), False))
    out.append(("out_conv.weight", ("out_conv", "w"), False))
    out.append(("out_gain", ("out_gain",), False))
    out.append(("logvar", ("logvar",), False))
    return out


def _perceptron_name_map(model):
    """torch naming for the reference Perceptron (models/perceptron.py):
    nn.Sequential indices advance past each hidden activation (and Dropout
    when configured), so the Linear at layer i sits at a computed offset."""
    cfg = model.config
    out = []
    n_layers = len(model.dims) - 1
    for k in range(cfg.random_ensembles):
        pos = 0
        for i in range(n_layers):
            base = f"nets.{k}.{pos}"
            out.append((f"{base}.weight", (f"net{k}", f"l{i}", "w"), True))
            if cfg.bias:
                out.append((f"{base}.bias", (f"net{k}", f"l{i}", "b"), False))
            pos += 1
            if i < n_layers - 1:
                pos += 1  # activation module
                if cfg.dropout:
                    pos += 1  # nn.Dropout
    return out


def _name_map(model):
    if isinstance(model, EDMAutoencoder):
        return _autoencoder_name_map(model)
    from terrain_diffusion_tpu.nn.perceptron import Perceptron
    if isinstance(model, Perceptron):
        return _perceptron_name_map(model)
    return _unet_name_map(model)


def _tree_set(tree: dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _tree_get(tree: dict, path):
    node = tree
    for k in path:
        node = node[k]
    return node


def params_from_torch_state(model, state: dict) -> dict:
    """Build a param pytree from a torch-naming tensor dict (numpy values)."""
    import jax.numpy as jnp

    tree: dict = {}
    mapping = _name_map(model)
    mapped = set()
    for tname, tpath, lin in mapping:
        if tname not in state:
            raise KeyError(f"checkpoint missing tensor {tname!r}")
        arr = np.asarray(state[tname], dtype=np.float32)
        _tree_set(tree, tpath, jnp.asarray(_to_jax_weight(lin, arr)))
        mapped.add(tname)
    extra = set(state) - mapped
    if extra:
        raise KeyError(f"unmapped checkpoint tensors: {sorted(extra)[:8]}...")
    return tree


def params_to_torch_state(model, params: dict) -> dict:
    """Export a param pytree as a torch-naming numpy dict."""
    state = {}
    for tname, tpath, lin in _name_map(model):
        arr = np.asarray(_tree_get(params, tpath), dtype=np.float32)
        state[tname] = _to_torch_weight(arr, lin)
    return state


def load_model(path: str):
    """Load (model, params) from a reference-format directory
    (config.json + model.safetensors)."""
    from safetensors.numpy import load_file

    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    cls_name = cfg.get("_class_name", "EDMUnet2D")
    if cls_name == "EDMAutoencoder":
        model = EDMAutoencoder(EDMAutoencoderConfig.from_dict(cfg))
    elif cls_name == "Perceptron":
        from terrain_diffusion_tpu.nn.perceptron import (Perceptron,
                                                         PerceptronConfig)
        model = Perceptron(PerceptronConfig.from_dict(cfg))
    else:
        model = EDMUnet2D(EDMUnetConfig.from_dict(cfg))
    state = load_file(os.path.join(path, "model.safetensors"))
    return model, params_from_torch_state(model, state)


def save_model(model, params: dict, path: str):
    """Save (model, params) in the reference directory format."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    model.save_config(path)
    save_file(params_to_torch_state(model, params), os.path.join(path, "model.safetensors"))
