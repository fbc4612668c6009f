"""Golden regression tests: frozen numeric outputs for the core compute
paths (seeded tiny model forward, scheduler trajectory, noise fields).

Guards numerics across refactors (e.g., kernel fusion work): regenerate with
`python tests/test_golden.py regen` ONLY when a change is intentional.
"""
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "golden_values.npz")


def _compute_goldens() -> dict:
    from helpers import tiny_models

    from terrain_diffusion_tpu.ops.noise_field import threefry_noise_patch
    from terrain_diffusion_tpu.scheduler import (EDMSchedulerConfig,
                                                 compute_sigmas, sample_dpm)

    out = {}
    # threefry field crop (device-independent by design)
    out["threefry_16"] = np.asarray(threefry_noise_patch(
        99, -5, 3, h=16, w=16, channels=2, tile_h=16, tile_w=16))

    # scheduler trajectory on a fixed nonlinear model
    cfg = EDMSchedulerConfig()
    x0 = np.asarray(threefry_noise_patch(
        1, 0, 0, h=8, w=8, channels=1, tile_h=8, tile_w=8)) * float(
            compute_sigmas(cfg, 10)[0])
    out["dpm_10step"] = np.asarray(sample_dpm(
        lambda x, s: jnp.tanh(x * 1.3), jnp.asarray(x0), cfg, 10))

    # tiny base model forward with seeded weights
    (_, _), (base, pb), (_, _) = tiny_models()
    x = np.asarray(threefry_noise_patch(
        2, 0, 0, h=64, w=64, channels=5, tile_h=64, tile_w=64))
    x = np.moveaxis(x, 0, -1)[None]
    cond = np.asarray(threefry_noise_patch(
        3, 0, 0, h=1, w=58, channels=1, tile_h=1, tile_w=64))[0]
    fwd = base.apply(pb, jnp.asarray(x), jnp.asarray([0.7]),
                     [jnp.asarray(cond)])
    out["base_fwd"] = np.asarray(fwd)
    return out


def test_goldens_match():
    assert os.path.exists(GOLDEN_PATH), \
        "golden file missing; run `python tests/test_golden.py regen`"
    want = np.load(GOLDEN_PATH)
    got = _compute_goldens()
    for k in want.files:
        np.testing.assert_allclose(
            got[k], want[k], rtol=5e-4, atol=5e-5,
            err_msg=f"golden mismatch for {k!r} — numerics changed")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        np.savez_compressed(GOLDEN_PATH, **_compute_goldens())
        print(f"wrote {GOLDEN_PATH}")
