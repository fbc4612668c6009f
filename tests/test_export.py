"""StableHLO export round trip (tiny model)."""
import json
import os

import numpy as np
import pytest

import jax

from helpers import tiny_models

pytestmark = pytest.mark.slow


def test_export_roundtrip(tmp_path):
    from terrain_diffusion_tpu.export.stablehlo_export import export_unet
    from terrain_diffusion_tpu.nn import torch_compat

    (coarse, pc), _, _ = tiny_models()
    out = str(tmp_path / "coarse.stablehlo")
    entry = export_unet(coarse, pc, batch_size=1, spatial=64, in_channels=11,
                        cond_specs=[(1,)] * 5, out_path=out, verify=True)
    assert entry["verified"]
    assert os.path.getsize(out) > 1000

    # deserialized module produces identical outputs
    from jax import export as jexport

    blob = open(out, "rb").read()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 11)).astype(np.float32)
    nl = np.asarray([0.5], np.float32)
    conds = [np.asarray([0.1], np.float32)] * 5
    got = jexport.deserialize(blob).call(x, nl, *conds)
    want = coarse.apply(pc, x, nl, list(conds))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
