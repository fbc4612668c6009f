"""Evaluation: metrics sanity (fast) + tiled samplers smoke (slow)."""
import numpy as np
import pytest

import jax

from terrain_diffusion_tpu.evaluation import tile_starts
from terrain_diffusion_tpu.evaluation.metrics import (
    compute_fid,
    compute_kid,
    frechet_distance,
    kid,
    normalize_terrain_for_metric,
    terrain_features,
)


def test_tile_starts():
    assert tile_starts(512, 512, 384) == [0]
    assert tile_starts(1024, 512, 384) == [0, 384, 512]
    assert tile_starts(100, 512, 384) == [0]


def test_kid_and_fid_discriminate(rng):
    a = rng.standard_normal((200, 16))
    b = rng.standard_normal((200, 16))
    c = rng.standard_normal((200, 16)) + 3.0
    k_same, _ = kid(a, b, n_subsets=20, subset_size=100)
    k_diff, _ = kid(a, c, n_subsets=20, subset_size=100)
    assert k_diff > k_same * 10 + 0.01
    assert frechet_distance(a, c) > frechet_distance(a, b) * 5


def test_terrain_features_and_metrics(rng):
    flat = rng.standard_normal((32, 32, 32, 1)).astype(np.float32) * 5
    import scipy.ndimage as ndi

    smooth = np.stack([ndi.gaussian_filter(x[..., 0], 4)[..., None] * 5
                       for x in flat])
    feats = np.asarray(terrain_features(flat[:4]))
    assert feats.shape[0] == 4 and np.isfinite(feats).all()
    k_same, _ = compute_kid(flat[:16], flat[16:], n_subsets=10, subset_size=16)
    k_diff, _ = compute_kid(flat[:16], smooth[:16], n_subsets=10, subset_size=16)
    assert k_diff > k_same
    assert compute_fid(flat[:16], smooth[:16]) > compute_fid(flat[:16], flat[16:])


def test_normalize_terrain_for_metric(rng):
    t = rng.standard_normal((4, 8, 8, 1)) * 1000
    n = normalize_terrain_for_metric(t)
    assert n.min() >= 0 and n.max() <= 255


@pytest.mark.slow
def test_tiled_samplers_smoke():
    from helpers import tiny_models

    from terrain_diffusion_tpu.evaluation.samplers import (
        cond_inputs_from_snr,
        process_cond_img,
        sample_base_consistency,
        sample_base_diffusion,
        sample_coarse_tiled,
        sample_decoder_consistency_tiled,
    )

    (coarse, pc), (base, pb), (dec, pd) = tiny_models(decoder_tile=64)
    key = jax.random.key(0)
    rng = np.random.default_rng(0)

    cond_vec = [np.zeros((2, 58), np.float32)]
    out = sample_base_diffusion(base, pb, (2, 64, 64, 5), cond_vec, key=key,
                                steps=3)
    assert out.shape == (2, 64, 64, 5) and np.isfinite(np.asarray(out)).all()

    cond_img = rng.standard_normal((1, 7, 6, 6)).astype(np.float32)
    means = np.zeros(7, np.float32)
    stds = np.ones(7, np.float32)
    vec = process_cond_img(cond_img[:, :, :4, :4], np.zeros(5), means, stds)
    assert vec.shape == (1, 58)

    tiled = sample_base_consistency(
        base, pb, (1, 96, 96, 5), cond_img, key=key,
        inter_t=0.6, tile_size=64, cond_means=means, cond_stds=stds,
        histogram_raw=np.zeros(5))
    assert tiled.shape == (1, 96, 96, 5)
    assert np.isfinite(np.asarray(tiled)).all()

    lat = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    res = sample_decoder_consistency_tiled(dec, pd, lat, key=key,
                                           tile_size=64, stride=48)
    assert res.shape == (1, 64, 64, 1)

    scalars, t = cond_inputs_from_snr([0.3, 0.1, 1.0, 0.1, 1.0], batch=1)
    assert len(scalars) == 5 and t.shape == (5,)
    cond_map = rng.standard_normal((1, 64, 64, 5)).astype(np.float32)
    cm = sample_coarse_tiled(coarse, pc, cond_map, [0.3, 0.1, 1.0, 0.1, 1.0],
                             key=key, steps=2)
    assert cm.shape == (1, 64, 64, 6)
    assert np.isfinite(np.asarray(cm)).all()
