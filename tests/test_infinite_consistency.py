"""InfiniteDiffusion eval: real side comes from real DEM residual data
(VERDICT r2 weak #2 / next-round item 3), and the blend-vs-naive tiling
ablation discriminates with that real side."""
import numpy as np
import pytest

import jax

from terrain_diffusion_tpu.training.datasets import H5LatentsDataset

CANVAS = 128  # latent px; ground truth = 1024 px


@pytest.fixture(scope="module")
def h5_eval_fixture(tmp_path_factory):
    """Latents fixture large enough for a 128-latent-px eval canvas, with a
    structured (non-noise) residual so real terrain is distinguishable."""
    import h5py

    path = str(tmp_path_factory.mktemp("data") / "eval.h5")
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:1024, 0:1024]
    with h5py.File(path, "w") as f:
        for chunk in range(2):
            g = f.create_group(f"90/{chunk}/0")
            lat = rng.standard_normal((8, 8, 128, 128)).astype(np.float16)
            d = g.create_dataset("latent", data=lat)
            d.attrs["pct_land"] = 0.5
            d.attrs["split"] = "val"
            g.create_dataset("lowfreq", data=rng.standard_normal(
                (128, 128)).astype(np.float32) * 38 - 31)
            g.create_dataset("lowres_exact", data=rng.standard_normal(
                (128, 128)).astype(np.float32) * 100)
            g.create_dataset("climate", data=rng.standard_normal(
                (19, 128, 128)).astype(np.float32))
            # smooth hills + mild noise, in signed-sqrt space; +-12 so the
            # decoded-meters range exceeds the metric's 255 normalization
            # floor and the real side keeps visible structure
            res = (np.sin(yy / 37.0 + chunk) * np.cos(xx / 53.0) * 12.0
                   + rng.standard_normal((1024, 1024)) * 0.1).astype(np.float32)
            r = g.create_dataset("residual", data=res)
            r.attrs["pct_land"] = 0.5
            r.attrs["split"] = "val"
            g.attrs["beauty_score"] = 3.0
    return path


def _ds_kwargs(h5_file, crop=CANVAS):
    return dict(
        h5_file=h5_file, crop_size=crop, pct_land_ranges=[[0, 1]],
        subset_resolutions=[90], subset_weights=[1.0],
        latents_mean=[0, 0, 0, 0], latents_std=[1, 1, 1, 1],
        clip_edges=False,
        cond_input_mean=[0, 0, 0, 0, 0, 0, 0.5],
        cond_input_std=[1, 1, 1, 1, 1, 1, 0.5])


def test_ground_truth_is_real_residual_at_output_resolution(h5_eval_fixture):
    """`val_dset=True` items carry ground_truth = laplacian-decoded RAW
    residual data at x8 the latent crop — not a latent-channel fabrication."""
    import h5py

    from terrain_diffusion_tpu.ops.laplacian import laplacian_decode

    ds = H5LatentsDataset(**_ds_kwargs(h5_eval_fixture), split="val",
                          val_dset=True, eval_dataset=True)
    item = ds[0]
    gt = item["ground_truth"]
    assert gt.shape == (CANVAS * 8, CANVAS * 8, 1)
    assert np.isfinite(gt).all()

    # recompute expected from the file (eval_dataset=True -> centered crop,
    # identity transform; clip_edges=False -> extrapolated decode)
    with h5py.File(h5_eval_fixture, "r") as f:
        g = f[item["path"]]
        res = np.asarray(g["residual"][:CANVAS * 8, :CANVAS * 8], np.float32)
        lf = np.asarray(g["lowfreq"][:CANVAS, :CANVAS], np.float32)
    want = np.asarray(laplacian_decode(res[None], lf[None], extrapolate=True))
    np.testing.assert_allclose(gt[..., 0], want[0], rtol=1e-5, atol=1e-4)

    # and it is NOT the old fabrication (tiled first latent channel)
    fabricated = np.resize(item["image"][..., :1], gt.shape)
    assert not np.allclose(gt, fabricated)


def test_real_terrain_batch_requires_ground_truth(h5_eval_fixture):
    from terrain_diffusion_tpu.evaluation.infinite_consistency import (
        real_terrain_batch,
    )

    ds = H5LatentsDataset(**_ds_kwargs(h5_eval_fixture), split="val",
                          val_dset=True, eval_dataset=True)
    item = ds[0]
    out = real_terrain_batch([item], 512)
    assert out.shape == (1, 512, 512, 1)
    # meters = signed square of the signed-sqrt ground truth, central crop
    gt = item["ground_truth"]
    y0 = (gt.shape[0] - 512) // 2
    expect = np.sign(gt) * np.square(gt)
    np.testing.assert_allclose(
        out[0], expect[y0:y0 + 512, y0:y0 + 512, :1], rtol=1e-6)

    with pytest.raises(ValueError, match="ground_truth"):
        real_terrain_batch([{"image": gt}], 512)
    with pytest.raises(ValueError, match="smaller"):
        real_terrain_batch([item], CANVAS * 8 + 64)


def test_eval_passes_identity_cond_stats(h5_eval_fixture, tmp_path,
                                          monkeypatch):
    """evaluate() must hand generate_samples IDENTITY normalization stats:
    the dataset already standardized cond_inputs_img, so re-applying the
    dataset's raw-scale mean/std would double-normalize the conditioning
    (the reference passes zeros/ones into _process_cond_img the same way,
    infinite_consistency.py:221)."""
    from helpers import tiny_models

    from terrain_diffusion_tpu.evaluation import infinite_consistency as ic
    from terrain_diffusion_tpu.nn import torch_compat

    (_, _), (base, pb), (dec, pd) = tiny_models(decoder_tile=64)
    base_path = str(tmp_path / "base")
    dec_path = str(tmp_path / "dec")
    torch_compat.save_model(base, pb, base_path)
    torch_compat.save_model(dec, pd, dec_path)

    captured = {}
    gen_rng = np.random.default_rng(0)

    def fake_generate(bm, bp, dm, dp, cond_imgs, cond_means, cond_stds,
                      *, key, mode, canvas, crop, **kw):
        captured["means"] = np.asarray(cond_means)
        captured["stds"] = np.asarray(cond_stds)
        B = cond_imgs.shape[0]
        return gen_rng.standard_normal(
            (B, crop * 8, crop * 8, 1)).astype(np.float32)

    monkeypatch.setattr(ic, "generate_samples", fake_generate)
    kwargs = {**_ds_kwargs(h5_eval_fixture),
              # raw-scale stats: passing THESE through would shift every
              # cond vector by hundreds of (normalized) units
              "cond_input_mean": [500, 400, 15, 600, 800, 70, 0.5],
              "cond_input_std": [20, 20, 10, 450, 700, 35, 0.5],
              "split": "val"}
    kwargs.pop("crop_size")
    out = ic.evaluate(base_path, dec_path, kwargs, n_images=4, batch=4,
                      mode="blend", seed=0, canvas=CANVAS)
    assert out["n_images"] == 4
    np.testing.assert_array_equal(captured["means"], np.zeros(7))
    np.testing.assert_array_equal(captured["stds"], np.ones(7))


@pytest.mark.slow
def test_blend_beats_naive_kid_with_real_side(h5_eval_fixture, tmp_path):
    """The headline ablation (reference `evaluate.sh`): InfiniteDiffusion
    overlap blending must score better (lower KID) than naive independent
    tiles when judged against REAL residual-derived terrain."""
    from helpers import tiny_models

    from terrain_diffusion_tpu.evaluation.infinite_consistency import evaluate
    from terrain_diffusion_tpu.nn import torch_compat

    import jax.numpy as jnp

    (_, _), (base, pb), (dec, pd) = tiny_models(decoder_tile=64)
    # fresh init has out_gain=0 (zero output): tiles would be pure scaled
    # noise and naive seams statistically invisible.  A nonzero gain makes
    # each tile a structured random-convnet field, so independent naive
    # tiles have genuine seam discontinuities for blending to remove.
    pb = {**pb, "out_gain": jnp.asarray(2.0)}
    pd = {**pd, "out_gain": jnp.asarray(2.0)}
    base_path = str(tmp_path / "base")
    dec_path = str(tmp_path / "dec")
    torch_compat.save_model(base, pb, base_path)
    torch_compat.save_model(dec, pd, dec_path)

    kwargs = {**_ds_kwargs(h5_eval_fixture), "split": "val"}
    kwargs.pop("crop_size")  # evaluate() sets crop_size = canvas
    scores = {}
    for mode in ("blend", "naive"):
        out = evaluate(base_path, dec_path, kwargs,
                       n_images=8, batch=4, mode=mode, seed=0,
                       canvas=CANVAS)
        assert out["n_images"] == 8
        assert np.isfinite(out["kid_mean"]) and np.isfinite(out["fid"])
        scores[mode] = out
    assert scores["blend"]["kid_mean"] < scores["naive"]["kid_mean"], scores
