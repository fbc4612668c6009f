"""Dev visualization harness: every tool renders a real PNG headlessly
(the reference's 10 interactive visualizers have no display on TPU hosts;
headless PNG pages are this framework's equivalent)."""
import os

import numpy as np
import pytest
from click.testing import CliRunner

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def dataset_cfg(tmp_path_factory):
    """An H5 latents dataset + registry config pointing at it."""
    import h5py

    root = tmp_path_factory.mktemp("devviz")
    h5 = str(root / "data.h5")
    rng = np.random.default_rng(0)
    with h5py.File(h5, "w") as f:
        for chunk in range(2):
            g = f.create_group(f"90/{chunk}/0")
            lat = rng.standard_normal((8, 8, 96, 96)).astype(np.float16)
            d = g.create_dataset("latent", data=lat)
            d.attrs["pct_land"] = 0.5
            d.attrs["split"] = "val"
            g.create_dataset("lowfreq", data=rng.standard_normal(
                (96, 96)).astype(np.float32) * 38 - 31)
            g.create_dataset("lowres_exact", data=rng.standard_normal(
                (96, 96)).astype(np.float32) * 100)
            g.create_dataset("climate", data=rng.standard_normal(
                (19, 96, 96)).astype(np.float32))
            r = g.create_dataset("residual", data=rng.standard_normal(
                (768, 768)).astype(np.float32))
            r.attrs["pct_land"] = 0.5
            r.attrs["split"] = "val"
            g.attrs["beauty_score"] = 3.0
    cfg = str(root / "viz.cfg")
    with open(cfg, "w") as f:
        f.write(f"""
[val_dataset]
@dataset=h5_latents
h5_file="{h5}"
crop_size=64
pct_land_ranges=[[0, 1]]
subset_resolutions=[90]
subset_weights=[1.0]
latents_mean=[0, 0, 0, 0]
latents_std=[1, 1, 1, 1]
split="val"
cond_input_mean=[0, 0, 0, 0, 0, 0, 0.5]
cond_input_std=[1, 1, 1, 1, 1, 1, 0.5]
val_dset=true
""")
    return cfg


def test_dataset_viz_pages_and_sheet(dataset_cfg, tmp_path):
    from terrain_diffusion_tpu.training.dev_utils.dataset_viz import main

    out = str(tmp_path / "ds.png")
    r = CliRunner().invoke(main, ["--config", dataset_cfg, "--section",
                                  "val_dataset", "--n", "2", "--out", out,
                                  "--headless"])
    assert r.exit_code == 0, r.output
    assert os.path.exists(str(tmp_path / "ds_0.png"))
    assert os.path.exists(str(tmp_path / "ds_1.png"))

    sheet = str(tmp_path / "sheet.png")
    r = CliRunner().invoke(main, ["--config", dataset_cfg, "--section",
                                  "val_dataset", "--n", "2", "--out", sheet,
                                  "--sheet"])
    assert r.exit_code == 0, r.output
    assert os.path.getsize(sheet) > 10_000


def test_autoencoder_viz(dataset_cfg, tmp_path):
    import jax

    from terrain_diffusion_tpu.nn import (
        EDMAutoencoder, EDMAutoencoderConfig, torch_compat)
    from terrain_diffusion_tpu.training.dev_utils.model_viz import autoencoder

    ae = EDMAutoencoder(EDMAutoencoderConfig(
        image_size=64, in_channels=5, latent_channels=2, model_channels=8,
        model_channel_mults=(1, 2), layers_per_block=1,
        midblock_attention=False))
    mp = str(tmp_path / "ae_model")
    torch_compat.save_model(ae, ae.init(jax.random.key(0)), mp)
    out = str(tmp_path / "ae.png")
    r = CliRunner().invoke(autoencoder, [
        "--config", dataset_cfg, "--model-path", mp, "--section",
        "val_dataset", "--n", "1", "--out", out, "--headless"])
    assert r.exit_code == 0, r.output
    assert os.path.getsize(out) > 10_000


def test_noise_loss_curve(dataset_cfg, tmp_path):
    import jax

    from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig, torch_compat
    from terrain_diffusion_tpu.training.dev_utils.curves import main

    model = EDMUnet2D(EDMUnetConfig(
        image_size=64, in_channels=5, out_channels=5, model_channels=8,
        model_channel_mults=(1,), layers_per_block=1,
        conditional_inputs=(("tensor", 58, 1.0),), fourier_scale="pos"))
    mp = str(tmp_path / "diff_model")
    torch_compat.save_model(model, model.init(jax.random.key(0)), mp)
    out = str(tmp_path / "curve.png")
    r = CliRunner().invoke(main, [
        "--config", dataset_cfg, "--model-path", mp, "--section",
        "val_dataset", "--n", "2", "--points", "3", "--out", out,
        "--headless"])
    assert r.exit_code == 0, r.output
    assert "sigma=" in r.output
    assert os.path.getsize(out) > 10_000


def test_noise_windows_signed_sqrt_tools(tmp_path):
    from terrain_diffusion_tpu.training.dev_utils.figs import (
        signed_sqrt, windows)
    from terrain_diffusion_tpu.training.dev_utils.noise_viz import main as noise

    for cmd, args, name in (
            (noise, ["--size", "64", "--tile", "32"], "noise.png"),
            (windows, ["--tile", "32", "--stride", "16"], "win.png"),
            (signed_sqrt, [], "ss.png")):
        out = str(tmp_path / name)
        r = CliRunner().invoke(cmd, args + ["--out", out, "--headless"])
        assert r.exit_code == 0, r.output
        assert os.path.getsize(out) > 10_000
    # the noise tool must prove bit-exact overlap consistency on its panels


def test_pipeline_viz(tmp_path):
    from helpers import tiny_models

    from terrain_diffusion_tpu.pipeline.world import WorldPipeline
    from terrain_diffusion_tpu.training.dev_utils.figs import pipeline_viz

    p = WorldPipeline(seed=7, latents_batch_size=[1, 2, 4],
                      decoder_tile_size=64, decoder_tile_stride=48)
    p.set_models(*tiny_models(decoder_tile=64))
    mp = str(tmp_path / "pipe")
    p.save_pretrained(mp)
    out = str(tmp_path / "pipeline.png")
    r = CliRunner().invoke(pipeline_viz, [
        "--model-path", mp, "--size", "32", "--out", out, "--headless",
        "--kwarg", "latents_batch_size=[1,2,4]",
        "--kwarg", "decoder_tile_size=64",
        "--kwarg", "decoder_tile_stride=48"])
    assert r.exit_code == 0, r.output
    assert os.path.getsize(out) > 10_000


def test_consistency_decoder_viz(dataset_cfg, tmp_path):
    import jax

    from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig, torch_compat
    from terrain_diffusion_tpu.training.dev_utils.model_viz import (
        consistency_decoder)

    # decoder model: 1 sample ch + 4 latent cond ch -> 1 residual ch
    model = EDMUnet2D(EDMUnetConfig(
        image_size=64, in_channels=5, out_channels=1, model_channels=8,
        model_channel_mults=(1,), layers_per_block=1,
        midblock_attention=False))
    mp = str(tmp_path / "dec_model")
    torch_compat.save_model(model, model.init(jax.random.key(0)), mp)
    # decoder-dataset section appended to the same h5
    cfg2 = str(tmp_path / "dec.cfg")
    h5_path = None
    with open(dataset_cfg) as f:
        for line in f:
            if line.startswith("h5_file="):
                h5_path = line.split("=", 1)[1].strip()
    with open(cfg2, "w") as f:
        f.write(f"""
[val_dataset]
@dataset=h5_decoder_terrain
h5_file={h5_path}
crop_size=64
pct_land_ranges=[[0, 1]]
subset_resolutions=[90]
split="val"
""")
    out = str(tmp_path / "dec.png")
    r = CliRunner().invoke(consistency_decoder, [
        "--config", cfg2, "--model-path", mp, "--section", "val_dataset",
        "--n", "1", "--out", out, "--headless"])
    assert r.exit_code == 0, r.output
    assert os.path.getsize(out) > 10_000


def test_base_diffusion_viz(dataset_cfg, tmp_path):
    import jax

    from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig, torch_compat
    from terrain_diffusion_tpu.training.dev_utils.model_viz import base_diffusion

    model = EDMUnet2D(EDMUnetConfig(
        image_size=64, in_channels=5, out_channels=5, model_channels=8,
        model_channel_mults=(1,), layers_per_block=1,
        conditional_inputs=(("tensor", 58, 1.0),), fourier_scale="pos"))
    mp = str(tmp_path / "base_model")
    torch_compat.save_model(model, model.init(jax.random.key(0)), mp)
    out = str(tmp_path / "base.png")
    r = CliRunner().invoke(base_diffusion, [
        "--config", dataset_cfg, "--model-path", mp, "--section",
        "val_dataset", "--n", "1", "--steps", "4", "--out", out,
        "--headless"])
    assert r.exit_code == 0, r.output
    assert os.path.getsize(out) > 10_000
