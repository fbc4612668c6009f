"""Every shipped config resolves through the registry and builds its trainer.

The reference ships its production config tree under `configs/`
(`/root/reference/configs/*`); the repo mirrors it 1:1.  This test loads
each .cfg, redirects dataset/model paths at tiny fixtures, resolves every
`@registry` block, constructs the trainer, and pulls one sample from the
train dataset.
"""
import glob
import os

import numpy as np
import pytest

import jax

from terrain_diffusion_tpu.training import registry as reg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALL_CONFIGS = sorted(
    glob.glob(os.path.join(REPO, "configs", "**", "*.cfg"), recursive=True))
REFERENCE_CONFIGS = "/root/reference/configs"


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    """Tiny dataset/model fixtures every shipped config can point at."""
    import h5py

    from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig, torch_compat

    root = tmp_path_factory.mktemp("cfg_fixtures")
    rng = np.random.default_rng(0)

    dataset = str(root / "dataset.h5")
    with h5py.File(dataset, "w") as f:
        for res in ("90", "30"):
            for chunk in range(2):
                g = f.create_group(f"{res}/{chunk}/0")
                lat = rng.standard_normal((8, 8, 96, 96)).astype(np.float16)
                d = g.create_dataset("latent", data=lat)
                d.attrs["pct_land"] = 0.5
                d.attrs["split"] = "train" if chunk == 0 else "val"
                g.create_dataset("lowfreq", data=rng.standard_normal(
                    (96, 96)).astype(np.float32) * 38 - 31)
                g.create_dataset("lowres_exact", data=rng.standard_normal(
                    (96, 96)).astype(np.float32) * 100)
                g.create_dataset("climate", data=rng.standard_normal(
                    (19, 96, 96)).astype(np.float32))
                r = g.create_dataset("residual", data=rng.standard_normal(
                    (768, 768)).astype(np.float32))
                r.attrs["pct_land"] = 0.5
                r.attrs["split"] = "train" if chunk == 0 else "val"
                g.attrs["beauty_score"] = 3.0

    coarse = str(root / "coarse.h5")
    with h5py.File(coarse, "w") as f:
        for i in range(2):
            f.create_dataset(
                f"gan_band_{i}",
                data=rng.standard_normal((6, 24, 24)).astype(np.float64))
        f.attrs["band_weights"] = np.array([0.5, 0.5])
        f.attrs["means"] = np.zeros(6)
        f.attrs["stds"] = np.ones(6)

    def save_tiny_unet(name, out_channels, cond):
        model = EDMUnet2D(EDMUnetConfig(
            image_size=64, in_channels=5, out_channels=out_channels,
            model_channels=8, model_channel_mults=(1, 2), layers_per_block=1,
            attn_resolutions=(), midblock_attention=False, concat_balance=0.5,
            conditional_inputs=cond, fourier_scale="pos", noise_emb_dims=8,
            logvar_channels=8))
        path = str(root / name)
        torch_compat.save_model(model, model.init(jax.random.key(1)), path)
        return path

    return {
        "dataset": dataset,
        "coarse": coarse,
        "base_model": save_tiny_unet("base", 5, (("tensor", 58, 1.0),)),
        "decoder_model": save_tiny_unet("decoder", 1, ()),
    }


def _redirect(config: dict, paths: dict) -> None:
    """Point every dataset/model path in a parsed config at the fixtures."""
    for section, block in config.items():
        if not isinstance(block, dict):
            continue
        if "@dataset" in block:
            if block["@dataset"] == "coarse":
                block["h5_file"] = paths["coarse"]
            elif "h5_file" in block:
                block["h5_file"] = paths["dataset"]
        if section == "model" and "main_path" in block:
            is_decoder = "decoder" in block["main_path"]
            key = "decoder_model" if is_decoder else "base_model"
            block["main_path"] = paths[key]
            if block.get("guide_path"):
                block["guide_path"] = paths[key]


def test_config_tree_mirrors_reference():
    """configs/ carries a counterpart for every reference config file."""
    if not os.path.isdir(REFERENCE_CONFIGS):
        pytest.skip("reference configs not mounted")
    ref = {os.path.relpath(p, REFERENCE_CONFIGS)
           for p in glob.glob(os.path.join(REFERENCE_CONFIGS, "**", "*.cfg"),
                              recursive=True)}
    repo = {os.path.relpath(p, os.path.join(REPO, "configs"))
            for p in ALL_CONFIGS}
    missing = ref - repo
    assert not missing, f"configs missing vs reference: {sorted(missing)}"


@pytest.mark.parametrize(
    "cfg_path", ALL_CONFIGS,
    ids=[os.path.relpath(p, os.path.join(REPO, "configs"))
         for p in ALL_CONFIGS])
def test_config_resolves_and_builds_trainer(cfg_path, fixture_paths):
    reg.build_registry()
    config = reg.load_config(cfg_path)
    _redirect(config, fixture_paths)

    resolved = reg.resolve(config)
    assert "trainer" in resolved, "config must define [trainer]"

    trainer = resolved["trainer"](config, resolved)
    assert trainer is not None

    train_ds = resolved.get("train_dataset")
    assert train_ds is not None, "config must define [train_dataset]"
    item = train_ds[0]
    assert "image" in item and np.isfinite(item["image"]).all()

    # every config that declares a val/sweep dataset must have resolved it
    for name in ("val_dataset", "sweep_dataset", "results_dataset"):
        if name in config:
            assert resolved[name] is not None
