"""Training stack: config/registry, datasets on a synthetic HDF5 fixture,
diffusion/consistency/autoencoder steps, PostHoc-EMA, LR schedules."""
import os

import numpy as np
import pytest

import jax

from terrain_diffusion_tpu.training import registry as reg
from terrain_diffusion_tpu.training import lr_sched as ls


@pytest.fixture(scope="module")
def h5_fixture(tmp_path_factory):
    """Small dataset in the reference schema:
    {res}/{chunk}/{subchunk}/{latent,lowfreq,lowres_exact,climate,residual}."""
    import h5py

    path = str(tmp_path_factory.mktemp("data") / "dataset.h5")
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        for chunk in range(2):
            for sub in range(2):
                g = f.create_group(f"90/{chunk}/{sub}")
                lat = rng.standard_normal((8, 8, 96, 96)).astype(np.float16)
                d = g.create_dataset("latent", data=lat)
                d.attrs["pct_land"] = 0.5
                d.attrs["split"] = "train" if chunk == 0 else "val"
                lf = rng.standard_normal((96, 96)).astype(np.float32) * 38 - 31
                g.create_dataset("lowfreq", data=lf)
                g.create_dataset("lowres_exact",
                                 data=rng.standard_normal((96, 96)).astype(np.float32) * 100)
                g.create_dataset("climate",
                                 data=rng.standard_normal((19, 96, 96)).astype(np.float32))
                r = g.create_dataset(
                    "residual",
                    data=rng.standard_normal((768, 768)).astype(np.float32))
                r.attrs["pct_land"] = 0.5
                r.attrs["split"] = "train" if chunk == 0 else "val"
                g.attrs["beauty_score"] = 3.0
    return path


def test_config_parse_and_resolve(tmp_path):
    cfg_path = str(tmp_path / "t.cfg")
    with open(cfg_path, "w") as f:
        f.write("""
[trainer]
@trainer=diffusion

[training]
batch_size=4
P_mean=-0.6
P_std=1.3

[model]
@model=unet
image_size=16
in_channels=3
model_channels=8
model_channel_mults=[1]
layers_per_block=1
conditional_inputs=[["tensor", 7, 1.0]]
fourier_scale="pos"

[lr_sched]
@lr_sched=sqrt
lr=0.01
ref_nimg=1000
warmup_nimg=100

[scheduler]
@scheduler=edm_dpm
sigma_min=0.002
sigma_max=80
sigma_data=0.5
""")
    reg.build_registry()
    config = reg.load_config(cfg_path)
    assert config["training"]["batch_size"] == 4
    assert config["training"]["P_mean"] == -0.6
    reg.apply_overrides(config, ["training.batch_size=8", "model.model_channels=16"])
    assert config["training"]["batch_size"] == 8
    resolved = reg.resolve(config)
    assert resolved["model"].config.model_channels == 16
    assert abs(resolved["lr_sched"].get(1000) - 0.01) < 1e-9
    assert resolved["scheduler"].sigma_data == 0.5


def test_lr_schedulers():
    s = ls.SqrtLRScheduler(0.01, 1000, warmup_nimg=100)
    assert s.get(50) == pytest.approx(0.005)
    assert s.get(1000) == pytest.approx(0.01)
    assert s.get(4000) == pytest.approx(0.005)
    c = ls.CosineLRScheduler(0.01, 1000)
    assert c.get(0) == pytest.approx(0.01)
    assert c.get(1000) == pytest.approx(0.0, abs=1e-9)
    k = ls.ConstantLRScheduler(0.003)
    assert k.get(12345) == 0.003


def test_h5_latents_dataset(h5_fixture):
    from terrain_diffusion_tpu.training.datasets import H5LatentsDataset

    ds = H5LatentsDataset(
        h5_file=h5_fixture, crop_size=64, pct_land_ranges=[[0, 1]],
        subset_resolutions=[90], subset_weights=[1.0],
        latents_mean=[0, 0, 0, 0], latents_std=[1, 1, 1, 1],
        split="train", beauty_dist=[True],
        cond_input_mean=[0, 0, 0, 0, 0, 0, 0.5],
        cond_input_std=[1, 1, 1, 1, 1, 1, 0.5])
    item = ds[0]
    assert item["image"].shape == (64, 64, 5)  # 4 latent + 1 lowfreq, NHWC
    assert item["cond_inputs"][0].shape == (58,)
    assert np.isfinite(item["image"]).all()
    assert np.isfinite(item["cond_inputs"][0]).all()
    # seeded determinism
    ds.set_seed(7)
    a = ds[0]["image"]
    ds.set_seed(7)
    b = ds[0]["image"]
    np.testing.assert_array_equal(a, b)


def test_h5_decoder_dataset(h5_fixture):
    from terrain_diffusion_tpu.training.datasets import H5DecoderTerrainDataset

    ds = H5DecoderTerrainDataset(
        h5_file=h5_fixture, crop_size=64, pct_land_ranges=[[0, 1]],
        subset_resolutions=[90], residual_mean=0.0, residual_std=1.1678,
        split="train")
    item = ds[0]
    assert item["image"].shape == (64, 64, 1)
    assert item["cond_img"].shape == (64, 64, 4)
    assert np.isfinite(item["image"]).all()


def test_h5_autoencoder_dataset(h5_fixture):
    from terrain_diffusion_tpu.training.datasets import H5AutoencoderDataset

    ds = H5AutoencoderDataset(
        h5_file=h5_fixture, crop_size=32, pct_land_ranges=[[0, 1]],
        subset_resolutions=[90], split="train")
    item = ds[0]
    assert item["image"].shape == (32, 32, 1)


def test_long_dataset_and_collate(h5_fixture):
    from terrain_diffusion_tpu.training.datasets import (
        H5AutoencoderDataset, LongDataset, collate)

    base = H5AutoencoderDataset(
        h5_file=h5_fixture, crop_size=32, pct_land_ranges=[[0, 1]],
        subset_resolutions=[90])
    ds = LongDataset(base, base_seed=3)
    batch = collate([ds[i] for i in range(4)])
    assert batch["image"].shape == (4, 32, 32, 1)
    # same index reproducible
    np.testing.assert_array_equal(ds[2]["image"], ds[2]["image"])


def test_diffusion_trainer_steps(h5_fixture, tmp_path):
    from terrain_diffusion_tpu.training.train import run_training

    config = {
        "trainer": {"@trainer": "diffusion"},
        "logging": {"save_dir": str(tmp_path / "run"), "save_epochs": 1},
        "training": {"batch_size": 2, "epochs": 1, "epoch_steps": 3,
                     "P_mean": -0.6, "P_std": 1.3, "seed": 1},
        "ema": {"sigma_rels": [0.05, 0.1], "checkpoint_every_num_steps": 2},
        "model": {"@model": "unet", "image_size": 64, "in_channels": 5,
                  "out_channels": 5, "model_channels": 8,
                  "model_channel_mults": [1], "layers_per_block": 1,
                  "conditional_inputs": [["tensor", 58, 1.0]],
                  "fourier_scale": "pos"},
        "lr_sched": {"@lr_sched": "constant", "lr": 1e-4},
        "train_dataset": {
            "@dataset": "h5_latents", "h5_file": h5_fixture, "crop_size": 64,
            "pct_land_ranges": [[0, 1]], "subset_resolutions": [90],
            "subset_weights": [1.0], "latents_mean": [0, 0, 0, 0],
            "latents_std": [1, 1, 1, 1], "split": "train",
            "beauty_dist": True,
            "cond_input_mean": [0, 0, 0, 0, 0, 0, 0.5],
            "cond_input_std": [1, 1, 1, 1, 1, 1, 0.5]},
    }
    state, counters = run_training(config, max_steps=3)
    assert counters["step"] == 3
    assert os.path.exists(str(tmp_path / "run" / "latest_checkpoint" / "saved_model" / "model.safetensors"))
    assert os.path.exists(str(tmp_path / "run" / "metrics.jsonl"))
    # resume from checkpoint
    state2, counters2 = run_training(config, max_steps=5)
    assert counters2["step"] == 5


def test_phema_update_and_synthesize(tmp_path):
    from terrain_diffusion_tpu.training.phema import PostHocEMA, sigma_rel_to_gamma

    # paper mapping: sigma_rel 0.05 -> gamma ~16.97; 0.10 -> ~6.94
    assert 15 < sigma_rel_to_gamma(0.05) < 19
    assert 5 < sigma_rel_to_gamma(0.10) < 9
    params = {"w": np.ones((4, 4), np.float32)}
    ema = PostHocEMA(params, sigma_rels=(0.05, 0.1), folder=str(tmp_path / "ph"))
    for step in range(1, 40):
        params = {"w": params["w"] * 0 + step}
        ema.update(params, step)
        if step % 10 == 0:
            ema.checkpoint(step)
    synth = ema.synthesize(0.07)
    assert np.isfinite(np.asarray(synth["w"])).all()
    # EMA lags behind the raw value but tracks it
    assert 5 < float(np.asarray(synth["w"]).mean()) <= 39


def test_consistency_trainer_step(h5_fixture):
    import jax.numpy as jnp

    from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig
    from terrain_diffusion_tpu.training.trainers.consistency import ConsistencyTrainer

    model = EDMUnet2D(EDMUnetConfig(
        image_size=16, in_channels=5, out_channels=5, model_channels=8,
        model_channel_mults=(1,), layers_per_block=1,
        conditional_inputs=(("tensor", 58, 1.0),), fourier_scale="pos"))
    config = {"training": {"sigma_data": 0.5, "warmup_steps": 10},
              "model": {}, "optimizer": {}}
    trainer = ConsistencyTrainer(config, {"model": model,
                                          "lr_sched": ls.ConstantLRScheduler(1e-4)})
    state = trainer.init_state(jax.random.key(0))
    counters = {"step": 0, "seen": 0}
    rng = np.random.default_rng(0)
    batch = {"image": rng.standard_normal((2, 16, 16, 5)).astype(np.float32),
             "cond_inputs": [rng.standard_normal((2, 58)).astype(np.float32)]}
    m1 = trainer.train_step(state, batch, jax.random.key(1), counters)
    m2 = trainer.train_step(state, batch, jax.random.key(2), counters)
    assert np.isfinite(m1["loss"]) and np.isfinite(m2["loss"])
    assert counters["step"] == 2


def test_autoencoder_trainer_step():
    from terrain_diffusion_tpu.nn import EDMAutoencoder, EDMAutoencoderConfig
    from terrain_diffusion_tpu.training.trainers.autoencoder import AutoencoderTrainer

    ae = EDMAutoencoder(EDMAutoencoderConfig(
        image_size=32, in_channels=1, latent_channels=2, model_channels=8,
        model_channel_mults=(1, 2), layers_per_block=1, midblock_attention=False))
    config = {"training": {"kl_weight": 1e-5}, "optimizer": {}}
    trainer = AutoencoderTrainer(config, {"model": ae,
                                          "lr_sched": ls.ConstantLRScheduler(1e-4)})
    state = trainer.init_state(jax.random.key(0))
    counters = {"step": 0, "seen": 0}
    batch = {"image": np.random.default_rng(0).standard_normal(
        (2, 32, 32, 1)).astype(np.float32)}
    m = trainer.train_step(state, batch, jax.random.key(1), counters)
    assert np.isfinite(m["loss"])
    assert "mae" in m and "kl" in m


def test_evaluate_full_with_kid(h5_fixture, tmp_path):
    import jax as _jax

    from terrain_diffusion_tpu.training import lr_sched as _ls
    from terrain_diffusion_tpu.training.trainers.diffusion import DiffusionTrainer
    from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig
    from terrain_diffusion_tpu.training.datasets import H5LatentsDataset

    model = EDMUnet2D(EDMUnetConfig(
        image_size=64, in_channels=5, out_channels=5, model_channels=8,
        model_channel_mults=(1,), layers_per_block=1,
        conditional_inputs=(("tensor", 58, 1.0),), fourier_scale="pos"))
    config = {"training": {"P_mean": -0.6, "P_std": 1.3},
              "optimizer": {},
              "evaluation": {"validate_epochs": 1, "validation_steps": 4,
                             "kid_batch_size": 2, "kid_enabled": True,
                             "kid_n_images": 4, "kid_scheduler_steps": 2}}
    trainer = DiffusionTrainer(config, {
        "model": model, "lr_sched": _ls.ConstantLRScheduler(1e-4)})
    state = trainer.init_state(_jax.random.key(0))
    val_ds = H5LatentsDataset(
        h5_file=h5_fixture, crop_size=64, pct_land_ranges=[[0, 1]],
        subset_resolutions=[90], subset_weights=[1.0],
        latents_mean=[0, 0, 0, 0], latents_std=[1, 1, 1, 1], split="val",
        cond_input_mean=[0, 0, 0, 0, 0, 0, 0.5],
        cond_input_std=[1, 1, 1, 1, 1, 1, 0.5], val_dset=True)
    out = trainer.evaluate_full(state, val_ds, _jax.random.key(1))
    assert "val_loss" in out and "val_kid_mean" in out
    assert np.isfinite(out["val_loss"]) and np.isfinite(out["val_kid_mean"])


def test_gan_trainer_full_path():
    """GAN trainer: relativistic losses, R1 penalty on its interval, inject
    mode, crop, KL/range losses, warmup schedules, FID eval (reference
    `trainers/gan.py:102-343`)."""
    from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig
    from terrain_diffusion_tpu.training.trainers.gan import GANTrainer, random_crop

    def unet(in_ch, out_ch):
        return EDMUnet2D(EDMUnetConfig(
            image_size=16, in_channels=in_ch, out_channels=out_ch,
            model_channels=8, model_channel_mults=(1,), layers_per_block=1,
            midblock_attention=False))

    config = {
        "training": {"latent_channels": 1, "crop_size": 12, "mode": "inject",
                     "r_gamma": 0.1, "r_interval": 2, "burnin_steps": 4,
                     "kl_weight": 0.01, "range_weight": 1.0,
                     "disc_lr_mult": 2.0, "lr_warmup_factor": 0.1},
        "g_optimizer": {"kwargs": {"betas": (0.0, 0.99)}},
        "d_optimizer": {"kwargs": {"betas": (0.0, 0.99)}},
    }
    trainer = GANTrainer(config, {
        "model": unet(2, 1),  # inject: concat(mixed_real, z) -> 2 in-ch
        "discriminator": unet(1, 1),
        "lr_sched": ls.ConstantLRScheduler(1e-4)})
    state = trainer.init_state(jax.random.key(0))
    counters = {"step": 0, "seen": 0}
    batch = {"image": np.random.default_rng(0).standard_normal(
        (2, 16, 16, 1)).astype(np.float32)}
    m0 = trainer.train_step(state, batch, jax.random.key(1), counters)  # step 0: r1 variant
    m1 = trainer.train_step(state, batch, jax.random.key(2), counters)  # step 1: plain
    m2 = trainer.train_step(state, batch, jax.random.key(4), counters)  # step 2: r1 variant
    for m in (m0, m1, m2):
        for k in ("d_loss", "g_loss", "kl_loss", "range_loss",
                  "d_grad_norm", "g_grad_norm"):
            assert np.isfinite(m[k]), (k, m)
    # interval=2: penalty variant at even steps; at step 0 the zero-init
    # output gain makes the disc input-grad (hence the penalty) exactly 0,
    # by step 2 it is live
    assert m1["r_loss"] == 0.0 and m2["r_loss"] > 0.0, (m0, m1, m2)
    # warmup schedules move
    r0, b20, pf0, lw0 = trainer._current(0)
    r1, b21, pf1, lw1 = trainer._current(4)
    assert r0 > r1 and b20 < b21 and lw0 < lw1 == 1.0
    # FID eval with EMA weights
    out = trainer.evaluate(state, [batch], jax.random.key(3))
    assert np.isfinite(out["val/fid"])
    # crop shapes + determinism per key
    img = np.arange(2 * 16 * 16).reshape(2, 16, 16, 1).astype(np.float32)
    c1 = random_crop(jax.random.key(5), jax.numpy.asarray(img), 12)
    c2 = random_crop(jax.random.key(5), jax.numpy.asarray(img), 12)
    assert c1.shape == (2, 12, 12, 1)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_gan_trainer_plain_mode():
    from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig
    from terrain_diffusion_tpu.training.trainers.gan import GANTrainer

    def unet(in_ch, out_ch):
        return EDMUnet2D(EDMUnetConfig(
            image_size=16, in_channels=in_ch, out_channels=out_ch,
            model_channels=8, model_channel_mults=(1,), layers_per_block=1,
            midblock_attention=False))

    trainer = GANTrainer({"training": {"latent_channels": 1}}, {
        "model": unet(1, 1), "discriminator": unet(1, 1),
        "lr_sched": ls.ConstantLRScheduler(1e-4)})
    state = trainer.init_state(jax.random.key(0))
    counters = {"step": 0, "seen": 0}
    batch = {"image": np.random.default_rng(1).standard_normal(
        (2, 16, 16, 1)).astype(np.float32)}
    m = trainer.train_step(state, batch, jax.random.key(1), counters)
    assert np.isfinite(m["d_loss"]) and np.isfinite(m["g_loss"])
    assert m["r_loss"] == 0.0  # r_gamma=0: no penalty variant built


def test_gan_checkpoint_roundtrip_includes_discriminator(tmp_path):
    """A GAN resume must restore the adversary — the base protocol only
    covers the generator (reference persists both via accelerate)."""
    from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig
    from terrain_diffusion_tpu.training.trainers.gan import GANTrainer

    def unet(in_ch, out_ch):
        return EDMUnet2D(EDMUnetConfig(
            image_size=16, in_channels=in_ch, out_channels=out_ch,
            model_channels=8, model_channel_mults=(1,), layers_per_block=1,
            midblock_attention=False))

    trainer = GANTrainer({"training": {"latent_channels": 1}}, {
        "model": unet(1, 1), "discriminator": unet(1, 1),
        "lr_sched": ls.ConstantLRScheduler(1e-4)})
    state = trainer.init_state(jax.random.key(0))
    batch = {"image": np.random.default_rng(1).standard_normal(
        (2, 16, 16, 1)).astype(np.float32)}
    trainer.train_step(state, batch, jax.random.key(1), {"step": 0, "seen": 0})
    path = str(tmp_path / "ckpt")
    trainer.save_checkpoint(state, path, {"step": 1, "seen": 2})

    state2 = trainer.init_state(jax.random.key(42))  # different init
    counters = trainer.load_checkpoint(state2, path)
    assert counters["step"] == 1
    for a, b in zip(jax.tree.leaves(state["d_params"]),
                    jax.tree.leaves(state2["d_params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_evaluate_kid_decoder_path_uses_real_ground_truth(h5_fixture):
    """mode='base' with a decoder: fake terrain decodes through the full
    denorm chain and the real side comes from the dataset's ground_truth
    (real residual terrain), both finite and at output resolution."""
    from helpers import tiny_models

    from terrain_diffusion_tpu.training.datasets import H5LatentsDataset
    from terrain_diffusion_tpu.training.trainers.eval_kid import evaluate_kid

    ds = H5LatentsDataset(
        h5_file=h5_fixture, crop_size=64, pct_land_ranges=[[0, 1]],
        subset_resolutions=[90], subset_weights=[1.0],
        latents_mean=[0, 0, 0, 0], latents_std=[1, 1, 1, 1],
        split="val", val_dset=True, clip_edges=False,
        cond_input_mean=[0, 0, 0, 0, 0, 0, 0.5],
        cond_input_std=[1, 1, 1, 1, 1, 1, 0.5])
    assert "ground_truth" in ds[0]

    (_, _), (base, pb), (dec, pd) = tiny_models(decoder_tile=64)
    out = evaluate_kid(base, pb, ds, jax.random.key(0), mode="base",
                       n_images=4, batch=2, steps=2, decoder=(dec, pd))
    assert np.isfinite(out["kid_mean"])
    assert out["n_images"] == 4
