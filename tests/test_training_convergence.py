"""Training convergence: trainers must actually LEARN, not just step.

`test_training.py` proves every trainer steps with finite losses; these
tests close the remaining gap (an algebraic sign error in a loss could
still hide behind "finite"): a few hundred steps on a tiny model and a
strongly-structured procedural dataset must

- halve the diffusion validation loss (reference behavior contract:
  `trainers/diffusion.py:108-171` — real training runs were the
  reference's de-facto convergence check, TRAINING.md:36-42),
- halve the autoencoder reconstruction loss,
- move the consistency student's 1-step output markedly closer to the
  teacher's 20-step DPM ODE solution from the same initial noise
  (`trainers/consistency.py:137-177` — sCM distillation target),
- and make resume-at-step-k bit-identical to an uninterrupted run.

Tiny shapes keep each test to seconds of XLA-jitted CPU compute.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig
import terrain_diffusion_tpu.training.lr_sched as ls

pytestmark = pytest.mark.slow

H = 16
C = 3


def _structured_images(rng, n):
    """Low-dimensional, low-frequency image family (3 sinusoid bases with
    random coefficients) — easy to learn, impossible to fit by accident."""
    yy, xx = np.mgrid[0:H, 0:H].astype(np.float32) / H
    bases = np.stack([np.sin(2 * np.pi * (fx * xx + fy * yy))
                      for fx, fy in [(1, 0), (0, 1), (1, 1)]])
    coef = rng.standard_normal((n, 3)).astype(np.float32)
    img = np.tensordot(coef, bases, axes=([1], [0]))
    img = img / img.std() * 0.5  # sigma_data
    return np.repeat(img[..., None], C, axis=-1).astype(np.float32)


def _tiny_unet():
    return EDMUnet2D(EDMUnetConfig(
        image_size=H, in_channels=C, out_channels=C, model_channels=8,
        model_channel_mults=(1,), layers_per_block=1, attn_resolutions=(),
        midblock_attention=False, concat_balance=0.5, conditional_inputs=(),
        fourier_scale="pos", noise_emb_dims=8, logvar_channels=8))


def _batches(data, batch, steps, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(steps):
        idx = rng.integers(0, len(data), batch)
        yield {"image": data[idx]}


@pytest.fixture(scope="module")
def trained_diffusion():
    """(trainer, state, initial val loss, final val loss) after 400 steps."""
    from terrain_diffusion_tpu.training.trainers.diffusion import DiffusionTrainer

    data = _structured_images(np.random.default_rng(0), 64)
    trainer = DiffusionTrainer(
        {"training": {"P_mean": -0.6, "P_std": 1.3}, "optimizer": {}},
        {"model": _tiny_unet(), "lr_sched": ls.ConstantLRScheduler(3e-3)})
    state = trainer.init_state(jax.random.key(0))
    state["ema"] = None

    val_batch = {"image": data[:16]}
    val_key = jax.random.key(99)
    loss0 = float(trainer._val_loss(state["params"], val_batch, val_key))

    counters = {"step": 0, "seen": 0}
    for i, batch in enumerate(_batches(data, 16, 400)):
        trainer.train_step(state, batch, jax.random.fold_in(jax.random.key(1), i),
                           counters)
    loss1 = float(trainer._val_loss(state["params"], val_batch, val_key))
    return trainer, state, loss0, loss1


def test_diffusion_loss_converges(trained_diffusion):
    _, _, loss0, loss1 = trained_diffusion
    assert np.isfinite(loss1)
    assert loss1 < 0.5 * loss0, (loss0, loss1)


def test_autoencoder_loss_converges():
    from terrain_diffusion_tpu.nn import EDMAutoencoder, EDMAutoencoderConfig
    from terrain_diffusion_tpu.training.trainers.autoencoder import AutoencoderTrainer

    data = _structured_images(np.random.default_rng(1), 64)[..., :1]
    ae = EDMAutoencoder(EDMAutoencoderConfig(
        image_size=H, in_channels=1, latent_channels=2, model_channels=8,
        model_channel_mults=(1,), layers_per_block=1, midblock_attention=False))
    trainer = AutoencoderTrainer(
        {"training": {"kl_weight": 1e-6}, "optimizer": {}},
        {"model": ae, "lr_sched": ls.ConstantLRScheduler(3e-3)})
    state = trainer.init_state(jax.random.key(0))
    state["ema"] = None
    counters = {"step": 0, "seen": 0}

    first = last = None
    for i, batch in enumerate(_batches(data, 16, 300, seed=3)):
        m = trainer.train_step(state, batch,
                               jax.random.fold_in(jax.random.key(2), i), counters)
        if i < 20:
            first = m["loss"] if first is None else first + m["loss"]
        if i >= 280:
            last = m["loss"] if last is None else last + m["loss"]
    assert np.isfinite(last)
    assert last < 0.5 * first, (first / 20, last / 20)


def test_consistency_student_approaches_teacher_ode(trained_diffusion):
    from terrain_diffusion_tpu.evaluation.samplers import (
        _jitted_consistency_step, _jitted_dpm_tile)
    from terrain_diffusion_tpu.scheduler import EDMSchedulerConfig, compute_sigmas
    from terrain_diffusion_tpu.training.trainers.consistency import ConsistencyTrainer

    cfg = EDMSchedulerConfig()
    diff_trainer, diff_state, _, _ = trained_diffusion
    model = diff_trainer.model  # same architecture/instance as the teacher
    teacher_params = diff_state["params"]
    data = _structured_images(np.random.default_rng(0), 64)  # teacher's data
    trainer = ConsistencyTrainer(
        {"training": {"sigma_data": 0.5, "warmup_steps": 50,
                      "P_mean": -1.0, "P_std": 1.4},
         "model": {}, "optimizer": {}},
        {"model": model, "lr_sched": ls.ConstantLRScheduler(2e-3)})
    trainer.set_teacher(teacher_params)
    state = trainer.init_state(jax.random.key(0))
    state["ema"] = None

    # reference trajectory: the teacher's own 20-step DPM ODE solve
    sigmas0 = float(compute_sigmas(cfg, 20)[0])
    t_max = float(np.arctan(sigmas0 / cfg.sigma_data))
    z = jax.random.normal(jax.random.key(7), (8, H, H, C))
    dpm = _jitted_dpm_tile(model, None, 1.0, 20, cfg)
    x_ref = dpm(teacher_params, {}, z * sigmas0, [])

    cstep = _jitted_consistency_step(model, cfg)

    def student_err(params):
        x1 = cstep(params, jnp.zeros_like(z), z, jnp.float32(t_max), [])
        return float(jnp.mean((x1 - x_ref) ** 2))

    err0 = student_err(state["params"])
    counters = {"step": 0, "seen": 0}
    # 1000 steps measured at ratio 0.449 (600 steps: 0.474) — margin under
    # the 0.5x bar the diffusion/AE tests also use
    for i, batch in enumerate(_batches(data, 8, 1000, seed=5)):
        m = trainer.train_step(state, batch,
                               jax.random.fold_in(jax.random.key(3), i), counters)
    assert np.isfinite(m["loss"])
    err1 = student_err(state["params"])
    print(f"consistency distillation: err0={err0:.5f} err1={err1:.5f} "
          f"ratio={err1 / err0:.3f}")
    assert err1 < 0.5 * err0, (err0, err1)


def test_resume_is_bit_identical(tmp_path):
    from terrain_diffusion_tpu.training.trainers.diffusion import DiffusionTrainer

    data = _structured_images(np.random.default_rng(4), 32)

    def make():
        t = DiffusionTrainer(
            {"training": {}, "optimizer": {},
             "ema": {"sigma_rels": [0.05, 0.1]}},
            {"model": _tiny_unet(), "lr_sched": ls.ConstantLRScheduler(1e-3)})
        return t, t.init_state(jax.random.key(0))

    def batch_for(step):
        rng = np.random.default_rng(100 + step)
        return {"image": data[rng.integers(0, len(data), 4)]}

    def key_for(step):
        return jax.random.fold_in(jax.random.key(11), step)

    # uninterrupted: 6 steps
    tr_a, st_a = make()
    cnt_a = {"step": 0, "seen": 0}
    for s in range(6):
        tr_a.train_step(st_a, batch_for(s), key_for(s), cnt_a)

    # interrupted: 3 steps, checkpoint, fresh trainer, restore, 3 more
    tr_b, st_b = make()
    cnt_b = {"step": 0, "seen": 0}
    for s in range(3):
        tr_b.train_step(st_b, batch_for(s), key_for(s), cnt_b)
    ck = str(tmp_path / "ck")
    tr_b.save_checkpoint(st_b, ck, cnt_b)

    tr_c, st_c = make()
    cnt_c = tr_c.load_checkpoint(st_c, ck)
    assert cnt_c == cnt_b
    for s in range(3, 6):
        tr_c.train_step(st_c, batch_for(s), key_for(s), cnt_c)

    flat_a = jax.tree_util.tree_leaves_with_path(st_a["params"])
    flat_c_map = dict(jax.tree_util.tree_leaves_with_path(st_c["params"]))
    assert cnt_c == cnt_a
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_c_map[path]),
            err_msg=f"resume diverged at {jax.tree_util.keystr(path)}")


def test_gan_reaches_relativistic_equilibrium_and_fid_improves():
    """GAN trainer must LEARN (reference contract `trainers/gan.py:102-343`):
    300 adversarial steps on the structured-image family must (a) keep the
    discriminator in the relativistic equilibrium band — softplus losses
    near log 2, neither side collapsed — and (b) improve the FID proxy
    (terrain-feature Frechet distance, the trainer's own eval) by >40%."""
    from terrain_diffusion_tpu.training.trainers.gan import GANTrainer

    def unet(in_ch, out_ch):
        return EDMUnet2D(EDMUnetConfig(
            image_size=H, in_channels=in_ch, out_channels=out_ch,
            model_channels=8, model_channel_mults=(1,), layers_per_block=1,
            midblock_attention=False))

    data = _structured_images(np.random.default_rng(1), 256)[..., :1]
    config = {
        "training": {"latent_channels": 2, "mode": "plain", "r_gamma": 0.1,
                     "r_interval": 4, "burnin_steps": 0, "kl_weight": 0.0,
                     "range_weight": 0.0, "disc_lr_mult": 1.0},
        "g_optimizer": {"kwargs": {"betas": (0.0, 0.99)}},
        "d_optimizer": {"kwargs": {"betas": (0.0, 0.99)}},
    }
    trainer = GANTrainer(config, {
        "model": unet(2, 1), "discriminator": unet(1, 1),
        "lr_sched": ls.ConstantLRScheduler(2e-3)})
    state = trainer.init_state(jax.random.key(0))
    state["ema"] = None
    counters = {"step": 0, "seen": 0}

    val_batch = {"image": data[:64]}
    fid0 = trainer.evaluate(state, [val_batch], jax.random.key(9))["val/fid"]

    rng = np.random.default_rng(3)
    d_losses, g_losses = [], []
    for i in range(300):
        idx = rng.integers(0, len(data), 16)
        m = trainer.train_step(state, {"image": data[idx]},
                               jax.random.fold_in(jax.random.key(2), i),
                               counters)
        d_losses.append(m["d_loss"])
        g_losses.append(m["g_loss"])

    d_band = float(np.mean(d_losses[-50:]))
    g_band = float(np.mean(g_losses[-50:]))
    print(f"gan: d_last50={d_band:.3f} g_last50={g_band:.3f}")
    # relativistic softplus equilibrium is log 2 ~ 0.69; a collapsed D
    # drives d_loss -> 0 (and g_loss -> inf), a failed D -> d_loss >> 1
    assert 0.2 < d_band < 1.3, (d_band, g_band)
    assert 0.2 < g_band < 3.0, (d_band, g_band)

    fid1 = trainer.evaluate(state, [val_batch], jax.random.key(9))["val/fid"]
    print(f"gan: fid0={fid0:.1f} fid1={fid1:.1f}")
    assert np.isfinite(fid1)
    assert fid1 < 0.6 * fid0, (fid0, fid1)


def test_perceptron_learns_separable_biomes():
    """Perceptron trainer must classify a cleanly separable synthetic
    climate->biome set at >90% held-out accuracy (reference contract
    `trainers/perceptron.py`: cross-entropy on climate 4-vectors)."""
    from terrain_diffusion_tpu.nn.perceptron import Perceptron, PerceptronConfig
    from terrain_diffusion_tpu.training.trainers.perceptron import (
        PerceptronTrainer)

    rng = np.random.default_rng(0)
    n = 4096
    temp = rng.uniform(-15, 35, n).astype(np.float32)
    precip = rng.uniform(0, 2000, n).astype(np.float32)
    t_std = rng.uniform(0, 400, n).astype(np.float32)
    p_cv = rng.uniform(0, 150, n).astype(np.float32)
    # 4 biome classes from two independent thresholds (Koppen-ish):
    # hot/cold x wet/dry — linearly separable given the inputs
    labels = (2 * (temp > 10) + (precip > 1000)).astype(np.int32)
    x = np.stack([temp / 20.0, precip / 1000.0, t_std / 200.0, p_cv / 75.0],
                 axis=-1)
    x_train, y_train = x[:3584], labels[:3584]
    x_val, y_val = x[3584:], labels[3584:]

    model = Perceptron(PerceptronConfig(in_dim=4, out_dim=4,
                                        hidden_dims=(32, 32)))
    trainer = PerceptronTrainer(
        {"training": {}},
        {"model": model, "lr_sched": ls.ConstantLRScheduler(3e-3)})
    state = trainer.init_state(jax.random.key(0))
    state["ema"] = None
    counters = {"step": 0, "seen": 0}

    b_rng = np.random.default_rng(5)
    for i in range(250):
        idx = b_rng.integers(0, len(x_train), 64)
        m = trainer.train_step(
            state, {"image": x_train[idx], "label": y_train[idx]},
            jax.random.fold_in(jax.random.key(1), i), counters)
    assert np.isfinite(m["loss"])

    logits = model.apply(state["params"], jnp.asarray(x_val))
    acc = float((np.asarray(logits).argmax(-1) == y_val).mean())
    print(f"perceptron: held-out acc={acc:.3f}")
    assert acc > 0.9, acc
