"""Config-driven training entry point (reference `training/train.py:29-230`).

``python -m terrain_diffusion_tpu train --config cfg.cfg [-o key.path=val] ...``

Differences from the reference, by design:
- JAX data-parallel mesh over all local devices replaces Accelerate DDP
  (batch sharded on 'data', params replicated; XLA reduces grads over ICI);
- host-side threaded prefetch replaces DataLoader workers;
- metrics stream to stdout + ``save_dir/metrics.jsonl`` (wandb-free).
Checkpoint layout matches the reference's shape: ``latest_checkpoint/``
with ``saved_model/`` (config.json + model.safetensors), ``train_state.pkl``
and ``phema/`` snapshots.
"""
from __future__ import annotations

import json
import os
import time

import click
import numpy as np

import jax

from terrain_diffusion_tpu.parallel import make_mesh, shard_batch
from terrain_diffusion_tpu.training.registry import (
    apply_overrides,
    build_registry,
    load_config,
    resolve,
)


def run_training(config: dict, ckpt_path: str | None = None,
                 max_steps: int | None = None, log_every: int = 32):
    log_every = max(1, int(log_every))  # 0 would crash `step % log_every`
    build_registry()
    resolved = resolve(config)

    trainer_cls = resolved["trainer"]
    trainer = trainer_cls(config, resolved)

    logging_cfg = config.get("logging", {})
    save_dir = logging_cfg.get("save_dir", "checkpoints/run")
    os.makedirs(save_dir, exist_ok=True)

    tr = config.get("training", {})
    seed = int(tr.get("seed", 0))
    batch_size = int(tr.get("batch_size", 8))
    epochs = int(tr.get("epochs", 1))
    epoch_steps = int(tr.get("epoch_steps", 64))
    save_epochs = int(logging_cfg.get("save_epochs", 1))

    key = jax.random.key(seed)
    key, init_key = jax.random.split(key)
    state = trainer.init_state(init_key, save_dir=save_dir)
    counters = {"epoch": 0, "step": 0, "seen": 0}

    ckpt_dir = os.path.join(save_dir, "latest_checkpoint")
    if ckpt_path:
        counters = trainer.load_checkpoint(state, ckpt_path)
        print(f"Resumed from {ckpt_path} at step {counters['step']}")
    elif os.path.exists(os.path.join(ckpt_dir, "train_state.pkl")):
        counters = trainer.load_checkpoint(state, ckpt_dir)
        print(f"Resumed from {ckpt_dir} at step {counters['step']}")

    from terrain_diffusion_tpu.training.datasets import LongDataset, batch_iterator

    train_ds = resolved.get("train_dataset")
    if train_ds is None:
        raise ValueError("config must define [train_dataset]")
    long_ds = LongDataset(train_ds, shuffle=True, base_seed=seed)
    batches = batch_iterator(long_ds, batch_size,
                             start=counters["step"] * batch_size)

    mesh = make_mesh()
    metrics_path = os.path.join(save_dir, "metrics.jsonl")
    metrics_f = open(metrics_path, "a")

    total_steps = max_steps or epochs * epoch_steps
    ema_ckpt_every = int(config.get("ema", {}).get("checkpoint_every_num_steps", 0))
    running = {}
    t_last = time.time()
    with mesh:
        while counters["step"] < total_steps:
            batch = next(batches)
            batch = shard_batch(mesh, {
                k: v for k, v in batch.items()
                if isinstance(v, (np.ndarray, list)) and k != "path"})
            # step keys are a pure function of (seed, step): a resumed run
            # continues the exact key stream an uninterrupted run would use
            # (a sequential split chain restarted from the seed would replay
            # steps 0..N's noise against fast-forwarded data)
            step_key = jax.random.fold_in(key, counters["step"])
            metrics = trainer.train_step(state, batch, step_key, counters)
            for k, v in metrics.items():
                running.setdefault(k, []).append(v)
            step = counters["step"]
            if ema_ckpt_every and state.get("ema") and step % ema_ckpt_every == 0:
                state["ema"].checkpoint(step)
            if step % log_every == 0 or step >= total_steps:
                avg = {k: float(np.mean(v)) for k, v in running.items()}
                running.clear()
                dt = time.time() - t_last
                t_last = time.time()
                line = {"step": step, "seen": counters["seen"],
                        "sec_per_step": round(dt / max(log_every, 1), 4), **avg}
                print(json.dumps(line), flush=True)
                metrics_f.write(json.dumps(line) + "\n")
                metrics_f.flush()
            if save_epochs and step % (epoch_steps * save_epochs) == 0 \
                    and step > 0:
                counters["epoch"] = step // epoch_steps
                trainer.save_checkpoint(state, ckpt_dir, counters)
                print(f"checkpoint saved at step {step}")
            validate_epochs = int(config.get("evaluation", {}).get(
                "validate_epochs", 0))
            if (validate_epochs and step > 0
                    and step % (epoch_steps * validate_epochs) == 0
                    and resolved.get("val_dataset") is not None
                    and hasattr(trainer, "evaluate_full")):
                # independent per-step eval stream (mutating `key` here
                # would desync the train-step stream across resumes)
                ek = jax.random.fold_in(jax.random.fold_in(key, step), 1)
                ev = trainer.evaluate_full(state, resolved["val_dataset"], ek)
                line = {"step": step, **ev}
                print(json.dumps(line), flush=True)
                metrics_f.write(json.dumps(line) + "\n")
                metrics_f.flush()
    trainer.save_checkpoint(state, ckpt_dir, counters)
    metrics_f.close()
    return state, counters


@click.command()
@click.option("--config", "config_path", required=True,
              type=click.Path(exists=True))
@click.option("-o", "--override", "overrides", multiple=True,
              help="dotted config overrides key.path=value")
@click.option("--ckpt", "ckpt_path", default=None,
              help="checkpoint directory to resume from")
@click.option("--max-steps", type=int, default=None,
              help="cap total steps (debugging)")
@click.option("--log-every", type=int, default=32,
              help="metrics cadence in steps (use 1 to see per-step values "
                   "— a NaN anywhere poisons the default averaged window)")
def main(config_path, overrides, ckpt_path, max_steps, log_every):
    """Train a model from a .cfg config."""
    config = load_config(config_path)
    apply_overrides(config, overrides)
    run_training(config, ckpt_path=ckpt_path, max_steps=max_steps,
                 log_every=log_every)


if __name__ == "__main__":
    main()
