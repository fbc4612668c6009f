"""Trainer base protocol (reference `trainers/trainer.py:3-37` shape, JAX).

A trainer owns: model(s), the pure loss function, the optimizer, EMA, and
(de)serialization of its training state.  The train loop (`train.py`) drives
`train_step` with host-prefetched numpy batches under a data-parallel mesh.
"""
from __future__ import annotations

import os
import pickle

import jax
import numpy as np

from terrain_diffusion_tpu.nn import torch_compat
from terrain_diffusion_tpu.training.phema import PostHocEMA


class TrainerBase:
    model = None  # set by subclass

    def init_state(self, key) -> dict:
        raise NotImplementedError

    def train_step(self, state: dict, batch: dict, key) -> tuple[dict, dict]:
        raise NotImplementedError

    def evaluate(self, state: dict, key) -> dict:
        return {}

    # -- checkpointing --------------------------------------------------
    def save_checkpoint(self, state: dict, path: str, counters: dict):
        os.makedirs(path, exist_ok=True)
        torch_compat.save_model(self.model, jax.tree.map(np.asarray, state["params"]),
                                os.path.join(path, "saved_model"))
        with open(os.path.join(path, "train_state.pkl"), "wb") as f:
            pickle.dump({
                "opt_state": jax.tree.map(np.asarray, state["opt_state"]),
                "ema": state["ema"].state_dict() if state.get("ema") else None,
                "counters": counters,
            }, f)

    def load_checkpoint(self, state: dict, path: str) -> dict:
        _, params = torch_compat.load_model(os.path.join(path, "saved_model"))
        state["params"] = params
        with open(os.path.join(path, "train_state.pkl"), "rb") as f:
            blob = pickle.load(f)
        state["opt_state"] = jax.tree.map(
            lambda ref, v: v, state["opt_state"], blob["opt_state"])
        if blob.get("ema") and state.get("ema"):
            state["ema"].load_state_dict(blob["ema"])
        return blob["counters"]

    def get_model_for_saving(self):
        return self.model


def ema_for(params, config: dict, save_dir: str | None) -> PostHocEMA:
    ema_cfg = config.get("ema", {})
    folder = os.path.join(save_dir, "phema") if save_dir else None
    return PostHocEMA(
        params,
        sigma_rels=tuple(ema_cfg.get("sigma_rels", [0.05, 0.1])),
        folder=folder,
        update_every=int(ema_cfg.get("update_every", 1)),
    )
