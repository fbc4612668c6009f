"""Training utilities (reference `training/utils.py:8-91`)."""
from __future__ import annotations

import contextlib
import json
import os
import shutil

import jax
import numpy as np


class SerializableDict(dict):
    """Attribute-style dict with JSON round-trip (reference
    SerializableEasyDict: epoch/step/seen counters)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def state_dict(self):
        return dict(self)

    def load_state_dict(self, state):
        self.update(state)

    def save(self, path):
        with open(path, "w") as f:
            json.dump(dict(self), f)

    @classmethod
    def load(cls, path):
        with open(path) as f:
            return cls(json.load(f))


@contextlib.contextmanager
def temporary_params(holder: dict, key: str, new_params):
    """Temporarily swap a params entry (functional analogue of the
    reference's `temporary_ema_to_model` context, utils.py:27-59): evaluate
    with EMA weights, restore training weights on exit."""
    old = holder[key]
    holder[key] = new_params
    try:
        yield holder
    finally:
        holder[key] = old


_CHECKPOINT_EXTENSIONS = (".safetensors", ".pkl", ".json", ".npz", ".msgpack",
                          ".txt", ".jsonl")


def safe_rmtree(path: str):
    """Remove a checkpoint directory, refusing if it contains files that do
    not look like checkpoint artifacts (reference `safe_rmtree`,
    utils.py:61-72 — protects against deleting user data)."""
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.endswith(_CHECKPOINT_EXTENSIONS):
                raise RuntimeError(
                    f"refusing to delete {path}: non-checkpoint file {f!r}")
    shutil.rmtree(path)


def recursive_to_numpy(tree):
    return jax.tree.map(np.asarray, tree)


def recursive_to_device(tree, sharding=None):
    if sharding is None:
        return jax.tree.map(jax.numpy.asarray, tree)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def set_nested_value(config: dict, dotted_key: str, value):
    from terrain_diffusion_tpu.training.registry import set_nested_value as _s

    return _s(config, dotted_key, value)
