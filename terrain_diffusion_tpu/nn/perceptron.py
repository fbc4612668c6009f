"""Perceptron (MLP) — biome auxiliary model, functional JAX.

Architecture-compatible rebuild of `models/perceptron.py:20-83` (config-driven
MLP with optional random ensembles; torch naming ``nets.{k}.{2i}.weight``
handled by the loader below).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _activation(name):
    # unknown names fall back to silu — the reference resolver does the
    # same (models/perceptron.py:7-17 ends in `return nn.SiLU()`)
    name = (name or "silu").lower()
    return {
        "relu": jax.nn.relu,
        "gelu": jax.nn.gelu,
        "tanh": jnp.tanh,
        "identity": lambda x: x,
        "silu": jax.nn.silu,
    }.get(name, jax.nn.silu)


@dataclasses.dataclass(frozen=True)
class PerceptronConfig:
    in_dim: int
    out_dim: int
    hidden_dims: tuple = (128, 128)
    activation: str = "silu"
    final_activation: Optional[str] = None
    dropout: float = 0.0
    bias: bool = True
    random_ensembles: int = 1

    @classmethod
    def from_dict(cls, d: dict) -> "PerceptronConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in fields}
        if "hidden_dims" in kw and kw["hidden_dims"] is not None:
            hd = kw["hidden_dims"]
            kw["hidden_dims"] = tuple(hd) if isinstance(hd, (list, tuple)) else (hd,)
        return cls(**kw)

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["_class_name"] = "Perceptron"
        return d


class Perceptron:
    def __init__(self, config: PerceptronConfig):
        self.config = config
        self.dims = [config.in_dim, *config.hidden_dims, config.out_dim]

    def init(self, key) -> dict:
        p = {}
        for k in range(self.config.random_ensembles):
            layers = {}
            for i in range(len(self.dims) - 1):
                key, sub = jax.random.split(key)
                fan_in = self.dims[i]
                w = jax.random.uniform(sub, (fan_in, self.dims[i + 1]),
                                       minval=-1, maxval=1) / np.sqrt(fan_in)
                layers[f"l{i}"] = {"w": w}
                if self.config.bias:
                    layers[f"l{i}"]["b"] = jnp.zeros((self.dims[i + 1],))
            p[f"net{k}"] = layers
        return p

    def apply(self, params, x, ensemble_idx=None, key=None, training=False):
        act = _activation(self.config.activation)
        fact = (_activation(self.config.final_activation)
                if self.config.final_activation else None)
        drop = float(self.config.dropout)
        use_dropout = training and drop > 0.0 and key is not None
        if use_dropout:
            key, dkey = jax.random.split(key)

        def run(net, xx, dk):
            for i in range(len(self.dims) - 1):
                layer = net[f"l{i}"]
                xx = xx @ layer["w"] + layer.get("b", 0.0)
                if i < len(self.dims) - 2:
                    xx = act(xx)
                    if use_dropout:  # after each hidden activation, like
                        dk, sub = jax.random.split(dk)  # the reference's
                        keep = jax.random.bernoulli(     # nn.Dropout
                            sub, 1.0 - drop, xx.shape)
                        xx = jnp.where(keep, xx / (1.0 - drop), 0.0)
            return fact(xx) if fact else xx

        dkey = dkey if use_dropout else jax.random.key(0)
        ne = self.config.random_ensembles
        if ne == 1:
            return run(params["net0"], x, dkey)
        if ensemble_idx is None:
            if key is None:
                ensemble_idx = jnp.zeros((x.shape[0],), jnp.int32)
            else:
                ensemble_idx = jax.random.randint(key, (x.shape[0],), 0, ne)
        outs = jnp.stack([
            run(params[f"net{k}"], x, jax.random.fold_in(dkey, k))
            for k in range(ne)], axis=0)
        return jnp.take_along_axis(
            outs, ensemble_idx[None, :, None], axis=0)[0]

    def save_config(self, directory: str):
        os.makedirs(directory, exist_ok=True)
        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump(self.config.to_dict(), f, indent=2)
