"""Post-hoc EMA (Karras et al. 2024, "Analyzing and Improving the Training
Dynamics of Diffusion Models", arXiv 2312.02696 App. B).

Replaces the reference's ema-pytorch PostHocEMA dependency
(`training/train.py:139-165`, `save_model.py:40-47`): maintain a small set of
power-function EMA profiles online (sigma_rels, e.g. [0.05, 0.1]), snapshot
them periodically, then *after training* synthesize the EMA profile of any
target sigma_rel by least-squares mixing of the stored snapshots.
"""
from __future__ import annotations

import os
import pickle
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def sigma_rel_to_gamma(sigma_rel: float) -> float:
    """Invert sigma_rel = sqrt((gamma+1)/((gamma+2)^2 (gamma+3))) (paper eq. 31)."""
    t = sigma_rel**-2
    # solve the cubic gamma^3 + 7g^2 + (16 - t) g + (12 - t) = 0, take real root
    roots = np.roots([1.0, 7.0, 16.0 - t, 12.0 - t])
    real = roots[np.isreal(roots)].real
    return float(np.max(real))


def _p_dot_p(t_a, gamma_a, t_b, gamma_b):
    """Inner product of two power-function EMA profiles (paper eq. 36)."""
    t_ratio = t_a / t_b
    t_exp = np.where(t_a < t_b, gamma_b, -gamma_a)
    t_max = np.maximum(t_a, t_b)
    num = (gamma_a + 1) * (gamma_b + 1) * t_ratio**t_exp
    den = (gamma_a + gamma_b + 1) * t_max
    return num / den


def solve_weights(t_i: np.ndarray, gamma_i: np.ndarray, t_r: float,
                  gamma_r: float) -> np.ndarray:
    """Least-squares snapshot weights reconstructing profile (t_r, gamma_r)."""
    rv = lambda x: np.float64(x).reshape(-1, 1)
    cv = lambda x: np.float64(x).reshape(1, -1)
    A = _p_dot_p(rv(t_i), rv(gamma_i), cv(t_i), cv(gamma_i))
    b = _p_dot_p(rv(t_i), rv(gamma_i), cv([t_r]), cv([gamma_r]))
    return np.linalg.solve(A, b).reshape(-1)


class PostHocEMA:
    """Online power-EMA tracker with periodic snapshots.

    Usage:
        ema = PostHocEMA(params, sigma_rels=(0.05, 0.1), folder="ckpt/phema")
        ema.update(params, step)                 # every step
        ema.checkpoint(step)                     # periodically
        synth = ema.synthesize(sigma_rel=0.2)    # post-training
    """

    def __init__(self, params, sigma_rels: Sequence[float] = (0.05, 0.1),
                 folder: str | None = None, update_every: int = 1):
        self.sigma_rels = tuple(float(s) for s in sigma_rels)
        self.gammas = tuple(sigma_rel_to_gamma(s) for s in self.sigma_rels)
        self.emas = [jax.tree.map(jnp.asarray, params) for _ in self.sigma_rels]
        self.folder = folder
        self.update_every = update_every
        if folder:
            os.makedirs(folder, exist_ok=True)

    def update(self, params, step: int):
        if step % self.update_every != 0:
            return
        t = max(step, 1)
        for i, gamma in enumerate(self.gammas):
            beta = (1 - 1 / t) ** (gamma + 1)
            self.emas[i] = jax.tree.map(
                lambda e, p, b=beta: e * b + p * (1 - b), self.emas[i], params)

    def checkpoint(self, step: int):
        if not self.folder:
            raise ValueError("no snapshot folder configured")
        for sr, ema in zip(self.sigma_rels, self.emas):
            path = os.path.join(self.folder, f"{sr}.{step}.pkl")
            with open(path, "wb") as f:
                pickle.dump(jax.tree.map(np.asarray, ema), f)

    def shortest(self):
        """The lowest-sigma_rel (least-smoothed) EMA params — config order
        of sigma_rels is preserved in self.emas, so index 0 is NOT
        necessarily the shortest profile."""
        i = min(range(len(self.sigma_rels)), key=lambda k: self.sigma_rels[k])
        return self.emas[i]

    # -- persistence of the live state (train resume) -------------------
    def state_dict(self):
        return {"sigma_rels": self.sigma_rels,
                "emas": [jax.tree.map(np.asarray, e) for e in self.emas]}

    def load_state_dict(self, state):
        assert tuple(state["sigma_rels"]) == self.sigma_rels
        self.emas = [jax.tree.map(jnp.asarray, e) for e in state["emas"]]

    # -- post-hoc synthesis ---------------------------------------------
    @staticmethod
    def list_snapshots(folder: str):
        out = []
        for name in sorted(os.listdir(folder)):
            if name.endswith(".pkl"):
                sr, step = name[:-4].rsplit(".", 1)
                out.append((float(sr), int(step), os.path.join(folder, name)))
        return out

    @classmethod
    def synthesize_from_folder(cls, folder: str, sigma_rel: float,
                               step: int | None = None):
        """Least-squares EMA synthesis from stored snapshots
        (equivalent of ema-pytorch `synthesize_ema_model`)."""
        snaps = cls.list_snapshots(folder)
        if step is not None:
            snaps = [s for s in snaps if s[1] <= step]
        if not snaps:
            raise ValueError(f"no snapshots in {folder}")
        t_max = max(s[1] for s in snaps)
        t_i = np.array([max(s[1], 1) for s in snaps], dtype=np.float64)
        gamma_i = np.array([sigma_rel_to_gamma(s[0]) for s in snaps])
        gamma_r = sigma_rel_to_gamma(sigma_rel)
        w = solve_weights(t_i, gamma_i, float(step or t_max), gamma_r)
        out = None
        for weight, (_sr, _st, path) in zip(w, snaps):
            with open(path, "rb") as f:
                snap = pickle.load(f)
            if out is None:
                out = jax.tree.map(lambda x, wt=weight: np.asarray(x) * wt, snap)
            else:
                out = jax.tree.map(lambda a, x, wt=weight: a + np.asarray(x) * wt,
                                   out, snap)
        return jax.tree.map(jnp.asarray, out)

    def synthesize(self, sigma_rel: float, step: int | None = None):
        return self.synthesize_from_folder(self.folder, sigma_rel, step)
