"""Hyperparameter sweeps over EMA length / step / guidance scale
(reference `training/sweeps/sweep_*.py` + TRAINING.md:60-104).

The reference uses Optuna TPE with pruning; this first-party harness runs
quasi-random (scrambled Halton) exploration followed by local refinement
around the incumbent — the same search space and objective (stage KID), with
JSON-lines trial storage for resumability (`--storage trials.jsonl`).
"""
from __future__ import annotations

import json
import os

import click
import numpy as np


def halton(index: int, base: int) -> float:
    f, r = 1.0, 0.0
    i = index + 1
    while i > 0:
        f /= base
        r += f * (i % base)
        i //= base
    return r


class SweepSpace:
    def __init__(self, spec: dict):
        # spec: name -> (lo, hi, log?)
        self.spec = spec
        self.names = list(spec)

    def sample_quasirandom(self, idx: int) -> dict:
        primes = [2, 3, 5, 7, 11, 13][: len(self.names)]
        out = {}
        for name, p in zip(self.names, primes):
            lo, hi, log = self.spec[name]
            u = halton(idx, p)
            if log:
                out[name] = float(np.exp(np.log(lo) + u * (np.log(hi) - np.log(lo))))
            else:
                out[name] = float(lo + u * (hi - lo))
        return out

    def sample_near(self, center: dict, rng, shrink: float = 0.2) -> dict:
        out = {}
        for name in self.names:
            lo, hi, log = self.spec[name]
            c = center[name]
            if log:
                span = (np.log(hi) - np.log(lo)) * shrink
                v = np.exp(np.log(c) + rng.normal() * span / 2)
            else:
                span = (hi - lo) * shrink
                v = c + rng.normal() * span / 2
            out[name] = float(np.clip(v, lo, hi))
        return out


def run_sweep(objective, space: SweepSpace, n_trials: int = 40,
              n_explore: int | None = None, storage: str | None = None,
              seed: int = 0) -> dict:
    """Minimize `objective(params_dict) -> float`; returns the best trial."""
    trials = []
    if storage and os.path.exists(storage):
        with open(storage) as f:
            trials = [json.loads(line) for line in f if line.strip()]
        print(f"resumed {len(trials)} trials from {storage}")
    rng = np.random.default_rng(seed)
    n_explore = n_explore if n_explore is not None else max(n_trials // 2, 8)

    def record(params, value):
        t = {"params": params, "value": value, "index": len(trials)}
        trials.append(t)
        if storage:
            with open(storage, "a") as f:
                f.write(json.dumps(t) + "\n")
        return t

    while len(trials) < n_trials:
        i = len(trials)
        if i < n_explore or not trials:
            params = space.sample_quasirandom(i)
        else:
            best = min(trials, key=lambda t: t["value"])
            params = space.sample_near(best["params"], rng)
        value = float(objective(params))
        t = record(params, value)
        print(f"trial {i}: value={value:.5f} params={params}")
    best = min(trials, key=lambda t: t["value"])
    print(f"best: value={best['value']:.5f} params={best['params']}")
    return best


@click.command()
@click.argument("checkpoint_dir", type=click.Path(exists=True))
@click.option("--mode", type=click.Choice(
    ["diffusion_base", "consistency_base", "diffusion_decoder",
     "consistency_decoder", "autoencoder"]), required=True)
@click.option("--h5-file", required=True)
@click.option("--n-trials", type=int, default=40)
@click.option("--kid-n-images", type=int, default=256)
@click.option("--storage", default=None, help="JSONL trial store (resumable)")
@click.option("--min-ema-sigma", type=float, default=0.015)
@click.option("--max-ema-sigma", type=float, default=0.25)
@click.option("--min-guidance-scale", type=float, default=1.0)
@click.option("--max-guidance-scale", type=float, default=2.4)
@click.option("--guide-path", default=None)
@click.option("--seed", type=int, default=0)
def main(checkpoint_dir, mode, h5_file, n_trials, kid_n_images, storage,
         min_ema_sigma, max_ema_sigma, min_guidance_scale, max_guidance_scale,
         guide_path, seed):
    """Sweep EMA sigma_rel (+ guidance scale) against stage KID."""
    import tempfile

    import jax
    import numpy as np_

    from terrain_diffusion_tpu.evaluation.stage_eval import run_stage_eval
    from terrain_diffusion_tpu.nn import torch_compat
    from terrain_diffusion_tpu.training.phema import PostHocEMA

    spec = {"ema_sigma": (min_ema_sigma, max_ema_sigma, True)}
    if "consistency" in mode or guide_path:
        spec["guidance_scale"] = (min_guidance_scale, max_guidance_scale, False)
    if mode == "consistency_base":
        spec["inter_t"] = (0.3, 1.0, False)
    space = SweepSpace(spec)

    model, _ = torch_compat.load_model(os.path.join(checkpoint_dir, "saved_model"))
    phema_dir = os.path.join(checkpoint_dir, "phema")
    stage = {"diffusion_base": "base_diffusion",
             "consistency_base": "base_consistency",
             "diffusion_decoder": "decoder_diffusion",
             "consistency_decoder": "decoder_consistency",
             "autoencoder": "base_diffusion"}[mode]

    def objective(params):
        ema_params = PostHocEMA.synthesize_from_folder(phema_dir, params["ema_sigma"])
        with tempfile.TemporaryDirectory() as td:
            torch_compat.save_model(model, jax.tree.map(np_.asarray, ema_params), td)
            out = run_stage_eval(
                stage, td, h5_file, guide_path=guide_path,
                guidance_scale=params.get("guidance_scale", 1.0),
                n_images=kid_n_images, seed=seed)
        return out["kid_mean"]

    run_sweep(objective, space, n_trials=n_trials, storage=storage, seed=seed)


if __name__ == "__main__":
    main()
