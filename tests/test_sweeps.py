"""Sweep harness: TPE sampling, probability pruning, storage interop, and an
end-to-end tiny-model KID objective."""
import json

import numpy as np
import pytest

from terrain_diffusion_tpu.training.sweeps.sweep import (
    SweepSpace,
    TPESampler,
    export_optuna_trials,
    import_optuna_trials,
    prune_probability,
    run_sweep,
)


def test_tpe_beats_random_on_quadratic():
    space = SweepSpace({"x": (0.0, 1.0, False), "y": (0.1, 10.0, True)})

    def objective(p):
        return (p["x"] - 0.3) ** 2 + (np.log10(p["y"]) - 0.5) ** 2

    best = run_sweep(objective, space, n_trials=40, seed=0,
                     n_startup_trials=8)
    # pure Halton over 40 trials rarely beats 0.01 on this 2-D bowl; TPE
    # concentrates near the optimum
    assert best["value"] < 0.01, best
    assert abs(best["params"]["x"] - 0.3) < 0.1


def test_pruning_stops_bad_trials():
    space = SweepSpace({"x": (0.0, 1.0, False)})
    evals = {"full": 0, "pruned": 0}

    def objective(p, report):
        mean = (p["x"] - 0.5) ** 2
        # three intermediate reports with shrinking uncertainty
        for std in (0.05, 0.02, 0.005):
            if report(mean, std):
                evals["pruned"] += 1
                return mean, std
        evals["full"] += 1
        return mean, 0.005

    best = run_sweep(objective, space, n_trials=24, seed=1,
                     prune_probability_threshold=0.05)
    assert evals["pruned"] > 0, "no trial was ever pruned"
    assert evals["full"] > 0
    assert best["value"] < 0.01


def test_prune_probability_rule():
    trials = [{"value": 0.1, "value_std": 0.01}]
    # current trial much worse than the completed one -> prune
    assert prune_probability(0.5, 0.01, trials, threshold=0.05)
    # current trial comparable -> keep
    assert not prune_probability(0.11, 0.01, trials, threshold=0.05)
    # trials without std never prune
    assert not prune_probability(0.5, 0.01, [{"value": 0.1}], threshold=0.05)


def test_optuna_storage_roundtrip(tmp_path):
    trials = [
        {"index": 0, "params": {"x": 0.2}, "value": 1.0, "value_std": 0.1,
         "pruned": False},
        {"index": 1, "params": {"x": 0.7}, "value": 2.0, "value_std": None,
         "pruned": True},
    ]
    path = str(tmp_path / "optuna.json")
    export_optuna_trials(trials, path)
    back = import_optuna_trials(path)
    assert back[0]["value"] == 1.0 and back[0]["value_std"] == 0.1
    assert back[1]["pruned"] is True
    # raw file is Optuna-shaped
    raw = json.load(open(path))
    assert raw[0]["state"] == "COMPLETE" and raw[1]["state"] == "PRUNED"
    assert raw[0]["user_attrs"]["kid_std"] == 0.1


def test_storage_resume(tmp_path):
    space = SweepSpace({"x": (0.0, 1.0, False)})
    storage = str(tmp_path / "trials.jsonl")

    def objective(p):
        return (p["x"] - 0.4) ** 2

    run_sweep(objective, space, n_trials=5, storage=storage, seed=0)
    best = run_sweep(objective, space, n_trials=10, storage=storage, seed=0)
    with open(storage) as f:
        lines = [json.loads(line) for line in f if line.strip()]
    assert len(lines) == 10  # resumed, not restarted
    assert best["value"] <= min(t["value"] for t in lines[:5])


@pytest.mark.slow
def test_e2e_kid_objective_sweep(rng):
    """Drive run_sweep against a REAL KID objective: a tiny decoder's output
    distribution vs a reference set, sweeping an output gain whose optimum
    is gain=1 (where fake matches real)."""
    import jax

    from terrain_diffusion_tpu.evaluation.metrics import (
        compute_kid,
        normalize_terrain_for_metric,
    )
    from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig

    model = EDMUnet2D(EDMUnetConfig(
        image_size=32, in_channels=2, out_channels=1, model_channels=8,
        model_channel_mults=(1,), layers_per_block=1, attn_resolutions=(),
        midblock_attention=False, noise_emb_dims=8, logvar_channels=8))
    params = jax.jit(model.init)(jax.random.key(0))
    fwd = jax.jit(lambda p, x, nl: model.apply(p, x, nl))

    x = rng.standard_normal((24, 32, 32, 2)).astype(np.float32)
    nl = np.full((24,), 0.7, np.float32)
    base = np.asarray(fwd(params, x, nl))  # "real" distribution at gain 1

    real = normalize_terrain_for_metric(base[..., :1] * 40.0)

    def objective(p, report):
        fake = normalize_terrain_for_metric(base[..., :1] * 40.0 * p["gain"])
        # intermediate estimate on half the images, then the full set
        m0, s0 = compute_kid(real[:12], fake[:12], n_subsets=8, subset_size=6)
        if report(m0, max(s0, 1e-6)):
            return m0, max(s0, 1e-6)
        m, s = compute_kid(real, fake, n_subsets=8, subset_size=12)
        return m, max(s, 1e-6)

    space = SweepSpace({"gain": (0.25, 4.0, True)})
    best = run_sweep(objective, space, n_trials=10, seed=0,
                     n_startup_trials=4, prune_probability_threshold=0.1)
    assert 0.6 < best["params"]["gain"] < 1.7, best


def test_pruned_trials_never_win():
    """A pruned trial's low-budget noisy estimate must not be returned as
    the sweep winner (reference: Optuna best_trial considers COMPLETE
    trials only).  With an aggressive threshold the rule prunes trials
    whose noisy mean is slightly BETTER than the incumbent, so without the
    completed-only filter the pruned estimate would win min()."""
    space = SweepSpace({"x": (0.0, 1.0, False)})
    state = {"i": -1}

    def objective(p, report):
        state["i"] += 1
        if state["i"] == 0:
            return 0.5, 0.0  # completes; the true best completed value
        # noisy mean marginally better than the incumbent -> pruned at an
        # aggressive threshold, recorded value 0.49 < 0.5
        report(0.49, 1.0)
        return 0.49, 1.0

    best = run_sweep(objective, space, n_trials=5, seed=3,
                     prune_probability_threshold=0.9999)
    assert best["value"] == 0.5 and not best.get("pruned")
