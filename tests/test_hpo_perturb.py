"""Builtin-HPO incumbent perturbation (round-5 verdict weak #4).

The no-Optuna fallback used to sample blind for the whole study; now
post-warmup odd trials refine the incumbent locally.  The toy objective
is a deterministic smooth bowl whose optimum sits inside the space, so
local refinement provably pays — the adaptive study must beat the pure
quasi-random one from the identical seed and budget.
"""

import math

import numpy as np

from rcnn_ocr_tpu.hpo.driver import DEFAULT_SPACE, perturb_params, run_hpo

SPACE = {
    "lr": ("log", 1e-5, 1e-2),
    "momentum": ("float", 0.8, 0.99),
    "rotate_limit": ("int", 0, 8),
    "optimizer": ("cat", ("Adam", "AdamW", "SGD")),
}


def _toy_objective(base, params, trial_dir):
    # optimum: lr=3e-4, momentum=0.9, rotate=3, Adam — a narrow bowl:
    # 24 quasi-random samples rarely land near it, local refinement does
    v = -10.0 * ((math.log10(params["lr"]) + 3.52) ** 2)
    v -= 400.0 * (params["momentum"] - 0.9) ** 2
    v -= 0.05 * (params["rotate_limit"] - 3) ** 2
    v -= 0.0 if params["optimizer"] == "Adam" else 0.3
    return v


def test_perturb_params_stays_in_space():
    rng = np.random.default_rng(0)
    incumbent = {
        "lr": 3e-4, "momentum": 0.9, "rotate_limit": 3, "optimizer": "Adam",
    }
    for _ in range(200):
        p = perturb_params(incumbent, SPACE, rng)
        assert 1e-5 <= p["lr"] <= 1e-2
        assert 0.8 <= p["momentum"] <= 0.99
        assert 0 <= p["rotate_limit"] <= 8
        assert p["optimizer"] in ("Adam", "AdamW", "SGD")
    # params missing from the incumbent sample fresh instead of crashing
    p = perturb_params({}, SPACE, rng)
    assert set(p) == set(SPACE)


def test_perturbation_beats_pure_quasirandom(tmp_path):
    # odd post-warmup trials are REPLACED by perturbations, so the
    # guarantee is statistical, not per-seed (a replaced exploration
    # sample occasionally would have won): across 8 seeds require a
    # positive mean improvement and a solid win count.  Measured at
    # authoring time: mean +0.18, 5 wins / 2 ties / 1 loss.
    diffs = []
    for seed in (3, 7, 11, 19, 23, 31, 41, 57):
        kw = dict(
            n_trials=24, space=SPACE, objective=_toy_objective, seed=seed,
            prune=False,
        )
        adaptive = run_hpo(
            {}, study_name=f"adaptive{seed}",
            storage_dir=str(tmp_path / f"a{seed}"), **kw,
        )
        blind = run_hpo(
            {}, study_name=f"blind{seed}",
            storage_dir=str(tmp_path / f"b{seed}"), perturb=False, **kw,
        )
        diffs.append(adaptive["best_value"] - blind["best_value"])
        samplers = {t["sampler"] for t in adaptive["trials"]}
        assert samplers == {"quasi-random", "perturb"}
        assert all(t["sampler"] == "quasi-random" for t in blind["trials"])
    wins = sum(d > 1e-6 for d in diffs)
    losses = sum(d < -1e-6 for d in diffs)
    assert sum(diffs) / len(diffs) > 0.05, diffs
    assert wins >= 4 and losses <= 2, diffs


def test_default_space_perturbs():
    rng = np.random.default_rng(1)
    incumbent = {
        "lr": 1e-3, "weight_decay": 1e-5, "momentum": 0.9,
        "hidden_size": 256, "lstm_layers": 2, "optimizer": "Adam",
        "scheduler": "ReduceLROnPlateau", "shift_limit": 0.03,
        "scale_limit": 0.08, "rotate_limit": 3, "p_ShiftScaleRotate": 0.3,
        "brightness_limit": 0.2, "contrast_limit": 0.2,
        "p_BrightnessContrast": 0.3, "invert_p": 0.0,
    }
    p = perturb_params(incumbent, DEFAULT_SPACE, rng)
    assert set(p) == set(DEFAULT_SPACE)
