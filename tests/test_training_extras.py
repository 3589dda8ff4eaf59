"""Additional training-loop integration coverage: explicit val sets,
eval_every throttling, blank-bearing charsets, HPO over real training."""

import csv as csv_mod
import os

import numpy as np
import pytest

from rcnn_ocr_tpu.training.config import Config
from rcnn_ocr_tpu.training.train import run_training
from tests.helpers import make_synthetic_dataset, tiny_labels

CHARSET_TOKENS = ["<PAD>", "<SOS>", "<EOS>", " "] + list("abcdefghij")


def _write_charset(path, tokens):
    path.write_text("\n".join(tokens) + "\n", encoding="utf-8")
    return str(path)


def _cfg(tmp, charset, train, exp_dir, **overrides):
    cfg = {
        "train_csvs": [train[0]],
        "train_roots": [train[1]],
        "charset_path": charset,
        "img_h": 32,
        "img_w": 64,
        "max_len": 6,
        "hidden_size": 16,
        "width_mult": 0.125,
        "lstm_layers": 1,
        "batch_size": 8,
        "epochs": 2,
        "val_size": 6,
        "eval_every": 1,
        "seed": 0,
        "compute_dtype": "float32",
        "use_pallas": False,
        "exp_dir": exp_dir,
        "num_workers": 2,
    }
    cfg.update(overrides)
    return Config(cfg)


@pytest.mark.slow
def test_explicit_val_sets_and_eval_every(tmp_path):
    charset = _write_charset(tmp_path / "cs.txt", CHARSET_TOKENS)
    train = make_synthetic_dataset(str(tmp_path / "tr"), tiny_labels(16))
    val = make_synthetic_dataset(str(tmp_path / "va"), tiny_labels(6, seed=9))
    exp_dir = str(tmp_path / "exp")
    cfg = _cfg(
        tmp_path,
        charset,
        train,
        exp_dir,
        val_csvs=[val[0]],
        val_roots=[val[1]],
        epochs=3,
        eval_every=2,
    )
    result = run_training(cfg)
    assert np.isfinite(result["val_loss"])
    rows = list(
        csv_mod.DictReader(
            open(os.path.join(exp_dir, "metrics_epoch.csv"), encoding="utf-8")
        )
    )
    assert len(rows) == 3
    # eval_every=2 from start_epoch=1: epochs 1 and 3 evaluated, 2 skipped
    assert rows[0]["val_loss"] != "skipped"
    assert rows[1]["val_loss"] == "skipped"
    assert rows[2]["val_loss"] != "skipped"
    # separate val set means the training CSV row count is untouched
    assert "train.log" in os.listdir(exp_dir)


@pytest.mark.slow
def test_blank_charset_masks_logits(tmp_path):
    """A charset WITH <BLANK> drives blank masking + CTC blank selection."""
    tokens = ["<PAD>", "<SOS>", "<EOS>", "<BLANK>"] + list("abcdefghij")
    charset = _write_charset(tmp_path / "cs.txt", tokens)
    train = make_synthetic_dataset(str(tmp_path / "tr"), tiny_labels(14))
    exp_dir = str(tmp_path / "exp")
    cfg = _cfg(tmp_path, charset, train, exp_dir, epochs=1, head="both", val_size=4)
    result = run_training(cfg)
    assert np.isfinite(result["val_loss"])

    # the saved checkpoint decodes with blank never predicted (masked -1e4)
    import jax.numpy as jnp

    from rcnn_ocr_tpu.inference import OCRInference

    ocr = OCRInference(
        os.path.join(exp_dir, "last_ckpt.msgpack"),
        charset,
        img_h=32,
        img_w=64,
        dtype=jnp.float32,
        verbose=False,
    )
    assert ocr.charset.blank_id == 3
    assert ocr.charset.ctc_blank_id == 3
    img = np.full((20, 40, 3), 255, np.uint8)
    run = ocr._greedy_fn(7)
    pred, _ = run(ocr.variables, jnp.asarray(np.stack([ocr._preprocess(img)])))
    assert not (np.asarray(pred) == 3).any()  # blank masked out of argmax


@pytest.mark.slow
def test_hpo_over_real_training(tmp_path):
    from rcnn_ocr_tpu.hpo.driver import run_hpo

    charset = _write_charset(tmp_path / "cs.txt", CHARSET_TOKENS)
    train = make_synthetic_dataset(str(tmp_path / "tr"), tiny_labels(14))
    base = {
        "train_csvs": [train[0]],
        "train_roots": [train[1]],
        "charset_path": charset,
        "img_h": 32,
        "img_w": 64,
        "max_len": 6,
        "width_mult": 0.125,
        "batch_size": 8,
        "epochs": 1,
        "val_size": 4,
        "seed": 0,
        "compute_dtype": "float32",
        "use_pallas": False,
        "num_workers": 2,
    }
    space = {
        "lr": ("log", 1e-4, 1e-2),
        "hidden_size": ("cat", (16,)),
        "lstm_layers": ("cat", (1,)),
    }
    out = run_hpo(
        base, n_trials=2, study_name="mini", storage_dir=str(tmp_path / "hpo"),
        space=space, seed=0,
    )
    assert len(out["trials"]) == 2
    assert out["best_params"] is not None
    assert os.path.exists(tmp_path / "hpo" / "mini_results.json")
    # each trial produced its own experiment dir with a checkpoint
    assert os.path.exists(tmp_path / "hpo" / "mini_trial0" / "last_ckpt.msgpack")


def test_hpo_parallel_trials_partition_the_mesh(tmp_path):
    """parallel_trials=2 on 8 virtual devices: every trial runs on its own
    4-device submesh (device_scope -> make_mesh), both submeshes get used,
    and the study log covers all trials."""
    import threading
    import time as time_mod

    from rcnn_ocr_tpu.hpo.driver import run_hpo
    from rcnn_ocr_tpu.parallel.mesh import make_mesh

    seen = []
    lock = threading.Lock()

    def objective(base, params, trial_dir):
        mesh = make_mesh()  # must honor the trial's device_scope
        devs = tuple(int(d.id) for d in mesh.devices.flat)
        with lock:
            seen.append(devs)
        time_mod.sleep(0.2)  # force trial overlap so both groups are held
        return float(params["lr"])

    out = run_hpo(
        {}, n_trials=4, study_name="par", storage_dir=str(tmp_path / "hpo"),
        space={"lr": ("float", 0.0, 1.0)}, seed=0, objective=objective,
        parallel_trials=2, prune=False,  # 3-arg objective: pruning n/a
    )
    assert len(out["trials"]) == 4
    assert [t["number"] for t in out["trials"]] == [0, 1, 2, 3]
    assert all(len(d) == 4 for d in seen)
    groups = set(seen)
    assert len(groups) == 2  # two distinct submeshes
    a, b = groups
    assert not set(a) & set(b)  # disjoint chips


@pytest.mark.slow
def test_hpo_parallel_real_training(tmp_path):
    """Two REAL run_training trials concurrently, one per 4-device submesh."""
    from rcnn_ocr_tpu.hpo.driver import run_hpo

    charset = _write_charset(tmp_path / "cs.txt", CHARSET_TOKENS)
    train = make_synthetic_dataset(str(tmp_path / "tr"), tiny_labels(14))
    base = {
        "train_csvs": [train[0]],
        "train_roots": [train[1]],
        "charset_path": charset,
        "img_h": 32,
        "img_w": 64,
        "max_len": 6,
        "width_mult": 0.125,
        "batch_size": 8,
        "epochs": 1,
        "val_size": 4,
        "seed": 0,
        "compute_dtype": "float32",
        "use_pallas": False,
        "num_workers": 2,
        "progress": False,
    }
    space = {
        "lr": ("log", 1e-4, 1e-2),
        "hidden_size": ("cat", (16,)),
        "lstm_layers": ("cat", (1,)),
    }
    out = run_hpo(
        base, n_trials=2, study_name="minipar",
        storage_dir=str(tmp_path / "hpo"), space=space, seed=0,
        parallel_trials=2,
    )
    assert len(out["trials"]) == 2
    assert all(np.isfinite(t["value"]) for t in out["trials"])


def test_hpo_warns_when_pruning_cannot_reach_objective(tmp_path):
    """prune=True with a 3-arg custom objective used to silently run every
    trial to completion — now it warns up front (round-4 review), and a
    report-accepting objective stays quiet."""
    import warnings

    from rcnn_ocr_tpu.hpo.driver import run_hpo

    def objective3(base, params, trial_dir):
        return float(params["lr"])

    def objective4(base, params, trial_dir, report):
        return float(params["lr"])

    space = {"lr": ("float", 0.0, 1.0)}
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        run_hpo(
            {}, n_trials=2, study_name="warn3",
            storage_dir=str(tmp_path / "hpo3"), space=space, seed=0,
            objective=objective3, prune=True,
        )
    assert any("does not accept" in str(w.message) for w in caught)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        run_hpo(
            {}, n_trials=2, study_name="warn4",
            storage_dir=str(tmp_path / "hpo4"), space=space, seed=0,
            objective=objective4, prune=True,
        )
    assert not any("does not accept" in str(w.message) for w in caught)


def test_successive_halving_pruner_logic():
    """Rungs at 1/3/9...; a value below the rung's top-1/eta threshold is
    pruned once the rung has eta reports; non-rung epochs never prune."""
    from rcnn_ocr_tpu.hpo import SuccessiveHalvingPruner

    pr = SuccessiveHalvingPruner(min_resource=1, eta=3)
    assert pr.report(2, 0.1) is False  # not a rung epoch
    assert pr.report(1, 0.9) is False  # thin history: first two never prune
    assert pr.report(1, 0.8) is False
    assert pr.report(1, 0.1) is True  # bottom of [0.9, 0.8, 0.1]
    assert pr.report(1, 0.95) is False  # new top survives
    # rung 3 is independent of rung 1's history
    assert pr.report(3, 0.01) is False


def test_hpo_builtin_pruning_cuts_epochs(tmp_path):
    """A >= 8-trial toy study (VERDICT r3 missing #4): pruning measurably
    cuts total epochs vs the unpruned study while the best value is
    unchanged (the leader at every rung survives by construction)."""
    from rcnn_ocr_tpu.hpo import PrunedTrial, run_hpo

    MAX_EPOCHS = 9

    def objective(base, params, trial_dir, report=None):
        # deterministic per-trial quality from the sampled lr
        q = params["lr"]
        value = 0.0
        for epoch in range(1, MAX_EPOCHS + 1):
            value = q * epoch / MAX_EPOCHS
            if report is not None and report(epoch, value):
                raise PrunedTrial(value, epoch)
        return value

    space = {"lr": ("float", 0.1, 0.9)}

    def total_epochs(out):
        return sum(
            t["epochs_run"] if t.get("epochs_run") else MAX_EPOCHS
            for t in out["trials"]
        )

    pruned = run_hpo(
        {}, n_trials=10, study_name="p", storage_dir=str(tmp_path / "p"),
        space=space, objective=objective, seed=3, prune=True,
    )
    unpruned = run_hpo(
        {}, n_trials=10, study_name="u", storage_dir=str(tmp_path / "u"),
        space=space, objective=objective, seed=3, prune=False,
    )
    assert sum(1 for t in pruned["trials"] if t["pruned"]) >= 2
    assert not any(t["pruned"] for t in unpruned["trials"])
    assert total_epochs(pruned) < total_epochs(unpruned)
    assert pruned["best_value"] == pytest.approx(unpruned["best_value"])


def test_hpo_optuna_backend_pruning_wiring(tmp_path, monkeypatch):
    """The Optuna branch's report/should_prune/TrialPruned wiring,
    exercised against a faithful stub module (optuna is not installed in
    this environment): pruned trials raise TrialPruned AFTER run_training
    returned cleanly, carry epochs_run, and land as PRUNED in the log."""
    import sys
    import types

    from rcnn_ocr_tpu.hpo import PrunedTrial, run_hpo

    class TrialPruned(Exception):
        pass

    class _TrialState:
        # real optuna's TrialState members expose is_finished(); only
        # finished trials exist in this stub
        def __init__(self, name):
            self.name = name

        def is_finished(self):
            return True

    class _State:
        PRUNED, COMPLETE = _TrialState("PRUNED"), _TrialState("COMPLETE")

    class _Trial:
        def __init__(self, number):
            self.number = number
            self.params = {}
            self.user_attrs = {}
            self.value = None
            self.state = _State.COMPLETE
            self.reports = []

        def suggest_float(self, name, low, high, log=False):
            v = low + (high - low) * ((self.number * 37 % 10) / 10.0)
            self.params[name] = v
            return v

        def suggest_int(self, name, low, high):
            self.params[name] = low
            return low

        def suggest_categorical(self, name, choices):
            self.params[name] = choices[0]
            return choices[0]

        def report(self, value, step):
            self.reports.append((step, value))

        def should_prune(self):
            # prune every odd-numbered trial at its second report
            return self.number % 2 == 1 and len(self.reports) >= 2

        def set_user_attr(self, k, v):
            self.user_attrs[k] = v

    class _Study:
        def __init__(self):
            self.trials = []
            self.callback_calls = 0

        def optimize(self, fn, n_trials, n_jobs, catch=(), callbacks=()):
            for i in range(n_trials):
                t = _Trial(i)
                self.trials.append(t)
                try:
                    t.value = fn(t)
                except TrialPruned:
                    t.state = _State.PRUNED
                for cb in callbacks or ():
                    cb(self, t)
                    self.callback_calls += 1

        @property
        def best_value(self):
            vals = [t.value for t in self.trials if t.state == _State.COMPLETE]
            if not vals:
                raise ValueError("no completed trials")
            return max(vals)

        @property
        def best_params(self):
            best = max(
                (t for t in self.trials if t.state == _State.COMPLETE),
                key=lambda t: t.value,
            )
            return best.params

    stub = types.ModuleType("optuna")
    stub.TrialPruned = TrialPruned
    stub.create_study = lambda **kw: _Study()
    stub.samplers = types.SimpleNamespace(TPESampler=lambda seed: None)
    stub.pruners = types.SimpleNamespace(
        MedianPruner=lambda **kw: None, NopPruner=lambda: None
    )
    stub.trial = types.SimpleNamespace(TrialState=_State)
    monkeypatch.setitem(sys.modules, "optuna", stub)

    MAX_EPOCHS = 4

    def objective(base, params, trial_dir, report=None):
        value = 0.0
        for epoch in range(1, MAX_EPOCHS + 1):
            value = params["lr"] * epoch
            if report is not None and report(epoch, value):
                raise PrunedTrial(value, epoch)
        return value

    out = run_hpo(
        {}, n_trials=4, study_name="s", storage_dir=str(tmp_path / "s"),
        space={"lr": ("float", 0.1, 0.9)}, objective=objective, seed=0,
        prune=True,
    )
    pruned = [t for t in out["trials"] if t["pruned"]]
    done = [t for t in out["trials"] if not t["pruned"]]
    assert [t["number"] for t in pruned] == [1, 3]
    assert all(t["epochs_run"] == 2 for t in pruned)
    assert all(t["epochs_run"] == MAX_EPOCHS for t in done)
    assert out["best_value"] == pytest.approx(
        max(t["value"] for t in done)
    )
    # per-trial progress snapshots (the hpo_report mid-study contract)
    # and wall-seconds recorded on every trial, pruned included
    assert all(t.get("seconds") is not None for t in out["trials"])
    import json as json_mod

    blob = json_mod.load(
        open(os.path.join(str(tmp_path / "s"), "s_results.json"),
             encoding="utf-8")
    )
    assert len(blob["trials"]) == 4


@pytest.mark.slow
def test_run_training_eval_callback_prunes(tmp_path):
    """run_training's eval_callback hook stops a real run cleanly at the
    requested epoch: pruned flag set, only that many epochs trained, all
    checkpoint slots drained."""
    charset = _write_charset(tmp_path / "cs.txt", CHARSET_TOKENS)
    train = make_synthetic_dataset(str(tmp_path / "tr"), tiny_labels(14))
    cfg = _cfg(tmp_path, charset, train, str(tmp_path / "exp"), epochs=4)
    calls = []

    def cb(epoch, metrics):
        calls.append((epoch, metrics["val_acc"]))
        return epoch >= 2

    result = run_training(cfg, eval_callback=cb)
    assert result["pruned"] is True
    assert result["epochs_run"] == 2
    assert [e for e, _ in calls] == [1, 2]
    assert os.path.exists(tmp_path / "exp" / "last_ckpt.msgpack")


def test_hpo_report_tool(tmp_path, capsys):
    """tools/hpo_report.py reads both result shapes (mid-run and final),
    ranks trials, flags pruned/failed, and reports pruning savings."""
    import json
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import hpo_report

    trials = [
        {"number": 0, "value": 0.5, "params": {"lr": 0.001},
         "seconds": 10.0, "pruned": False, "epochs_run": 9},
        {"number": 1, "value": 0.2, "params": {"lr": 0.1},
         "seconds": 4.0, "pruned": True, "epochs_run": 3},
        {"number": 2, "value": float("-inf"), "params": {"lr": 9.0},
         "seconds": 1.0, "pruned": False, "epochs_run": 1},
    ]
    final = {
        "best_value": 0.5, "best_params": {"lr": 0.001}, "trials": trials,
    }
    path = tmp_path / "s_results.json"
    path.write_text(json.dumps(final), encoding="utf-8")
    assert hpo_report.main([str(path)]) == 0
    out = capsys.readouterr().out
    assert "pruned" in out and "failed" in out
    assert "best params: lr=0.001" in out
    # 3 trials x 9 full epochs = 27; 13 spent -> 14 saved
    assert "epochs spent: 13 of 27" in out and "14 saved" in out

    # mid-run shape + storage-dir resolution (single study auto-picked)
    midrun = {"best": {"best_value": 0.5, "best_params": {"lr": 0.001}},
              "trials": trials[:2]}
    path.write_text(json.dumps(midrun), encoding="utf-8")
    assert hpo_report.main([str(tmp_path)]) == 0
    assert "best value: 0.5000" in capsys.readouterr().out

    # missing / empty -> exit 1
    assert hpo_report.main([str(tmp_path / "nope.json")]) == 1
    capsys.readouterr()
    path.write_text(json.dumps({"trials": []}), encoding="utf-8")
    assert hpo_report.main([str(path)]) == 1


def test_hpo_results_file_feeds_report_tool(tmp_path, capsys):
    """The driver's results file (whichever backend) is what
    tools/hpo_report.py reads: written atomically per trial, with
    wall-seconds recorded for every finished trial."""
    import json
    import sys as _sys

    from rcnn_ocr_tpu.hpo.driver import run_hpo

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import hpo_report

    def objective(base, params, trial_dir):
        return float(params["lr"])

    storage = str(tmp_path / "hpo")
    run_hpo(
        {}, n_trials=3, study_name="rep", storage_dir=storage,
        space={"lr": ("float", 0.0, 1.0)}, seed=0, objective=objective,
        prune=False,
    )
    blob = json.load(
        open(os.path.join(storage, "rep_results.json"), encoding="utf-8")
    )
    assert len(blob["trials"]) == 3
    assert all(t.get("seconds") is not None for t in blob["trials"])
    capsys.readouterr()
    assert hpo_report.main([storage, "--study", "rep"]) == 0
    out = capsys.readouterr().out
    assert "best params: lr=" in out

    # corrupt file -> graceful exit 1, not a traceback
    bad = tmp_path / "bad_results.json"
    bad.write_text("{\"trials\": [", encoding="utf-8")
    assert hpo_report.main([str(bad)]) == 1
    assert "not a results JSON" in capsys.readouterr().out
