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
        parallel_trials=2,
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
