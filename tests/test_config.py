import json
import os

import pytest

from rcnn_ocr_tpu.training.config import Config


def test_config_basic(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p = tmp_path / "config.json"
    p.write_text(json.dumps({"lr": 0.01, "exp_dir": "myexp"}), encoding="utf-8")
    cfg = Config(str(p))
    assert cfg.lr == 0.01
    assert cfg["lr"] == 0.01
    assert cfg.exp_dir == "myexp"
    # defaults for unset keys
    assert cfg.get("img_h") == 64
    assert cfg.get("batch_size") == 32
    assert cfg.get("optimizer") == "Adam"
    assert cfg.get("nonexistent", 7) == 7


def test_config_auto_expdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    os.makedirs("exp1")
    cfg = Config({"lr": 0.1})
    assert cfg.exp_dir == "exp2"


def test_config_save_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = Config({"lr": 0.5, "exp_dir": str(tmp_path / "e")})
    cfg.save()
    reloaded = json.loads((tmp_path / "e" / "config.json").read_text(encoding="utf-8"))
    assert reloaded["lr"] == 0.5


def test_config_resume_overlay(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    exp = tmp_path / "exp_old"
    exp.mkdir()
    (exp / "config.json").write_text(
        json.dumps({"lr": 0.001, "batch_size": 64, "img_h": 32}), encoding="utf-8"
    )
    (exp / "last_ckpt.msgpack").write_bytes(b"x")
    # user overrides lr (non-None) but leaves batch_size as None
    cfg = Config({"resume_path": str(exp), "lr": 0.002, "batch_size": None})
    assert cfg.lr == 0.002  # user's non-None key wins
    assert cfg.batch_size == 64  # resumed value kept
    assert cfg.img_h == 32
    assert cfg.exp_dir == str(exp)
    assert cfg.resume_path == str(exp / "last_ckpt.msgpack")


def test_config_resume_slot_priority(tmp_path):
    exp = tmp_path / "exp"
    exp.mkdir()
    (exp / "best_acc_ckpt.msgpack").write_bytes(b"x")
    (exp / "best_loss_ckpt.msgpack").write_bytes(b"x")
    cfg = Config({"resume_path": str(exp)})
    # last > best_loss > best_acc priority; no last here
    assert cfg.resume_path == str(exp / "best_loss_ckpt.msgpack")


def test_config_resume_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        Config({"resume_path": str(tmp_path / "nope")})


def test_unknown_config_keys_warn():
    """A typo'd hyperparameter must warn with a did-you-mean instead of
    silently training with the default."""
    import warnings

    from rcnn_ocr_tpu.training.config import Config

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        Config({"exp_dir": "/tmp/x", "epochz": 3, "totally_bogus": 1})
    msgs = [str(w.message) for w in rec]
    assert any("epochz" in m and "epochs" in m for m in msgs)
    assert any("totally_bogus" in m for m in msgs)

    # known keys stay silent
    with warnings.catch_warnings(record=True) as rec2:
        warnings.simplefilter("always")
        Config({"exp_dir": "/tmp/x", "epochs": 3, "charset_path": "c"})
    assert not [w for w in rec2 if "Unknown config key" in str(w.message)]
