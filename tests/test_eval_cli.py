"""Unit tests for the evaluation CLI's dataset loader and the visualizer
helper (the thin, non-jitted parts of the L5 entry scripts)."""

import csv
import os
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from evaluate_dataset import load_dataset  # noqa: E402
from visualize_dataset import ids_to_tokens_str  # noqa: E402


def _make(tmp_path, rows, header=("filename", "text")):
    import cv2

    root = tmp_path / "imgs"
    root.mkdir()
    csv_path = tmp_path / "labels.csv"
    with open(csv_path, "w", newline="", encoding="utf-8") as f:
        wr = csv.writer(f)
        wr.writerow(header)
        for fname, text, write_img in rows:
            wr.writerow([fname, text])
            if write_img:
                img_name = fname if os.path.splitext(fname)[1] else fname + ".png"
                cv2.imwrite(str(root / img_name), np.zeros((8, 8, 3), np.uint8))
    return str(csv_path), str(root)


def test_load_dataset_basic(tmp_path):
    csv_path, root = _make(tmp_path, [("a.png", "hello", True), ("b.png", "world", True)])
    paths, texts = load_dataset(csv_path, root)
    assert len(paths) == 2
    assert texts == ["hello", "world"]


def test_load_dataset_extension_guessing(tmp_path):
    # CSV references 'a' without extension; the file on disk is a.png
    csv_path, root = _make(tmp_path, [("a", "text", True)])
    paths, texts = load_dataset(csv_path, root)
    assert len(paths) == 1
    assert paths[0].endswith("a.png")


def test_load_dataset_missing_images_skipped(tmp_path):
    csv_path, root = _make(
        tmp_path, [("a.png", "x", True), ("gone.png", "y", False)]
    )
    paths, texts = load_dataset(csv_path, root)
    assert len(paths) == 1 and texts == ["x"]


def test_load_dataset_requires_columns(tmp_path):
    csv_path, root = _make(tmp_path, [("a.png", "x", True)], header=("file", "label"))
    with pytest.raises(ValueError, match="filename"):
        load_dataset(csv_path, root)


def test_load_dataset_missing_files_raise(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_dataset(str(tmp_path / "no.csv"), str(tmp_path))


def test_ids_to_tokens_str():
    itos = ["<PAD>", "<SOS>", "a"]
    assert ids_to_tokens_str([1, 2, 0], itos) == "<SOS> a <PAD>"
    assert ids_to_tokens_str([7], itos) == "<UNK:7>"


def test_serving_accepts_beam_decode():
    """--serving routes attention/ctc_greedy AND ctc_beam (the on-device
    prefix beam fused into the serving kernel) — the combination must pass
    argument validation (it proceeds to dataset loading)."""
    import pytest

    from evaluate_dataset import evaluate_model

    # fake paths: reaching the CSV check proves the decode/serving combo
    # was accepted
    with pytest.raises(FileNotFoundError, match="CSV"):
        evaluate_model(
            model_path="x", charset_path="y", csv_path="z", root_path="r",
            decode="ctc_beam", serving=True,
        )


def test_empty_lm_weight_errors(monkeypatch, capsys):
    """`--lm-weight ""` must not silently evaluate nothing and exit 0
    (ADVICE r3)."""
    from evaluate_dataset import main as eval_main

    monkeypatch.setattr(
        sys, "argv",
        ["evaluate_dataset.py", "--model", __file__, "--charset", __file__,
         "--csv", "x", "--root", "r", "--lm-weight", ""],
    )
    assert eval_main() == 1
    assert "empty sweep" in capsys.readouterr().out


def test_garbage_lm_weight_errors(monkeypatch, capsys):
    """Non-numeric --lm-weight exits with a message, not a traceback."""
    from evaluate_dataset import main as eval_main

    monkeypatch.setattr(
        sys, "argv",
        ["evaluate_dataset.py", "--model", __file__, "--charset", __file__,
         "--csv", "x", "--root", "r", "--lm-weight", "0.2,oops"],
    )
    assert eval_main() == 1
    assert "comma list of numbers" in capsys.readouterr().out


def test_lm_weight_given_numeric_compare():
    """'0' / '0.00' mean fusion OFF — artifact mode must not flag them as
    a baked-knob conflict (round-4 review: the old string compare did)."""
    from evaluate_dataset import _lm_weight_given

    assert not _lm_weight_given("0.0")
    assert not _lm_weight_given("0")
    assert not _lm_weight_given("0.00")
    assert _lm_weight_given("0.2")
    assert _lm_weight_given("0,0.2")
    assert _lm_weight_given("oops")  # garbage counts as given -> loud refusal


def test_eval_cli_artifact_mode(tmp_path, monkeypatch, capsys):
    """`evaluate_dataset.py --artifact DIR` certifies the deployment unit:
    accuracy of the exported artifact on a labeled CSV equals the live
    engine's on the same data (VERDICT r3 weak #4), and knobs the manifest
    bakes are refused."""
    import cv2
    import jax
    import jax.numpy as jnp

    from evaluate_dataset import main as eval_main
    from rcnn_ocr_tpu.export import ServingArtifact, export_serving_artifact
    from rcnn_ocr_tpu.inference import OCRInference
    from rcnn_ocr_tpu.models import RCNN
    from rcnn_ocr_tpu.training import checkpoint as ckpt_io
    from rcnn_ocr_tpu.training.optim import build_optimizer
    from rcnn_ocr_tpu.training.train_step import create_train_state

    tokens = ["<PAD>", "<SOS>", "<EOS>", "<BLANK>", "a", "b"]
    model = RCNN(
        num_classes=len(tokens), hidden_size=16, width_mult=0.25,
        with_ctc_head=True, dtype=jnp.float32,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(2)}, jnp.zeros((1, 32, 64, 3)),
        text=jnp.zeros((1, 5), jnp.int32), batch_max_length=4,
        method=model.init_all,
    )
    state = create_train_state(model, variables, build_optimizer("Adam", 1e-3))
    cs_path = tmp_path / "cs.txt"
    cs_path.write_text("\n".join(tokens) + "\n", encoding="utf-8")
    ckpt = str(tmp_path / "w.msgpack")
    ckpt_io.save_weights(ckpt, state)
    ocr = OCRInference(
        ckpt, str(cs_path), img_h=32, img_w=64, dtype=jnp.float32, verbose=False
    )
    art_dir = str(tmp_path / "artifact")
    export_serving_artifact(
        ocr, art_dir, method="ctc_greedy", batch_size=2, canvas=(40, 80),
    )

    # labeled dataset (eval CSV needs a header)
    root = tmp_path / "imgs"
    root.mkdir()
    rng = np.random.default_rng(3)
    rows = []
    for i in range(3):
        img = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
        cv2.imwrite(str(root / f"im{i}.png"), img)
        rows.append((f"im{i}.png", "ab"))
    csv_path = tmp_path / "labels.csv"
    csv_path.write_text(
        "filename,text\n" + "\n".join(f"{f},{t}" for f, t in rows) + "\n",
        encoding="utf-8",
    )

    monkeypatch.chdir(tmp_path)  # results CSV lands in tmp
    monkeypatch.setattr(
        sys, "argv",
        ["evaluate_dataset.py", "--artifact", art_dir,
         "--csv", str(csv_path), "--root", str(root)],
    )
    assert eval_main() == 0
    out = capsys.readouterr().out
    assert "EVALUATION RESULTS" in out and "artifact method: ctc_greedy" in out

    # the CLI accuracy equals a direct artifact decode on the same rows
    art = ServingArtifact.load(art_dir)
    preds = art.predict([str(root / f) for f, _ in rows])
    acc = sum(p == t for p, (_, t) in zip(preds, rows)) / len(rows)
    assert f"Accuracy (exact match): {acc:.4f}" in out

    # baked knobs are refused loudly
    monkeypatch.setattr(
        sys, "argv",
        ["evaluate_dataset.py", "--artifact", art_dir, "--csv", str(csv_path),
         "--root", str(root), "--decode", "ctc_beam"],
    )
    assert eval_main() == 1
    assert "--decode" in capsys.readouterr().out


def test_eval_cli_long_decodes(tmp_path, monkeypatch, capsys):
    """--decode *_long certifies the unbounded-width paths on a labeled
    CSV: hybrid_long / ctc_long run end to end, --tile-w is accepted for
    them and refused elsewhere, and fusion knobs stay beam-only."""
    import cv2
    import jax
    import jax.numpy as jnp

    from evaluate_dataset import main as eval_main
    from rcnn_ocr_tpu.models import RCNN
    from rcnn_ocr_tpu.training import checkpoint as ckpt_io
    from rcnn_ocr_tpu.training.optim import build_optimizer
    from rcnn_ocr_tpu.training.train_step import create_train_state

    tokens = ["<PAD>", "<SOS>", "<EOS>", "<BLANK>", "a", "b"]
    model = RCNN(
        num_classes=len(tokens), hidden_size=16, width_mult=0.25,
        with_ctc_head=True, dtype=jnp.float32,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(2)}, jnp.zeros((1, 32, 64, 3)),
        text=jnp.zeros((1, 5), jnp.int32), batch_max_length=4,
        method=model.init_all,
    )
    state = create_train_state(model, variables, build_optimizer("Adam", 1e-3))
    cs_path = tmp_path / "cs.txt"
    cs_path.write_text("\n".join(tokens) + "\n", encoding="utf-8")
    ckpt = str(tmp_path / "w.msgpack")
    ckpt_io.save_weights(ckpt, state)

    root = tmp_path / "imgs"
    root.mkdir()
    rng = np.random.default_rng(7)
    cv2.imwrite(
        str(root / "wide.png"),
        rng.integers(0, 256, (32, 300, 3)).astype(np.uint8),
    )
    csv_path = tmp_path / "labels.csv"
    csv_path.write_text("filename,text\nwide.png,ab\n", encoding="utf-8")
    monkeypatch.chdir(tmp_path)

    base = ["evaluate_dataset.py", "--model", ckpt, "--charset", str(cs_path),
            "--csv", str(csv_path), "--root", str(root),
            "--img-h", "32", "--img-w", "64", "--max-length", "4"]
    for decode in ("ctc_long", "hybrid_long"):
        monkeypatch.setattr(
            sys, "argv", base + ["--decode", decode, "--tile-w", "64"]
        )
        assert eval_main() == 0
        assert "EVALUATION RESULTS" in capsys.readouterr().out

    # --tile-w without a *_long decode is refused
    monkeypatch.setattr(sys, "argv", base + ["--tile-w", "64"])
    assert eval_main() == 1
    assert "*_long" in capsys.readouterr().out
    # greedy hybrid refuses fusion knobs (beam-only, like every path)
    monkeypatch.setattr(
        sys, "argv",
        base + ["--decode", "hybrid_long", "--lm-weight", "0.4"],
    )
    assert eval_main() == 1
    assert "hybrid_long_beam" in capsys.readouterr().out


def test_artifact_mode_refuses_geometry_and_calibration_flags(
    monkeypatch, capsys
):
    """--img-h/--img-w/--batch-size/--save-calibration are baked into (or
    meaningless for) an exported artifact — passing them with --artifact
    must fail loudly, not silently evaluate at the manifest's values."""
    from evaluate_dataset import main as eval_main

    for flags in (
        ["--img-h", "48"],
        ["--img-w", "256"],
        ["--batch-size", "7"],
        ["--save-calibration", "cal.msgpack"],
    ):
        monkeypatch.setattr(
            sys, "argv",
            ["evaluate_dataset.py", "--artifact", "somedir",
             "--csv", "x", "--root", "r"] + flags,
        )
        assert eval_main() == 1
        assert "cannot be used with --artifact" in capsys.readouterr().out


def test_error_analysis_tables():
    """_error_analysis stratifies by true-text length and counts minimal-
    edit confusions (the production accuracy-review starting point)."""
    from evaluate_dataset import _error_analysis
    from rcnn_ocr_tpu.training.metrics import character_error_rate

    # incl. an empty-truth row (blank image with spurious text): it must
    # appear in the 0-5 bucket, not vanish from the stratification
    true_texts = ["abc", "hello", "abcdefghijkl", "x" * 25, ""]
    predicted = ["adc", "hello", "abcdefghijkl", "x" * 24, "z"]
    import math

    cers = [
        c if math.isfinite(c) else 1.0
        for c in (
            character_error_rate(t, p)
            for t, p in zip(true_texts, predicted)
        )
    ]
    a = _error_analysis(true_texts, predicted, cers)

    rows = {r["length"]: r for r in a["by_length"]}
    assert rows["0-5"]["n"] == 3 and rows["0-5"]["accuracy"] == 1 / 3
    assert rows["11-15"]["accuracy"] == 1.0
    assert rows["21+"]["n"] == 1 and rows["21+"]["accuracy"] == 0.0
    assert sum(r["n"] for r in a["by_length"]) == len(true_texts)
    assert a["top_substitutions"] == [
        {"true": "b", "predicted": "d", "count": 1}
    ]
    assert a["top_deletions"] == [{"true": "x", "count": 1}]
    assert a["top_insertions"] == [{"predicted": "z", "count": 1}]
    assert a["pairs_skipped_too_long"] == 0


def test_eval_cli_error_analysis_and_report_json(tmp_path, monkeypatch, capsys):
    """--error-analysis prints the length/confusion tables and
    --report-json writes the metrics for CI gates."""
    import json as json_mod

    import cv2
    import jax
    import jax.numpy as jnp

    from evaluate_dataset import main as eval_main
    from rcnn_ocr_tpu.models import RCNN
    from rcnn_ocr_tpu.training import checkpoint as ckpt_io
    from rcnn_ocr_tpu.training.optim import build_optimizer
    from rcnn_ocr_tpu.training.train_step import create_train_state

    tokens = ["<PAD>", "<SOS>", "<EOS>", "<BLANK>", "a", "b"]
    model = RCNN(
        num_classes=len(tokens), hidden_size=16, width_mult=0.25,
        with_ctc_head=True, dtype=jnp.float32,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(2)}, jnp.zeros((1, 32, 64, 3)),
        text=jnp.zeros((1, 5), jnp.int32), batch_max_length=4,
        method=model.init_all,
    )
    state = create_train_state(model, variables, build_optimizer("Adam", 1e-3))
    cs_path = tmp_path / "cs.txt"
    cs_path.write_text("\n".join(tokens) + "\n", encoding="utf-8")
    ckpt = str(tmp_path / "w.msgpack")
    ckpt_io.save_weights(ckpt, state)

    root = tmp_path / "imgs"
    root.mkdir()
    rng = np.random.default_rng(5)
    rows = []
    for i in range(3):
        img = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
        cv2.imwrite(str(root / f"im{i}.png"), img)
        rows.append((f"im{i}.png", "ab"))
    csv_path = tmp_path / "labels.csv"
    csv_path.write_text(
        "filename,text\n" + "\n".join(f"{f},{t}" for f, t in rows) + "\n",
        encoding="utf-8",
    )

    report = tmp_path / "report.json"
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        sys, "argv",
        ["evaluate_dataset.py", "--model", ckpt, "--charset", str(cs_path),
         "--csv", str(csv_path), "--root", str(root),
         "--img-h", "32", "--img-w", "64", "--decode", "ctc_greedy",
         "--max-length", "4", "--error-analysis",
         "--report-json", str(report)],
    )
    assert eval_main() == 0
    out = capsys.readouterr().out
    assert "Accuracy by true-text length:" in out
    assert "JSON report written to:" in out

    payload = json_mod.load(open(report, encoding="utf-8"))
    assert payload["n"] == 3
    assert 0.0 <= payload["accuracy"] <= 1.0
    assert "analysis" in payload and "by_length" in payload["analysis"]


def test_report_json_empty_dataset_fails_loudly(tmp_path, monkeypatch, capsys):
    """A dataset that matches zero images must NOT hand a CI gate a
    `null` report with a green exit code (round-4 review)."""
    from evaluate_dataset import main as eval_main

    root = tmp_path / "imgs"
    root.mkdir()
    csv_path = tmp_path / "labels.csv"
    csv_path.write_text("filename,text\nmissing.png,ab\n", encoding="utf-8")
    report = tmp_path / "report.json"
    model = tmp_path / "m.msgpack"
    model.write_bytes(b"")
    charset = tmp_path / "cs.txt"
    charset.write_text("<PAD>\n<SOS>\n<EOS>\n<BLANK>\na\n", encoding="utf-8")

    monkeypatch.setattr(
        sys, "argv",
        ["evaluate_dataset.py", "--model", str(model), "--charset",
         str(charset), "--csv", str(csv_path), "--root", str(root),
         "--report-json", str(report)],
    )
    assert eval_main() == 1
    assert not report.exists()


def test_error_gallery_tool(tmp_path, capsys):
    """tools/error_gallery.py renders the worst rows of an eval CSV to a
    PNG, skips exact matches by default, and fails loudly on a foreign
    CSV."""
    import cv2

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import error_gallery

    root = tmp_path / "imgs"
    root.mkdir()
    rng = np.random.default_rng(11)
    rows = [
        ("a.png", "abc", "xbc", 0.33, False),
        ("b.png", "hello", "hello", 0.0, True),
        ("c.png", "word", "", 1.0, False),
    ]
    for fname, *_ in rows:
        cv2.imwrite(
            str(root / fname), rng.integers(0, 256, (20, 60, 3), np.uint8)
        )
    csv_path = tmp_path / "evaluation_results_m.csv"
    csv_path.write_text(
        "image_path,true_text,predicted_text,cer,wer,exact_match\n"
        + "\n".join(
            f"{f},{t},{p},{c},{c},{m}" for f, t, p, c, m in rows
        ) + "\n",
        encoding="utf-8",
    )
    out_png = tmp_path / "worst.png"
    assert error_gallery.main(
        [str(csv_path), "--root", str(root), "--out", str(out_png), "--n", "2"]
    ) == 0
    assert out_png.exists() and out_png.stat().st_size > 0
    assert "wrote 2 panels" in capsys.readouterr().out

    # exact matches are skipped: only 2 error rows qualify even at n=16
    assert error_gallery.main(
        [str(csv_path), "--root", str(root), "--out", str(out_png)]
    ) == 0
    assert "wrote 2 panels" in capsys.readouterr().out

    # a foreign CSV is refused with a message, not a KeyError
    bad = tmp_path / "foreign.csv"
    bad.write_text("a,b\n1,2\n", encoding="utf-8")
    assert error_gallery.main([str(bad)]) == 1
    assert "not an evaluation_results CSV" in capsys.readouterr().out
