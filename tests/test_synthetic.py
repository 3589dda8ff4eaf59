"""Synthetic dataset generator: determinism, contracts, pipeline round-trip."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rcnn_ocr_tpu.data.synthetic import (  # noqa: E402
    DIFFICULTIES,
    GENERATION_ALPHABET,
    HOMOGLYPH_FREE_ALPHABET,
    discover_fonts,
    generate_dataset,
    render_line,
    sample_texts,
)

FONTS = discover_fonts()
pytestmark = pytest.mark.skipif(not FONTS, reason="no TrueType fonts on host")


def test_render_line_shape_and_dtype():
    img = render_line("hello мир 42", FONTS[0], img_h=32, rng=np.random.default_rng(1))
    assert img.dtype == np.uint8
    assert img.shape[0] == 32 and img.shape[2] == 3
    assert img.shape[1] >= 8


def test_render_line_width_grows_with_text():
    rng = np.random.default_rng(0)
    short = render_line("ab", FONTS[0], img_h=32, rng=rng, difficulty="clean")
    rng = np.random.default_rng(0)
    long = render_line("abcdefghijklmnop", FONTS[0], img_h=32, rng=rng, difficulty="clean")
    assert long.shape[1] > short.shape[1]


def test_render_line_deterministic_per_rng():
    a = render_line("текст", FONTS[0], img_h=48, rng=np.random.default_rng(7), difficulty="hard")
    b = render_line("текст", FONTS[0], img_h=48, rng=np.random.default_rng(7), difficulty="hard")
    np.testing.assert_array_equal(a, b)


def test_render_line_actually_draws_ink():
    img = render_line("WWW", FONTS[0], img_h=48, rng=np.random.default_rng(3), difficulty="clean")
    # clean preset: paper >= 235, ink <= 45 — glyph pixels must exist
    assert img.min() < 120 and img.max() > 200


def test_render_line_rejects_unknown_difficulty():
    with pytest.raises(ValueError):
        render_line("x", FONTS[0], difficulty="nightmare")


def test_sample_texts_respects_alphabet_and_max_len():
    texts = sample_texts(50, np.random.default_rng(0), alphabet="abc ", max_len=10)
    assert len(texts) == 50
    allowed = set("abc ")
    for t in texts:
        assert 1 <= len(t) <= 10
        assert set(t) <= allowed


def test_sample_texts_corpus_mode():
    texts = sample_texts(
        20, np.random.default_rng(0), corpus=["слово", "word"], max_words=2, max_len=25
    )
    for t in texts:
        for w in t.split(" "):
            assert w in ("слово", "word")


def test_generate_dataset_deterministic(tmp_path):
    kw = dict(seed=5, img_h=32, difficulty="medium", fonts=FONTS[:2])
    csv_a, root_a = generate_dataset(str(tmp_path / "a"), 4, **kw)
    csv_b, root_b = generate_dataset(str(tmp_path / "b"), 4, **kw)
    assert open(csv_a, "rb").read() == open(csv_b, "rb").read()
    for name in sorted(os.listdir(root_a)):
        if name.endswith(".png"):
            pa = open(os.path.join(root_a, name), "rb").read()
            pb = open(os.path.join(root_b, name), "rb").read()
            assert pa == pb, name


def test_generate_dataset_loads_through_ocrdataset(tmp_path):
    from rcnn_ocr_tpu.vocab.charset import Charset, PAD_TOKEN, SOS_TOKEN, EOS_TOKEN

    csv_path, root = generate_dataset(
        str(tmp_path / "ds"), 6, seed=1, img_h=32, fonts=FONTS[:1]
    )
    charset = Charset.from_tokens(
        [PAD_TOKEN, SOS_TOKEN, EOS_TOKEN] + list(GENERATION_ALPHABET)
    )
    from rcnn_ocr_tpu.data.dataset import OCRDataset

    ds = OCRDataset(csv_path, root, charset.stoi, img_height=32, verbose=False)
    assert len(ds) == 6
    img, label = ds[0]  # untransformed fallback: HWC float32 in [0, 1]
    assert img.dtype == np.float32 and img.shape[2] == 3
    assert 0.0 <= float(img.min()) and float(img.max()) <= 1.0
    ids = charset.encode(label)
    assert charset.decode(ids) == label


def test_generate_dataset_explicit_labels_and_header(tmp_path):
    csv_path, _ = generate_dataset(
        str(tmp_path / "x"), 3, labels=["aa", "bb", "cc"], header=True, fonts=FONTS[:1]
    )
    lines = open(csv_path, encoding="utf-8").read().splitlines()
    assert lines[0] == "filename,text"
    assert [ln.split(",")[1] for ln in lines[1:]] == ["aa", "bb", "cc"]


def test_all_difficulty_presets_render(tmp_path):
    for diff in DIFFICULTIES:
        img = render_line(
            "ab3", FONTS[0], img_h=32, rng=np.random.default_rng(0), difficulty=diff
        )
        assert img.shape[0] == 32


def test_cli_end_to_end(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_synthetic_dataset as cli

    out = str(tmp_path / "synth")
    rc = cli.main(
        ["--out", out, "--n-train", "5", "--n-val", "3", "--seed", "2", "--img-h", "32"]
    )
    assert rc == 0
    # training CSV: headerless; eval twin: headered; counts match
    train_rows = open(os.path.join(out, "train", "labels.csv"), encoding="utf-8").read().splitlines()
    assert len(train_rows) == 5 and not train_rows[0].startswith("filename")
    eval_rows = open(os.path.join(out, "val", "eval.csv"), encoding="utf-8").read().splitlines()
    assert eval_rows[0] == "filename,text" and len(eval_rows) == 4

    # emitted config round-trips through the real Config loader
    from rcnn_ocr_tpu.training.config import Config

    cfg = Config(os.path.join(out, "config.json"))
    assert cfg.train_csvs == [os.path.join(out, "train", "labels.csv")]
    assert os.path.exists(cfg.charset_path)

    # the emitted scheduler name must be accepted by the actual training
    # entry point (Config itself doesn't validate scheduler names — an
    # invalid value would only explode at train startup)
    from rcnn_ocr_tpu.training.optim import build_scheduler

    assert build_scheduler(cfg.scheduler, cfg.lr, cfg.epochs) is not None

    # charset file loads and covers every generated label
    from rcnn_ocr_tpu.vocab.charset import Charset

    charset = Charset.from_file(cfg.charset_path)
    import csv as _csv

    with open(cfg.train_csvs[0], encoding="utf-8") as f:
        for fname, text in _csv.reader(f):
            assert set(text) <= set(charset.stoi), text
            assert os.path.exists(os.path.join(out, "train", fname))


def test_render_line_long_text_squashes_not_crops(tmp_path):
    # past max_w the image compresses horizontally; the glyphs of the END
    # of the text must still be present (ink in the right-most columns)
    img = render_line(
        "w" * 200, FONTS[0], img_h=32, rng=np.random.default_rng(0),
        difficulty="clean", max_w=256,
    )
    assert img.shape[1] == 256
    right = img[:, -16:, 0]
    assert right.min() < 200  # ink reaches the right edge region


def test_homoglyph_free_alphabet_contract():
    # a strict subset of the full alphabet, with the known twins gone
    assert set(HOMOGLYPH_FREE_ALPHABET) < set(GENERATION_ALPHABET)
    for ch in "aceopxy" + "ACEHKMOPTXY" + "асеорху" + "АСЕНКМОРТХУ" + "зЗI":
        assert ch not in HOMOGLYPH_FREE_ALPHABET, ch
    assert len(set(HOMOGLYPH_FREE_ALPHABET)) == len(HOMOGLYPH_FREE_ALPHABET)


def test_cli_homoglyph_free_chars(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_synthetic_dataset as cli

    out = str(tmp_path / "hf")
    rc = cli.main(
        ["--out", out, "--n-train", "2", "--n-val", "1", "--chars", "homoglyph-free"]
    )
    assert rc == 0
    charset = open(os.path.join(out, "charset.txt"), encoding="utf-8").read()
    assert "a" not in charset.splitlines() and "b" in charset.splitlines()


def test_cli_corpus_extends_alphabet(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_synthetic_dataset as cli

    corpus = tmp_path / "words.txt"
    corpus.write_text("étude\nüber\n", encoding="utf-8")
    out = str(tmp_path / "synth")
    rc = cli.main(
        ["--out", out, "--n-train", "2", "--n-val", "1", "--corpus", str(corpus)]
    )
    assert rc == 0
    charset = open(os.path.join(out, "charset.txt"), encoding="utf-8").read()
    assert "é" in charset and "ü" in charset
