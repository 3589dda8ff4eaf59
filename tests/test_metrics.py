import math

import pytest

from rcnn_ocr_tpu.training.metrics import (
    character_error_rate,
    compute_accuracy,
    levenshtein,
    word_error_rate,
    _levenshtein_py,
)


@pytest.mark.parametrize(
    "a,b,d",
    [
        ("", "", 0),
        ("abc", "abc", 0),
        ("abc", "", 3),
        ("", "abc", 3),
        ("kitten", "sitting", 3),
        ("flaw", "lawn", 2),
        ("привет", "привет!", 1),
        ("ѣдок", "едок", 1),
    ],
)
def test_levenshtein(a, b, d):
    assert levenshtein(a, b) == d
    assert _levenshtein_py(a, b) == d


def test_cer_edge_cases():
    assert character_error_rate("", "") == 0.0
    assert math.isinf(character_error_rate("", "x"))
    assert character_error_rate("abcd", "abxd") == 0.25


def test_wer():
    assert word_error_rate("the cat sat", "the cat sat") == 0.0
    assert word_error_rate("the cat sat", "the dog sat") == pytest.approx(1 / 3)
    assert word_error_rate("a b", "a") == pytest.approx(0.5)
    assert word_error_rate("", "") == 0.0
    assert math.isinf(word_error_rate("", "x"))
    # whitespace normalization: multiple spaces are one separator
    assert word_error_rate("a  b", "a b") == 0.0


def test_accuracy():
    assert compute_accuracy([], []) == 0.0
    assert compute_accuracy(["a", "b"], ["a", "c"]) == 0.5


def test_edit_ops_alignment():
    """`edit_ops` returns one optimal alignment: op count == Levenshtein
    distance on random pairs, and the ops are the expected ones on the
    textbook example."""
    import random

    from rcnn_ocr_tpu.training.metrics import edit_ops, levenshtein

    assert edit_ops("kitten", "sitting") == [
        ("sub", "k", "s"), ("sub", "e", "i"), ("ins", None, "g"),
    ]
    assert edit_ops("", "ab") == [("ins", None, "a"), ("ins", None, "b")]
    assert edit_ops("ab", "") == [("del", "a", None), ("del", "b", None)]
    assert edit_ops("same", "same") == []

    rng = random.Random(0)
    for _ in range(300):
        a = "".join(rng.choices("abcde", k=rng.randint(0, 12)))
        b = "".join(rng.choices("abcde", k=rng.randint(0, 12)))
        assert len(edit_ops(a, b)) == levenshtein(a, b), (a, b)
