import numpy as np
import pytest

from rcnn_ocr_tpu.vocab.charset import (
    Charset,
    decode_tokens,
    load_charset,
    pack_attention_targets,
    pack_ctc_targets,
)


def test_load_charset_order_and_space(tmp_path):
    p = tmp_path / "cs.txt"
    p.write_text("<PAD>\n<SOS>\n<EOS>\n \na\nb\n\n\nc\n", encoding="utf-8")
    itos, stoi = load_charset(str(p))
    assert itos == ["<PAD>", "<SOS>", "<EOS>", " ", "a", "b", "c"]
    assert stoi[" "] == 3
    assert stoi["c"] == 6  # empty lines skipped, ids stay contiguous


def test_charset_special_ids(tiny_charset):
    cs = tiny_charset
    assert (cs.pad_id, cs.sos_id, cs.eos_id) == (0, 1, 2)
    assert cs.blank_id is None
    assert cs.ctc_blank_id == cs.pad_id  # falls back to PAD


def test_charset_with_blank():
    cs = Charset.from_tokens(["<PAD>", "<SOS>", "<EOS>", "<BLANK>", "a"])
    assert cs.blank_id == 3
    assert cs.ctc_blank_id == 3
    # encode drops blank-mapped chars only via drop_blank of literal token —
    # '<BLANK>' is multi-char so never matches a single char; 'a' survives
    assert cs.encode("a") == [4]


def test_pack_attention_targets_exact(tiny_charset):
    cs = tiny_charset
    text_in, target_y, lengths = pack_attention_targets(["ab", ""], cs.stoi, max_len=4)
    a, b = cs.stoi["a"], cs.stoi["b"]
    np.testing.assert_array_equal(text_in[0], [1, a, b, 0, 0])
    np.testing.assert_array_equal(target_y[0], [a, b, 2, 0, 0])
    assert lengths[0] == 3
    # empty label: EOS at position 0, length 1
    np.testing.assert_array_equal(text_in[1], [1, 0, 0, 0, 0])
    np.testing.assert_array_equal(target_y[1], [2, 0, 0, 0, 0])
    assert lengths[1] == 1


def test_pack_attention_targets_truncation_and_unknown(tiny_charset):
    cs = tiny_charset
    # 'Z' is unknown -> dropped; label truncates at max_len
    text_in, target_y, lengths = pack_attention_targets(["aZbcdef"], cs.stoi, max_len=3)
    ids = [cs.stoi[c] for c in "abc"]
    np.testing.assert_array_equal(text_in[0], [1] + ids)
    np.testing.assert_array_equal(target_y[0], ids + [2])
    assert lengths[0] == 4


def test_pack_attention_targets_drop_blank():
    cs = Charset.from_tokens(["<PAD>", "<SOS>", "<EOS>", "<BLANK>", "a"])
    # no single char maps to <BLANK>, so craft stoi where 'x' -> blank id
    stoi = dict(cs.stoi)
    stoi["x"] = 3
    text_in, target_y, lengths = pack_attention_targets(["xax"], stoi, max_len=4)
    np.testing.assert_array_equal(target_y[0], [4, 2, 0, 0, 0])
    assert lengths[0] == 2


def test_decode_tokens_rules(tiny_charset):
    cs = tiny_charset
    a, b = cs.stoi["a"], cs.stoi["b"]
    itos = list(cs.itos)
    # EOS stops, PAD skipped
    assert decode_tokens([a, 0, b, 2, a], itos, pad_id=0, eos_id=2) == "ab"
    # blank skipped when given
    assert decode_tokens([a, 3, b, 2], itos, pad_id=0, eos_id=2, blank_id=3) == "ab"
    assert decode_tokens([2, a], itos, pad_id=0, eos_id=2) == ""


def test_roundtrip_encode_pack_decode(tiny_charset):
    cs = tiny_charset
    texts = ["abc def", "j", "a j b"]
    _, target_y, _ = pack_attention_targets(texts, cs.stoi, max_len=10)
    for row, text in zip(target_y, texts):
        assert cs.decode(row) == text


def test_pack_ctc_targets(tiny_charset):
    cs = tiny_charset
    labels, paddings = pack_ctc_targets(["ab", ""], cs, max_len=4)
    a, b = cs.stoi["a"], cs.stoi["b"]
    np.testing.assert_array_equal(labels[0], [a, b, 0, 0])
    np.testing.assert_array_equal(paddings[0], [0, 0, 1, 1])
    np.testing.assert_array_equal(paddings[1], [1, 1, 1, 1])


@pytest.mark.skipif(
    not __import__("os").path.isdir("/root/reference"), reason="reference not mounted"
)
def test_shipped_charset_matches_reference_inventory():
    """Our generated default charset must define the same id mapping."""
    import os

    from tools.make_default_charset import default_tokens

    ref_itos, _ = load_charset("/root/reference/configs/charset.txt")
    assert default_tokens() == ref_itos
    # and the generated file on disk, when present, matches too
    if os.path.exists("configs/charset.txt"):
        our_itos, _ = load_charset("configs/charset.txt")
        assert our_itos == ref_itos
