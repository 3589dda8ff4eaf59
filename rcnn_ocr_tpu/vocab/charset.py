"""Charset loading, target packing and token decoding.

Behavior contract mirrors the reference implementation
(`/root/reference/data/transforms.py:39-59,123-157,196-206`):

* A charset file is one token per line; the line index defines the id.
  Empty lines are skipped, so a literal space character must be a line
  containing a single space (text-mode reading maps CRLF -> LF, and only
  the trailing newline is stripped).
* Attention targets: ``text_in[B, max_len+1]`` starts with ``<SOS>`` and is
  PAD-filled; ``target_y[B, max_len+1]`` holds the char ids, then ``<EOS>``
  at position L, then PAD; ``lengths = L + 1``.  Characters missing from
  the charset are silently dropped; labels are truncated at ``max_len``.
* Decoding stops at ``<EOS>``, skips ``<PAD>`` and (when defined)
  ``<BLANK>``.

Everything is NumPy (host-side); device code receives the packed int32
arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

PAD_TOKEN = "<PAD>"
SOS_TOKEN = "<SOS>"
EOS_TOKEN = "<EOS>"
BLANK_TOKEN = "<BLANK>"


def load_charset(charset_path: str) -> Tuple[List[str], Dict[str, int]]:
    """Read a token-per-line charset file -> (itos, stoi).

    Reference parity: `/root/reference/data/transforms.py:39-59`.
    """
    itos: List[str] = []
    with open(charset_path, "r", encoding="utf-8") as f:
        for line in f:
            tok = line.rstrip("\n")
            if tok == "":
                continue
            itos.append(tok)
    stoi = {s: i for i, s in enumerate(itos)}
    return itos, stoi


@dataclasses.dataclass(frozen=True)
class Charset:
    """A charset plus the derived special-token ids.

    The special ids are *charset-driven*: they are looked up from the file
    contents, exactly as every real caller of the reference does
    (`/root/reference/training/train.py:271-275`).  ``blank_id`` is ``None``
    when the file has no ``<BLANK>`` line (true for the shipped charset).
    """

    itos: Tuple[str, ...]
    stoi: Dict[str, int]

    @classmethod
    def from_file(cls, charset_path: str) -> "Charset":
        itos, stoi = load_charset(charset_path)
        return cls(itos=tuple(itos), stoi=stoi)

    @classmethod
    def from_tokens(cls, tokens: Sequence[str]) -> "Charset":
        itos = tuple(tokens)
        return cls(itos=itos, stoi={s: i for i, s in enumerate(itos)})

    def __len__(self) -> int:
        return len(self.itos)

    @property
    def num_classes(self) -> int:
        return len(self.itos)

    @property
    def pad_id(self) -> int:
        return self.stoi[PAD_TOKEN]

    @property
    def sos_id(self) -> int:
        return self.stoi[SOS_TOKEN]

    @property
    def eos_id(self) -> int:
        return self.stoi[EOS_TOKEN]

    @property
    def blank_id(self) -> Optional[int]:
        return self.stoi.get(BLANK_TOKEN, None)

    @property
    def ctc_blank_id(self) -> int:
        """Blank id for the CTC head.

        Charset-driven: the explicit ``<BLANK>`` token when present,
        otherwise ``<PAD>`` (id 0 in the shipped charset) — PAD never
        appears inside a label, so it is a safe blank under CTC.
        """
        b = self.blank_id
        return self.pad_id if b is None else b

    def encode(self, text: str, drop_blank: bool = True) -> List[int]:
        """Text -> ids, silently dropping unknown chars (and BLANK)."""
        return _encode_ids(text, self.stoi, self.blank_id, drop_blank)

    def decode(self, ids: Sequence[int]) -> str:
        return decode_tokens(ids, list(self.itos), self.pad_id, self.eos_id, self.blank_id)


def _encode_ids(
    text: str, stoi: Dict[str, int], blank, drop_blank: bool
) -> List[int]:
    """THE text->ids policy (skip-unknown, optional drop-blank) — one
    implementation shared by `Charset.encode` and the target packers, so
    train-time targets can never diverge from eval-time encoding."""
    ids = []
    for ch in text:
        idx = stoi.get(ch)
        if idx is None:
            continue
        if drop_blank and blank is not None and idx == blank:
            continue
        ids.append(idx)
    return ids


def pack_attention_targets(
    texts: Sequence[str],
    stoi: Dict[str, int],
    max_len: int,
    drop_blank: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack label strings into attention-decoder targets.

    Returns ``(text_in, target_y, lengths)`` as int32 NumPy arrays with the
    exact semantics of `/root/reference/data/transforms.py:123-157`:

    * ``text_in[:, 0] = SOS``; ``text_in[:, 1:1+L] = ids``; rest PAD.
    * ``target_y[:, :L] = ids``; ``target_y[:, L] = EOS``; rest PAD.
    * ``lengths = L + 1`` (the EOS is counted).
    """
    pad = stoi[PAD_TOKEN]
    sos = stoi[SOS_TOKEN]
    eos = stoi[EOS_TOKEN]
    blank = stoi.get(BLANK_TOKEN, None)

    batch = len(texts)
    steps = max_len + 1

    text_in = np.full((batch, steps), pad, dtype=np.int32)
    text_in[:, 0] = sos
    target_y = np.full((batch, steps), pad, dtype=np.int32)
    lengths = np.zeros((batch,), dtype=np.int32)

    for i, s in enumerate(texts):
        ids = _encode_ids(s, stoi, blank, drop_blank)
        length = min(len(ids), max_len)
        if length > 0:
            arr = np.asarray(ids[:length], dtype=np.int32)
            text_in[i, 1 : 1 + length] = arr
            target_y[i, :length] = arr
        target_y[i, length] = eos
        lengths[i] = length + 1

    return text_in, target_y, lengths


def pack_ctc_targets(
    texts: Sequence[str],
    charset: Charset,
    max_len: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pack label strings into CTC targets.

    Returns ``(labels, label_paddings)`` shaped ``[B, max_len]`` — ids of the
    label characters (blank/PAD-free) and a 0/1 float padding mask (1 where
    padded), the layout `optax.ctc_loss` consumes.  This is the live
    replacement for the reference's dead CTC utilities
    (`/root/reference/training/utils.py:122-162`).
    """
    batch = len(texts)
    labels = np.zeros((batch, max_len), dtype=np.int32)
    paddings = np.ones((batch, max_len), dtype=np.float32)
    blank = charset.ctc_blank_id
    for i, s in enumerate(texts):
        ids = [t for t in charset.encode(s, drop_blank=True) if t != blank]
        length = min(len(ids), max_len)
        if length > 0:
            labels[i, :length] = np.asarray(ids[:length], dtype=np.int32)
            paddings[i, :length] = 0.0
    return labels, paddings


def decode_tokens(
    ids: Sequence[int],
    itos: Sequence[str],
    pad_id: int,
    eos_id: int,
    blank_id: Optional[int] = None,
) -> str:
    """Token ids -> string: stop at EOS, skip PAD and BLANK.

    Reference parity: `/root/reference/data/transforms.py:196-206`.
    """
    out = []
    for t in ids:
        t = int(t)
        if t == eos_id:
            break
        if t == pad_id or (blank_id is not None and t == blank_id):
            continue
        out.append(itos[t])
    return "".join(out)
