"""Generate the default charset file (``configs/charset.txt``).

The token inventory matches the reference framework's shipped vocabulary
(194 tokens: ``<PAD>``, ``<SOS>``, ``<EOS>``, space, Latin, digits,
Cyrillic including pre-reform letters, punctuation) so that checkpoints and
labels transfer 1:1.  The file is generated — not copied — and the order is
identical because token *order defines ids*.

Run: ``python tools/make_default_charset.py [out_path]``
"""

import sys

SPECIALS = ["<PAD>", "<SOS>", "<EOS>"]

LATIN_LOWER = "abcdefghijklmnopqrstuvwxyz"
DIGITS = "0123456789"
CYRILLIC_LOWER = "абвгдеёжзийклмнопрстуфхцчшщъыьэюя"
# Pre-reform / historic Cyrillic, lower-then-upper pairs.
OLD_CYRILLIC = "ѣѢіІѳѲѵѴѫѪѭѬѯѮѱѰѡѠѕЅѧѦѩѨ"
PUNCT = ".,:;!?-–—…«»()[]{}\"'`/\\|_+=*^%$#@&<>~№"


def default_tokens():
    chars = (
        " "
        + LATIN_LOWER
        + LATIN_LOWER.upper()
        + DIGITS
        + CYRILLIC_LOWER
        + CYRILLIC_LOWER.upper()
        + OLD_CYRILLIC
        + PUNCT
    )
    return SPECIALS + list(chars)


def main(out_path: str = "configs/charset.txt") -> None:
    import os

    parent = os.path.dirname(out_path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    tokens = default_tokens()
    with open(out_path, "w", encoding="utf-8", newline="\n") as f:
        for tok in tokens:
            f.write(tok + "\n")
    print(f"wrote {len(tokens)} tokens to {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
