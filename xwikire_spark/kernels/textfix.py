"""Mojibake repair (X16) — the reference runs ``ftfy.fix_text`` over every
SRL sentence (src/builders/SRL.py:111). This is a dependency-free repairer
for ftfy's dominant fix class: UTF-8 byte sequences that were mis-decoded
as Latin-1 / Windows-1252 ("CafÃ©" -> "Café", "donâ€™t" -> "don’t"),
including the double-encoded case (each pass undoes one mis-decoding).

Deterministic and conservative: a pass is accepted only when the text
actually looks mojibake-struck (high-byte lead characters followed by
continuation-range characters) AND the re-decode round-trips cleanly AND it
strictly shrinks the text (real mojibake always inflates 1 char -> 2-4
chars). Clean text — including legitimate "Ã" words — passes through
byte-identical.
"""

from __future__ import annotations

import re

# a UTF-8 lead byte (as a mis-decoded char) followed by a char in the
# continuation range C2..C3/80..BF or the cp1252 remaps of 80..9F
_MOJIBAKE_MARKER = re.compile(
    "[Â-ô][-¿€‚ƒ„…†"
    "‡ˆ‰Š‹ŒŽ‘’“”"
    "•–—˜™š›œžŸ]"
)


def _reencode(text: str) -> bytes | None:
    try:
        return text.encode("latin-1")
    except UnicodeEncodeError:
        try:
            return text.encode("windows-1252")
        except UnicodeEncodeError:
            return None


def fix_text(text: str) -> str:
    """Undo UTF-8-as-Latin-1/cp1252 mis-decoding, up to 3 nested layers."""
    for _ in range(3):
        if not text or not _MOJIBAKE_MARKER.search(text):
            return text
        raw = _reencode(text)
        if raw is None:
            return text
        try:
            fixed = raw.decode("utf-8")
        except UnicodeDecodeError:
            return text
        if len(fixed) >= len(text):
            return text
        text = fixed
    return text
