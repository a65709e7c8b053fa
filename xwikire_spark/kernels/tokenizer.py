"""Word tokenization with sling-style break levels, exactly invertible.

Contract (reference src/tokenizers/TokenizerI.py:9-14 and the sling tokenizer
it wraps, src/tokenizers/sling_tokenizer.py:8-13): for each token emit a
*break level* describing the separator that preceded it:

    0  no separator            ("Cricetidae" -> ".")
    1  single space
    2  single newline (non-sentence)
    3  sentence break: single space after sentence-terminal punctuation
    4  paragraph break: blank line ("\\n\\n")

The first token always gets 0. ``rebuild_text(tokens, breaks)`` inverts
tokenization for any text whose inter-token whitespace runs are one of
{"", " ", "\\n", "\\n\\n"} — the reference's own round-trip property
(src/test/test_tokenizer.py:83-85,742-747) and the per-turn text-equality
invariant required by BASELINE.json. The reference's spacy implementation of
this contract is marked "# Bugged" (src/tokenizers/spacy_tokenizer.py:27);
this one is tested against the reference's golden English fixture
(src/test/test_tokenizer.py:14-21).
"""

from __future__ import annotations

import re

# Sentence-terminal tokens (reference src/tokenizers/TokenizerI.py:3).
SENTENCE_BREAKS = {".", "!", "?", "…", "..."}

# A token is a run of word characters (unicode letters/digits/underscore,
# plus internal apostrophes/hyphens like "dell'Unione" handled as separate
# tokens by splitting on the apostrophe boundary the way spacy's golden
# fixture does), an ellipsis, or a single non-space symbol.
_TOKEN = re.compile(r"\.\.\.|[^\W_]+(?:[-'’][^\W_]+)*|_|[^\w\s]", re.UNICODE)

_SEP_TO_BREAK = {"": 0, " ": 1, "\n": 2, "\n\n": 4}
_BREAK_TO_SEP = {0: "", 1: " ", 2: "\n", 3: " ", 4: "\n\n"}


def tokenize_with_breaks(text: str) -> tuple[list[str], list[int]]:
    """Tokenize ``text`` -> (tokens, break_levels), len-equal
    (invariant asserted by the reference at src/builders/WikiReading.py:59)."""
    tokens: list[str] = []
    breaks: list[int] = []
    prev_end = 0
    prev_token: str | None = None
    for m in _TOKEN.finditer(text):
        sep = text[prev_end : m.start()]
        if prev_token is None:
            level = 0
        else:
            level = _SEP_TO_BREAK.get(sep, 1)
            if level == 1 and prev_token in SENTENCE_BREAKS:
                level = 3
        tokens.append(m.group())
        breaks.append(level)
        prev_end = m.end()
        prev_token = m.group()
    return tokens, breaks


def rebuild_text(tokens: list[str], breaks: list[int]) -> str:
    """Inverse of :func:`tokenize_with_breaks` (reference round-trip property,
    src/test/test_tokenizer.py:742-747)."""
    out: list[str] = []
    for token, brk in zip(tokens, breaks):
        if out:
            out.append(_BREAK_TO_SEP[brk])
        out.append(token)
    return "".join(out)


def sentence_break_indices(breaks: list[int]) -> list[int]:
    """Token indices where a sentence starts (break >= 3), mirroring
    src/builders/WikiReading.py:56."""
    return [i for i, b in enumerate(breaks) if b >= 3]


def paragraph_break_indices(breaks: list[int]) -> list[int]:
    """Token indices where a paragraph starts (break == 4), mirroring
    src/builders/WikiReading.py:57."""
    return [i for i, b in enumerate(breaks) if b == 4]
