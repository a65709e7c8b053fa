"""Second tokenizer backend (multi-tokenizer surface, SURVEY §2 X8).

The reference ships four interchangeable tokenizers behind one contract
(src/tokenizers/: spacy — marked "# Bugged" at spacy_tokenizer.py:27,
polyglot — break derivation also bugged, sling, moses). This repo's primary
backend (kernels/tokenizer.py) implements the sling-style contract; this
module adds a **moses-style conservative** backend — same (tokens,
break_levels) contract, same round-trip invariant, different segmentation
policy:

- decimal / grouped numbers stay single tokens ("2.5", "1,000,000");
- dotted abbreviations stay single tokens ("e.g.", "U.S.");
- everything else matches the primary backend (word runs with internal
  hyphens/apostrophes, ellipsis, single symbols).

Moses itself additionally protects language-specific nonbreaking prefixes
from sentence-splitting; that list lives in the segmenter's domain here.

``get_tokenizer(name)`` is the registry both backends hang off — the
analog of the reference's tokenizer factory (src/tokenizers/__init__.py).
"""

from __future__ import annotations

import re

from xwikire_spark.kernels.tokenizer import (
    SENTENCE_BREAKS,
    _BREAK_TO_SEP,
    _SEP_TO_BREAK,
    tokenize_with_breaks,
)

_MOSES_TOKEN = re.compile(
    r"\.\.\."                        # ellipsis
    r"|\d+(?:[.,]\d+)+"              # decimals / grouped thousands
    r"|(?:[^\W\d_]\.){2,}"           # dotted abbreviations: e.g., U.S.
    r"|[^\W_]+(?:[-'’][^\W_]+)*"     # word runs w/ internal joiners
    r"|_|[^\w\s]",                   # underscore, single symbol
    re.UNICODE,
)


def tokenize_moses(text: str) -> tuple[list[str], list[int]]:
    """moses-style tokenize -> (tokens, break_levels); same contract and
    inverse (tokenizer.rebuild_text) as the primary backend."""
    tokens: list[str] = []
    breaks: list[int] = []
    prev_end = 0
    prev_token: str | None = None
    for m in _MOSES_TOKEN.finditer(text):
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


_REGISTRY = {
    "sling": tokenize_with_breaks,  # primary; reference sling contract
    "moses": tokenize_moses,        # conservative numbers/abbreviations
}


def get_tokenizer(name: str):
    """Backend registry. The reference's spacy/polyglot backends are NOT
    replicated: both carry documented break-level bugs (the spec-correct
    behavior is what `sling` implements) and depend on model downloads
    this container cannot make."""
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown tokenizer {name!r}; available: {sorted(_REGISTRY)}"
        ) from None


# re-export for symmetry with the primary module
rebuild_sep = _BREAK_TO_SEP
