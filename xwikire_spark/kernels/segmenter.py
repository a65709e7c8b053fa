"""Deterministic rule-based sentence segmentation.

Reference behavior: ``nltk.sent_tokenize(text.replace("\\n\\n", "\\n"),
language=...)`` (reference src/builders/QA.py:34, src/builders/SRL.py:28).
nltk's Punkt model is a trained, language-specific statistical model — it is
neither deterministic across versions nor shippable to executors here, so we
implement the same *contract* (split the paragraph-collapsed text into
sentences on terminal punctuation / newlines) as a pure function. The pipeline
invariant that matters downstream is per-turn text equality + first-match
sentence selection order (src/builders/QA.py:80-84), which this preserves:
``"".join-with-separators(segment_sentences(t)) == collapse(t)`` and sentence
order is document order.
"""

from __future__ import annotations

import re

# Sentence-terminal punctuation, mirroring the tokenizer contract's
# SENTENCE_BREAKS (reference src/tokenizers/TokenizerI.py:3).
_TERMINALS = ".!?…"

# A boundary is terminal punct (+ optional closing quotes/brackets) followed
# by whitespace, or any newline run.
_BOUNDARY = re.compile(
    r"(?<=[" + _TERMINALS + r"])[\"'\)\]]*\s+|\n+"
)


def collapse_paragraphs(text: str) -> str:
    """The reference's pre-pass: text.replace("\\n\\n", "\\n")
    (src/builders/QA.py:34)."""
    return text.replace("\n\n", "\n")


# C-level scan for "could this text possibly split?" — a compiled
# character-class search; the earlier any()-over-chars genexpr was itself
# ~20% of the whole extraction kernel's CPU (cProfile, round 3)
_HAS_BOUNDARY = re.compile("[" + re.escape(_TERMINALS) + "\n]")


def segment_sentences(text: str) -> list[str]:
    """Split ``text`` into sentences, in document order, whitespace-stripped,
    empties dropped — matching how the reference's sentence list feeds
    distant supervision (src/builders/QA.py:34,80)."""
    if not text:
        return []
    # fast path: no terminal punctuation or newline anywhere -> one
    # sentence (the common single-sentence turn)
    if _HAS_BOUNDARY.search(text) is None:
        s = text.strip()
        return [s] if s else []
    text = collapse_paragraphs(text)
    parts = _BOUNDARY.split(text)
    return [p.strip() for p in parts if p and p.strip()]
