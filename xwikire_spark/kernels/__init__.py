"""Pure-Python deterministic kernels (no Spark imports).

These are the single source of truth for the NLP semantics: the pandas UDFs
in ``xwikire_spark.functions.udfs`` vectorize over them, and the pytest
oracle (``oracle/reference_impl.py``) composes the same functions, so the
distant-supervision P/R check measures pipeline semantics, not library drift.
The reference's equivalents lean on nltk/spacy/sacremoses models
(reference src/builders/QA.py:25, src/builders/SRL.py:18-20), which are
non-deterministic across versions and unavailable per-executor; we use
rule-based kernels with the reference's own round-trip invariant
(src/test/test_tokenizer.py:742-747) as ground truth.
"""

from xwikire_spark.kernels.segmenter import segment_sentences
from xwikire_spark.kernels.tokenizer import rebuild_text, tokenize_with_breaks
from xwikire_spark.kernels.matching import (
    distant_supervision,
    distant_supervision_with_relation,
    find_full_matches,
    whole_word_pattern,
)
from xwikire_spark.kernels.dates import format_date
from xwikire_spark.kernels.templates import fill_template
from xwikire_spark.kernels.articles import extract_article

__all__ = [
    "segment_sentences",
    "tokenize_with_breaks",
    "rebuild_text",
    "distant_supervision",
    "distant_supervision_with_relation",
    "find_full_matches",
    "whole_word_pattern",
    "format_date",
    "fill_template",
    "extract_article",
]
