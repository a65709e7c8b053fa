"""Vectorized pandas UDFs wrapping the pure kernels.

Design rules (BASELINE.json input_hint: "no per-row Python"):
- every UDF here is Arrow-batched (`pandas_udf`) — rows cross the
  JVM<->Python boundary in columnar batches, not one at a time;
- dictionary-dependent UDFs (mention/predicate detection) are *scalar
  iterator* UDFs: the matcher automaton is compiled once per executor task
  from the closure-captured dictionary, then reused across all Arrow batches
  — the Spark analog of the reference's process-lifetime ``_prop_cache``
  (src/builders/MergedWikis.py:28,37-41);
- heavy outputs are struct/array columns so downstream stays relational
  (posexplode, joins) instead of Python.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from xwikire_spark.kernels.dates import format_date
from xwikire_spark.kernels.segmenter import segment_sentences
from xwikire_spark.kernels.templates import fill_template
from xwikire_spark.kernels.articles import extract_article
from xwikire_spark.kernels.textfix import fix_text
from xwikire_spark.kernels.tokenizer import tokenize_with_breaks

# ---------------------------------------------------------------------------
# Sentence segmentation (X7): text -> array<string> of sentences.
# Reference: nltk.sent_tokenize per doc (src/builders/QA.py:34).
# ---------------------------------------------------------------------------

segment_udf = F.pandas_udf(
    lambda s: s.map(lambda t: segment_sentences(t or "")),
    ArrayType(StringType()),
)

# ---------------------------------------------------------------------------
# Tokenization with break levels (X8): text -> struct<tokens, breaks>.
# Reference: sling-style contract (src/tokenizers/sling_tokenizer.py:8-13).
# ---------------------------------------------------------------------------

TOKENS_SCHEMA = StructType(
    [
        StructField("tokens", ArrayType(StringType())),
        StructField("breaks", ArrayType(IntegerType())),
    ]
)


@F.pandas_udf(TOKENS_SCHEMA)
def tokenize_udf(texts: pd.Series) -> pd.DataFrame:
    toks, brks = [], []
    for t in texts:
        tk, bk = tokenize_with_breaks(t or "")
        toks.append(tk)
        brks.append(bk)
    return pd.DataFrame({"tokens": toks, "breaks": brks})


# ---------------------------------------------------------------------------
# Dictionary mention detection (X4 generalized): longest whole-word match of
# any dictionary surface, all occurrences, left to right.
# The reference scans one entity label + one value per fact
# (src/builders/QA.py:76-84); entity linking over transcripts needs the
# full-dictionary variant. Alternation sorted by length desc gives
# leftmost-longest: at equal start offsets the longer surface is listed
# first, and finditer consumes the match (no overlaps).
# ---------------------------------------------------------------------------

# Field order is the sort order: array_sort over this struct orders by
# (start, matched_id) — earliest-match-then-id, the reference's first-match
# determinism (src/builders/QA.py:80-84) without a window.
MENTIONS_SCHEMA = ArrayType(
    StructType(
        [
            StructField("start", IntegerType()),
            StructField("matched_id", StringType()),
            StructField("surface", StringType()),
            StructField("end", IntegerType()),
        ]
    )
)


def _compile_dictionary(surfaces: list[tuple[str, str]]):
    """Build (regex, surface -> [ids]) from (surface, id) pairs. Longest
    surface first so alternation is leftmost-longest. Case-sensitive like
    the reference's matching (src/builders/QA.py:78-81). A surface mapping
    to several ids (alias collision) emits one mention per id."""
    by_len = sorted({s for s, _ in surfaces if s}, key=len, reverse=True)
    if not by_len:
        return None, {}
    pattern = re.compile(
        r"\b(?:" + "|".join(re.escape(s) for s in by_len) + r")\b"
    )
    ids: dict[str, list[str]] = {}
    for s, i in surfaces:
        bucket = ids.setdefault(s, [])
        if i not in bucket:
            bucket.append(i)
    return pattern, ids


def unwrap_broadcast(surfaces):
    """(surface, id) pairs, from a plain list OR a pyspark Broadcast."""
    return surfaces.value if hasattr(surfaces, "value") else surfaces


def make_mention_udf(surfaces):
    """Scalar-iterator pandas UDF: sentence -> array of dictionary mentions.

    ``surfaces`` is the (surface, id) dimension as a
    ``SparkContext.broadcast`` handle (preferred: the pairs ship to each
    executor ONCE via the torrent broadcast, not re-pickled into every task
    closure — the Spark analog of the reference's process-lifetime
    _prop_cache, src/builders/MergedWikis.py:28) or a plain list (tests /
    tiny dicts). The automaton compiles once per task and is reused across
    Arrow batches. Id resolution happens here too (one struct per id on
    collisions) so the pipeline needs no resolution join. For dictionaries
    too large to broadcast at all, use the join-based token path
    (pipeline.extraction.detect_mentions_join).
    """

    @F.pandas_udf(MENTIONS_SCHEMA)
    def mention_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        pattern, ids = _compile_dictionary(unwrap_broadcast(surfaces))
        for texts in batches:
            out = []
            for t in texts:
                if not t or pattern is None:
                    out.append([])
                    continue
                ms = [
                    {
                        "start": m.start(),
                        "matched_id": i,
                        "surface": m.group(),
                        "end": m.end(),
                    }
                    for m in pattern.finditer(t)
                    for i in ids[m.group()]
                ]
                out.append(ms)
            yield pd.Series(out)

    return mention_udf


# ---------------------------------------------------------------------------
# Word-run offsets: sentence -> array<struct<tok, pos>> of unicode \w+ runs
# with 0-based char starts. Dictionary-FREE (nothing in the closure) — the
# tokenization half of the join-based mention path for dictionaries too
# large to broadcast; the dictionary side stays a DataFrame and meets these
# tokens in a shuffle equi-join (extraction.detect_mentions_join).
# ---------------------------------------------------------------------------

_WORD_RUN = re.compile(r"\w+", re.UNICODE)

WORD_OFFSETS_SCHEMA = ArrayType(
    StructType(
        [
            StructField("tok", StringType()),
            StructField("pos", IntegerType()),
        ]
    )
)

word_offsets_udf = F.pandas_udf(
    lambda s: s.map(
        lambda t: [
            {"tok": m.group(), "pos": m.start()}
            for m in _WORD_RUN.finditer(t or "")
        ]
    ),
    WORD_OFFSETS_SCHEMA,
)

# Fused segmentation + word-run offsets: text -> one struct per sentence
# carrying its token offsets. The join-based extraction path needs BOTH
# kernels; running them as two chained pandas UDFs costs two Arrow
# round-trips and re-serializes every sentence into the second UDF
# (guide §4: you control how many columns cross and how often). One UDF,
# one Python stage — same pure kernels, bit-identical output.

SENT_WORDS_SCHEMA = ArrayType(
    StructType(
        [
            StructField("sentence", StringType()),
            StructField(
                "ws",
                ArrayType(
                    StructType(
                        [
                            StructField("tok", StringType()),
                            StructField("pos", IntegerType()),
                        ]
                    )
                ),
            ),
        ]
    )
)

segment_word_offsets_udf = F.pandas_udf(
    lambda s: s.map(
        lambda t: [
            {
                "sentence": sent,
                "ws": [
                    {"tok": m.group(), "pos": m.start()}
                    for m in _WORD_RUN.finditer(sent)
                ],
            }
            for sent in segment_sentences(t or "")
        ]
    ),
    SENT_WORDS_SCHEMA,
)


# ---------------------------------------------------------------------------
# Date formatting (X11), template filling (X14), article extraction (X15):
# plain scalar pandas UDFs over the pure kernels.
# ---------------------------------------------------------------------------


# X16: mojibake repair (reference applies ftfy.fix_text per sentence,
# src/builders/SRL.py:111)
fix_text_udf = F.pandas_udf(
    lambda s: s.map(lambda t: fix_text(t or "")), StringType()
)


def make_pos_udf(model):
    """tokens array<string> -> PTB tags array<string> via the averaged
    perceptron. ``model`` is the trained weight dict or a
    SparkContext.broadcast of it — broadcast at cluster scale so the
    weights ship once per executor (X10: the reference's nltk.pos_tag with
    the model made an explicit, shippable artifact)."""
    from xwikire_spark.kernels.perceptron import tag_with_model

    @F.pandas_udf(ArrayType(StringType()))
    def pos_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        m = unwrap_broadcast(model)
        for toks in batches:
            yield pd.Series(
                [
                    tag_with_model(
                        [] if t is None else list(t), m
                    )
                    for t in toks
                ],
                dtype="object",
            )

    return pos_udf


def make_format_date_udf(lang: str = "en"):
    @F.pandas_udf(StringType())
    def date_udf(raw_time: pd.Series, precision: pd.Series) -> pd.Series:
        return pd.Series(
            [
                format_date(t or "", int(p) if pd.notna(p) else 9, lang)
                for t, p in zip(raw_time, precision)
            ]
        )

    return date_udf


def make_fill_template_udf(lang: str = "en"):
    @F.pandas_udf(StringType())
    def template_udf(
        template: pd.Series, entity: pd.Series, article: pd.Series
    ) -> pd.Series:
        return pd.Series(
            [
                fill_template(t or "", e or "", lang=lang, article=a or "")
                for t, e, a in zip(template, entity, article)
            ]
        )

    return template_udf


def make_extract_article_udf(lang: str = "en"):
    @F.pandas_udf(StringType())
    def article_udf(text: pd.Series, entity: pd.Series) -> pd.Series:
        return pd.Series(
            [
                extract_article(t or "", e or "", lang=lang)
                for t, e in zip(text, entity)
            ]
        )

    return article_udf
