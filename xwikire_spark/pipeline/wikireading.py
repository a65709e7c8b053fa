"""WikiReading-style document assembly (src/builders/WikiReading.py:14-88):
token sequences + break levels + sentence/paragraph breaks + answer
location arrays, with the reference's *first-property-only* semantics
(A9 — the early ``return`` inside the prop loop at src:49 means only one
property's answers are emitted per document; we replicate that bug-for-bug
for output parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xwikire_spark.functions.udfs import tokenize_udf


def tokenize_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds string_sequence / break_levels / sentence_breaks /
    paragraph_breaks (src/builders/WikiReading.py:51-57). Break-index
    derivation is a JVM higher-order filter over the UDF output (X9)."""
    out = (
        docs.where(F.length(F.trim(F.col(text_col))) > 0)
        .withColumn("tk", tokenize_udf(F.trim(F.col(text_col))))
        .withColumn("string_sequence", F.col("tk.tokens"))
        .withColumn("break_levels", F.col("tk.breaks"))
        .drop("tk")
    )
    idx = F.transform(
        F.col("break_levels"), lambda b, i: F.struct(i.alias("i"), b.alias("b"))
    )
    return out.withColumn(
        "sentence_breaks",
        F.transform(F.filter(idx, lambda x: x["b"] >= 3), lambda x: x["i"]),
    ).withColumn(
        "paragraph_breaks",
        F.transform(F.filter(idx, lambda x: x["b"] == 4), lambda x: x["i"]),
    )


def answer_locations(
    tokenized_docs: DataFrame,
    facts: DataFrame,
    doc_key: str = "entity_id",
) -> DataFrame:
    """Per (doc, property): answer token sequences + any-token matches (X19)
    + full sub-sequence matches (X20), first property only (A9).

    facts: (entity_id, pid, value). Output mirrors the wikireading_doc
    answer fields (src/builders/WikiReading.py:20-47)."""
    first_prop = Window.partitionBy(doc_key).orderBy("pid")
    one_prop = (
        facts.withColumn("rn", F.dense_rank().over(first_prop))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    with_answers = tokenized_docs.join(one_prop, doc_key).withColumn(
        "answer_sequence", tokenize_udf(F.col("value"))["tokens"]
    )

    seq = F.col("string_sequence")
    ans = F.col("answer_sequence")
    indexed = F.transform(seq, lambda t, i: F.struct(i.alias("i"), t.alias("t")))
    # X19: indices of tokens appearing anywhere in the answer
    any_match = F.transform(
        F.filter(indexed, lambda x: F.array_contains(ans, x["t"])),
        lambda x: x["i"],
    )
    # X20: all contiguous full-match start offsets -> index ranges.
    # Guard the empty answer: with size(ans)=0 the filter is vacuously true
    # at every index and sequence(s, s-1) yields a bogus descending pair —
    # mirror find_full_matches' empty-sublist -> [] contract instead.
    starts = F.when(
        F.size(ans) > 0,
        F.filter(
            F.transform(seq, lambda t, i: i),
            lambda i: (i + F.size(ans) <= F.size(seq))
            & (F.slice(seq, i + 1, F.size(ans)) == ans),
        ),
    ).otherwise(F.array().cast("array<int>"))
    full_match = F.transform(
        starts,
        lambda s: F.sequence(s, s + F.size(ans) - 1),
    )
    return with_answers.select(
        doc_key,
        "pid",
        "string_sequence",
        "break_levels",
        "sentence_breaks",
        "paragraph_breaks",
        F.col("value").alias("raw_answer"),
        "answer_sequence",
        any_match.alias("answer_location"),
        full_match.alias("full_match_answer_location"),
    )
