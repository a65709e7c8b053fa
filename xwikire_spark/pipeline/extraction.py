"""Distant-supervision triple extraction over conversation transcripts.

Reference semantics being reproduced (SURVEY §3.1, §3.2):
- sentence segmentation per document        (src/builders/QA.py:34)
- whole-word co-occurrence in ONE sentence  (src/builders/QA.py:76-84)
- relation surface must also occur          (src/builders/SRL.py:93-103)
- first qualifying sentence wins            (src/builders/QA.py:80-84)
- triple id = sha1("subj pid obj")          (src/universal_schema.py:12-14)

Transcript mapping (BASELINE.json north_star): conv_id plays the article-id
role, turns play sentences/paragraphs; the *subject* is the earliest entity
mention in the sentence (the reference's subject is the page entity — a
transcript has no page entity, so document order decides, keeping the
first-match determinism the reference gets from iteration order).

Scale notes (100 TB plan):
- transcripts are repartitioned by hash(conv_id) once, up front; every
  subsequent per-conversation operation (windows, dedup) reuses that
  partitioning — one shuffle for the whole pipeline;
- alias/predicate dictionaries are broadcast (the reference's _prop_cache,
  src/builders/MergedWikis.py:28) — mention resolution never shuffles the
  fact table;
- the dedup window partitions by (conv_id, subj, pred, obj) — same hash
  family as the repartition, so AQE coalesces instead of reshuffling;
- hot entities skew only the *canonicalization* join, handled there with
  salting + AQE skew-join (see canonicalize.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xwikire_spark.functions.ids import triple_id
from xwikire_spark.functions.udfs import make_mention_udf, segment_udf


def segment_turns(transcripts: DataFrame) -> DataFrame:
    """transcripts -> one row per (turn, sentence), order-stable.

    Output: conv_id, turn_idx, role, ts, sent_idx, sentence.
    The empty-text filter mirrors F1 (src/builders/QA.py:30-32).
    """
    return (
        transcripts.where(F.length(F.trim(F.col("text"))) > 0)
        .withColumn("sentences", segment_udf(F.col("text")))
        .select(
            "conv_id",
            "turn_idx",
            "role",
            "ts",
            F.posexplode("sentences").alias("sent_idx", "sentence"),
        )
    )


def _dictionary_pairs(dim: DataFrame, surface_col: str) -> list[tuple[str, str]]:
    """Collect a dictionary dimension to (surface, surface) pairs for the
    matcher closure. Ids are resolved by a broadcast join afterwards so
    alias collisions (one surface, many entities) survive."""
    rows = dim.select(surface_col).distinct().collect()
    return [(r[0], r[0]) for r in rows if r[0]]


def detect_mentions(sentences: DataFrame, alias_dict: DataFrame) -> DataFrame:
    """Attach entity mentions: longest whole-word dictionary match (X4
    generalized), ids resolved via broadcast join (J2 analog).

    Output adds: surface, entity_id, m_start, m_end (one row per mention).
    """
    surfaces = _dictionary_pairs(alias_dict, "alias")
    udf = make_mention_udf(surfaces)
    hits = (
        sentences.withColumn("mentions", udf(F.col("sentence")))
        .where(F.size("mentions") > 0)
        .select(
            "*",
            F.explode("mentions").alias("m"),
        )
        .select(
            "conv_id", "turn_idx", "role", "ts", "sent_idx", "sentence",
            F.col("m.surface").alias("surface"),
            F.col("m.start").alias("m_start"),
            F.col("m.end").alias("m_end"),
        )
    )
    return hits.join(
        F.broadcast(alias_dict.select(F.col("alias").alias("surface"),
                                      "entity_id")),
        "surface",
    )


def detect_predicates(sentences: DataFrame, predicate_dict: DataFrame) -> DataFrame:
    """Attach predicate-surface matches (label + aliases,
    src/builders/SRL.py:36-39). Output: one row per predicate hit with
    pid, p_surface, p_start."""
    surf = predicate_dict.select(
        F.explode(
            F.array_union(F.array(F.col("label")), F.col("aliases"))
        ).alias("p_surface"),
        F.col("pid"),
    )
    surfaces = _dictionary_pairs(surf, "p_surface")
    udf = make_mention_udf(surfaces)
    hits = (
        sentences.withColumn("pm", udf(F.col("sentence")))
        .where(F.size("pm") > 0)
        .select(
            "conv_id", "turn_idx", "sent_idx",
            F.explode("pm").alias("p"),
        )
        .select(
            "conv_id", "turn_idx", "sent_idx",
            F.col("p.surface").alias("p_surface"),
            F.col("p.start").alias("p_start"),
        )
    )
    return hits.join(F.broadcast(surf), "p_surface")


def extract_triples(
    transcripts: DataFrame,
    alias_dict: DataFrame,
    predicate_dict: DataFrame,
    n_partitions: int | None = None,
) -> DataFrame:
    """The flagship query: transcripts -> (subj, pred, obj) evidence triples.

    Semantics: within one sentence, the earliest entity mention is the
    subject; every other mention with a different entity_id is an object;
    the earliest predicate surface is the relation. Exactly one evidence
    sentence per (conv_id, subj, pred, obj) — the first in
    (turn_idx, sent_idx, m_start) order (X5 first-match parity).
    """
    if n_partitions:
        # explicit repartition by conv hash (north_rule); downstream windows
        # reuse this partitioning.
        transcripts = transcripts.repartition(n_partitions, F.col("conv_id"))

    sentences = segment_turns(transcripts)
    mentions = detect_mentions(sentences, alias_dict)
    predicates = detect_predicates(sentences, predicate_dict)

    sent_key = ["conv_id", "turn_idx", "sent_idx"]

    # earliest predicate per sentence (first-match, X5)
    first_pred = (
        predicates.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(*sent_key).orderBy("p_start", "pid")
            ),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )

    # earliest mention per sentence = subject; different-entity mentions are
    # objects. Self-join stays within one sentence — co-partitioned, no
    # row explosion beyond mention pairs.
    subj = (
        mentions.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(*sent_key).orderBy("m_start", "entity_id")
            ),
        )
        .where(F.col("rn") == 1)
        .select(
            *sent_key, "sentence", "ts",
            F.col("entity_id").alias("subj"),
            F.col("surface").alias("subj_surface"),
            F.col("m_start").alias("subj_start"),
        )
    )
    obj = mentions.select(
        *sent_key,
        F.col("entity_id").alias("obj"),
        F.col("surface").alias("obj_surface"),
        F.col("m_start").alias("obj_start"),
    )

    cands = (
        subj.join(obj, sent_key)
        .where(F.col("obj") != F.col("subj"))
        .join(first_pred, sent_key)
    )

    dedup = Window.partitionBy("conv_id", "subj", "pid", "obj").orderBy(
        "turn_idx", "sent_idx", "obj_start"
    )
    return (
        cands.withColumn("rn", F.row_number().over(dedup))
        .where(F.col("rn") == 1)
        .select(
            triple_id("subj", "pid", "obj").alias("id"),
            F.col("subj"),
            F.col("pid").alias("pred"),
            F.col("obj"),
            "conv_id",
            "turn_idx",
            "sent_idx",
            F.col("sentence").alias("evidence"),
            "subj_surface",
            F.col("p_surface").alias("pred_surface"),
            "obj_surface",
        )
    )


def pair_mentions_in_window(
    mentions: DataFrame, max_turn_distance: int = 2
) -> DataFrame:
    """Conversation-window mention pairing (north_star: "aligning linked
    mention pairs within conversation windows").

    Pairs distinct entities whose mentions occur within
    ``max_turn_distance`` turns of each other in the same conversation.
    Implemented as a bucketed range join: each mention lands in bucket
    ``turn_idx / (d+1)`` and joins its own and the adjacent bucket only —
    a self-join on (conv_id, bucket) with a |Δturn| predicate, instead of a
    full per-conversation cross join. Scale: buckets keep the join fan-out
    O(mentions_per_window²), independent of conversation length.
    """
    d = max_turn_distance
    m = mentions.select(
        "conv_id", "turn_idx", "entity_id",
        (F.col("turn_idx") / (d + 1)).cast("long").alias("bucket"),
    ).dropDuplicates(["conv_id", "turn_idx", "entity_id"])

    in_range = (F.col("b.turn_idx") - F.col("a.turn_idx")).between(0, d)
    canonical_order = (F.col("b.turn_idx") > F.col("a.turn_idx")) | (
        (F.col("b.turn_idx") == F.col("a.turn_idx"))
        & (F.col("a.entity_id") < F.col("b.entity_id"))
    )
    distinct_entities = F.col("a.entity_id") != F.col("b.entity_id")

    pairs = None
    for shift in (0, 1):  # partner is in my bucket or the next one
        right = m.withColumn("bucket", F.col("bucket") - shift).alias("b")
        p = (
            m.alias("a")
            .join(right, ["conv_id", "bucket"])
            .where(in_range & canonical_order & distinct_entities)
            .select(
                "conv_id",
                F.col("a.entity_id").alias("entity_a"),
                F.col("b.entity_id").alias("entity_b"),
                F.col("a.turn_idx").alias("turn_a"),
                F.col("b.turn_idx").alias("turn_b"),
            )
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.dropDuplicates(
        ["conv_id", "entity_a", "entity_b", "turn_a", "turn_b"]
    )
