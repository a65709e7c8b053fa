"""Graph materialization: partitioned edge + vertex tables (north_rule:
"materialized as partitioned edge/vertex Iceberg tables with per-partition
lineage manifests"). Parquet-dir fallback for the Iceberg catalog, same as
the rest of the repo (the container has no Iceberg runtime jar; the write
path is identical modulo the format string).

Edges = the evidence triples themselves (one row per (conv, subj, pred,
obj)), bucketed by pmod(xxhash64(conv_id)) through pipeline.manifests so
they inherit checkpointed resume. Vertices = one row per entity with
degree stats, bucketed by entity hash — the side the canonicalization and
entity-serving layers read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def vertex_table(triples: DataFrame) -> DataFrame:
    """One row per entity: out_degree (triples as subject), in_degree
    (as object), conv_mentions (TRUE distinct count of conversations the
    entity appears in, either role — the roles are unioned before the
    countDistinct, so a conversation where the entity is both subject and
    object counts once; ADVICE r2 flagged the earlier role-summed double
    count). Three hash aggregates on the (small) entity key."""
    outd = triples.groupBy(F.col("subj").alias("entity_id")).agg(
        F.count(F.lit(1)).alias("out_degree"),
    )
    ind = triples.groupBy(F.col("obj").alias("entity_id")).agg(
        F.count(F.lit(1)).alias("in_degree"),
    )
    convs = (
        triples.select(F.col("subj").alias("entity_id"), "conv_id")
        .unionByName(triples.select(F.col("obj").alias("entity_id"), "conv_id"))
        .groupBy("entity_id")
        .agg(F.countDistinct("conv_id").alias("conv_mentions"))
    )
    return (
        outd.join(ind, "entity_id", "full")
        .join(convs, "entity_id", "full")
        .select(
            "entity_id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("conv_mentions", F.lit(0)).alias("conv_mentions"),
        )
    )


def materialize_graph(
    spark: SparkSession,
    transcripts: DataFrame,
    build_fn,
    out_dir: str,
    n_buckets: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """Full graph materialization with lineage: edges through
    run_with_manifests (bucketed, resumable, drift-detected), vertices
    derived FROM THE WRITTEN EDGES (no recompute of the extraction) and
    bucketed by entity hash. Returns (edges, vertices) read back."""
    from xwikire_spark.pipeline.manifests import run_with_manifests

    edges = run_with_manifests(
        spark, transcripts, build_fn, out_dir, n_buckets
    )
    vertices = vertex_table(edges).withColumn(
        "part_bucket", F.pmod(F.xxhash64("entity_id"), F.lit(n_buckets))
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    vertices.write.mode("overwrite").partitionBy("part_bucket").parquet(
        os.path.join(out_dir, "vertices")
    )
    return edges, spark.read.parquet(os.path.join(out_dir, "vertices"))
