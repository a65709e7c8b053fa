"""Bucketed-table helpers: shuffle-free co-located joins for the tables
the pipeline joins repeatedly at 100 TB.

Why this exists (north_rule: "partitioning / shuffle / skew handled
explicitly"): the KG pipeline joins conversation-keyed tables over and
over — triples x canonical map, turns x mentions, edge x vertex. A plain
join shuffles BOTH sides every time. Writing the stable side(s) bucketed
by the join key (`bucketBy(n, key)` + `sortBy`) persists the partitioning
in the table layout, so every later equi-join on that key runs with NO
Exchange on the bucketed side(s): Spark trusts the on-disk hash layout.
At 14M turns the shuffle is seconds; at 10^12 it is the job.

Rules that make it actually work (all encoded here, plan-asserted in
tests/test_plans.py):
- both sides bucketed with the SAME bucket count on the SAME key
  -> zero Exchange (sort may remain unless also sortBy'd);
- `spark.sql.sources.bucketing.enabled` must be on (default);
- bucket counts differing by an integer factor can still avoid one side's
  shuffle via `spark.sql.bucketing.coalesceBucketsInJoin.enabled`;
- bucketed writes require the session catalog (`saveAsTable`) — a plain
  `.parquet(path)` write silently drops bucket metadata. An explicit
  `path` option keeps the data external/relocatable.

Iceberg note (north_star names Iceberg tables): no Iceberg runtime jar
ships in this sandbox, so the catalog layer is Spark's built-in; the
bucketing DDL maps 1:1 onto Iceberg's `bucket(n, col)` partition
transform + `write.distribution-mode=hash` — same physical co-location,
same shuffle-free join property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_col: str = "conv_id",
    sort_cols: tuple[str, ...] = (),
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed by ``bucket_col`` (optionally
    sort-within-buckets, which also removes the join's Sort node)."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def cocluster_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Equi-join of two same-bucketed tables — the shuffle-free path.
    Exists mostly as the documented/plan-asserted pattern; any equi-join
    of the two tables on the bucket key gets the property automatically.
    """
    return spark.table(left_table).join(spark.table(right_table), on)
