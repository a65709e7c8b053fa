"""Single-pass table profiling — the data-quality operator a 100 TB
ingest runs before anything else (the Deequ/Great-Expectations analyzer
shape): per column, row count, null count, exact distinct count, and
min/max, computed in ONE aggregate over ONE scan.

Scale shape: every statistic here is algebraic or sketchable —
count/min/max are map-side-combinable; count_distinct expands to a
two-phase expand+partial-aggregate under Catalyst (one shuffle keyed by
the grouping expand, never a per-column re-scan). One job, no matter how
many columns are profiled. For corpora where exact distincts are too hot
(billions of uniques), pass ``approx=True`` to swap in HyperLogLog++
(``approx_count_distinct``) — same single-scan plan, bounded memory —
at the cost of the driver-oracle hash gate (the oracle checks the exact
variant; the approx variant is gated by a relative-error pytest).

min/max are rendered as strings so the profile has ONE fixed schema
regardless of the profiled table's column types (numeric columns use
their canonical decimal rendering in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_null, n_distinct,
    min_value, max_value). Single aggregate over a single scan."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        distinct = (
            F.approx_count_distinct(c) if approx else F.count_distinct(c)
        )
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            distinct.alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    # unpivot the 1-row aggregate by exploding a struct array — one plan,
    # one scan, regardless of column count (a union of per-column
    # projections would lean on exchange reuse; this cannot re-scan)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")
