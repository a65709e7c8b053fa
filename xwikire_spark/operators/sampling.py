"""Weighted sampling without replacement (Efraimidis–Spirakis A-Res):
draw k rows per stratum with inclusion probability proportional to a
weight column — how a training-data pipeline subsamples shards by
quality score or domain mixing weight while staying REPRODUCIBLE.

The A-Res trick makes weighted-without-replacement a top-k problem:
assign each row the key u^(1/w) for u ~ Uniform(0,1) and keep the k
largest keys — exactly the weighted sample (Efraimidis & Spirakis 2006,
IPL 97(5); the standard distributed formulation, one window per
stratum, no sequential scan).

Randomness is a deterministic multiplicative hash of the id column
(Knuth 2654435761 mod 2^32), not a PRNG: reruns, retries, and the
DuckDB oracle all see the same sample — determinism is a feature in
data pipelines (the same reason splits.py uses seeded hashes, not
random()). Keys are compared as ln(u)/w (monotone in u^(1/w)) to avoid
pow() underflow at large weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_KNUTH = 2654435761
_M32 = 4294967296


def uniform_hash_expr(id_col: str):
    """Deterministic uniform in (0, 1): multiplicative integer hash of
    the id — portable integer arithmetic (mirrored verbatim in the SQL
    oracle), granular to 2^-32."""
    h = (F.col(id_col).cast("long") * F.lit(_KNUTH)) % F.lit(_M32)
    return (h.cast("double") + F.lit(0.5)) / F.lit(float(_M32))


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    strata_col: str | None = None,
) -> DataFrame:
    """k rows per stratum (or overall when ``strata_col`` is None),
    without replacement, P(inclusion) proportional to ``weight_col``
    (must be > 0). Adds ``sample_rank`` (1..k within stratum). One
    window over the stratum key — the same shuffle a groupBy costs."""
    key = F.log(uniform_hash_expr(id_col)) / F.col(weight_col)
    keyed = df.withColumn("__key", key)
    order = [F.desc("__key"), F.asc(id_col)]
    if strata_col:
        w = Window.partitionBy(strata_col).orderBy(*order)
        return (
            keyed.withColumn("sample_rank", F.row_number().over(w))
            .where(F.col("sample_rank") <= k)
            .drop("__key")
        )
    # unstratified: orderBy().limit() compiles to TakeOrderedAndProject
    # (per-partition top-k + a k-row merge) — never a single-partition
    # window over the corpus; rank derived AFTER the limit sees k rows
    top = keyed.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return (
        top.withColumn("sample_rank", F.row_number().over(w))
        .drop("__key")
    )
