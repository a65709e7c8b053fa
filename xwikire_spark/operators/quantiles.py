"""Exact per-group quantiles (type-1 / inverse-ECDF): the distribution
profiling a corpus audit needs (token-length deciles per language,
value quartiles per event type) with a DETERMINISTIC definition both
engines can agree on bit-for-bit — quantile q is the element at rank
ceil(q * n) in ascending order, no interpolation (R type 1 /
``percentile_disc``).

Spark-first: one window per group computes ranks (the same shuffle a
groupBy costs), group sizes ride the window's partition (count over the
unbounded frame — no second aggregate or join), and the q-list is a
broadcast-free literal array: each row tests membership of its own rank
in the ceil(q*n) set via ``exists``, so the whole operator is one
shuffle + one filter. Duplicate values are fine (row_number with the
value as the sort key picks a deterministic representative; the VALUE at
the rank is what's returned, which is unique per (group, q) by
construction).

``percentile_approx``/``approx_percentile`` is the right call at
100 TB when exactness isn't required — it is sketch-mergeable and
single-pass — but it can't be oracle-gated value-exactly; this operator
is the exact complement, still one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_group_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    qs: list[float],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(group, q, value) for each q in ``qs`` (0 < q <= 1), value = the
    element at rank ceil(q*n) per group. ``tiebreak_col`` makes the rank
    order total when values repeat (any unique column); the returned
    VALUE is the same whichever duplicate wins."""
    if not qs or not all(0 < q <= 1 for q in qs):
        raise ValueError(f"qs must be in (0, 1], got {qs}")
    order = [F.col(value_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(group_col).orderBy(*order)
    w_all = Window.partitionBy(group_col)
    ranked = df.select(
        group_col,
        value_col,
        F.row_number().over(w).alias("__rk"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    )
    q_arr = F.array(*[F.lit(float(q)) for q in sorted(qs)])
    # keep a row iff its rank is ceil(q*n) for some q; emit one output
    # row per matching q (a value can serve several quantiles in small
    # groups)
    hits = F.filter(
        q_arr,
        lambda q: F.ceil(q * F.col("__n")).cast("long")
        == F.col("__rk").cast("long"),
    )
    return (
        ranked.select(
            group_col,
            F.explode(hits).alias("q"),
            F.col(value_col).alias("value"),
        )
    )
