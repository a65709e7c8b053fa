"""Exact per-group quantiles (type-1 / inverse-ECDF): the distribution
profiling a corpus audit needs (token-length deciles per language,
value quartiles per event type) with a DETERMINISTIC definition both
engines can agree on bit-for-bit — quantile q is the element at rank
ceil(q * n) in ascending order, no interpolation (R type 1 /
``percentile_disc``). Since r7 the rank test runs in exact integer
arithmetic over the rational each q's decimal literal denotes
(Fraction(str(q))), so the bit-for-bit claim holds for non-dyadic q
too (ADVICE r6: double ceil(0.07 * 100) returned rank 8, exact gives
7), matching an oracle that multiplies DECIMAL literals exactly.

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
    # Exact rank arithmetic (ADVICE r6): ceil(q * n) in DOUBLE diverges
    # from the documented type-1 semantics for non-dyadic q (0.07 * 100
    # = 7.000000000000001 -> ceil 8; exact arithmetic gives 7). Each q is
    # interpreted as the rational its decimal literal denotes
    # (Fraction(str(q)): 0.07 -> 7/100) and the rank test runs in pure
    # integer arithmetic: rk == ceil(num*n/den)  <=>  rk*den >= num*n
    # AND (rk-1)*den < num*n — no division, no floating point.
    from fractions import Fraction

    q_structs = []
    for q in sorted(qs):
        fr = Fraction(str(float(q)))
        q_structs.append(
            F.struct(
                F.lit(float(q)).alias("qd"),
                F.lit(fr.numerator).cast("long").alias("num"),
                F.lit(fr.denominator).cast("long").alias("den"),
            )
        )
    q_arr = F.array(*q_structs)
    # keep a row iff its rank is ceil(q*n) for some q; emit one output
    # row per matching q (a value can serve several quantiles in small
    # groups)
    hits = F.filter(
        q_arr,
        lambda s: (
            F.col("__rk").cast("long") * s["den"]
            >= s["num"] * F.col("__n").cast("long")
        )
        & (
            (F.col("__rk").cast("long") - 1) * s["den"]
            < s["num"] * F.col("__n").cast("long")
        ),
    )
    return (
        ranked.select(
            group_col,
            F.explode(F.transform(hits, lambda s: s["qd"])).alias("q"),
            F.col(value_col).alias("value"),
        )
    )
