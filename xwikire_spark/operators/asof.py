"""As-of (point-in-time) join — the classic operator Spark's built-in
join zoo lacks (pandas ``merge_asof`` / kdb ``aj`` / DuckDB ``ASOF
JOIN`` semantics): each left row picks the single right row with the
greatest ``on`` value that is <= the left row's ``on`` (backward,
inclusive), within the same ``by`` key.

Spark-first implementation — NOT a range join (which Catalyst would plan
as a broadcast-nested-loop or an exploding theta join): tag the two
inputs, UNION them, and run ONE window per ``by`` key ordered by
``(on, side)`` taking ``last(value, ignorenulls=True)``. Cost profile is
a single hash shuffle on ``by`` plus a per-key sort — the same shape as
any groupBy on the key, with no pairwise blow-up however dense the right
side is. Skewed keys behave exactly like a skewed groupBy (AQE's skew
handling applies); there is no O(left x right) term anywhere.

At equal timestamps the right row sorts BEFORE the left row (side 0 <
side 1), making the match inclusive, matching DuckDB's ``ASOF JOIN``
``>=`` semantics — which is the correctness oracle for the driver query
(`evt_asof_join`) and the pytest differential.

``tolerance``: a left row whose matched right ``on`` is further than
``tolerance`` in the past is left unmatched (pandas ``merge_asof``
tolerance) — implemented by also chasing the matched ``on`` value
through the same window and nulling the carried columns afterwards, so
it costs zero extra shuffles.

Reference parity: the reference engine has no as-of join; this is one of
the beyond-reference training-pipeline operators (event-stream feature
lookup: "the user's most recent profile/login/price as of this event").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_MATCH_ON = "__asof_matched_on"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    tolerance: Column | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward-inclusive as-of join. Returns every ``left`` row with the
    value columns of the latest ``right`` row (same ``by`` key,
    ``right.on <= left.on``) appended under ``<col><suffix>`` names, plus
    ``<on><suffix>`` = the matched right timestamp (null if no match /
    outside ``tolerance``).

    Ties inside ``right`` at one ``(by, on)`` point are broken by taking
    the last row in the right frame's remaining-column order — pass a
    deduplicated right frame when that matters (the oracle query does).
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    val_cols = [c for c in right.columns if c not in by_cols and c != on]

    lhs = left.select(
        *left.columns,
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in val_cols],
        F.lit(None).cast(right.schema[on].dataType).alias(_MATCH_ON),
    )
    rhs = right.select(
        *[F.col(on) if c == on else F.lit(None).cast(
            left.schema[c].dataType
        ).alias(c) if c not in by_cols else F.col(c)
          for c in left.columns],
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"{c}{suffix}") for c in val_cols],
        F.col(on).alias(_MATCH_ON),
    )
    unioned = lhs.unionByName(rhs)

    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(on).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
        for c in val_cols
    ]
    matched_on = F.last(_MATCH_ON, ignorenulls=True).over(w)
    out = unioned.select(
        *[c for c in left.columns],
        F.col(_SIDE),
        *carried,
        matched_on.alias(_MATCH_ON),
    ).where(F.col(_SIDE) == 1)

    if tolerance is not None:
        in_tol = F.col(_MATCH_ON).isNotNull() & (
            F.col(on).cast("long") - F.col(_MATCH_ON).cast("long")
            <= tolerance
        )
        out = out.select(
            *left.columns,
            *[F.when(in_tol, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
              for c in val_cols],
            F.when(in_tol, F.col(_MATCH_ON)).alias(f"{on}{suffix}"),
        )
    else:
        out = out.select(
            *left.columns,
            *[F.col(f"{c}{suffix}") for c in val_cols],
            F.col(_MATCH_ON).alias(f"{on}{suffix}"),
        )
    return out
