"""Dataset splitting & balancing (SURVEY §2.5): fold packing, stratified
capped sampling, per-class balancing, round-robin selection, split
sequencing, duplicate detection.

The reference implements these as driver-side Python over full JSONL files
(src/split_rel.py, src/split_entity.py, src/scripts/balance_relation.py);
here each is a window/aggregate plan. Determinism note from SURVEY §7: the
reference samples by *set iteration order* (nondeterministic); every
operator below pins an explicit ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def greedy_fold_packing(
    class_counts: DataFrame,
    n_folds: int = 10,
    class_col: str = "class",
    count_col: str = "count",
) -> DataFrame:
    """Reference src/split_rel.py:24-52: sort classes by count desc, pair
    rank i with rank N+1-i (largest with smallest), assign pair p to fold
    p % n_folds. Output: class, count, fold."""
    w = Window.orderBy(F.desc(count_col), F.asc(class_col))
    ranked = class_counts.withColumn("rank", F.row_number().over(w))
    total = ranked.agg(F.max("rank").alias("n")).first()["n"]
    return ranked.select(
        class_col,
        count_col,
        F.pmod(
            F.least(F.col("rank"), F.lit(total + 1) - F.col("rank")) - 1,
            F.lit(n_folds),
        ).alias("fold"),
    )


def per_fold_class_cap(
    examples: DataFrame,
    fold_col: str = "fold",
    class_col: str = "class",
    order_col: str = "id",
) -> DataFrame:
    """Reference src/split_rel.py:72-100 (A8): within each fold keep exactly
    min(class counts) examples of each class, in pinned order."""
    counts = examples.groupBy(fold_col, class_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    caps = counts.groupBy(fold_col).agg(F.min("n").alias("cap"))
    w = Window.partitionBy(fold_col, class_col).orderBy(order_col)
    return (
        examples.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(caps), fold_col)
        .where(F.col("rn") <= F.col("cap"))
        .drop("rn", "cap")
    )


def stratified_capped_sample(
    rows: DataFrame,
    strata_col: str,
    per_stratum: int,
    order_col: str,
) -> DataFrame:
    """W2 (src/split_entity.py:56-86): at most ``per_stratum`` rows per
    stratum, deterministic order."""
    w = Window.partitionBy(strata_col).orderBy(order_col)
    return (
        rows.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= per_stratum)
        .drop("rn")
    )


def round_robin_balance(
    rows: DataFrame,
    class_col: str,
    limit: int,
    order_col: str,
) -> DataFrame:
    """W4 (src/scripts/balance_relation.py:21-70): take one example per
    class per round until ``limit`` — i.e. order by (round, class) and cut.
    """
    rnd = Window.partitionBy(class_col).orderBy(order_col)
    glob = Window.orderBy("round", class_col, order_col)
    return (
        rows.withColumn("round", F.row_number().over(rnd))
        .withColumn("pick", F.row_number().over(glob))
        .where(F.col("pick") <= limit)
        .drop("round", "pick")
    )


def sequential_splits(
    pool: DataFrame,
    sizes: dict[str, int],
    id_col: str,
    order_col: str,
) -> DataFrame:
    """W5 (src/split_entity.py:115-138): draw test, then dev, then train
    from a shrinking pool (anti-join chain J8). Output adds ``split``."""
    remaining = pool
    out = None
    for split_name, n in sizes.items():
        w = Window.orderBy(order_col)
        taken = (
            remaining.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= n)
            .drop("rn")
            .withColumn("split", F.lit(split_name))
        )
        out = taken if out is None else out.unionByName(taken)
        remaining = remaining.join(
            taken.select(id_col), id_col, "left_anti"
        )
    return out


def duplicate_ids_across_splits(
    splits: DataFrame, id_col: str = "id"
) -> DataFrame:
    """A6 (src/split_entity.py:141-167): ids present more than once across
    split files — must be empty."""
    return (
        splits.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )
