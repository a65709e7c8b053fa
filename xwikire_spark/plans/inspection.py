"""Physical-plan hygiene assertions — automated `.explain` review.

"After each operator works, explain the plan and iterate until it's the
plan you'd want": these helpers make the wanted properties *testable* so a
regression that adds a shuffle or un-prunes a scan fails CI, not a 100 TB
run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().simpleString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (excluding broadcast/reused)."""
    plan = optimized_plan(df)
    return len(re.findall(r"\bExchange hashpartitioning", plan)) + len(
        re.findall(r"\bExchange rangepartitioning", plan)
    )

def single_partition_exchanges(df: DataFrame) -> int:
    """Number of Exchange SinglePartition operators — the global-sort /
    global-window scale killer (the whole input serializes through ONE
    task). Scale-safe plans over big inputs must show zero."""
    return len(re.findall(r"Exchange SinglePartition", optimized_plan(df)))


def count_broadcasts(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastExchange|BroadcastHashJoin",
                          optimized_plan(df)))


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema strings of every file scan — pruning check."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", optimized_plan(df))


def python_eval_count(df: DataFrame) -> int:
    """Number of Python-boundary operators (ArrowEval / MapInPandas /
    FlatMapGroupsInPandas) — fewer is better (fused kernels)."""
    plan = optimized_plan(df)
    return sum(
        len(re.findall(p, plan))
        for p in (r"ArrowEvalPython", r"MapInPandas",
                  r"FlatMapGroupsInPandas")
    )
