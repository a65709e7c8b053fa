"""Distributed triangle counting — the graph-quality metric for entity
graphs (KG density / clustering audits) and the textbook case study in
join-skew control.

The naive enumeration joins the edge list with itself on the shared
endpoint; a hub of degree d contributes d^2 wedge rows, so one celebrity
node can dwarf the rest of the job. The standard fix (node-iterator++ /
Schank-Wagner) orients every edge from its LOWER-degree endpoint to its
higher-degree endpoint (ties broken by id): every node's OUT-degree is
then bounded by O(sqrt(m)), wedges are enumerated only between
out-neighbors, and each triangle is produced exactly once under the
acyclic orientation. Both joins are plain equi-joins Catalyst shuffles
by key — no window, no iteration.

Per-node attribution is orientation-independent: a closed wedge
(a -> b, a -> c, b ~ c) is one triangle {a, b, c}; exploding the three
members and aggregating gives each node its true triangle count, which
is what the DuckDB oracle (plain a<b<c enumeration — affordable at test
scale) checks hash-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Dedup to one row per undirected edge {u, v}, self-loops dropped."""
    u = F.least(F.col(src), F.col(dst)).alias("u")
    v = F.greatest(F.col(src), F.col(dst)).alias("v")
    return (
        edges.select(u, v)
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    materialize: bool = True,
) -> DataFrame:
    """Per-node triangle participation: (node, n_triangles), nodes in no
    triangle omitted. Input edges are treated as undirected; duplicates
    and self-loops are ignored.

    ``materialize`` (default on) localCheckpoints the canonical and
    oriented edge sets: both are referenced by multiple join branches
    (degrees, wedges, closure), and without severing lineage each branch
    re-derives the full upstream edge computation — measured 56 exchange
    nodes vs 10 on the co-purchase graph. Both frames are O(m)."""
    und = _canonical_undirected(edges, src, dst)
    if materialize:
        und = und.localCheckpoint()
    # degree over the undirected edge set
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient low-degree -> high-degree (id tiebreak): out-degree bounded
    # by O(sqrt(m)), so the wedge join below cannot blow up on hubs
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    withdeg = und.join(du, "u").join(dv, "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = withdeg.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
    )
    if materialize:
        oriented = oriented.localCheckpoint()
    # wedges between out-neighbors of the same pivot, closed against the
    # oriented edge set (a triangle has exactly one node with out-edges
    # to the other two under an acyclic orientation)
    e1 = oriented.select(
        F.col("lo").alias("pivot"), F.col("hi").alias("x")
    )
    e2 = oriented.select(
        F.col("lo").alias("pivot"), F.col("hi").alias("y")
    )
    wedges = e1.join(e2, "pivot").where(F.col("x") < F.col("y"))
    # close against the canonical (u < v) undirected set — wedge ends are
    # already emitted with x < y, so no symmetric expansion is needed
    tris = wedges.join(
        und,
        (F.col("x") == F.col("u")) & (F.col("y") == F.col("v")),
    ).select("pivot", "x", "y")
    member = tris.select(
        F.explode(F.array("pivot", "x", "y")).alias("node")
    )
    return member.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
