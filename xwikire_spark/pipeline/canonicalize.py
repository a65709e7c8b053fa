"""Entity canonicalization: connected components over the alias-sharing
graph (north_rule: "canonicalized via connected-components alias clustering
on a salted key to break hot-entity skew").

The reference has no canonicalization (alias collisions simply produce
separate facts); transcripts need it because one surface can link to many
entities (alias_dict collisions, FIXTURES.md §2). Component id = the
lexicographically smallest entity_id in the component — deterministic.

Algorithm: iterative min-label propagation (hash-join based "large-star"
variant) — labels converge in O(log n) rounds on real alias graphs:

    labels(v) = v
    repeat: labels(v) = min(labels(v), min over neighbors u of labels(u))
    until no label changes

Scale notes:
- edges are symmetrized once so each round is ONE shuffle join;
- hot vertices (an alias shared by thousands of entities would create a
  high-degree node) are salted: the neighbor-min aggregation first combines
  per (vertex, salt) partial mins, then per vertex — the classic two-phase
  skew-safe aggregation; AQE skew-join handles residual join skew;
- each round's result is localCheckpoint()ed to cut the lineage chain
  (iterative plans otherwise grow exponentially).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_SALTS = 8

# An alias shared by more entities than this is non-discriminative (a
# stop-surface like "the company") and its pair fan-out is quadratic —
# the same stop-bucket guard as LSH banding (operators/dedup.py).
DEFAULT_MAX_ALIAS_FANOUT = 1000


def collision_edges(
    alias_dict: DataFrame, max_bucket: int = DEFAULT_MAX_ALIAS_FANOUT
) -> DataFrame:
    """Edges between entity_ids sharing a surface (undirected, deduped).
    Output: src, dst with src < dst.

    ``max_bucket`` drops surfaces shared by more than that many entities
    BEFORE the self-join — one hot alias otherwise contributes O(n²) edges
    and a single skewed join bucket. Real synonym clusters still connect
    through their specific (low-fanout) surfaces."""
    base = alias_dict.select("alias", "entity_id").distinct()
    sized = (
        base.withColumn(
            "_n", F.count(F.lit(1)).over(Window.partitionBy("alias"))
        )
        .where(F.col("_n") <= max_bucket)
        .drop("_n")
    )
    a = sized.select("alias", F.col("entity_id").alias("src"))
    b = sized.select("alias", F.col("entity_id").alias("dst"))
    return (
        a.join(b, "alias")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def connected_components(
    vertices: DataFrame, edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """vertices(id) x edges(src,dst) -> (id, component) with component =
    min id reachable. Deterministic; stops when no label changes.

    Each round does (a) neighbor-min propagation and (b) pointer jumping
    (component := label(component), i.e. path halving). (a) alone is
    O(diameter) — a 64-node chain would need 63 rounds; (b) halves label
    chains each round, giving the O(log n) bound (verified by the chain
    test in tests/test_operators.py)."""
    # symmetrize once: each undirected edge contributes both directions
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = vertices.select(
        F.col("id"), F.col("id").alias("component")
    ).localCheckpoint()

    for _ in range(max_iter):
        # (a) neighbor labels: join edge.src -> label(src), propose to dst.
        # Salted two-phase min keeps hot vertices from serializing a single
        # reducer: partial min per (dst, salt), then final min.
        proposals = (
            sym.join(labels, sym.src == labels.id)
            .select(
                F.col("dst").alias("id"),
                F.col("component"),
                (F.crc32(F.col("src")) % N_SALTS).alias("salt"),
            )
            .groupBy("id", "salt")
            .agg(F.min("component").alias("component"))
            .groupBy("id")
            .agg(F.min("component").alias("neighbor_min"))
        )
        stepped = labels.join(proposals, "id", "left").select(
            "id",
            F.least(
                F.col("component"),
                F.coalesce(F.col("neighbor_min"), F.col("component")),
            ).alias("new_component"),
            # carry the pre-iteration label so convergence needs no
            # join-back against `labels`
            F.col("component").alias("prev"),
        )
        # (b) pointer jump: component := label(component). label(c) <= c is
        # invariant (labels only decrease, starting at the id itself), so
        # the jump never increases a label.
        parent = stepped.select(
            F.col("id").alias("new_component"),
            F.col("new_component").alias("grand"),
        )
        # Convergence count rides the checkpoint job via observe() —
        # ONE Spark job per iteration (was: checkpoint job + a separate
        # count job joining new vs old labels). Labels only decrease, so
        # component != prev identifies every change.
        from pyspark.sql import Observation

        obs = Observation()
        jumped = (
            stepped.join(parent, "new_component", "left")
            .select(
                "id",
                F.coalesce(F.col("grand"), F.col("new_component")).alias(
                    "component"
                ),
                "prev",
            )
            .observe(
                obs,
                F.sum(
                    (F.col("component") != F.col("prev")).cast("long")
                ).alias("changed"),
            )
            .localCheckpoint()
        )
        labels = jumped.drop("prev")
        if not (dict(obs.get).get("changed") or 0):
            break
    return labels


def canonical_entity_map(alias_dict: DataFrame) -> DataFrame:
    """entity_id -> canonical component id over the alias-collision graph.
    Output: entity_id, canonical_id."""
    vertices = alias_dict.select(
        F.col("entity_id").alias("id")
    ).distinct()
    edges = collision_edges(alias_dict)
    cc = connected_components(vertices, edges)
    return cc.select(
        F.col("id").alias("entity_id"), F.col("component").alias("canonical_id")
    )


def canonicalize_triples(
    triples: DataFrame, alias_dict: DataFrame
) -> DataFrame:
    """Rewrite subj/obj to canonical component ids and re-key the triple id.
    The entity->canonical map is tiny relative to the fact table — broadcast
    both joins (J2 pattern); the triple table never shuffles here."""
    from xwikire_spark.functions.ids import triple_id

    m = canonical_entity_map(alias_dict)
    subj_map = m.select(
        F.col("entity_id").alias("subj"), F.col("canonical_id").alias("subj_canon")
    )
    obj_map = m.select(
        F.col("entity_id").alias("obj"), F.col("canonical_id").alias("obj_canon")
    )
    return (
        triples.join(F.broadcast(subj_map), "subj", "left")
        .join(F.broadcast(obj_map), "obj", "left")
        .withColumn("subj", F.coalesce("subj_canon", "subj"))
        .withColumn("obj", F.coalesce("obj_canon", "obj"))
        .drop("subj_canon", "obj_canon")
        .withColumn("id", triple_id("subj", "pred", "obj"))
    )
