"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k — exact, O(|Q| x |C|); correct for
moderate query sets and the verification oracle for the approximate path.
Scale path: LSH-bucketed ANN (random-hyperplane signatures, deterministic
seeds) — candidates come from an equi-join on bucket signature, so the
shuffle is O(collisions), not O(n²); IVF-style coarse quantization is the
same shape with learned centroids.

All math is JVM-side (zip_with / aggregate higher-order functions) — no
Python in the scoring loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: query_id, neighbor_id, rank (1-based). Self-matches excluded.
    The corpus side is broadcast when it fits (typical: queries huge,
    centroid/candidate set small); here queries are the small side so we
    broadcast them instead — either way the big table never shuffles.
    """
    # r7: norms are precomputed per SIDE before the pair expansion — the
    # old plan re-evaluated _norm(qv) once per corpus row and _norm(cv)
    # once per query (guide §2.3: don't recompute per pair what is a
    # per-row property). Same expression on the same data, so the cosine
    # values (and the rank order) are bit-identical.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qn", _norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("cn", _norm(F.col("cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qv"), F.col("cv"))
                / (F.col("qn") * F.col("cn"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def plane_component(seed: int, p: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1]
    (splitmix64-ish, pure integer math) — module-level so the DuckDB oracle
    in __spark_entry__ can inline the IDENTICAL constants."""
    x = (seed * 0x9E3779B97F4A7C15 + p * 0xBF58476D1CE4E5B9
         + d * 0x94D049BB133111EB) % (2**64)
    x ^= x >> 31
    x = (x * 0xD6E8FEB86659FD93) % (2**64)
    return ((x % 2_000_001) / 1_000_000.0) - 1.0


def random_hyperplane_signature(
    vectors: DataFrame,
    n_planes: int = 16,
    dim: int = 64,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-of-projection LSH signature (SimHash for vectors).

    Hyperplanes are derived deterministically from (seed, plane, dim) via a
    splitmix-style integer hash mapped to [-1, 1] — identical across
    executors and runs with zero data movement.
    Output: vec_id, bucket (long).
    """
    v = F.col(vec_col).cast("array<double>")
    bits = []
    for p in range(n_planes):
        plane = F.array(
            *[F.lit(plane_component(seed, p, d)) for d in range(dim)]
        )
        proj = _dot(v, plane)
        bits.append(
            F.when(proj >= 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    bucket = bits[0]
    for p in range(1, n_planes):
        bucket = bucket + F.shiftleft(bits[p], p)
    return vectors.select(F.col(id_col).alias("vec_id"), bucket.alias("bucket"))


def _banded_signatures(
    vectors: DataFrame,
    n_bands: int,
    planes_per_band: int,
    dim: int,
    id_col: str,
    vec_col: str,
    out_id: str,
) -> DataFrame:
    """Multi-table LSH: n_bands independent signatures of planes_per_band
    bits each (seed varies per band). A pair is a candidate if it collides
    on ANY band — recall grows with bands, candidate volume stays a join."""
    out = None
    for band in range(n_bands):
        sig = random_hyperplane_signature(
            vectors, planes_per_band, dim, seed=17 + band,
            id_col=id_col, vec_col=vec_col,
        ).select(
            F.col("vec_id").alias(out_id),
            F.lit(band).alias("band"),
            F.col("bucket"),
        )
        out = sig if out is None else out.unionByName(sig)
    return out


def ann_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_bands: int = 4,
    planes_per_band: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share any LSH band bucket, then exact
    cosine rank within candidates. Output: query_id, neighbor_id, rank."""
    qs = _banded_signatures(
        queries, n_bands, planes_per_band, dim, id_col, vec_col, "query_id"
    )
    cs = _banded_signatures(
        corpus, n_bands, planes_per_band, dim, id_col, vec_col, "neighbor_id"
    )
    cand = (
        qs.join(cs, ["band", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qv"), F.col("cv"))
                / (_norm(F.col("qv")) * _norm(F.col("cv")))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def cosine_near_duplicates(
    vectors: DataFrame,
    threshold: float = 0.9,
    n_bands: int = 4,
    planes_per_band: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the semantic-dedup mode of a
    training-data pipeline): candidates from the banded hyperplane LSH
    self-join, then exact cosine >= threshold on candidates only.

    Output: vec_a < vec_b, cosine (rounded to 6). Precision is 1.0 by
    construction (exact verify); recall follows the LSH collision bound —
    at cos >= 0.9 the angle is <= 26 deg, so a 5-bit band agrees with
    probability (1 - 26/180)^5 and 4 independent bands push per-pair
    recall toward 1 as cos -> 1, where true duplicates live. Shuffle is
    O(bucket collisions), never O(n^2) — the same scale shape as
    MinHash-LSH dedup over text.
    """
    sig = _banded_signatures(
        vectors, n_bands, planes_per_band, dim, id_col, vec_col, "vid"
    )
    a = sig.alias("a")
    b = sig.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("vec_a"), F.col("b.vid").alias("vec_b")
        )
        .distinct()
    )
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    va = v.select(F.col("vid").alias("vec_a"), F.col("v").alias("v_a"))
    vb = v.select(F.col("vid").alias("vec_b"), F.col("v").alias("v_b"))
    scored = (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            (
                _dot(F.col("v_a"), F.col("v_b"))
                / (_norm(F.col("v_a")) * _norm(F.col("v_b")))
            ).alias("cosine"),
        )
    )
    return scored.where(F.col("cosine") >= threshold).select(
        "vec_a", "vec_b", F.round("cosine", 6).alias("cosine")
    )


# --- IVF (coarse-quantization) ANN ------------------------------------------


def _cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def kmeans_centroids(
    vectors: DataFrame,
    n_centroids: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic mini k-means for IVF coarse quantization.

    Init: random-partition method on md5(id) (the one hash both engines
    share, so the DuckDB oracle replicates it); then ``n_iters`` Lloyd
    steps assigning by max cosine (ties -> smallest centroid id). Centroid
    components are rounded to 6 decimals after every averaging step —
    double-summation order differs between engines (and between Spark
    partitionings), and rounding is what makes the model bit-identical
    everywhere. Empty clusters are dropped.

    Returns the tiny driver-side model [(cid, center)] — the standard
    k-means shape: fitting reduces over the cluster, the model itself is
    an artifact to broadcast (here: inlined into the probe expressions).
    """
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("e"),
    )
    assigned = v.withColumn(
        "cid",
        F.expr(
            "(locate(substring(md5(cast(vid as string)), 1, 1),"
            f" '0123456789abcdef') - 1) % {n_centroids}"
        ).cast("int"),
    )

    def means(df) -> list[tuple[int, list[float]]]:
        rows = (
            df.select("cid", F.posexplode("e").alias("dim", "val"))
            .groupBy("cid", "dim")
            .agg(F.round(F.avg("val"), 6).alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(r["cid"], {})[r["dim"]] = r["m"]
        return sorted(
            (cid, [dims[d] for d in sorted(dims)])
            for cid, dims in by_cid.items()
        )

    cents = means(assigned)
    for _ in range(n_iters):
        # means() is eager (collect), so each iteration's large-model
        # broadcast is consumed by the time it returns — release it
        # instead of leaking n_iters centroid matrices per fit
        sink: list = []
        cents = means(_assign_to_centroids(v, cents, _bc_sink=sink))
        for bc in sink:
            bc.unpersist(blocking=False)
    return cents


# Above this many centroid floats the literal plan stops being a plan and
# starts being a compile-time bomb (n_centroids x dim literals re-appear in
# every assignment projection) — switch to a broadcast numpy matrix inside
# a vectorized pandas UDF instead.
_MAX_LITERAL_CENTROID_FLOATS = 4096


def _assign_to_centroids(
    v: DataFrame,
    cents: list[tuple[int, list[float]]],
    _bc_sink: list | None = None,
) -> DataFrame:
    """Adds cid = argmax-cosine centroid (ties -> smallest cid).

    Small models (<= _MAX_LITERAL_CENTROID_FLOATS floats) ride as literal
    arrays — fully JVM, and the same constants can be re-derived in oracle
    SQL. Larger models ship ONCE per executor as a SparkContext.broadcast
    numpy matrix scored inside an Arrow-batched pandas UDF: one matmul per
    batch, no plan bloat (production IVF sizes: 2^10+ centroids x 2^10
    dims). Eager callers (the k-means loop) pass ``_bc_sink`` to collect
    the broadcast handle and unpersist it once consumed."""
    if sum(len(ce) for _, ce in cents) <= _MAX_LITERAL_CENTROID_FLOATS:
        scored = F.array(
            *[
                F.struct(
                    (-_cosine(F.col("e"), F.array(*[F.lit(x) for x in ce])))
                    .alias("neg_cos"),
                    F.lit(cid).alias("cid"),
                )
                for cid, ce in cents
            ]
        )
        return v.withColumn("cid", F.array_min(scored)["cid"])

    import numpy as np
    from pyspark.sql.types import IntegerType

    cids = [cid for cid, _ in cents]
    mat = np.array([ce for _, ce in cents], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    # zero-norm centroids (possible from an all-zero cluster mean) must
    # never win the argmax — the literal path gives them cosine NaN,
    # which Spark's struct ordering never selects as the min; mirror that
    # by scoring them -inf below (zero_mask), not 0 via the norm floor
    zero_cents = (norms[:, 0] == 0.0)
    mat = mat / np.maximum(norms, 1e-12)
    bc = v.sparkSession.sparkContext.broadcast((cids, mat, zero_cents))
    if _bc_sink is not None:
        _bc_sink.append(bc)

    @F.pandas_udf(IntegerType())
    def assign(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        b_cids, b_mat, b_zero = bc.value
        b_cids = np.array(b_cids)
        order = np.argsort(b_cids)
        for vecs in batches:
            if len(vecs) == 0:
                yield pd.Series([], dtype="int32")
                continue
            x = np.stack(vecs.to_numpy())
            x = x / np.maximum(
                np.linalg.norm(x, axis=1, keepdims=True), 1e-12
            )
            # argmax with smallest-cid tie-break, matching the literal
            # path's array_min over (neg_cos, cid) structs: columns sorted
            # by cid ascending, argmax takes the first maximum
            sims = x @ b_mat.T
            sims[:, b_zero] = -np.inf  # literal-path NaN parity
            sims = sims[:, order]
            best = order[np.argmax(sims, axis=1)]
            yield pd.Series(b_cids[best].astype("int32"))

    return v.withColumn("cid", assign(F.col("e")))


def ann_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: k-means coarse quantization partitions the corpus into
    ``n_centroids`` inverted lists; each query probes its ``n_probe``
    nearest centroids and ranks exact cosine within those lists only.

    Scale shape: the corpus shuffles ONCE on its cluster id; a query
    touches n_probe/n_centroids of the data. Complements ann_topk_lsh
    (data-dependent partitioning vs data-oblivious hashing).
    Output: query_id, neighbor_id, rank.
    """
    cents = kmeans_centroids(corpus, n_centroids, n_iters, id_col, vec_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    assigned = _assign_to_centroids(
        c.select(F.col("neighbor_id").alias("vid"), F.col("cv").alias("e")),
        cents,
    ).select(
        F.col("vid").alias("neighbor_id"),
        F.col("e").alias("cv"),
        "cid",
    )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    probe_scores = F.array(
        *[
            F.struct(
                (-_cosine(F.col("qv"), F.array(*[F.lit(x) for x in ce])))
                .alias("neg_cos"),
                F.lit(cid).alias("cid"),
            )
            for cid, ce in cents
        ]
    )
    probes = q.select(
        "query_id",
        "qv",
        F.explode(
            F.slice(F.array_sort(probe_scores), 1, n_probe)
        ).alias("p"),
    ).select("query_id", "qv", F.col("p.cid").alias("cid"))

    scored = (
        probes.join(assigned, "cid")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine(F.col("qv"), F.col("cv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
