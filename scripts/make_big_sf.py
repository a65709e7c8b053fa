"""Synthesize a larger SF from /root/testdata/sf0.1 by key-shifted
replication (default 10x -> "sf1"), so the bench matrix has a second scale
point without touching the read-only testdata dir.

Usage: python scripts/make_big_sf.py [out_dir] [factor]
       (default out_dir /root/repo/.bench_data/sf1, factor 10)

Each table unions ``factor`` copies with its integer key columns shifted by
rep * (max_key + 1) — foreign keys shift together (orders.o_custkey with
customer.c_custkey, lineitem.l_orderkey/l_partkey with orders/part), so
every join keeps the same selectivity while row counts scale linearly.
Dimension tables (region, nation) are NOT replicated — dims stay dims.
Replication is range x broadcast (the source parquet is one input split;
exploding it would serialize generation on one core).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from xwikire_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# table -> columns to shift (surrogate + foreign keys move together)
SHIFT_KEYS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
COPY_ONLY = ["region", "nation"]

# which key-space each shifted column belongs to (so o_custkey and
# c_custkey shift by the SAME stride)
KEY_SPACE = {
    "doc_id": "documents.doc_id",
    "vec_id": "embeddings.vec_id",
    "event_id": "events.event_id",
    "user_id": "events.user_id",
    "o_orderkey": "orders.o_orderkey",
    "l_orderkey": "orders.o_orderkey",
    "o_custkey": "customer.c_custkey",
    "c_custkey": "customer.c_custkey",
    "l_partkey": "part.p_partkey",
    "p_partkey": "part.p_partkey",
    "l_suppkey": "supplier.s_suppkey",
    "s_suppkey": "supplier.s_suppkey",
}


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else (
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".bench_data", "sf1")
    )
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    spark = get_spark("make-big-sf", master="local[16]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # one stride per key space, from its owning table
    strides: dict[str, int] = {}
    for space in set(KEY_SPACE.values()):
        table, col = space.split(".")
        m = spark.read.parquet(f"{SRC}/{table}.parquet").agg(
            F.max(col)
        ).first()[0]
        strides[space] = int(m) + 1

    for table in COPY_ONLY:
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        df.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
        print(f"{table}: copied {df.count()} rows")

    for table, keys in SHIFT_KEYS.items():
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        reps = spark.range(factor).withColumnRenamed("id", "_rep")
        big = reps.crossJoin(F.broadcast(df))
        for k in keys:
            stride = strides[KEY_SPACE[k]]
            big = big.withColumn(
                k, (F.col(k) + F.col("_rep") * F.lit(stride)).cast(
                    dict(df.dtypes)[k]
                )
            )
        big.drop("_rep").write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )
        print(f"{table}: {factor}x -> {out_dir}")

    spark.stop()


if __name__ == "__main__":
    main()
