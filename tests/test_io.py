

class TestCompaction:
    """Small-file compaction (sources/compaction.py): bit-identical rows,
    fewer files, crash-safe swap semantics."""

    def _fragmented_table(self, spark, root):
        import pandas as pd

        df = spark.createDataFrame(pd.DataFrame({
            "conv_id": [f"c{i % 6}" for i in range(600)],
            "turn_idx": list(range(600)),
            "text": [f"turn text {i}" for i in range(600)],
        }))
        from pyspark.sql import functions as F

        out = df.withColumn(
            "part_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(3))
        )
        # 8 files per partition = the post-incremental-append shape
        out.repartition(8).write.partitionBy("part_bucket").mode(
            "overwrite"
        ).parquet(root)
        return root

    def test_compacts_bit_identically(self, spark, tmp_path):
        from xwikire_spark.sources.compaction import (
            compact_partitions,
            compaction_plan,
            partition_hash,
            read_partitioned,
        )

        root = self._fragmented_table(spark, str(tmp_path / "t"))
        plan = compaction_plan(root, target_bytes=1 << 30)
        assert plan and all(n == 1 for n in plan.values())
        h0 = partition_hash(spark, root)
        n0 = read_partitioned(spark, root).count()

        stats = compact_partitions(spark, root, target_bytes=1 << 30)
        assert {s["partition"] for s in stats} == set(plan)
        assert all(
            s["files_after"] == 1 and s["files_before"] == 8 for s in stats
        )
        assert partition_hash(spark, root) == h0
        assert read_partitioned(spark, root).count() == n0
        # partition column survives the rewrite (derived from dir layout)
        assert "part_bucket" in read_partitioned(spark, root).columns
        # second run: nothing left to do
        assert compact_partitions(spark, root, target_bytes=1 << 30) == []

    def test_multi_file_target_and_min_files(self, spark, tmp_path):
        from xwikire_spark.sources.compaction import (
            compact_partitions,
            compaction_plan,
        )

        root = self._fragmented_table(spark, str(tmp_path / "t2"))
        # tiny target -> several output files per partition, never more
        # than it had
        plan = compaction_plan(root, target_bytes=4096)
        if plan:  # partitions small enough may legitimately drop out
            stats = compact_partitions(spark, root, target_bytes=4096)
            for s in stats:
                assert 1 <= s["files_after"] < s["files_before"]
        # min_files high enough disables everything
        assert compaction_plan(root, min_files=99) == {}
