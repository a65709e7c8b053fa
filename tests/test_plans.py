"""Plan-hygiene regression tests: the flagship plans must keep the shape we
engineered (one shuffle, pruned scans, single fused Python stage)."""

import pandas as pd

from xwikire_spark.plans.inspection import (
    count_exchanges,
    python_eval_count,
    scan_read_schemas,
)


class TestFlagshipPlans:
    def test_kg_lite_one_shuffle_pruned_scan(self, spark):
        import __spark_entry__ as e

        df = e.kg_triples_df(spark, "/root/testdata/sf0.001")
        assert count_exchanges(df) == 1, "flagship must shuffle exactly once"
        schemas = scan_read_schemas(df)
        assert schemas and all(
            "doc_id" in s and "text" in s and "lang" not in s
            for s in schemas
        ), f"scan not pruned: {schemas}"

    def test_pipeline_single_python_stage(self, spark):
        from xwikire_spark import datagen
        from xwikire_spark.pipeline.extraction import extract_triples

        rows, _ = datagen.generate_transcripts(n_convs=5, turns_per_conv=4)
        t = spark.createDataFrame(pd.DataFrame(rows))
        al = spark.createDataFrame(pd.DataFrame(datagen.alias_rows()))
        pr = spark.createDataFrame(pd.DataFrame(datagen.predicate_rows()))
        df = extract_triples(t, al, pr)
        assert python_eval_count(df) == 1, (
            "extraction must stay ONE fused mapInPandas kernel"
        )
        assert count_exchanges(df) == 1, (
            "extraction must shuffle exactly once (the dedup aggregate)"
        )
