"""Driver-contract smoke: entry() runs and the queries()/oracle_sql() maps
stay consistent (every oracle key has a query; flagship schema stable)."""

import __spark_entry__ as entry_mod


class TestDriverContract:
    def test_entry_smoke(self, spark):
        df = entry_mod.entry(spark)
        assert df.schema.simpleString() == (
            "struct<id:string,subj:string,pred:string,obj:string,"
            "conv_id:string,turn_idx:int,evidence:string>"
        )
        assert df.count() > 0

    def test_maps_consistent(self):
        qs = entry_mod.queries()
        oracles = entry_mod.oracle_sql()
        assert set(oracles) <= set(qs), set(oracles) - set(qs)
        # every query callable is, in fact, callable
        assert all(callable(f) for f in qs.values())
        # every query is oracle-checked — no rows-only entries left
        rows_only = set(qs) - set(oracles)
        assert rows_only == set(), rows_only

    def test_pipeline_variant_matches_flagship(self, spark):
        """kg_triples_pipeline left the 50-row driver report (r3
        next-round #5 freed the slot for txt_hygiene) — its gate lives
        here instead: the fused-kernel pipeline must reproduce the
        JVM-only flagship exactly (both were green against the SAME
        KG_TRIPLES_SQL through round 3)."""
        sf = "/root/testdata/sf0.001"
        cols = ["id", "subj", "pred", "obj", "conv_id", "turn_idx",
                "evidence"]
        a = {tuple(r[k] for k in cols)
             for r in entry_mod.kg_triples_df(spark, sf)
             .select(*cols).collect()}
        b = {tuple(r[k] for k in cols)
             for r in entry_mod.q_kg_triples_pipeline(spark, sf)
             .select(*cols).collect()}
        assert a == b and len(a) > 0
