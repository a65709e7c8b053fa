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
