"""End-to-end pipeline tests: Spark output vs the pure-Python oracle
(reference semantics), planted-fact recall, per-turn text equality,
canonicalization, and manifest resume."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from oracle.reference_impl import extract_triples_oracle, precision_recall
from xwikire_spark import datagen
from xwikire_spark.functions.udfs import tokenize_udf
from xwikire_spark.kernels.tokenizer import rebuild_text
from xwikire_spark.pipeline.canonicalize import (
    canonical_entity_map,
    canonicalize_triples,
)
from xwikire_spark.pipeline.extraction import (
    extract_triples,
    pair_mentions_in_window,
    detect_mentions,
    segment_turns,
)
from xwikire_spark.pipeline.manifests import pending_buckets, run_with_manifests

TRIPLE_KEY = ["conv_id", "subj", "pred", "obj", "turn_idx", "sent_idx",
              "evidence", "id"]


@pytest.fixture(scope="module")
def corpus(spark):
    rows, planted = datagen.generate_transcripts(n_convs=40, turns_per_conv=10)
    transcripts = spark.createDataFrame(pd.DataFrame(rows))
    alias_df = spark.createDataFrame(pd.DataFrame(datagen.alias_rows()))
    pred_df = spark.createDataFrame(pd.DataFrame(datagen.predicate_rows()))
    return rows, planted, transcripts, alias_df, pred_df


def _oracle(rows):
    alias_pairs = [(a, e) for a, e, _, _ in datagen.ALIASES]
    pred_surfaces = []
    for pid, label, aliases in datagen.PREDICATES:
        pred_surfaces.append((label, pid))
        pred_surfaces.extend((a, pid) for a in aliases)
    return extract_triples_oracle(rows, alias_pairs, pred_surfaces)


class TestExtraction:
    def test_matches_oracle_exactly(self, spark, corpus):
        rows, _, transcripts, alias_df, pred_df = corpus
        got = extract_triples(transcripts, alias_df, pred_df).select(
            *TRIPLE_KEY).collect()
        want = _oracle(rows)

        got_set = {tuple(r[k] for k in TRIPLE_KEY) for r in got}
        want_set = {tuple(w[k] for k in TRIPLE_KEY) for w in want}
        p, r = precision_recall(got_set, want_set)
        # BASELINE target is P/R >= 0.95; same-semantics construction gives 1.0
        assert p == 1.0 and r == 1.0, (
            f"P={p:.3f} R={r:.3f}; spark-only={list(got_set - want_set)[:3]} "
            f"oracle-only={list(want_set - got_set)[:3]}"
        )

    def test_planted_facts_covered(self, corpus):
        """Every planted fact the reference's own distant-supervision test
        (\\b co-occurrence, src/builders/QA.py:76-84) would accept must be
        covered. Aliases ending in combining marks (Kannada) legitimately
        fail \\b at a punctuation boundary — in the reference too — and are
        excluded by using the same kernel as the gate."""
        from xwikire_spark.kernels.matching import distant_supervision
        from xwikire_spark.kernels.segmenter import segment_sentences

        rows, planted, *_ = corpus
        texts = {(r["conv_id"], r["turn_idx"]): r["text"] for r in rows}
        want = _oracle(rows)
        by_conv_pid = {(w["conv_id"], w["pred"]) for w in want}

        coverable = [
            f for f in planted
            if distant_supervision(
                f.obj_alias, f.subj_alias,
                segment_sentences(texts[(f.conv_id, f.turn_idx)]),
            )
        ]
        # ~11% of planted facts use the Kannada alias whose final combining
        # mark defeats \b (reference-parity); the rest must be coverable.
        assert len(coverable) / len(planted) > 0.85  # generator health
        missed = [f for f in coverable
                  if (f.conv_id, f.pid) not in by_conv_pid]
        assert not missed, missed[:5]

    def test_jvm_prefilter_matches_unfiltered(self, spark, corpus):
        """Round-4 scaling lever: the JVM rlike pre-filter in front of the
        fused kernel is a NECESSARY-condition filter — output must be
        bit-identical with it on or off, including on the Kannada turns
        whose combining marks make Java \\b diverge from Python \\b (those
        must bypass the filter rather than be judged by Java semantics)."""
        _, _, transcripts, alias_df, pred_df = corpus
        cols = TRIPLE_KEY + ["subj_surface", "pred_surface", "obj_surface"]
        on = {tuple(r[k] for k in cols)
              for r in extract_triples(
                  transcripts, alias_df, pred_df, jvm_prefilter=True)
              .select(*cols).collect()}
        off = {tuple(r[k] for k in cols)
               for r in extract_triples(
                   transcripts, alias_df, pred_df, jvm_prefilter=False)
               .select(*cols).collect()}
        assert on == off and len(on) > 0
        # the filter must be IN the plan when on (codegen-side RLike before
        # the Arrow hop), and absent when off
        # analyzed plan, not optimized: the test corpus is a LocalRelation,
        # which Catalyst folds deterministic filters into at optimize time
        plan_on = extract_triples(
            transcripts, alias_df, pred_df, jvm_prefilter=True
        )._jdf.queryExecution().analyzed().toString()
        plan_off = extract_triples(
            transcripts, alias_df, pred_df, jvm_prefilter=False
        )._jdf.queryExecution().analyzed().toString()
        assert "RLIKE" in plan_on.upper()
        assert "RLIKE" not in plan_off.upper()

    def test_join_strategy_matches_broadcast(self, spark, corpus):
        """The join-based dictionary path (no broadcast, dictionaries stay
        distributed) must reproduce the fused-automaton path exactly —
        including overlapping-alias consumption (Einstein inside Albert
        Einstein) and alias collisions (Paris -> Q4 and Q9)."""
        _, _, transcripts, alias_df, pred_df = corpus
        cols = TRIPLE_KEY + ["sent_idx", "subj_surface", "pred_surface",
                             "obj_surface"]
        a = {tuple(r[k] for k in cols)
             for r in extract_triples(transcripts, alias_df, pred_df)
             .select(*cols).collect()}
        b = {tuple(r[k] for k in cols)
             for r in extract_triples(
                 transcripts, alias_df, pred_df, dict_strategy="join")
             .select(*cols).collect()}
        assert a == b, (
            f"broadcast-only={list(a - b)[:3]} join-only={list(b - a)[:3]}"
        )

    def test_jvm_strategy_matches_broadcast(self, spark, corpus):
        """The in-plan (Catalyst expression) strategy — explicit opt-in
        (auto maps to broadcast; the r3 A/B showed jvm is never faster on
        this box) — must reproduce the fused-kernel path exactly,
        including the engine-divergence fallback routing: the corpus has
        Kannada turns whose combining marks Java (?U)\\w treats as word
        chars but Python \\w does not, so those MUST go through the Python
        branch to keep reference \\b parity."""
        _, _, transcripts, alias_df, pred_df = corpus
        cols = TRIPLE_KEY + ["sent_idx", "subj_surface", "pred_surface",
                             "obj_surface"]
        a = {tuple(r[k] for k in cols)
             for r in extract_triples(
                 transcripts, alias_df, pred_df, dict_strategy="broadcast")
             .select(*cols).collect()}
        b = {tuple(r[k] for k in cols)
             for r in extract_triples(
                 transcripts, alias_df, pred_df, dict_strategy="jvm")
             .select(*cols).collect()}
        assert a == b, (
            f"broadcast-only={list(a - b)[:3]} jvm-only={list(b - a)[:3]}"
        )

    def test_jvm_strategy_routes_exotic_text_to_python(self, spark, corpus):
        """Turns containing engine-divergent characters are ineligible for
        the in-plan path."""
        from xwikire_spark.pipeline.extraction import jvm_eligible

        _, _, transcripts, _, _ = corpus
        flags = {
            r["text"]: r["ok"]
            for r in transcripts.select(
                "text", jvm_eligible().alias("ok")
            ).collect()
        }
        kannada = [t for t in flags if "ಬ" in t or "ಸ" in t]
        assert kannada and all(flags[t] is False for t in kannada)
        plain = [t for t in flags if t.isascii() and "\t" not in t]
        assert plain and all(flags[t] for t in plain)

    def test_jvm_strategy_plan_shape(self, spark, corpus):
        """Plan assertions for the explicit jvm strategy: (a) exactly ONE
        Python eval chain — the exotic-text fallback — everything else
        whole-stage JVM; (b) each dictionary regex appears exactly once
        per plan (the Generate barrier prevents Catalyst from re-inlining
        regexp_extract_all per downstream reference — the round-1/2
        re-inlining trap)."""
        _, _, transcripts, alias_df, pred_df = corpus
        plan = (
            extract_triples(
                transcripts, alias_df, pred_df, dict_strategy="jvm"
            )
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("ArrowEvalPython") + plan.count("MapInPandas") == 1
        assert plan.count("regexp_extract_all") == 2

    def test_jvm_plan_compiles_at_surface_cap(self, spark):
        """1000-surface dictionaries (the JVM_MAX_SURFACES cap) must build
        and analyze in seconds — the literal regex/map must not be a
        plan-size bomb (the IVF-centroid lesson)."""
        import time

        from xwikire_spark.pipeline.extraction import candidates_jvm

        t = spark.createDataFrame(
            [("c1", 0, "alias7 and alias13 rel5 here")],
            "conv_id string, turn_idx int, text string",
        )
        aliases = [(f"alias{i}", f"Q{i}") for i in range(1000)]
        preds = [(f"rel{i}", f"P{i}") for i in range(1000)]
        t0 = time.time()
        df = candidates_jvm(t, aliases, preds)
        rows = df.collect()
        assert time.time() - t0 < 60
        assert {(r["subj"], r["pid"], r["obj"]) for r in rows} == {
            ("Q7", "P5", "Q13")
        }

    def test_join_strategy_100k_surface_dictionary(self, spark, corpus):
        """A >100k-surface alias dictionary through the join path: the
        padding surfaces never occur in the corpus, so the result must be
        identical to the small-dictionary run — and the dictionary is never
        collected to the driver."""
        _, _, transcripts, alias_df, pred_df = corpus
        pad = spark.range(100_000).select(
            F.concat(F.lit("zqx"), F.col("id"), F.lit("pad"),
                     F.col("id")).alias("alias"),
            F.concat(F.lit("QPAD"), F.col("id")).alias("entity_id"),
        )
        big = alias_df.select("alias", "entity_id").unionByName(pad)
        small = {tuple(r[k] for k in TRIPLE_KEY)
                 for r in extract_triples(
                     transcripts, alias_df, pred_df, dict_strategy="join")
                 .select(*TRIPLE_KEY).collect()}
        padded = {tuple(r[k] for k in TRIPLE_KEY)
                  for r in extract_triples(
                      transcripts, big, pred_df, dict_strategy="join")
                  .select(*TRIPLE_KEY).collect()}
        assert small == padded

    def test_triple_id_is_reference_sha1(self, spark, corpus):
        import hashlib

        _, _, transcripts, alias_df, pred_df = corpus
        row = extract_triples(transcripts, alias_df, pred_df).first()
        expected = hashlib.sha1(
            f"{row.subj} {row.pred} {row.obj}".encode()
        ).hexdigest()
        assert row.id == expected

    def test_per_turn_text_equality(self, spark, corpus):
        # input_hint invariant: tokenization must preserve each turn's text
        _, _, transcripts, _, _ = corpus
        t = transcripts.withColumn("tk", tokenize_udf("text"))
        bad = 0
        for r in t.select("text", "tk.tokens", "tk.breaks").collect():
            if rebuild_text(r.tokens, r.breaks) != r.text:
                bad += 1
        assert bad == 0

    def test_window_pairing(self, spark, corpus):
        _, _, transcripts, alias_df, _ = corpus
        mentions = detect_mentions(segment_turns(transcripts), alias_df)
        pairs = pair_mentions_in_window(mentions, max_turn_distance=2)
        rows = pairs.collect()
        assert rows, "expected co-occurrence pairs"
        for r in rows:
            assert 0 <= r.turn_b - r.turn_a <= 2
            assert r.entity_a != r.entity_b
        # canonical ordering => no (a,b)+(b,a) duplicates at same turns
        seen = {(r.conv_id, r.entity_a, r.entity_b, r.turn_a, r.turn_b)
                for r in rows}
        assert len(seen) == len(rows)


class TestCanonicalization:
    def test_collision_merged(self, spark, corpus):
        *_, alias_df, _ = corpus
        m = {r.entity_id: r.canonical_id
             for r in canonical_entity_map(alias_df).collect()}
        # "Paris" maps to both Q4 and Q9 -> one component, min id wins
        assert m["Q4"] == m["Q9"] == "Q4"
        # unrelated entities stay themselves
        assert m["Q1"] == "Q1" and m["Q2"] == "Q2"

    def test_triples_rewritten(self, spark, corpus):
        _, _, transcripts, alias_df, pred_df = corpus
        t = extract_triples(transcripts, alias_df, pred_df)
        c = canonicalize_triples(t, alias_df)
        assert c.where(F.col("subj") == "Q9").count() == 0
        assert c.where(F.col("obj") == "Q9").count() == 0
        # ids re-keyed consistently
        row = c.first()
        import hashlib

        assert row.id == hashlib.sha1(
            f"{row.subj} {row.pred} {row.obj}".encode()
        ).hexdigest()


class TestManifests:
    def test_resume_skips_done_buckets(self, spark, corpus, tmp_path):
        _, _, transcripts, alias_df, pred_df = corpus
        out = str(tmp_path / "kg")
        n_buckets = 4

        def build(df):
            return extract_triples(df, alias_df, pred_df)

        full = run_with_manifests(spark, transcripts, build, out, n_buckets)
        n1 = full.count()
        assert n1 > 0
        # second run: nothing pending, output unchanged
        assert pending_buckets(spark, transcripts, out, n_buckets) == []
        again = run_with_manifests(spark, transcripts, build, out, n_buckets)
        assert again.count() == n1

    def test_input_drift_reprocesses_only_changed_bucket(
        self, spark, corpus, tmp_path
    ):
        rows, _, transcripts, alias_df, pred_df = corpus
        out = str(tmp_path / "kg2")
        n_buckets = 4

        def build(df):
            return extract_triples(df, alias_df, pred_df)

        run_with_manifests(spark, transcripts, build, out, n_buckets)
        # mutate one conversation's text -> exactly its bucket pending
        drifted = transcripts.withColumn(
            "text",
            F.when(
                F.col("conv_id") == "conv-00000",
                F.concat(F.col("text"), F.lit(" Einstein married Curie.")),
            ).otherwise(F.col("text")),
        )
        todo = pending_buckets(spark, drifted, out, n_buckets)
        assert len(todo) == 1
        merged = run_with_manifests(spark, drifted, build, out, n_buckets)
        # result equals a from-scratch run on the drifted input
        fresh = extract_triples(drifted, alias_df, pred_df)
        got = {tuple(r) for r in
               merged.select("conv_id", "subj", "pred", "obj").collect()}
        want = {tuple(r) for r in
                fresh.select("conv_id", "subj", "pred", "obj").collect()}
        assert got == want

    def test_snapshot_mode_matches_parquet_and_time_travels(
        self, spark, corpus, tmp_path
    ):
        """table_format="snapshot": same triples as parquet mode, each
        resume batch = one atomic versioned commit (op=replace), a
        drifted bucket's reprocess is invisible to readers pinned to the
        pre-drift snapshot, and resume stays a no-op when nothing is
        pending (no empty commits)."""
        import os

        from xwikire_spark.sources import snapshots as sn

        _, _, transcripts, alias_df, pred_df = corpus
        out_p = str(tmp_path / "kg_parquet")
        out_s = str(tmp_path / "kg_snap")
        n_buckets = 4

        def build(df):
            return extract_triples(df, alias_df, pred_df)

        def key_set(df):
            return {tuple(r) for r in
                    df.select("conv_id", "subj", "pred", "obj").collect()}

        plain = run_with_manifests(
            spark, transcripts, build, out_p, n_buckets
        )
        snap = run_with_manifests(
            spark, transcripts, build, out_s, n_buckets,
            table_format="snapshot",
        )
        assert key_set(snap) == key_set(plain) and snap.count() > 0
        root = os.path.join(out_s, "triples")
        assert sn.current_version(root) == 1
        # no-op resume commits nothing
        run_with_manifests(
            spark, transcripts, build, out_s, n_buckets,
            table_format="snapshot",
        )
        assert sn.current_version(root) == 1
        # drift one conversation -> exactly one more commit; the pinned
        # v1 reader still sees the pre-drift triples
        v1_keys = key_set(sn.read_table(spark, root, version=1))
        drifted = transcripts.withColumn(
            "text",
            F.when(
                F.col("conv_id") == "conv-00000",
                F.concat(F.col("text"), F.lit(" Einstein married Curie.")),
            ).otherwise(F.col("text")),
        )
        merged = run_with_manifests(
            spark, drifted, build, out_s, n_buckets,
            table_format="snapshot",
        )
        assert sn.current_version(root) == 2
        assert sn.snapshot_meta(root, 2)["op"] == "replace"
        assert key_set(merged) == key_set(
            extract_triples(drifted, alias_df, pred_df)
        )
        assert key_set(sn.read_table(spark, root, version=1)) == v1_keys


class TestGraphMaterialization:
    def test_edges_vertices_and_metrics(self, spark, corpus, tmp_path):
        from xwikire_spark.pipeline.graph import materialize_graph

        _, _, transcripts, alias_df, pred_df = corpus
        out = str(tmp_path / "graph")

        def build(df):
            return extract_triples(df, alias_df, pred_df)

        edges, vertices = materialize_graph(
            spark, transcripts, build, out, n_buckets=4
        )
        n_edges = edges.count()
        assert n_edges > 0
        # vertex degrees reconcile exactly with the edge table
        v = {r.entity_id: r for r in vertices.collect()}
        for r in edges.groupBy("subj").count().collect():
            assert v[r.subj].out_degree == r["count"]
        for r in edges.groupBy("obj").count().collect():
            assert v[r.obj].in_degree == r["count"]
        # observe() metrics landed with the write job (no extra pass)
        m = spark.read.parquet(out + "/_metrics").collect()
        assert len(m) == 1
        assert m[0].triples_out == n_edges
        assert m[0].empty_evidence == 0
        assert m[0].approx_convs > 0

    def test_snapshot_format_edges_and_vertices(
        self, spark, corpus, tmp_path
    ):
        """table_format="snapshot": both graph tables are snapshot
        tables (edge = replace-partitions lineage commits, vertex =
        overwrite per refresh) and reconcile exactly."""
        import os

        from xwikire_spark.pipeline.graph import materialize_graph
        from xwikire_spark.sources import snapshots as sn

        _, _, transcripts, alias_df, pred_df = corpus
        out = str(tmp_path / "graph_snap")

        def build(df):
            return extract_triples(df, alias_df, pred_df)

        edges, vertices = materialize_graph(
            spark, transcripts, build, out, n_buckets=4,
            table_format="snapshot",
        )
        assert edges.count() > 0
        v = {r.entity_id: r for r in vertices.collect()}
        for r in edges.groupBy("subj").count().collect():
            assert v[r.subj].out_degree == r["count"]
        assert sn.snapshot_meta(
            os.path.join(out, "vertices"), 1
        )["op"] == "overwrite"
        assert sn.snapshot_meta(
            os.path.join(out, "triples"), 1
        )["partition_col"] == "part_bucket"


class TestMentionPathEquivalence:
    def test_randomized_dictionary_equivalence(self, spark):
        """Randomized cross-check (fixed seed): on 60 random sentences and
        a random dictionary with overlaps ('beta gamma' vs 'beta' vs
        'gamma delta') and collisions, the join path's greedy fold must
        reproduce the regex automaton's mention set exactly — surfaces,
        ids, and char offsets."""
        import random

        from xwikire_spark.pipeline.extraction import (
            detect_mentions,
            detect_mentions_join,
        )

        rng = random.Random(99)
        pool = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
                "theta", "iota", "kappa"]
        surfaces = [
            ("beta", "E1"), ("beta gamma", "E2"), ("gamma delta", "E3"),
            ("delta", "E4"), ("eps zeta eta", "E5"), ("zeta", "E6"),
            # collision: one surface, two ids
            ("kappa", "E7"), ("kappa", "E8"),
        ]
        rows = []
        for i in range(60):
            n = rng.randint(6, 14)
            words = [rng.choice(pool) for _ in range(n)]
            rows.append(dict(
                conv_id=f"c{i % 7}", turn_idx=i // 7, role="user", ts=None,
                sent_idx=0, sentence=" ".join(words) + ".",
            ))
        sentences = spark.createDataFrame(pd.DataFrame(rows))
        alias_df = spark.createDataFrame(
            pd.DataFrame([{"alias": a, "entity_id": e} for a, e in surfaces])
        )
        key = ["conv_id", "turn_idx", "sent_idx", "surface", "entity_id",
               "m_start", "m_end"]
        regex_path = {
            tuple(r[k] for k in key)
            for r in detect_mentions(sentences, alias_df).collect()
        }
        join_path = {
            tuple(r[k] for k in key)
            for r in detect_mentions_join(
                sentences, alias_df.select("alias", "entity_id")
            ).collect()
        }
        assert regex_path == join_path, (
            f"regex-only={list(regex_path - join_path)[:4]} "
            f"join-only={list(join_path - regex_path)[:4]}"
        )
        assert len(regex_path) > 100  # the corpus actually exercises it

    def test_auto_strategy_is_single_kernel_pass(self, spark, corpus):
        """auto = the fused broadcast kernel (measured: the in-plan jvm
        tier is per-core comparable but never faster and double-scans the
        source): the plan must contain NO regexp_extract_all (no literal
        dictionary in the plan) and exactly one Python chain — and an
        explicit jvm request above the surface cap must degrade to the
        same single-kernel plan instead of compiling a giant regex."""
        _, _, transcripts, alias_df, pred_df = corpus
        pad = spark.range(1500).select(
            F.concat(F.lit("zqx"), F.col("id")).alias("alias"),
            F.concat(F.lit("QP"), F.col("id")).alias("entity_id"),
        )
        big = alias_df.select("alias", "entity_id").unionByName(pad)
        for df in (
            extract_triples(transcripts, big, pred_df),  # auto
            extract_triples(
                transcripts, big, pred_df, dict_strategy="jvm"
            ),  # above-cap jvm degrades
        ):
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "regexp_extract_all" not in plan
            assert (
                plan.count("ArrowEvalPython") + plan.count("MapInPandas") == 1
            )
        # and values still match the small-dictionary run (padding never hits)
        small = {tuple(r) for r in extract_triples(
            transcripts, alias_df, pred_df, dict_strategy="broadcast"
        ).select(*TRIPLE_KEY).collect()}
        got = {tuple(r) for r in extract_triples(
            transcripts, big, pred_df
        ).select(*TRIPLE_KEY).collect()}
        assert got == small


class TestPageRank:
    """pipeline.graph.pagerank vs an independent numpy power iteration
    on a pinned graph exercising every structural case: hub, chain,
    dangling vertex, isolated vertex, 2-cycle."""

    EDGES = [
        ("a", "b"), ("a", "c"), ("a", "d"),   # hub fan-out
        ("b", "c"), ("c", "d"),               # chain
        ("d", "a"),                           # cycle back
        ("e", "a"),                           # feeder
        ("c", "f"),                           # f is DANGLING (no out)
        # g is ISOLATED (only via explicit vertices)
    ]
    VERTS = list("abcdefg")

    def _numpy_ranks(self, damping=0.85, n_iter=10, ids=None):
        import numpy as np

        ids = ids if ids is not None else self.VERTS
        idx = {v: i for i, v in enumerate(ids)}
        n = len(ids)
        out = [0] * n
        for s, _ in self.EDGES:
            out[idx[s]] += 1
        r = np.ones(n)
        for _ in range(n_iter):
            msg = np.zeros(n)
            for s, d in self.EDGES:
                msg[idx[d]] += r[idx[s]] / out[idx[s]]
            dang = sum(r[i] for i in range(n) if out[i] == 0)
            r = (1 - damping) + damping * (msg + dang / n)
        return {v: r[idx[v]] for v in ids}

    def test_matches_numpy_power_iteration(self, spark):
        import pandas as pd

        from xwikire_spark.pipeline.graph import pagerank

        e = spark.createDataFrame(
            pd.DataFrame(self.EDGES, columns=["src", "dst"])
        )
        v = spark.createDataFrame(pd.DataFrame({"id": self.VERTS}))
        got = {r["id"]: r["rank"] for r in pagerank(e, vertices=v).collect()}
        want = self._numpy_ranks()
        assert set(got) == set(want)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
        # normalization invariant: ranks sum to N
        assert abs(sum(got.values()) - len(self.VERTS)) < 1e-9
        # structure sanity: the hub 'a' (fed by d and e) outranks the
        # isolated vertex, which bottoms out at the no-inlink fixpoint
        assert got["a"] > got["g"]
        min_rank = got["g"]
        assert all(r >= min_rank - 1e-12 for r in got.values())

    def test_entity_salience_matches_numpy(self, spark):
        """VERDICT r4 #5: the served salience frame (pagerank ⋈ vertex
        degrees, global_rank top-k) against the same numpy differential
        plus independently-counted degree stats."""
        import pandas as pd

        from xwikire_spark.pipeline.graph import entity_salience

        convs = ["c1", "c2", "c1", "c2", "c1", "c2", "c1", "c1"]
        triples = spark.createDataFrame(
            pd.DataFrame(
                [(s, "related_to", o, c)
                 for (s, o), c in zip(self.EDGES, convs)],
                columns=["subj", "pred", "obj", "conv_id"],
            )
        )
        got = entity_salience(triples, top_k=4).collect()
        # vertices derive from edges: a..f (no isolated g)
        ids = sorted({s for s, _ in self.EDGES}
                     | {o for _, o in self.EDGES})
        want = self._numpy_ranks(ids=ids)
        order = sorted(want, key=lambda v: (-want[v], v))
        assert [r["entity_id"] for r in got] == order[:4]
        assert [r["salience_rank"] for r in got] == [1, 2, 3, 4]
        outd = {v: sum(1 for s, _ in self.EDGES if s == v) for v in ids}
        ind = {v: sum(1 for _, o in self.EDGES if o == v) for v in ids}
        cm = {
            v: len({c for (s, o), c in zip(self.EDGES, convs)
                    if v in (s, o)})
            for v in ids
        }
        for r in got:
            v = r["entity_id"]
            assert abs(r["rank"] - want[v]) < 1e-6, (v, r["rank"], want[v])
            assert r["out_degree"] == outd[v]
            assert r["in_degree"] == ind[v]
            assert r["conv_mentions"] == cm[v]

    def test_incomplete_vertices_raise(self, spark):
        """ADVICE r4 (low): a supplied vertices frame missing an edge
        endpoint would silently leak rank mass (left-join drop) — it must
        raise instead of violating the ranks-sum-to-N invariant."""
        import pandas as pd
        import pytest as _pytest

        from xwikire_spark.pipeline.graph import pagerank

        e = spark.createDataFrame(
            pd.DataFrame(self.EDGES, columns=["src", "dst"])
        )
        v = spark.createDataFrame(pd.DataFrame({"id": list("abcde")}))  # no f
        with _pytest.raises(ValueError, match="superset"):
            pagerank(e, vertices=v)

    def test_uniform_on_cycle_and_derived_vertices(self, spark):
        import pandas as pd

        from xwikire_spark.pipeline.graph import pagerank

        cyc = [("x", "y"), ("y", "z"), ("z", "x")]
        e = spark.createDataFrame(pd.DataFrame(cyc, columns=["src", "dst"]))
        got = {r["id"]: r["rank"] for r in pagerank(e).collect()}
        # vertices derived from edges; symmetric cycle -> all ranks 1.0
        assert set(got) == {"x", "y", "z"}
        assert all(abs(r - 1.0) < 1e-12 for r in got.values())


class TestIncrementalCanonicalize:
    """Incremental canonical-map maintenance (canonicalize.py): folding an
    alias-dict append into a persisted map must equal the batch recompute
    over old ∪ new (when no surface crosses the fanout guard), at
    O(delta + touched components) cost — never re-running CC on the
    corpus."""

    OLD = [
        # component {Q4, Q9} via shared "paris"; singletons Q1, Q2
        ("paris", "Q4"), ("paris", "Q9"),
        ("acme", "Q1"), ("globex", "Q2"),
        ("berlin", "Q7"), ("hauptstadt", "Q7"),
    ]

    def _df(self, spark, rows):
        import pandas as pd

        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["alias", "entity_id"])
        )

    def _batch_equals_incremental(self, spark, old_rows, new_rows):
        from xwikire_spark.pipeline.canonicalize import (
            canonical_entity_map,
            incremental_canonical_map,
        )

        old_dict = self._df(spark, old_rows)
        new_df = self._df(spark, new_rows)
        base = canonical_entity_map(old_dict)
        inc = incremental_canonical_map(base, old_dict, new_df)
        full = canonical_entity_map(
            old_dict.unionByName(new_df)
        )
        got = sorted(map(tuple, inc.collect()))
        want = sorted(map(tuple, full.collect()))
        assert got == want
        return dict(got)

    def test_merge_two_old_components(self, spark):
        # "bridge" surface links Q1's and Q2's components
        m = self._batch_equals_incremental(
            spark, self.OLD, [("bridge", "Q1"), ("bridge", "Q2")]
        )
        assert m["Q1"] == m["Q2"] == "Q1"
        assert m["Q4"] == m["Q9"] == "Q4"  # untouched component intact

    def test_new_smaller_id_becomes_canonical(self, spark):
        # new entity Q0 < Q4 joins the {Q4, Q9} component via "paris"
        m = self._batch_equals_incremental(
            spark, self.OLD, [("paris", "Q0")]
        )
        assert m["Q0"] == m["Q4"] == m["Q9"] == "Q0"

    def test_isolated_new_entity_is_singleton(self, spark):
        m = self._batch_equals_incremental(
            spark, self.OLD, [("initech", "Q99")]
        )
        assert m["Q99"] == "Q99"
        assert m["Q7"] == "Q7"

    def test_chained_merge_through_new_entity(self, spark):
        # one new entity with two surfaces merges three components at once
        m = self._batch_equals_incremental(
            spark,
            self.OLD,
            [("paris", "Q5"), ("berlin", "Q5"), ("acme", "Q5")],
        )
        assert m["Q1"] == m["Q4"] == m["Q5"] == m["Q7"] == m["Q9"] == "Q1"

    def test_repeated_append_idempotent(self, spark):
        from xwikire_spark.pipeline.canonicalize import (
            canonical_entity_map,
            incremental_canonical_map,
        )

        old_dict = self._df(spark, self.OLD)
        delta = [("bridge", "Q1"), ("bridge", "Q2")]
        new_df = self._df(spark, delta)
        base = canonical_entity_map(old_dict)
        once = incremental_canonical_map(base, old_dict, new_df)
        # re-delivering the same batch against the updated map + updated
        # dict changes nothing (streaming retry semantics)
        twice = incremental_canonical_map(
            once, old_dict.unionByName(new_df), new_df
        )
        assert sorted(map(tuple, once.collect())) == sorted(
            map(tuple, twice.collect())
        )

    def test_monotone_fanout_guard(self, spark):
        """A surface crossing max_bucket in the append contributes no NEW
        edges (its delta rows are dropped by the combined-count guard) but
        previously-merged components stay merged — the documented
        monotone divergence from the batch guard; the batch recompute is
        the rewrite path that re-applies it globally."""
        from xwikire_spark.pipeline.canonicalize import (
            canonical_entity_map,
            incremental_canonical_map,
        )

        old_dict = self._df(spark, self.OLD)
        base = canonical_entity_map(old_dict)
        # push "paris" past the guard: combined fanout 2 + 2 > 3
        delta = [("paris", "Q50"), ("paris", "Q51")]
        inc = incremental_canonical_map(
            base, old_dict, self._df(spark, delta), max_bucket=3
        )
        m = dict(sorted(map(tuple, inc.collect())))
        assert m["Q4"] == m["Q9"] == "Q4"  # old merge persists
        # the hot surface's new rows join as singletons, not via paris
        assert m["Q50"] == "Q50" and m["Q51"] == "Q51"

    def test_map_side_is_broadcast_only(self, spark, tmp_path):
        """The full-map rewrite must never shuffle the map: every join
        that touches the persisted table is a BroadcastHashJoin (semi
        probe + relabel), so the update is one scan at corpus scale."""
        from xwikire_spark.pipeline.canonicalize import (
            canonical_entity_map,
            incremental_canonical_map,
        )

        old_dict = self._df(spark, self.OLD)
        path = str(tmp_path / "canonical_map")
        canonical_entity_map(old_dict).write.parquet(path)
        base = spark.read.parquet(path)
        inc = incremental_canonical_map(
            base, old_dict, self._df(spark, [("paris", "Q0")])
        )
        plan = inc._jdf.queryExecution().executedPlan().toString()
        # the map's FileScan feeds BroadcastHashJoins only — no Exchange
        # directly above a scan of the persisted map
        for line in plan.splitlines():
            if "Exchange hashpartitioning(canonical_id" in line \
                    or "Exchange hashpartitioning(entity_id" in line \
                    or "Exchange hashpartitioning(_id" in line:
                raise AssertionError(
                    f"persisted map shuffled:\n{line}\n\n{plan}"
                )
        assert "BroadcastHashJoin" in plan


class TestStreamingCanonicalization:
    """streaming/canonical.py: the persisted base+remap+newids overlay.
    Gate: after every availableNow drop, read_canonical_map equals the
    batch canonical_entity_map over all rows so far — including remap
    CHAINS (a component merged in batch 1 whose target merges again in
    batch 3 must chase to the final label)."""

    BATCHES = [
        # batch 0: two components ({Q4,Q9} via paris) + singletons
        [("paris", "Q4"), ("paris", "Q9"),
         ("acme", "Q1"), ("globex", "Q2")],
        # batch 1: Q2 joins the paris component -> canonical drops to Q2
        [("paris", "Q2")],
        # batch 2: Q0 joins it -> canonical drops again (remap chain
        # Q4 -> Q2 -> Q0 must compose), plus an unrelated new singleton
        [("paris", "Q0"), ("initech", "Q77")],
    ]

    def _alias_df(self, spark, rows):
        import pandas as pd

        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["alias", "entity_id"])
        )

    def test_streaming_end_to_end_matches_batch(self, spark, tmp_path):
        import os

        from xwikire_spark.pipeline.canonicalize import canonical_entity_map
        from xwikire_spark.streaming.canonical import (
            read_canonical_map,
            run_incremental_canonicalization,
        )

        input_dir = str(tmp_path / "alias_in")
        map_dir = str(tmp_path / "map")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(input_dir, exist_ok=True)
        seen = []
        for batch in self.BATCHES:
            self._alias_df(spark, batch).coalesce(1).write.mode(
                "append"
            ).parquet(input_dir)
            seen.extend(batch)
            run_incremental_canonicalization(
                spark, input_dir, map_dir, ckpt
            ).awaitTermination(120)
            got = sorted(
                map(tuple, read_canonical_map(spark, map_dir).collect())
            )
            want = sorted(map(
                tuple,
                canonical_entity_map(self._alias_df(spark, seen)).collect(),
            ))
            assert got == want, f"after {len(seen)} rows"
        m = dict(got)
        assert m["Q4"] == m["Q9"] == m["Q2"] == m["Q0"] == "Q0"
        assert m["Q77"] == "Q77"
        # the remap chained: historical label Q4 resolves to Q0
        remap = {
            r["id"]: r["component"]
            for r in spark.read.parquet(map_dir + "/remap").collect()
        }
        assert remap.get("Q4") == "Q0" and remap.get("Q2") == "Q0"

    def test_retry_idempotent(self, spark, tmp_path):
        """Re-applying a batch (availableNow retry after a crash between
        the newids write and the checkpoint commit) must not change the
        resolved map."""
        from xwikire_spark.streaming.canonical import (
            apply_alias_batch,
            read_canonical_map,
        )

        map_dir = str(tmp_path / "map")
        d0 = self._alias_df(spark, self.BATCHES[0])
        apply_alias_batch(spark, map_dir, d0, d0, batch_id=0)
        d1 = self._alias_df(spark, self.BATCHES[1])
        dict_all = d0.unionByName(d1)
        apply_alias_batch(spark, map_dir, dict_all, d1, batch_id=1)
        before = sorted(
            map(tuple, read_canonical_map(spark, map_dir).collect())
        )
        apply_alias_batch(spark, map_dir, dict_all, d1, batch_id=1)
        after = sorted(
            map(tuple, read_canonical_map(spark, map_dir).collect())
        )
        assert before == after
        assert dict(before)["Q4"] == "Q2"

    def test_compaction_preserves_view(self, spark, tmp_path):
        import os

        from xwikire_spark.streaming.canonical import (
            apply_alias_batch,
            compact_canonical_map,
            read_canonical_map,
        )

        map_dir = str(tmp_path / "map")
        d0 = self._alias_df(spark, self.BATCHES[0])
        apply_alias_batch(spark, map_dir, d0, d0, batch_id=0)
        d1 = self._alias_df(spark, self.BATCHES[1])
        apply_alias_batch(
            spark, map_dir, d0.unionByName(d1), d1, batch_id=1
        )
        before = sorted(
            map(tuple, read_canonical_map(spark, map_dir).collect())
        )
        st = compact_canonical_map(spark, map_dir)
        assert st["rows"] == len(before)
        assert not os.path.exists(map_dir + "/remap")
        assert not os.path.exists(map_dir + "/newids")
        after = sorted(
            map(tuple, read_canonical_map(spark, map_dir).collect())
        )
        assert before == after
        # the overlay keeps composing cleanly after a compaction
        d2 = self._alias_df(spark, self.BATCHES[2])
        apply_alias_batch(
            spark, map_dir,
            d0.unionByName(d1).unionByName(d2), d2, batch_id=2,
        )
        m = dict(sorted(
            map(tuple, read_canonical_map(spark, map_dir).collect())
        ))
        assert m["Q4"] == m["Q2"] == "Q0" and m["Q77"] == "Q77"

    def test_auto_compaction_fires_at_threshold(self, spark, tmp_path):
        """VERDICT r5 #3 done-gate: with compact_threshold=0 every batch
        that grows the remap folds the overlays into base/ immediately —
        remap/ and newids/ are gone after the batch, the composed view is
        unchanged, and the next batch still merges correctly (so the
        threshold keeps the per-batch compose input broadcast-small by
        construction: it can never exceed one batch's delta + threshold)."""
        import os

        from xwikire_spark.pipeline.canonicalize import canonical_entity_map
        from xwikire_spark.streaming.canonical import (
            apply_alias_batch,
            read_canonical_map,
        )

        map_dir = str(tmp_path / "map")
        seen: list[tuple[str, str]] = []
        dfs = []
        for i, batch in enumerate(self.BATCHES):
            seen.extend(batch)
            dfs.append(self._alias_df(spark, batch))
            dict_all = dfs[0]
            for d in dfs[1:]:
                dict_all = dict_all.unionByName(d)
            st = apply_alias_batch(
                spark, map_dir, dict_all, dfs[-1], batch_id=i,
                compact_threshold=0,
            )
            if st["remap_size"] > 0:
                assert not os.path.exists(map_dir + "/remap"), i
                assert not os.path.exists(map_dir + "/newids"), i
            got = sorted(
                map(tuple, read_canonical_map(spark, map_dir).collect())
            )
            want = sorted(map(
                tuple,
                canonical_entity_map(
                    self._alias_df(spark, seen)
                ).collect(),
            ))
            assert got == want, f"after batch {i}"


class TestIncrementalCanonicalizationE2E:
    """Extraction wired to the incrementally-maintained map end-to-end:
    after each of 3 alias-dict drops, ``extract_triples`` →
    ``canonicalize_triples(entity_map=read_canonical_map(...))`` must
    emit EXACTLY the triples of the batch pipeline (map recomputed from
    scratch over all drops). The earlier gates stopped at map equality;
    this extends them to the emitted triple set, including a collision
    that only merges across drops (Paris→Q4 in drop 0, Paris→Q9 in
    drop 2)."""

    def _drops(self):
        rows = datagen.alias_rows()
        groups = [
            {"Q1", "Q2", "Q3", "Q4", "Q10"},
            {"Q5", "Q6", "Q7"},
            {"Q8", "Q9"},
        ]
        drops = [
            [r for r in rows if r["entity_id"] in g] for g in groups
        ]
        assert sum(map(len, drops)) == len(rows)
        return drops

    def test_triples_match_batch_after_each_drop(
        self, spark, corpus, tmp_path
    ):
        import os

        from xwikire_spark.streaming.canonical import (
            read_canonical_map,
            run_incremental_canonicalization,
        )

        _, _, transcripts, _, pred_df = corpus
        input_dir = str(tmp_path / "alias_in")
        map_dir = str(tmp_path / "map")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(input_dir)
        key = ["conv_id", "subj", "pred", "obj", "turn_idx", "sent_idx",
               "id"]
        seen: list[dict] = []
        for drop in self._drops():
            spark.createDataFrame(pd.DataFrame(drop)).select(
                "alias", "entity_id"
            ).coalesce(1).write.mode("append").parquet(input_dir)
            seen.extend(drop)
            run_incremental_canonicalization(
                spark, input_dir, map_dir, ckpt
            ).awaitTermination(120)
            alias_so_far = spark.createDataFrame(pd.DataFrame(seen))
            t = extract_triples(transcripts, alias_so_far, pred_df)
            inc = canonicalize_triples(
                t, None, entity_map=read_canonical_map(spark, map_dir)
            )
            bat = canonicalize_triples(t, alias_so_far)
            got = {tuple(r[k] for k in key) for r in inc.collect()}
            want = {tuple(r[k] for k in key) for r in bat.collect()}
            assert got == want, f"after {len(seen)} alias rows"
        # the cross-drop collision merged: Q9 resolved to Q4 in the
        # incremental map and no emitted triple carries Q9
        m = dict(map(tuple, read_canonical_map(spark, map_dir).collect()))
        assert m["Q9"] == "Q4"
        assert inc.where(
            (F.col("subj") == "Q9") | (F.col("obj") == "Q9")
        ).count() == 0


class TestManifestZoneMaps:
    def test_manifest_run_refreshes_zone_maps(self, spark, tmp_path, corpus):
        """run_with_manifests(zone_map_cols=...) leaves a queryable
        _zonemaps table beside the triples and pruned_read over conv_id
        matches the full-scan filter exactly."""
        from xwikire_spark.pipeline.manifests import run_with_manifests
        from xwikire_spark.sources import zonemaps as zm

        _, _, transcripts, alias_df, pred_df = corpus
        out = str(tmp_path / "kg")

        def build(t):
            return extract_triples(t, alias_df, pred_df)

        full = run_with_manifests(
            spark, transcripts, build, out, n_buckets=4,
            zone_map_cols=["conv_id"],
        )
        troot = out + "/triples"
        lo, hi = "conv-00005", "conv-00020"
        got, stats = zm.pruned_read(spark, troot, {"conv_id": (lo, hi)})
        want = full.where(F.col("conv_id").between(lo, hi))
        assert stats["unmapped"] == 0
        assert sorted(map(tuple, got.select(*want.columns).collect())) \
            == sorted(map(tuple, want.collect()))
        # resume path: a second run adds no buckets and keeps the map
        run_with_manifests(
            spark, transcripts, build, out, n_buckets=4,
            zone_map_cols=["conv_id"],
        )
        _, stats2 = zm.pruned_read(spark, troot, {"conv_id": (lo, hi)})
        assert stats2["unmapped"] == 0
