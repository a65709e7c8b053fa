"""Operator-level behavior tests: MinHash-LSH recall on planted near-dups,
SimHash band collisions, ANN recall vs brute force, vocab ranks,
round-robin balancing."""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

VOCAB = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon").split()


def _mk_docs(n_base=40, words_per_doc=60, seed=3):
    """Base docs + one planted near-duplicate per base doc (2 word edits
    out of 60 -> token-set Jaccard ~0.9)."""
    rng = random.Random(seed)
    rows, planted = [], []
    doc_id = 0
    for b in range(n_base):
        words = [rng.choice(VOCAB) for _ in range(words_per_doc)]
        rows.append({"doc_id": doc_id, "text": " ".join(words)})
        base_id = doc_id
        doc_id += 1
        dup = list(words)
        for _ in range(2):
            dup[rng.randrange(words_per_doc)] = rng.choice(VOCAB)
        rows.append({"doc_id": doc_id, "text": " ".join(dup)})
        planted.append((base_id, doc_id))
        doc_id += 1
    return rows, planted


class TestMinHashLSH:
    def test_planted_near_dup_recall(self, spark):
        from xwikire_spark.operators.dedup import near_duplicates_minhash

        rows, planted = _mk_docs()
        docs = spark.createDataFrame(pd.DataFrame(rows))
        found = {
            (r.doc_a, r.doc_b)
            for r in near_duplicates_minhash(
                docs, n_hashes=32, n_bands=8, threshold=0.5
            ).collect()
        }
        hits = sum(1 for p in planted if p in found)
        recall = hits / len(planted)
        assert recall >= 0.9, f"recall {recall}"
        # precision: every reported pair really is >= threshold Jaccard
        # (jaccard_verify computed it exactly; check values are sane)
        assert found, "no pairs at all"

    def test_signatures_deterministic(self, spark):
        from xwikire_spark.operators.dedup import minhash_signatures

        rows, _ = _mk_docs(n_base=5)
        docs = spark.createDataFrame(pd.DataFrame(rows))
        a = {r.doc_id: r.sig for r in minhash_signatures(docs).collect()}
        b = {r.doc_id: r.sig for r in minhash_signatures(docs).collect()}
        assert a == b


class TestSimHash:
    def test_near_dups_collide_on_a_band(self, spark):
        from xwikire_spark.operators.dedup import simhash

        rows, planted = _mk_docs(n_base=20)
        docs = spark.createDataFrame(pd.DataFrame(rows))
        sh = {r.doc_id: r for r in simhash(docs).collect()}
        collide = 0
        for a, b in planted:
            bands_a = [sh[a][f"band{i}"] for i in range(4)]
            bands_b = [sh[b][f"band{i}"] for i in range(4)]
            if any(x == y for x, y in zip(bands_a, bands_b)):
                collide += 1
        assert collide / len(planted) >= 0.8

    def test_hamming_distance_small_for_dups(self, spark):
        from xwikire_spark.operators.dedup import simhash

        rows, planted = _mk_docs(n_base=10)
        docs = spark.createDataFrame(pd.DataFrame(rows))
        sh = {r.doc_id: r.simhash for r in simhash(docs).collect()}
        for a, b in planted[:5]:
            dist = bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1")
            assert dist <= 16, f"hamming {dist} for planted near-dup"


class TestANN:
    @pytest.fixture(scope="class")
    def embeddings(self, spark):
        rng = random.Random(11)
        rows = []
        for i in range(300):
            base = [rng.gauss(0, 1) for _ in range(64)]
            rows.append({"vec_id": i, "embedding": base})
            # planted near neighbor for first 20 vectors
            if i < 20:
                rows.append({
                    "vec_id": 1000 + i,
                    "embedding": [x + rng.gauss(0, 0.05) for x in base],
                })
        return spark.createDataFrame(pd.DataFrame(rows))

    def test_bruteforce_finds_planted(self, spark, embeddings):
        from xwikire_spark.operators.similarity import cosine_topk_bruteforce

        q = embeddings.where(F.col("vec_id") < 20)
        top = cosine_topk_bruteforce(q, embeddings, k=1).collect()
        assert all(r.neighbor_id == 1000 + r.query_id for r in top)

    def test_lsh_recall_at_k(self, spark, embeddings):
        from xwikire_spark.operators.similarity import (
            ann_topk_lsh,
            cosine_topk_bruteforce,
        )

        q = embeddings.where(F.col("vec_id") < 20)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in cosine_topk_bruteforce(q, embeddings, k=1).collect()
        }
        approx = {
            (r.query_id, r.neighbor_id)
            for r in ann_topk_lsh(
                q, embeddings, k=5, n_bands=6, planes_per_band=4
            ).collect()
        }
        # near-identical vectors collide on sign bits with high prob
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.9, f"recall@planted {recall}"

    def test_ivf_recall_at_k(self, spark, embeddings):
        from xwikire_spark.operators.similarity import (
            ann_topk_ivf,
            cosine_topk_bruteforce,
        )

        q = embeddings.where(F.col("vec_id") < 20)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in cosine_topk_bruteforce(q, embeddings, k=1).collect()
        }
        approx = {
            (r.query_id, r.neighbor_id)
            for r in ann_topk_ivf(
                q, embeddings, k=5, n_centroids=8, n_probe=2
            ).collect()
        }
        # a planted near-identical neighbor lands in the query's own
        # cluster (or the 2-probe set) essentially always
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.9, f"recall@planted {recall}"

    def test_cosine_near_duplicates_finds_planted(self, spark, embeddings):
        from xwikire_spark.operators.similarity import cosine_near_duplicates

        got = {
            (r.vec_a, r.vec_b)
            for r in cosine_near_duplicates(
                embeddings, threshold=0.95, n_bands=6, planes_per_band=4
            ).collect()
        }
        planted = {(i, 1000 + i) for i in range(20)}
        recall = len(got & planted) / len(planted)
        assert recall >= 0.9, f"planted-pair recall {recall}"
        # precision is exact by construction: every emitted pair really is
        # >= threshold (spot-check none pair two independent gaussians)
        assert all(b == 1000 + a for a, b in got), got - planted


class TestVocabAndSplits:
    def test_vocab_ranks(self, spark):
        from xwikire_spark.operators.vocab import build_vocab

        docs = spark.createDataFrame(pd.DataFrame([
            {"doc_id": 0, "text": "a a a b b c"},
        ]))
        v = {r.token: (r["count"], r.vocab_id)
             for r in build_vocab(docs, split_pattern=" ").collect()}
        assert v["a"] == (3, 5)  # rank 1 + 4 reserved
        assert v["b"] == (2, 6)
        assert v["c"] == (1, 7)

    def test_round_robin_balance(self, spark):
        from xwikire_spark.operators.splits import round_robin_balance

        rows = [{"cls": c, "id": i * 10 + j}
                for i, c in enumerate(["x", "y", "z"]) for j in range(5)]
        df = spark.createDataFrame(pd.DataFrame(rows))
        out = round_robin_balance(df, "cls", limit=6, order_col="id")
        got = out.groupBy("cls").count().collect()
        # 6 picks round-robin over 3 classes -> 2 each
        assert {r.cls: r["count"] for r in got} == {"x": 2, "y": 2, "z": 2}

    def test_round_robin_dedup_and_seed(self, spark):
        # reference balance_relation.py:49-58: keep_all=False dedups on
        # q_id before balancing; random.shuffle -> seeded md5 order here
        from xwikire_spark.operators.splits import round_robin_balance

        rows = [{"cls": c, "id": i * 10 + j, "q": f"q{j % 2}"}
                for i, c in enumerate(["x", "y"]) for j in range(6)]
        df = spark.createDataFrame(pd.DataFrame(rows))
        out = round_robin_balance(
            df, "cls", limit=4, order_col="id", dedup_col="q", seed=3
        ).collect()
        # dedup keeps one row per q value (2 qs) -> 2 rows total pre-limit
        assert len(out) == 2
        # seeded order is deterministic across partitionings
        again = round_robin_balance(
            df.repartition(5), "cls", limit=4, order_col="id",
            dedup_col="q", seed=3,
        ).collect()
        assert sorted(r.id for r in out) == sorted(r.id for r in again)

    def test_collision_edges_hot_alias_guard(self, spark):
        # one alias shared by 50 entities would emit 1225 edges; with the
        # stop-surface guard it emits none, while specific aliases still
        # connect their entities
        from xwikire_spark.pipeline.canonicalize import collision_edges

        hot = [{"alias": "the company", "entity_id": f"Q{i}"}
               for i in range(50)]
        cold = [{"alias": "acme", "entity_id": q} for q in ("Q1", "Q2")]
        df = spark.createDataFrame(pd.DataFrame(hot + cold))
        edges = collision_edges(df, max_bucket=10).collect()
        assert {(r.src, r.dst) for r in edges} == {("Q1", "Q2")}


class TestConnectedComponentsSkew:
    def test_hot_vertex_star_graph(self, spark):
        """A hub connected to 400 spokes (the hot-entity shape the salted
        two-phase min in canonicalize.py exists for) must converge to one
        component with the min id, plus untouched singletons."""
        import pandas as pd

        from xwikire_spark.pipeline.canonicalize import connected_components

        hub = "Q0500"
        spokes = [f"Q{i:04d}" for i in range(1000, 1400)]
        singletons = [f"Q{i:04d}" for i in range(2000, 2050)]
        vertices = spark.createDataFrame(
            pd.DataFrame({"id": [hub] + spokes + singletons}))
        edges = spark.createDataFrame(
            pd.DataFrame({"src": [hub] * len(spokes), "dst": spokes}))
        cc = {r.id: r.component
              for r in connected_components(vertices, edges).collect()}
        star = {cc[v] for v in [hub] + spokes}
        assert star == {hub}, f"star labels: {star}"  # hub is min id
        assert all(cc[s] == s for s in singletons)

    def test_chain_converges_logarithmically(self, spark):
        """A 64-node path graph needs O(log n) rounds — must finish within
        the max_iter budget and label everything with the chain min."""
        import pandas as pd

        from xwikire_spark.pipeline.canonicalize import connected_components

        ids = [f"N{i:03d}" for i in range(64)]
        vertices = spark.createDataFrame(pd.DataFrame({"id": ids}))
        edges = spark.createDataFrame(pd.DataFrame({
            "src": ids[:-1], "dst": ids[1:]}))
        cc = {r.id: r.component
              for r in connected_components(vertices, edges).collect()}
        assert set(cc.values()) == {"N000"}


class TestSessionFold:
    """Pure fold-logic tests for the stateful sessionizer (late data and
    sequence continuity — the cases the streaming harness can't easily
    drive deterministically)."""

    GAP = 1800 * 1_000_000

    def test_late_event_extends_session_backward(self):
        from xwikire_spark.streaming.sessionize import fold_events

        # open session [12:00, 12:00]; late event 11:50 (within gap)
        t0 = 1_700_000_000 * 1_000_000
        closed, (seq, n, start, last) = fold_events(
            1, 1, t0, t0, [t0 - 600 * 1_000_000], self.GAP
        )
        assert closed == []
        assert (seq, n) == (1, 2)
        assert start == t0 - 600 * 1_000_000  # start moved earlier
        assert last == t0

    def test_detached_late_event_is_own_closed_session(self):
        from xwikire_spark.streaming.sessionize import fold_events

        t0 = 1_700_000_000 * 1_000_000
        late = t0 - 2 * self.GAP  # > gap before the open session's start
        closed, (seq, n, start, last) = fold_events(
            3, 2, t0, t0, [late], self.GAP
        )
        # the detached event closes immediately at the current counter and
        # the open session renumbers after it — no duplicate seq
        assert closed == [(3, 1, late, late)]
        assert (seq, n, start, last) == (4, 2, t0, t0)

    def test_late_cluster_merges_into_one_session(self):
        """Two+ detached late events within gap of EACH OTHER close as one
        session, like the batch lag+cumsum oracle (ADVICE r2)."""
        from xwikire_spark.streaming.sessionize import fold_events

        t0 = 1_700_000_000 * 1_000_000
        lates = [t0 - 5 * self.GAP, t0 - 5 * self.GAP + self.GAP // 2,
                 t0 - 3 * self.GAP]
        closed, (seq, n, start, last) = fold_events(
            3, 2, t0, t0, lates, self.GAP
        )
        assert closed == [
            (3, 2, lates[0], lates[1]),  # cluster of two -> ONE session
            (4, 1, lates[2], lates[2]),  # detached from both neighbors
        ]
        assert (seq, n, start, last) == (5, 2, t0, t0)

    def test_late_chain_bridges_into_open_session(self):
        """A late run that backward extension brings within gap of the
        open session merges into it — the three sessionization paths
        (batch lag+cumsum, session_window, streaming fold) agree."""
        from xwikire_spark.streaming.sessionize import fold_events

        t0 = 1_700_000_000 * 1_000_000
        g = self.GAP
        # 0.8g steps: each within gap of the next; first two detached
        lates = [t0 - 2 * g, t0 - 2 * g + (8 * g) // 10, t0 - g // 2]
        closed, (seq, n, start, last) = fold_events(
            7, 2, t0, t0, lates, g
        )
        assert closed == []
        assert (seq, n, start, last) == (7, 5, lates[0], t0)

    def test_seq_continues_after_timeout_close(self):
        from xwikire_spark.streaming.sessionize import fold_events

        # after a timeout close the state keeps (seq, 0, NO_SESSION): the
        # next event must open session seq+1, not restart at 1
        t0 = 1_700_000_000 * 1_000_000
        closed, (seq, n, start, last) = fold_events(
            5, 0, None, None, [t0], self.GAP
        )
        assert closed == []
        assert (seq, n, start, last) == (6, 1, t0, t0)

    def test_matches_batch_semantics_in_order(self):
        from xwikire_spark.streaming.sessionize import fold_events

        # in-order stream: sessions split exactly at gaps > 30 min
        base = 1_700_000_000 * 1_000_000
        m = 60 * 1_000_000
        ts = [base, base + 10 * m, base + 50 * m, base + 200 * m]
        closed, (seq, n, start, last) = fold_events(
            0, 0, None, None, ts, self.GAP
        )
        # gaps: 10m (joins), 40m (splits), 150m (splits)
        assert [(c[0], c[1]) for c in closed] == [(1, 2), (2, 1)]
        assert (seq, n) == (3, 1)


class TestNullTextRows:
    def test_simhash_keeps_null_text_docs(self, spark):
        from xwikire_spark.operators.dedup import simhash, simhash_md5

        docs = spark.createDataFrame(
            [("d1", "hello world"), ("d2", None), ("d3", "")],
            "doc_id string, text string",
        )
        assert simhash(docs).count() == 3
        assert simhash_md5(docs).count() == 3


class TestNgramJaccardGuard:
    def test_hot_group_bounded(self, spark):
        """A stopword-like token shared by every doc of one group must not
        turn the self-join quadratic: with max_token_df below the group
        size, the hot token is dropped from the shared-evidence index and
        the pair count collapses from C(n,2) to only genuinely-overlapping
        pairs (VERDICT r2 'What's wrong' #3)."""
        from xwikire_spark.operators.dedup import (
            ngram_jaccard_pairs_within_groups,
        )

        rows = [("en", f"d{i:02d}", f"the unique{i} token{i}") for i in range(40)]
        rows += [("en", "dup_a", "the same same2 same3"),
                 ("en", "dup_b", "the same same2 same3")]
        docs = spark.createDataFrame(
            rows, "lang string, doc_id string, text string"
        )
        unguarded = ngram_jaccard_pairs_within_groups(
            docs, ["lang"], threshold=0.1, max_token_df=10_000
        ).collect()
        guarded = ngram_jaccard_pairs_within_groups(
            docs, ["lang"], threshold=0.1, max_token_df=10
        ).collect()
        # 'the' is in all 42 docs: unguarded sees 42*41/2 'the'-sharing
        # pairs at jaccard 1/5 >= 0.1; guarded keeps only the true dup pair
        assert len(unguarded) > 800
        assert [(r["doc_a"], r["doc_b"]) for r in guarded] == [
            ("dup_a", "dup_b")
        ]
        # denominators stay exact: 'the' still counts toward n_a/n_b, so
        # the surviving pair's jaccard is 3/5 (intersection lost 'the')
        assert abs(guarded[0]["jaccard"] - 0.6) < 1e-9

    def test_guard_inert_below_cap(self, spark):
        from xwikire_spark.operators.dedup import (
            ngram_jaccard_pairs_within_groups,
        )

        docs = spark.createDataFrame(
            [("en", "a", "x y z"), ("en", "b", "x y w"), ("en", "c", "q r s")],
            "lang string, doc_id string, text string",
        )
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs_within_groups(
                docs, ["lang"], threshold=0.4
            ).collect()
        }
        assert got == {("a", "b"): 0.5}


class TestIVFBroadcastAssignment:
    def test_large_model_uses_udf_and_compiles_fast(self, spark):
        """256 centroids x 256 dims (65k floats) must take the broadcast
        pandas-UDF assignment — the plan builds in seconds instead of
        inlining 65k literals (VERDICT r2 'What's wrong' #4) — and agree
        with the literal path on an easy assignment."""
        import time

        from xwikire_spark.operators.similarity import _assign_to_centroids

        dims = 256
        cents = []
        for cid in range(256):
            vec = [0.0] * dims
            vec[cid % dims] = 1.0
            cents.append((cid, vec))
        v = spark.createDataFrame(
            [(f"v{i}", [1.0 if d == i else 0.0 for d in range(dims)])
             for i in range(8)],
            "vec_id string, e array<double>",
        )
        t0 = time.time()
        out = _assign_to_centroids(v, cents)
        plan = out._jdf.queryExecution().executedPlan().toString()
        got = {r["vec_id"]: r["cid"] for r in out.collect()}
        assert time.time() - t0 < 30
        assert "ArrowEvalPython" in plan
        assert got == {f"v{i}": i for i in range(8)}

    def test_small_model_stays_literal(self, spark):
        from xwikire_spark.operators.similarity import _assign_to_centroids

        cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
        v = spark.createDataFrame(
            [("a", [0.9, 0.1]), ("b", [0.1, 0.9])],
            "vec_id string, e array<double>",
        )
        out = _assign_to_centroids(v, cents)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan
        assert {r["vec_id"]: r["cid"] for r in out.collect()} == {
            "a": 0, "b": 1,
        }


class TestSimHashOracleGate:
    def test_simhash_md5_matches_duckdb_oracle(self, spark):
        """The simhash md5-twin's value-hash gate, kept as a pytest after
        its driver row was consolidated away (the driver report caps at 50
        entries; VERDICT r2 next-round #2). Same generated SQL, same
        engine-vs-engine comparison, at sf0.001 for speed."""
        import duckdb
        import pandas as pd

        import __spark_entry__ as e

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        sdf = e.q_dedup_simhash(spark, sf).toPandas()
        odf = con.execute(e._simhash_md5_oracle_sql()).df()
        cols = list(sdf.columns)
        a = sdf.sort_values(cols).reset_index(drop=True)
        b = odf[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestMultimodalRealDecode:
    """Round-2 'honest stub' closed for stdlib-decodable formats: PNG/PPM
    payloads flow through extract_media_features / resize_images with
    fake=False — a real decode -> feature / resample -> re-encode path."""

    def _media_df(self, spark):
        from xwikire_spark.kernels.imagecodec import encode_png, encode_ppm
        from xwikire_spark.kernels.jpegcodec import encode_jpeg

        px = bytearray()
        for y in range(4):
            for x in range(6):
                px.extend([x * 40, y * 60, 128])
        rows = [
            ("png1", "image", bytes(encode_png(6, 4, 3, px)), "image/png",
             6, 4, None),
            ("ppm1", "image", bytes(encode_ppm(6, 4, px)), "image/x-ppm",
             6, 4, None),
            ("jpg1", "image", encode_jpeg(6, 4, 3, bytes(px)), "image/jpeg",
             6, 4, None),
            ("aud1", "audio", b"\x00\x01\x02", "audio/wav", None, None, 900),
        ]
        return spark.createDataFrame(
            rows,
            "media_id string, kind string, payload binary, mime string, "
            "width int, height int, duration_ms int",
        )

    def test_real_features(self, spark):
        from xwikire_spark.operators.multimodal import extract_media_features

        media = self._media_df(spark).where("kind = 'image'")
        got = {r["media_id"]: r for r in
               extract_media_features(media, fake=False).collect()}
        # both lossless encodings of the SAME pixels: identical features
        assert got["png1"]["feat"][:3] == [6.0, 4.0, 3.0]
        assert got["png1"]["feat"] == got["ppm1"]["feat"]
        assert got["png1"]["sha1"] != got["ppm1"]["sha1"]  # bytes differ
        # jpeg is lossy: same shape, channel means within quant error
        assert got["jpg1"]["feat"][:3] == [6.0, 4.0, 3.0]
        for a, b in zip(got["jpg1"]["feat"][3:6], got["png1"]["feat"][3:6]):
            assert abs(a - b) <= 8.0

    def test_null_payload_quarantined_not_fatal(self, spark):
        """F5 quarantine semantics on the REAL path: a null/empty payload
        yields NULL features / passes through resize untouched instead of
        aborting the corpus-wide job with a codec error."""
        from xwikire_spark.operators.multimodal import (
            extract_media_features,
            resize_images,
        )

        media = self._media_df(spark).unionByName(
            spark.createDataFrame(
                [("null1", "image", None, "image/png", 6, 4, None)],
                self._media_df(spark).schema,
            )
        )
        feats = {r["media_id"]: r for r in
                 extract_media_features(
                     media.where("kind = 'image'"), fake=False
                 ).collect()}
        assert feats["null1"]["feat"] is None
        assert feats["png1"]["feat"] is not None  # others still decode
        out = {r["media_id"]: r for r in resize_images(
            media, width=3, height=2, fake=False
        ).collect()}
        assert bytes(out["null1"]["payload"] or b"") == b""
        assert (out["null1"]["width"], out["null1"]["height"]) == (6, 4)

    def test_corrupt_and_unsupported_payloads_quarantined(self, spark):
        """ADVICE r3: fake=False decode must quarantine ANY bad payload —
        truncated GIF, random garbage, unsupported WebP — as NULL features
        with an err tag, never abort the corpus job; healthy rows in the
        same batch still decode with err NULL."""
        from xwikire_spark.kernels.gifcodec import encode_gif
        from xwikire_spark.operators.multimodal import (
            extract_media_features,
            resize_images,
        )

        px = bytearray([10, 20, 30] * 4)
        good_gif = bytes(encode_gif(2, 2, px))
        rows = [
            ("ok", "image", good_gif, "image/gif", 2, 2, None),
            ("trunc", "image", good_gif[: len(good_gif) // 2],
             "image/gif", 2, 2, None),
            ("garbage", "image", b"\x00\x01" * 40, "image/bin", 2, 2, None),
            ("webp", "image", b"RIFF\x10\x00\x00\x00WEBPVP8 ",
             "image/webp", 2, 2, None),
        ]
        media = spark.createDataFrame(
            rows,
            "media_id string, kind string, payload binary, mime string, "
            "width int, height int, duration_ms int",
        )
        feats = {r["media_id"]: r for r in
                 extract_media_features(media, fake=False).collect()}
        assert feats["ok"]["feat"] is not None and feats["ok"]["err"] is None
        for bad in ("trunc", "garbage", "webp"):
            assert feats[bad]["feat"] is None, bad
            assert feats[bad]["err"], bad
        assert feats["webp"]["err"].startswith("unsupported")
        assert "ValueError" in feats["trunc"]["err"]
        # resize: bad payloads pass through untouched with original metadata
        out = {r["media_id"]: r for r in
               resize_images(media, width=1, height=1, fake=False).collect()}
        assert (out["ok"]["width"], out["ok"]["height"]) == (1, 1)
        assert bytes(out["trunc"]["payload"]) == good_gif[: len(good_gif) // 2]
        assert (out["trunc"]["width"], out["trunc"]["height"]) == (2, 2)
        assert (out["webp"]["width"], out["webp"]["height"]) == (2, 2)

    def test_real_audio_features(self, spark):
        import numpy as np

        from xwikire_spark.kernels.wavcodec import encode_wav
        from xwikire_spark.operators.multimodal import extract_media_features

        t = np.arange(2000) / 8000.0
        blob = encode_wav(8000, np.sin(2 * np.pi * 440 * t) * 0.5)
        media = spark.createDataFrame(
            [("wav1", "audio", blob, "audio/wav", None, None, 250)],
            "media_id string, kind string, payload binary, mime string, "
            "width int, height int, duration_ms int",
        )
        feat = extract_media_features(media, fake=False).collect()[0]["feat"]
        # frames, duration, channels, rms(A/sqrt2), peak, zcr, rate
        assert feat[0] == 2000.0 and feat[2] == 1.0 and feat[6] == 8000.0
        assert abs(feat[1] - 0.25) < 1e-4
        assert abs(feat[3] - 0.5 / 2 ** 0.5) < 0.01

    def test_real_resize_round_trips(self, spark):
        from xwikire_spark.kernels.imagecodec import decode_image
        from xwikire_spark.operators.multimodal import resize_images

        out = {r["media_id"]: r for r in resize_images(
            self._media_df(spark), width=3, height=2, fake=False
        ).collect()}
        w, h, ch, px = decode_image(bytes(out["png1"]["payload"]))
        assert (w, h, ch) == (3, 2, 3)
        assert (out["png1"]["width"], out["png1"]["height"]) == (3, 2)
        # family-preserving re-encode: ppm stays ppm, jpeg stays jpeg
        assert bytes(out["ppm1"]["payload"]).startswith(b"P6")
        jb = bytes(out["jpg1"]["payload"])
        assert jb.startswith(b"\xff\xd8\xff")
        assert decode_image(jb)[:3] == (3, 2, 3)
        # non-image rows pass through untouched
        assert bytes(out["aud1"]["payload"]) == b"\x00\x01\x02"
        assert out["aud1"]["duration_ms"] == 900


class TestScrubPII:
    """URL/email scrubbing (textstats.scrub_pii) — the pre-training
    hygiene pass. Counts + redaction, URL-first ordering, and
    cross-engine pattern parity (the same ASCII-literal patterns must
    behave identically under DuckDB regexps, since every oracle shares
    them)."""

    ROWS = [
        (1, "see https://ex.com/a?u=bob@ex.com and mail bob@ex.com now"),
        (2, "plain text with no contacts at all"),
        (3, "two urls http://a.io/x https://b.io/y one mail a.b+c@sub.ex.org"),
        (4, "not-an-email @handle and half-url http:// nope"),
    ]

    def _df(self, spark):
        return spark.createDataFrame(self.ROWS, "doc_id int, text string")

    def test_counts_and_redaction(self, spark):
        from xwikire_spark.operators.textstats import scrub_pii

        got = {r["doc_id"]: r for r in scrub_pii(self._df(spark)).collect()}
        # URL swallows the address in its query string: 1 url, 1 email
        assert (got[1]["n_urls"], got[1]["n_emails"]) == (1, 1)
        assert got[1]["text"] == "see <URL> and mail <EMAIL> now"
        assert (got[2]["n_urls"], got[2]["n_emails"]) == (0, 0)
        assert got[2]["text"] == self.ROWS[1][1]
        assert (got[3]["n_urls"], got[3]["n_emails"]) == (2, 1)
        assert got[3]["text"] == "two urls <URL> <URL> one mail <EMAIL>"
        # @handle has no domain dot; "http://" alone never matches
        assert (got[4]["n_urls"], got[4]["n_emails"]) == (0, 0)

    def test_plan_is_single_projection(self, spark):
        from xwikire_spark.operators.textstats import scrub_pii

        plan = (
            scrub_pii(self._df(spark))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "Python" not in plan  # pure JVM expressions

    def test_duckdb_pattern_parity(self, spark):
        import duckdb
        import pandas as pd

        from xwikire_spark.operators.textstats import (
            EMAIL_PATTERN,
            URL_PATTERN,
            scrub_pii,
        )

        sdf = (
            scrub_pii(self._df(spark))
            .orderBy("doc_id")
            .toPandas()[["doc_id", "n_urls", "n_emails", "text"]]
        )
        con = duckdb.connect()
        con.register(
            "docs", pd.DataFrame(self.ROWS, columns=["doc_id", "text"])
        )
        odf = con.execute(f"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '{URL_PATTERN}'))
                        AS INT) AS n_urls,
                   CAST(len(regexp_extract_all(regexp_replace(text,
                        '{URL_PATTERN}', '<URL>', 'g'), '{EMAIL_PATTERN}'))
                        AS INT) AS n_emails,
                   regexp_replace(regexp_replace(text, '{URL_PATTERN}',
                        '<URL>', 'g'), '{EMAIL_PATTERN}', '<EMAIL>', 'g')
                       AS text
            FROM docs ORDER BY doc_id
        """).df()
        pd.testing.assert_frame_equal(sdf, odf, check_dtype=False)


class TestBenchmarkContamination:
    """Train/test contamination screening (dedup.benchmark_contamination):
    planted 8-gram overlap, DuckDB differential, and the corpus side must
    broadcast-join (no corpus shuffle before the aggregate)."""

    DOCS = [
        (1, "the quick brown fox jumps over the lazy dog every single day"),
        (2, "completely unrelated text about spark query planning at scale"),
        (3, "prefix words then the quick brown fox jumps over the lazy dog"),
        (4, "short doc"),
        # doc 5 LOOPS one contaminated 8-gram: must count it once, not 3x
        (5, "the quick brown fox jumps over the lazy dog "
            "the quick brown fox jumps over the lazy dog "
            "the quick brown fox jumps over the lazy dog"),
    ]
    PROBES = [
        (100, "benchmark says the quick brown fox jumps over the lazy dog"),
    ]

    def _frames(self, spark):
        docs = spark.createDataFrame(self.DOCS, "doc_id int, text string")
        probes = spark.createDataFrame(
            self.PROBES, "probe_id int, text string"
        )
        return docs, probes

    def test_planted_overlap(self, spark):
        from xwikire_spark.operators.dedup import benchmark_contamination

        docs, probes = self._frames(spark)
        got = {r["doc_id"]: r for r in
               benchmark_contamination(docs, probes, k=8).collect()}
        # docs 1/3/5 share the 8-gram "the quick ... lazy dog"; 2/4 clean
        assert set(got) == {1, 3, 5}
        assert got[1]["n_contaminated_shingles"] >= 1
        assert "quick brown fox" in got[1]["example_shingle"]
        # DISTINCT semantics: doc 5 loops the contaminated content — its
        # count is the number of distinct shared shingles, bounded by the
        # probe's own shingle count (4), not by its own repetitions (>=9)
        assert got[5]["n_contaminated_shingles"] <= 4

    def test_duckdb_differential(self, spark):
        import duckdb
        import pandas as pd

        from xwikire_spark.operators.dedup import benchmark_contamination

        docs, probes = self._frames(spark)
        sdf = (
            benchmark_contamination(docs, probes, k=8)
            .orderBy("doc_id")
            .toPandas()
        )
        con = duckdb.connect()
        con.register("docs", pd.DataFrame(self.DOCS,
                                          columns=["doc_id", "text"]))
        con.register("probes", pd.DataFrame(
            self.PROBES, columns=["probe_id", "text"]))
        odf = con.execute("""
            WITH ds AS (
              SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id, unnest([list_aggregate(words[i:i+7], 'string_agg', ' ')
                       for i in generate_series(1, len(words) - 7)]) AS shingle
                FROM (SELECT doc_id, string_split(text, ' ') AS words FROM docs)
              )
            ), ps AS (
              SELECT DISTINCT unnest([list_aggregate(words[i:i+7], 'string_agg', ' ')
                     for i in generate_series(1, len(words) - 7)]) AS shingle
              FROM (SELECT string_split(text, ' ') AS words FROM probes)
            )
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_contaminated_shingles,
                   min(shingle) AS example_shingle
            FROM ds JOIN ps USING (shingle)
            GROUP BY doc_id ORDER BY doc_id
        """).df()
        pd.testing.assert_frame_equal(sdf, odf, check_dtype=False)

    def test_probe_side_broadcasts(self, spark):
        from xwikire_spark.operators.dedup import benchmark_contamination

        docs, probes = self._frames(spark)
        plan = (
            benchmark_contamination(docs, probes)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan


class TestVideoFrames:
    """sample_video_frames: MJPEG-in-MP4 real frame sampling (r3
    next-round #4) — the two-phase shape where this stage slices small
    frame payloads and heavy decode runs per-frame downstream."""

    def _media(self, spark, blob, extra=()):
        rows = [("vid1", "video", blob, "video/mp4", 8, 8, 2000),
                ("img1", "image", b"\x00" * 10, "image/png", 2, 2, None)]
        rows += list(extra)
        return spark.createDataFrame(
            rows,
            "media_id string, kind string, payload binary, mime string, "
            "width int, height int, duration_ms int",
        )

    def test_real_frames_decode(self, spark):
        from xwikire_spark.kernels.jpegcodec import encode_jpeg
        from xwikire_spark.kernels.mp4codec import encode_mjpeg_mp4
        from xwikire_spark.operators.multimodal import sample_video_frames

        frames = []
        for k in range(4):
            px = bytes(bytearray((x * 30 + k * 40) % 256
                                 for y in range(8) for x in range(8)
                                 for _ in range(3)))
            frames.append(encode_jpeg(8, 8, 3, px))
        blob = encode_mjpeg_mp4(8, 8, frames, fps=2)  # dts 0/500/1000/1500

        got = sample_video_frames(
            self._media(spark, blob), every_ms=500, fake=False
        ).collect()
        by_ms = {r["sample_ms"]: r for r in got}
        assert sorted(by_ms) == [0, 500, 1000, 1500]  # only the video row
        for ms, idx in [(0, 0), (500, 1), (1000, 2), (1500, 3)]:
            assert by_ms[ms]["frame_idx"] == idx
            assert bytes(by_ms[ms]["frame"]) == frames[idx]
            assert by_ms[ms]["err"] is None
        # the sliced frames ARE decodable images downstream
        from xwikire_spark.kernels.jpegcodec import decode_jpeg

        w, h, c, _ = decode_jpeg(bytes(by_ms[1000]["frame"]))
        assert (w, h, c) == (8, 8, 3)

    def test_corrupt_video_quarantined(self, spark):
        from xwikire_spark.kernels.jpegcodec import encode_jpeg
        from xwikire_spark.kernels.mp4codec import encode_mjpeg_mp4
        from xwikire_spark.operators.multimodal import sample_video_frames

        px = bytes(bytearray([9, 9, 9] * 4))
        blob = encode_mjpeg_mp4(2, 2, [encode_jpeg(2, 2, 3, px)])
        media = self._media(
            spark, blob,
            extra=[("bad1", "video", b"nonsense", "video/mp4", 2, 2, 500),
                   ("null1", "video", None, "video/mp4", 2, 2, 500)],
        )
        got = {r["media_id"]: r for r in
               sample_video_frames(media, every_ms=1000, fake=False)
               .where("err IS NOT NULL").collect()}
        assert set(got) == {"bad1", "null1"}
        ok = sample_video_frames(media, every_ms=1000, fake=False).where(
            "err IS NULL").collect()
        assert [r["media_id"] for r in ok] == ["vid1"]

    def test_inflated_timeline_quarantined_not_hung(self, spark):
        """ADVICE r4 (medium): a crafted-but-structurally-valid MP4 with a
        ~2^32 stts delta at timescale=1 implies a ~4e12 ms timeline — the
        sampling loop must raise into the err quarantine, not iterate
        billions of times."""
        import struct

        from xwikire_spark.kernels.jpegcodec import encode_jpeg
        from xwikire_spark.kernels.mp4codec import encode_mjpeg_mp4
        from xwikire_spark.operators.multimodal import sample_video_frames

        frames = [encode_jpeg(2, 2, 3, bytes(12)) for _ in range(3)]
        blob = bytearray(encode_mjpeg_mp4(2, 2, frames, fps=1))
        raw = bytes(blob)
        # mdhd timescale -> 1 (payload: ver/flags 4 + ctime 4 + mtime 4)
        i = raw.index(b"mdhd") + 4 + 4 + 8
        struct.pack_into(">I", blob, i, 1)
        # stts sole entry delta -> 0xFFFFFFFF (payload: ver/flags 4 +
        # count 4 + sample_count 4 + delta 4)
        j = raw.index(b"stts") + 4 + 4 + 4 + 4
        struct.pack_into(">I", blob, j, 0xFFFFFFFF)
        got = sample_video_frames(
            self._media(spark, bytes(blob)), every_ms=1000, fake=False
        ).collect()
        assert len(got) == 1
        assert got[0]["frame"] is None
        assert "max_frames" in got[0]["err"]

    def test_fake_path_cadence(self, spark):
        from xwikire_spark.operators.multimodal import sample_video_frames

        media = self._media(spark, b"\x01\x02\x03")
        got = sample_video_frames(media, every_ms=500, fake=True).collect()
        assert [r["sample_ms"] for r in got] == [0, 500, 1000, 1500]
        assert all(len(bytes(r["frame"])) == 20 for r in got)  # sha1 bytes
        assert len({bytes(r["frame"]) for r in got}) == 4  # ms-dependent


class TestDecontaminate:
    """Decontamination — the removal side of benchmark_contamination (r3
    next-round #6): drop-doc and span-excise modes, observe() counters,
    DuckDB differential for the excise rebuild."""

    DOCS = TestBenchmarkContamination.DOCS
    PROBES = TestBenchmarkContamination.PROBES

    def _frames(self, spark):
        docs = spark.createDataFrame(self.DOCS, "doc_id int, text string")
        probes = spark.createDataFrame(
            self.PROBES, "probe_id int, text string"
        )
        return docs, probes

    def test_drop_mode(self, spark):
        from xwikire_spark.operators.dedup import decontaminate

        docs, probes = self._frames(spark)
        kept = decontaminate(docs, probes, k=8, mode="drop").collect()
        assert sorted(r["doc_id"] for r in kept) == [2, 4]
        # schema unchanged in drop mode
        assert [f.name for f in
                decontaminate(docs, probes, mode="drop").schema] == \
            ["doc_id", "text"]

    def test_excise_mode_cuts_spans_and_counts(self, spark):
        from xwikire_spark.operators.dedup import decontaminate

        docs, probes = self._frames(spark)
        got = {r["doc_id"]: r for r in
               decontaminate(docs, probes, k=8, mode="excise").collect()}
        assert set(got) == {1, 2, 3, 4, 5}
        # clean docs untouched
        assert got[2]["text"] == self.DOCS[1][1]
        assert got[2]["n_removed_words"] == 0
        assert got[4]["text"] == "short doc"
        # doc 1 (12 words): matched 8-grams start at word 0 and 1, covering
        # indexes 0..8 -> suffix "every single day" survives
        assert got[1]["text"] == "every single day"
        assert got[1]["n_removed_words"] == 9
        # doc 3 has a 3-word prefix then the contaminated 9 words
        assert got[3]["text"] == "prefix words then"
        # doc 5 loops the contaminated 8-gram: everything goes (27 words)
        assert got[5]["text"] == ""
        assert got[5]["n_removed_words"] == 27
        # excised text no longer contaminates (idempotence)
        again = decontaminate(
            spark.createDataFrame(
                [(r["doc_id"], r["text"]) for r in got.values()],
                "doc_id int, text string",
            ),
            probes, k=8, mode="excise",
        ).collect()
        assert all(r["n_removed_words"] == 0 for r in again)

    def test_observe_counters(self, spark):
        from pyspark.sql import Observation

        from xwikire_spark.operators.dedup import decontaminate

        docs, probes = self._frames(spark)
        out = decontaminate(docs, probes, k=8, mode="excise")
        # the operator's own observe() rides the plan; attach a second,
        # readable Observation to assert the counters from one pass
        obs = Observation("decontam_check")
        watched = out.observe(
            obs,
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_removed_words").alias("removed"),
        )
        watched.collect()
        assert obs.get["docs"] == 5
        assert obs.get["removed"] == 9 + 9 + 27

    def test_fully_contaminated_10k_words_bounded(self, spark):
        """VERDICT r4 #2: a doc that is 100% probe overlap at 10k words.
        The per-word exists() shape did O(words x hits) ~ 1e8 lambda evals
        here; the merged-interval gap slicing collapses all hits into ONE
        covered interval, so the excision is O(words) and must finish
        comfortably within the bound."""
        import time

        from xwikire_spark.operators.dedup import decontaminate

        n = 10_000
        text = " ".join(f"w{i}" for i in range(n))
        docs = spark.createDataFrame([(1, text)], "doc_id int, text string")
        probes = spark.createDataFrame(
            [(1, text)], "probe_id int, text string"
        )
        t0 = time.monotonic()
        got = decontaminate(docs, probes, k=8, mode="excise").collect()
        dt = time.monotonic() - t0
        assert len(got) == 1
        assert got[0]["text"] == ""
        assert got[0]["n_removed_words"] == n
        assert dt < 60, f"excise took {dt:.1f}s — not bounded"

    def test_duckdb_differential_excise(self, spark):
        import duckdb
        import pandas as pd

        from xwikire_spark.operators.dedup import decontaminate

        docs, probes = self._frames(spark)
        sdf = (
            decontaminate(docs, probes, k=8, mode="excise")
            .orderBy("doc_id")
            .toPandas()
        )
        con = duckdb.connect()
        con.register("docs", pd.DataFrame(self.DOCS,
                                          columns=["doc_id", "text"]))
        con.register("probes", pd.DataFrame(
            self.PROBES, columns=["probe_id", "text"]))
        odf = con.execute("""
            WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws
                       FROM docs),
            ds AS (
              SELECT doc_id, i AS pos,
                     list_aggregate(ws[i:i+7], 'string_agg', ' ') AS shingle
              FROM w, unnest(generate_series(1, len(ws) - 7)) AS t(i)
            ), ps AS (
              SELECT DISTINCT unnest(
                [list_aggregate(words[i:i+7], 'string_agg', ' ')
                 for i in generate_series(1, len(words) - 7)]) AS shingle
              FROM (SELECT string_split(text, ' ') AS words FROM probes)
            ), cov AS (
              SELECT DISTINCT doc_id, j
              FROM (SELECT ds.doc_id, ds.pos FROM ds JOIN ps USING (shingle)),
                   unnest(generate_series(pos, pos + 7)) AS t(j)
            ), idx AS (
              SELECT doc_id, i, ws[i] AS word, len(ws) AS n0
              FROM w, unnest(generate_series(1, len(ws))) AS t(i)
            ), rebuilt AS (
              SELECT idx.doc_id,
                     string_agg(word, ' ' ORDER BY i)
                       FILTER (WHERE cov.j IS NULL) AS text,
                     CAST(any_value(n0)
                          - count(*) FILTER (WHERE cov.j IS NULL) AS INT)
                       AS n_removed_words
              FROM idx
              LEFT JOIN cov ON cov.doc_id = idx.doc_id AND cov.j = idx.i
              GROUP BY idx.doc_id
            )
            SELECT doc_id, coalesce(text, '') AS text, n_removed_words
            FROM rebuilt ORDER BY doc_id
        """).df()
        pd.testing.assert_frame_equal(sdf, odf, check_dtype=False)


class TestIncrementalDedup:
    """Streaming dedup bridge (r3 next-round #7): newly-arrived docs join
    the existing MinHash signature index; batch-then-increment must equal
    the full-batch pair set."""

    def _docs(self):
        rows, planted = _mk_docs(n_base=25)
        for r in rows:
            r["doc_id"] = str(r["doc_id"])
        return rows, {(str(a), str(b)) for a, b in planted}

    def test_batch_then_increment_equals_full_batch(self, spark):
        from xwikire_spark.operators.dedup import (
            incremental_minhash_dedup,
            near_duplicates_minhash,
        )

        rows, _ = self._docs()
        # split so near-dup pairs straddle the boundary: bases (even rows)
        # arrive first, their planted dups (odd rows) second — plus a few
        # whole pairs inside each half
        first = rows[:20] + rows[20::2]
        second = [r for r in rows if r not in first]
        all_df = spark.createDataFrame(pd.DataFrame(rows))
        f_df = spark.createDataFrame(pd.DataFrame(first))
        s_df = spark.createDataFrame(pd.DataFrame(second))

        full = {(r["doc_a"], r["doc_b"], r["jaccard"])
                for r in near_duplicates_minhash(all_df).collect()}

        empty_index = spark.createDataFrame(
            [], "doc_id string, sig array<bigint>"
        )
        p0, idx0, sig0 = incremental_minhash_dedup(f_df, empty_index, f_df)
        p1, idx1, sig1 = incremental_minhash_dedup(all_df, idx0, s_df)
        got = {(r["doc_a"], r["doc_b"], r["jaccard"])
               for r in p0.collect()} | \
              {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in p1.collect()}
        assert got == full and len(full) > 0
        # the updated index covers every doc exactly once
        assert idx1.count() == len(rows)
        assert idx1.select("doc_id").distinct().count() == len(rows)

    def test_redelivery_is_idempotent(self, spark):
        """At-least-once delivery: re-sending an already-indexed batch
        adds no signatures and re-emits no new-new pairs beyond what the
        anti-join admits (zero fresh docs -> zero pairs)."""
        from xwikire_spark.operators.dedup import incremental_minhash_dedup

        rows, _ = self._docs()
        df = spark.createDataFrame(pd.DataFrame(rows[:10]))
        empty_index = spark.createDataFrame(
            [], "doc_id string, sig array<bigint>"
        )
        p0, idx0, sig0 = incremental_minhash_dedup(df, empty_index, df)
        n0 = idx0.count()
        assert sig0.count() == n0  # first batch: the delta IS the index
        p1, idx1, sig1 = incremental_minhash_dedup(df, idx0, df)
        assert idx1.count() == n0
        assert p1.count() == 0
        assert sig1.count() == 0  # nothing fresh -> empty delta

    def test_in_batch_duplicates_collapse(self, spark):
        """A single micro-batch carrying the same doc twice (at-least-once
        upstream) must index it once — the anti-join only guards against
        PRIOR batches, so the operator dedups within the batch too."""
        from xwikire_spark.operators.dedup import incremental_minhash_dedup

        rows, _ = self._docs()
        doubled = rows[:6] + rows[:3]  # 3 doc_ids appear twice
        df = spark.createDataFrame(pd.DataFrame(doubled))
        corpus = spark.createDataFrame(pd.DataFrame(rows[:6]))
        empty_index = spark.createDataFrame(
            [], "doc_id string, sig array<bigint>"
        )
        p, idx, sig = incremental_minhash_dedup(corpus, empty_index, df)
        assert sig.count() == 6
        assert idx.select("doc_id").distinct().count() == idx.count() == 6

    def _banded_dirs(self, spark, tmp_path):
        from xwikire_spark.operators.dedup import BANDS_SCHEMA

        empty_b = spark.createDataFrame([], BANDS_SCHEMA + ", bh_part int")
        empty_k = spark.createDataFrame([], "doc_id string")
        return (
            str(tmp_path / "bands"), str(tmp_path / "sigs"),
            empty_b, empty_k,
        )

    def test_banded_index_batch_then_increment_equals_full_batch(
        self, spark, tmp_path
    ):
        """VERDICT r4 #1: the persisted-banded-index path reproduces the
        full-batch pair set across an increment, reading/writing the
        bands and signature tables through parquet like the bridge."""
        from xwikire_spark.operators.dedup import (
            bh_part_expr,
            incremental_minhash_dedup_banded,
            near_duplicates_minhash,
        )

        rows, _ = self._docs()
        first = rows[:20] + rows[20::2]
        second = [r for r in rows if r not in first]
        all_df = spark.createDataFrame(pd.DataFrame(rows))
        f_df = spark.createDataFrame(pd.DataFrame(first))
        s_df = spark.createDataFrame(pd.DataFrame(second))
        bands_path, sigs_path, empty_b, empty_k = self._banded_dirs(
            spark, tmp_path
        )

        p0, s0, b0 = incremental_minhash_dedup_banded(
            f_df, empty_b, empty_k, f_df
        )
        got = {(r["doc_a"], r["doc_b"], r["jaccard"])
               for r in p0.collect()}
        b0.withColumn("bh_part", bh_part_expr()).write.partitionBy(
            "bh_part"
        ).parquet(bands_path)
        s0.write.parquet(sigs_path)

        p1, s1, b1 = incremental_minhash_dedup_banded(
            all_df,
            spark.read.parquet(bands_path),
            spark.read.parquet(sigs_path).select("doc_id"),
            s_df,
        )
        got |= {(r["doc_a"], r["doc_b"], r["jaccard"])
                for r in p1.collect()}
        full = {(r["doc_a"], r["doc_b"], r["jaccard"])
                for r in near_duplicates_minhash(all_df).collect()}
        assert got == full and len(full) > 0
        # deltas cover exactly the increment's docs, once
        assert s1.count() == len(second)
        assert b1.select("doc_id").distinct().count() == len(second)

    def test_banded_scan_is_bucket_pruned(self, spark, tmp_path):
        """The IO contract of the persisted index: a batch's scan of the
        bands table must carry BOTH the bh_part partition filter
        (directory pruning) and the band_hash IN pushdown (row-group
        pruning) — asserted on the executed plan's FileScan node."""
        from xwikire_spark.operators.dedup import (
            bh_part_expr,
            incremental_minhash_dedup_banded,
        )

        rows, _ = self._docs()
        f_df = spark.createDataFrame(pd.DataFrame(rows[:20]))
        s_df = spark.createDataFrame(pd.DataFrame(rows[20:]))
        bands_path, sigs_path, empty_b, empty_k = self._banded_dirs(
            spark, tmp_path
        )
        _p0, s0, b0 = incremental_minhash_dedup_banded(
            f_df, empty_b, empty_k, f_df
        )
        b0.withColumn("bh_part", bh_part_expr()).write.partitionBy(
            "bh_part"
        ).parquet(bands_path)
        s0.write.parquet(sigs_path)

        all_df = spark.createDataFrame(pd.DataFrame(rows))
        p1, _s1, _b1 = incremental_minhash_dedup_banded(
            all_df,
            spark.read.parquet(bands_path),
            spark.read.parquet(sigs_path).select("doc_id"),
            s_df,
        )
        plan = p1._jdf.queryExecution().executedPlan().toString()
        # identify the bands-table scan by its schema, NOT a path
        # substring: Spark truncates Location at
        # spark.sql.maxMetadataStringLength (100 chars), so under a long
        # pytest tmp_path the directory name never survives into the line
        scans = [
            ln for ln in plan.splitlines()
            if "FileScan" in ln and "band_hash" in ln
        ]
        assert scans, "no FileScan of the bands table in the plan"
        for ln in scans:
            assert "PartitionFilters: [bh_part" in ln, ln
            assert "PushedFilters: [In(band_hash" in ln, ln

    def test_banded_crash_between_bands_and_sigs_is_exact(
        self, spark, tmp_path
    ):
        """Crash-ordering re-proof for the new table (pairs -> bands ->
        sigs): a crash AFTER the bands append but BEFORE the sigs append
        makes the retry re-process the batch and append duplicate band
        rows — the count_distinct occupancy and distinct() candidates
        must keep the final pair set exactly equal to the clean run."""
        from xwikire_spark.operators.dedup import (
            bh_part_expr,
            incremental_minhash_dedup_banded,
            near_duplicates_minhash,
        )

        rows, _ = self._docs()
        first, second = rows[:25], rows[25:]
        all_df = spark.createDataFrame(pd.DataFrame(rows))
        f_df = spark.createDataFrame(pd.DataFrame(first))
        s_df = spark.createDataFrame(pd.DataFrame(second))
        bands_path, sigs_path, empty_b, empty_k = self._banded_dirs(
            spark, tmp_path
        )
        p0, s0, b0 = incremental_minhash_dedup_banded(
            f_df, empty_b, empty_k, f_df
        )
        got = {(r["doc_a"], r["doc_b"], r["jaccard"])
               for r in p0.collect()}
        # CRASH: bands written, sigs NOT
        b0.withColumn("bh_part", bh_part_expr()).write.partitionBy(
            "bh_part"
        ).parquet(bands_path)
        # RETRY of batch 0: anti-join sees nothing known (sigs missing),
        # re-emits the same pairs (dynamic overwrite would replace the
        # batch partition) and re-appends duplicate band rows
        empty_k2 = spark.createDataFrame([], "doc_id string")
        p0r, s0r, b0r = incremental_minhash_dedup_banded(
            f_df, spark.read.parquet(bands_path), empty_k2, f_df
        )
        assert {(r["doc_a"], r["doc_b"], r["jaccard"])
                for r in p0r.collect()} == got
        b0r.withColumn("bh_part", bh_part_expr()).write.mode(
            "append"
        ).partitionBy("bh_part").parquet(bands_path)
        s0r.write.mode("append").parquet(sigs_path)
        # the bands table now holds first-batch rows TWICE
        n_bands_rows = spark.read.parquet(bands_path).count()
        assert n_bands_rows == 2 * b0r.count()

        p1, s1, b1 = incremental_minhash_dedup_banded(
            all_df,
            spark.read.parquet(bands_path),
            spark.read.parquet(sigs_path).select("doc_id"),
            s_df,
        )
        got |= {(r["doc_a"], r["doc_b"], r["jaccard"])
                for r in p1.collect()}
        full = {(r["doc_a"], r["doc_b"], r["jaccard"])
                for r in near_duplicates_minhash(all_df).collect()}
        assert got == full and len(full) > 0

    def test_streaming_end_to_end(self, spark, tmp_path):
        """Two file drops through run_incremental_dedup (availableNow x2):
        the pairs accumulated across both runs equal the full-batch set."""
        import os

        from xwikire_spark.operators.dedup import near_duplicates_minhash
        from xwikire_spark.streaming.incremental import run_incremental_dedup

        rows, _ = self._docs()
        for r in rows:
            r["lang"], r["source"] = "en", "s"
        cols = ["doc_id", "lang", "source", "text"]
        first, second = rows[: len(rows) // 2], rows[len(rows) // 2:]
        d = {k: str(tmp_path / k) for k in
             ("input", "index", "pairs", "ckpt")}
        os.makedirs(d["input"], exist_ok=True)

        def drop(batch, name):
            spark.createDataFrame(
                pd.DataFrame(batch)[cols]
            ).coalesce(1).write.mode("append").parquet(d["input"])

        drop(first, "a")
        run_incremental_dedup(
            spark, d["input"], d["index"], d["pairs"], d["ckpt"]
        ).awaitTermination(120)
        drop(second, "b")
        run_incremental_dedup(
            spark, d["input"], d["index"], d["pairs"], d["ckpt"]
        ).awaitTermination(120)

        got = {(r["doc_a"], r["doc_b"], r["jaccard"])
               for r in spark.read.parquet(d["pairs"]).collect()}
        all_df = spark.createDataFrame(pd.DataFrame(rows)[cols])
        full = {(r["doc_a"], r["doc_b"], r["jaccard"])
                for r in near_duplicates_minhash(all_df).collect()}
        assert got == full and len(full) > 0
        sigs = spark.read.parquet(d["index"])
        assert sigs.count() == len(rows)
        assert sigs.select("doc_id").distinct().count() == len(rows)
        # the persisted banded index (r4 #1) mirrors the signature table:
        # n_bands rows per doc, partitioned by bh_part for pruned reads
        bands = spark.read.parquet(d["index"].rstrip("/") + "_bands")
        assert "bh_part" in bands.columns
        assert bands.count() == len(rows) * 8
        assert bands.select("doc_id").distinct().count() == len(rows)


class TestMediaMetadata:
    """media_metadata: the header-only corpus-indexing tier — per-payload
    (format, typed-JSON meta) without any pixel/sample decode, F5
    quarantine on corrupt rows. Golden values cross-check each kernel's
    metadata parser against the ENCODER that produced the payload (dims,
    rates, durations known by construction)."""

    def _media_df(self, spark):
        import numpy as np

        from xwikire_spark.kernels.flaccodec import encode_flac
        from xwikire_spark.kernels.imagecodec import encode_png
        from xwikire_spark.kernels.jpegcodec import encode_jpeg
        from xwikire_spark.kernels.mp4codec import encode_mjpeg_mp4
        from xwikire_spark.kernels.wavcodec import encode_wav

        px = bytes(bytearray(range(72)))  # 6x4 RGB
        t = np.arange(8000) / 8000.0
        tone = (0.25 * np.sin(2 * np.pi * 440 * t)).astype(np.float64)
        mp3 = bytes([0xFF, 0xFB, 0x90, 0x00])
        mp3 += b"\xAA" * (144 * 128000 // 44100 - 4)
        aac_len = 7 + 100
        aac = bytes([0xFF, 0xF1, 0x50, 0x80 | (aac_len >> 11),
                     (aac_len >> 3) & 0xFF,
                     ((aac_len & 7) << 5) | 0x1F, 0xFC])
        aac += b"\xBB" * 100
        webp_bits = (64 - 1) | ((32 - 1) << 14)
        webp = (b"RIFF" + (4 + 8 + 5 + 1).to_bytes(4, "little")
                + b"WEBPVP8L" + (5).to_bytes(4, "little")
                + b"\x2f" + webp_bits.to_bytes(4, "little") + b"\x00")
        frames = [encode_jpeg(8, 8, 3, bytes(bytearray(192)))] * 3
        rows = [
            ("png1", "image", encode_png(6, 4, 3, px)),
            ("jpg1", "image", encode_jpeg(6, 4, 3, px)),
            ("wav1", "audio", encode_wav(8000, tone)),
            ("flac1", "audio", encode_flac(8000, tone)),
            ("mp31", "audio", mp3 * 10),
            ("aac1", "audio", aac * 10),
            ("webp1", "image", webp),
            ("mp41", "video", encode_mjpeg_mp4(8, 8, frames, fps=5)),
            ("bad1", "image", b"\x13\x37" * 20),
            ("empty1", "image", b""),
        ]
        return spark.createDataFrame(
            [(i, k, bytearray(p), None, None, None, None)
             for i, k, p in rows],
            "media_id string, kind string, payload binary, mime string, "
            "width int, height int, duration_ms int",
        )

    def test_formats_and_golden_meta(self, spark):
        import json

        from xwikire_spark.operators.multimodal import media_metadata

        got = {r["media_id"]: r
               for r in media_metadata(self._media_df(spark)).collect()}
        ok = {k: json.loads(v["meta"]) for k, v in got.items()
              if v["meta"] is not None}
        assert got["png1"]["format"] == "png"
        assert (ok["png1"]["width"], ok["png1"]["height"]) == (6, 4)
        assert ok["png1"]["channels"] == 3 and not ok["png1"]["palette"]
        assert got["jpg1"]["format"] == "jpeg"
        assert (ok["jpg1"]["width"], ok["jpg1"]["height"]) == (6, 4)
        assert not ok["jpg1"]["progressive"]
        assert got["wav1"]["format"] == "wav"
        assert ok["wav1"]["codec"] == "pcm"
        assert ok["wav1"]["sample_rate"] == 8000
        assert abs(ok["wav1"]["duration_sec"] - 1.0) < 1e-9
        assert got["flac1"]["format"] == "flac"
        assert ok["flac1"]["sample_rate"] == 8000
        assert abs(ok["flac1"]["duration_sec"] - 1.0) < 1e-9
        assert got["mp31"]["format"] == "mp3"
        assert ok["mp31"]["n_frames"] == 10
        assert ok["mp31"]["bitrate_kbps_mean"] == 128.0
        assert got["aac1"]["format"] == "aac"
        assert ok["aac1"]["n_frames"] == 10
        assert ok["aac1"]["profile"] == "LC"
        assert got["webp1"]["format"] == "webp"
        assert (ok["webp1"]["width"], ok["webp1"]["height"]) == (64, 32)
        assert got["mp41"]["format"] == "mp4"
        assert ok["mp41"]["codec"] == "jpeg"
        assert (ok["mp41"]["width"], ok["mp41"]["height"]) == (8, 8)
        assert ok["mp41"]["n_samples"] == 3

    def test_quarantine_rows(self, spark):
        from xwikire_spark.operators.multimodal import media_metadata

        got = {r["media_id"]: r
               for r in media_metadata(self._media_df(spark)).collect()}
        assert got["bad1"]["meta"] is None
        assert got["bad1"]["err"].startswith("meta_error:")
        assert got["empty1"]["err"] == "empty_payload"
        assert got["bad1"]["n_bytes"] == 40
        # quarantine never aborted the good rows
        assert sum(1 for r in got.values() if r["err"] is None) == 8

    def test_no_sample_decode_on_hot_path(self, spark, monkeypatch):
        """The indexing tier must stay header-only: poison every sample/
        pixel decoder and the operator still succeeds on every payload."""
        import xwikire_spark.kernels.flaccodec as fc
        import xwikire_spark.kernels.imagecodec as ic
        import xwikire_spark.kernels.jpegcodec as jc
        import xwikire_spark.kernels.wavcodec as wc
        from xwikire_spark.operators.multimodal import _media_info_bytes

        def boom(*a, **k):
            raise AssertionError("sample decode reached from metadata tier")

        monkeypatch.setattr(ic, "decode_image", boom)
        monkeypatch.setattr(ic, "decode_png", boom)
        monkeypatch.setattr(jc, "decode_jpeg", boom)
        monkeypatch.setattr(wc, "decode_wav", boom)
        monkeypatch.setattr(fc, "decode_flac", boom)
        # driver-side check of the same function the executor runs (the
        # monkeypatch cannot cross the Python-worker boundary)
        for r in self._media_df(spark).collect():
            b = bytes(r["payload"]) if r["payload"] is not None else b""
            if r["media_id"] in ("bad1", "empty1"):
                continue
            fmt, meta = _media_info_bytes(b)
            assert fmt is not None and meta


class TestAsofJoin:
    """operators/asof.py: backward-inclusive point-in-time join, checked
    against a brute-force range-join + row_number pick (the semantics
    DuckDB's native ASOF JOIN implements — also gated by the driver
    oracle evt_asof_join)."""

    def _frames(self, spark, seed=11):
        rng = random.Random(seed)
        left = [(i, rng.randrange(5), rng.randrange(1000))
                for i in range(200)]
        right = [(j, rng.randrange(5), rng.randrange(1000),
                  round(rng.random(), 6)) for j in range(150)]
        # dedup right per (key, t): asof tie-pick must be well-defined
        seen, rdedup = set(), []
        for j, k, t, v in right:
            if (k, t) not in seen:
                seen.add((k, t))
                rdedup.append((j, k, t, v))
        ldf = spark.createDataFrame(left, "lid bigint, k bigint, t bigint")
        rdf = spark.createDataFrame(
            rdedup, "rid bigint, k bigint, t bigint, v double"
        ).drop("rid")
        return ldf, rdf

    def _brute(self, ldf, rdf):
        from pyspark.sql import Window

        j = ldf.join(
            rdf.select(
                F.col("k"), F.col("t").alias("rt"), F.col("v")
            ),
            "k", "left",
        ).where(F.col("rt").isNull() | (F.col("rt") <= F.col("t")))
        w = Window.partitionBy("lid").orderBy(F.desc_nulls_last("rt"))
        best = (
            j.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("lid", "rt", "v")
        )
        # left rows whose every right candidate was filtered out
        return ldf.join(best, "lid", "left").select(
            "lid", "k", "t", F.col("v").alias("v_right"),
            F.col("rt").alias("t_right"),
        )

    def test_matches_brute_force(self, spark):
        from xwikire_spark.operators.asof import asof_join

        ldf, rdf = self._frames(spark)
        got = {
            (r["lid"], r["v_right"], r["t_right"])
            for r in asof_join(ldf, rdf, on="t", by="k").collect()
        }
        want = {
            (r["lid"], r["v_right"], r["t_right"])
            for r in self._brute(ldf, rdf).collect()
        }
        assert got == want and len(got) == 200

    def test_inclusive_at_equal_ts_and_no_match(self, spark):
        from xwikire_spark.operators.asof import asof_join

        ldf = spark.createDataFrame(
            [(1, 0, 100), (2, 0, 50)], "lid bigint, k bigint, t bigint"
        )
        rdf = spark.createDataFrame(
            [(0, 100, 7.0), (0, 99, 3.0)], "k bigint, t bigint, v double"
        )
        rows = {r["lid"]: r for r in
                asof_join(ldf, rdf, on="t", by="k").collect()}
        assert rows[1]["v_right"] == 7.0 and rows[1]["t_right"] == 100
        assert rows[2]["v_right"] is None and rows[2]["t_right"] is None

    def test_tolerance_nulls_stale_matches(self, spark):
        from xwikire_spark.operators.asof import asof_join

        ldf = spark.createDataFrame(
            [(1, 0, 100), (2, 0, 500)], "lid bigint, k bigint, t bigint"
        )
        rdf = spark.createDataFrame(
            [(0, 90, 1.0)], "k bigint, t bigint, v double"
        )
        rows = {r["lid"]: r for r in asof_join(
            ldf, rdf, on="t", by="k", tolerance=F.lit(50)
        ).collect()}
        assert rows[1]["v_right"] == 1.0      # 10 <= 50
        assert rows[2]["v_right"] is None     # 410 > 50

    def test_single_shuffle_no_range_join(self, spark):
        """The plan must be union+window — no BroadcastNestedLoopJoin /
        CartesianProduct and no join at all except the final identity
        projection; exactly the shuffles a groupBy(k) would cost."""
        from xwikire_spark.operators.asof import asof_join

        ldf, rdf = self._frames(spark)
        plan = asof_join(
            ldf, rdf, on="t", by="k"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan
        assert "Window" in plan


class TestSequencePacking:
    """operators/packing.py: the distributed two-phase prefix sum must
    equal the naive single-partition window for ANY partition count, and
    the plan must range-partition instead of funneling the corpus
    through one task."""

    def _docs(self, spark, n=500, seed=5):
        rng = random.Random(seed)
        return spark.createDataFrame(
            [(i, rng.randrange(1, 4000)) for i in range(n)],
            "doc_id bigint, n_tokens bigint",
        )

    def test_equals_naive_window(self, spark):
        from pyspark.sql import Window

        from xwikire_spark.operators.packing import pack_sequences

        df = self._docs(spark)
        budget = 2048
        w = Window.orderBy("doc_id").rowsBetween(
            Window.unboundedPreceding, -1
        )
        naive = df.withColumn(
            "before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        ).select(
            "doc_id",
            F.floor(F.col("before") / budget).alias("pack_id"),
            (F.col("before") % budget).alias("pack_offset"),
        )
        want = {(r["doc_id"], r["pack_id"], r["pack_offset"])
                for r in naive.collect()}
        for parts in (1, 3, 8, 32):
            got = {
                (r["doc_id"], r["pack_id"], r["pack_offset"])
                for r in pack_sequences(
                    df, "doc_id", "n_tokens", budget,
                    num_partitions=parts,
                ).collect()
            }
            assert got == want, f"mismatch at num_partitions={parts}"

    def test_plan_range_partitions_the_corpus(self, spark):
        from xwikire_spark.operators.packing import pack_sequences

        df = self._docs(spark)
        plan = pack_sequences(
            df, "doc_id", "n_tokens", 2048, num_partitions=8
        )._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning(doc_id" in plan
        # the only SinglePartition exchange feeds the per-partition totals
        # (8 rows), never the corpus: it must sit under the broadcast side
        assert plan.count("Exchange SinglePartition") <= 1

    def test_offsets_are_within_budget_and_contiguous(self, spark):
        from xwikire_spark.operators.packing import pack_sequences

        df = self._docs(spark, n=100)
        out = pack_sequences(df, "doc_id", "n_tokens", 1000).collect()
        rows = sorted(out, key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            assert r["pack_id"] == cum // 1000
            assert r["pack_offset"] == cum % 1000
            assert 0 <= r["pack_offset"] < 1000
            cum += r["n_tokens"]


class TestTfidfTopTerms:
    def test_hand_computed_corpus(self, spark):
        import math

        from xwikire_spark.operators.ranking import tfidf_top_terms

        docs = spark.createDataFrame(
            [("g1", "apple apple banana"), ("g2", "banana cherry")],
            "src string, text string",
        )
        got = {
            (r["src"], r["term"]): (r["tf"], r["df"], r["score"], r["rank"])
            for r in tfidf_top_terms(docs, "src", "text", k=2).collect()
        }
        ln2 = round(math.log(2.0), 6)
        assert got[("g1", "apple")] == (2, 1, round(2 * math.log(2.0), 6), 1)
        assert got[("g1", "banana")] == (1, 2, 0.0, 2)
        assert got[("g2", "cherry")] == (1, 1, ln2, 1)
        assert got[("g2", "banana")] == (1, 2, 0.0, 2)
        assert len(got) == 4


class TestProfileTable:
    """operators/profile.py: one-scan data-quality profile."""

    def _df(self, spark):
        return spark.createDataFrame(
            [(1, "a", 1.5), (2, None, 2.5), (3, "a", None), (4, "b", 4.0)],
            "id bigint, tag string, v double",
        )

    def test_stats_incl_nulls(self, spark):
        from xwikire_spark.operators.profile import profile_table

        got = {r["column"]: r for r in profile_table(self._df(spark)).collect()}
        assert got["id"]["n_rows"] == 4 and got["id"]["n_null"] == 0
        assert got["id"]["n_distinct"] == 4
        assert got["id"]["min_value"] == "1" and got["id"]["max_value"] == "4"
        assert got["tag"]["n_null"] == 1 and got["tag"]["n_distinct"] == 2
        assert got["tag"]["min_value"] == "a" and got["tag"]["max_value"] == "b"
        assert got["v"]["n_null"] == 1 and got["v"]["n_distinct"] == 3

    def test_single_scan_plan(self, spark, tmp_path):
        """However many columns are profiled, the parquet source appears
        in the executed plan exactly once."""
        from xwikire_spark.operators.profile import profile_table

        p = str(tmp_path / "t")
        self._df(spark).write.parquet(p)
        df = spark.read.parquet(p)
        plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("FileScan parquet") == 1

    def test_approx_mode_bounded_error(self, spark):
        from xwikire_spark.operators.profile import profile_table

        df = spark.range(10_000).select(
            F.col("id"), (F.col("id") % 100).alias("c")
        )
        got = {r["column"]: r for r in
               profile_table(df, approx=True).collect()}
        # HLL++ default rsd 5%
        assert abs(got["id"]["n_distinct"] - 10_000) <= 10_000 * 0.15
        assert abs(got["c"]["n_distinct"] - 100) <= 100 * 0.15


class TestTriangleCounts:
    """operators/graph_metrics.py: degree-oriented triangle enumeration
    vs an itertools brute force, plus shape cases (hub star = 0
    triangles, clique = C(n-1,2) each, duplicate/reversed/self-loop
    input hygiene)."""

    def _brute(self, edge_list):
        import itertools

        und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
        nodes = sorted({n for e in und for n in e})
        count = {n: 0 for n in nodes}
        for a, b, c in itertools.combinations(nodes, 3):
            if {(a, b), (a, c), (b, c)} <= und:
                for n in (a, b, c):
                    count[n] += 1
        return {n: c for n, c in count.items() if c}

    def test_random_graph_matches_brute_force(self, spark):
        rng = random.Random(7)
        edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(120)]
        # adversarial extras: duplicates, reversed copies, self-loops
        edges += [(b, a) for a, b in edges[:20]] + [(5, 5), (9, 9)]
        from xwikire_spark.operators.graph_metrics import triangle_counts

        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        got = {r["node"]: r["n_triangles"]
               for r in triangle_counts(df).collect()}
        assert got == self._brute(edges)

    def test_star_and_clique(self, spark):
        from xwikire_spark.operators.graph_metrics import triangle_counts

        star = [(0, i) for i in range(1, 50)]
        df = spark.createDataFrame(star, "src bigint, dst bigint")
        assert triangle_counts(df).count() == 0  # hub, no closures
        k = 8
        clique = [(i, j) for i in range(k) for j in range(i + 1, k)]
        got = {r["node"]: r["n_triangles"] for r in triangle_counts(
            spark.createDataFrame(clique, "src bigint, dst bigint")
        ).collect()}
        want = (k - 1) * (k - 2) // 2
        assert got == {i: want for i in range(k)}


class TestIncrementalPacking:
    """pack_sequences_incremental: 3 append-only drops == one full-batch
    packing (incl. a window straddling the drop boundary), retry after a
    crash-between-output-and-state duplicates/shifts nothing, and
    overlapping batches are rejected."""

    def _docs(self, spark, ids):
        # token count = pure function of the id, so any chunking of the
        # id range sees identical values
        return spark.createDataFrame(
            [(i, (i * 131 + 17) % 899 + 1) for i in ids],
            "doc_id bigint, n_tokens bigint",
        )

    def test_three_drops_equal_full_batch(self, spark, tmp_path):
        from xwikire_spark.operators.packing import (
            pack_sequences,
            pack_sequences_incremental,
        )

        sd = str(tmp_path / "pk")
        all_ids = list(range(300))
        full = {
            (r["doc_id"], r["pack_id"], r["pack_offset"])
            for r in pack_sequences(
                self._docs(spark, all_ids), "doc_id", "n_tokens", 512
            ).collect()
        }
        out = None
        for b, chunk in enumerate(
            (all_ids[:100], all_ids[100:180], all_ids[180:])
        ):
            out = pack_sequences_incremental(
                self._docs(spark, chunk), sd, "doc_id", "n_tokens",
                512, batch_id=b,
            )
        got = {(r["doc_id"], r["pack_id"], r["pack_offset"])
               for r in out.collect()}
        assert got == full

    def test_crash_retry_is_idempotent(self, spark, tmp_path):
        import json
        import os

        from xwikire_spark.operators.packing import (
            pack_sequences,
            pack_sequences_incremental,
        )

        sd = str(tmp_path / "pk")
        ids = list(range(200))
        pack_sequences_incremental(
            self._docs(spark, ids[:120]), sd, "doc_id", "n_tokens",
            512, batch_id=0,
        )
        state_p = os.path.join(sd, "pack_state.json")
        saved = open(state_p).read()
        pack_sequences_incremental(
            self._docs(spark, ids[120:]), sd, "doc_id", "n_tokens",
            512, batch_id=1,
        )
        # CRASH simulation: batch 1's output landed but the state write
        # didn't — roll the state file back and retry the same batch
        with open(state_p, "w") as f:
            f.write(saved)
        out = pack_sequences_incremental(
            self._docs(spark, ids[120:]), sd, "doc_id", "n_tokens",
            512, batch_id=1,
        )
        full = {
            (r["doc_id"], r["pack_id"], r["pack_offset"])
            for r in pack_sequences(
                self._docs(spark, ids), "doc_id", "n_tokens", 512
            ).collect()
        }
        got = {(r["doc_id"], r["pack_id"], r["pack_offset"])
               for r in out.collect()}
        assert got == full
        assert out.count() == 200  # no duplicated rows from the retry
        assert json.load(open(state_p))["max_order"] == 199

    def test_overlapping_batch_rejected(self, spark, tmp_path):
        import pytest as _pytest

        from xwikire_spark.operators.packing import (
            pack_sequences_incremental,
        )

        sd = str(tmp_path / "pk")
        pack_sequences_incremental(
            self._docs(spark, list(range(50))), sd, "doc_id",
            "n_tokens", 512, batch_id=0,
        )
        with _pytest.raises(ValueError):
            pack_sequences_incremental(
                self._docs(spark, [49, 50]), sd, "doc_id",
                "n_tokens", 512, batch_id=1,
            )


class TestWeightedSample:
    """operators/sampling.py: A-Res weighted sampling — exactness vs a
    python recomputation of the same keys, weight bias direction, and
    the no-single-partition plan contract for the unstratified path."""

    def _keys(self, ids, weights):
        import math

        out = {}
        for i, w in zip(ids, weights):
            u = ((i * 2654435761) % 4294967296 + 0.5) / 4294967296.0
            out[i] = math.log(u) / w
        return out

    def test_matches_python_topk(self, spark):
        from xwikire_spark.operators.sampling import weighted_sample

        ids = list(range(500))
        weights = [(i % 7) + 1 for i in ids]
        df = spark.createDataFrame(
            list(zip(ids, weights)), "id bigint, w bigint"
        )
        got = [
            r["id"]
            for r in weighted_sample(df, "w", 20, "id")
            .orderBy("sample_rank").collect()
        ]
        keys = self._keys(ids, weights)
        want = sorted(ids, key=lambda i: (-keys[i], i))[:20]
        assert got == want

    def test_heavy_weights_overrepresented(self, spark):
        from xwikire_spark.operators.sampling import weighted_sample

        # 1000 light (w=1) + 1000 heavy (w=25); a 200-row sample should
        # skew heavily toward the heavy group
        rows = [(i, 1) for i in range(1000)]
        rows += [(i, 25) for i in range(1000, 2000)]
        df = spark.createDataFrame(rows, "id bigint, w bigint")
        got = weighted_sample(df, "w", 200, "id").collect()
        heavy = sum(1 for r in got if r["id"] >= 1000)
        assert heavy > 160  # expected ~192; deterministic draw

    def test_stratified_counts_and_plan(self, spark):
        from xwikire_spark.operators.sampling import weighted_sample

        rows = [(i, i % 3, (i % 5) + 1) for i in range(300)]
        df = spark.createDataFrame(rows, "id bigint, s int, w bigint")
        out = weighted_sample(df, "w", 7, "id", strata_col="s")
        counts = {r["s"]: r["n"] for r in
                  out.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert counts == {0: 7, 1: 7, 2: 7}
        # unstratified: TakeOrderedAndProject, no SinglePartition exchange
        # over the corpus
        plan = weighted_sample(
            df, "w", 7, "id"
        )._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestChunkDocuments:
    """operators/chunking.py: overlap contract, full coverage, short
    final chunk, empty-doc exclusion, and the oracle layout."""

    def test_layout_contract(self, spark):
        from xwikire_spark.operators.chunking import chunk_documents

        words = [f"w{i}" for i in range(10)]
        df = spark.createDataFrame(
            [(1, " ".join(words)), (2, "a b"), (3, "   ")],
            "doc_id bigint, text string",
        )
        out = chunk_documents(
            df, chunk_tokens=4, overlap=1, id_cols=["doc_id"]
        ).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # doc 3 (whitespace-only) produces nothing
        assert set(by_doc) == {1, 2}
        d1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
        # step=3: starts 0,3,6,9 -> 4 chunks; last is short
        assert [r["chunk_text"] for r in d1] == [
            "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9", "w9",
        ]
        assert [r["n_tokens"] for r in d1] == [4, 4, 4, 1]
        # consecutive chunks share exactly `overlap` tokens
        for a, b in zip(d1, d1[1:]):
            ta, tb = a["chunk_text"].split(), b["chunk_text"].split()
            assert ta[-1:] == tb[:1]
        # coverage: concatenating with overlap removed rebuilds the doc
        rebuilt = d1[0]["chunk_text"].split()
        for r in d1[1:]:
            rebuilt += r["chunk_text"].split()[1:]
        assert rebuilt == words
        assert by_doc[2][0]["chunk_text"] == "a b"
        assert by_doc[2][0]["n_tokens"] == 2

    def test_bad_overlap_rejected(self, spark):
        import pytest as _pytest

        from xwikire_spark.operators.chunking import chunk_documents

        df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
        for chunk, ov in ((4, 4), (4, 5), (4, -1)):
            with _pytest.raises(ValueError):
                chunk_documents(df, chunk_tokens=chunk, overlap=ov)

    def test_all_jvm_no_python(self, spark):
        from xwikire_spark.operators.chunking import chunk_documents

        df = spark.createDataFrame(
            [(i, "lorem ipsum dolor sit amet " * 20) for i in range(50)],
            "doc_id bigint, text string",
        )
        plan = chunk_documents(
            df
        )._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan
        assert "MapInPandas" not in plan
        assert "BatchEvalPython" not in plan


class TestExactGroupQuantiles:
    def test_matches_numpy_type1(self, spark):
        import math

        from xwikire_spark.operators.quantiles import exact_group_quantiles

        rng = random.Random(23)
        rows = [(i, i % 3, rng.randrange(1000)) for i in range(500)]
        df = spark.createDataFrame(rows, "id bigint, g int, v bigint")
        got = {(r["g"], r["q"]): r["value"] for r in exact_group_quantiles(
            df, "v", "g", [0.1, 0.5, 0.9, 1.0], tiebreak_col="id"
        ).collect()}
        by_g = {}
        for _i, g, v in rows:
            by_g.setdefault(g, []).append(v)
        for g, vs in by_g.items():
            vs.sort()
            for q in (0.1, 0.5, 0.9, 1.0):
                assert got[(g, q)] == vs[math.ceil(q * len(vs)) - 1]
        assert len(got) == 12

    def test_non_dyadic_q_exact_rank(self, spark):
        """ADVICE r6: double ceil(q*n) diverges from exact rational
        arithmetic for non-dyadic q (0.07 * 100 -> 7.000000000000001 ->
        rank 8 instead of 7). The rank must follow the exact rational the
        decimal literal denotes."""
        from fractions import Fraction
        from math import ceil

        from xwikire_spark.operators.quantiles import exact_group_quantiles

        n = 100
        df = spark.createDataFrame(
            [(i, 0, i) for i in range(1, n + 1)], "id bigint, g int, v bigint"
        )
        qs = [0.07, 0.3, 0.55, 0.1]
        got = {r["q"]: r["value"] for r in exact_group_quantiles(
            df, "v", "g", qs, tiebreak_col="id"
        ).collect()}
        for q in qs:
            fr = Fraction(str(q))
            exact_rank = ceil(fr * n)  # Fraction arithmetic is exact
            assert got[q] == exact_rank, (q, got[q], exact_rank)
        # the documented divergence case: double gives 8, exact gives 7
        assert got[0.07] == 7

    def test_duplicates_and_bad_q(self, spark):
        import pytest as _pytest

        from xwikire_spark.operators.quantiles import exact_group_quantiles

        df = spark.createDataFrame(
            [(i, 0, 7) for i in range(10)], "id bigint, g int, v bigint"
        )
        got = exact_group_quantiles(
            df, "v", "g", [0.5], tiebreak_col="id"
        ).collect()
        assert len(got) == 1 and got[0]["value"] == 7
        for bad in ([], [0.0], [1.5]):
            with _pytest.raises(ValueError):
                exact_group_quantiles(df, "v", "g", bad)
