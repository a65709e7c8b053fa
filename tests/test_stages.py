"""Tests for the remaining pipeline stages: negatives (J5), QA assembly
(J4/X6/X14), typed facts (MergedWikis), WikiReading locations, I/O formats,
incremental streaming, multimodal plumbing."""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from xwikire_spark.pipeline.facts import build_facts, universal_schema_export
from xwikire_spark.pipeline.negatives import generate_negatives
from xwikire_spark.pipeline.qa import assemble_qa_examples
from xwikire_spark.pipeline.wikireading import (
    answer_locations,
    tokenize_documents,
)


class TestNegatives:
    @pytest.fixture(scope="class")
    def positives(self, spark):
        rows = [
            # conv c1, type wikibase: three positives, two props
            dict(conv_id="c1", type="wikibase", prop_id="P19",
                 relation="born in", sentence="A was born in X.",
                 answer="X", id="q1"),
            dict(conv_id="c1", type="wikibase", prop_id="P20",
                 relation="died in", sentence="A died in Y.",
                 answer="Y", id="q2"),
            dict(conv_id="c1", type="wikibase", prop_id="P19",
                 relation="born in", sentence="B was born in Y near X.",
                 answer="Y", id="q3"),
        ]
        return spark.createDataFrame(pd.DataFrame(rows))

    def test_pair_semantics(self, spark, positives):
        negs = generate_negatives(positives).collect()
        got = {(n.source_a, n.source_b) for n in negs}
        # (q1,q2): P19 vs P20, 'X' not in 'A died in Y.' -> negative
        assert ("q1", "q2") in got
        # (q1,q3): same prop -> skipped
        assert ("q1", "q3") not in got
        # (q2,q3): P20 vs P19, 'Y' IS in q3's sentence -> skipped
        assert ("q2", "q3") not in got

    def test_negative_id_is_reference_sha1(self, spark, positives):
        neg = generate_negatives(positives).collect()[0]
        want = hashlib.sha1("q1 P19 q2".encode()).hexdigest()
        assert neg.id == want  # src/builders/QA.py:103 id scheme
        assert neg.example == "negative"
        assert neg.answer == ""
        assert neg.sentence == "A died in Y."  # b's sentence


class TestQAAssembly:
    def test_examples(self, spark):
        qa = spark.createDataFrame(pd.DataFrame([
            dict(prop_id="P19", relation="born in",
                 sentence="Einstein was born in Ulm.", answer="Ulm",
                 id="x1", example="positive", entity_label="Einstein",
                 entity_article=""),
            dict(prop_id="P19", relation="born in",
                 sentence="Some other evidence.", answer="",
                 id="x2", example="negative", entity_label="Einstein",
                 entity_article=""),
            dict(prop_id="P99", relation="off-list",
                 sentence="Einstein knew Bohr.", answer="Bohr",
                 id="x3", example="positive", entity_label="Einstein",
                 entity_article=""),
        ]))
        templates = spark.createDataFrame(pd.DataFrame([
            dict(prop_id="P19", template="Where was XXX born?"),
            dict(prop_id="P19", template="What is the birthplace of XXX?"),
        ]))
        whitelist = spark.createDataFrame(pd.DataFrame([
            dict(prop_id="P19")]))
        out = assemble_qa_examples(qa, templates, whitelist).collect()
        # P99 filtered (F3); positives x 2 templates + negatives x 2
        assert {r.prop_id for r in out} == {"P19"}
        pos = [r for r in out if r.example == "positive"]
        neg = [r for r in out if r.example == "negative"]
        assert len(pos) == 2 and len(neg) == 2
        p = pos[0]
        # X6 char span: context.index(answer) semantics (QA.py:149-153)
        assert p.context[p.start_index:p.end_index] == "Ulm"
        assert p.na == 1
        assert p.question in {"Where was Einstein born?",
                              "What is the birthplace of Einstein?"}
        assert neg[0].start_index == -1 and neg[0].na == 0


class TestFacts:
    @pytest.fixture(scope="class")
    def built(self, spark):
        claims = spark.createDataFrame(pd.DataFrame([
            dict(claim_id="c1", entity_id="Q1", pid="P1", datatype="string",
                 string_type="string", string_value="  hello  ",
                 object_id=None, amount=None, unit_uri=None, raw_time=None,
                 precision=None),
            dict(claim_id="c2", entity_id="Q1", pid="P2", datatype="string",
                 string_type="external-id", string_value="X99",
                 object_id=None, amount=None, unit_uri=None, raw_time=None,
                 precision=None),
            dict(claim_id="c3", entity_id="Q1", pid="P3",
                 datatype="wikibase-entityid", string_type=None,
                 string_value=None, object_id="Q2", amount=None,
                 unit_uri=None, raw_time=None, precision=None),
            dict(claim_id="c4", entity_id="Q1", pid="P4", datatype="quantity",
                 string_type=None, string_value=None, object_id=None,
                 amount="+42",
                 unit_uri="http://www.wikidata.org/entity/Q11573",
                 raw_time=None, precision=None),
            dict(claim_id="c5", entity_id="Q1", pid="P5", datatype="time",
                 string_type=None, string_value=None, object_id=None,
                 amount=None, unit_uri=None,
                 raw_time="+00000001920-01-01T00:00:00Z", precision=11),
        ]))
        entities = spark.createDataFrame(pd.DataFrame([
            dict(entity_id="Q1", label="Subject", aliases=["S"]),
            dict(entity_id="Q2", label="Object Label", aliases=["O"]),
            dict(entity_id="Q11573", label="metre", aliases=[]),
        ]))
        facts = build_facts(claims, entities)
        return {r.pid: r for r in facts.collect()}, facts, entities, spark

    def test_string_fact(self, built):
        by_pid, *_ = built
        # trimmed, id == value (MergedWikis.py:156-160)
        assert by_pid["P1"].value == "hello"
        assert by_pid["P1"].value_id == "hello"
        assert by_pid["P1"].value_type == "value"

    def test_external_id_dropped(self, built):
        by_pid, *_ = built
        assert "P2" not in by_pid  # F2 (MergedWikis.py:53-55)

    def test_wikibase_fact(self, built):
        by_pid, *_ = built
        assert by_pid["P3"].value == "Object Label"
        assert by_pid["P3"].value_id == "Q2"

    def test_quantity_fact(self, built):
        by_pid, *_ = built
        # '+' stripped, unit label appended, id = amount + unit id
        # (MergedWikis.py:168-175)
        assert by_pid["P4"].value == "42 metre"
        assert by_pid["P4"].value_id == "42Q11573"

    def test_time_fact(self, built):
        by_pid, *_ = built
        assert by_pid["P5"].value == "1 January 1920"
        assert by_pid["P5"].value_id == "+00000001920-01-01T00:00:00Z"

    def test_universal_schema(self, built):
        _, facts, entities, spark = built
        props = spark.createDataFrame(pd.DataFrame([
            dict(pid=p, label=f"label-{p}", aliases=[]) for p in
            ["P1", "P3", "P4", "P5"]]))
        us = universal_schema_export(facts, entities, props).collect()
        row = {r.property_id: r for r in us}["P3"]
        want = hashlib.sha1("Q1 P3 Q2".encode()).hexdigest()
        assert row.id == want  # src/universal_schema.py:12-14
        assert row.entity_label == "Subject"
        assert row.value_label == "Object Label"


class TestWikiReading:
    def test_tokenize_and_locations(self, spark):
        docs = spark.createDataFrame(pd.DataFrame([
            dict(entity_id="Q1",
                 text="Alpha beta gamma. Beta gamma delta!\n\nNew para."),
        ]))
        facts = spark.createDataFrame(pd.DataFrame([
            dict(entity_id="Q1", pid="P2", value="beta gamma"),
            dict(entity_id="Q1", pid="P1", value="gamma"),
        ]))
        tk = tokenize_documents(docs)
        row = tk.first()
        assert row.string_sequence[:3] == ["Alpha", "beta", "gamma"]
        assert len(row.string_sequence) == len(row.break_levels)
        assert row.sentence_breaks and row.paragraph_breaks

        loc = answer_locations(tk, facts).collect()
        # A9: only the FIRST property (P1 sorts before P2) is emitted
        assert {r.pid for r in loc} == {"P1"}
        r = loc[0]
        # 'gamma' occurs at token idx 2 and 5
        assert r.answer_location == [2, 5]
        assert r.full_match_answer_location == [[2], [5]]

    def test_empty_answer_yields_no_matches(self, spark):
        # a value that tokenizes to zero tokens must emit NO spans, not
        # vacuous full-table matches (find_full_matches empty-sublist
        # contract)
        docs = spark.createDataFrame(pd.DataFrame([
            dict(entity_id="Q1", text="Alpha beta gamma."),
        ]))
        facts = spark.createDataFrame(pd.DataFrame([
            dict(entity_id="Q1", pid="P1", value="   "),
        ]))
        r = answer_locations(tokenize_documents(docs), facts).first()
        assert r.answer_location == []
        assert r.full_match_answer_location == []


class TestIO:
    def test_jsonl_round_trip(self, spark, tmp_path):
        from xwikire_spark.sources.io import read_jsonl, write_jsonl

        df = spark.createDataFrame(pd.DataFrame([
            dict(id="a", text="héllo wörld"), dict(id="b", text="ಕನ್ನಡ")]))
        p = str(tmp_path / "out.jsonl")
        write_jsonl(df, p)
        back = read_jsonl(spark, p)
        assert {(r.id, r.text) for r in back.collect()} == {
            ("a", "héllo wörld"), ("b", "ಕನ್ನಡ")}

    def test_templates_csv(self, spark, tmp_path):
        from xwikire_spark.sources.io import read_templates_csv

        p = tmp_path / "templates.csv"
        p.write_text(
            "P19,born,eng,google,Where was XXX born?\n"
            "P19,born,eng,google,\n"
            "P20,died,eng,google,Where did XXX die?\n",
            encoding="utf8",
        )
        t = read_templates_csv(spark, str(p)).collect()
        assert {(r.prop_id, r.template) for r in t} == {
            ("P19", "Where was XXX born?"), ("P20", "Where did XXX die?")}

    def test_conll_sink(self, spark, tmp_path):
        from xwikire_spark.sources.io import write_conll

        df = spark.createDataFrame(pd.DataFrame([
            dict(tokens=["A", "b", "."], tags=["DT", "NN", "."]),
        ]))
        p = str(tmp_path / "conll")
        write_conll(df, p)
        text = spark.read.text(p).collect()
        vals = [r.value for r in text]
        assert "A\tDT" in vals and "b\tNN" in vals

    def test_squad_source(self, spark, tmp_path):
        from xwikire_spark.sources.io import read_squad_json

        p = tmp_path / "squad.json"
        p.write_text(
            '{"data": [{"paragraphs": [{"qas": '
            '[{"question": "Who?", "id": "q-1"}]}]}]}',
            encoding="utf8",
        )
        rows = read_squad_json(spark, str(p)).collect()
        assert [(r.question, r.q_id) for r in rows] == [("Who?", "q-1")]


class TestStreaming:
    def test_available_now_incremental(self, spark, tmp_path):
        from xwikire_spark import datagen
        from xwikire_spark.streaming.incremental import run_available_now

        rows, _ = datagen.generate_transcripts(n_convs=10, turns_per_conv=6)
        # input_hint schema says int32; pandas gives int64 — cast to match
        # the stream reader's declared TRANSCRIPT_SCHEMA
        df = spark.createDataFrame(pd.DataFrame(rows)).withColumn(
            "turn_idx", F.col("turn_idx").cast("int"))
        al = spark.createDataFrame(pd.DataFrame(datagen.alias_rows()))
        pr = spark.createDataFrame(pd.DataFrame(datagen.predicate_rows()))

        inp = str(tmp_path / "in")
        out = str(tmp_path / "out")
        ck = str(tmp_path / "ck")
        df.where(F.col("conv_id") < "conv-00005").write.parquet(
            inp, mode="append")
        q = run_available_now(spark, inp, out, ck, al, pr)
        q.awaitTermination(120)
        n1 = spark.read.parquet(out).count()
        assert n1 > 0

        # new files arrive; second run processes ONLY them
        df.where(F.col("conv_id") >= "conv-00005").write.parquet(
            inp, mode="append")
        q = run_available_now(spark, inp, out, ck, al, pr)
        q.awaitTermination(120)
        got = spark.read.parquet(out)
        n2 = got.count()
        assert n2 > n1
        # no duplicate processing: every (conv, triple) appears once
        assert got.groupBy("id", "conv_id", "turn_idx", "sent_idx").count() \
            .where(F.col("count") > 1).count() == 0



    def test_watermarked_windowed_counts_append_mode(self, spark, tmp_path):
        """streaming/windowed.py: tumbling-window counts with a watermark
        in APPEND mode. Pins the REAL (measured) Spark semantics:

        - a window is emitted exactly once, at the end of the first
          batch whose watermark passes its end;
        - a late row is dropped iff its window was already evicted in a
          PRIOR batch (predicate: window end <= wm, one-batch lag) —
          NOT merely because its event time trails the watermark: a
          late row whose window is still in state merges.

        One availableNow run, maxFilesPerTrigger=1, file mtimes forced
        increasing -> deterministic batches: wm(batch N) derives from
        data through batch N-1; eviction at end of batch N uses
        wm(batch N)."""
        import datetime as dt
        import os
        import time as _time

        from xwikire_spark.streaming.windowed import (
            run_windowed_counts,
            windowed_turn_counts,
        )

        (tmp_path / "win_in").mkdir()
        inp, out, ck = (str(tmp_path / d) for d in
                        ("win_in", "win_out", "win_ck"))

        def drop(name, ts_list, order):
            p = str(tmp_path / "win_in" / f"{name}.parquet")
            pd.DataFrame({
                "conv_id": ["c1"] * len(ts_list),
                "ts": [dt.datetime(2026, 1, 1, h, m) for h, m in ts_list],
            }).to_parquet(
                # pandas defaults to ns timestamps, which Spark's µs
                # TIMESTAMP reader rejects outright
                p, coerce_timestamps="us",
            )
            # the file source processes oldest-mtime first: pin the order
            t = _time.time() + order * 10
            os.utime(p, (t, t))

        # batch 0 (wm 0): W0=[9,10) x2, W1=[10,11) x2, W2=[11,12) x1
        drop("a", [(9, 10), (9, 20), (10, 10), (10, 20), (11, 10)], 0)
        # batch 1 (wm 10:39): 11:20 merges W2; 12:29 opens W3; end of
        # batch evicts W0 -> emitted n=2
        drop("b", [(11, 20), (12, 29)], 1)
        # batch 2 (wm 11:58): 9:30 targets the ALREADY-EVICTED W0 ->
        # DROPPED; 10:30 trails the wm but W1 is still in state ->
        # MERGES (n=3); 14:00 advances wm; end of batch evicts W1
        drop("c", [(9, 30), (10, 30), (14, 0)], 2)
        # batch 3 (no-data, wm 13:29): evicts W2 (n=2) and W3 (n=1)

        stream = (spark.readStream
                  .schema("conv_id string, ts timestamp")
                  .option("maxFilesPerTrigger", 1).parquet(inp))
        q = run_windowed_counts(stream, out, ck, window="1 hour",
                                delay="31 minutes")
        q.awaitTermination(120)

        got = {(r["window_start"].hour, r["n_turns"])
               for r in spark.read.parquet(out).collect()}
        # W0 = 2: the finalized-window late row was dropped
        # W1 = 3: the open-window late row merged
        # W4 (14:00) still open -> absent; nothing emitted twice
        assert got == {(9, 2), (10, 3), (11, 2), (12, 1)}
        assert spark.read.parquet(out).count() == 4
        # the drop is visible in the state-operator metrics
        dropped = sum(
            (p["stateOperators"][0].get("numRowsDroppedByWatermark") or 0)
            for p in q.recentProgress if p["stateOperators"]
        )
        assert dropped == 1

        # batch parity of the aggregate itself (no watermark in batch
        # mode): W0 counts its late row too
        batch = windowed_turn_counts(
            spark.read.schema("conv_id string, ts timestamp").parquet(inp))
        bgot = {(r["window_start"].hour, r["n_turns"])
                for r in batch.collect()}
        assert bgot == {(9, 3), (10, 3), (11, 2), (12, 1), (14, 1)}

    def test_stateful_sessionize_stream(self, spark, tmp_path):
        """applyInPandasWithState gap sessionization: a session row is
        emitted exactly once, when the event-time watermark passes its
        last event + gap."""
        import datetime as dt

        from xwikire_spark.streaming.sessionize import sessionize_stream

        t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

        def mk(rows):
            return pd.DataFrame(
                {"user_id": [r[0] for r in rows],
                 "ts": [t0 + dt.timedelta(minutes=r[1]) for r in rows]}
            )

        inp = str(tmp_path / "ev_in")
        # file 1: user 1 has two events 10 min apart (one session);
        # user 2 one event (coalesce(1): one FILE = one micro-batch)
        spark.createDataFrame(mk([(1, 0), (1, 10), (2, 0)])).coalesce(
            1).write.parquet(inp, mode="append")
        # file 2: much later events — advances the watermark in batch 2
        spark.createDataFrame(mk([(1, 180), (2, 185)])).coalesce(
            1).write.parquet(inp, mode="append")
        # file 3: even later — batch 3's watermark closes file-1 sessions
        spark.createDataFrame(mk([(3, 360)])).coalesce(1).write.parquet(
            inp, mode="append")

        stream = (
            spark.readStream.schema("user_id bigint, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(inp)
        )
        sessions = sessionize_stream(stream, gap_seconds=1800,
                                     watermark="30 minutes")
        q = (
            sessions.writeStream.format("memory")
            .queryName("sess_test")
            .outputMode("append")
            .option(
                "checkpointLocation", str(tmp_path / "sess_ck")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r.user_id, r.session_seq): (r.n_events,
                                         r.session_end_epoch
                                         - r.session_start_epoch)
            for r in spark.sql("SELECT * FROM sess_test").collect()
        }
        # the two file-1 sessions must have closed, exactly once each
        assert got[(1, 1)] == (2, 600)  # 2 events, 10-minute span
        assert got[(2, 1)] == (1, 0)


class TestMultimodal:
    def test_fake_decode_plumbing(self, spark):
        from xwikire_spark.operators.multimodal import extract_media_features

        media = spark.createDataFrame(
            [("m1", "image", bytearray(b"\x01\x02\x03"), "image/png",
              2, 2, None),
             ("m2", "image", bytearray(b""), "image/png", 0, 0, None)],
            "media_id string, kind string, payload binary, mime string, "
            "width int, height int, duration_ms int",
        )
        feats = extract_media_features(media, fake=True).collect()
        by_id = {r.media_id: r for r in feats}
        assert by_id["m1"].n_bytes == 3
        assert len(by_id["m1"].feat) == 8
        assert by_id["m1"].sha1 == hashlib.sha1(b"\x01\x02\x03").hexdigest()

    def test_real_decode_is_stubbed(self, spark):
        from xwikire_spark.operators.multimodal import _decode_image_bytes

        with pytest.raises(NotImplementedError):
            _decode_image_bytes(b"x", fake=False)

    def test_frame_sample_plan(self, spark):
        from xwikire_spark.operators.multimodal import frame_sample_plan

        media = spark.createDataFrame(
            [("v1", "video", None, "video/mp4", None, None, 3500)],
            "media_id string, kind string, payload binary, mime string, "
            "width int, height int, duration_ms int",
        )
        rows = frame_sample_plan(media, every_ms=1000).collect()
        assert [r.sample_ms for r in rows] == [0, 1000, 2000, 3000]

    def test_resize_plumbing(self, spark):
        from xwikire_spark.operators.multimodal import resize_images

        media = spark.createDataFrame(
            [("m1", "image", bytearray(b"\x10\x20"), "image/png", 100, 80,
              None),
             ("m2", "audio", bytearray(b"\x01"), "audio/wav", None, None,
              2000)],
            "media_id string, kind string, payload binary, mime string, "
            "width int, height int, duration_ms int",
        )
        out = {r.media_id: r for r in
               resize_images(media, 16, 8).collect()}
        img = out["m1"]
        assert (img.width, img.height) == (16, 8)
        assert len(bytes(img.payload)) == 16 * 8
        # deterministic fake payload
        again = {r.media_id: r for r in
                 resize_images(media, 16, 8).collect()}
        assert bytes(again["m1"].payload) == bytes(img.payload)
        # non-image rows pass through untouched
        assert bytes(out["m2"].payload) == b"\x01"
