"""End-to-end integration: the full QA-dataset construction chain over the
synthetic transcript corpus — extraction -> QA positives -> pairwise
negatives -> template assembly -> JSONL round-trip (the qa.py entry path,
SURVEY §3.2)."""

import pandas as pd
from pyspark.sql import functions as F

from xwikire_spark import datagen
from xwikire_spark.pipeline.extraction import extract_triples
from xwikire_spark.pipeline.negatives import generate_negatives
from xwikire_spark.pipeline.qa import assemble_qa_examples
from xwikire_spark.sources.io import read_jsonl, write_jsonl


def test_full_qa_chain(spark, tmp_path):
    rows, _ = datagen.generate_transcripts(n_convs=30, turns_per_conv=10)
    transcripts = spark.createDataFrame(pd.DataFrame(rows))
    alias_df = spark.createDataFrame(pd.DataFrame(datagen.alias_rows()))
    pred_df = spark.createDataFrame(pd.DataFrame(datagen.predicate_rows()))

    # 1. distant-supervision triples -> QA positive rows
    triples = extract_triples(transcripts, alias_df, pred_df)
    positives = triples.select(
        "conv_id",
        F.lit("wikibase").alias("type"),
        F.col("pred").alias("prop_id"),
        F.col("pred_surface").alias("relation"),
        F.col("evidence").alias("sentence"),
        F.col("obj_surface").alias("answer"),
        "id",
        F.col("subj_surface").alias("entity_label"),
        F.lit("").alias("entity_article"),
        F.lit("positive").alias("example"),
    )
    n_pos = positives.count()
    assert n_pos > 50

    # 2. within-conversation pairwise negatives (J5)
    negatives = generate_negatives(positives)
    n_neg = negatives.count()
    assert n_neg > 0
    # negatives borrow the OTHER example's sentence and have empty answers
    assert negatives.where(F.col("answer") != "").count() == 0

    # 3. template assembly over the union
    templates = spark.createDataFrame(pd.DataFrame(
        [{"prop_id": p, "template": f"What is {l} of XXX?"}
         for p, l, _ in datagen.PREDICATES]))
    all_rows = positives.unionByName(
        negatives.select(
            "conv_id", "type", "prop_id", "relation", "sentence",
            "answer", "id", "example",
        )
        .withColumn("entity_label", F.lit("entity"))
        .withColumn("entity_article", F.lit("")),
    )
    examples = assemble_qa_examples(all_rows, templates)

    pos_ex = examples.where(F.col("example") == "positive")
    neg_ex = examples.where(F.col("example") == "negative")
    assert pos_ex.count() > 0 and neg_ex.count() > 0
    # every surviving positive's span really covers the answer (X6)
    bad = pos_ex.where(
        F.expr("substring(context, start_index + 1, "
               "end_index - start_index) != answer")
    ).count()
    assert bad == 0
    assert neg_ex.where(F.col("na") != 0).count() == 0

    # 4. JSONL export/ingest round-trip (S7)
    out = str(tmp_path / "qa.jsonl")
    write_jsonl(examples, out)
    back = read_jsonl(spark, out)
    assert back.count() == examples.count()
    assert set(back.columns) == set(examples.columns)
