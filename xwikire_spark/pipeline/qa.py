"""QA-example assembly — the reference's extract_examples path
(src/builders/QA.py:120-168): property whitelist (F3) -> question-template
join (J4) -> template filling (X14) -> answer char spans (X6) -> flat
training rows.

Spark shape: the two full Mongo re-scans (positive + negative,
src/qa.py:51-52) collapse into ONE DataFrame filtered by the ``example``
column; the 1,148-row template dimension is a broadcast row-multiplying
inner join (src/resources/templates/templates_en.csv)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xwikire_spark.functions.text import answer_char_span
from xwikire_spark.functions.udfs import make_fill_template_udf


def assemble_qa_examples(
    qa_rows: DataFrame,
    templates: DataFrame,
    prop_whitelist: DataFrame | None = None,
    lang: str = "en",
) -> DataFrame:
    """qa_rows: (conv_id|entity_id, entity_label, entity_article, prop_id,
    relation, sentence, answer, id, example) x templates: (prop_id,
    template) -> flat QA examples (reference flat export shape,
    src/builders/QA.py:144-166).

    Positives get (start_index, end_index, na=1); rows whose answer is not
    found in the context are DROPPED like the reference's try/except skip
    (src/builders/QA.py:148-159). Negatives get (-1, -1, na=0).
    """
    rows = qa_rows
    if prop_whitelist is not None:
        # F3: whitelist semi-join (the Levy et al. 119-prop list analog)
        rows = rows.join(
            F.broadcast(prop_whitelist.select("prop_id")), "prop_id",
            "left_semi",
        )

    fill = make_fill_template_udf(lang)
    joined = rows.join(F.broadcast(templates), "prop_id").withColumn(
        "question",
        fill(
            F.col("template"),
            F.col("entity_label"),
            F.coalesce(F.col("entity_article"), F.lit("")),
        ),
    )

    start, end = answer_char_span("sentence", "answer")
    examples = joined.select(
        F.col("sentence").alias("context"),
        "id",
        "prop_id",
        F.col("relation").alias("property"),
        "template",
        F.col("entity_label").alias("entity"),
        "answer",
        "question",
        "example",
        start.alias("start_index"),
        end.alias("end_index"),
    )
    positives = (
        examples.where(F.col("example") == "positive")
        .where(F.col("start_index") >= 0)  # reference skips unfound answers
        .withColumn("na", F.lit(1))
    )
    negatives = (
        examples.where(F.col("example") == "negative")
        .withColumn("start_index", F.lit(-1))
        .withColumn("end_index", F.lit(-1))
        .withColumn("na", F.lit(0))
    )
    return positives.unionByName(negatives)
