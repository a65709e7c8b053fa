"""Typed fact construction — the MergedWikis semantics
(src/builders/MergedWikis.py:33-87) as one declarative plan.

Input: a raw claims table (claim_id, entity_id, pid, datatype, string_type,
string_value, object_id, amount, unit_uri, raw_time, precision) — the
flattened analog of wikidata claim documents — plus the entity-label
dimension (entity_id, label, aliases).

Per datatype (src/builders/MergedWikis.py:51-76):
- string:            value = trim(string_value), id = value; external-id /
                     commonsMedia rows dropped (F2, src:53-55)
- wikibase-entityid: resolve object label via join (J3); claims whose
                     object id is unknown are dropped (src:61-64)
- quantity:          strip leading '+', append unit label; id = amount +
                     unit id (X12/X13, src:168-175); unknown units render
                     unitless (NO_UNIT, src:9,68)
- time:              locale/precision-aware formatted date (X11);
                     id = raw time (src:177-180)

The reference does this per document with three Mongo round-trips; here it
is one scan + one broadcast join + pure column expressions + one pandas UDF
(dates). Output fact rows: entity_id, pid, value, value_type, value_id,
plus resolved label/aliases for wikibase facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xwikire_spark.functions.text import render_quantity, unit_id_from_uri
from xwikire_spark.functions.udfs import make_format_date_udf

EXCLUDED_STRING_TYPES = ("external-id", "commonsMedia")  # F2


def build_facts(
    claims: DataFrame, entities: DataFrame, lang: str = "en"
) -> DataFrame:
    """claims x entities -> typed fact rows (the tagged union of
    src/builders/MergedWikis.py:156-180 as explicit nullable columns).

    Scale note (SURVEY §2.3 J3): the object side of the wikibase join is
    the FULL entity table (~100M rows at Wikidata scale) — deliberately NO
    broadcast hint; it is a shuffle hash join with AQE handling skew. Only
    dimensions that are provably small after reduction (the distinct-unit
    dim below) get broadcast."""
    ent = entities.select(
        F.col("entity_id").alias("object_id"),
        F.col("label").alias("object_label"),
        F.col("aliases").alias("object_aliases"),
    )

    # string facts (src:156-160)
    strings = (
        claims.where(
            (F.col("datatype") == "string")
            & (~F.col("string_type").isin(*EXCLUDED_STRING_TYPES)
               | F.col("string_type").isNull())
        )
        .select(
            "entity_id",
            "pid",
            F.trim("string_value").alias("value"),
            F.lit("value").alias("value_type"),
            F.trim("string_value").alias("value_id"),
            F.lit(None).cast("string").alias("value_label"),
            F.lit(None).cast("array<string>").alias("value_aliases"),
        )
    )

    # wikibase facts (src:162-166): inner join drops unresolvable objects
    wikibase = (
        claims.where(F.col("datatype") == "wikibase-entityid")
        .join(ent, "object_id")
        .select(
            "entity_id",
            "pid",
            F.col("object_label").alias("value"),
            F.lit("wikibase").alias("value_type"),
            F.col("object_id").alias("value_id"),
            F.col("object_label").alias("value_label"),
            F.col("object_aliases").alias("value_aliases"),
        )
    )

    # quantity facts (src:168-175): left join — unknown unit renders bare.
    # The unit dimension is entities REDUCED to the units actually used
    # (distinct unit ids is a tiny partial-combine aggregate of the claims'
    # unit column), THEN broadcast — broadcasting the raw entity table here
    # would OOM at the same scale as the wikibase join above.
    quantity_claims = claims.where(F.col("datatype") == "quantity").withColumn(
        "unit_id", unit_id_from_uri(F.col("unit_uri"))
    )
    used_units = quantity_claims.select("unit_id").distinct()
    unit_dim = F.broadcast(
        entities.select(
            F.col("entity_id").alias("unit_id"),
            F.col("label").alias("unit_label"),
        ).join(used_units, "unit_id", "left_semi")
    )
    amount = F.regexp_replace(F.col("amount"), r"^\+", "")
    quantities = (
        quantity_claims
        .join(unit_dim, "unit_id", "left")
        .select(
            "entity_id",
            "pid",
            render_quantity(F.col("amount"),
                            F.coalesce("unit_label", F.lit(""))).alias(
                "value"
            ),
            F.lit("quantity").alias("value_type"),
            F.concat(
                amount,
                F.when(
                    F.col("unit_label").isNotNull(), F.col("unit_id")
                ).otherwise(F.lit("")),
            ).alias("value_id"),
            F.lit(None).cast("string").alias("value_label"),
            F.lit(None).cast("array<string>").alias("value_aliases"),
        )
    )

    # time facts (src:177-180) — vectorized date formatter (X11)
    date_udf = make_format_date_udf(lang)
    times = claims.where(F.col("datatype") == "time").select(
        "entity_id",
        "pid",
        date_udf(F.col("raw_time"), F.col("precision")).alias("value"),
        F.lit("date").alias("value_type"),
        F.col("raw_time").alias("value_id"),
        F.lit(None).cast("string").alias("value_label"),
        F.lit(None).cast("array<string>").alias("value_aliases"),
    )

    return (
        strings.unionByName(wikibase)
        .unionByName(quantities)
        .unionByName(times)
    )


def universal_schema_export(
    facts: DataFrame, entities: DataFrame, prop_dim: DataFrame,
    prop_whitelist: DataFrame | None = None,
) -> DataFrame:
    """The flat (subj, pred, obj) table — universal_schema.export
    (src/universal_schema.py:17-56): facts x entity labels x property
    labels, whitelist filter, sha1 surrogate id."""
    from xwikire_spark.functions.ids import triple_id

    out = facts
    if prop_whitelist is not None:
        out = out.join(
            F.broadcast(prop_whitelist.select(F.col("pid"))), "pid",
            "left_semi",
        )
    # entity-label join: full entity table — no broadcast hint (J3 scale
    # rule); the property dim IS small (thousands of pids) so it stays
    # broadcast.
    ent = entities.select(
        "entity_id",
        F.col("label").alias("entity_label"),
        F.col("aliases").alias("entity_aliases"),
    )
    props = F.broadcast(
        prop_dim.select(
            "pid",
            F.col("label").alias("property_label"),
            F.col("aliases").alias("property_aliases"),
        )
    )
    return (
        out.join(ent, "entity_id")
        .join(props, "pid")
        .select(
            "entity_id",
            "entity_label",
            "entity_aliases",
            F.col("pid").alias("property_id"),
            "property_label",
            "property_aliases",
            "value_id",
            "value_type",
            F.coalesce("value_label", "value").alias("value_label"),
            F.coalesce("value_aliases", F.array()).alias("value_aliases"),
            triple_id("entity_id", "pid", "value_id").alias("id"),
        )
    )
