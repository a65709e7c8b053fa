"""SRL sentence assembly + export — the reference's SRLBuilder/SRLExporter
path (src/builders/SRL.py:23-91,124-178; src/srl.py:61-118).

Per evidence triple: tokenize the sentence (X8), POS-tag it (X10), locate
entity/answer/relation token spans (X20), then apply the export filters:

- F7 relation-verb: the relation span must contain a VB* tag
  (src/srl.py:61-68,112);
- F8 contiguity: entity/answer/relation locations must be a single
  contiguous span — flattened locations with non-empty ``breaks`` are
  dropped (src/srl.py:71-81,98-103,115-118, _get_locations at
  src/builders/SRL.py:190-201);
- F9 sentence blacklist: drop sentences containing "is a" or predicate
  P31 (src/scripts/srl_intersection.py:20-26);
- A10 sentence dedup: one row per (doc, sha1(sentence))
  (src/builders/SRL.py:47-65).

One fused mapInPandas does tokenize+tag+locate (single Python pass);
filters and dedup stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SRL_SCHEMA = (
    "conv_id string, sentence_id string, sentence string, "
    "sentence_sequence array<string>, pos array<string>, "
    "subj string, subj_locations array<int>, subj_breaks array<int>, "
    "pred string, relation_locations array<int>, relation_breaks array<int>, "
    "relation_has_verb boolean, "
    "obj string, answer_locations array<int>, answer_breaks array<int>, "
    "triple_id string"
)


def srl_rows(triples: DataFrame, tagger: str = "rule") -> DataFrame:
    """triples (extract_triples output) -> SRL sentence/triple rows with
    token spans and POS, one fused Python pass.

    ``tagger``: "rule" (default — the pinned, SQL-mirrorable contract the
    driver oracle checks) or "perceptron" (the trained averaged-perceptron
    X10 path for real text; nltk.pos_tag architecture parity,
    kernels/perceptron.py). The perceptron model trains ONCE on the driver
    and ships via SparkContext.broadcast — at 1000 executors the previous
    lazy per-worker retrain cost ~5 s x workers and shipped the training
    corpus in every task closure instead."""
    model_bc = None
    if tagger == "perceptron":
        from xwikire_spark.kernels.pos import perceptron_model

        model_bc = triples.sparkSession.sparkContext.broadcast(
            perceptron_model()
        )

    def gen(batches):
        import hashlib

        import pandas as pd

        from xwikire_spark.kernels.matching import (
            find_full_matches,
            flatten_locations,
        )
        from xwikire_spark.kernels.pos import (
            contains_verb,
            pos_tag as rule_tag,
        )
        from xwikire_spark.kernels.textfix import fix_text
        from xwikire_spark.kernels.tokenizer import tokenize_with_breaks

        if model_bc is not None:
            from xwikire_spark.kernels.perceptron import tag_with_model

            model = model_bc.value

            def pos_tag(tokens):
                return tag_with_model(tokens, model)
        else:
            pos_tag = rule_tag
        cols = [f.split()[0] for f in SRL_SCHEMA.split(", ")]
        for pdf in batches:
            out = {c: [] for c in cols}
            for r in pdf.itertuples(index=False):
                # X16: the reference ftfy-fixes every sentence before
                # tokenizing (src/builders/SRL.py:111); identity on clean
                # text, so the oracle contract is unchanged
                evidence = fix_text(r.evidence)
                tokens, _ = tokenize_with_breaks(evidence)
                tags = pos_tag(tokens)

                def spans(surface):
                    toks, _ = tokenize_with_breaks(surface)
                    return find_full_matches(tokens, toks)

                subj_loc = spans(r.subj_surface)
                ans_loc = spans(r.obj_surface)
                rel_loc = spans(r.pred_surface)
                if not (subj_loc and ans_loc and rel_loc):
                    # reference logs + skips unlocatable spans
                    # (src/builders/SRL.py:54-79)
                    continue
                subj_pos, subj_breaks = flatten_locations(subj_loc)
                ans_pos, ans_breaks = flatten_locations(ans_loc)
                rel_pos, rel_breaks = flatten_locations(rel_loc)
                has_verb = contains_verb(
                    tags, rel_loc[0][0], rel_loc[0][-1] + 1
                )
                out["conv_id"].append(r.conv_id)
                out["sentence_id"].append(
                    hashlib.sha1(evidence.encode("utf-8")).hexdigest()
                )
                out["sentence"].append(evidence)
                out["sentence_sequence"].append(tokens)
                out["pos"].append(tags)
                out["subj"].append(r.subj)
                out["subj_locations"].append(subj_pos)
                out["subj_breaks"].append(subj_breaks)
                out["pred"].append(r.pred)
                out["relation_locations"].append(rel_pos)
                out["relation_breaks"].append(rel_breaks)
                out["relation_has_verb"].append(has_verb)
                out["obj"].append(r.obj)
                out["answer_locations"].append(ans_pos)
                out["answer_breaks"].append(ans_breaks)
                out["triple_id"].append(r.id)
            # object dtype: an all-skipped batch otherwise yields float64
            # columns Arrow can't cast to array<string>
            yield pd.DataFrame(
                {c: pd.Series(v, dtype="object") for c, v in out.items()}
            )

    return triples.mapInPandas(gen, SRL_SCHEMA)


def srl_export(
    triples: DataFrame,
    require_verb: bool = True,
    blacklist_is_a: bool = True,
    tagger: str = "rule",
) -> DataFrame:
    """Apply the export filters (F7/F8/F9) + sentence-level dedup (A10).

    Output: one row per (conv, sentence, triple) that survives —
    the JSONL export shape (src/srl.py:84-139)."""
    rows = srl_rows(triples, tagger=tagger)
    out = rows.where(
        (F.size("subj_breaks") == 0)
        & (F.size("answer_breaks") == 0)
        & (F.size("relation_breaks") == 0)
    )
    if require_verb:
        out = out.where(F.col("relation_has_verb"))
    if blacklist_is_a:
        # F9 (src/scripts/srl_intersection.py:20-26)
        out = out.where(
            ~F.col("sentence").contains("is a") & (F.col("pred") != "P31")
        )
    # A10: one row per (conv, sentence, triple)
    return out.dropDuplicates(["conv_id", "sentence_id", "triple_id"])
