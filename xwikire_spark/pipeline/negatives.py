"""Negative-example generation — the reference's within-document pairwise
combination scheme (J5, src/builders/QA.py:86-107).

Semantics: for each document (here: conversation) and each fact *type*,
take all 2-combinations of positive examples; a pair (a, b) yields a
negative iff a.prop != b.prop and a's answer does NOT occur (whole-word) in
b's sentence — i.e. "question of a asked against the evidence of b".
The negative id is sha1(a.id + ' ' + a.prop + ' ' + b.id)
(src/builders/QA.py:103).

Spark shape: ``applyInPandas`` per (conv_id, type) group — the combination
space is quadratic *within a group only* (the reference caps it the same
way by working per document); groups are small, the stage is a single
shuffle on the group key. A ``max_pairs`` guard bounds pathological groups
(hot conversations) — the reference has no such guard and would O(k²) blow
up; at 10^12 turns we must cap.
"""

from __future__ import annotations

import hashlib
import itertools
import re

from pyspark.sql import DataFrame

NEGATIVES_SCHEMA = (
    "conv_id string, type string, relation string, sentence string, "
    "answer string, id string, answer_id string, prop_id string, "
    "example string, source_a string, source_b string"
)


def generate_negatives(
    positives: DataFrame,
    group_cols: tuple[str, str] = ("conv_id", "type"),
    max_pairs: int = 1000,
) -> DataFrame:
    """positives: (conv_id, type, prop_id, sentence, answer, id, ...) ->
    negative rows (reference record shape, src/builders/QA.py:102-105)."""

    def build(pdf):
        import pandas as pd

        out = {
            "conv_id": [], "type": [], "relation": [], "sentence": [],
            "answer": [], "id": [], "answer_id": [], "prop_id": [],
            "example": [], "source_a": [], "source_b": [],
        }
        # applyInPandas delivers group rows in arbitrary partition order;
        # pair roles (a vs b) and the max_pairs cutoff must not depend on
        # it. Pin document order (turn/sent) when present, else positive id
        # — the reference's per-doc insertion order made deterministic.
        sort_cols = [
            c for c in ("turn_idx", "sent_idx", "id") if c in pdf.columns
        ]
        rows = pdf.sort_values(sort_cols).to_dict("records")
        n_pairs = 0
        for a, b in itertools.combinations(rows, 2):
            if n_pairs >= max_pairs:
                break
            if a["prop_id"] == b["prop_id"]:
                continue
            # a's answer must be absent from b's sentence (QA.py:100-101)
            pat = r"\b" + re.escape(a["answer"]) + r"\b"
            if re.search(pat, b["sentence"]):
                continue
            n_pairs += 1
            neg_id = hashlib.sha1(
                " ".join([a["id"], a["prop_id"], b["id"]]).encode("utf-8")
            ).hexdigest()
            out["conv_id"].append(a["conv_id"])
            out["type"].append(a["type"])
            out["relation"].append(a.get("relation", a["prop_id"]))
            out["sentence"].append(b["sentence"])
            out["answer"].append("")
            out["id"].append(neg_id)
            out["answer_id"].append("0")
            out["prop_id"].append(a["prop_id"])
            out["example"].append("negative")
            out["source_a"].append(a["id"])
            out["source_b"].append(b["id"])
        return pd.DataFrame(out)

    return positives.groupBy(*group_cols).applyInPandas(
        build, NEGATIVES_SCHEMA
    )
