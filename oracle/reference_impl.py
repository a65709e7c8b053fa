"""Pure-Python oracle: the reference's distant-supervision semantics over
transcript rows, with no Spark.

This is the differential-testing oracle from SURVEY §5: segmentation ->
longest whole-word dictionary mention -> earliest-mention subject ->
earliest predicate surface -> per-(conv, subj, pred, obj) first evidence ->
sha1 triple id (src/builders/QA.py:76-84, src/builders/SRL.py:93-103,
src/universal_schema.py:12-14). The Spark pipeline
(xwikire_spark.pipeline.extraction.extract_triples) must reproduce this
exactly (P/R target >= 0.95; we assert set equality at test scale).
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

from xwikire_spark.kernels.segmenter import segment_sentences


def _compile(surfaces: list[str]) -> re.Pattern | None:
    by_len = sorted({s for s in surfaces if s}, key=len, reverse=True)
    if not by_len:
        return None
    return re.compile(r"\b(?:" + "|".join(re.escape(s) for s in by_len) + r")\b")


def _sha1(s: str) -> str:
    return hashlib.sha1(s.encode("utf-8")).hexdigest()


def extract_triples_oracle(
    transcript_rows: list[dict],
    alias_pairs: list[tuple[str, str]],
    predicate_surfaces: list[tuple[str, str]],
) -> list[dict]:
    """transcript rows + (alias, entity_id) + (surface, pid) -> triples.

    Returns dicts with the same columns as the Spark pipeline output.
    """
    alias_re = _compile([a for a, _ in alias_pairs])
    pred_re = _compile([s for s, _ in predicate_surfaces])
    alias_ids = defaultdict(list)
    for a, e in alias_pairs:
        if e not in alias_ids[a]:
            alias_ids[a].append(e)
    pred_ids = defaultdict(list)
    for s, p in predicate_surfaces:
        if p not in pred_ids[s]:
            pred_ids[s].append(p)

    best: dict[tuple, dict] = {}
    for row in sorted(
        transcript_rows, key=lambda r: (r["conv_id"], r["turn_idx"])
    ):
        text = (row["text"] or "").strip()
        if not text:
            continue
        for sent_idx, sentence in enumerate(segment_sentences(text)):
            mentions = [
                (m.start(), e, m.group(), m.end())
                for m in alias_re.finditer(sentence)
                for e in alias_ids[m.group()]
            ]
            if len(mentions) < 2:
                continue
            pmatches = [
                (m.start(), p, m.group())
                for m in pred_re.finditer(sentence)
                for p in pred_ids[m.group()]
            ]
            if not pmatches:
                continue
            # earliest predicate, ties by pid (X5 analog)
            p_start, pid, p_surface = min(
                pmatches, key=lambda x: (x[0], x[1])
            )
            # earliest mention = subject, ties by entity_id
            s_start, subj, s_surface, _ = min(
                mentions, key=lambda x: (x[0], x[1])
            )
            for o_start, obj, o_surface, _ in mentions:
                if obj == subj:
                    continue
                key = (row["conv_id"], subj, pid, obj)
                cand = {
                    "id": _sha1(f"{subj} {pid} {obj}"),
                    "subj": subj,
                    "pred": pid,
                    "obj": obj,
                    "conv_id": row["conv_id"],
                    "turn_idx": row["turn_idx"],
                    "sent_idx": sent_idx,
                    "evidence": sentence,
                    "subj_surface": s_surface,
                    "pred_surface": p_surface,
                    "obj_surface": o_surface,
                    "_order": (row["turn_idx"], sent_idx, o_start),
                }
                if key not in best or cand["_order"] < best[key]["_order"]:
                    best[key] = cand
    out = []
    for v in best.values():
        v = dict(v)
        v.pop("_order")
        out.append(v)
    return out


def precision_recall(
    predicted: set[tuple], expected: set[tuple]
) -> tuple[float, float]:
    if not predicted or not expected:
        return (0.0, 0.0)
    tp = len(predicted & expected)
    return tp / len(predicted), tp / len(expected)
