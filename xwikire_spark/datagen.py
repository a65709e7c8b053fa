"""Deterministic synthetic corpus generator (seeded, pure Python).

Produces the tables FIXTURES.md specifies: ``transcripts`` with the exact
BASELINE.json input_hint shape (conv_id:string, turn_idx:int32, role:string,
text:string, tool:string, ts:timestamp), plus the dictionary tables playing
the reference's ``wikidata`` role (alias -> entity, predicate surfaces —
src/config.py:13-19) and a raw typed-claims table exercising the
MergedWikis fact union (src/builders/MergedWikis.py:51-80).

Everything is generated with ``random.Random(seed)`` on the driver so the
pure-Python oracle consumes byte-identical rows without Spark. Planted
phenomena (per FIXTURES.md):
- alias + predicate surface co-occurring in one sentence  -> positives
- subject/object split across sentences                   -> negatives
- overlapping aliases ("New York" / "New York City")      -> longest-match
- alias collision ("Paris" -> Q4 and Q9)                  -> canonicalization
- one hot entity in ~30% of turns ("Spark City")          -> skew salting
- multi-paragraph turns, unicode (Kannada), …!? punctuation
"""

from __future__ import annotations

import datetime as dt
import random
from dataclasses import dataclass

# --------------------------------------------------------------------------
# Dictionaries (the `wikidata` analog). Aliases are (surface, entity_id,
# canonical_label, is_canonical); exactly one canonical per entity.
# --------------------------------------------------------------------------

ALIASES: list[tuple[str, str, str, bool]] = [
    ("Berlin", "Q1", "Berlin", True),
    ("Albert Einstein", "Q2", "Albert Einstein", True),
    ("Einstein", "Q2", "Albert Einstein", False),
    ("New York City", "Q3", "New York City", True),
    ("New York", "Q3", "New York City", False),
    ("NYC", "Q3", "New York City", False),
    ("Paris", "Q4", "Paris", True),
    ("Marie Curie", "Q5", "Marie Curie", True),
    ("Curie", "Q5", "Marie Curie", False),
    ("Köln", "Q6", "Köln", True),
    ("Cologne", "Q6", "Köln", False),
    ("ಬೆಂಗಳೂರು", "Q7", "ಬೆಂಗಳೂರು", True),
    ("Bengaluru", "Q7", "ಬೆಂಗಳೂರು", False),
    ("Niels Bohr", "Q8", "Niels Bohr", True),
    ("Bohr", "Q8", "Niels Bohr", False),
    # deliberate collision: same alias maps to a second entity
    ("Paris", "Q9", "Paris Hilton", False),
    ("Paris Hilton", "Q9", "Paris Hilton", True),
    # hot entity — appears in ~30% of turns (skew driver)
    ("Spark City", "Q10", "Spark City", True),
]

PREDICATES: list[tuple[str, str, list[str]]] = [
    ("P19", "born in", ["was born in"]),
    ("P20", "died in", ["passed away in"]),
    ("P26", "married", ["married to"]),
    ("P108", "works at", ["employed by", "joined"]),
    ("P131", "located in", ["situated in"]),
    ("P551", "lives in", ["resides in", "moved to"]),
    ("P937", "worked in", []),
    ("P1376", "capital of", []),
]

_SUBJECTS = ["Q2", "Q5", "Q8", "Q9", "Q10"]
_OBJECTS = ["Q1", "Q3", "Q4", "Q6", "Q7", "Q10"]
_ROLES = ["user", "assistant", "tool"]
_TOOLS = [None, "search", "calculator", None]

_FILLER = [
    "That is interesting.",
    "Tell me more?",
    "Here is what I found…",
    "Sure!",
    "ಸರಿ, ಮುಂದುವರಿಯೋಣ.",
    "Let me check the records.",
]

_BASE_TS = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)


@dataclass(frozen=True)
class PlantedFact:
    """Ground truth for one planted positive co-occurrence."""

    conv_id: str
    turn_idx: int
    subj_alias: str
    pid: str
    pred_surface: str
    obj_alias: str


def _canonical_surface(rng: random.Random, entity_id: str) -> str:
    choices = [a for a, e, _, _ in ALIASES if e == entity_id]
    return rng.choice(choices)


def generate_transcripts(
    n_convs: int = 50, turns_per_conv: int = 12, seed: int = 7
) -> tuple[list[dict], list[PlantedFact]]:
    """Generate transcript rows + the planted ground truth.

    Rows follow the input_hint schema exactly; turn_idx is dense 0-based,
    ts monotone within each conversation.
    """
    rng = random.Random(seed)
    rows: list[dict] = []
    planted: list[PlantedFact] = []

    for c in range(n_convs):
        conv_id = f"conv-{c:05d}"
        for t in range(turns_per_conv):
            sentences: list[str] = []
            r = rng.random()
            if r < 0.45:
                # positive: subj + predicate surface + obj in ONE sentence
                subj = rng.choice(_SUBJECTS)
                obj = rng.choice([o for o in _OBJECTS if o != subj])
                pid, label, aliases = rng.choice(PREDICATES)
                surface = rng.choice([label] + aliases)
                s_alias = _canonical_surface(rng, subj)
                o_alias = _canonical_surface(rng, obj)
                punct = rng.choice([".", "!", "."])
                sentences.append(f"{s_alias} {surface} {o_alias}{punct}")
                planted.append(
                    PlantedFact(conv_id, t, s_alias, pid, surface, o_alias)
                )
                sentences.append(rng.choice(_FILLER))
            elif r < 0.65:
                # negative: subj and obj in DIFFERENT sentences
                subj = rng.choice(_SUBJECTS)
                obj = rng.choice(_OBJECTS)
                pid, label, _ = rng.choice(PREDICATES)
                sentences.append(
                    f"{_canonical_surface(rng, subj)} is mentioned here."
                )
                sentences.append(
                    f"Separately, {_canonical_surface(rng, obj)} appears."
                )
            else:
                sentences.append(rng.choice(_FILLER))
                if rng.random() < 0.5:
                    sentences.append(rng.choice(_FILLER))

            # hot entity in ~30% of turns (independent of the fact)
            if rng.random() < 0.30:
                sentences.append("Spark City came up again.")

            # occasional paragraph break inside a turn
            joiner = "\n\n" if rng.random() < 0.15 else " "
            text = joiner.join(sentences)
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": _ROLES[t % 3],
                    "text": text,
                    "tool": _TOOLS[t % 4],
                    "ts": _BASE_TS + dt.timedelta(days=c, minutes=t),
                }
            )
    return rows, planted


def alias_rows() -> list[dict]:
    return [
        {"alias": a, "entity_id": e, "canonical_label": l, "is_canonical": c}
        for a, e, l, c in ALIASES
    ]


def predicate_rows() -> list[dict]:
    return [
        {"pid": p, "label": l, "aliases": al} for p, l, al in PREDICATES
    ]


def claim_rows(seed: int = 11, n: int = 200) -> list[dict]:
    """Raw typed claims exercising the MergedWikis fact union
    (src/builders/MergedWikis.py:51-80): string / wikibase-entityid /
    quantity / time datatypes, including external-id rows that must be
    dropped (src:53-55)."""
    rng = random.Random(seed)
    entities = sorted({e for _, e, _, _ in ALIASES})
    labels = {e: l for _, e, l, c in ALIASES if c}
    units = [("Q11573", "metre"), ("Q11570", "kilogram"), ("1", "")]
    rows: list[dict] = []
    for i in range(n):
        ent = rng.choice(entities)
        pid = rng.choice(PREDICATES)[0]
        datatype = rng.choice(
            ["string", "string-external", "wikibase-entityid", "quantity",
             "time"]
        )
        row = {
            "claim_id": f"c{i:06d}",
            "entity_id": ent,
            "pid": pid,
            "datatype": "string" if datatype == "string-external" else datatype,
            "string_type": "external-id" if datatype == "string-external"
            else ("string" if datatype == "string" else None),
            "string_value": f" value-{i} " if datatype.startswith("string")
            else None,
            "object_id": rng.choice(entities)
            if datatype == "wikibase-entityid" else None,
            "amount": f"+{rng.randint(1, 500)}" if datatype == "quantity"
            else None,
            "unit_uri": f"http://www.wikidata.org/entity/{rng.choice(units)[0]}"
            if datatype == "quantity" else None,
            "raw_time": f"+0000000{rng.randint(1000, 2026)}-0{rng.randint(1, 9)}"
            f"-0{rng.randint(1, 9)}T00:00:00Z" if datatype == "time" else None,
            "precision": rng.choice([6, 7, 9, 10, 11]) if datatype == "time"
            else None,
        }
        rows.append(row)
    rows.append(  # object-label dimension rows for units
        {"claim_id": "u0", "entity_id": "Q11573", "pid": "P0",
         "datatype": "label-row", "string_type": None,
         "string_value": "metre", "object_id": None, "amount": None,
         "unit_uri": None, "raw_time": None, "precision": None}
    )
    return rows


def entity_label_rows() -> list[dict]:
    """Entity id -> canonical label + aliases (the cleaned wikidata doc,
    src/builders/MergedWikis.py:103-119)."""
    out = {}
    for a, e, l, c in ALIASES:
        rec = out.setdefault(
            e, {"entity_id": e, "label": l, "aliases": []}
        )
        if not c:
            rec["aliases"].append(a)
        if c:
            rec["label"] = l
    return list(out.values())
