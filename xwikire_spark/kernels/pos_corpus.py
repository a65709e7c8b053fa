"""Deterministic grammar-generated PTB-tagged corpus for the perceptron
tagger (X10 — VERDICT r2 next-round #5: "grow the embedded corpus to a few
thousand pinned sentences ... held-out accuracy >= 0.9 on >= 300 pinned
sentences").

No network and no downloadable treebank exist in this container, so the
corpus is GENERATED from an explicit grammar: tag-sequence templates whose
slots are filled from per-tag vocabularies with regular English morphology
(verb stems conjugate to VB/VBZ/VBD/VBN/VBG, nouns pluralize, adverbs take
-ly). Tags are therefore correct by construction — the grammar IS the
annotation — and everything is pinned by a seed.

Held-out discipline: content vocabularies (verb stems, nouns, adjectives,
adverb stems, proper nouns) are SPLIT disjointly between train and heldout
(every 5th item is heldout-only), so held-out accuracy measures
generalization through suffix/shape/context features, never memorized
words. Closed-class words (DT/IN/PRP/CC/MD/TO) are shared — unseen
determiners are not a thing the reference's tagger faces either.

Tag conventions: Penn Treebank (public). The architecture being gated is
nltk.pos_tag parity (averaged perceptron, reference src/builders/SRL.py:20).
"""

from __future__ import annotations

import random

# --- content vocabularies (split train/heldout by index % 5) ---------------

_VERB_STEMS = [
    # (stem, VBZ, VBD, VBN, VBG) — regular unless listed irregular below
    "walk", "talk", "jump", "paint", "clean", "cook", "visit", "follow",
    "open", "close", "start", "finish", "help", "call", "answer", "ask",
    "play", "work", "look", "watch", "listen", "learn", "travel", "stay",
    "wait", "turn", "push", "pull", "lift", "drop", "pick", "carry",
    "design", "test", "measure", "record", "report", "collect", "compare",
    "explain", "describe", "discuss", "present", "review", "examine",
    "deliver", "attach", "attack", "defend", "support", "remain", "appear",
    "happen", "return", "arrive", "depart", "remember", "forget", "expect",
    "accept", "refuse", "offer", "order", "borrow", "lend", "count",
    "repair", "replace", "remove", "install", "connect", "disconnect",
    "launch", "land", "float", "sink", "climb", "descend", "enter",
    "exit", "gather", "scatter", "assemble", "divide", "join", "split",
    "print", "scan", "upload", "download", "store", "fetch", "process",
    "filter", "sort", "merge", "index", "cache", "encode", "decode",
]
_IRREGULAR = {
    # stem: (VBZ, VBD, VBN, VBG)
    "run": ("runs", "ran", "run", "running"),
    "write": ("writes", "wrote", "written", "writing"),
    "take": ("takes", "took", "taken", "taking"),
    "give": ("gives", "gave", "given", "giving"),
    "build": ("builds", "built", "built", "building"),
    "find": ("finds", "found", "found", "finding"),
    "hold": ("holds", "held", "held", "holding"),
    "keep": ("keeps", "kept", "kept", "keeping"),
    "send": ("sends", "sent", "sent", "sending"),
    "teach": ("teaches", "taught", "taught", "teaching"),
}
_NOUNS = [
    "house", "garden", "village", "market", "school", "teacher", "student",
    "engineer", "artist", "farmer", "doctor", "nurse", "driver", "pilot",
    "mountain", "forest", "desert", "island", "harbor", "bridge", "tower",
    "library", "theater", "factory", "office", "kitchen", "window", "door",
    "table", "chair", "bottle", "basket", "mirror", "candle", "ladder",
    "engine", "wheel", "signal", "cable", "battery", "sensor", "screen",
    "report", "letter", "ticket", "journal", "poster", "recipe", "menu",
    "meeting", "lecture", "concert", "festival", "journey", "holiday",
    "morning", "evening", "season", "summer", "winter", "harvest",
    "teacup", "lantern", "anchor", "compass", "saddle", "hammer", "chisel",
    "valley", "meadow", "orchard", "vineyard", "stable", "cottage",
    "printer", "router", "server", "cluster", "dataset", "pipeline",
]
_ADJS = [
    "big", "small", "old", "young", "new", "bright", "dark", "heavy",
    "light", "fast", "slow", "quiet", "loud", "clean", "dirty", "warm",
    "cold", "tall", "short", "wide", "narrow", "deep", "shallow", "rich",
    "simple", "complex", "modern", "ancient", "gentle", "fierce", "calm",
    "busy", "empty", "solid", "fragile", "smooth", "rough", "distant",
    "famous", "curious", "careful", "useful", "powerful", "peaceful",
]
_ADV_STEMS = [
    "quick", "slow", "quiet", "loud", "careful", "gentle", "sudden",
    "frequent", "rare", "usual", "final", "direct", "calm", "eager",
    "proud", "brave", "polite", "smooth", "steady", "swift",
]
_PROPER = [
    "Avalon", "Brighton", "Caldera", "Dunmore", "Eastport", "Fairview",
    "Granville", "Hillcrest", "Ironwood", "Jasper", "Kingsley", "Lakewood",
    "Marlowe", "Norwood", "Oakdale", "Pinehurst", "Quentin", "Rosewood",
    "Sterling", "Thornton", "Underhill", "Vernon", "Westbrook", "Yardley",
]

# closed classes (shared between train and heldout)
_DT = ["the", "a", "this", "every", "each"]
_IN = ["in", "on", "near", "behind", "under", "beside", "across", "through"]
_PRP = ["he", "she", "they", "we", "it"]
_PRP_DOLLAR = ["his", "her", "their", "our", "its"]
_CC = ["and", "or", "but"]
_MD = ["will", "can", "must", "should", "may"]
_RB_PLAIN = ["often", "never", "always", "soon", "here", "twice"]


def _split(items: list[str], heldout: bool) -> list[str]:
    """Deterministic per-WORD split (zlib.crc32, not position): a word
    appearing in two vocab lists (e.g. 'clean' as verb stem and adjective)
    lands on the same side in both, keeping train/heldout content
    vocabularies truly disjoint."""
    import zlib

    return [
        w for w in items
        if (zlib.crc32(w.encode()) % 5 == 4) == heldout
    ]


def _verb_forms(stem: str) -> dict[str, str]:
    if stem in _IRREGULAR:
        vbz, vbd, vbn, vbg = _IRREGULAR[stem]
    elif stem.endswith("y") and stem[-2] not in "aeiou":
        # consonant-y: carry -> carries/carried/carrying (same rule
        # _plural applies to nouns)
        vbz = stem[:-1] + "ies"
        vbd = vbn = stem[:-1] + "ied"
        vbg = stem + "ing"
    else:
        vbz = stem + ("es" if stem.endswith(("ch", "sh", "s", "x")) else "s")
        if stem.endswith("e"):
            vbd = vbn = stem + "d"
            vbg = stem[:-1] + "ing"
        else:
            vbd = vbn = stem + "ed"
            vbg = stem + "ing"
    return {"VB": stem, "VBP": stem, "VBZ": vbz, "VBD": vbd,
            "VBN": vbn, "VBG": vbg}


def _plural(noun: str) -> str:
    if noun.endswith(("ch", "sh", "s", "x")):
        return noun + "es"
    if noun.endswith("y") and noun[-2] not in "aeiou":
        return noun[:-1] + "ies"
    return noun + "s"


# Templates: a sequence of tag slots. "NN!" / "NNS!" draw from the noun
# list (pluralized for NNS); verb tags draw a stem and conjugate; "RB-ly"
# derives an adverb from _ADV_STEMS; plain closed-class tags draw from the
# shared lists. Sentence-initial words are capitalized (title-case feature
# exposure), which does not change the tag.
_TEMPLATES = [
    ["DT", "NN", "VBZ", "IN", "DT", "NN", "."],
    ["DT", "JJ", "NN", "VBD", "DT", "NN", "."],
    ["DT", "NNS", "VBP", "IN", "DT", "JJ", "NN", "."],
    ["NNP", "VBD", "DT", "NN", "IN", "NNP", "."],
    ["PRP", "VBZ", "VBG", "DT", "NN", "."],
    ["PRP", "VBD", "VBN", "IN", "DT", "NN", "."],
    ["DT", "NN", "MD", "VB", "DT", "NN", "RB-ly", "."],
    ["NNS", "RB", "VBP", "DT", "NNS", "."],
    ["DT", "JJ", "NNS", "VBP", "RB-ly", "."],
    ["NNP", "CC", "NNP", "VBD", "IN", "DT", "NN", "."],
    ["PRP$", "NN", "VBD", "DT", "JJ", "NN", "."],
    ["DT", "NN", "IN", "DT", "NN", "VBZ", "JJ", "."],
    ["PRP", "MD", "VB", "DT", "NNS", "IN", "DT", "NN", "."],
    ["DT", "NN", "VBD", "CD", "NNS", "."],
    ["IN", "DT", "NN", "DT", "NNS", "VBP", "."],
    ["DT", "VBG", "NN", "VBZ", "IN", "DT", "NN", "."],
    ["NNP", "VBZ", "DT", "NN", "CC", "DT", "NN", "."],
    ["PRP", "VBP", "IN", "DT", "JJ", "NN", "."],
]


def generate_corpus(
    n_sentences: int, heldout: bool = False, seed: int = 29
) -> list[tuple[list[str], list[str]]]:
    """``n_sentences`` pinned (tokens, tags) sentences. ``heldout=True``
    draws content words from the disjoint held-out vocabulary slices (and
    a shifted seed), sharing only closed-class words with the train side."""
    rng = random.Random(seed + (1_000_003 if heldout else 0))
    verbs = _split(_VERB_STEMS + list(_IRREGULAR), heldout)
    nouns = _split(_NOUNS, heldout)
    adjs = _split(_ADJS, heldout)
    advs = _split(_ADV_STEMS, heldout)
    proper = _split(_PROPER, heldout)

    out: list[tuple[list[str], list[str]]] = []
    for k in range(n_sentences):
        template = _TEMPLATES[k % len(_TEMPLATES)]
        tokens: list[str] = []
        tags: list[str] = []
        for slot in template:
            if slot in ("VB", "VBP", "VBZ", "VBD", "VBN", "VBG"):
                w = _verb_forms(rng.choice(verbs))[slot]
                t = slot
            elif slot == "NN":
                w, t = rng.choice(nouns), "NN"
            elif slot == "NNS":
                w, t = _plural(rng.choice(nouns)), "NNS"
            elif slot == "JJ":
                w, t = rng.choice(adjs), "JJ"
            elif slot == "RB-ly":
                w, t = rng.choice(advs) + "ly", "RB"
            elif slot == "RB":
                w, t = rng.choice(_RB_PLAIN), "RB"
            elif slot == "NNP":
                w, t = rng.choice(proper), "NNP"
            elif slot == "DT":
                w, t = rng.choice(_DT), "DT"
            elif slot == "IN":
                w, t = rng.choice(_IN), "IN"
            elif slot == "PRP":
                w, t = rng.choice(_PRP), "PRP"
            elif slot == "PRP$":
                w, t = rng.choice(_PRP_DOLLAR), "PRP$"
            elif slot == "CC":
                w, t = rng.choice(_CC), "CC"
            elif slot == "MD":
                w, t = rng.choice(_MD), "MD"
            elif slot == "CD":
                w, t = str(rng.randint(2, 900)), "CD"
            elif slot == ".":
                w, t = ".", "."
            else:  # pragma: no cover - grammar bug guard
                raise ValueError(f"unknown slot {slot}")
            tokens.append(w)
            tags.append(t)
        tokens[0] = tokens[0][0].upper() + tokens[0][1:]
        out.append((tokens, tags))
    return out


def evaluate(model: dict, corpus: list[tuple[list[str], list[str]]]) -> float:
    """Token-level tagging accuracy of a trained model dict."""
    from xwikire_spark.kernels.perceptron import tag_with_model

    good = total = 0
    for tokens, tags in corpus:
        got = tag_with_model(tokens, model)
        good += sum(1 for a, b in zip(got, tags) if a == b)
        total += len(tags)
    return good / max(total, 1)
