"""Distant-supervision triple extraction over conversation transcripts.

Reference semantics being reproduced (SURVEY §3.1, §3.2):
- sentence segmentation per document        (src/builders/QA.py:34)
- whole-word co-occurrence in ONE sentence  (src/builders/QA.py:76-84)
- relation surface must also occur          (src/builders/SRL.py:93-103)
- first qualifying sentence wins            (src/builders/QA.py:80-84)
- triple id = sha1("subj pid obj")          (src/universal_schema.py:12-14)

Transcript mapping (BASELINE.json north_star): conv_id plays the article-id
role, turns play sentences/paragraphs; the *subject* is the earliest entity
mention in the sentence (the reference's subject is the page entity — a
transcript has no page entity, so document order decides, keeping the
first-match determinism the reference gets from iteration order).

Scale notes (100 TB plan):
- transcripts are repartitioned by hash(conv_id) once, up front; every
  subsequent per-conversation operation (windows, dedup) reuses that
  partitioning — one shuffle for the whole pipeline;
- alias/predicate dictionaries are broadcast (the reference's _prop_cache,
  src/builders/MergedWikis.py:28) — mention resolution never shuffles the
  fact table;
- the dedup window partitions by (conv_id, subj, pred, obj) — same hash
  family as the repartition, so AQE coalesces instead of reshuffling;
- hot entities skew only the *canonicalization* join, handled there with
  salting + AQE skew-join (see canonicalize.py).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xwikire_spark.functions.ids import triple_id
from xwikire_spark.functions.udfs import make_mention_udf, segment_udf
from xwikire_spark.kernels import segmenter


def segment_turns(transcripts: DataFrame) -> DataFrame:
    """transcripts -> one row per (turn, sentence), order-stable.

    Output: conv_id, turn_idx, role, ts, sent_idx, sentence.
    The empty-text filter mirrors F1 (src/builders/QA.py:30-32).
    """
    return (
        transcripts.where(F.length(F.trim(F.col("text"))) > 0)
        .withColumn("sentences", segment_udf(F.col("text")))
        .select(
            "conv_id",
            "turn_idx",
            "role",
            "ts",
            F.posexplode("sentences").alias("sent_idx", "sentence"),
        )
    )


def _alias_surface_ids(alias_dict: DataFrame) -> list[tuple[str, str]]:
    """(alias, entity_id) pairs — collisions preserved (one pair per id)."""
    return [
        (r["alias"], r["entity_id"])
        for r in alias_dict.select("alias", "entity_id").distinct().collect()
        if r["alias"]
    ]


def _predicate_surface_ids(predicate_dict: DataFrame) -> list[tuple[str, str]]:
    """(surface, pid) pairs over label + aliases (src/builders/SRL.py:36-39)."""
    rows = predicate_dict.select("pid", "label", "aliases").collect()
    out: list[tuple[str, str]] = []
    for r in rows:
        if r["label"]:
            out.append((r["label"], r["pid"]))
        for a in r["aliases"] or []:
            out.append((a, r["pid"]))
    return out


def _bc(df: DataFrame, pairs: list[tuple[str, str]]):
    """Ship dictionary pairs via SparkContext.broadcast: one torrent
    transfer per executor instead of a pickle in every task closure."""
    return df.sparkSession.sparkContext.broadcast(pairs)


def detect_mentions(sentences: DataFrame, alias_dict: DataFrame) -> DataFrame:
    """Attach entity mentions: longest whole-word dictionary match (X4
    generalized). Ids resolve inside the broadcast automaton (collisions
    emit one mention per entity) — no resolution join, no extra scan.

    Output adds: surface, entity_id, m_start, m_end (one row per mention).
    """
    udf = make_mention_udf(_bc(sentences, _alias_surface_ids(alias_dict)))
    return (
        sentences.withColumn("mentions", udf(F.col("sentence")))
        .where(F.size("mentions") > 0)
        .select(
            "*",
            F.explode("mentions").alias("m"),
        )
        .select(
            "conv_id", "turn_idx", "role", "ts", "sent_idx", "sentence",
            F.col("m.surface").alias("surface"),
            F.col("m.matched_id").alias("entity_id"),
            F.col("m.start").alias("m_start"),
            F.col("m.end").alias("m_end"),
        )
    )


def detect_predicates(sentences: DataFrame, predicate_dict: DataFrame) -> DataFrame:
    """Attach predicate-surface matches (label + aliases,
    src/builders/SRL.py:36-39). Output: one row per predicate hit with
    pid, p_surface, p_start."""
    udf = make_mention_udf(
        _bc(sentences, _predicate_surface_ids(predicate_dict))
    )
    return (
        sentences.withColumn("pm", udf(F.col("sentence")))
        .where(F.size("pm") > 0)
        .select(
            "conv_id", "turn_idx", "sent_idx",
            F.explode("pm").alias("p"),
        )
        .select(
            "conv_id", "turn_idx", "sent_idx",
            F.col("p.surface").alias("p_surface"),
            F.col("p.matched_id").alias("pid"),
            F.col("p.start").alias("p_start"),
        )
    )


CANDIDATE_SCHEMA = (
    "conv_id string, turn_idx int, sent_idx int, sentence string, "
    "subj string, subj_surface string, pid string, p_surface string, "
    "obj string, obj_surface string, obj_start int"
)


def make_candidate_generator(alias_pairs, pred_pairs):
    """Fused mapInPandas kernel: segment + both dictionary automatons +
    candidate emission in ONE Python pass per Arrow batch.

    Why fused: three chained pandas UDFs (segment, mentions, predicates)
    cost three Arrow round-trips and nested array<struct> construction —
    measured ~5x the raw kernel time. This generator runs the same pure
    kernels once per sentence and emits flat candidate columns; everything
    relational (first-evidence dedup, ids) stays in Spark.

    Semantics (identical to the oracle): earliest mention = subject, ties by
    entity id (src/builders/QA.py:80-84 first-match determinism); earliest
    predicate surface, ties by pid; every other-entity mention is an object.

    ``alias_pairs`` / ``pred_pairs`` may be plain lists or
    ``SparkContext.broadcast`` handles (preferred — one ship per executor).
    """
    from xwikire_spark.functions.udfs import (
        _compile_dictionary,
        unwrap_broadcast,
    )

    def generate(batches):
        import pandas as pd

        from xwikire_spark.kernels.segmenter import segment_sentences

        ap, aids = _compile_dictionary(unwrap_broadcast(alias_pairs))
        pp, pids = _compile_dictionary(unwrap_broadcast(pred_pairs))
        cols = ("conv_id", "turn_idx", "sent_idx", "sentence", "subj",
                "subj_surface", "pid", "p_surface", "obj", "obj_surface",
                "obj_start")
        for pdf in batches:
            # batch-local first-evidence dedup: min_by is associative, so
            # keeping only each key's batch winner is safe and cuts the
            # shuffled candidate volume roughly in half; Spark's min_by
            # aggregate finishes the cross-batch/cross-partition merge.
            best: dict = {}
            for conv, turn, text in zip(
                pdf["conv_id"].values, pdf["turn_idx"].values,
                pdf["text"].values,
            ):
                text = (text or "").strip()
                if not text or ap is None or pp is None:
                    continue
                for sent_idx, sent in enumerate(segment_sentences(text)):
                    ms = [
                        (m.start(), i, m.group())
                        for m in ap.finditer(sent)
                        for i in aids[m.group()]
                    ]
                    if len(ms) < 2:
                        continue
                    ps = [
                        (m.start(), i, m.group())
                        for m in pp.finditer(sent)
                        for i in pids[m.group()]
                    ]
                    if not ps:
                        continue
                    _, subj, subj_surface = min(ms)
                    _, pid, p_surface = min(ps)
                    for o_start, obj, obj_surface in ms:
                        if obj == subj:
                            continue
                        key = (conv, subj, pid, obj)
                        order = (turn, sent_idx, o_start)
                        prev = best.get(key)
                        if prev is None or order < prev[0]:
                            best[key] = (
                                order,
                                (conv, turn, sent_idx, sent, subj,
                                 subj_surface, pid, p_surface, obj,
                                 obj_surface, o_start),
                            )
            rows = [v[1] for v in best.values()]
            # column-wise construction: pandas' row-tuple path is ~5x slower
            data = list(zip(*rows)) if rows else [[] for _ in cols]
            yield pd.DataFrame(dict(zip(cols, data)))

    return generate


def _first_evidence(cands: DataFrame) -> DataFrame:
    """Candidate rows (CANDIDATE_SCHEMA) -> one evidence triple per
    (conv_id, subj, pid, obj): first-evidence dedup as a min_by hash
    aggregate (partial combine map-side) — not a row_number sort window;
    the shuffle carries one row per key per map partition."""
    first = cands.groupBy("conv_id", "subj", "pid", "obj").agg(
        F.min_by(
            F.struct(
                "turn_idx", "sent_idx", "sentence",
                "subj_surface", "p_surface", "obj_surface",
            ),
            F.struct("turn_idx", "sent_idx", "obj_start"),
        ).alias("ev")
    )
    return first.select(
        triple_id("subj", "pid", "obj").alias("id"),
        F.col("subj"),
        F.col("pid").alias("pred"),
        F.col("obj"),
        "conv_id",
        F.col("ev.turn_idx").alias("turn_idx"),
        F.col("ev.sent_idx").alias("sent_idx"),
        F.col("ev.sentence").alias("evidence"),
        F.col("ev.subj_surface").alias("subj_surface"),
        F.col("ev.p_surface").alias("pred_surface"),
        F.col("ev.obj_surface").alias("obj_surface"),
    )


# ---------------------------------------------------------------------------
# Full-JVM expression strategy: for dictionaries small enough to live in the
# plan, the ENTIRE kernel — segmentation, both dictionary automatons,
# candidate emission — compiles to Catalyst expressions. Zero Python in the
# hot path ("UDFs are the slow path"): whole-stage codegen end to end, and
# the 4→4N scaling of the flagship tracks the JVM instead of the
# Arrow-pipe + Python-worker share (measured: the fused kernel's Python CPU
# inflates ~40% from pinned 4 to 16 cores on this box; pure JVM ~10%).
# ---------------------------------------------------------------------------

# Characters on which Java (?U) regex and Python's re disagree — texts
# containing ANY of these route to the Python kernel (per-row parity beats
# speed; Python semantics are the spec: they are what the reference's
# \\b-regex distant supervision does):
# 1. whitespace: Python \\s / str.strip() treat 0x1C-0x1F as whitespace
#    (Unicode White_Space does not), and JVM-side sentence parts are
#    trimmed with Spark's ASCII-space trim — so any whitespace beyond
#    {space, newline} is out.
# 2. word chars: Java (?U)\\w includes combining marks (Mn/Mc/Me — e.g.
#    Kannada vowel signs), non-underscore connector punctuation (Pc) and
#    ZWJ/ZWNJ; Python \\w instead includes No numerics (like superscripts
#    and vulgar fractions). \\b sits on \\w transitions, so any such char
#    shifts match boundaries (caught live: the Kannada alias ends in a
#    vowel sign, so Java matched it before "." where Python does not).
_EXOTIC_WS = (
    "\t\x0b\x0c\r\x1c\x1d\x1e\x1f\x85\xa0\u1680"
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "\u2028\u2029\u202f\u205f\u3000"
)
_JVM_INELIGIBLE_PATTERN = (
    "["
    + _EXOTIC_WS
    + "\u200c\u200d"
    + r"\p{Mn}\p{Mc}\p{Me}\p{No}[\p{Pc}&&[^_]]"
    + "]"
)

# Cap on distinct dictionary surfaces for the in-plan strategy: beyond this
# the regex alternation literal and the surface->ids map literal bloat the
# plan (the IVF-centroid lesson: literals are a plan-size bomb at scale) and
# a backtracking alternation scan degrades in BOTH engines anyway — larger
# dictionaries use the broadcast pandas kernel, cluster-sized ones the join
# path.
JVM_MAX_SURFACES = 1000


def jvm_eligible() -> Column:
    """Rows the in-plan path may process with bit-exact Python parity."""
    return ~F.col("text").rlike(_JVM_INELIGIBLE_PATTERN)


def _java_dict_pattern(pairs: list[tuple[str, str]]) -> str | None:
    """The Java twin of udfs._compile_dictionary's regex: same
    longest-first alternation (leftmost-longest with finditer-consumption
    semantics in both engines), (?U) so \\b is unicode-aware like Python."""
    by_len = sorted({s for s, _ in pairs if s}, key=len, reverse=True)
    if not by_len:
        return None
    return r"(?U)\b(?:" + "|".join(re.escape(s) for s in by_len) + r")\b"


def _ids_map_lit(pairs: list[tuple[str, str]]) -> Column:
    """surface -> array<id> literal map (ids sorted; dedup'd)."""
    ids: dict[str, list[str]] = {}
    for s, i in pairs:
        if s and i not in ids.setdefault(s, []):
            ids[s].append(i)
    entries = []
    for s, v in ids.items():
        entries.append(F.lit(s))
        entries.append(F.array(*[F.lit(i) for i in sorted(v)]))
    return F.create_map(*entries)


def segment_turns_jvm(transcripts: DataFrame) -> DataFrame:
    """JVM twin of segment_turns for jvm_eligible() texts: collapse
    paragraphs, split on the segmenter's boundary regex (same pattern
    source — Java-compatible by construction), trim, drop empties,
    posexplode. One Generate evaluates the split chain once per row."""
    pat = "(?U)" + segmenter._BOUNDARY.pattern
    collapsed = F.replace(F.col("text"), F.lit("\n\n"), F.lit("\n"))
    sents = F.filter(
        F.transform(F.split(collapsed, pat), lambda p: F.trim(p)),
        lambda p: p != F.lit(""),
    )
    return transcripts.select(
        F.col("conv_id").cast("string").alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.posexplode(sents).alias("sent_idx", "sentence"),
    )


def candidates_jvm(
    transcripts: DataFrame,
    alias_pairs: list[tuple[str, str]],
    pred_pairs: list[tuple[str, str]],
) -> DataFrame:
    """CANDIDATE_SCHEMA rows via pure Catalyst expressions — the exact
    semantics of make_candidate_generator's kernel (earliest mention =
    subject with id tie-break, earliest predicate surface, every
    other-entity mention an object), proven equal by
    tests/test_pipeline.py's strategy-equivalence tests.

    Plan shape: each regex evaluates ONCE per row behind a Generate barrier
    (explode of a single-element array) — naive column reuse would make
    Catalyst re-inline the regexp_extract_all per downstream reference
    (the round-1/2 re-inlining trap, see tests/test_plans.py).

    ``obj_start`` carries the match INDEX, not the char offset: finditer
    order is positional, so per-sentence ordering — the only thing
    _first_evidence uses it for — is preserved.
    """
    apat, ppat = _java_dict_pattern(alias_pairs), _java_dict_pattern(pred_pairs)
    sentences = segment_turns_jvm(transcripts)
    g1 = sentences.select(
        "conv_id",
        "turn_idx",
        "sent_idx",
        "sentence",
        F.explode(
            F.array(
                F.struct(
                    F.regexp_extract_all("sentence", F.lit(apat), F.lit(0)).alias("am"),
                    F.regexp_extract_all("sentence", F.lit(ppat), F.lit(0)).alias("pm"),
                )
            )
        ).alias("r"),
    )

    # cheap necessary condition BEFORE id-expansion: a candidate sentence
    # needs >=1 alias match (>=2 post-expansion entries can come from a
    # single collision surface) and >=1 predicate match. This runs on raw
    # regexp arrays (attributes of g1's Generate — no regex re-evaluation)
    # and drops ~75% of sentences before the struct-building expansion,
    # which would otherwise dominate the whole path (measured 3.3s of a
    # 6.3s plan at 16 cores).
    g1 = g1.where(
        (F.size("r.am") >= 1) & (F.size("r.pm") >= 1)
    )

    def expand(matches: Column, ids_map: Column) -> Column:
        # one struct per (match, id): alias collisions emit one entry per id,
        # exactly like the kernel's `for i in aids[m.group()]`
        return F.flatten(
            F.transform(
                matches,
                lambda s, i: F.transform(
                    F.coalesce(
                        F.try_element_at(ids_map, s),
                        F.array().cast("array<string>"),
                    ),
                    lambda e: F.struct(
                        i.cast("int").alias("idx"),
                        e.alias("id"),
                        s.alias("sf"),
                    ),
                ),
            )
        )

    ms = expand(F.col("r.am"), _ids_map_lit(alias_pairs))
    ps = expand(F.col("r.pm"), _ids_map_lit(pred_pairs))
    g2 = g1.select(
        "conv_id",
        "turn_idx",
        "sent_idx",
        "sentence",
        F.explode(F.array(F.struct(ms.alias("ms"), ps.alias("ps")))).alias("q"),
    )
    # struct sort order (idx, id, sf) == the kernel's min(ms) tuple order
    # (start, id, surface): idx is monotone in start
    base = g2.where((F.size("q.ms") >= 2) & (F.size("q.ps") >= 1)).select(
        "conv_id",
        "turn_idx",
        "sent_idx",
        "sentence",
        F.element_at(F.array_sort("q.ms"), 1).alias("sb"),
        F.element_at(F.array_sort("q.ps"), 1).alias("pb"),
        F.col("q.ms").alias("ms"),
    )
    return (
        base.select(
            "conv_id",
            "turn_idx",
            "sent_idx",
            "sentence",
            F.col("sb.id").alias("subj"),
            F.col("sb.sf").alias("subj_surface"),
            F.col("pb.id").alias("pid"),
            F.col("pb.sf").alias("p_surface"),
            F.explode("ms").alias("m"),
        )
        .where(F.col("m.id") != F.col("subj"))
        .select(
            "conv_id",
            "turn_idx",
            "sent_idx",
            "sentence",
            "subj",
            "subj_surface",
            "pid",
            "p_surface",
            F.col("m.id").alias("obj"),
            F.col("m.sf").alias("obj_surface"),
            F.col("m.idx").alias("obj_start"),
        )
    )


def extract_triples(
    transcripts: DataFrame,
    alias_dict: DataFrame,
    predicate_dict: DataFrame,
    n_partitions: int | None = None,
    dict_strategy: str = "auto",
    jvm_max_surfaces: int = JVM_MAX_SURFACES,
    jvm_prefilter: bool | None = None,
) -> DataFrame:
    """The flagship query: transcripts -> (subj, pred, obj) evidence triples.

    Semantics: within one sentence, the earliest entity mention is the
    subject; every other mention with a different entity_id is an object;
    the earliest predicate surface is the relation. Exactly one evidence
    sentence per (conv_id, subj, pred, obj) — the first in
    (turn_idx, sent_idx, m_start) order (X5 first-match parity).

    ``dict_strategy`` — a three-tier ladder by dictionary size:
    - "jvm": dictionaries compile INTO the plan (regex alternation + map
      literals); segmentation + matching run as Catalyst expressions with
      zero Python for jvm_eligible() texts, the rest falling back to the
      fused kernel in the same job. Right for dictionaries up to
      ``jvm_max_surfaces`` distinct surfaces.
    - "broadcast": dictionaries collect to the driver once and ship to
      executors via SparkContext.broadcast; one fused mapInPandas does
      segmentation + both automatons + candidate emission. Right for
      dictionaries that fit executor memory but not the plan (the
      reference's whole property dictionary is a process dict,
      src/builders/MergedWikis.py:28).
    - "join": dictionaries NEVER leave the cluster — sentence word-runs
      meet the dictionary's first tokens in a shuffle equi-join
      (detect_mentions_join), candidates assemble relationally. Right for
      transcript-scale alias dictionaries (10^8+ surfaces) where a
      broadcast would OOM the executors.
    - "auto" (default): "broadcast". Measured head-to-head (pinned, same
      input, repl=1000): jvm 29.3 s vs broadcast 28.2 s at 4-wide, 10.8 vs
      9.8 s at 16-wide — the in-plan tier is per-core comparable but never
      faster, scales no better, and costs a second source scan, so it
      stays an explicit opt-in for plans that must avoid Python workers
      entirely. ("join" also stays explicit: only the caller knows the
      alias table is cluster-sized.)

    ``jvm_prefilter`` (broadcast strategy only; None = auto, on when the
    dictionaries fit the in-plan cap): a JVM-side ``rlike`` necessary-
    condition filter that drops turns containing no alias surface or no
    predicate surface BEFORE they ever reach the Python kernel. A candidate
    sentence needs >=1 alias and >=1 predicate surface (>=2 post-expansion
    mentions can come from one collision surface), sentences are substrings
    of the turn, and segmentation only splits/trims — so a turn failing the
    turn-level test cannot yield a candidate. Texts containing Java/Python
    regex-divergent characters (_JVM_INELIGIBLE_PATTERN) bypass the filter
    entirely, so a Java \\b miss can never drop a Python \\b match. Effect:
    the mapInPandas kernel sees only candidate-bearing turns (~25% of rows
    on the bench corpus), shrinking the Python CPU share that dominates
    this pipeline's scaling exposure on shared hosts.

    All four produce value-identical results
    (tests/test_pipeline.py strategy-equivalence tests, which run the
    broadcast path with the prefilter both on and off).
    """
    if n_partitions:
        # explicit repartition by conv hash (north_rule); downstream
        # aggregations reuse this hash family.
        transcripts = transcripts.repartition(n_partitions, F.col("conv_id"))

    if dict_strategy == "join":
        return extract_triples_join(transcripts, alias_dict, predicate_dict)

    alias_pairs = _alias_surface_ids(alias_dict)
    pred_pairs = _predicate_surface_ids(predicate_dict)
    n_surfaces = max(
        len({s for s, _ in alias_pairs}), len({s for s, _ in pred_pairs})
    )
    if dict_strategy == "auto":
        dict_strategy = "broadcast"
    if dict_strategy == "jvm" and not (
        0 < min(len(alias_pairs), len(pred_pairs))
        and n_surfaces <= jvm_max_surfaces
    ):
        # explicit jvm request outside its envelope (empty dictionary or
        # above the plan-size cap) degrades to the fused kernel — LOUDLY,
        # because callers pick jvm precisely to avoid Python workers
        import warnings

        warnings.warn(
            f"dict_strategy='jvm' needs non-empty dictionaries with at "
            f"most {jvm_max_surfaces} surfaces (got {n_surfaces}); "
            f"falling back to the broadcast Python kernel",
            RuntimeWarning,
            stacklevel=2,
        )
        dict_strategy = "broadcast"

    # SINGLE Python pass (fused mapInPandas): segmentation + both automatons
    # + candidate emission. Chained per-column UDFs cost 3 Arrow round-trips
    # and re-execute in each DAG branch — measured 3-5x the kernel cost.
    gen = make_candidate_generator(
        _bc(transcripts, alias_pairs), _bc(transcripts, pred_pairs)
    )
    narrow = transcripts.select("conv_id", "turn_idx", "text")
    if dict_strategy == "jvm":
        # in-plan hot path + Python-kernel fallback for texts whose
        # whitespace Java and Python disagree on; a turn goes to exactly
        # one branch, and _first_evidence's min_by never compares
        # obj_start across branches (turn_idx/sent_idx decide first).
        # Cost: the source is scanned twice (both scans column-pruned and
        # filter-pushed); the alternative ships every row through Python.
        eligible = jvm_eligible()
        cands = candidates_jvm(
            narrow.where(eligible), alias_pairs, pred_pairs
        ).unionByName(
            narrow.where(~eligible).mapInPandas(gen, CANDIDATE_SCHEMA)
        )
    else:
        if jvm_prefilter is None:
            jvm_prefilter = 0 < n_surfaces <= jvm_max_surfaces
        apat = _java_dict_pattern(alias_pairs)
        ppat = _java_dict_pattern(pred_pairs)
        if jvm_prefilter and apat and ppat:
            # JVM pre-filter: a turn with no alias surface or no predicate
            # surface cannot produce a candidate (necessary condition —
            # see the docstring); regex-divergent texts bypass it so the
            # decision is always made with Python-parity semantics. This
            # runs in whole-stage codegen before the Arrow hop, so ~75%
            # of turns never cross into Python at all.
            keep = F.col("text").rlike(_JVM_INELIGIBLE_PATTERN) | (
                F.col("text").rlike(apat) & F.col("text").rlike(ppat)
            )
            narrow = narrow.where(keep)
        cands = narrow.mapInPandas(gen, CANDIDATE_SCHEMA)
    return _first_evidence(cands)


# ---------------------------------------------------------------------------
# Join-based mention path: for dictionaries too large to broadcast.
# ---------------------------------------------------------------------------

_MATCH_STRUCT = (
    "struct<start:int,neg_len:int,entity_id:string,surface:string,end:int>"
)


def _greedy_kept(ms_col: Column) -> Column:
    """Greedy leftmost-longest fold over a SORTED match-struct array —
    the regex automaton's finditer-consumption semantics (an earlier
    longer match consumes the text under it; same-span alias collisions
    all emit) as an aggregate fold. Shared by detect_mentions_join and
    the fused extract_triples_join path."""
    acc0 = F.struct(
        F.lit(-1).alias("last_start"),
        F.lit(0).alias("cur_end"),
        F.array().cast(f"array<{_MATCH_STRUCT}>").alias("kept"),
    )

    def step(acc, x):
        take = (x["start"] >= acc["cur_end"]) | (
            (x["start"] == acc["last_start"]) & (x["end"] == acc["cur_end"])
        )
        return F.when(
            take,
            F.struct(
                x["start"].alias("last_start"),
                x["end"].alias("cur_end"),
                F.array_append(acc["kept"], x).alias("kept"),
            ),
        ).otherwise(acc)

    return F.aggregate(ms_col, acc0, step)["kept"]


def detect_mentions_join(
    sentences: DataFrame,
    pairs: DataFrame,
    keys: tuple[str, ...] = ("conv_id", "turn_idx", "sent_idx"),
    tag_col: str | None = None,
) -> DataFrame:
    """Dictionary mention detection WITHOUT shipping the dictionary: the
    scale path when the alias table itself is cluster-sized.

    Shape (all relational after a dictionary-free tokenizer UDF):
    1. sentences -> (word-run token, char offset) rows — no dictionary in
       the Python closure, just unicode \\w+ runs;
    2. shuffle equi-join token == first word-run of each alias (the only
       contact point between corpus and dictionary — scales as a plain
       join, AQE handles hot first-tokens);
    3. verify the full surface by substring equality at the candidate
       offset + a word-boundary check after it (word-run starts are
       boundaries by construction);
    4. greedy leftmost-longest overlap resolution per sentence — the regex
       automaton's finditer-consumption semantics (an earlier longer match
       consumes the text under it; same-span alias collisions all emit) as
       a sort_array + aggregate fold over the per-sentence match list.

    Contract: aliases must start and end with word characters (regex \\b
    parity); matching is case-sensitive like the broadcast path.

    Input ``pairs``: DataFrame (alias, entity_id[, tag_col]). Output
    matches detect_mentions: keys + sentence[, tag_col], surface,
    entity_id, m_start, m_end. When ``tag_col`` is given (several
    dictionaries sharing ONE tokenize+join pass), the greedy overlap
    resolution runs per (sentence, tag) — each dictionary consumes text
    independently, exactly like separate automatons.
    """
    from xwikire_spark.functions.udfs import word_offsets_udf

    ks = list(keys)
    tag = [tag_col] if tag_col else []
    toks = sentences.select(
        *ks, "sentence", F.explode(word_offsets_udf(F.col("sentence"))).alias("w")
    ).select(*ks, "sentence", F.col("w.tok").alias("tok"), F.col("w.pos").alias("pos"))

    # The starts/ends-with-word-char contract from the docstring, ENFORCED
    # in the plan (ADVICE r2): a violating alias (e.g. '-foo') would
    # otherwise be keyed on its first interior word-run and then silently
    # never pass substring verification — dropping recall with no signal.
    # Rows failing the contract are excluded here, visibly, as dictionary
    # hygiene rather than a quiet per-row no-op.
    contract = F.col("alias").rlike(r"(?Us)^\w(.*\w)?$")
    dic = (
        pairs.select("alias", "entity_id", *tag)
        .where(F.col("alias").isNotNull() & contract)
        .distinct()
        .withColumn("tok", F.regexp_extract("alias", r"(?U)\w+", 0))
        .where(F.col("tok") != "")
    )

    # shuffled-hash with the dictionary as build side (see the r7 note in
    # extract_triples_join: Catalyst's post-UDF size estimates otherwise
    # pick the corpus as the broadcast build)
    cand = toks.join(dic.hint("shuffle_hash"), "tok")
    after = F.substring(
        F.col("sentence"), F.col("pos") + F.length("alias") + 1, 1
    )
    verified = cand.where(
        (
            F.substring(F.col("sentence"), F.col("pos") + 1, F.length("alias"))
            == F.col("alias")
        )
        & ~F.coalesce(F.regexp_like(after, F.lit(r"(?U)\w")), F.lit(False))
    )

    m = verified.select(
        *ks,
        "sentence",
        *tag,
        F.struct(
            F.col("pos").cast("int").alias("start"),
            (-F.length("alias")).cast("int").alias("neg_len"),
            F.col("entity_id").alias("entity_id"),
            F.col("alias").alias("surface"),
            (F.col("pos") + F.length("alias")).cast("int").alias("end"),
        ).alias("m"),
    )
    grouped = m.groupBy(*ks, "sentence", *tag).agg(
        F.sort_array(F.collect_list("m")).alias("ms")
    )
    # greedy fold: sorted by (start asc, longest first, id); accept a match
    # when it starts at/after the consumed frontier, or shares the exact
    # span of the last accepted match (alias collision -> one mention per id)
    kept = _greedy_kept(F.col("ms"))
    return grouped.select(
        *ks, "sentence", *tag, F.explode(kept).alias("k")
    ).select(
        *ks,
        "sentence",
        *tag,
        F.col("k.surface").alias("surface"),
        F.col("k.entity_id").alias("entity_id"),
        F.col("k.start").alias("m_start"),
        F.col("k.end").alias("m_end"),
    )


def _predicate_pairs_df(predicate_dict: DataFrame) -> DataFrame:
    """(alias, entity_id=pid) rows over label + aliases — the DataFrame
    twin of _predicate_surface_ids, never collected."""
    lab = predicate_dict.select(
        F.col("label").alias("alias"), F.col("pid").alias("entity_id")
    )
    ali = predicate_dict.select(
        F.explode(F.coalesce("aliases", F.array())).alias("alias"),
        F.col("pid").alias("entity_id"),
    )
    return lab.unionByName(ali)


def extract_triples_join(
    transcripts: DataFrame,
    alias_dict: DataFrame,
    predicate_dict: DataFrame,
) -> DataFrame:
    """extract_triples' "join" strategy: same semantics, dictionaries stay
    distributed.

    Plan shape (engineered — see tests/test_plans.py): BOTH dictionaries
    union into one tagged table, so tokenization + the dictionary join run
    ONCE (a naive mentions/predicates split re-evaluates the Python
    tokenizer subtree per branch — measured 6 ArrowEval stages / 9
    exchanges).

    r7 optimization (guide §4.1 + §2.4, before/after plans in
    plans/r07/kg_triples_joinpath_*.txt): segmentation + word-run offsets
    run as ONE fused pandas UDF (was two chained ArrowEval stages — every
    sentence crossed the Arrow boundary twice), and the per-sentence
    subject/predicate selection folds into the SAME aggregate that
    collects the match lists (one sorted list per dictionary tag, greedy
    fold per tag) — the separate min-over-window pass, whose extra
    Exchange + sort carried every match row a second time, is gone.
    Value-identical: the per-tag sorted collect_list is exactly the
    per-(sentence, tag) list the old groupBy built, the fold is the same
    ``_greedy_kept``, and the old window-min over (m_start, entity_id,
    surface) equals element 1 of the folded list (entries are sorted by
    (start, neg_len, id, ...) and distinct starts — same-span collisions
    excepted, where both orders tie-break by entity_id)."""
    from xwikire_spark.functions.udfs import segment_word_offsets_udf

    ks = ["conv_id", "turn_idx", "sent_idx"]
    # (A keys-only token shuffle + a sentence attach-back join was
    # prototyped here — guide §8 "shuffle metadata, not payloads" — but
    # column pruning diverges the two consumers' subtrees below any
    # shared exchange, so the Python stage runs twice; measured net-worse
    # than one sentence-carrying shuffle. See OPTIMIZATION_r07.md.)
    sentences = (
        transcripts.where(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "conv_id",
            "turn_idx",
            F.posexplode(segment_word_offsets_udf(F.col("text"))).alias(
                "sent_idx", "s"
            ),
        )
        .select(
            "conv_id",
            "turn_idx",
            "sent_idx",
            F.col("s.sentence").alias("sentence"),
            F.col("s.ws").alias("ws"),
        )
    )
    toks = sentences.select(
        *ks, "sentence", F.explode("ws").alias("w")
    ).select(
        *ks, "sentence",
        F.col("w.tok").alias("tok"), F.col("w.pos").alias("pos"),
    )

    tagged = alias_dict.select(
        "alias", "entity_id", F.lit("E").alias("tag")
    ).unionByName(
        _predicate_pairs_df(predicate_dict).select(
            "alias", "entity_id", F.lit("P").alias("tag")
        )
    )
    # same dictionary hygiene contract as detect_mentions_join
    contract = F.col("alias").rlike(r"(?Us)^\w(.*\w)?$")
    dic = (
        tagged.where(F.col("alias").isNotNull() & contract)
        .distinct()
        .withColumn("tok", F.regexp_extract("alias", r"(?U)\w+", 0))
        .where(F.col("tok") != "")
    )

    # r7: pin the join to SHUFFLED HASH with the dictionary as build side.
    # Catalyst's size estimate below the Python stage is garbage, and at
    # bench scale it chose BuildLeft — broadcasting the 3M-row tokenized
    # CORPUS (the whole ArrowEval chain collected through the driver) and
    # streaming the dictionary. The hint keeps the operator's contract
    # (the dictionary never leaves the cluster — it meets the tokens in a
    # shuffle, the honest at-scale shape) while building the per-partition
    # hash from the side that is bounded per partition.
    cand = toks.join(dic.hint("shuffle_hash"), "tok")
    after = F.substring(
        F.col("sentence"), F.col("pos") + F.length("alias") + 1, 1
    )
    verified = cand.where(
        (
            F.substring(F.col("sentence"), F.col("pos") + 1, F.length("alias"))
            == F.col("alias")
        )
        & ~F.coalesce(F.regexp_like(after, F.lit(r"(?U)\w")), F.lit(False))
    )
    mstruct = F.struct(
        F.col("pos").cast("int").alias("start"),
        (-F.length("alias")).cast("int").alias("neg_len"),
        F.col("entity_id").alias("entity_id"),
        F.col("alias").alias("surface"),
        (F.col("pos") + F.length("alias")).cast("int").alias("end"),
    )
    m = verified.select(*ks, "sentence", "tag", mstruct.alias("m"))
    grouped = m.groupBy(*ks, "sentence").agg(
        F.sort_array(
            F.collect_list(F.when(F.col("tag") == "E", F.col("m")))
        ).alias("ms_e"),
        F.sort_array(
            F.collect_list(F.when(F.col("tag") == "P", F.col("m")))
        ).alias("ms_p"),
    )
    # Generate barrier: fold each tag's list ONCE (downstream references
    # ke twice — subject pick + object explode — and projection collapse
    # would re-inline the aggregate fold per reference)
    g = grouped.select(
        *ks,
        "sentence",
        F.explode(
            F.array(
                F.struct(
                    _greedy_kept(F.col("ms_e")).alias("ke"),
                    _greedy_kept(F.col("ms_p")).alias("kp"),
                )
            )
        ).alias("r"),
    )
    sb = F.element_at(F.col("r.ke"), 1)
    pb = F.element_at(F.col("r.kp"), 1)
    cands = (
        g.where((F.size("r.ke") >= 1) & (F.size("r.kp") >= 1))
        .select(
            *ks,
            "sentence",
            sb["entity_id"].alias("subj"),
            sb["surface"].alias("subj_surface"),
            pb["entity_id"].alias("pid"),
            pb["surface"].alias("p_surface"),
            F.explode("r.ke").alias("k"),
        )
        .where(F.col("k.entity_id") != F.col("subj"))
        .select(
            *ks,
            "sentence",
            "subj",
            "subj_surface",
            "pid",
            "p_surface",
            F.col("k.entity_id").alias("obj"),
            F.col("k.surface").alias("obj_surface"),
            F.col("k.start").alias("obj_start"),
        )
    )
    return _first_evidence(cands)


def pair_mentions_in_window(
    mentions: DataFrame, max_turn_distance: int = 2
) -> DataFrame:
    """Conversation-window mention pairing (north_star: "aligning linked
    mention pairs within conversation windows").

    Pairs distinct entities whose mentions occur within
    ``max_turn_distance`` turns of each other in the same conversation.
    Implemented as a bucketed range join: each mention lands in bucket
    ``turn_idx / (d+1)`` and joins its own and the adjacent bucket only —
    a self-join on (conv_id, bucket) with a |Δturn| predicate, instead of a
    full per-conversation cross join. Scale: buckets keep the join fan-out
    O(mentions_per_window²), independent of conversation length.
    """
    d = max_turn_distance
    m = mentions.select(
        "conv_id", "turn_idx", "entity_id",
        (F.col("turn_idx") / (d + 1)).cast("long").alias("bucket"),
    ).dropDuplicates(["conv_id", "turn_idx", "entity_id"])

    in_range = (F.col("b.turn_idx") - F.col("a.turn_idx")).between(0, d)
    canonical_order = (F.col("b.turn_idx") > F.col("a.turn_idx")) | (
        (F.col("b.turn_idx") == F.col("a.turn_idx"))
        & (F.col("a.entity_id") < F.col("b.entity_id"))
    )
    distinct_entities = F.col("a.entity_id") != F.col("b.entity_id")

    pairs = None
    for shift in (0, 1):  # partner is in my bucket or the next one
        right = m.withColumn("bucket", F.col("bucket") - shift).alias("b")
        p = (
            m.alias("a")
            .join(right, ["conv_id", "bucket"])
            .where(in_range & canonical_order & distinct_entities)
            .select(
                "conv_id",
                F.col("a.entity_id").alias("entity_a"),
                F.col("b.entity_id").alias("entity_b"),
                F.col("a.turn_idx").alias("turn_a"),
                F.col("b.turn_idx").alias("turn_b"),
            )
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.dropDuplicates(
        ["conv_id", "entity_a", "entity_b", "turn_a", "turn_b"]
    )
