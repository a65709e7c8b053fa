"""Weak-scaling calibration with the ACTUAL extraction kernel, no Spark:
N forked workers each run segment+automaton over the SAME in-memory turn
batch. Per-worker wall inflation from 4-wide to 16-wide isolates the
hardware ceiling (turbo + memory bandwidth on real string traffic) from
Spark overheads. Usage: python scripts/kernel_calibrate.py <width> [turns]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from xwikire_spark import datagen  # noqa: E402
from xwikire_spark.functions.udfs import _compile_dictionary  # noqa: E402
from xwikire_spark.kernels.segmenter import segment_sentences  # noqa: E402

N_TURNS = int(sys.argv[2]) if len(sys.argv) > 2 else 75_000

rows, _ = datagen.generate_transcripts(n_convs=400, turns_per_conv=12)
TEXTS = [r["text"] for r in rows]
TEXTS = (TEXTS * (N_TURNS // len(TEXTS) + 1))[:N_TURNS]
_alias_pairs = [(r["alias"], r["entity_id"]) for r in datagen.alias_rows()]
_pred_pairs = [
    (s, r["pid"])
    for r in datagen.predicate_rows()
    for s in [r["label"], *(r["aliases"] or [])]
]
AP, AIDS = _compile_dictionary(_alias_pairs)
PP, PIDS = _compile_dictionary(_pred_pairs)


def _worker(_: int) -> float:
    t0 = time.time()
    n = 0
    for text in TEXTS:
        for sent in segment_sentences(text.strip()):
            ms = [
                (m.start(), i, m.group())
                for m in AP.finditer(sent)
                for i in AIDS[m.group()]
            ]
            if len(ms) < 2:
                continue
            ps = [
                (m.start(), i, m.group())
                for m in PP.finditer(sent)
                for i in PIDS[m.group()]
            ]
            n += len(ms) if ps else 0
    return time.time() - t0


def main() -> None:
    width = int(sys.argv[1])
    with mp.Pool(width) as pool:
        times = sorted(pool.map(_worker, range(width)))
    print(json.dumps({
        "width": width, "turns_each": N_TURNS,
        "sec": round(times[len(times) // 2], 3),
        "max_sec": round(times[-1], 3),
    }))


if __name__ == "__main__":
    main()
