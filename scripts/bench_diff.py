"""Per-query round-over-round bench comparison.

Usage:
    python scripts/bench_diff.py [old.json new.json]

With no arguments, picks the two most recent BENCH_r*.json at the repo
root. Accepts either the driver's wrapper shape ({"parsed": {...}}) or a
raw bench.py line. Prints one table over the common query subset plus the
totals, so a round's regressions are read from one place instead of
reconciling JSON tails by hand (VERDICT r3, Next round #8).
"""

from __future__ import annotations

import glob
import json
import os
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    return d.get("parsed", d)


def main() -> None:
    if len(sys.argv) == 3:
        old_p, new_p = sys.argv[1], sys.argv[2]
    else:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        rounds = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
        if len(rounds) < 2:
            sys.exit("need two BENCH_r*.json files (or pass two paths)")
        old_p, new_p = rounds[-2], rounds[-1]

    old, new = load(old_p), load(new_p)
    qo, qn = old.get("queries", {}), new.get("queries", {})
    common = [k for k in qn if k in qo]  # new-round order
    added = [k for k in qn if k not in qo]
    dropped = [k for k in qo if k not in qn]

    w = max((len(k) for k in qn), default=10) + 2
    print(f"{os.path.basename(old_p)} -> {os.path.basename(new_p)}")
    print(f"{'query':<{w}}{'old_s':>8}{'new_s':>8}{'ratio':>8}  flag")
    worst = 1.0
    for k in common:
        r = qn[k] / qo[k] if qo[k] else float("inf")
        worst = max(worst, r)
        flag = ""
        if r >= 2.0:
            flag = "REGRESSION"
        elif r >= 1.3:
            flag = "slower"
        elif r <= 0.77:
            flag = "faster"
        print(f"{k:<{w}}{qo[k]:>8.3f}{qn[k]:>8.3f}{r:>8.2f}  {flag}")
    to, tn = sum(qo[k] for k in common), sum(qn[k] for k in common)
    print(
        f"{'TOTAL (common)':<{w}}{to:>8.3f}{tn:>8.3f}"
        f"{(tn / to if to else 0):>8.2f}"
    )
    for k in added:
        print(f"{k:<{w}}{'-':>8}{qn[k]:>8.3f}        (new)")
    for k in dropped:
        print(f"{k:<{w}}{qo[k]:>8.3f}{'-':>8}        (dropped)")
    for field in ("triples_per_sec", "value",
                  "scaling_efficiency_paired_median",
                  "scaling_efficiency_normalized_median"):
        if field in old or field in new:
            print(f"{field}: {old.get(field, '-')} -> {new.get(field, '-')}")
    sys.exit(1 if worst >= 2.0 else 0)


if __name__ == "__main__":
    main()
