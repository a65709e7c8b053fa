"""Pure-CPU weak-scaling calibration for this host: N worker processes each
do IDENTICAL fixed work; the per-process slowdown from 4-wide to 16-wide is
the hardware ceiling (all-core turbo + shared memory bus) that NO Spark job
on this box can beat. Print JSON {width, sec} where sec = median worker
wall time.

Usage: python scripts/cpu_calibrate.py <width>
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import sys
import time

WORK_ITERS = 2_000_000


def _worker(_: int) -> float:
    t0 = time.time()
    h = b"seed"
    for _ in range(WORK_ITERS):
        h = hashlib.md5(h).digest()
    return time.time() - t0


def main() -> None:
    width = int(sys.argv[1])
    with mp.Pool(width) as pool:
        times = pool.map(_worker, range(width))
    times.sort()
    med = times[len(times) // 2]
    print(json.dumps({"width": width, "sec": round(med, 3),
                      "max_sec": round(max(times), 3)}))


if __name__ == "__main__":
    main()
