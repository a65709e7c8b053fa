"""Profile one scale_probe run: sample cumulative CPU of the probe's
process tree, split java vs python, and report utilization.

Usage: python scripts/profile_probe.py <cores> <repl> [job]

Launches `taskset -c 0-<cores-1> python scripts/scale_probe.py ...` and
polls /proc every 0.25 s, summing utime+stime per pid grouped by comm.
Exited pids keep their last-seen total (slight undercount of short-lived
workers between polls; pyspark daemons and the JVM live for the whole run,
so the split is accurate where it matters).

Output: the probe's own JSON line, then one profile JSON line:
{cpu_java, cpu_python, cpu_other, wall, cores, utilization}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CLK = os.sysconf("SC_CLK_TCK")


def descendants(root: int) -> list[int]:
    kids = {root}
    frontier = [root]
    while frontier:
        pid = frontier.pop()
        try:
            tids = os.listdir(f"/proc/{pid}/task")
        except OSError:
            continue
        for tid in tids:  # children forked from ANY thread (JVM daemons)
            try:
                with open(f"/proc/{pid}/task/{tid}/children") as f:
                    for c in f.read().split():
                        c = int(c)
                        if c not in kids:
                            kids.add(c)
                            frontier.append(c)
            except OSError:
                pass
    return sorted(kids)


def cpu_of(pid: int) -> tuple[str, float] | None:
    try:
        with open(f"/proc/{pid}/stat") as f:
            s = f.read()
    except OSError:
        return None
    # comm may contain spaces/parens: split around the last ')'
    comm = s[s.index("(") + 1 : s.rindex(")")]
    rest = s[s.rindex(")") + 2 :].split()
    utime, stime = int(rest[11]), int(rest[12])
    return comm, (utime + stime) / CLK


def main() -> None:
    cores = int(sys.argv[1])
    args = sys.argv[1:]
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        sys.executable, "scripts/scale_probe.py", *args,
    ]
    t0 = time.time()
    proc = subprocess.Popen(cmd)
    seen: dict[int, tuple[str, float]] = {}
    while proc.poll() is None:
        for pid in descendants(proc.pid):
            got = cpu_of(pid)
            if got:
                seen[pid] = got
        time.sleep(0.25)
    wall = time.time() - t0
    by = {"java": 0.0, "python": 0.0, "other": 0.0}
    for comm, cpu in seen.values():
        if "java" in comm:
            by["java"] += cpu
        elif "python" in comm:
            by["python"] += cpu
        else:
            by["other"] += cpu
    total = sum(by.values())
    n_py = sum(1 for comm, _ in seen.values() if "python" in comm)
    print(json.dumps({
        "cores": cores,
        "n_python_pids": n_py,
        "wall_total": round(wall, 1),
        "cpu_java": round(by["java"], 1),
        "cpu_python": round(by["python"], 1),
        "cpu_other": round(by["other"], 1),
        "python_share": round(by["python"] / total, 3) if total else None,
        "tree_utilization_of_pins": round(total / (wall * cores), 3),
    }))


if __name__ == "__main__":
    main()
