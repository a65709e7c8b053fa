"""One scaling measurement in a fresh process: python scripts/scale_probe.py
<cores> <repl> [job]  -> prints JSON {cores, repl, sec, n, tps}.

job: "pipeline" (default) = full pandas-UDF extraction over replicated
synthetic transcripts; "kglite" = JVM-only flagship over replicated sf0.1
documents-derived turns.
"""

from __future__ import annotations

import json
import os
import sys
import time

_CLK = os.sysconf("SC_CLK_TCK")


def _tree_cpu() -> dict[str, float]:
    """Cumulative utime+stime (sec) of this process tree, split java vs
    python — the probe is the parent of the JVM, which parents the pyspark
    daemons/workers. Deltas around a timed run show where the CPU went
    (exited workers between snapshots undercount slightly; daemons and the
    JVM persist, so the split is accurate where it matters)."""
    by = {"java": 0.0, "python": 0.0}
    kids, frontier = {os.getpid()}, [os.getpid()]
    while frontier:
        pid = frontier.pop()
        try:
            tids = os.listdir(f"/proc/{pid}/task")
        except OSError:
            continue
        for tid in tids:  # JVM forks daemons from non-main threads
            try:
                with open(f"/proc/{pid}/task/{tid}/children") as f:
                    for c in map(int, f.read().split()):
                        if c not in kids:
                            kids.add(c)
                            frontier.append(c)
            except OSError:
                pass
    for pid in kids:
        try:
            with open(f"/proc/{pid}/stat") as f:
                s = f.read()
        except OSError:
            continue
        comm = s[s.index("(") + 1 : s.rindex(")")]
        rest = s[s.rindex(")") + 2 :].split()
        cpu = (int(rest[11]) + int(rest[12])) / _CLK
        by["java" if "java" in comm else "python"] = (
            by.get("java" if "java" in comm else "python", 0.0) + cpu
        )
    return by

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from xwikire_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    repl = int(sys.argv[2])
    job = sys.argv[3] if len(sys.argv) > 3 else "pipeline"

    s = get_spark(
        f"scale-{job}-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * 2,
        extra_conf={
            "spark.local.dir": "/dev/shm/spark-tmp",
            # 64k-row Arrow batches: short transcript rows at the default
            # 10k rows/batch leave the JVM<->Python pipe per-batch-overhead
            # bound at high core counts (measured ~20% at local[16],
            # neutral at local[4])
            "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
            # this VM's page-fault path is pathologically slow (cold
            # first-touch 0.2 GB/s vs 9-16 GB/s warm): pre-touch the heap
            # once at startup and use the throughput collector — measured
            # ~20% off JVM CPU at 16-wide, neutral at 4-wide
            "spark.driver.extraJavaOptions":
                "-XX:+UseParallelGC -XX:+AlwaysPreTouch",
        },
    )
    s.sparkContext.setLogLevel("ERROR")

    if job in ("pipeline", "broadcast", "jvm", "joinpath", "nopre"):
        # job name doubles as dict_strategy: "pipeline" = the production
        # default ("auto"); the explicit names pin one tier for A/B probes;
        # "nopre" = broadcast with the r4 JVM pre-filter disabled.
        from xwikire_spark import datagen
        from xwikire_spark.pipeline.extraction import extract_triples

        strategy = "auto" if job == "pipeline" else (
            "join" if job == "joinpath" else
            "broadcast" if job == "nopre" else job
        )
        prefilter = None if job != "nopre" else False
        rows, _ = datagen.generate_transcripts(n_convs=400, turns_per_conv=12)
        t = s.createDataFrame(pd.DataFrame(rows))
        # 4 tasks per core: stragglers amortize (one slow task idles a core
        # for 1/4 of a wave, not a whole wave — measured ~10% at local[16])
        big = (
            s.range(0, repl, 1, numPartitions=cores * 4)
            .crossJoin(F.broadcast(t))
            .select(
                F.concat_ws("-", "conv_id", "id").alias("conv_id"),
                "turn_idx", "role", "text", "tool", "ts",
            )
        )
        al = s.createDataFrame(pd.DataFrame(datagen.alias_rows()))
        pr = s.createDataFrame(pd.DataFrame(datagen.predicate_rows()))

        def run():
            # no input repartition: mapInPandas consumes range partitions
            # directly; the only shuffle is the first-evidence aggregate.
            return extract_triples(
                big, al, pr, dict_strategy=strategy, jvm_prefilter=prefilter
            ).count()

        n_units = repl * 4800
    else:
        import __spark_entry__ as e

        turns = e.kg_turns_df(s, os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
        big = (
            s.range(repl)
            .crossJoin(F.broadcast(turns))
            .select(
                F.concat_ws("-", "conv_id", "id").alias("conv_id"),
                "turn_idx", "text",
            )
        )

        def run():
            return e.kg_triples_from_turns(big).count()

        n_units = None

    def _calibrate() -> float:
        """Pure-CPU mp.Pool ceiling probe (same extraction kernel, same
        pinned cores, zero Spark) run as a subprocess INSIDE this
        measurement window — bracketing the timed runs samples the same
        host interference the Spark runs saw, which a detached 10 s
        calibration minutes away does not (observed ceiling swings of
        0.4-1.6 from window mismatch)."""
        import subprocess

        turns = os.environ.get("SPARK_GRAFT_CALIB_TURNS", "600000")
        out = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "kernel_calibrate.py"),
             str(cores), turns],
            capture_output=True, text=True, check=True,
        ).stdout.strip().splitlines()[-1]
        return json.loads(out)["sec"]

    run()  # warm-up: codegen + python workers
    calib_pre = _calibrate()
    # 3 warm runs inside ONE process (fresh processes per LEVEL stay
    # mandatory — stacked sessions degrade). Both the median and the MIN
    # are reported: host interference is strictly one-sided (co-tenants
    # only ever slow a run down), so the min is the standard estimator of
    # the uninterfered runtime (cf. timeit docs); the median tracks what
    # the shared box actually delivered.
    samples = []
    cpus = []
    n = 0
    for _ in range(3):
        c0 = _tree_cpu()
        t0 = time.time()
        n = run()
        dt_i = time.time() - t0
        c1 = _tree_cpu()
        samples.append(dt_i)
        cpus.append({
            "java": round(c1["java"] - c0["java"], 1),
            "python": round(c1["python"] - c0["python"], 1),
            "util": round(
                (sum(c1.values()) - sum(c0.values())) / (dt_i * cores), 3
            ),
        })
    calib_post = _calibrate()
    dt = sorted(samples)[1]
    print(json.dumps({
        "job": job, "cores": cores, "repl": repl, "sec": round(dt, 3),
        "sec_min": round(min(samples), 3),
        "samples_sec": [round(x, 3) for x in samples],
        "run_cpu": cpus,
        "calib_sec": round((calib_pre + calib_post) / 2, 3),
        "calib_pre": round(calib_pre, 3),
        "calib_post": round(calib_post, 3),
        "n_triples": n, "tps": round(n / dt, 1), "turns": n_units,
    }))
    s.stop()


if __name__ == "__main__":
    main()
