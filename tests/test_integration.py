"""End-to-end integration: the full QA-dataset construction chain over the
synthetic transcript corpus — extraction -> QA positives -> pairwise
negatives -> template assembly -> JSONL round-trip (the qa.py entry path,
SURVEY §3.2)."""

import pandas as pd
from pyspark.sql import functions as F

from xwikire_spark import datagen
from xwikire_spark.pipeline.extraction import extract_triples
from xwikire_spark.pipeline.negatives import generate_negatives
from xwikire_spark.pipeline.qa import assemble_qa_examples
from xwikire_spark.sources.io import read_jsonl, write_jsonl


def test_full_qa_chain(spark, tmp_path):
    rows, _ = datagen.generate_transcripts(n_convs=30, turns_per_conv=10)
    transcripts = spark.createDataFrame(pd.DataFrame(rows))
    alias_df = spark.createDataFrame(pd.DataFrame(datagen.alias_rows()))
    pred_df = spark.createDataFrame(pd.DataFrame(datagen.predicate_rows()))

    # 1. distant-supervision triples -> QA positive rows
    triples = extract_triples(transcripts, alias_df, pred_df)
    positives = triples.select(
        "conv_id",
        F.lit("wikibase").alias("type"),
        F.col("pred").alias("prop_id"),
        F.col("pred_surface").alias("relation"),
        F.col("evidence").alias("sentence"),
        F.col("obj_surface").alias("answer"),
        "id",
        F.col("subj_surface").alias("entity_label"),
        F.lit("").alias("entity_article"),
        F.lit("positive").alias("example"),
    )
    n_pos = positives.count()
    assert n_pos > 50

    # 2. within-conversation pairwise negatives (J5)
    negatives = generate_negatives(positives)
    n_neg = negatives.count()
    assert n_neg > 0
    # negatives borrow the OTHER example's sentence and have empty answers
    assert negatives.where(F.col("answer") != "").count() == 0

    # 3. template assembly over the union
    templates = spark.createDataFrame(pd.DataFrame(
        [{"prop_id": p, "template": f"What is {l} of XXX?"}
         for p, l, _ in datagen.PREDICATES]))
    all_rows = positives.unionByName(
        negatives.select(
            "conv_id", "type", "prop_id", "relation", "sentence",
            "answer", "id", "example",
        )
        .withColumn("entity_label", F.lit("entity"))
        .withColumn("entity_article", F.lit("")),
    )
    examples = assemble_qa_examples(all_rows, templates)

    pos_ex = examples.where(F.col("example") == "positive")
    neg_ex = examples.where(F.col("example") == "negative")
    assert pos_ex.count() > 0 and neg_ex.count() > 0
    # every surviving positive's span really covers the answer (X6)
    bad = pos_ex.where(
        F.expr("substring(context, start_index + 1, "
               "end_index - start_index) != answer")
    ).count()
    assert bad == 0
    assert neg_ex.where(F.col("na") != 0).count() == 0

    # 4. JSONL export/ingest round-trip (S7)
    out = str(tmp_path / "qa.jsonl")
    write_jsonl(examples, out)
    back = read_jsonl(spark, out)
    assert back.count() == examples.count()
    assert set(back.columns) == set(examples.columns)


def test_run_pipeline_subprocess_join_strategy_with_resume(spark, tmp_path):
    """VERDICT r2 #8: the spark-submit entry (scripts/run_pipeline.py) run
    end-to-end as a SUBPROCESS on synthetic sf0.001-scale parquet with
    --dict-strategy join, then resumed after a simulated mid-run kill
    (a subset of bucket outputs + their manifest rows removed — exactly
    the on-disk state a crash leaves). The resumed run must (a) only
    reprocess the missing buckets and (b) reproduce the uninterrupted
    run's triples exactly."""
    import shutil
    import subprocess
    import sys as _sys

    import pandas as pd

    from xwikire_spark import datagen

    root = str(tmp_path)
    rows, _ = datagen.generate_transcripts(n_convs=60, turns_per_conv=8)
    spark.createDataFrame(pd.DataFrame(rows)).write.parquet(f"{root}/tr")
    spark.createDataFrame(
        pd.DataFrame(datagen.alias_rows())
    ).write.parquet(f"{root}/al")
    spark.createDataFrame(
        pd.DataFrame(datagen.predicate_rows())
    ).write.parquet(f"{root}/pr")

    def run(out):
        return subprocess.run(
            [_sys.executable, "scripts/run_pipeline.py",
             "--transcripts", f"{root}/tr", "--alias-dict", f"{root}/al",
             "--predicate-dict", f"{root}/pr", "--out", out,
             "--n-buckets", "8", "--dict-strategy", "join",
             "--no-canonicalize", "--master", "local[4]"],
            capture_output=True, text=True, timeout=600,
            cwd=str(__import__("pathlib").Path(__file__).parent.parent),
        )

    r1 = run(f"{root}/full")
    assert r1.returncode == 0, r1.stderr[-2000:]
    full = spark.read.parquet(f"{root}/full/triples")
    want = sorted(map(tuple, full.drop("part_bucket").collect()))
    assert want, "pipeline produced no triples"

    # second output dir: complete run, then surgically remove 3 buckets'
    # outputs AND manifest rows (the state a kill leaves: those buckets
    # never committed)
    r2 = run(f"{root}/resume")
    assert r2.returncode == 0, r2.stderr[-2000:]
    mani = spark.read.parquet(f"{root}/resume/_manifests").toPandas()
    done_buckets = sorted(mani["bucket"])
    killed = done_buckets[:3]
    kept = mani[~mani["bucket"].isin(killed)]
    shutil.rmtree(f"{root}/resume/_manifests")
    spark.createDataFrame(kept).write.parquet(f"{root}/resume/_manifests")
    for b in killed:
        shutil.rmtree(f"{root}/resume/triples/part_bucket={b}")

    r3 = run(f"{root}/resume")
    assert r3.returncode == 0, r3.stderr[-2000:]
    resumed = spark.read.parquet(f"{root}/resume/triples")
    got = sorted(map(tuple, resumed.drop("part_bucket").collect()))
    assert got == want
    # resume only reprocessed the killed buckets: manifests for survivors
    # kept their original wall_ms rows (count per bucket stays 1)
    mani2 = spark.read.parquet(f"{root}/resume/_manifests").toPandas()
    assert sorted(mani2["bucket"]) == done_buckets


def test_spark_submit_py_files_zip(spark, tmp_path):
    """Cluster-deployment fidelity (north rule: "run via spark-submit
    --py-files"): package xwikire_spark into a zip, spark-submit the
    pipeline entry with --py-files from a cwd where the repo is NOT
    importable and with PYTHONPATH stripped — driver and executors must
    import the package from the shipped zip alone."""
    import os
    import shutil
    import subprocess
    import zipfile

    import pandas as pd

    from xwikire_spark import datagen

    submit = shutil.which("spark-submit")
    if not submit:
        import pytest as _pytest

        _pytest.skip("spark-submit not on PATH")

    repo = __import__("pathlib").Path(__file__).parent.parent
    zpath = str(tmp_path / "xwikire_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(repo / "xwikire_spark"):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, repo))

    root = str(tmp_path)
    rows, _ = datagen.generate_transcripts(n_convs=30, turns_per_conv=6)
    spark.createDataFrame(pd.DataFrame(rows)).write.parquet(f"{root}/tr")
    spark.createDataFrame(
        pd.DataFrame(datagen.alias_rows())
    ).write.parquet(f"{root}/al")
    spark.createDataFrame(
        pd.DataFrame(datagen.predicate_rows())
    ).write.parquet(f"{root}/pr")

    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_HOME")
    }
    r = subprocess.run(
        [submit, "--master", "local[4]", "--py-files", zpath,
         str(repo / "scripts" / "run_pipeline.py"),
         "--transcripts", f"{root}/tr", "--alias-dict", f"{root}/al",
         "--predicate-dict", f"{root}/pr", "--out", f"{root}/out",
         "--n-buckets", "4", "--no-canonicalize", "--master", "local[4]",
         # post-run compaction rides the same submit (tiny target so the
         # multi-task write is guaranteed to need it)
         "--compact-target-bytes", str(1 << 30)],
        capture_output=True, text=True, timeout=600, cwd=root, env=env,
    )
    assert r.returncode == 0, (r.stderr or "")[-3000:]
    assert "compacted" in r.stdout, r.stdout[-2000:]
    got = spark.read.parquet(f"{root}/out/triples")
    assert got.count() > 0
    assert {"subj", "pred", "obj"} <= set(got.columns)
    # compaction left exactly one file per bucket at the huge target
    import glob as _glob

    for d in _glob.glob(f"{root}/out/triples/part_bucket=*"):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)
