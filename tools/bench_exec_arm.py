"""Focused exec-arm bench for the round-6 → round-7 bisect.

Runs ONLY the two 100K-row execute() arms (batched b=25, naive b=1)
from bench.py, N reps each, against $SPARK_GRAFT_SF_DIR — nothing else
— so the number is comparable across commits without paying the full
27-query session (and without the session's heap history influencing
the arms). Prints one JSON line.

Usage:  PYTHONPATH=<repo> python tools/bench_exec_arm.py [reps]
(run it ALONE on the box; anything else running inflates 2-4x)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    reps_n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("exec_arm_bisect")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "90g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from bench import timed_rep

    from pyspark.sql import functions as F

    from ondine_spark import PipelineBuilder

    # identical warmup to bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    n_cpu = int(cpus) if cpus.isdigit() else 32
    spark.range(n_cpu * 4).repartition(n_cpu).mapInPandas(
        lambda it: it, "id long"
    ).count()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    k = max(1, 100_000 // max(n_docs, 1))
    big = (
        docs.crossJoin(spark.range(k).withColumnRenamed("id", "_rep"))
        .withColumn("uid", F.col("doc_id") * 1000 + F.col("_rep"))
        .select("uid", "text")
    )

    def _100k_builder(batch):
        b = (
            PipelineBuilder(spark)
            .from_dataframe(big, ["text"], id_column="uid")
            .with_prompt(entry.TEMPLATE, ["sentiment"])
            .with_custom_llm_client(entry._mock_factory)
            .with_concurrency(16)
        )
        if batch > 1:
            b.with_batch_size(batch)
        return b.build()

    # workload denominator (round-6 verdict finding #3): the exec arms are
    # only comparable across corpora when the artifact records input bytes
    pb = big.select(
        F.sum(F.length("text")).alias("total"),
        F.avg(F.length("text")).alias("avg"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]

    # warm both arms once (codegen + python worker pool for the spine)
    _100k_builder(25).result_frame().select("uid").count()
    spark.catalog.clearCache()

    out: dict = {
        "metric": "exec_arm_bisect",
        "sf": float(m.group(1)) if m else 0.0,
        "reps": reps_n,
        "rows": int(pb["n"]),
        "prompt_bytes_total": int(pb["total"]),
        "prompt_bytes_avg": round(float(pb["avg"]), 1),
        "git": os.popen(f"git -C {REPO} rev-parse --short HEAD").read().strip(),
    }
    for arm, batch in (("batched", 25), ("naive", 1)):
        runs, calls = [], 0
        for _ in range(reps_n):
            rep, res = timed_rep(
                spark, lambda b=batch: _100k_builder(b).execute()
            )
            runs.append(rep["sec"])
            calls = res.api_calls
            spark.catalog.clearCache()
        runs.sort()
        med = (
            runs[len(runs) // 2]
            if reps_n % 2
            else sum(runs[len(runs) // 2 - 1 : len(runs) // 2 + 1]) / 2
        )
        out[f"enrich_{arm}_100k_exec"] = round(med, 3)
        out[f"enrich_{arm}_100k_exec_runs"] = runs
        out[f"api_calls_{arm}"] = calls
        print(f"# {arm}: median {med:.3f}s of {runs}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
