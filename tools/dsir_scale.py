"""DSIR scale measurement (round-5 verdict item 7): decade sweep of the
fit / score / resample pipeline plus a num_features (B) sweep of the
LLR-literal plan-build cost.

What it measures, per corpus decade (sf1h 50K docs -> sf10h 500K ->
optionally sf100h 5M):

- fit_sec: dsir_llr_table wall (two explode -> groupBy(bucket) passes;
  the shuffle carries <= B rows per partition, so this should scale
  ~linearly in token count, like the LSH decade fit in SCALE.md)
- score_sec: dsir_weights + a count action (zero-shuffle JVM fold)
- resample_sec: Gumbel top-k of 10%% (TakeOrderedAndProject)
- plan_build_sec: time to CONSTRUCT+ANALYZE the weights plan alone
  (schema touch, no job) — this is where the B-sized SQL array literal
  bites; measured separately at B in {2^13, 2^15, 2^17} on the
  smallest corpus since it is corpus-size independent.

Appends one JSON line per (dir, B) to benchmarks/DSIR_SCALE.jsonl and
prints a summary. Run ALONE like bench.py — wall numbers.

Usage: python tools/dsir_scale.py [dir ...]   (default: localdata/sf1h
       localdata/sf10h; pass localdata/sf100h for the third decade)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B_SWEEP = [1 << 13, 1 << 15, 1 << 17]


def main() -> None:
    dirs = sys.argv[1:] or ["localdata/sf1h", "localdata/sf10h"]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ondine_spark.operators.importance import (
        dsir_llr_table,
        dsir_resample,
        dsir_weights,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "DSIR_SCALE.jsonl",
    )
    results = []

    # ---- corpus decades at the bench's production B (2^13, bigrams)
    for d in dirs:
        docs = spark.read.parquet(f"{d}/documents.parquet").select(
            "doc_id", "text", "lang"
        )
        n = docs.count()
        n_tokens = docs.select(
            F.sum(F.size(F.split(F.lower(F.coalesce("text", F.lit(""))),
                                 r"\W+"))).alias("t")
        ).collect()[0]["t"]
        b = 1 << 13

        t0 = time.monotonic()
        llr = dsir_llr_table(
            docs, docs.where(F.col("lang") == "en"), "text",
            num_features=b, use_bigrams=True,
        )
        fit_sec = time.monotonic() - t0

        t0 = time.monotonic()
        w = dsir_weights(docs.select("doc_id", "text"), llr, "text",
                         num_features=b, use_bigrams=True)
        # force the weight column: a bare count() lets Catalyst prune the
        # entire scoring expression (caught in round 6 — 0.7 s "scores"
        # for 200M tokens were a column-pruned no-op scan)
        w.agg(F.sum("dsir_w_q")).collect()
        score_sec = time.monotonic() - t0

        t0 = time.monotonic()
        dsir_resample(w, "doc_id", "dsir_w_q", max(n // 10, 1)).count()
        resample_sec = time.monotonic() - t0

        rec = {
            "dir": d, "docs": n, "tokens": int(n_tokens), "B": b,
            "fit_sec": round(fit_sec, 2),
            "fit_us_per_token": round(fit_sec / max(n_tokens, 1) * 1e6, 3),
            "score_sec": round(score_sec, 2),
            "score_us_per_token": round(score_sec / max(n_tokens, 1) * 1e6, 3),
            "resample_sec": round(resample_sec, 2),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # ---- B sweep: plan-build cost of the LLR literal (corpus-free: the
    # literal is parsed at plan analysis; use a 100-row frame so any job
    # time is negligible and schema access forces analysis)
    tiny = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon").alias("text"),
    )
    for b in B_SWEEP:
        llr = [((i * 2654435761) % 2_000_001) - 1_000_000
               for i in range(2 * b)]  # synthetic table, realistic range
        t0 = time.monotonic()
        w = dsir_weights(tiny, llr, "text", num_features=b, use_bigrams=True)
        _ = w.schema  # forces parse + analysis of the literal
        plan_sec = time.monotonic() - t0
        t0 = time.monotonic()
        w.count()
        exec_sec = time.monotonic() - t0
        rec = {
            "B": b, "literal_ints": 2 * b,
            "plan_build_sec": round(plan_sec, 2),
            "tiny_exec_sec": round(exec_sec, 2),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "a") as fh:
        for rec in results:
            fh.write(json.dumps({"ts": time.time(), **rec}) + "\n")
    print(f"-> {out_path}")


if __name__ == "__main__":
    main()
