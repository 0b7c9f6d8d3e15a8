"""LSH linearity proof on realistic (Heaps-law) vocabulary.

Round-3 verdict left one `weak` grade: minhash_lsh_pairs looked
superlinear at sf10 (211 s), adjudicated as a generator artifact (the
40-word synthetic vocabulary saturates the 3-gram shingle space, so
band-bucket occupancy grows with N). This tool closes the question by
measuring, on the Heaps'-law corpora (tools/gen_scale_data.py vocab
mode 'heaps': V = 100*sqrt(n_docs), Zipf ranks):

  - wall time of the full pair enumeration at sf1h vs sf10h (10x rows)
  - emitted pair count (time should scale ~ rows + pairs)
  - the band-bucket occupancy histogram (bounded occupancy is the
    linearity precondition; the 40-word corpus violates it)

Usage: python tools/lsh_linearity.py [dir ...]   (defaults: sf1h sf10h)
Run ALONE — timings are the point.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    dirs = sys.argv[1:] or ["localdata/sf1h", "localdata/sf10h"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ondine_spark.operators.dedup import (
        minhash_band_rows,
        minhash_lsh_pairs,
        minhash_signature,
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("lsh_linearity")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the session ONCE before any timed point: the first LSH job of a
    # session pays Arrow worker-pool spinup + codegen + first-job scheduling
    # (~10-20 s here), which lands entirely on the SMALLEST decade and makes
    # the intercept-free T = a*rows + b*pairs fit read superlinear (measured:
    # the cold sf1h point ran 30.1 s vs 17.6 predicted; warm it is ~8 s).
    warm = spark.read.parquet(f"{dirs[0]}/documents.parquet").limit(2000)
    minhash_lsh_pairs(
        warm, "doc_id", "text", num_hashes=8, bands=4, threshold=0.25
    ).count()

    results = []
    for d in dirs:
        docs = spark.read.parquet(f"{d}/documents.parquet")
        n_docs = docs.count()

        # occupancy histogram: size distribution of the (band, key) buckets
        sig = minhash_signature(docs, "doc_id", "text", 8)
        bands = minhash_band_rows(sig, 8, 4)
        occ = (
            bands.groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("sz"))
            .groupBy(F.expr("int(floor(log2(sz)))").alias("log2_sz"))
            .agg(F.count(F.lit(1)).alias("n_buckets"), F.max("sz").alias("max_sz"))
            .orderBy("log2_sz")
            .collect()
        )
        hist = [
            {"log2_sz": r["log2_sz"], "n_buckets": r["n_buckets"], "max_sz": r["max_sz"]}
            for r in occ
        ]
        max_occ = max(r["max_sz"] for r in hist)

        # timed full pair enumeration (same params as the oracle gate);
        # min over LOAD-GATED reps via bench.timed_rep — this host carries
        # intermittent external CPU (the same noise that inflated three
        # rounds of BENCH artifacts; measured here too: a "warm" sf10h rep
        # read 64 s while the 10x-bigger sf100h read 94 s in the same
        # session). Each rep records external cores during the rep and
        # retries if another process was burning CPU.
        from bench import timed_rep

        def run_once():
            return minhash_lsh_pairs(
                docs, "doc_id", "text", num_hashes=8, bands=4, threshold=0.25
            ).count()

        reps, n_pairs = [], None
        for _ in range(2):
            rep, n_pairs = timed_rep(spark, run_once)
            reps.append(rep)
        dt = min(r["sec"] for r in reps)
        results.append(
            {
                "dir": d,
                "rows": n_docs,
                "pairs": n_pairs,
                "seconds": round(dt, 2),
                "reps": reps,
                "max_bucket_occupancy": max_occ,
                "occupancy_histogram": hist,
            }
        )
        print(json.dumps(results[-1]))

    if len(results) >= 2:
        a, b = results[0], results[-1]
        work_ratio = (b["rows"] + b["pairs"]) / max(a["rows"] + a["pairs"], 1)
        time_ratio = b["seconds"] / max(a["seconds"], 1e-9)
        print(
            json.dumps(
                {
                    "rows_ratio": round(b["rows"] / a["rows"], 2),
                    "work_ratio (rows+pairs)": round(work_ratio, 2),
                    "time_ratio": round(time_ratio, 2),
                    "linear_if": "time_ratio <= ~work_ratio",
                }
            )
        )
    if len(results) >= 3:
        # least-squares fit of SCALE.md's model T = a*rows + b*pairs over
        # ALL decades (round-5: two parameters against three points makes
        # the linear model falsifiable — a superlinear term shows up as a
        # large relative residual, which a two-point fit can always hide)
        import numpy as np

        X = np.array([[r["rows"], r["pairs"]] for r in results], dtype="float64")
        y = np.array([r["seconds"] for r in results])
        coef, _, _, _ = np.linalg.lstsq(X, y, rcond=None)
        pred = X @ coef
        rel_resid = float(np.max(np.abs(pred - y) / np.maximum(y, 1e-9)))
        print(
            json.dumps(
                {
                    "fit": "T = a*rows + b*pairs (lstsq over all decades)",
                    "a_us_per_row": round(float(coef[0]) * 1e6, 3),
                    "b_us_per_pair": round(float(coef[1]) * 1e6, 3),
                    "max_rel_residual": round(rel_resid, 4),
                    "points": [
                        {"rows": r["rows"], "pairs": r["pairs"],
                         "sec": r["seconds"],
                         "pred_sec": round(float(p), 2)}
                        for r, p in zip(results, pred)
                    ],
                }
            )
        )


if __name__ == "__main__":
    main()
