"""Durability at bench scale: crash a 1M-row chunked run at ~60% and
resume it in a NEW process (round-4 verdict item: the crash story was
tested at small scale while throughput was measured at 1M — combine
them). Asserts, and records to benchmarks/CRASH_1M.json:

  - rows_lost = 0 (final assembled result = 1,000,000 rows, 0 null cells)
  - re_invocations = 0 (the resume process's api-call accumulator counts
    EXACTLY the rows of the uncommitted chunks — committed chunks replay
    from the durable cache without touching the provider)
  - cost integrity: the crash-time memento's cumulative Decimal cost +
    the resume chunks' costs == the durable cache's cost sum (exact
    Decimal equality across the process boundary)

Usage: python tools/crash_1m.py [work_dir]   (spawns itself twice)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = 1_000_000
CHUNK = 200_000
CRASH_ROW = 600_001  # inside chunk 3 of 5
SID = "crash1m"


def session():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    s = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def build(spark, ckpt, crash: bool):
    from pyspark.sql import functions as F

    from ondine_spark import PipelineBuilder
    from ondine_spark.llm.client import mock_client_factory

    df = spark.range(N_ROWS).select(
        F.col("id"),
        F.concat(F.lit("review number "), F.col("id")).alias("review"),
    )
    base = mock_client_factory()
    if crash:
        marker = f"review number {CRASH_ROW}"

        def factory(_base=base, _marker=marker):
            client = _base()

            class Crashing:
                model = getattr(client, "model", "mock")

                def complete(self, prompt, system=None):
                    if _marker in prompt:
                        os._exit(9)  # kill the UDF worker mid-chunk
                    return client.complete(prompt, system)

                def __getattr__(self, a):
                    return getattr(client, a)

            return Crashing()
    else:
        factory = base
    return (
        PipelineBuilder(spark)
        .from_dataframe(df, ["review"], id_column="id")
        .with_prompt("Sentiment of: {review}", ["sentiment"])
        .with_custom_llm_client(factory)
        .with_concurrency(8)
        .with_checkpoint_dir(ckpt, SID)
        .build()
    )


def run_crash(work):
    from ondine_spark.streaming.runner import iter_chunks

    spark = session()
    p = build(spark, f"{work}/ckpt", crash=True)
    committed = []
    try:
        for r in iter_chunks(p, chunk_size=CHUNK):
            committed.append(r.rows)
            print("chunk committed:", r.chunk_id, r.rows, flush=True)
    except Exception as e:  # noqa: BLE001 - the crash IS the test
        print("CRASHED:", type(e).__name__, flush=True)
    print("COMMITTED:", json.dumps(committed), flush=True)


def run_resume(work):
    from decimal import Decimal

    from ondine_spark.orchestration.state import StateManager
    from ondine_spark.streaming.runner import chunked_result_frame, iter_chunks

    spark = session()
    p = build(spark, f"{work}/ckpt", crash=False)
    memento = StateManager(f"{work}/ckpt", SID).load()
    pre_cost = Decimal(memento.cumulative_cost) if memento else Decimal(0)
    pre_chunks = memento.chunks_committed if memento else 0
    resumed = list(iter_chunks(p, chunk_size=CHUNK))
    resume_calls = p._call_counter.value
    resume_cost = sum((r.cost for r in resumed), Decimal(0))
    res = chunked_result_frame(p, f"{work}/ckpt", SID)
    n = res.count()
    nn = res.filter("sentiment is null").count()
    # exact Decimal cost across the crash boundary: memento + resumed
    # chunks must equal the durable cache's own cost sum
    from pyspark.sql import functions as F

    from ondine_spark.sources.cache import _cache_path

    cache = spark.read.parquet(
        os.path.join(_cache_path(f"{work}/ckpt"), f"session_id={SID}")
    ).dropDuplicates(["_row_id"])
    cache_cost = Decimal(
        str(cache.agg(F.sum("cost").alias("c")).first()["c"])
    )
    expected_resume_rows = N_ROWS - pre_chunks * CHUNK
    out = {
        "rows_total": n,
        "null_cells": nn,
        "rows_lost": N_ROWS - n,
        "chunks_before_crash": pre_chunks,
        "resume_api_calls": resume_calls,
        "expected_resume_calls": expected_resume_rows,
        "re_invocations": resume_calls - expected_resume_rows,
        "cost_before_crash": str(pre_cost),
        "cost_resumed": str(resume_cost),
        "cost_cache_sum": str(cache_cost),
        "cost_exact": bool(pre_cost + resume_cost == cache_cost),
    }
    print("RESULT:", json.dumps(out), flush=True)
    assert n == N_ROWS and nn == 0, out
    assert resume_calls == expected_resume_rows, out
    assert pre_cost + resume_cost == cache_cost, out
    with open("benchmarks/CRASH_1M.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("VERIFY-OK -> benchmarks/CRASH_1M.json", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] in ("crash", "resume"):
        (run_crash if sys.argv[2] == "crash" else run_resume)(sys.argv[1])
    else:
        work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/crash1m"
        os.makedirs(work, exist_ok=True)
        env = dict(os.environ, PYTHONPATH="/root/repo")
        for phase in ("crash", "resume"):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), work, phase],
                env=env, timeout=1800,
            )
            print(f"{phase}: rc={r.returncode}")
