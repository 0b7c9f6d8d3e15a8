"""Streaming incremental dedup (streaming/incremental_dedup.py): first-seen
near-dup filtering with a persistent signature store, across stream
restarts (the checkpoint skips processed files; the store carries state).
"""

from __future__ import annotations

from pyspark.sql import types as T

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])

T1 = "the quick brown fox jumps over the lazy dog again and again today"
T2 = "completely different text about spark engines and shuffle behavior"
T3 = "a third topic entirely concerning maritime navigation and charts"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run(spark, dirs):
    from ondine_spark.streaming.incremental_dedup import run_dedup_stream

    run_dedup_stream(
        spark,
        input_path=dirs["in"],
        schema=SCHEMA,
        id_col="doc_id",
        text_col="text",
        output_path=dirs["out"],
        state_dir=dirs["state"],
        checkpoint_location=dirs["ckpt"],
        threshold=0.5,
        timeout_s=120,
    )


def test_first_seen_dedup_across_restarts(spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("in", "out", "state", "ckpt")}

    # batch 1: one exact dup within the batch (3 ~ 1) → smallest id kept
    _write(spark, dirs["in"], [(1, T1), (2, T2), (3, T1)])
    _run(spark, dirs)
    out1 = {r.doc_id for r in spark.read.parquet(dirs["out"]).collect()}
    assert out1 == {1, 2}

    # batch 2 (stream restart): 4 duplicates batch-1's doc 2 → dropped by
    # the signature store; 5 is new → kept
    _write(spark, dirs["in"], [(4, T2), (5, T3)])
    _run(spark, dirs)
    out2 = {r.doc_id for r in spark.read.parquet(dirs["out"]).collect()}
    assert out2 == {1, 2, 5}

    # the store holds band rows ONLY for survivors
    state_ids = {r._id for r in spark.read.parquet(dirs["state"]).collect()}
    assert state_ids == {1, 2, 5}

    # re-running with nothing new is a no-op (checkpoint skips old files)
    _run(spark, dirs)
    assert {r.doc_id for r in spark.read.parquet(dirs["out"]).collect()} == {1, 2, 5}
