"""Concurrent pipelines on ONE shared SparkSession — the notebook and
multi-tenant-driver reality. Spark schedules concurrent jobs fine; what
this pins is OUR state isolation: per-pipeline api-call accumulators,
per-run worker-side client caches (keyed by run, not by id()), and
per-pipeline stats must not bleed across pipelines running in parallel
threads.
"""

from __future__ import annotations

import threading

from ondine_spark import PipelineBuilder


def _build(spark, factory, n):
    rows = [{"id": f"{i}", "word": f"Word{i}"} for i in range(n)]
    return (
        PipelineBuilder(spark)
        .from_dataframe(spark.createDataFrame(rows), ["word"], id_column="id")
        .with_prompt("Echo: {word}", ["echo"])
        .with_custom_llm_client(factory)
        .build()
    )


def test_two_pipelines_in_parallel_threads(spark):
    # factories defined inline so cloudpickle ships them by VALUE — the
    # test module itself is not importable on executor workers
    def upper_factory():
        from ondine_spark.llm.client import LLMResult

        class Upper:
            def complete(self, prompt, system=None):
                text = prompt.rsplit(":", 1)[-1].strip()
                return LLMResult(text=text.upper(), tokens_in=1,
                                 tokens_out=1, model="m", cost="0")

        return Upper()

    def lower_factory():
        from ondine_spark.llm.client import LLMResult

        class Lower:
            def complete(self, prompt, system=None):
                text = prompt.rsplit(":", 1)[-1].strip()
                return LLMResult(text=text.lower(), tokens_in=1,
                                 tokens_out=1, model="m", cost="0")

        return Lower()

    p_up = _build(spark, upper_factory, 40)
    p_low = _build(spark, lower_factory, 30)
    results: dict[str, object] = {}
    errors: list[BaseException] = []

    def run(name, p):
        try:
            results[name] = p.execute()
        except BaseException as e:  # propagate to the main thread
            errors.append(e)

    threads = [
        threading.Thread(target=run, args=("up", p_up)),
        threading.Thread(target=run, args=("low", p_low)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors

    up = {r["id"]: r["echo"] for r in results["up"].data.collect()}
    low = {r["id"]: r["echo"] for r in results["low"].data.collect()}
    assert up == {f"{i}": f"WORD{i}" for i in range(40)}
    assert low == {f"{i}": f"word{i}" for i in range(30)}
    # per-pipeline accumulators: each counted only its own calls
    assert results["up"].api_calls == 40
    assert results["low"].api_calls == 30
    # quality/stats isolation
    assert results["up"].stats.rows == 40
    assert results["low"].stats.rows == 30


def test_checkpoint_df_attributes_ids_per_frame(spark):
    # interleaved checkpoints: a registry snapshot-diff would fold frame
    # B's blocks into frame A's id set; direct LogicalRDD resolution must
    # attribute exactly one distinct id to each frame
    from ondine_spark.core.checkpoints import (
        checkpoint_df,
        persistent_rdd_ids,
        unpersist_rdd_ids,
    )

    sc = spark.sparkContext
    a = spark.range(100).selectExpr("id", "id * 2 AS x")
    b = spark.range(50).selectExpr("id", "id + 7 AS y")
    ca, ids_a = checkpoint_df(a)
    cb, ids_b = checkpoint_df(b)
    try:
        assert len(ids_a) == 1 and len(ids_b) == 1
        assert ids_a.isdisjoint(ids_b)
        reg = persistent_rdd_ids(sc)
        assert ids_a <= reg and ids_b <= reg
        # freeing A's blocks must leave B fully collectable (the race's
        # failure mode is block-not-found on the OTHER frame)
        unpersist_rdd_ids(sc, ids_a, blocking=True)
        assert cb.count() == 50
        assert cb.agg({"y": "sum"}).first()[0] == sum(i + 7 for i in range(50))
    finally:
        unpersist_rdd_ids(sc, ids_a | ids_b)


def test_concurrent_connected_components_shared_session(spark):
    # two threads run the checkpoint-heavy CC loop simultaneously on one
    # session; under the old snapshot-diff cleanup one thread could free
    # the other's live checkpoint (unrecoverable lineage-truncated frame)
    from ondine_spark.operators.dedup import connected_components

    def chain_pairs(offset, n):
        return spark.createDataFrame(
            [(offset + i, offset + i + 1) for i in range(n)], ["a", "b"]
        )

    results: dict = {}
    errors: list = []

    def run(tag, offset):
        try:
            out = connected_components(
                chain_pairs(offset, 40), "a", "b", driver_threshold=0
            ).collect()
            results[tag] = {(r["node"], r["component"]) for r in out}
        except Exception as e:  # noqa: BLE001 - recorded for the assert
            errors.append((tag, repr(e)))

    threads = [
        threading.Thread(target=run, args=(t, off))
        for t, off in (("t1", 0), ("t2", 1000), ("t3", 2000))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    for tag, off in (("t1", 0), ("t2", 1000), ("t3", 2000)):
        # a 41-node chain is one component rooted at its minimum
        assert results[tag] == {(off + i, off) for i in range(41)}
