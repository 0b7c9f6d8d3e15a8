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
