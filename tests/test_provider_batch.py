"""Provider Batch mode (L5): submit → poll → collect across 'processes',
mock provider, parity with live mode."""

import sys

import pytest
from pyspark import cloudpickle

from ondine_spark import PipelineBuilder, mock_client_factory
from ondine_spark.llm.provider_batch import (
    LocalMockBatchProvider,
    RunHandle,
    collect,
    submit,
)
from ondine_spark.orchestration.registry import RunRegistry, RunState

cloudpickle.register_pickle_by_value(sys.modules[__name__])


def _rows(n):
    labels = ["great", "terrible", "okay"]
    return [
        {"id": f"k{i:03d}", "review": f"row {i} is {labels[i % 3]}"}
        for i in range(n)
    ]


def _build(spark, batch_size=1):
    b = (
        PipelineBuilder(spark)
        .from_dataframe(spark.createDataFrame(_rows(30)), ["review"],
                        id_column="id")
        .with_prompt("Classify: {review}", ["sentiment"])
        .with_custom_llm_client(mock_client_factory())
    )
    if batch_size > 1:
        b.with_batch_size(batch_size)
    return b.build()


def test_submit_poll_collect_unbatched(spark, tmp_path):
    provider = LocalMockBatchProvider(str(tmp_path / "spool"), latency_polls=2)
    reg = RunRegistry(str(tmp_path / "runs.db"))
    p = _build(spark)
    handle = submit(p, provider, str(tmp_path / "work"), run_id="bj1",
                    registry=reg)
    assert handle.provider_job_id.startswith("mockbatch-")
    assert reg.get("bj1").state == RunState.RUNNING
    assert reg.get("bj1").provider_job_id == handle.provider_job_id
    assert reg.get("bj1").meta["requests"] == 30

    # 'another process': reload the handle from disk
    handle2 = RunHandle.load(str(tmp_path / "work"), "bj1")
    result = collect(p, provider, handle2, registry=reg)
    rows = {r["id"]: r["sentiment"] for r in result.collect()}
    assert len(rows) == 30
    assert rows["k000"] == "positive"
    assert rows["k001"] == "negative"
    assert rows["k002"] == "neutral"
    assert reg.get("bj1").state == RunState.SUCCEEDED


def test_batched_mode_matches_live(spark, tmp_path):
    """Mega-batched provider-batch run agrees with live execution."""
    provider = LocalMockBatchProvider(str(tmp_path / "spool"))
    p = _build(spark, batch_size=10)
    handle = submit(p, provider, str(tmp_path / "work"))

    # exactly ceil(30/10)=3 requests compiled (the 15× reduction headline)
    import os

    job_dir = os.path.join(str(tmp_path / "spool"), handle.provider_job_id)
    with open(os.path.join(job_dir, "input.jsonl")) as f:
        assert sum(1 for _ in f) == 3

    batch_result = collect(p, provider, handle)
    live_result = _build(spark, batch_size=10).execute().data
    got_b = {r["id"]: r["sentiment"] for r in batch_result.collect()}
    got_l = {r["id"]: r["sentiment"] for r in live_result.collect()}
    assert got_b == got_l
    assert None not in got_b.values()


def test_collect_fails_cleanly_on_bad_job(spark, tmp_path):
    provider = LocalMockBatchProvider(str(tmp_path / "spool"))

    class FailingProvider(LocalMockBatchProvider):
        def poll(self, job_id):
            return "failed"

    p = _build(spark)
    handle = submit(p, provider, str(tmp_path / "work"))
    failing = FailingProvider(str(tmp_path / "spool"))
    with pytest.raises(RuntimeError, match="failed"):
        collect(p, failing, handle)
