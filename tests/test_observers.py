"""O14 external sinks: Langfuse / OpenTelemetry observers driven through a
real pipeline run with fake exporters capturing the traffic."""

from __future__ import annotations

import sys

import pytest
from pyspark import cloudpickle

from ondine_spark import PipelineBuilder, mock_client_factory
from ondine_spark.observability import (
    EventDispatcher,
    LangfuseObserver,
    OpenTelemetryObserver,
)

cloudpickle.register_pickle_by_value(sys.modules[__name__])


class FakeTrace:
    def __init__(self, name, id, metadata):
        self.name, self.id, self.metadata = name, id, metadata
        self.events: list = []
        self.output = None

    def event(self, **kw):
        self.events.append(kw)

    def update(self, output=None):
        self.output = output


class FakeLangfuse:
    def __init__(self):
        self.traces: dict[str, FakeTrace] = {}
        self.flushes = 0

    def trace(self, name, id, metadata):
        t = FakeTrace(name, id, metadata)
        self.traces[id] = t
        return t

    def flush(self):
        self.flushes += 1


class FakeSpan:
    def __init__(self, name):
        self.name = name
        self.attributes: dict = {}
        self.events: list = []
        self.ended = False
        self.status = None

    def set_attribute(self, k, v):
        self.attributes[k] = v

    def add_event(self, name, attributes=None):
        self.events.append((name, attributes or {}))

    def end(self):
        self.ended = True


class FakeTracer:
    def __init__(self):
        self.spans: list[FakeSpan] = []

    def start_span(self, name):
        s = FakeSpan(name)
        self.spans.append(s)
        return s


def _run(spark, observer, tmp_path):
    df = spark.createDataFrame(
        [(f"r{i}", f"row {i} is great") for i in range(8)],
        "id string, review string",
    )
    return (
        PipelineBuilder(spark)
        .from_dataframe(df, ["review"], id_column="id")
        .with_prompt("Classify: {review}", ["sentiment"])
        .with_custom_llm_client(mock_client_factory())
        .with_checkpoint_dir(str(tmp_path / "ckpt"), "obs-run-1")
        .with_observer(observer)
        .build()
        .execute()
    )


def test_langfuse_observer_captures_run(spark, tmp_path):
    fake = FakeLangfuse()
    _run(spark, LangfuseObserver(client=fake), tmp_path)
    assert "obs-run-1" in fake.traces
    t = fake.traces["obs-run-1"]
    assert t.name == "ondine_spark_run"
    assert t.metadata.get("model")  # start payload
    assert t.output is not None and t.output.get("rows") == 8
    assert fake.flushes == 1


def test_langfuse_observer_records_error():
    fake = FakeLangfuse()
    d = EventDispatcher([LangfuseObserver(client=fake)])
    d.emit("pipeline_start", run_id="e1", model="m")
    d.emit("error", run_id="e1", error="ValueError: boom")
    t = fake.traces["e1"]
    assert t.events and t.events[0]["level"] == "ERROR"
    assert "boom" in t.events[0]["metadata"]["error"]


def test_otel_observer_captures_run(spark, tmp_path):
    tracer = FakeTracer()
    _run(spark, OpenTelemetryObserver(tracer=tracer), tmp_path)
    assert len(tracer.spans) == 1
    span = tracer.spans[0]
    assert span.name == "ondine_spark_run"
    assert span.attributes["ondine.run_id"] == "obs-run-1"
    assert span.attributes["ondine.rows"] == 8
    assert span.ended


def test_otel_observer_event_and_error():
    tracer = FakeTracer()
    d = EventDispatcher([OpenTelemetryObserver(tracer=tracer)])
    d.emit("pipeline_start", run_id="e2", model="m")
    d.emit("chunk_committed", run_id="e2", rows=100, chunks_done=1)
    d.emit("error", run_id="e2", error="boom")
    d.emit("pipeline_end", run_id="e2", rows=100)
    span = tracer.spans[0]
    kinds = [name for name, _ in span.events]
    assert "chunk_committed" in kinds and "error" in kinds
    assert span.attributes["ondine.rows"] == 100
    assert span.ended


def test_otel_attrs_coerced_to_primitives():
    tracer = FakeTracer()
    obs = OpenTelemetryObserver(tracer=tracer)
    d = EventDispatcher([obs])
    d.emit("pipeline_start", run_id="e3", cost={"not": "primitive"})
    assert isinstance(tracer.spans[0].attributes["ondine.cost"], str)


def test_missing_sdk_guidance(monkeypatch):
    """Without an injected client the constructor import-guards with a
    clear message instead of failing deep inside a run."""
    import builtins

    real_import = builtins.__import__

    def no_ext(name, *a, **k):
        if name in ("langfuse", "opentelemetry"):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_ext)
    with pytest.raises(ImportError, match="langfuse"):
        LangfuseObserver()
    with pytest.raises(ImportError, match="opentelemetry"):
        OpenTelemetryObserver()


def test_sanitizing_observer_scrubs_pii(spark, tmp_path):
    """Error events carry provider exception text, which can echo the
    prompt — the sanitizing wrapper must scrub PII before any sink sees
    it (reference: ondine/observability/sanitizer.py)."""
    from ondine_spark.observability import CollectingObserver, SanitizingObserver

    sink = CollectingObserver()
    obs = SanitizingObserver(sink)
    df = spark.createDataFrame(
        [("r0", "mail me at alice@example.com or call 555-123-4567 BOOM"),
         ("r1", "all great")],
        "id string, review string",
    )
    res = (
        PipelineBuilder(spark)
        .from_dataframe(df, ["review"], id_column="id")
        .with_prompt("Classify: {review}", ["sentiment"])
        .with_custom_llm_client(mock_client_factory(crash_on="BOOM"))
        .with_error_policy("skip")
        .with_observer(obs)
        .build()
        .execute()
    )
    assert res.stats.rows == 2
    blob = " ".join(str(e.payload) for e in sink.events)
    assert "alice@example.com" not in blob
    assert "555-123-4567" not in blob
    kinds = [e.kind for e in sink.events]
    assert "pipeline_start" in kinds and "pipeline_end" in kinds


def test_sanitize_text_and_prompt_digest():
    from ondine_spark.observability import sanitize_prompt, sanitize_text

    s = sanitize_text("ssn 123-45-6789 card 4111 1111 1111 1111 ip 10.0.0.1")
    assert "123-45-6789" not in s and "4111" not in s and "10.0.0.1" not in s
    assert s.count("[REDACTED]") == 3
    d1, d2 = sanitize_prompt("same text"), sanitize_prompt("same text")
    assert d1 == d2 and d1.startswith("<sanitized-")
    assert sanitize_prompt("same text", include_prompts=True) == "same text"


def test_sanitizing_observer_custom_patterns_and_hash_keys():
    from ondine_spark.observability import (
        CollectingObserver,
        PipelineEvent,
        SanitizingObserver,
    )

    sink = CollectingObserver()
    obs = SanitizingObserver(
        sink,
        {"custom_patterns": {"account": r"ACC-\d{6}"}, "hash_keys": ["prompt"]},
    )
    obs.on_event(PipelineEvent(kind="x", run_id="r", payload={
        "error": "failed for ACC-123456",
        "prompt": "raw prompt text",
        "rows": 7,
    }))
    p = sink.events[0].payload
    assert p["error"] == "failed for [REDACTED]"
    assert p["prompt"].startswith("<sanitized-")
    assert p["rows"] == 7


def test_metrics_observer_counters(spark, tmp_path):
    """Counters aggregate across a real run and render as Prometheus
    exposition text (reference: ondine/utils/metrics_exporter.py)."""
    from ondine_spark.observability import MetricsObserver

    m = MetricsObserver()
    res = _run(spark, m, tmp_path)
    snap = m.snapshot()
    assert snap["ondine_rows_processed_total"] == 8.0
    assert snap["ondine_valid_rows_total"] == 8.0
    assert snap["ondine_api_calls_total"] == float(res.api_calls)
    assert snap["ondine_cost_usd_total"] > 0
    assert snap['ondine_events_total{kind="pipeline_start"}'] == 1.0
    assert snap["ondine_last_run_seconds"] > 0
    text = m.render()
    assert "ondine_rows_processed_total 8" in text


def test_metrics_observer_error_counter():
    from ondine_spark.observability import MetricsObserver, PipelineEvent

    m = MetricsObserver()
    m.on_event(PipelineEvent(kind="error", run_id="r",
                             payload={"error": "ValueError: nope"}))
    assert m.snapshot()['ondine_errors_total{type="ValueError"}'] == 1.0


def test_sampled_call_events_from_chunked_run(spark, tmp_path):
    """Executor-side per-call events: a real chunked run with
    with_call_event_sampling must deliver sanitized 'llm_call' events
    (sampled inside the Arrow workers, shipped over the accumulator,
    drained per committed chunk) — with the raw prompt scrubbed."""
    from ondine_spark.observability import CollectingObserver
    from ondine_spark.streaming.runner import iter_chunks

    sink = CollectingObserver()
    rows = [{"id": f"{i}", "review": f"review {i} is great"} for i in range(60)]
    p = (
        PipelineBuilder(spark)
        .from_dataframe(spark.createDataFrame(rows), ["review"], id_column="id")
        .with_prompt("Classify: {review}", ["sentiment"])
        .with_custom_llm_client(mock_client_factory())
        .with_checkpoint_dir(str(tmp_path / "ckpt"), "obs-chunked")
        .with_observer(sink)
        .with_call_event_sampling(every_n=5)
        .build()
    )
    committed = list(iter_chunks(p, chunk_size=20))
    assert len(committed) == 3

    kinds = [e.kind for e in sink.events]
    calls = [e for e in sink.events if e.kind == "llm_call"]
    assert calls, f"no llm_call events in {kinds}"
    # every ~5th call sampled: 60 calls -> ~12 events (per-partition
    # phase makes the exact count layout-dependent; at least 1 per chunk)
    assert len(calls) >= 3
    for e in calls:
        assert e.payload["prompt"].startswith("<sanitized-"), e.payload
        assert "review" not in e.payload["prompt"]
        assert e.payload["error"] is None
        assert e.payload["tokens_in"] > 0
        assert e.run_id == "obs-chunked"
    # drained per chunk: llm_call events appear before the LAST
    # chunk_committed, not only at stream end
    last_commit = max(i for i, k in enumerate(kinds) if k == "chunk_committed")
    assert any(k == "llm_call" for k in kinds[:last_commit])


def test_sampled_call_events_execute_and_cap(spark):
    """execute() drains the accumulator too, and the per-partition cap
    bounds the channel even at every_n=1."""
    from ondine_spark.observability import (
        CALL_EVENT_PARTITION_CAP,
        CollectingObserver,
    )

    sink = CollectingObserver()
    rows = [{"id": f"{i}", "review": f"note {i}"} for i in range(40)]
    p = (
        PipelineBuilder(spark)
        .from_dataframe(spark.createDataFrame(rows), ["review"], id_column="id")
        .with_prompt("Label: {review}", ["label"])
        .with_custom_llm_client(mock_client_factory())
        .with_observer(sink)
        .with_call_event_sampling(every_n=1)
        .build()
    )
    res = p.execute()
    assert res.quality.valid_rows == 40
    calls = [e for e in sink.events if e.kind == "llm_call"]
    n_parts = spark.sparkContext.defaultParallelism
    assert 1 <= len(calls) <= CALL_EVENT_PARTITION_CAP * max(n_parts, 8)
    assert all(e.payload["prompt"].startswith("<sanitized-") for e in calls)


def test_call_event_drain_dedups_task_retries(spark):
    """The accumulator channel is at-least-once (Spark only dedups
    accumulator updates inside actions; these come from a
    transformation) — a retried/speculative task re-adds the SAME
    (epoch, partition, call_index) events. drain_call_events must
    deliver each identity once, across drain boundaries, while never
    dropping a different job's events (fresh epoch)."""
    from ondine_spark.observability import (
        CollectingObserver,
        EventDispatcher,
        drain_call_events,
        make_call_event_accumulator,
    )

    sink = CollectingObserver()
    disp = EventDispatcher([sink])
    acc = make_call_event_accumulator(spark.sparkContext)

    def ev(epoch, part, idx):
        return {
            "prompt": "<sanitized-x>", "model": "m", "tokens_in": 1,
            "tokens_out": 1, "latency_ms": 0.0, "error": None,
            "call_index": idx, "partition": part, "epoch": epoch,
        }

    # attempt 1 of partition 0 emits 2 events, then the speculative /
    # retried attempt re-emits the identical pair
    attempt = [ev("job1", 0, 0), ev("job1", 0, 5)]
    acc.add(list(attempt))
    acc.add(list(attempt))
    assert drain_call_events(acc, disp, "run") == 2

    # a retry straddling the drain boundary: the duplicate arrives AFTER
    # the first drain and must still be dropped
    acc.add([ev("job1", 0, 0)])
    assert drain_call_events(acc, disp, "run") == 0

    # a NEW job (next chunk / re-execute) reuses (partition, call_index)
    # but carries a fresh epoch - it must be delivered, not deduped
    acc.add([ev("job2", 0, 0)])
    assert drain_call_events(acc, disp, "run") == 1

    calls = [e for e in sink.events if e.kind == "llm_call"]
    assert len(calls) == 3
    assert sorted({e.payload["epoch"] for e in calls}) == ["job1", "job2"]
