"""O15 progress trackers: event-stream bridge + live accumulator polling
(reference: ondine/orchestration/progress_tracker.py)."""

from __future__ import annotations

import io
import sys
import time

from pyspark import cloudpickle

from ondine_spark import PipelineBuilder, mock_client_factory
from ondine_spark.orchestration.progress import (
    PlainProgressTracker,
    TrackerObserver,
)

cloudpickle.register_pickle_by_value(sys.modules[__name__])


class RecordingTracker:
    def __init__(self):
        self.calls: list[tuple] = []
        self._n = 0

    def start_stage(self, name, total, **meta):
        self._n += 1
        self.calls.append(("start", name, total, meta))
        return f"t{self._n}"

    def update(self, tid, advance=0, **meta):
        self.calls.append(("update", tid, advance, meta))

    def finish(self, tid):
        self.calls.append(("finish", tid))

    def show_summary(self, result):
        self.calls.append(("summary", result))


def test_tracker_observer_chunked_run(spark, tmp_path):
    """A chunked run drives start/update/finish per chunk with rows+cost,
    then a summary — the per-stage live view the CLI --progress renders."""
    rec = RecordingTracker()
    rows = [{"id": f"r{i:02d}", "review": f"review {i} is great"} for i in range(20)]
    p = (
        PipelineBuilder(spark)
        .from_dataframe(spark.createDataFrame(rows), ["review"], id_column="id")
        .with_prompt("Classify: {review}", ["sentiment"])
        .with_custom_llm_client(mock_client_factory())
        .with_checkpoint_dir(str(tmp_path / "ckpt"), "prog-run")
        .with_observer(TrackerObserver(rec))
        .build()
    )
    from ondine_spark.streaming.runner import execute_chunked

    summary = execute_chunked(p, chunk_size=8)
    assert summary.total_rows == 20
    starts = [c for c in rec.calls if c[0] == "start"]
    finishes = [c for c in rec.calls if c[0] == "finish"]
    updates = [c for c in rec.calls if c[0] == "update"]
    assert len(starts) == 3 and len(finishes) == 3
    assert [c[1] for c in starts] == ["chunk 1/3", "chunk 2/3", "chunk 3/3"]
    # rows_total per stage: 8, 8, 4
    assert [c[2] for c in starts] == [8, 8, 4]
    # every commit update carries the cumulative cost
    commit_updates = [c for c in updates if "cost" in c[3]]
    assert len(commit_updates) == 3
    assert all(c[3]["cost"] is not None for c in commit_updates)


def test_tracker_observer_live_polling():
    """Between chunk_start and chunk_committed the poller advances the bar
    from the (accumulator-style) counter without any commit event."""
    from ondine_spark.observability import PipelineEvent

    rec = RecordingTracker()
    counter = {"v": 0}
    obs = TrackerObserver(rec, poll=lambda: counter["v"], poll_interval=0.02)
    obs.on_event(PipelineEvent(kind="chunk_start", run_id="r",
                               payload={"chunk_id": 0, "chunks_total": 1,
                                        "rows_total": 100}))
    counter["v"] = 40
    time.sleep(0.1)
    obs.on_event(PipelineEvent(kind="chunk_committed", run_id="r",
                               payload={"rows": 100, "cumulative_cost": "0.1"}))
    live = [c for c in rec.calls if c[0] == "update" and c[3].get("done") == 40]
    assert live, f"no live poll update seen in {rec.calls}"
    assert rec.calls[-1][0] == "finish"


def test_plain_tracker_renders_piped_lines():
    buf = io.StringIO()
    t = PlainProgressTracker(stream=buf)
    tid = t.start_stage("chunk 1/2", 10)
    t.update(tid, done=5, cost="0.01")
    t.finish(tid)
    t.show_summary({"rows": 10, "cost": "0.02"})
    out = buf.getvalue()
    assert "chunk 1/2" in out and "5/10" in out and "cost=0.01" in out
    assert "run summary" in out and "rows=10" in out
