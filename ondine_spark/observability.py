"""Observability (O14/O15, thin): event dataclasses + dispatcher + sinks.

Reference (ondine/observability/: dispatcher, events, langfuse/otel/logging
observers; legacy observers ondine/orchestration/observers.py): pipeline
start/end, per-call, and error events fanned out to pluggable sinks with a
PII-safe payload.

Spark-first: driver-side events carry AGGREGATE run facts (row counts from
the quality report, cost/token totals from the stats aggregation, API
calls from the accumulator) rather than per-row callbacks — per-row
streams from inside executors would serialize the hot path. External
sinks (Langfuse/OTel) are import-guarded; the logging and collecting
sinks are always available.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Any, Protocol

log = logging.getLogger("ondine_spark")


@dataclass
class PipelineEvent:
    kind: str  # pipeline_start | pipeline_end | error
    run_id: str | None = None
    ts: float = field(default_factory=time.time)
    payload: dict[str, Any] = field(default_factory=dict)


class Observer(Protocol):
    def on_event(self, event: PipelineEvent) -> None: ...


class LoggingObserver:
    def __init__(self, level: int = logging.INFO):
        self.level = level

    def on_event(self, event: PipelineEvent) -> None:
        log.log(self.level, "%s %s %s", event.kind, event.run_id or "-",
                event.payload)


class CollectingObserver:
    """Test/metric sink: keeps events in memory."""

    def __init__(self):
        self.events: list[PipelineEvent] = []

    def on_event(self, event: PipelineEvent) -> None:
        self.events.append(event)


class ProgressObserver:
    """O15: human progress lines on stderr (CLI ``--progress``).

    Renders a bar per committed chunk — driver-side only, fed by the
    chunk_committed events the chunked runner already emits, so it adds
    zero executor work. Reference analogue: the Rich progress bars of
    ondine/ui/progress_display.py, minus the TTY dependency (safe to pipe:
    one plain line per event, no cursor control)."""

    def __init__(self, stream=None, width: int = 24):
        import sys as _sys

        self.stream = stream or _sys.stderr
        self.width = width
        self.t0 = time.time()
        self.rows = 0

    def on_event(self, event: PipelineEvent) -> None:
        p = event.payload
        if event.kind == "pipeline_start":
            print(
                f"[{event.run_id}] start model={p.get('model')} "
                f"batch_size={p.get('batch_size')}",
                file=self.stream, flush=True,
            )
        elif event.kind == "chunk_committed":
            done, total = p.get("chunks_done", 0), p.get("chunks_total", 0)
            self.rows += p.get("rows", 0)
            frac = done / total if total else 0.0
            filled = int(self.width * frac)
            bar = "#" * filled + "-" * (self.width - filled)
            dt = max(time.time() - self.t0, 1e-9)
            print(
                f"[{event.run_id}] |{bar}| chunk {done}/{total} "
                f"rows={self.rows} ({self.rows / dt:.0f}/s) "
                f"cost={p.get('cumulative_cost')}",
                file=self.stream, flush=True,
            )
        elif event.kind == "pipeline_end":
            print(
                f"[{event.run_id}] done rows={p.get('rows')} "
                f"cost={p.get('cost')} api_calls={p.get('api_calls')}",
                file=self.stream, flush=True,
            )
        elif event.kind == "error":
            print(
                f"[{event.run_id}] ERROR {p.get('error')}",
                file=self.stream, flush=True,
            )


class EventDispatcher:
    def __init__(self, observers: list[Observer] | None = None):
        self.observers = list(observers or [])

    def add(self, observer: Observer) -> None:
        self.observers.append(observer)

    def emit(self, kind: str, run_id: str | None = None, **payload) -> None:
        ev = PipelineEvent(kind=kind, run_id=run_id, payload=payload)
        for obs in self.observers:
            try:
                obs.on_event(ev)
            except Exception:  # observer failures never kill the run
                log.exception("observer %r failed", obs)
