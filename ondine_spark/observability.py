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
import re
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


class LangfuseObserver:
    """Langfuse trace sink (reference:
    ondine/observability/observers/langfuse_observer.py). One trace per
    run: ``pipeline_start`` opens it, intermediate events attach as
    trace events, ``pipeline_end`` records the aggregate outcome and
    flushes. Driver-side only — it sees the run-level aggregate events,
    never per-row executor traffic.

    ``client`` is injectable (tests pass a fake recorder); without one
    the real ``langfuse.Langfuse`` is constructed — import-guarded, so
    this class only needs the SDK when actually instantiated without a
    client."""

    def __init__(self, client: Any = None, **client_kwargs):
        if client is None:  # pragma: no cover - langfuse not installed here
            try:
                from langfuse import Langfuse
            except ImportError as e:
                raise ImportError(
                    "LangfuseObserver needs the langfuse SDK "
                    "(pip install langfuse) or an injected client"
                ) from e
            client = Langfuse(**client_kwargs)
        self.client = client
        self._traces: dict[str, Any] = {}

    def on_event(self, event: PipelineEvent) -> None:
        rid = event.run_id or "default"
        if event.kind == "pipeline_start":
            self._traces[rid] = self.client.trace(
                name="ondine_spark_run", id=rid, metadata=dict(event.payload)
            )
            return
        trace = self._traces.get(rid)
        if trace is None:
            trace = self._traces[rid] = self.client.trace(
                name="ondine_spark_run", id=rid, metadata={}
            )
        if event.kind == "pipeline_end":
            trace.update(output=dict(event.payload))
            if hasattr(self.client, "flush"):
                self.client.flush()
            self._traces.pop(rid, None)
        elif event.kind == "error":
            trace.event(name="error", level="ERROR",
                        metadata=dict(event.payload))
        else:
            trace.event(name=event.kind, metadata=dict(event.payload))


class OpenTelemetryObserver:
    """OTel span sink (reference:
    ondine/observability/observers/opentelemetry_observer.py). A run maps
    to one span: opened at ``pipeline_start``, annotated with span events
    for intermediate kinds, closed at ``pipeline_end`` with the aggregate
    payload as attributes; errors set the span status.

    ``tracer`` is injectable (tests pass a fake); otherwise the global
    OTel tracer provider supplies one — import-guarded."""

    def __init__(self, tracer: Any = None):
        if tracer is None:  # pragma: no cover - otel not installed here
            try:
                from opentelemetry import trace as _ot
            except ImportError as e:
                raise ImportError(
                    "OpenTelemetryObserver needs opentelemetry-api "
                    "(pip install opentelemetry-api) or an injected tracer"
                ) from e
            tracer = _ot.get_tracer("ondine_spark")
        self.tracer = tracer
        self._spans: dict[str, Any] = {}

    @staticmethod
    def _attrs(payload: dict) -> dict:
        # OTel attribute values must be str/bool/int/float (or sequences)
        return {
            f"ondine.{k}": v if isinstance(v, (str, bool, int, float))
            else str(v)
            for k, v in payload.items()
        }

    def on_event(self, event: PipelineEvent) -> None:
        rid = event.run_id or "default"
        if event.kind == "pipeline_start":
            span = self.tracer.start_span("ondine_spark_run")
            span.set_attribute("ondine.run_id", rid)
            for k, v in self._attrs(event.payload).items():
                span.set_attribute(k, v)
            self._spans[rid] = span
            return
        span = self._spans.get(rid)
        if span is None:
            return  # end/error without a start: nothing to annotate
        if event.kind == "pipeline_end":
            for k, v in self._attrs(event.payload).items():
                span.set_attribute(k, v)
            span.end()
            self._spans.pop(rid, None)
        elif event.kind == "error":
            span.add_event("error", attributes=self._attrs(event.payload))
            if hasattr(span, "set_status"):
                try:  # pragma: no cover - status types vary by SDK
                    from opentelemetry.trace import Status, StatusCode

                    span.set_status(Status(StatusCode.ERROR))
                except ImportError:
                    pass
        else:
            span.add_event(event.kind, attributes=self._attrs(event.payload))


# ---------------------------------------------------------- PII sanitizer
# Reference: ondine/observability/sanitizer.py:14-110 — events must be
# PII-safe before leaving the process (traces/logs are retained far longer
# than the data they describe). Same default pattern set; the column-level
# twin for DATA (not events) is operators/text_analysis.redact_pii.

PII_PATTERNS = {
    "email": re.compile(r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b"),
    "ssn": re.compile(r"\b\d{3}-\d{2}-\d{4}\b"),
    "credit_card": re.compile(r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b"),
    "phone_us": re.compile(r"\b\d{3}[-.]?\d{3}[-.]?\d{4}\b"),
    "api_key": re.compile(
        r"\b(?:api[_-]?key|secret|token)[:\s=]+['\"]?([a-zA-Z0-9_\-]{16,})['\"]?\b",
        re.IGNORECASE,
    ),
    "ip_address": re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
}


def sanitize_text(
    text: str,
    patterns: dict | None = None,
    replacement: str = "[REDACTED]",
) -> str:
    """Replace every PII pattern occurrence in ``text``."""
    out = text
    for pat in (patterns or PII_PATTERNS).values():
        out = pat.sub(replacement, out)
    return out


def sanitize_prompt(prompt: str, include_prompts: bool = False) -> str:
    """Content-free stable digest unless prompts are opted in (reference
    sanitizer.py:64-91): traces can correlate identical prompts without
    disclosing them."""
    if include_prompts:
        return prompt
    import hashlib

    digest = hashlib.sha256(str(prompt).encode("utf-8")).hexdigest()[:8]
    return f"<sanitized-{digest}>"


class SanitizingObserver:
    """Wrap any sink so every string in the payload is PII-scrubbed before
    forwarding (reference sanitize_event, sanitizer.py:112-176). Error
    payloads are the riskiest: provider exceptions routinely echo the
    offending prompt back.

    ``config``: ``custom_patterns`` (name -> regex str, merged with the
    defaults), ``replacement``, and ``hash_keys`` — payload keys whose
    value is replaced by the content-free digest instead of in-place
    scrubbing (for raw prompt/response fields)."""

    def __init__(self, inner: Observer, config: dict | None = None):
        cfg = config or {}
        self.inner = inner
        self.patterns = dict(PII_PATTERNS)
        for name, pat in cfg.get("custom_patterns", {}).items():
            self.patterns[name] = re.compile(pat)
        self.replacement = cfg.get("replacement", "[REDACTED]")
        self.hash_keys = set(cfg.get("hash_keys", ("prompt", "response_text")))

    def on_event(self, event: PipelineEvent) -> None:
        clean = {}
        for k, v in event.payload.items():
            if isinstance(v, str):
                v = (
                    sanitize_prompt(v)
                    if k in self.hash_keys
                    else sanitize_text(v, self.patterns, self.replacement)
                )
            clean[k] = v
        self.inner.on_event(
            PipelineEvent(kind=event.kind, run_id=event.run_id,
                          ts=event.ts, payload=clean)
        )


# --------------------------------------------------------- metrics export
class MetricsObserver:
    """Counter/gauge aggregation over the event stream with a Prometheus
    exposition rendering (reference: ondine/utils/metrics_exporter.py —
    requests/cost/errors/rows counters behind a /metrics port; here the
    counters aggregate driver-side events, ``render()`` emits the
    text format, and ``serve()`` binds the optional HTTP endpoint).

    Counters survive multiple runs in one session; ``snapshot()`` is a
    plain dict for tests/dashboards."""

    def __init__(self):
        self.counters: dict[str, float] = {}
        self._t0: dict[str, float] = {}

    def _inc(self, name: str, value: float = 1.0) -> None:
        self.counters[name] = self.counters.get(name, 0.0) + value

    def on_event(self, event: PipelineEvent) -> None:
        p = event.payload
        kind = event.kind
        self._inc(f"ondine_events_total{{kind=\"{kind}\"}}")
        if kind == "pipeline_start":
            self._t0[event.run_id or "-"] = event.ts
        elif kind == "pipeline_end":
            self._inc("ondine_rows_processed_total", float(p.get("rows") or 0))
            self._inc("ondine_valid_rows_total", float(p.get("valid_rows") or 0))
            self._inc("ondine_api_calls_total", float(p.get("api_calls") or 0))
            self._inc("ondine_cost_usd_total", float(p.get("cost") or 0))
            t0 = self._t0.pop(event.run_id or "-", None)
            if t0 is not None:
                dur = max(event.ts - t0, 1e-9)
                self.counters["ondine_last_run_seconds"] = dur
                rows = float(p.get("rows") or 0)
                self.counters["ondine_last_run_rows_per_second"] = rows / dur
        elif kind == "chunk_committed":
            self._inc("ondine_chunks_committed_total")
            self._inc("ondine_rows_processed_total", float(p.get("rows") or 0))
        elif kind == "error":
            err = str(p.get("error") or "")
            etype = err.split(":", 1)[0] or "unknown"
            self._inc(f"ondine_errors_total{{type=\"{etype}\"}}")

    def snapshot(self) -> dict:
        return dict(self.counters)

    def render(self) -> str:
        """Prometheus text exposition format."""
        lines = []
        for name in sorted(self.counters):
            lines.append(f"{name} {self.counters[name]:g}")
        return "\n".join(lines) + "\n"

    def serve(self, port: int = 9090):  # pragma: no cover - needs a socket
        """Bind a minimal /metrics HTTP endpoint (stdlib only, daemon
        thread), mirroring the reference's start_server."""
        import threading
        from http.server import BaseHTTPRequestHandler, HTTPServer

        metrics = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):
                body = metrics.render().encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        server = HTTPServer(("", port), Handler)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        return server


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


# ------------------------------------------------------------------------
# executor-side sampled per-call events (reference events.py per-call
# taxonomy). Observers live on the DRIVER; the LLM calls happen inside
# Arrow workers — the bridge is a list-valued Spark accumulator: workers
# append small sanitized event dicts (sampled, per-partition capped), the
# driver drains the accumulator after each action and feeds the
# dispatcher. Prompts are scrubbed WORKER-side (sanitize_prompt digest),
# so raw text never crosses the accumulator channel.

# hard per-partition cap — the accumulator rides the task-status channel,
# so the payload must stay small no matter what sample rate is configured
CALL_EVENT_PARTITION_CAP = 50


try:
    from pyspark.accumulators import AccumulatorParam as _AccumBase
except Exception:  # pragma: no cover - spark-free import
    _AccumBase = object


class _ListAccumulatorParam(_AccumBase):
    def zero(self, value):
        return []

    def addInPlace(self, a, b):
        a.extend(b)
        return a


def make_call_event_accumulator(sc):
    """A list-valued accumulator for sampled call events."""
    return sc.accumulator([], _ListAccumulatorParam())


def drain_call_events(acc, dispatcher, run_id=None) -> int:
    """Emit every accumulated sampled call event (kind 'llm_call') and
    reset the accumulator; returns the number emitted. Driver-side.

    Exactly-once delivery over an at-least-once channel: Spark
    deduplicates accumulator updates only for tasks inside ACTIONS —
    these events are added from a transformation (the invoke
    mapInPandas), so a retried or speculative task re-emits its
    partition's events. Workers therefore stamp each event with its
    (epoch, partition, call_index) identity — epoch is unique per
    invoke-stage construction and call_index is a deterministic
    per-partition counter, so both attempts of a partition produce the
    SAME keys while distinct jobs (chunks, re-executes, auto-retry
    passes) never collide — and this drain drops keys it has already
    delivered. The seen-set lives on the accumulator object so it
    survives per-chunk drains within a run (a retry can straddle a
    drain boundary); it is bounded by CALL_EVENT_PARTITION_CAP ×
    partitions × jobs and dies with the pipeline object.
    """
    events = list(acc.value)
    acc.value = []
    seen = getattr(acc, "_ondine_delivered", None)
    if seen is None:
        seen = set()
        acc._ondine_delivered = seen
    emitted = 0
    for ev in events:
        key = (ev.get("epoch"), ev.get("partition"), ev.get("call_index"))
        if key in seen:
            continue
        seen.add(key)
        dispatcher.emit("llm_call", run_id=run_id, **ev)
        emitted += 1
    return emitted
