"""LLM client protocol + deterministic mock clients.

The engine treats the LLM as a pluggable callable living inside executor
processes (one client per Python worker, created from a broadcast factory).
Reference surface: ondine/adapters/llm_client.py, custom-client injection
ondine/api/pipeline_builder.py:628-665.

The ``DeterministicMockClient`` mirrors the reference's deterministic
in-process LLM used by its benchmarks (reference: benchmarks/RESULTS.md:14):
the response is a pure function of the prompt, so every LLM-marked operator
becomes oracle-checkable. Its rule semantics (first matching keyword wins)
are deliberately SQL-expressible so the driver's DuckDB oracle can replay
them as a CASE expression.
"""

from __future__ import annotations

import json
import re
import time
from dataclasses import dataclass, field
from decimal import Decimal
from typing import Any, Protocol, runtime_checkable


@dataclass
class LLMResult:
    """One completion. Reference shape: ondine/core/models.py:21-33."""

    text: str
    tokens_in: int
    tokens_out: int
    model: str
    cost: Decimal
    latency_ms: float = 0.0
    error: str | None = None
    # provider-side prompt-cache hits (OpenAI cached_tokens / Anthropic
    # cache_read_input_tokens); 0 when the provider reports none
    tokens_cached: int = 0


@runtime_checkable
class LLMClient(Protocol):
    """Minimal client contract: sync complete(). Async batching is the
    engine's job (asyncio loop inside the invocation UDF), not the client's.
    """

    model: str

    def complete(self, prompt: str, system: str | None = None) -> LLMResult: ...


def _count_tokens(text: str) -> int:
    """Whitespace token count — matches Python ``str.split()`` semantics and
    the DuckDB oracle expression ``len(regexp_extract_all(x, '\\S+'))``."""
    return len(text.split())


@dataclass
class DeterministicMockClient:
    """Pure-function-of-prompt mock client.

    rules: ordered (keyword, label) pairs; first keyword contained in the
    prompt (case-insensitive) wins, else ``default``. With ``json_fields``
    set, emits a JSON object ``{field: label-or-derived}`` instead of the
    bare label, exercising the JSON parser path.

    Also understands the engine's mega-batch prompt format (a JSON array of
    ``{"id": i, "input": ...}`` items — see ondine_spark.operators.batching)
    and answers with the matching JSON array, like the reference's
    deterministic batch LLM (reference: strategies/json_batch_strategy.py).
    """

    rules: tuple = (
        ("excellent", "positive"),
        ("great", "positive"),
        ("good", "positive"),
        ("love", "positive"),
        ("terrible", "negative"),
        ("bad", "negative"),
        ("awful", "negative"),
        ("poor", "negative"),
    )
    default: str = "neutral"
    json_fields: tuple = ()  # emit {"f1": label, ...} when set
    model: str = "mock-sentiment"
    input_cost_per_1k: Decimal = Decimal("0.0005")
    output_cost_per_1k: Decimal = Decimal("0.0015")
    # failure injection knobs (for retry / error-policy / budget tests)
    fail_every: int = 0  # raise on every Nth call (1-based counter)
    fail_times: int = 0  # then succeed after this many failures per prompt
    crash_on: str | None = None  # raise FatalLLMError when prompt contains this
    count_file: str | None = None  # append one line per call (cross-run counting)
    latency_s: float = 0.0
    _calls: int = field(default=0, repr=False)
    _fail_counts: dict = field(default_factory=dict, repr=False)

    def classify(self, text: str) -> str:
        low = text.lower()
        for kw, label in self.rules:
            if kw in low:
                return label
        return self.default

    def _answer(self, prompt: str) -> str:
        if self.json_fields:
            return json.dumps(
                {f: self.classify(prompt) if i == 0 else str(len(prompt.split()))
                 for i, f in enumerate(self.json_fields)},
                separators=(",", ":"),
            )
        return self.classify(prompt)

    def complete(self, prompt: str, system: str | None = None) -> LLMResult:
        self._calls += 1
        if self.count_file:
            with open(self.count_file, "a") as f:
                f.write("1\n")
        if self.crash_on and self.crash_on in prompt:
            raise FatalLLMError(f"injected crash on marker {self.crash_on!r}")
        if self.latency_s:
            time.sleep(self.latency_s)
        if self.fail_every and self._calls % self.fail_every == 0:
            n = self._fail_counts.get(prompt, 0)
            if n < self.fail_times:
                self._fail_counts[prompt] = n + 1
                raise TransientLLMError("injected 429", retry_after=0.01)

        items = _parse_batch_items(prompt)
        if items is not None:
            out = [{"id": i, "result": self._answer(inp)} for i, inp in items]
            text = json.dumps(out, separators=(",", ":"))
        else:
            text = self._answer(prompt)

        tin = _count_tokens(prompt) + (_count_tokens(system) if system else 0)
        tout = _count_tokens(text)
        cost = (
            Decimal(tin) * self.input_cost_per_1k
            + Decimal(tout) * self.output_cost_per_1k
        ) / Decimal(1000)
        return LLMResult(
            text=text, tokens_in=tin, tokens_out=tout, model=self.model, cost=cost
        )


class TransientLLMError(Exception):
    """Retryable error (429/5xx analog). Carries optional Retry-After."""

    def __init__(self, msg: str, retry_after: float | None = None):
        super().__init__(msg)
        self.retry_after = retry_after


class FatalLLMError(Exception):
    """Non-retryable error (auth, 400...)."""


_BATCH_RE = re.compile(r"INPUT:\n(\[.*?\])\n\nCRITICAL", re.DOTALL)


def _parse_batch_items(prompt: str):
    """Detect the engine's mega-batch prompt and return [(id, input), ...]."""
    m = _BATCH_RE.search(prompt)
    if not m:
        return None
    try:
        data = json.loads(m.group(1))
        return [(it["id"], it["input"]) for it in data]
    except (json.JSONDecodeError, KeyError, TypeError):
        return None


def mock_client_factory(**kwargs):
    """Picklable factory helper for broadcasting into executors."""
    def factory():
        return DeterministicMockClient(**kwargs)

    return factory
