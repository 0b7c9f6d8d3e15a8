"""Structured-output mode-fallback chain (L3 production depth).

Reference: ondine/adapters/unified_litellm_client.py:1055-1331 — the
unified client tries provider-native structured modes in a fixed order
and degrades gracefully:

  1. ``tools``  — provider tool/function-calling with the schema as the
     tool signature (strongest guarantee),
  2. ``json``   — provider JSON mode (``response_format=json_object``),
  3. ``prompt`` — plain completion with an explicit JSON instruction
     appended (works on every provider).

The first mode that succeeds is remembered per client instance, so the
probe cost is paid once per executor worker, not once per row — the same
"cache the supported params" behavior the reference implements. Spark
placement: this wrapper composes around any ``LLMClient`` INSIDE the
invocation UDF (one instance per Python worker), so the fallback is a
worker-local decision with no driver round-trips.

A base client advertises a mode by exposing ``complete_tools(prompt,
fields, system)`` / ``complete_json(prompt, fields, system)``; absent
methods mean "mode unsupported" (skipped without an API call), raising
``StructuredModeError`` means "provider rejected the mode" (fall
through). Any other exception propagates — real transport errors must
reach the retry/backoff machinery, not be eaten by the fallback chain.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence


class StructuredModeError(Exception):
    """A provider rejected a structured-output mode (e.g. HTTP 400
    'tools not supported for this model'). Signals the chain to fall
    through to the next mode; unrelated errors must NOT use this type."""


MODES = ("tools", "json", "prompt")


class StructuredOutputClient:
    """Wrap ``base`` so ``complete()`` walks the tools → json → prompt
    chain and sticks to the first working mode."""

    def __init__(self, base: Any, fields: Sequence[str],
                 modes: Sequence[str] = MODES):
        unknown = set(modes) - set(MODES)
        if unknown:
            raise ValueError(f"unknown structured modes: {sorted(unknown)}")
        self.base = base
        self.fields = list(fields)
        self.modes = list(modes)
        self.model = getattr(base, "model", "unknown")
        self._mode: str | None = None
        self.attempts: list[str] = []  # probe trace, mostly for tests/debug

    # ------------------------------------------------------------------
    def _prompt_instruction(self, prompt: str) -> str:
        keys = ", ".join(f'"{f}"' for f in self.fields)
        return (
            f"{prompt}\n\nRespond ONLY with a single JSON object with "
            f"exactly these keys: {keys}. No prose, no code fences."
        )

    def _try(self, mode: str, prompt: str, system: str | None):
        if mode == "tools":
            fn = getattr(self.base, "complete_tools", None)
            if fn is None:
                raise StructuredModeError("client has no tools mode")
            return fn(prompt, self.fields, system)
        if mode == "json":
            fn = getattr(self.base, "complete_json", None)
            if fn is None:
                raise StructuredModeError("client has no json mode")
            return fn(prompt, self.fields, system)
        return self.base.complete(self._prompt_instruction(prompt), system)

    def complete(self, prompt: str, system: str | None = None):
        if self._mode is not None:
            return self._try(self._mode, prompt, system)
        errors: list[str] = []
        for mode in self.modes:
            self.attempts.append(mode)
            try:
                result = self._try(mode, prompt, system)
            except StructuredModeError as e:
                errors.append(f"{mode}: {e}")
                continue
            self._mode = mode
            return result
        raise StructuredModeError(
            "every structured-output mode failed: " + "; ".join(errors)
        )

    @property
    def mode(self) -> str | None:
        """The sticky mode chosen by the first successful call."""
        return self._mode


def structured_factory(
    base_factory: Callable[[], Any],
    fields: Sequence[str],
    modes: Sequence[str] = MODES,
) -> Callable[[], Any]:
    """Wrap a client factory so each executor worker builds a
    mode-fallback client (used by PipelineBuilder.with_structured_output
    when the base client exposes structured modes)."""
    fields = list(fields)
    modes = list(modes)

    def factory():
        return StructuredOutputClient(base_factory(), fields, modes)

    return factory
