"""Provider registry / presets (L7) and client factory resolution.

Reference (ondine/adapters/provider_registry.py; presets
ondine/core/specifications.py:570-722): named LLMSpec presets with
published per-1k pricing and an ``@provider`` registration hook; the model
string's prefix picks the provider (ondine/api/quick.py:269).

Here: a small preset table (public list-price snapshots — they drive cost
ESTIMATES, not billing), a ``@provider`` registry for custom client
factories, and ``client_factory_for`` which resolves, in precedence order
(reference: ondine/api/pipeline.py:792-795):
  1. explicit ``LLMSpec.client_factory``
  2. a registered custom provider matching the model prefix
  3. ``mock`` → DeterministicMockClient
  4. litellm, if installed (not in this environment — import-guarded)
"""

from __future__ import annotations

from decimal import Decimal
from typing import Any, Callable

# model name → (input $/1k tokens, output $/1k tokens); public list prices
PRESETS: dict[str, tuple[str, str]] = {
    "gpt-4o-mini": ("0.00015", "0.0006"),
    "gpt-4o": ("0.0025", "0.01"),
    "gpt-4.1-mini": ("0.0004", "0.0016"),
    "claude-3-5-haiku": ("0.0008", "0.004"),
    "claude-sonnet-4": ("0.003", "0.015"),
    "deepseek-chat": ("0.00027", "0.0011"),
    "gemini-2.0-flash": ("0.0001", "0.0004"),
    "mock": ("0.000005", "0.000015"),
}

_REGISTRY: dict[str, Callable[..., Any]] = {}


def provider(prefix: str):
    """``@provider("myprov")`` registers a client factory for models named
    ``myprov/<anything>`` (U4)."""

    def deco(factory: Callable[..., Any]):
        _REGISTRY[prefix] = factory
        return factory

    return deco


def preset_costs(model: str) -> tuple[Decimal, Decimal] | None:
    base = model.split("/")[-1]
    for name, (cin, cout) in PRESETS.items():
        if base.startswith(name):
            return Decimal(cin), Decimal(cout)
    return None


def list_providers() -> list[dict]:
    rows = [
        {"model": m, "input_per_1k": cin, "output_per_1k": cout,
         "source": "preset"}
        for m, (cin, cout) in sorted(PRESETS.items())
    ]
    rows += [
        {"model": f"{p}/*", "input_per_1k": "-", "output_per_1k": "-",
         "source": "registered"}
        for p in sorted(_REGISTRY)
    ]
    return rows


def cached_tokens_from_usage(usage: Any) -> int:
    """Provider-side prompt-cache hit detection (reference:
    unified_litellm_client.py:_check_cache_hit): OpenAI/Azure report
    ``usage.prompt_tokens_details.cached_tokens``; Anthropic reports
    ``usage.cache_read_input_tokens``. Accepts attribute- or dict-shaped
    usage; returns 0 when nothing is cached."""
    if usage is None:
        return 0

    def get(obj, name, default=None):
        if isinstance(obj, dict):
            return obj.get(name, default)
        return getattr(obj, name, default)

    details = get(usage, "prompt_tokens_details")
    cached = get(details, "cached_tokens", 0) if details is not None else 0
    if not cached:
        cached = get(usage, "cache_read_input_tokens", 0)
    try:
        return int(cached or 0)
    except (TypeError, ValueError):
        return 0


def client_factory_for(llm_spec) -> Callable[[], Any]:
    if llm_spec.client_factory is not None:
        return llm_spec.client_factory
    model = llm_spec.model or "mock"
    prefix = model.split("/")[0]
    if prefix in _REGISTRY:
        factory = _REGISTRY[prefix]
        return lambda: factory(model=model)
    if model == "mock" or model.startswith("mock"):
        from ondine_spark.llm.client import DeterministicMockClient

        return lambda: DeterministicMockClient()
    try:  # pragma: no cover - litellm not installed in this environment
        import litellm  # noqa: F401
    except ImportError:
        raise ValueError(
            f"no client for model {model!r}: pass a client_factory, register "
            f"a @provider for prefix {prefix!r}, use model='mock', or "
            f"install litellm"
        )

    def _litellm_factory():  # pragma: no cover
        from ondine_spark.llm.client import LLMResult
        from ondine_spark.llm.structured import StructuredModeError

        class LiteLLMClient:
            """Thin litellm adapter. The structured-mode methods raise
            StructuredModeError on provider rejection so the
            StructuredOutputClient chain (llm/structured.py) can fall
            through tools → json → prompt, mirroring the reference's
            unified client (unified_litellm_client.py:1055-1331)."""

            def __init__(self):
                self.model = model
                cfg = getattr(llm_spec, "cache_config", None)
                if cfg:  # reference with_redis_cache/with_disk_cache
                    from litellm.caching import Cache

                    if cfg.get("type") == "redis":
                        litellm.cache = Cache(
                            type="redis", url=cfg.get("host"),
                            ttl=cfg.get("ttl"),
                        )
                    elif cfg.get("type") == "disk":
                        litellm.cache = Cache(
                            type="disk",
                            disk_cache_dir=cfg.get("disk_cache_dir"),
                        )

            def _call(self, msgs, **extra):
                try:
                    r = litellm.completion(model=model, messages=msgs, **extra)
                except Exception as e:
                    # litellm maps provider 400s for unsupported params to
                    # BadRequestError; that's a mode problem, not transport
                    if type(e).__name__ in ("BadRequestError",
                                            "UnsupportedParamsError"):
                        raise StructuredModeError(str(e)) from e
                    raise
                usage = r.get("usage", {})
                choice = r["choices"][0]["message"]
                text = choice.get("content")
                if text is None and choice.get("tool_calls"):
                    text = choice["tool_calls"][0]["function"]["arguments"]
                return LLMResult(
                    text=text or "",
                    tokens_in=usage.get("prompt_tokens", 0),
                    tokens_out=usage.get("completion_tokens", 0),
                    model=model,
                    cost=str(r._hidden_params.get("response_cost") or 0),
                    latency_ms=0.0,
                    tokens_cached=cached_tokens_from_usage(usage),
                )

            @staticmethod
            def _msgs(prompt, system):
                msgs = ([{"role": "system", "content": system}]
                        if system else [])
                msgs.append({"role": "user", "content": prompt})
                return msgs

            def complete(self, prompt: str, system: str | None = None):
                return self._call(self._msgs(prompt, system))

            def complete_tools(self, prompt, fields, system=None):
                tool = {
                    "type": "function",
                    "function": {
                        "name": "emit_result",
                        "description": "Return the structured answer.",
                        "parameters": {
                            "type": "object",
                            "properties": {f: {"type": "string"}
                                           for f in fields},
                            "required": list(fields),
                        },
                    },
                }
                return self._call(
                    self._msgs(prompt, system), tools=[tool],
                    tool_choice={"type": "function",
                                 "function": {"name": "emit_result"}},
                )

            def complete_json(self, prompt, fields, system=None):
                keys = ", ".join(fields)
                return self._call(
                    self._msgs(
                        f"{prompt}\nReturn a JSON object with keys: {keys}.",
                        system,
                    ),
                    response_format={"type": "json_object"},
                )

        return LiteLLMClient()

    return _litellm_factory
