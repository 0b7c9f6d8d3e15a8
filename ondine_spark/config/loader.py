"""YAML/JSON config → PipelineSpec, with ``${ENV_VAR}`` expansion.

Reference: ondine/config/config_loader.py:18-100 (yaml/json by suffix,
recursive env-var interpolation, defaults merged by the spec dataclasses).
"""

from __future__ import annotations

import json
import os
import re
from decimal import Decimal
from typing import Any

from ondine_spark.core.specs import (
    ContextSpec,
    DatasetSpec,
    ErrorPolicy,
    LLMSpec,
    MergeStrategy,
    OutputSpec,
    PipelineSpec,
    ProcessingSpec,
    PromptSpec,
    ResponseFormat,
)

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)(?::-(.*?))?\}")


def _expand_env(value: Any) -> Any:
    """Recursively expand ${VAR} / ${VAR:-default} in strings."""
    if isinstance(value, str):

        def sub(m: re.Match) -> str:
            var, default = m.group(1), m.group(2)
            got = os.environ.get(var)
            if got is None:
                if default is not None:
                    return default
                raise KeyError(f"environment variable {var} is not set "
                               f"(referenced in config)")
            return got

        return _ENV_RE.sub(sub, value)
    if isinstance(value, dict):
        return {k: _expand_env(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_expand_env(v) for v in value]
    return value


def _pick(d: dict, cls, enum_map: dict | None = None):
    """Build dataclass from dict, ignoring unknown keys, coercing enums."""
    import dataclasses

    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in (d or {}).items():
        if k not in fields:
            raise ValueError(f"unknown {cls.__name__} key: {k!r} "
                             f"(valid: {sorted(fields)})")
        if enum_map and k in enum_map and v is not None:
            v = enum_map[k](v)
        if k == "max_budget" and v is not None:
            v = Decimal(str(v))
        if k in ("input_cost_per_1k", "output_cost_per_1k") and v is not None:
            v = Decimal(str(v))
        kwargs[k] = v
    return cls(**kwargs)


def spec_from_dict(cfg: dict) -> PipelineSpec:
    cfg = _expand_env(cfg)
    spec = PipelineSpec(
        dataset=_pick(cfg.get("dataset"), DatasetSpec),
        prompt=_pick(
            cfg.get("prompt"), PromptSpec,
            {"response_format": ResponseFormat},
        ),
        llm=_pick(cfg.get("llm"), LLMSpec),
        processing=_pick(
            cfg.get("processing"), ProcessingSpec,
            {"error_policy": ErrorPolicy},
        ),
        context=_pick(cfg.get("context"), ContextSpec),
    )
    if cfg.get("output"):
        spec.output = _pick(
            cfg["output"], OutputSpec, {"merge_strategy": MergeStrategy}
        )
    return spec


def load_config(path: str) -> PipelineSpec:
    with open(path) as f:
        raw = f.read()
    if path.endswith((".yaml", ".yml")):
        import yaml

        cfg = yaml.safe_load(raw)
    elif path.endswith(".json"):
        cfg = json.loads(raw)
    else:
        raise ValueError(f"unsupported config format: {path}")
    if not isinstance(cfg, dict):
        raise ValueError("config root must be a mapping")
    return spec_from_dict(cfg)
