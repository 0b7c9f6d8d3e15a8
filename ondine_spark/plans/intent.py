"""LLM-drafted pipeline planner (reference:
ondine/orchestration/intent/planner.py): ``plan(goal, data)`` makes ONE
structured LLM call that drafts a pipeline spec for the stated goal, then
validates it through the config loader (same path as YAML configs — the
draft is data, never executed code).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from ondine_spark.config.loader import spec_from_dict
from ondine_spark.core.specs import PipelineSpec

PLANNER_PROMPT = """You design batch LLM data-processing pipelines.

GOAL: {goal}
INPUT COLUMNS: {columns}

Reply with ONLY a JSON object:
{{"prompt_template": "... with {{column}} placeholders ...",
  "output_columns": ["..."],
  "response_format": "raw|json",
  "batch_size": <int 1-100>,
  "system_message": "... or null"}}"""


@dataclass
class Plan:
    spec: PipelineSpec
    raw: dict
    goal: str


def plan(client, goal: str, columns: list[str], model: str = "mock") -> Plan:
    """One driver-side LLM call → validated PipelineSpec draft. The caller
    reviews/edits the plan and supplies the data source + client before
    building (the reference's planner is likewise a draft, not a run)."""
    prompt = PLANNER_PROMPT.format(goal=goal, columns=", ".join(columns))
    res = client.complete(prompt)
    text = res.text.strip()
    if text.startswith("```"):
        text = text.strip("`\n")
        if text.startswith("json"):
            text = text[4:]
    draft = json.loads(text)
    out_cols = list(draft.get("output_columns") or ["output"])
    cfg = {
        "dataset": {"input_columns": list(columns),
                    "output_columns": out_cols},
        "prompt": {
            "template": draft["prompt_template"],
            "response_format": draft.get("response_format", "raw")
            if len(out_cols) == 1 else "json",
            "batch_size": max(1, min(int(draft.get("batch_size", 1)), 100)),
            "system_message": draft.get("system_message"),
        },
        "llm": {"model": model},
    }
    spec = spec_from_dict(cfg)
    # template placeholders must reference real input columns
    from ondine_spark.core.specs import template_placeholders

    bad = [p for p in template_placeholders(spec.prompt.template)
           if p not in columns]
    if bad:
        raise ValueError(
            f"planner drafted placeholders {bad} not in input columns "
            f"{columns}; re-run with a clearer goal"
        )
    return Plan(spec=spec, raw=draft, goal=goal)
