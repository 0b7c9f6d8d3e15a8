"""Workflow-engine integrations (reference: ondine/integrations/airflow.py,
ondine/integrations/prefect.py) and an MCP server facade
(ondine/mcp/server.py:109-252).

All import-guarded: Airflow/Prefect/MCP are not installed in this
environment; each factory raises a clear ImportError when its host
framework is absent. The run logic is shared — one function that loads a
config, executes, and returns the summary dict the CLI also prints.
"""

from __future__ import annotations

import json
import uuid
from typing import Any


def run_pipeline_from_config(
    config_path: str,
    run_id: str | None = None,
    registry_path: str | None = None,
    chunked: bool = False,
    chunk_size: int = 10_000,
) -> dict[str, Any]:
    """The shared body behind the CLI ``process`` command, the Airflow
    operator, the Prefect task, and the MCP ``run`` tool."""
    from ondine_spark.cli import cmd_process

    class _Args:
        pass

    a = _Args()
    a.config = config_path
    a.run_id = run_id or uuid.uuid4().hex[:12]
    a.registry = registry_path
    a.chunked = chunked
    a.chunk_size = chunk_size
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cmd_process(a)
    return json.loads(buf.getvalue().strip().splitlines()[-1])


def estimate_from_config(config_path: str, sample: int = 10) -> dict[str, Any]:
    from ondine_spark.config import load_config
    from ondine_spark.plans.pipeline import Pipeline

    p = Pipeline(load_config(config_path))
    est = p.estimate_cost(sample=sample)
    est["estimated_cost"] = str(est["estimated_cost"])
    return est


def llm_transform_operator(**op_kwargs):  # pragma: no cover - airflow absent
    """Airflow ``LLMTransformOperator`` factory (reference:
    ondine/integrations/airflow.py:23). Usage::

        t = llm_transform_operator(task_id="enrich", config_path="p.yaml")
    """
    try:
        from airflow.models import BaseOperator
    except ImportError as e:
        raise ImportError(
            "apache-airflow is not installed; the operator factory needs it"
        ) from e

    class LLMTransformOperator(BaseOperator):
        template_fields = ("config_path",)

        def __init__(self, config_path: str, registry_path: str | None = None,
                     chunked: bool = True, **kwargs):
            super().__init__(**kwargs)
            self.config_path = config_path
            self.registry_path = registry_path
            self.chunked = chunked

        def execute(self, context):
            return run_pipeline_from_config(
                self.config_path, run_id=context["run_id"],
                registry_path=self.registry_path, chunked=self.chunked,
            )

    return LLMTransformOperator(**op_kwargs)


def prefect_task():  # pragma: no cover - prefect absent
    """Prefect task factory (reference: ondine/integrations/prefect.py)."""
    try:
        from prefect import task
    except ImportError as e:
        raise ImportError("prefect is not installed") from e

    @task(name="ondine-spark-enrich", retries=0)
    def enrich_task(config_path: str, registry_path: str | None = None):
        return run_pipeline_from_config(
            config_path, registry_path=registry_path, chunked=True
        )

    return enrich_task


def mcp_server():  # pragma: no cover - mcp absent
    """MCP server exposing estimate/run/status tools (reference:
    ondine/mcp/server.py:109-252,412-462)."""
    try:
        from mcp.server.fastmcp import FastMCP
    except ImportError as e:
        raise ImportError("the 'mcp' package is not installed") from e

    srv = FastMCP("ondine-spark")

    @srv.tool()
    def ondine_estimate(config_path: str, sample: int = 10) -> dict:
        """Sample-based cost estimate for a pipeline config."""
        return estimate_from_config(config_path, sample)

    @srv.tool()
    def ondine_run(config_path: str, registry_path: str | None = None) -> dict:
        """Run a pipeline from config (chunked, durable commits)."""
        return run_pipeline_from_config(
            config_path, registry_path=registry_path, chunked=True
        )

    @srv.tool()
    def ondine_status(run_id: str, registry_path: str) -> dict:
        """Run state from the registry."""
        from ondine_spark.orchestration.registry import RunRegistry

        rec = RunRegistry(registry_path).get(run_id)
        return {"run_id": rec.run_id, "state": rec.state.value,
                "meta": rec.meta}

    return srv
