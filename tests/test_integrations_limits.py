"""Integrations facade + context-limit validation."""

import sys

import pytest
from pyspark import cloudpickle
from pyspark.sql import functions as F

cloudpickle.register_pickle_by_value(sys.modules[__name__])


def test_context_limit_validation(spark):
    from ondine_spark.llm.context_limits import validate_batch_size

    prompts = spark.createDataFrame(
        [(i, "word " * 100) for i in range(50)], ["id", "prompt"]
    )
    ok = validate_batch_size(prompts, batch_size=10, model="mock")
    assert ok["ok"] and ok["max_batch_size"] > 10

    # tiny context: deepseek 64k*0.8; 100-word prompts ≈ 130+12 tokens
    with pytest.raises(ValueError, match="exceeds"):
        validate_batch_size(prompts, batch_size=500, model="deepseek-chat")


def test_integration_shared_body(spark, tmp_path):
    import csv
    import yaml

    from ondine_spark.integrations import (
        estimate_from_config,
        run_pipeline_from_config,
    )

    path = tmp_path / "r.csv"
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "review"])
        for i in range(12):
            w.writerow([f"k{i}", f"item {i} is great"])
    cfg = {
        "dataset": {"source": str(path), "format": "csv",
                    "input_columns": ["review"],
                    "output_columns": ["sentiment"], "id_column": "id"},
        "prompt": {"template": "Classify: {review}"},
        "llm": {"model": "mock"},
        "processing": {"checkpoint_dir": str(tmp_path / "ck"),
                       "session_id": "int-1"},
    }
    cfg_path = tmp_path / "p.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    est = estimate_from_config(str(cfg_path), sample=5)
    assert est["rows"] == 12

    out = run_pipeline_from_config(
        str(cfg_path), registry_path=str(tmp_path / "runs.db"),
        chunked=True, chunk_size=5,
    )
    assert out["rows"] == 12 and out["chunks"] == 3


def test_framework_factories_error_cleanly():
    from ondine_spark.integrations import (
        llm_transform_operator,
        mcp_server,
        prefect_task,
    )

    for factory, name in [
        (lambda: llm_transform_operator(task_id="x", config_path="p.yaml"),
         "airflow"),
        (prefect_task, "prefect"),
        (mcp_server, "mcp"),
    ]:
        with pytest.raises(ImportError):
            factory()
