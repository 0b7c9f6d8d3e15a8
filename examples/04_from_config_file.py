"""Config-file pipelines with ${ENV} expansion (reference: 06_from_config_file.py).

The same YAML drives the CLI: ``python -m ondine_spark process cfg.yaml``.
"""

import csv
import os
import tempfile

import yaml
from _session import session

from ondine_spark.config.loader import load_config
from ondine_spark.plans.pipeline import Pipeline

spark = session()
work = tempfile.mkdtemp(prefix="ondine_example_")
csv_path = os.path.join(work, "reviews.csv")
with open(csv_path, "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["id", "review"])
    for i in range(10):
        w.writerow([f"r{i}", f"review {i} is great"])

os.environ["DEMO_MODEL"] = "mock"
cfg = {
    "dataset": {
        "source": csv_path, "format": "csv",
        "input_columns": ["review"], "output_columns": ["sentiment"],
        "id_column": "id",
    },
    "prompt": {"template": "Classify: {review}"},
    "llm": {"model": "${DEMO_MODEL}"},  # expanded from the environment
    "processing": {"concurrency": 4},
}
cfg_path = os.path.join(work, "pipeline.yaml")
with open(cfg_path, "w") as f:
    yaml.safe_dump(cfg, f)

spec = load_config(cfg_path)
res = Pipeline(spec, spark).execute()
print(f"model={spec.llm.model} rows={res.stats.rows} "
      f"valid={res.quality.valid_rows}")
