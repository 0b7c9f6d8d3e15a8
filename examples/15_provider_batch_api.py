"""Provider Batch API mode — ~50% price for async workloads (reference:
provider_batch backends; OpenAI + Anthropic supported, demoed with the
local mock provider so it runs offline).

submit() compiles executor-written JSONL shards (the driver never
materializes the request set) and returns a RunHandle; a LATER process —
possibly days later — loads the handle and collect()s results.
"""

import tempfile

from _session import session

from ondine_spark import PipelineBuilder, mock_client_factory
from ondine_spark.llm.provider_batch import (
    LocalMockBatchProvider,
    RunHandle,
    collect,
    submit,
)

spark = session()
df = spark.createDataFrame(
    [(f"r{i}", f"review {i} is great") for i in range(30)],
    "id string, review string",
)
pipeline = (
    PipelineBuilder(spark)
    .from_dataframe(df, ["review"], id_column="id")
    .with_prompt("Classify: {review}", ["sentiment"])
    .with_batch_size(10)  # mega-batching composes with Batch API mode
    .with_custom_llm_client(mock_client_factory())
    .build()
)

work = tempfile.mkdtemp(prefix="ondine_batch_")
provider = LocalMockBatchProvider(f"{work}/spool")

handle = submit(pipeline, provider, work, run_id="demo-run")
print(f"submitted: run_id={handle.run_id} provider_jobs={handle.provider_job_ids}")

# ... a separate process, later:
handle2 = RunHandle.load(work, "demo-run")
result = collect(pipeline, provider, handle2)
print(f"collected {result.count()} rows")
result.select("id", "sentiment").show(5)
