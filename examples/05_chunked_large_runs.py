"""Chunked execution with durable per-chunk commits (reference:
08_streaming_large_files.py + 07_async_execution.py).

Each chunk is committed to the parquet response cache before the next
starts; kill the process at ANY point and a rerun with the same
checkpoint dir + session id resumes with zero re-invocation of
committed rows (see tests/test_resume_crash.py for the kill -9 drive).
"""

import tempfile

from _session import session

from ondine_spark import PipelineBuilder, mock_client_factory
from ondine_spark.streaming.runner import chunked_result_frame, iter_chunks

spark = session()
rows = [(f"r{i:03d}", f"review {i} is great") for i in range(100)]
df = spark.createDataFrame(rows, "id string, review string")

ckpt = tempfile.mkdtemp(prefix="ondine_ckpt_")
pipeline = (
    PipelineBuilder(spark)
    .from_dataframe(df, ["review"], id_column="id")
    .with_prompt("Classify: {review}", ["sentiment"])
    .with_custom_llm_client(mock_client_factory())
    .with_checkpoint_dir(ckpt, "demo-session")
    .build()
)

for chunk in iter_chunks(pipeline, chunk_size=25):
    print(f"chunk {chunk.chunk_id}: {chunk.rows} rows committed, "
          f"cumulative cost ${chunk.cumulative_cost}")

final = chunked_result_frame(pipeline, ckpt, "demo-session")
print(f"assembled {final.count()} rows from the durable cache")
