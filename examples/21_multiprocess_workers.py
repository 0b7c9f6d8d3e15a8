"""Multi-process chunk workers on one session: scale one enrichment run
across SEPARATE driver processes that share only a filesystem.

`.with_multiprocess_coordination()` makes concurrent
`execute_chunked` workers on the same (checkpoint_dir, session_id)
claim disjoint chunks — no row is ever invoked twice — and share a cost
ledger, so `.with_max_budget(...)` stops every worker within one chunk
of the GLOBAL spend. `.with_file_rate_limit(dir, rpm)` is the matching
rate primitive: one flock-guarded token bucket enforcing rpm across all
processes (use `.with_redis_rate_limit` when redis is available).

This example demonstrates the single-process shape (the contract is the
same; tests/test_multiprocess_coordination.py drives the real 2-process
race through subprocesses).
"""

from _session import session

from ondine_spark import PipelineBuilder, mock_client_factory
from ondine_spark.streaming.runner import chunked_result_frame, execute_chunked

spark = session()

rows = [
    {"id": f"r{i:03d}", "review": f"review {i}: the product is "
     + ("great" if i % 3 == 0 else "fine")}
    for i in range(40)
]

import tempfile

work = tempfile.mkdtemp(prefix="mp_example_")

pipeline = (
    PipelineBuilder(spark)
    .from_dataframe(spark.createDataFrame(rows), ["review"], id_column="id")
    .with_prompt("Classify the sentiment: {review}", ["sentiment"])
    .with_custom_llm_client(mock_client_factory())
    .with_checkpoint_dir(work, "shared-session")
    # every concurrent worker launched with this same builder config
    # cooperates through the checkpoint filesystem:
    .with_multiprocess_coordination()
    .with_file_rate_limit(f"{work}/ratelimit", rpm=50_000)
    .build()
)

summary = execute_chunked(pipeline, chunk_size=10)
print(f"this worker committed {len(summary.chunks)} chunks, "
      f"{summary.total_rows} rows")
# (a second process running this same script concurrently would have
# claimed some of those chunks instead — and the union below would be
# identical)

out = chunked_result_frame(pipeline, work, "shared-session")
print("total rows across all workers:", out.count())
out.select("id", "sentiment").show(5)
