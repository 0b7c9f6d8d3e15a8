"""N:1 mega-batching — 25x fewer API calls (reference:
21_multi_row_batching.py).

``with_batch_size(25)`` groups 25 rows into one JSON-array mega-prompt;
the response is disaggregated back to rows with id-based matching and
partial-failure padding. API calls = ceil(N / batch_size) EXACTLY.
"""

import math

from _session import session

from ondine_spark import PipelineBuilder, mock_client_factory

spark = session()
N = 200
df = spark.createDataFrame(
    [(f"r{i:03d}", f"review {i} is great") for i in range(N)],
    "id string, review string",
)


def run(batch_size):
    b = (
        PipelineBuilder(spark)
        .from_dataframe(df, ["review"], id_column="id")
        .with_prompt("Classify: {review}", ["sentiment"])
        .with_custom_llm_client(mock_client_factory())
    )
    if batch_size > 1:
        b = b.with_batch_size(batch_size)
    return b.build().execute()


naive = run(1)
batched = run(25)
print(f"naive:   {naive.api_calls} calls for {N} rows")
print(f"batched: {batched.api_calls} calls for {N} rows "
      f"(= ceil({N}/25) = {math.ceil(N / 25)})")
assert batched.api_calls == math.ceil(N / 25)
assert naive.quality.valid_rows == batched.quality.valid_rows == N
