"""Cross-run response memoization — identical requests = $0 cost
(reference: with_disk_cache/with_redis_cache, pipeline_builder.py;
20_prefix_caching.py is the provider-side analog, which the client layer
also surfaces via LLMResult.tokens_cached).

Run this script twice: the second run answers every prompt from the
parquet memo and issues ZERO provider calls.
"""

import os
import tempfile

from _session import session

from ondine_spark import PipelineBuilder, mock_client_factory

spark = session()
cache_dir = os.path.join(tempfile.gettempdir(), "ondine_example_cache")
df = spark.createDataFrame(
    [(f"r{i}", f"review {i} is great") for i in range(50)],
    "id string, review string",
)


def run():
    return (
        PipelineBuilder(spark)
        .from_dataframe(df, ["review"], id_column="id")
        .with_prompt("Classify: {review}", ["sentiment"])
        .with_custom_llm_client(mock_client_factory())
        .with_disk_cache(cache_dir)  # memo at <cache_dir>/llm_memo
        .build()
        .execute()
    )


first = run()
second = run()
print(f"first run:  {first.api_calls} provider calls, ${first.stats.total_cost}")
print(f"second run: {second.api_calls} provider calls, ${second.stats.total_cost}")
assert second.api_calls == 0
