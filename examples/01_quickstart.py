"""Quickstart — two ways to build pipelines (reference: 01_quickstart.py).

Option 1 is the one-call ``enrich()`` quick API; option 2 is the fluent
``PipelineBuilder``. Both run here with the deterministic mock client —
swap ``with_custom_llm_client``/``client_factory`` for
``with_llm("openai/gpt-4o-mini")`` (litellm) or any custom client to hit
a real provider.
"""

from _session import session

from ondine_spark import PipelineBuilder, enrich, mock_client_factory

spark = session()
products = spark.createDataFrame(
    [
        ("p1", "Apple iPhone 13 Pro Max 256GB — excellent camera"),
        ("p2", "Generic USB cable, terrible build quality"),
        ("p3", "Mid-range laptop, average performance"),
    ],
    "id string, description string",
)

print("=== Option 1: quick API ===")
res = enrich(
    products,
    "What is the sentiment of this product description? {description}",
    ["sentiment"],
    client_factory=mock_client_factory(),
    id_column="id",
)
res.data.show(truncate=60)
print(f"rows={res.stats.rows} cost=${res.stats.total_cost} calls={res.api_calls}")

print("=== Option 2: builder API ===")
pipeline = (
    PipelineBuilder(spark)
    .from_dataframe(products, ["description"], id_column="id")
    .with_prompt("Classify the sentiment: {description}", ["sentiment"])
    .with_custom_llm_client(mock_client_factory())
    .with_concurrency(4)
    .with_error_policy("retry")
    .build()
)
print("health:", pipeline.health_check())
result = pipeline.execute()
result.data.show(truncate=60)
