"""Cost estimation + budget enforcement (reference: 04_with_cost_control.py).

``estimate_cost`` prices a small sample before any real spend;
``with_max_budget`` stops the run when the cumulative cost would exceed
the cap (mid-run at chunk boundaries in chunked mode).
"""

from _session import session

from ondine_spark import PipelineBuilder, mock_client_factory

spark = session()
rows = [(f"r{i}", f"review number {i} is great") for i in range(200)]
df = spark.createDataFrame(rows, "id string, review string")

pipeline = (
    PipelineBuilder(spark)
    .from_dataframe(df, ["review"], id_column="id")
    .with_prompt("Classify the sentiment: {review}", ["sentiment"])
    .with_custom_llm_client(mock_client_factory())
    .with_max_budget("0.50")
    .build()
)

est = pipeline.estimate_cost(sample=10)
print(f"estimated total cost for {est['rows']} rows: ${est['estimated_cost']}")

res = pipeline.execute()
print(f"actual: ${res.stats.total_cost} over {res.api_calls} calls "
      f"(budget ok: {not res.errors})")
