"""Custom pipeline stages at named positions (reference:
16_custom_pipeline_stage.py).

A stage is any DataFrame -> DataFrame function; positions are
after_load, after_prompt, after_parse. Stages run inside the same
Catalyst plan — no materialization between them.
"""

from pyspark.sql import functions as F
from _session import session

from ondine_spark import PipelineBuilder, mock_client_factory


def drop_short_reviews(df):
    return df.filter(F.length("review") > 10)


def add_priority(df):
    return df.withColumn(
        "priority",
        F.when(F.col("sentiment") == "negative", "high").otherwise("normal"),
    )


spark = session()
df = spark.createDataFrame(
    [("a", "too short"), ("b", "this product is great and durable"),
     ("c", "terrible quality, broke immediately")],
    "id string, review string",
)
result = (
    PipelineBuilder(spark)
    .from_dataframe(df, ["review"], id_column="id")
    .with_stage(drop_short_reviews, position="after_load")
    .with_prompt("Classify: {review}", ["sentiment"])
    .with_stage(add_priority, position="after_parse")
    .with_custom_llm_client(mock_client_factory())
    .build()
    .execute()
)
result.data.show(truncate=45)
