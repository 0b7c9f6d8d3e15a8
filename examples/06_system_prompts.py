"""System prompts + few-shot examples + Jinja2 templates (reference:
09_system_prompts.py).
"""

from _session import session

from ondine_spark import PipelineBuilder, mock_client_factory

spark = session()
df = spark.createDataFrame(
    [("t1", "the service was excellent"), ("t2", "bad support experience")],
    "id string, feedback string",
)

result = (
    PipelineBuilder(spark)
    .from_dataframe(df, ["feedback"], id_column="id")
    .with_system_prompt("You are a terse sentiment classifier.")
    .with_few_shot_examples([
        {"input": "I love it", "output": "positive"},
        {"input": "I hate it", "output": "negative"},
    ])
    # Jinja2 autodetects {{ }}; {% if %} blocks work too
    .with_prompt(
        "Classify{% if feedback %}: {{ feedback }}{% endif %}", ["sentiment"]
    )
    .with_jinja2()
    .with_custom_llm_client(mock_client_factory())
    .build()
    .execute()
)
result.data.show(truncate=50)
