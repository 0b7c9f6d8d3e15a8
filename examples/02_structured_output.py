"""Structured output with schema validation (reference: 03_structured_output.py).

The schema can be a DDL string or a {column: type} dict; responses are
parsed, validated, and coerced JVM-side. ``mode_fallback=True`` also
wraps the client in the tools → json → prompt provider-mode chain.
"""

from _session import session

from ondine_spark import PipelineBuilder
from ondine_spark.llm.client import LLMResult


def json_factory():
    class JsonClient:
        def complete(self, prompt, system=None):
            label = "positive" if "great" in prompt else "negative"
            return LLMResult(
                text=f'{{"label": "{label}", "score": 0.9, "reason": "demo"}}',
                tokens_in=10, tokens_out=12, model="mock-json",
                cost="0.00001", latency_ms=1.0,
            )

    return JsonClient()


spark = session()
df = spark.createDataFrame(
    [("r1", "this product is great"), ("r2", "awful, do not buy")],
    "id string, review string",
)

result = (
    PipelineBuilder(spark)
    .from_dataframe(df, ["review"], id_column="id")
    .with_prompt("Classify: {review}", ["label", "score", "reason"])
    .with_structured_output("label STRING, score DOUBLE, reason STRING")
    .with_custom_llm_client(json_factory)
    .build()
    .execute()
)
result.data.show(truncate=40)
result.data.printSchema()  # score is a real DOUBLE, not a string
