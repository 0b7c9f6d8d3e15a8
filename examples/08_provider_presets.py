"""Provider registry + presets (reference: 14_provider_presets.py,
15_custom_llm_provider.py).

``@provider("prefix")`` registers a factory keyed by model prefix;
``with_llm("prefix/model")`` resolves through the registry, falling back
to litellm (when installed) for anything unrecognized. Preset pricing is
attached automatically for known models.
"""

from _session import session

from ondine_spark import PipelineBuilder
from ondine_spark.llm.client import LLMResult
from ondine_spark.llm.providers import list_providers, provider


@provider("acme")
def acme_client(model: str = "acme/base"):
    class AcmeClient:
        def complete(self, prompt, system=None):
            return LLMResult(
                text="positive" if "great" in prompt else "neutral",
                tokens_in=5, tokens_out=1, model=model,
                cost="0.000002", latency_ms=1.0,
            )

    return AcmeClient()


print("known models/presets:", [p["model"] for p in list_providers()][:5], "...")

spark = session()
df = spark.createDataFrame(
    [("a", "this is great"), ("b", "this is fine")], "id string, txt string"
)
result = (
    PipelineBuilder(spark)
    .from_dataframe(df, ["txt"], id_column="id")
    .with_prompt("Classify: {txt}", ["sentiment"])
    .with_llm("acme/base")  # resolved via the registry
    .build()
    .execute()
)
result.data.show()
