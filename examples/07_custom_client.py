"""Bring-your-own LLM client (reference: 13_custom_client.py).

Anything with ``complete(prompt, system) -> LLMResult`` works — wrap an
internal gateway, a local server, or a test double. The factory runs
ONCE PER EXECUTOR WORKER (one client per worker per run), so put
connection setup in the factory, not per call.
"""

from _session import session

from ondine_spark import PipelineBuilder
from ondine_spark.llm.client import LLMResult


def my_gateway_factory():
    class MyGatewayClient:
        def __init__(self):
            # e.g. open an HTTP session to your internal gateway here
            self.endpoint = "https://llm-gateway.internal/v1"

        def complete(self, prompt: str, system: str | None = None) -> LLMResult:
            # demo: answer locally; a real client would POST to
            # self.endpoint and map the response
            answer = "yes" if "spark" in prompt.lower() else "no"
            return LLMResult(
                text=answer, tokens_in=len(prompt.split()), tokens_out=1,
                model="my-gateway-model", cost="0.000001", latency_ms=2.0,
            )

    return MyGatewayClient()


spark = session()
df = spark.createDataFrame(
    [("q1", "Does this engine run on Spark?"), ("q2", "Is water dry?")],
    "id string, question string",
)
result = (
    PipelineBuilder(spark)
    .from_dataframe(df, ["question"], id_column="id")
    .with_prompt("{question}", ["answer"])
    .with_custom_llm_client(my_gateway_factory)
    .build()
    .execute()
)
result.data.show(truncate=50)
