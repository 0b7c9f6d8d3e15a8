"""Observability: events, PII scrubbing, metrics, progress (reference:
15_observability_logging.py, 16_..._opentelemetry.py, 17_..._langfuse.py,
18_observability_multi.py).

Every observer receives the same driver-side event stream
(pipeline_start / chunk_start / chunk_committed / pipeline_end / error).
Langfuse/OTel sinks exist too (import-guarded; injectable clients).
"""

from _session import session

from ondine_spark import PipelineBuilder, mock_client_factory
from ondine_spark.observability import (
    CollectingObserver,
    LoggingObserver,
    MetricsObserver,
    SanitizingObserver,
)

spark = session()
df = spark.createDataFrame(
    [("a", "contact me at jane@example.com, product is great"),
     ("b", "terrible, refund to card 4111 1111 1111 1111")],
    "id string, review string",
)

metrics = MetricsObserver()
collected = CollectingObserver()
result = (
    PipelineBuilder(spark)
    .from_dataframe(df, ["review"], id_column="id")
    .with_prompt("Classify: {review}", ["sentiment"])
    .with_custom_llm_client(mock_client_factory())
    .with_observer(LoggingObserver())
    .with_observer(metrics)
    # PII-scrub every payload string before the wrapped sink sees it
    .with_observer(SanitizingObserver(collected))
    .build()
    .execute()
)

print("--- prometheus exposition ---")
print(metrics.render())
print("--- sanitized events (no emails / card numbers) ---")
for ev in collected.events:
    print(ev.kind, ev.payload)
