"""ondine_spark — a PySpark-native batch LLM data-processing engine.

Brand-new implementation of the capabilities of ptimizeroracle/ondine
(structural analysis in SURVEY.md), re-expressed Spark-first: DataFrames +
Catalyst for the data plane, Arrow-batched UDFs for LLM calls, parquet
tables for the durable response cache, Structured Streaming for chunked
execution.
"""

from ondine_spark.api import enrich
from ondine_spark.core.specs import (
    DatasetSpec,
    ErrorPolicy,
    LLMSpec,
    MergeStrategy,
    OutputSpec,
    PipelineSpec,
    ProcessingSpec,
    PromptSpec,
    ResponseFormat,
)
from ondine_spark.llm.client import (
    DeterministicMockClient,
    FatalLLMError,
    LLMResult,
    TransientLLMError,
    mock_client_factory,
)
from ondine_spark.plans.builder import PipelineBuilder
from ondine_spark.plans.composer import PipelineComposer
from ondine_spark.plans.pipeline import ExecutionResult, Pipeline


def __getattr__(name):
    # lazy heavy layers: keep `import ondine_spark` light
    if name == "KnowledgeStore":
        from ondine_spark.knowledge.store import KnowledgeStore

        return KnowledgeStore
    if name == "ClaimStore":
        from ondine_spark.context.store import ClaimStore

        return ClaimStore
    if name in ("Deployment", "RouterClient", "deployment_distribution"):
        from ondine_spark.llm import router

        return getattr(router, name)
    if name in ("StructuredOutputClient", "StructuredModeError",
                "structured_factory"):
        from ondine_spark.llm import structured

        return getattr(structured, name)
    if name in ("OpenAIBatchProvider", "AnthropicBatchProvider",
                "LocalMockBatchProvider", "RunHandle"):
        from ondine_spark.llm import provider_batch

        return getattr(provider_batch, name)
    if name in ("LangfuseObserver", "OpenTelemetryObserver",
                "LoggingObserver", "CollectingObserver", "ProgressObserver"):
        from ondine_spark import observability

        return getattr(observability, name)
    if name == "ZepClaimStore":
        from ondine_spark.context.zep_store import ZepClaimStore

        return ZepClaimStore
    raise AttributeError(name)


__all__ = [
    "enrich",
    "PipelineBuilder",
    "PipelineComposer",
    "Pipeline",
    "ExecutionResult",
    "KnowledgeStore",
    "ClaimStore",
    "PipelineSpec",
    "DatasetSpec",
    "PromptSpec",
    "LLMSpec",
    "ProcessingSpec",
    "OutputSpec",
    "ErrorPolicy",
    "MergeStrategy",
    "ResponseFormat",
    "DeterministicMockClient",
    "mock_client_factory",
    "Deployment",
    "RouterClient",
    "deployment_distribution",
    "LLMResult",
    "TransientLLMError",
    "FatalLLMError",
    "StructuredOutputClient",
    "StructuredModeError",
    "structured_factory",
    "OpenAIBatchProvider",
    "AnthropicBatchProvider",
    "LocalMockBatchProvider",
    "RunHandle",
    "LangfuseObserver",
    "OpenTelemetryObserver",
    "LoggingObserver",
    "CollectingObserver",
    "ProgressObserver",
    "ZepClaimStore",
]

__version__ = "0.1.0"
