"""PipelineBuilder — fluent construction of a PipelineSpec.

Mirrors the reference's builder surface
(reference: ondine/api/pipeline_builder.py:81-1760) with the subset of
methods that have engine meaning on Spark; config-only methods map 1:1 onto
spec fields.
"""

from __future__ import annotations

from decimal import Decimal
from typing import Any, Callable

from pyspark.sql import SparkSession

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


class PipelineBuilder:
    def __init__(self, spark: SparkSession | None = None):
        self._spec = PipelineSpec()
        self._spark = spark

    # ------------------------------------------------------------- sources
    def from_csv(self, path: str, input_columns: list[str], *, delimiter=",",
                 encoding="utf-8", id_column=None) -> "PipelineBuilder":
        d = self._spec.dataset
        d.source, d.format, d.input_columns = path, "csv", list(input_columns)
        d.delimiter, d.encoding, d.id_column = delimiter, encoding, id_column
        return self

    def from_parquet(self, path: str, input_columns: list[str], *, id_column=None):
        d = self._spec.dataset
        d.source, d.format, d.input_columns = path, "parquet", list(input_columns)
        d.id_column = id_column
        return self

    def from_json(self, path: str, input_columns: list[str], *, id_column=None):
        d = self._spec.dataset
        d.source, d.format, d.input_columns = path, "json", list(input_columns)
        d.id_column = id_column
        return self

    def from_excel(self, path: str, input_columns: list[str], *, sheet_name=0,
                   id_column=None):
        d = self._spec.dataset
        d.source, d.format, d.input_columns = path, "excel", list(input_columns)
        d.sheet_name, d.id_column = sheet_name, id_column
        return self

    def from_source(self, path: str, input_columns: list[str], *,
                    format: str | None = None, id_column=None):
        """Generic file source: format inferred from the suffix (csv/tsv/
        parquet/json/jsonl/orc/avro/xlsx) or passed explicitly."""
        d = self._spec.dataset
        d.source, d.format, d.input_columns = path, format, list(input_columns)
        d.id_column = id_column
        return self

    def from_dataframe(self, df: Any, input_columns: list[str] | None = None, *,
                       id_column=None):
        d = self._spec.dataset
        d.source = df
        d.input_columns = list(input_columns) if input_columns else []
        d.id_column = id_column
        return self

    def with_filters(self, filters: dict[str, Any]):
        self._spec.dataset.filters = dict(filters)
        return self

    # -------------------------------------------------------------- prompt
    def with_prompt(self, template: str, output_columns: list[str]):
        self._spec.prompt.template = template
        self._spec.dataset.output_columns = list(output_columns)
        if len(output_columns) > 1 and self._spec.prompt.response_format == ResponseFormat.RAW:
            # reference auto-selects the JSON parser for multi-column output
            # (ondine/api/quick.py)
            self._spec.prompt.response_format = ResponseFormat.JSON
        if not self._spec.dataset.input_columns:
            from ondine_spark.core.specs import template_placeholders

            self._spec.dataset.input_columns = template_placeholders(template)
        return self

    def with_system_prompt(self, system: str):
        self._spec.prompt.system_message = system
        return self

    def with_few_shot_examples(self, examples: list[dict]):
        self._spec.prompt.few_shot_examples = list(examples)
        return self

    def with_jinja2(self, enabled: bool = True):
        self._spec.prompt.use_jinja2 = enabled
        return self

    def with_batch_size(self, n: int):
        self._spec.prompt.batch_size = n
        return self

    def with_parser(self, response_format: str | ResponseFormat,
                    regex_patterns: dict[str, str] | None = None):
        self._spec.prompt.response_format = ResponseFormat(response_format)
        self._spec.prompt.regex_patterns = regex_patterns
        return self

    def with_structured_output(self, schema, mode_fallback: bool = False):
        """L3: validated structured output. ``schema`` is a StructType, DDL
        string ('label STRING, score DOUBLE'), or {field: ddl_type} dict —
        the Spark analog of the reference's Pydantic response models.

        ``mode_fallback=True`` additionally wraps the client in the
        tools → json → prompt provider-mode chain
        (``ondine_spark.llm.structured``; reference:
        unified_litellm_client.py:1055-1331) — each executor worker probes
        once and sticks to the first mode its provider accepts."""
        self._spec.prompt.response_format = ResponseFormat.SCHEMA
        self._spec.prompt.output_schema = schema
        self._spec.prompt.structured_mode_fallback = mode_fallback
        return self

    def with_custom_parser(self, fn):
        """U2: fn(responses_df, output_cols) -> DataFrame with the output
        columns appended."""
        self._spec.prompt.custom_parser = fn
        return self

    def with_stage(self, fn, position: str = "after_parse"):
        """U1: insert a user DataFrame->DataFrame transform at
        ``after_load`` | ``after_prompt`` | ``after_parse``."""
        if position not in ("after_load", "after_prompt", "after_parse"):
            raise ValueError(f"unknown stage position: {position}")
        self._spec.processing.stages.append((position, fn))
        return self

    def with_adaptive_concurrency(self, enabled: bool = True):
        """O5: Gradient2-style adaptive in-flight cap inside the LLM UDF."""
        self._spec.processing.adaptive_concurrency = enabled
        return self

    def with_observer(self, observer):
        """U6: object with on_event(PipelineEvent); driver-side run events."""
        self._spec.processing.observers.append(observer)
        return self

    def with_call_event_sampling(self, every_n: int = 100):
        """O14 depth: sampled PER-CALL events from inside the executors —
        every Nth provider call per partition (plus the first) emits a
        sanitized event (latency, tokens, error class, prompt digest; raw
        prompt text is scrubbed worker-side) to the observers as kind
        'llm_call'. The sample ships over a capped list accumulator, so
        the channel stays small at any corpus size."""
        if every_n < 1:
            raise ValueError("every_n must be >= 1")
        self._spec.processing.call_event_sample = int(every_n)
        return self

    # ----------------------------------------------------------------- llm
    def with_llm(self, model: str, *, input_cost_per_1k=None,
                 output_cost_per_1k=None, max_tokens=None, temperature=None):
        self._spec.llm.model = model
        if input_cost_per_1k is not None:
            self._spec.llm.input_cost_per_1k = Decimal(str(input_cost_per_1k))
        if output_cost_per_1k is not None:
            self._spec.llm.output_cost_per_1k = Decimal(str(output_cost_per_1k))
        if max_tokens is not None:
            self._spec.llm.max_tokens = int(max_tokens)
        if temperature is not None:
            self._spec.llm.temperature = float(temperature)
        return self

    def with_custom_llm_client(self, factory: Callable[[], Any]):
        """U3: user client factory, built once per executor worker."""
        self._spec.llm.client_factory = factory
        return self

    def with_router(
        self,
        deployments,
        strategy: str = "round-robin",
        failover: bool = True,
        seed: int = 0,
    ):
        """L8: load-balance calls across deployments (see llm/router.py for
        the strategy catalog). ``deployments`` — list of
        ``ondine_spark.llm.router.Deployment``."""
        from ondine_spark.llm.router import router_factory

        self._spec.llm.client_factory = router_factory(
            deployments, strategy, failover, seed
        )
        return self

    # ------------------------------------------------------------- control
    def with_concurrency(self, n: int):
        self._spec.processing.concurrency = n
        return self

    def with_max_retries(self, n: int):
        self._spec.processing.max_retries = n
        return self

    def with_rate_limit(self, rpm: int):
        self._spec.processing.rate_limit_rpm = rpm
        return self

    def with_redis_rate_limit(self, url: str, rpm: int):
        """O4: exact global limit via a shared Redis token bucket (falls
        back to the divided local bucket when redis is unavailable)."""
        self._spec.processing.redis_rate_limit_url = url
        self._spec.processing.rate_limit_rpm = rpm
        return self

    def with_file_rate_limit(self, dir_path: str, rpm: int):
        """O4 without redis: exact global limit across PROCESSES via a
        flock-guarded token-bucket state file on a shared filesystem
        (orchestration/coordination.FileTokenBucket). Redis, when also
        configured, takes precedence."""
        self._spec.processing.file_rate_limit_dir = dir_path
        self._spec.processing.rate_limit_rpm = rpm
        return self

    def with_multiprocess_coordination(self, enabled: bool = True,
                                       lease_ttl: float = 120.0):
        """Concurrent ``execute_chunked``/``iter_chunks`` workers on the
        SAME session (same checkpoint_dir + session_id, shared FS) claim
        disjoint chunks — no row is invoked twice — and share a cost
        ledger, so one worker's spend stops every worker's budget check
        within one chunk. Workers must start against the same committed
        cache state (e.g. launched together); a worker that starts after
        commits have landed computes a different chunk generation and
        falls back to plain resume semantics (correct, possibly
        overlapping work, never lost rows).

        ``lease_ttl``: a worker that dies mid-chunk stops heartbeating
        its claim; after this many seconds survivors STEAL the stale
        claim in their post-loop recovery pass and process the chunk
        themselves, so one surviving worker converges the session
        (claims still fresh at completion are reported in
        ``StreamSummary.unresolved_chunks``)."""
        self._spec.processing.coordinate = bool(enabled)
        self._spec.processing.coordinate_lease_ttl = float(lease_ttl)
        return self

    def with_error_policy(self, policy: str | ErrorPolicy, default_value=None):
        self._spec.processing.error_policy = ErrorPolicy(policy)
        self._spec.processing.default_value = default_value
        return self

    def with_max_budget(self, budget) -> "PipelineBuilder":
        self._spec.processing.max_budget = Decimal(str(budget))
        return self

    def with_checkpoint_dir(self, path: str, session_id: str | None = None):
        self._spec.processing.checkpoint_dir = path
        self._spec.processing.session_id = session_id or "default"
        return self

    def with_response_memo(self, path: str):
        """Cross-run prompt-keyed response memoization: identical requests
        (model + system + prompt) are answered from a parquet memo table
        instead of the provider — the reference's "identical requests =
        $0 cost" cache (with_disk_cache / with_redis_cache,
        pipeline_builder.py:1362-1408), re-expressed as a Spark join
        (ondine_spark/llm/memo.py)."""
        self._spec.processing.memo_path = path
        return self

    def with_disk_cache(self, cache_dir: str = ".cache"):
        """Reference-parity alias: memoize responses under
        ``<cache_dir>/llm_memo`` (reference pipeline_builder.py:1389)."""
        return self.with_response_memo(f"{cache_dir}/llm_memo")

    def with_redis_cache(self, redis_url: str = "redis://localhost:6379",
                         ttl: int = 3600):
        """Reference-parity litellm Redis request cache
        (pipeline_builder.py:1362-1388). Stored on the spec and applied by
        the litellm adapter when litellm is installed; with the built-in
        clients use with_response_memo/with_disk_cache instead (the
        parquet memo is the distributed-native path)."""
        self._spec.llm.cache_config = {
            "type": "redis", "host": redis_url, "ttl": ttl,
        }
        return self

    def with_preprocessing(self, max_length: int = 500):
        self._spec.processing.preprocess = True
        self._spec.processing.preprocess_max_length = max_length
        return self

    def with_auto_retry(self, max_retries: int = 3):
        self._spec.processing.auto_retry_failed = True
        self._spec.processing.max_auto_retries = max_retries
        return self

    # --------------------------------------------------- knowledge/context
    def with_knowledge_base(self, path: str, query_columns: list[str],
                            top_k: int = 3, min_score: float = 0.0,
                            method: str = "auto"):
        """R3: per-row KB retrieval; top-k chunk context prepended to
        prompts (reference: with_knowledge_base). ``method``:
        "auto" (default) routes to the banded-LSH candidate plan above
        ``knowledge.retrieval.LSH_AUTO_THRESHOLD`` chunks so a 1M-chunk
        corpus never hits the exact join's corpus-proportional posting
        volume; "exact"/"lsh" force a plan."""
        if method not in ("auto", "exact", "lsh"):
            raise ValueError(
                f"method must be auto|exact|lsh, got {method!r}"
            )
        c = self._spec.context
        c.kb_path, c.kb_query_columns = path, list(query_columns)
        c.kb_top_k, c.kb_min_score = top_k, min_score
        c.kb_method = method
        return self

    def with_evidence_store(self, path: str, query_columns: list[str] | None = None,
                            top_k: int = 3, min_score: float = 0.0,
                            store_claims: bool = True):
        """R4/V2: evidence priming from (and claim storage into) a
        ClaimStore (reference: with_context_store / with_evidence_priming)."""
        c = self._spec.context
        c.evidence_path = path
        c.evidence_query_columns = list(query_columns or [])
        c.evidence_top_k, c.evidence_min_score = top_k, min_score
        c.store_claims = store_claims
        return self

    def with_grounding(self, threshold: float = 0.3, on_fail: str = "flag",
                       source_column: str | None = None):
        """V1: TF-IDF grounding of outputs against retrieved context."""
        c = self._spec.context
        c.grounding_enabled = True
        c.grounding_threshold, c.grounding_on_fail = threshold, on_fail
        c.grounding_source_column = source_column
        return self

    def with_contradiction_detection(self, key_columns: list[str],
                                     value_columns: list[str],
                                     tolerance: float | None = None):
        """V3: flag rows whose group (by key) disagrees on values."""
        c = self._spec.context
        c.contradiction_key_columns = list(key_columns)
        c.contradiction_value_columns = list(value_columns)
        c.contradiction_tolerance = tolerance
        return self

    def with_confidence_scoring(self, mode: str = "default"):
        """V4: blended grounding/support confidence column."""
        c = self._spec.context
        c.confidence_enabled = True
        c.confidence_mode = mode
        return self

    # -------------------------------------------------------------- output
    def with_output(self, path: str, *, format=None, merge_strategy="replace",
                    mode="overwrite"):
        self._spec.output = OutputSpec(
            path=path, format=format,
            merge_strategy=MergeStrategy(merge_strategy), mode=mode,
        )
        return self

    def to_csv(self, path: str):
        return self.with_output(path, format="csv")

    def to_parquet(self, path: str):
        return self.with_output(path, format="parquet")

    def to_excel(self, path: str):
        """Reference: pipeline_builder output format "excel"
        (ondine/api/pipeline_builder.py:975-983)."""
        return self.with_output(path, format="excel")

    # --------------------------------------------------------------- build
    def build(self):
        from ondine_spark.plans.pipeline import Pipeline

        self._spec.validate()
        spec = self._spec
        if (spec.prompt.response_format == ResponseFormat.SCHEMA
                and spec.prompt.structured_mode_fallback):
            from ondine_spark.functions.parsing import normalize_schema
            from ondine_spark.llm.providers import client_factory_for
            from ondine_spark.llm.structured import structured_factory

            fields = normalize_schema(
                spec.prompt.output_schema
            ).fieldNames()
            base = client_factory_for(spec.llm)
            # wrap on shallow copies — mutating self._spec in place would
            # double-wrap the factory on a second build() and leak the
            # wrapper into the caller's spec object
            import copy

            spec = copy.copy(spec)
            spec.llm = copy.copy(spec.llm)
            spec.llm.client_factory = structured_factory(base, fields)
        return Pipeline(spec, self._spark)

    @property
    def spec(self) -> PipelineSpec:
        return self._spec
