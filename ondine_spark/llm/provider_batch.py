"""Provider Batch API execution mode (L5): submit / poll / collect.

Reference (ondine/orchestration/backends/provider_batch.py:85-527 and the
pipeline split ondine/api/pipeline.py:1881-1960): the pipeline's front half
(load → format → aggregate) compiles prompts to a JSONL batch file, uploads
it to the provider's Batch endpoint (24 h SLA, ~50% price), persists the
provider_job_id on a RunHandle; a later process polls, downloads results,
and runs the back half (disaggregate → parse → merge → write).

Spark-first split:
- FRONT half is a DataFrame plan: the prompts frame (with row ids and
  batch ids) is written as JSONL with one ``custom_id`` per request —
  ``df.write.json`` shape, driver-side upload.
- The provider boundary is a small ``BatchProvider`` protocol
  (submit_file/poll/download) — a deterministic ``LocalMockBatchProvider``
  ships for tests; real OpenAI/Anthropic providers are import-guarded.
- BACK half joins the downloaded responses back on ``custom_id`` = row_id
  and reuses the same parse/merge plan as live mode.
- The RunRegistry carries the handoff across processes (submit and collect
  can be different drivers).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ondine_spark.plans.pipeline import RESPONSE_META, Pipeline
from ondine_spark.sources.readers import ROW_ID


class BatchProvider(Protocol):
    def submit_file(self, jsonl_path: str, model: str) -> str:
        """Upload + create the batch job → provider_job_id."""

    def poll(self, job_id: str) -> str:
        """→ one of: validating | in_progress | completed | failed |
        expired | cancelled."""

    def download(self, job_id: str) -> str:
        """→ local path of the results JSONL (one object per custom_id)."""


class LocalMockBatchProvider:
    """Deterministic in-filesystem provider: 'uploads' into a spool dir,
    completes after ``latency_polls`` polls, answers with the same
    deterministic rules as DeterministicMockClient (so live and batch
    modes agree bit-for-bit)."""

    def __init__(self, spool_dir: str, latency_polls: int = 1):
        self.spool = spool_dir
        self.latency_polls = latency_polls
        os.makedirs(spool_dir, exist_ok=True)

    def submit_file(self, jsonl_path: str, model: str) -> str:
        job_id = "mockbatch-" + uuid.uuid4().hex[:10]
        job_dir = os.path.join(self.spool, job_id)
        os.makedirs(job_dir)
        os.rename(jsonl_path, os.path.join(job_dir, "input.jsonl"))
        with open(os.path.join(job_dir, "meta.json"), "w") as f:
            json.dump({"polls": 0, "model": model}, f)
        return job_id

    def _meta(self, job_id: str) -> tuple[str, dict]:
        job_dir = os.path.join(self.spool, job_id)
        with open(os.path.join(job_dir, "meta.json")) as f:
            return job_dir, json.load(f)

    def poll(self, job_id: str) -> str:
        job_dir, meta = self._meta(job_id)
        meta["polls"] += 1
        with open(os.path.join(job_dir, "meta.json"), "w") as f:
            json.dump(meta, f)
        if meta["polls"] <= self.latency_polls:
            return "in_progress"
        out = os.path.join(job_dir, "output.jsonl")
        if not os.path.exists(out):
            from ondine_spark.llm.client import DeterministicMockClient

            client = DeterministicMockClient()
            with open(os.path.join(job_dir, "input.jsonl")) as fin, \
                    open(out, "w") as fout:
                for line in fin:
                    req = json.loads(line)
                    prompt = req["body"]["messages"][-1]["content"]
                    r = client.complete(prompt)
                    fout.write(json.dumps({
                        "custom_id": req["custom_id"],
                        "response": {"body": {
                            "choices": [{"message": {"content": r.text}}],
                            "usage": {"prompt_tokens": r.tokens_in,
                                      "completion_tokens": r.tokens_out},
                            "model": r.model,
                        }},
                        "error": None,
                    }) + "\n")
        return "completed"

    def download(self, job_id: str) -> str:
        job_dir, _ = self._meta(job_id)
        return os.path.join(job_dir, "output.jsonl")


@dataclass
class RunHandle:
    """Submit-side artifact; everything collect needs (reference:
    provider_batch.py RunHandle + run_registry handoff)."""

    run_id: str
    provider_job_id: str
    handle_dir: str

    def save(self) -> str:
        path = os.path.join(self.handle_dir, f"{self.run_id}.handle.json")
        with open(path, "w") as f:
            json.dump({"run_id": self.run_id,
                       "provider_job_id": self.provider_job_id}, f)
        return path

    @classmethod
    def load(cls, handle_dir: str, run_id: str) -> "RunHandle":
        with open(os.path.join(handle_dir, f"{run_id}.handle.json")) as f:
            d = json.load(f)
        return cls(run_id=d["run_id"], provider_job_id=d["provider_job_id"],
                   handle_dir=handle_dir)


def compile_requests(pipeline: Pipeline, jsonl_path: str) -> int:
    """FRONT half: prompts frame → provider JSONL (OpenAI Batch request
    shape, custom_id = row_id). Returns request count.

    The prompts frame reuses the live plan up to (and including) mega-batch
    aggregation, so batch mode gets the same 15× call reduction."""
    spec = pipeline.spec
    df = pipeline.input_frame()
    from ondine_spark.functions.templates import prompt_column

    df = df.withColumn(
        "prompt",
        prompt_column(spec.prompt.template, spec.prompt.use_jinja2,
                      spec.prompt.few_shot_examples),
    )
    if spec.prompt.batch_size > 1:
        from ondine_spark.operators.batching import aggregate_batches

        df = aggregate_batches(df, spec.prompt.batch_size)
        id_col = F.concat(F.lit("batch-"), F.col("_batch_id").cast("string"))
    else:
        id_col = F.concat(F.lit("row-"), F.col(ROW_ID).cast("string"))
    msgs = []
    if spec.prompt.system_message:
        msgs.append(F.struct(F.lit("system").alias("role"),
                             F.lit(spec.prompt.system_message).alias("content")))
    msgs.append(F.struct(F.lit("user").alias("role"),
                         F.col("prompt").alias("content")))
    requests = df.select(
        F.to_json(F.struct(
            id_col.alias("custom_id"),
            F.lit("POST").alias("method"),
            F.lit("/v1/chat/completions").alias("url"),
            F.struct(
                F.lit(spec.llm.model).alias("model"),
                F.array(*msgs).alias("messages"),
            ).alias("body"),
        )).alias("line")
    )
    rows = requests.collect()  # driver-side: the upload is a driver action
    with open(jsonl_path, "w") as f:
        for r in rows:
            f.write(r["line"] + "\n")
    return len(rows)


def submit(
    pipeline: Pipeline,
    provider: BatchProvider,
    work_dir: str,
    run_id: str | None = None,
    registry=None,
) -> RunHandle:
    os.makedirs(work_dir, exist_ok=True)
    run_id = run_id or uuid.uuid4().hex[:12]
    jsonl = os.path.join(work_dir, f"{run_id}.requests.jsonl")
    n = compile_requests(pipeline, jsonl)
    job_id = provider.submit_file(jsonl, pipeline.spec.llm.model)
    handle = RunHandle(run_id=run_id, provider_job_id=job_id,
                       handle_dir=work_dir)
    handle.save()
    if registry is not None:
        from ondine_spark.orchestration.registry import RunState

        try:
            registry.get(run_id)
        except KeyError:
            registry.create(run_id, requests=n)
        registry.transition(run_id, RunState.RUNNING, requests=n)
        registry.set_provider_job(run_id, job_id)
    return handle


def collect(
    pipeline: Pipeline,
    provider: BatchProvider,
    handle: RunHandle,
    poll_interval_s: float = 0.0,
    max_polls: int = 10_000,
    registry=None,
) -> DataFrame:
    """BACK half: poll → download → join on custom_id → disaggregate/parse
    → merged result frame (same columns as live-mode result_frame)."""
    spec = pipeline.spec
    status = "unknown"
    for _ in range(max_polls):
        status = provider.poll(handle.provider_job_id)
        if status in ("completed", "failed", "expired", "cancelled"):
            break
        if poll_interval_s:
            time.sleep(poll_interval_s)
    if status != "completed":
        raise RuntimeError(
            f"batch job {handle.provider_job_id} ended as {status!r}"
        )
    out_path = provider.download(handle.provider_job_id)
    spark = pipeline.spark
    raw = spark.read.json(out_path)
    responses = raw.select(
        F.col("custom_id"),
        F.col("response.body.choices")[0]["message"]["content"]
          .alias("response_text"),
        F.col("response.body.usage.prompt_tokens").cast("int")
          .alias("tokens_in"),
        F.col("response.body.usage.completion_tokens").cast("int")
          .alias("tokens_out"),
        F.col("response.body.model").alias("resp_model"),
        F.col("error").cast("string").alias("error"),
    ).withColumn(
        # batch-API pricing: published 50% discount on list price
        "cost",
        ((F.col("tokens_in") * F.lit(spec.llm.input_cost_per_1k)
          + F.col("tokens_out") * F.lit(spec.llm.output_cost_per_1k))
         / 2000).cast("decimal(38,18)"),
    ).withColumn("latency_ms", F.lit(0.0))

    df = pipeline.input_frame()
    if spec.prompt.batch_size > 1:
        from ondine_spark.operators.batching import (
            BATCH_ID,
            aggregate_batches,
            disaggregate_batches,
        )
        from ondine_spark.functions.templates import prompt_column

        prompts = df.withColumn(
            "prompt",
            prompt_column(spec.prompt.template, spec.prompt.use_jinja2,
                          spec.prompt.few_shot_examples),
        )
        batches = aggregate_batches(prompts, spec.prompt.batch_size)
        # custom_id = "batch-<n>": strip the 6-char prefix (never split on
        # "-" — row ids are strings that may contain dashes)
        keyed = responses.withColumn(
            BATCH_ID, F.substring(F.col("custom_id"), 7, 1 << 20).cast("long")
        ).drop("custom_id")
        invoked = batches.join(keyed, on=BATCH_ID, how="left")
        per_row = disaggregate_batches(invoked)
        joined = df.join(per_row, on=ROW_ID, how="left")
    else:
        keyed = responses.withColumn(
            ROW_ID, F.substring(F.col("custom_id"), 5, 1 << 20)
        ).drop("custom_id")
        joined = df.join(keyed, on=ROW_ID, how="left")

    from ondine_spark.functions.parsing import apply_parser

    parsed = apply_parser(
        joined, spec.dataset.output_columns,
        spec.prompt.response_format.value
        if hasattr(spec.prompt.response_format, "value")
        else spec.prompt.response_format,
        spec.prompt.regex_patterns,
    )
    if registry is not None:
        from ondine_spark.orchestration.registry import RunState

        registry.transition(handle.run_id, RunState.SUCCEEDED)
    return parsed
