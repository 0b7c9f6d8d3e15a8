"""Cross-run prompt-keyed LLM response memoization.

The reference exposes this as ``with_redis_cache`` / ``with_disk_cache``
(ondine/api/pipeline_builder.py:1362-1408): identical requests across runs
are answered from a cache instead of the provider ("identical requests =
$0 cost"). The reference delegates to litellm's request cache; the
Spark-first equivalent is a parquet memo table keyed by
``sha256(model, system, prompt)``:

- **read side** — before invocation, the to-invoke frame (per-row prompts
  or mega-batched prompts — the memo works at whichever granularity hits
  the provider) is left-anti/inner joined against the memo table. Hits
  take their response columns from the memo with ``cost = 0`` (no
  provider spend) and never reach the LLM stage; the api-call counter
  only ever sees misses.
- **write side** — after the run's results are materialized, the
  successful misses are appended to the memo dir (dedup-on-read, so
  concurrent writers at worst store a key twice).

This is distinct from the session-scoped resume cache
(ondine_spark/sources/cache.py): resume is keyed by row id within one
session; the memo is keyed by request CONTENT across all sessions, like
the reference's cache layer. At scale the memo join is a plain hash join
on a 64-char key — AQE broadcasts the memo side while it is small and
shuffles both sides once it is not; no driver materialization anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEMO_KEY = "_memo_key"
# columns the memo table stores alongside the key
_MEMO_COLS = ["response_text", "tokens_in", "tokens_out", "resp_model"]
_SEP = "\x1f"  # unit separator: model/system/prompt cannot collide


def memo_key_col(model: str, system: str | None, prompt_col: str = "prompt"):
    """sha256 over (model, system message, prompt) — the full request
    identity for a chat completion at temperature-0 semantics."""
    return F.sha2(
        F.concat_ws(
            _SEP, F.lit(model or ""), F.lit(system or ""), F.col(prompt_col)
        ),
        256,
    )


def read_memo(spark: SparkSession, path: str) -> DataFrame | None:
    """The memo table, one row per key (latest write wins is NOT needed —
    responses for the same key are interchangeable, so an arbitrary
    dedup is correct). None if the dir does not exist yet."""
    try:
        df = spark.read.parquet(path)
    except Exception:
        return None
    return df.select(MEMO_KEY, *_MEMO_COLS).dropDuplicates([MEMO_KEY])


def split_by_memo(
    keyed: DataFrame, memo: DataFrame | None
) -> tuple[DataFrame | None, DataFrame]:
    """(hits shaped like invoke_llm output, misses still to invoke).

    ``keyed`` must carry ``_memo_key``. Hits get the memoized response
    columns plus ``cost = 0`` / ``latency_ms = 0`` / ``error = null`` —
    a cache hit costs nothing and is instant, matching the reference's
    "$0 cost" semantics while keeping token counts informative."""
    if memo is None:
        return None, keyed
    hits = (
        keyed.join(memo, on=MEMO_KEY, how="inner")
        .withColumn("cost", F.lit(0).cast("decimal(38,18)"))
        .withColumn("latency_ms", F.lit(0.0))
        .withColumn("error", F.lit(None).cast("string"))
    )
    misses = keyed.join(memo.select(MEMO_KEY), on=MEMO_KEY, how="left_anti")
    return hits, misses


def write_memo(invoked: DataFrame, path: str) -> None:
    """Append the run's successful fresh responses to the memo dir.

    ``invoked`` must be the MATERIALIZED (persisted/checkpointed) invoke
    output still carrying ``_memo_key`` — writing from an unpinned plan
    would re-invoke the provider. Failed rows are never memoized (a
    retry next run should hit the provider again). Concurrent writers
    (coordinated multi-process chunk workers flush per chunk) go through
    the staged append — a plain append races on the shared _temporary
    commit dir; a key stored twice is fine, a lost flush is not."""
    from ondine_spark.sources.cache import append_parquet_atomic

    append_parquet_atomic(
        invoked.filter(
            F.col("error").isNull() & F.col("response_text").isNotNull()
        )
        .select(MEMO_KEY, *_MEMO_COLS)
        .dropDuplicates([MEMO_KEY]),
        path,
    )
