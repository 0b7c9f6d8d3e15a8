"""Rerankers (R6) and query transformers (R5).

Reference: cross-encoder / Jina rerankers (ondine/knowledge/reranker.py:24-157)
and MultiQuery / HyDE / StepBack LLM query transforms
(ondine/knowledge/query.py:25-208).

The deterministic default reranker here is token-overlap scoring — pure JVM
column math over the candidate frame (already top-k·3 rows, tiny). Model
rerankers plug in behind the same callable protocol via import guard.
Query transforms are one driver-side LLM call per run (NOT per row) — the
variants are then broadcast into the search plan.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ondine_spark.functions.similarity import jaccard, tokens

Reranker = Callable[[str, DataFrame], DataFrame]


def overlap_reranker(weight: float = 0.5) -> Reranker:
    """score' = (1-w)·score + w·jaccard(query tokens, chunk tokens)."""

    def rerank(query: str, hits: DataFrame) -> DataFrame:
        j = jaccard(tokens(F.lit(query)), tokens(F.col("text")))
        return hits.withColumn(
            "score", (1 - weight) * F.col("score") + weight * j
        )

    return rerank


def cross_encoder_reranker(model_name: str) -> Reranker:  # pragma: no cover
    """Real cross-encoder behind an import guard (not installed here)."""
    try:
        from sentence_transformers import CrossEncoder  # noqa
    except ImportError as e:
        raise ImportError(
            "sentence-transformers is not installed; use overlap_reranker"
        ) from e
    model = CrossEncoder(model_name)

    def rerank(query: str, hits: DataFrame) -> DataFrame:
        rows = hits.collect()  # candidate set is top_k*3 — driver-side is fine
        scores = model.predict([(query, r["text"]) for r in rows])
        spark = hits.sparkSession
        scored = spark.createDataFrame(
            [(r["chunk_id"], float(s)) for r, s in zip(rows, scores)],
            ["chunk_id", "_ce"],
        )
        return hits.drop("score").join(scored, "chunk_id").withColumnRenamed(
            "_ce", "score"
        )

    return rerank


# ------------------------------------------------------- query transforms

MULTI_QUERY_PROMPT = (
    "Generate {n} different rephrasings of this search query, one per "
    "line, no numbering:\n{query}"
)
HYDE_PROMPT = (
    "Write a short hypothetical passage that would answer this query:\n{query}"
)
STEP_BACK_PROMPT = (
    "Rewrite this query as a more general question about the underlying "
    "topic:\n{query}"
)


def multi_query(client, query: str, n: int = 3) -> list[str]:
    res = client.complete(MULTI_QUERY_PROMPT.format(n=n, query=query))
    lines = [l.strip() for l in res.text.splitlines() if l.strip()]
    return lines[:n]


def hyde(client, query: str) -> list[str]:
    return [client.complete(HYDE_PROMPT.format(query=query)).text.strip()]


def step_back(client, query: str) -> list[str]:
    return [client.complete(STEP_BACK_PROMPT.format(query=query)).text.strip()]
