"""Evidence / claim store (V2, U7): the cross-run memory backing
evidence priming, grounding support counts, and the contradiction graph.

Reference (crates/ondine-core/src/evidence/store.rs:58-212 + python
protocol ondine/context/protocol.py:13-114): SQLite tables ``claims``,
``provenance_links``, ``contradictions``, FTS5 + embedding indexes.

Spark-first: claims and contradiction edges are parquet tables under one
directory; retrieval reuses the knowledge layer's inverted bucket index by
treating claims as a chunk corpus (one implementation of search, two
stores — the reference duplicates FTS5 wiring for KB chunks and claims).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ondine_spark.functions.similarity import md5_long
from ondine_spark.knowledge.store import KnowledgeStore
from ondine_spark.sources.readers import ROW_ID


class ClaimStore:
    """Parquet-backed evidence store: ``{path}/claims``,
    ``{path}/contradictions``, plus a KnowledgeStore index over claim text
    at ``{path}/index``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._kb = KnowledgeStore(spark, os.path.join(path, "index"))

    # -------------------------------------------------------------- write

    def store_claims(
        self,
        df: DataFrame,
        input_cols: list[str],
        output_col: str,
        session_id: str = "default",
    ) -> DataFrame:
        """V2: persist every (input → output) pair as a claim and refresh
        the retrieval index. claim_id is content-derived (md5) so re-runs
        upsert rather than duplicate."""
        claims = df.select(
            F.concat_ws(" ", *[F.col(c) for c in input_cols]).alias("input_text"),
            F.col(output_col).cast("string").alias("output_text"),
            F.lit(session_id).alias("session_id"),
            F.col(ROW_ID).alias("source_row"),
        ).withColumn(
            "claim_id",
            md5_long(F.concat_ws("\x1f", "input_text", "output_text")),
        ).dropDuplicates(["claim_id"])
        claims.write.mode("append").parquet(os.path.join(self.path, "claims"))
        all_claims = self.claims()
        self._kb.ingest(
            all_claims.withColumn(
                "claim_text",
                F.concat_ws(": ", "input_text", "output_text"),
            ),
            id_col="claim_id",
            text_col="claim_text",
            max_tokens=10_000,  # one chunk per claim
            mode="overwrite",
        )
        return claims

    def store_contradiction_edges(self, edges: DataFrame) -> None:
        edges.write.mode("append").parquet(
            os.path.join(self.path, "contradictions")
        )

    # --------------------------------------------------------------- read

    def claims(self) -> DataFrame:
        return self.spark.read.parquet(
            os.path.join(self.path, "claims")
        ).dropDuplicates(["claim_id"])

    def contradictions(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "contradictions"))

    def retrieve(self, query: str, top_k: int = 5, min_score: float = 0.0):
        """R4 search path: hybrid retrieval over claim text."""
        hits = self._kb.search(query, top_k=top_k, mode="hybrid")
        return hits.filter(F.col("score") >= min_score)

    def attach_evidence(
        self, df: DataFrame, query_cols: list[str], top_k: int = 3,
        min_score: float = 0.0,
    ) -> DataFrame:
        """Per-row evidence priming (`_evidence_context`,
        `_evidence_count`) — same retrieval plan as the KB stage."""
        from ondine_spark.knowledge.retrieval import attach_context

        return attach_context(
            df, self._kb, query_cols, top_k=top_k, min_score=min_score,
            context_col="_evidence_context", with_attribution=True,
        )

    def support_counts(self, df: DataFrame, output_col: str) -> DataFrame:
        """Rows' support = number of stored claims with identical output
        text (the reference's support component feeding V4)."""
        counts = self.claims().groupBy(
            F.col("output_text").alias("_ot")
        ).agg(F.count(F.lit(1)).alias("_support"))
        return (
            df.join(
                counts,
                df[output_col].cast("string") == counts["_ot"],
                "left",
            )
            .drop("_ot")
            .fillna({"_support": 0})
        )
