"""Per-row knowledge retrieval (R3/R4): rows × chunks top-k context join.

Reference (ondine/stages/knowledge_retrieval_stage.py:65-96): for every
input row, query = concat(query_columns), search top_k chunks, prepend a
``_kb_context`` string to the prompt.

Spark-first: the reference brute-forces a store lookup per row. Here ALL
rows retrieve in one plan: explode each row's query into hashed-ngram
buckets → join the store's bucket postings (inverted index) → cosine per
(row, chunk) → window top-k per row → collect formatted context. No
per-row store calls, no crossJoin; the join key (bucket) keeps the
candidate set sparse. At extreme scale swap the exact join for
LSH (operators/similarity_search.lsh_topk) — same contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ondine_spark.knowledge.embedders import ngram_buckets
from ondine_spark.knowledge.store import KnowledgeStore
from ondine_spark.sources.readers import ROW_ID

KB_CONTEXT = "_kb_context"


def retrieve_topk(
    df: DataFrame,
    store: KnowledgeStore,
    query_cols: list[str],
    top_k: int = 3,
    min_score: float = 0.0,
) -> DataFrame:
    """(row_id, chunk_id, text, source, score, rank) — top-k chunks per row
    by hashed-ngram TF cosine."""
    q = df.select(
        F.col(ROW_ID),
        F.concat_ws(" ", *[F.col(c) for c in query_cols]).alias("_q"),
    )
    qb = (
        q.select(
            ROW_ID,
            F.explode(ngram_buckets(F.col("_q"), dim=store.ngram_dim)).alias(
                "bucket"
            ),
        )
        .groupBy(ROW_ID, "bucket")
        .agg(F.count(F.lit(1)).alias("qtf"))
    )
    qnorm = qb.groupBy(ROW_ID).agg(
        F.sqrt(F.sum(F.col("qtf") * F.col("qtf"))).alias("qnorm")
    )
    cnorm = (
        store.buckets()
        .groupBy("chunk_id")
        .agg(F.sqrt(F.sum(F.col("tf") * F.col("tf"))).alias("cnorm"))
    )
    dots = (
        qb.join(store.buckets(), on="bucket")
        .groupBy(ROW_ID, "chunk_id")
        .agg(F.sum(F.col("qtf") * F.col("tf")).alias("_dot"))
    )
    scored = (
        dots.join(qnorm, on=ROW_ID)
        .join(cnorm, on="chunk_id")
        .select(
            ROW_ID,
            "chunk_id",
            (F.col("_dot") / (F.col("qnorm") * F.col("cnorm"))).alias("score"),
        )
        .filter(F.col("score") >= min_score)
    )
    w = Window.partitionBy(ROW_ID).orderBy(F.desc("score"), "chunk_id")
    topk = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_k
    )
    return topk.join(store.chunks().select("chunk_id", "text", "source"), on="chunk_id")


def attach_context(
    df: DataFrame,
    store: KnowledgeStore,
    query_cols: list[str],
    top_k: int = 3,
    min_score: float = 0.0,
    context_col: str = KB_CONTEXT,
    with_attribution: bool = False,
    count_col: str = "_evidence_count",
) -> DataFrame:
    """Append ``_kb_context``: top-k chunk texts joined by newlines, rank
    order (reference format: knowledge_retrieval_stage.py:83; the evidence
    variant adds score+source attribution,
    evidence_retrieval_stage.py:81-99)."""
    topk = retrieve_topk(df, store, query_cols, top_k, min_score)
    line = (
        F.format_string(
            "[%.2f] (%s) %s", F.col("score"), F.col("source"), F.col("text")
        )
        if with_attribution
        else F.col("text")
    )
    ctx = (
        topk.withColumn("_line", line)
        .groupBy(ROW_ID)
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rank", "_line"))),
                    lambda x: x["_line"],
                ),
            ).alias(context_col),
            F.count(F.lit(1)).alias(count_col),
        )
    )
    out = df.join(ctx, on=ROW_ID, how="left")
    return out.fillna({context_col: ""}).withColumn(
        count_col, F.coalesce(F.col(count_col), F.lit(0))
    )
