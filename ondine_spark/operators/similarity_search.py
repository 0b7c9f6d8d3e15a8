"""Similarity search over embedding columns.

Brute-force cosine top-k (the exactness baseline; W3 top-k semantics of the
reference's KB search, ondine/knowledge/store.py:169-213) and an
LSH-bucketed approximate variant as the scale path. Used by the RAG
retrieval stage (R3/R4) and exposed directly for ANN workloads.

Scale notes: the brute-force path broadcasts the QUERY side (queries are
few; the corpus is the 100 TB side and is never shuffled to score). With
``prereduce=True`` an Arrow-batched per-batch top-k shrinks the ranking
shuffle from |corpus|·|queries| rows to ≤ k·|queries| per batch. The LSH
path buckets both sides on sign patterns so only matching buckets join.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ondine_spark.functions.similarity import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    prereduce: bool = False,
) -> DataFrame:
    """Exact cosine top-k per query. Output: query_id, vec_id (corpus id),
    cos_sim, rank (1-based, ties broken by corpus id ascending —
    deterministic).

    ``prereduce=False``: pure-JVM plan — score, then one window shuffle
    partitioned by query. The shuffle carries EVERY scored row
    (|corpus| × |queries|), which is the right plan while that product is
    modest.

    ``prereduce=True``: the scale path. Bounded top-k aggregation has no
    map-side-combinable built-in (collect_list partials carry the whole
    list), so an Arrow-batched ``mapInPandas`` keeps each batch's own
    per-query top-k BEFORE the shuffle — any row outside its batch's
    top-k is beaten by k rows in that same batch and cannot be in the
    global top-k, so the result is identical (asserted in
    tests/test_topk_prereduce.py). Shuffle volume drops from
    |corpus|·|queries| rows to ≤ k·|queries| per Arrow batch.
    """
    q = F.broadcast(
        queries.select(F.col(query_id).alias("_qid"), F.col(query_vec).alias("_qv"))
    )
    scored = corpus.select(
        F.col(corpus_id).alias("_cid"), F.col(corpus_vec).alias("_cv")
    ).crossJoin(q)
    sim = cosine(F.col("_cv"), F.col("_qv"))
    scored = scored.select("_qid", "_cid", sim.alias("cos_sim"))
    if prereduce:
        schema = scored.schema

        def batch_topk(batches):
            for pdf in batches:
                yield (
                    pdf.sort_values(
                        ["_qid", "cos_sim", "_cid"],
                        ascending=[True, False, True],
                    )
                    .groupby("_qid", sort=False)
                    .head(k)
                )

        scored = scored.mapInPandas(batch_topk, schema=schema)
    w = Window.partitionBy("_qid").orderBy(F.desc("cos_sim"), F.asc("_cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id),
            F.col("_cid").alias(corpus_id),
            "cos_sim",
            "rank",
        )
    )


def _hyperplanes(dim: int, num_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — no RNG state to
    broadcast, same planes on every executor and every run."""
    return [
        [
            int.from_bytes(hashlib.md5(f"{seed}:{i}:{d}".encode()).digest()[:4], "big")
            / 2**31
            - 1.0
            for d in range(dim)
        ]
        for i in range(num_planes)
    ]


def _bucket_expr(vec, planes):
    bits = [
        F.when(sum(vec[d] * p[d] for d in range(len(p))) >= 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for p in planes
    ]
    return F.concat(*bits)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    num_planes: int = 6,
    num_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: ``num_tables`` independent random-hyperplane
    tables; a query only scores corpus vectors sharing a bucket in at least
    one table. Recall grows with num_tables; cost is bounded by bucket
    sizes (expected |corpus| / 2^num_planes per bucket per table)."""
    dim = len(corpus.select(corpus_vec).first()[0])
    c = corpus.select(F.col(corpus_id).alias("_cid"), F.col(corpus_vec).alias("_cv"))
    q = queries.select(F.col(query_id).alias("_qid"), F.col(query_vec).alias("_qv"))

    c_buckets = []
    q_buckets = []
    for t in range(num_tables):
        planes = _hyperplanes(dim, num_planes, seed + 1000 * t)
        c_buckets.append(
            c.select("_cid", "_cv", F.lit(t).alias("_tbl"), _bucket_expr(F.col("_cv"), planes).alias("_bkt"))
        )
        q_buckets.append(
            q.select("_qid", "_qv", F.lit(t).alias("_tbl"), _bucket_expr(F.col("_qv"), planes).alias("_bkt"))
        )
    cb = c_buckets[0]
    for x in c_buckets[1:]:
        cb = cb.unionByName(x)
    qb = q_buckets[0]
    for x in q_buckets[1:]:
        qb = qb.unionByName(x)

    cand = (
        cb.join(F.broadcast(qb), on=["_tbl", "_bkt"])
        .select("_qid", "_qv", "_cid", "_cv")
        .dropDuplicates(["_qid", "_cid"])
    )
    scored = cand.select(
        "_qid", "_cid", cosine(F.col("_cv"), F.col("_qv")).alias("cos_sim")
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("cos_sim"), F.asc("_cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id),
            F.col("_cid").alias(corpus_id),
            "cos_sim",
            "rank",
        )
    )


# ---------------------------------------------------------------- IVF ANN

def train_ivf_centroids(
    corpus: DataFrame,
    nlist: int = 16,
    vec_col: str = "embedding",
    max_iter: int = 10,
    seed: int = 42,
):
    """Coarse quantizer for IVF: k-means over the corpus vectors
    (pyspark.ml KMeans — Lloyd's on DataFrames). Returns the local
    centroid list (nlist × dim floats — tiny, broadcastable)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(
        k=nlist, maxIter=max_iter, seed=seed, initMode="k-means||"
    ).fit(train)
    return [list(map(float, c)) for c in model.clusterCenters()]


def _nearest_centroids_expr(vec_col, centroids: list[list[float]], n: int):
    """array of the ``n`` nearest centroid ids (by cosine) — a pure JVM
    expression over the broadcast centroid literals."""
    sims = F.array(*[
        F.struct(
            cosine(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]))
            .alias("s"),
            F.lit(i).alias("c"),
        )
        for i, c in enumerate(centroids)
    ])
    top = F.slice(F.reverse(F.array_sort(sims)), 1, n)
    return F.transform(top, lambda x: x["c"])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: list[list[float]],
    nprobe: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are assigned to their nearest
    centroid (the inverted list); each query probes its ``nprobe`` nearest
    centroids and scores ONLY those lists — exact cosine within the probed
    cells, so with nprobe = nlist this equals brute force.

    Scale shape: the corpus is partitioned by centroid cell once
    (repartition on a small int key — co-locates each inverted list);
    queries explode to nprobe rows and hash-join on the cell id. No
    crossJoin against the full corpus."""
    assigned = corpus.select(
        F.col(corpus_id).alias("_cid"), F.col(corpus_vec).alias("_cv")
    ).withColumn(
        "_cell", _nearest_centroids_expr("_cv", centroids, 1)[0]
    ).repartition("_cell")
    probes = queries.select(
        F.col(query_id).alias("_qid"), F.col(query_vec).alias("_qv")
    ).withColumn(
        "_cell",
        F.explode(_nearest_centroids_expr("_qv", centroids, nprobe)),
    )
    scored = assigned.join(F.broadcast(probes), on="_cell").select(
        "_qid", "_cid", cosine(F.col("_cv"), F.col("_qv")).alias("cos_sim")
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("cos_sim"), F.asc("_cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id),
            F.col("_cid").alias(corpus_id),
            "cos_sim",
            "rank",
        )
    )
