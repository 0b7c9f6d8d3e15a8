"""Non-finite embedding hygiene: NaN/Inf components must never train,
seed, match, rank, or render.

Spark orders NaN GREATER than every number, so an unfiltered NaN cosine
ranks FIRST in top-k windows and passes ``>= threshold`` pair filters;
one non-finite row poisons a k-means mean; a non-finite centroid renders
an invalid SQL literal (`infD`). `finite_vector` filters at every
ingestion point — these tests pin that with a corpus mixing NaN, Inf,
partial-NaN, and clean vectors.
"""

from __future__ import annotations

import math

import pytest


NAN, INF = float("nan"), float("inf")

ROWS = [
    (0, [NAN, NAN]),
    (1, [1.0, 0.0]),
    (2, [1.0, 0.0]),
    (3, [0.0, 1.0]),
    (4, [INF, 0.0]),
    (5, [1.0, NAN]),  # partially non-finite is still non-finite
]


@pytest.fixture()
def emb(spark):
    return spark.createDataFrame(ROWS, "vec_id int, embedding array<double>")


@pytest.fixture()
def q(spark):
    return spark.createDataFrame(
        [(9, [1.0, 0.0])], "query_id int, query_vec array<double>"
    )


def test_neardup_kernel_excludes_nonfinite(emb):
    from ondine_spark.operators.dedup import embedding_neardup_pairs

    pairs = embedding_neardup_pairs(
        emb, "vec_id", "embedding", threshold=0.9
    ).collect()
    assert [(r.a, r.b) for r in pairs] == [(1, 2)]


def test_semantic_pairs_exclude_nonfinite(emb):
    from ondine_spark.operators.dedup import seed_centroids, semantic_dup_pairs

    cents = seed_centroids(emb, "vec_id", "embedding", k=2)
    assert all(math.isfinite(x) for c in cents for x in c)
    pairs = semantic_dup_pairs(
        emb, "vec_id", "embedding", cents, threshold=0.9
    ).collect()
    assert [(r.a, r.b) for r in pairs] == [(1, 2)]
    assert all(math.isfinite(r.cos_sim) for r in pairs)


def test_topk_never_ranks_nonfinite(emb, q):
    from ondine_spark.operators.similarity_search import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
        train_ivf_centroids,
    )

    brute = brute_force_topk(emb, q, k=6).collect()
    assert {r.vec_id for r in brute} == {1, 2, 3}
    assert all(math.isfinite(r.cos_sim) for r in brute)

    cents = train_ivf_centroids(emb, nlist=3)
    assert all(math.isfinite(x) for c in cents for x in c)
    ivf = ivf_topk(emb, q, k=6, centroids=cents, nprobe=len(cents)).collect()
    assert {r.vec_id for r in ivf} == {1, 2, 3}

    lsh = lsh_topk(emb, q, k=6, num_planes=2, num_tables=2).collect()
    assert {r.vec_id for r in lsh} <= {1, 2, 3}


def test_nonfinite_centroid_rejected(emb):
    from ondine_spark.operators.similarity_search import _nearest_centroids_expr

    with pytest.raises(ValueError, match="non-finite centroid"):
        _nearest_centroids_expr("embedding", [[INF, 0.0]], 1)


def test_pq_training_skips_nonfinite(emb):
    from ondine_spark.operators.product_quantization import train_pq_codebooks

    books = train_pq_codebooks(emb, vec_col="embedding", m=2, nbits=1)
    flat = [x for sub in books for c in sub for x in c]
    assert flat and all(math.isfinite(x) for x in flat)
