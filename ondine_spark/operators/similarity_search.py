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

from ondine_spark.core.partitioning import spread_small
from ondine_spark.functions.similarity import cosine, finite_vector


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
    # a null/non-finite QUERY vector has no meaningful ranking — it
    # yields no result rows (instead of a NaN-sim garbage top-k)
    q = F.broadcast(
        queries.filter(finite_vector(F.col(query_vec)))
        .select(F.col(query_id).alias("_qid"), F.col(query_vec).alias("_qv"))
    )
    # single-file local corpora arrive as one partition, serializing the
    # per-row cosine scoring on one core (no-op on many-split scans)
    scored = spread_small(
        corpus.filter(finite_vector(F.col(corpus_vec))).select(
            F.col(corpus_id).alias("_cid"), F.col(corpus_vec).alias("_cv")
        )
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
    from ondine_spark.functions.similarity import sign_bucket_expr

    return sign_bucket_expr(vec, planes)


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
    corpus = corpus.filter(finite_vector(F.col(corpus_vec)))
    probe = corpus.select(corpus_vec).first()
    if probe is None:
        # no usable corpus vector: empty result, correct schema
        ct = dict(corpus.dtypes)[corpus_id]
        qt = dict(queries.dtypes)[query_id]
        return corpus.sparkSession.createDataFrame(
            [], f"{query_id} {qt}, {corpus_id} {ct}, cos_sim double, rank int"
        )
    dim = len(probe[0])
    c = corpus.select(F.col(corpus_id).alias("_cid"), F.col(corpus_vec).alias("_cv"))
    q = queries.filter(finite_vector(F.col(query_vec))).select(
        F.col(query_id).alias("_qid"), F.col(query_vec).alias("_qv")
    )

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
    max_train_rows: int = 100_000,
    impl: str = "sample",
):
    """Coarse quantizer for IVF. Returns the local centroid list
    (nlist × dim floats — tiny, broadcastable).

    Default ``impl="sample"`` is the FAISS shape: pull a bounded sample
    (``max_train_rows``, ≈50 MB at 100k × 64 doubles) to the driver and
    run numpy Lloyd's with k-means++ seeding — IVF coarse quantizers are
    trained on a sample at ANY corpus scale, so a distributed trainer
    over the full corpus buys nothing but JVM job overhead (measured
    ~1.3 s per fit at sf0.1 vs ~50 ms here; at 100 TB the full-corpus
    fit would be max_iter scans of the whole table). The sample is the
    first ``max_train_rows`` rows (scan order): quantizer quality needs
    a representative spread, not statistical rigor — pass a
    ``hash_sample``-ed frame if scan order correlates with content.

    ``impl="ml"`` keeps the distributed pyspark.ml KMeans path for the
    rare case where the training set itself must not be sampled."""
    if impl == "ml":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        train = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
        model = KMeans(
            k=nlist, maxIter=max_iter, seed=seed, initMode="k-means||"
        ).fit(train)
        return [list(map(float, c)) for c in model.clusterCenters()]

    import numpy as np

    sample = (
        corpus.select(vec_col)
        # null / NaN / Inf vectors can't train (one non-finite row
        # poisons a k-means mean)
        .filter(finite_vector(F.col(vec_col)))
        .limit(max_train_rows)
        .collect()
    )
    x = np.asarray([r[0] for r in sample], dtype="float64")
    if len(x) == 0:
        # empty corpus (an empty partition, a filter that matched nothing):
        # nothing to train — return no centroids; ivf_topk treats an empty
        # centroid list as "no index" and yields an empty result rather
        # than crashing the whole job.
        return []
    if len(x) < nlist:
        # fewer training points than requested cells: clamp (FAISS warns
        # and degrades the same way — a cell per point is the max useful)
        nlist = len(x)
    # spherical k-means: cell assignment downstream is COSINE, so train on
    # unit vectors — Euclidean argmin over normalized points is cosine
    # argmax, making the learned cells match how they will be probed
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.where(norms == 0, 1.0, norms)
    best_c = kmeans_numpy(x, nlist, max_iter=max_iter, seed=seed)
    return [list(map(float, row)) for row in best_c]


def kmeans_numpy(x, k: int, max_iter: int = 10, seed: int = 42,
                 n_init: int = 4):
    """Driver-side Lloyd's with k-means++ seeding and ``n_init`` restarts
    (lowest inertia wins — sklearn's discipline; single-restart quality is
    seed luck and restarts cost milliseconds at sample scale). Shared by
    the IVF coarse quantizer and the PQ sub-quantizers. Deterministic for
    a given (x, k, seed). Returns a (k × dim) ndarray."""
    import numpy as np

    def _lloyd(rng):
        # k-means++ seeding with a RUNNING min-distance (O(k·n·d)): the
        # textbook form that recomputes distances to every centroid per
        # step is O(k²·n·d) — at k=256 across the PQ sub-quantizers that
        # was ~100 s of driver numpy; the running min makes it ~1 s
        cents = [x[rng.randint(len(x))]]
        d2 = ((x - cents[0]) ** 2).sum(axis=1)
        for _ in range(1, k):
            total = d2.sum()
            if total <= 0:
                nxt = x[rng.randint(len(x))]
            else:
                nxt = x[np.searchsorted(np.cumsum(d2 / total), rng.rand())]
            cents.append(nxt)
            d2 = np.minimum(d2, ((x - nxt) ** 2).sum(axis=1))
        c = np.asarray(cents)
        for _ in range(max_iter):
            # dist² = |x|² − 2x·c + |c|²; |x|² is constant per row for argmin
            assign = (-2.0 * x @ c.T + (c * c).sum(axis=1)).argmin(axis=1)
            # vectorized mean update (a per-cell boolean-mask loop is
            # O(k·n) PER ITERATION — measured ~8 s across the PQ
            # sub-quantizers at k=256). Per-dim bincount(weights=·), NOT
            # np.add.at: add.at is an unbuffered ufunc (~1 µs/element),
            # ~50 ms/iter at n=2000×8 where d bincounts cost ~2 ms —
            # both accumulate in input order, so the float sums are
            # bit-identical (asserted in test_pq_kmeans_update_identity)
            counts = np.bincount(assign, minlength=k)
            sums = np.empty_like(c)
            for _dd in range(c.shape[1]):
                sums[:, _dd] = np.bincount(
                    assign, weights=x[:, _dd], minlength=k
                )
            new_c = np.where(
                counts[:, None] > 0,
                sums / np.maximum(counts, 1)[:, None],
                c,
            )
            empty = np.flatnonzero(counts == 0)
            if len(empty):  # reseed empties to the farthest points
                far = np.argsort(
                    -((x - c[assign]) ** 2).sum(axis=1)
                )[: len(empty)]
                new_c[empty] = x[far]
            if np.allclose(new_c, c):
                c = new_c
                break
            c = new_c
        assign = (-2.0 * x @ c.T + (c * c).sum(axis=1)).argmin(axis=1)
        inertia = ((x - c[assign]) ** 2).sum()
        return c, inertia

    best_c, best_inertia = None, None
    for i in range(n_init):
        c, inertia = _lloyd(np.random.RandomState(seed + i))
        if best_inertia is None or inertia < best_inertia:
            best_c, best_inertia = c, inertia
    return best_c


def _nearest_centroids_expr(vec_col, centroids: list[list[float]], n: int):
    """array of the ``n`` nearest centroid ids (by cosine) — a pure JVM
    expression over the broadcast centroid literals.

    Construction cost matters as much as evaluation cost here — two
    designs were measured and rejected:

    - per-literal construction (``F.array(*[F.lit(x) ...])`` — k·dim
      separate ``F.lit`` calls) spends ~1 s of driver-side py4j
      round-trips PER CALL at 8×64; the whole centroid matrix now parses
      JVM-side from ONE SQL string (``D`` suffix keeps the literals
      DOUBLE; ``repr`` round-trips bit-exactly).
    - a k×dim static-arithmetic unroll of the cosine (≈1,500
      Add/Multiply nodes) blew up Catalyst analysis/codegen — 8x SLOWER
      end-to-end on the sf0.1 IVF probe than the higher-order-function
      cosine, whose interpreted per-row cost is dwarfed by the plan
      around it.

    Ties rank the HIGHER centroid id first (struct sort on (sim, id),
    reversed) — the contract the ``semantic_clusters`` oracle gate
    replays in SQL."""
    import math

    if any(not math.isfinite(x) for c in centroids for x in c):
        # a non-finite centroid would render an unparseable SQL literal
        # (e.g. `infD`) — fail with the cause, not an analysis error
        raise ValueError("non-finite centroid component; train on a "
                         "finite_vector-filtered corpus")
    cents_sql = "array(" + ",".join(
        "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")"
        for c in centroids
    ) + ")"
    sims = F.transform(
        F.expr(cents_sql),
        lambda c, i: F.struct(
            cosine(F.col(vec_col), c).alias("s"), i.alias("c")
        ),
    )
    top = F.slice(F.reverse(F.array_sort(sims)), 1, n)
    return F.transform(top, lambda x: x["c"])


def assign_cells_arrow(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    out_col: str = "_cell",
) -> DataFrame:
    """Nearest-centroid cell id per row, vectorized in numpy over Arrow
    batches — the assignment arm of :func:`_nearest_centroids_expr` for
    HIGH-VOLUME corpus sides (the expression form is interpreted per
    element: measured 0.47 s for 2000 rows × 8 centroids × 64 dims at
    sf0.1, vs one batched matmul here).

    Same contract as ``_nearest_centroids_expr(vec, cents, 1)[0]``:
    cosine similarity, zero-norm rows and zero-norm centroids score 0.0,
    ties pick the HIGHER centroid id. Values agree with the JVM
    expression to ~1 ulp (both IEEE float64, different summation order);
    an assignment can differ only when two centroids tie within that ulp
    — callers that need bit-identical assignments (the oracle-replayed
    semantic-dedup gates) keep the expression form."""
    import numpy as np

    c = np.asarray(centroids, dtype="float64")
    cn = np.linalg.norm(c, axis=1)
    zero_c = cn == 0
    cn = np.where(zero_c, 1.0, cn)
    nlist = c.shape[0]
    fields = df.schema.fields
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(fields) + [T.StructField(out_col, T.IntegerType())]
    )

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype="float64")
            xn = np.linalg.norm(x, axis=1)
            sims = (x @ c.T) / (np.where(xn == 0, 1.0, xn)[:, None] * cn)
            sims[xn == 0, :] = 0.0
            sims[:, zero_c] = 0.0
            # argmax returns the FIRST max; scanning the columns in
            # reverse makes that the highest centroid id (tie contract)
            cell = (nlist - 1) - np.argmax(sims[:, ::-1], axis=1)
            pdf = pdf.copy()
            pdf[out_col] = cell.astype("int32")
            yield pdf

    return df.mapInPandas(assign, schema=out_schema)


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

    Scale shape: queries explode to nprobe rows and broadcast-join the
    assigned corpus on the cell id — the broadcast hash join needs NO
    co-location, so assignment adds zero exchanges per query batch. (At
    corpus scale, persist the assigned table once — written bucketed by
    ``_cell`` — and reuse it across query batches; a per-batch
    repartition on the cell would be a full corpus shuffle bought for a
    join that doesn't need it.) No crossJoin against the full corpus."""
    if not centroids:
        # no index (empty training corpus): empty result, correct schema
        ct = dict(corpus.dtypes)[corpus_id]
        qt = dict(queries.dtypes)[query_id]
        return corpus.sparkSession.createDataFrame(
            [], f"{query_id} {qt}, {corpus_id} {ct}, cos_sim double, rank int"
        )
    # spread before assignment + scoring: cell assignment and the cosine
    # both run per row and serialize on a one-partition local scan.
    # Assignment is the Arrow matmul kernel (r8) — the corpus is the
    # high-volume side; the probe side below stays the JVM expression
    # (a handful of query rows).
    assigned = assign_cells_arrow(
        spread_small(
            corpus.filter(finite_vector(F.col(corpus_vec))).select(
                F.col(corpus_id).alias("_cid"), F.col(corpus_vec).alias("_cv")
            )
        ),
        "_cv",
        centroids,
        "_cell",
    )
    probes = queries.filter(finite_vector(F.col(query_vec))).select(
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
