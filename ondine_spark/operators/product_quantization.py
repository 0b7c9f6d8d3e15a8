"""Product quantization (PQ) for embedding columns — the ANN memory path.

At 100 TB an embedding column dominates storage and shuffle: 10¹⁰ rows ×
64 float64 = 5 TB of vectors. PQ (Jégou et al. 2011, "Product
Quantization for Nearest Neighbor Search" — the FAISS IVFPQ building
block) compresses each vector to ``m`` bytes (64× here): the vector is
split into ``m`` subspaces, each subspace gets its own 256-centroid
codebook, and a vector is stored as the m-tuple of nearest-centroid ids.

Search uses asymmetric distance computation (ADC): the QUERY stays exact;
per query a (m × 256) lookup table of subspace inner products is built
once, and a corpus code scores with m table lookups + adds — no float
vector is ever touched at scan time.

Spark shapes:

- ``train_pq_codebooks`` — driver-side: m independent k-means over a
  bounded sample (the FAISS practice; reuses ``kmeans_numpy``).
- ``pq_encode`` — Arrow-batched ``mapInPandas``; one pass, zero shuffle,
  emits ``array<smallint>`` codes (the compressed corpus is what you
  persist/bucket for reuse).
- ``pq_topk`` — queries collect to the driver (the small side — a LUT is
  2 KB/query), ship inside the UDF closure; each Arrow batch scores its
  codes against all LUTs via one numpy gather+sum and pre-reduces to its
  per-query top-k, so the ranking shuffle carries ≤ k·|queries| rows per
  batch (the same prereduce contract as ``brute_force_topk``).

Cosine contract: vectors are L2-normalized before encoding (spherical,
matching the cosine semantics of the rest of the ANN stack), so the ADC
inner product approximates cosine directly; ``approx_cos`` is the PQ
estimate, not the exact value — recall quality is pytest-gated against
exact brute force (not SQL-oracle-gated: argmin-per-subspace encoding is
not reasonably SQL-expressible).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _normalize(x):
    import numpy as np

    n = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.where(n == 0, 1.0, n)


def _train_subspace(args):
    """One sub-quantizer k-means — module-level so a worker-pool map can
    pickle it by reference (see train_pq_codebooks)."""
    from ondine_spark.operators.similarity_search import kmeans_numpy

    sub, kk, max_iter, seed, n_init = args
    return [
        list(map(float, row))
        for row in kmeans_numpy(sub, kk, max_iter=max_iter, seed=seed,
                                n_init=n_init)
    ]


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    nbits: int = 8,
    max_iter: int = 10,
    seed: int = 42,
    max_train_rows: int = 100_000,
    n_init: int = 1,
):
    """Train m sub-quantizers of 2^nbits centroids each on a bounded
    driver-side sample. Returns codebooks as a list of m (k × dsub)
    nested lists — tiny (m·256·dsub floats), broadcastable, and JSON- or
    parquet-serializable for reuse across runs.

    ``n_init=1`` is FAISS's own nredo default for sub-quantizers: a weak
    local optimum in one subspace is diluted across the other m−1, so
    restarts buy little here (unlike the IVF coarse quantizer, where
    cell balance shapes every probe)."""
    from ondine_spark.operators.similarity_search import kmeans_numpy

    import numpy as np

    k = 1 << nbits
    from ondine_spark.functions.similarity import finite_vector

    # null/NaN/Inf vectors can't train (they poison sub-quantizer means)
    sample = (
        corpus.select(vec_col)
        .filter(finite_vector(F.col(vec_col)))
        .limit(max_train_rows)
        .collect()
    )
    if not sample:
        # same degenerate-input contract as train_ivf_centroids (which
        # returns [] for an empty/all-non-finite corpus), but encoding
        # with 0 codebooks is meaningless, so fail loud instead
        raise ValueError(
            f"no finite training vectors in {vec_col!r}: corpus is empty "
            "or every vector is null/NaN/Inf"
        )
    x = np.asarray([r[0] for r in sample], dtype="float64")
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    x = _normalize(x)
    dsub = dim // m
    # the m sub-quantizers are independent (own slice, own seed), so they
    # can train in parallel with bit-identical output. Threads don't help
    # — at sub-quantizer sizes the numpy dispatch overhead holds the GIL
    # most of the time (measured: 8 threads 1.63 s vs sequential 1.42 s
    # at n=2000) — but a short-lived fork pool gives near-linear speedup
    # (0.37 s, books compare equal). Forked children only run numpy and
    # never touch the JVM gateway. Sequential fallback for tiny samples
    # (pool spawn ~0.1 s dwarfs the work) and non-fork platforms.
    tasks = [
        (x[:, j * dsub : (j + 1) * dsub], min(k, len(x)), max_iter,
         seed + 101 * j, n_init)
        for j in range(m)
    ]
    if m > 1 and len(x) >= 1000:
        try:
            import multiprocessing as mp

            with mp.get_context("fork").Pool(min(m, 8)) as pool:
                return pool.map(_train_subspace, tasks)
        except (ValueError, OSError):  # no fork on this platform
            pass
    return [_train_subspace(t) for t in tasks]


def pq_encode(
    df: DataFrame,
    vec_col: str,
    codebooks,
    out_col: str = "pq_code",
    cell_centroids=None,
    cell_col: str = "ivf_cell",
) -> DataFrame:
    """Append the m-byte PQ code (``array<smallint>``) to every row. One
    Arrow-batched pass, zero shuffle; vectors are normalized before
    encoding (cosine contract). Persist the coded frame — it is the
    64x-smaller stand-in for the embedding column at query time.

    ``cell_centroids`` (r8): optionally emit the IVF coarse-cell id in
    the SAME Arrow pass (``cell_col``) instead of a second
    per-row-expression stage — same cosine/tie contract as
    ``similarity_search.assign_cells_arrow`` (ties → higher id,
    zero norms score 0.0)."""
    if not codebooks:
        raise ValueError("codebooks is empty — train_pq_codebooks first")
    books = [
        [[float(v) for v in row] for row in b] for b in codebooks
    ]
    fields = df.schema.fields
    out_fields = list(fields) + [
        T.StructField(out_col, T.ArrayType(T.ShortType()))
    ]
    if cell_centroids is not None:
        out_fields.append(T.StructField(cell_col, T.IntegerType()))
    out_schema = T.StructType(out_fields)

    def encode(batches: Iterator) -> Iterator:
        import numpy as np

        cents = [np.asarray(b) for b in books]
        m = len(cents)
        dsub = cents[0].shape[1]
        if cell_centroids is not None:
            cc = np.asarray(cell_centroids, dtype="float64")
            ccn = np.linalg.norm(cc, axis=1)
            zero_c = ccn == 0
            ccn = np.where(zero_c, 1.0, ccn)
            nlist = cc.shape[0]
        for pdf in batches:
            if not len(pdf):
                continue
            raw = np.array(pdf[vec_col].tolist(), dtype="float64")
            x = _normalize(raw)
            codes = np.empty((len(x), m), dtype="int16")
            for j in range(m):
                sub = x[:, j * dsub : (j + 1) * dsub]
                c = cents[j]
                # dist² argmin; |sub|² constant per row
                codes[:, j] = (
                    -2.0 * sub @ c.T + (c * c).sum(axis=1)
                ).argmin(axis=1)
            pdf = pdf.copy()
            pdf[out_col] = list(codes)
            if cell_centroids is not None:
                xn = np.linalg.norm(raw, axis=1)
                sims = (raw @ cc.T) / (
                    np.where(xn == 0, 1.0, xn)[:, None] * ccn
                )
                sims[xn == 0, :] = 0.0
                sims[:, zero_c] = 0.0
                cell = (nlist - 1) - np.argmax(sims[:, ::-1], axis=1)
                pdf[cell_col] = cell.astype("int32")
            yield pdf

    # NOT spread_small here (r8): the numpy encode kernel is ~µs/row, so
    # at local fixture scale 32 task dispatches cost more than the whole
    # single-task encode (measured pq_codes_adc 1.98 s -> 3.11 s when
    # spread); cluster scans arrive multi-split on their own
    return df.mapInPandas(encode, schema=out_schema)


def pq_topk(
    coded: DataFrame,
    queries: DataFrame,
    k: int,
    codebooks,
    corpus_id: str = "vec_id",
    code_col: str = "pq_code",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Approximate cosine top-k over PQ codes via ADC. Output: query_id,
    vec_id, approx_cos, rank — same result-list contract as
    ``brute_force_topk`` (rank ties break by corpus id ascending).

    The query side COLLECTS to the driver: queries are the small side by
    contract (a LUT is m·256 doubles ≈ 2 KB per query; thousands of
    queries fit trivially), and shipping LUTs in the closure keeps the
    corpus pass join-free. Per-batch prereduce caps the ranking shuffle
    at k rows per (query, batch)."""
    import numpy as np

    from pyspark.sql import Window

    if not codebooks:
        raise ValueError("codebooks is empty — train_pq_codebooks first")
    books = [np.asarray(b, dtype="float64") for b in codebooks]
    m = len(books)
    dsub = books[0].shape[1]
    qrows = queries.select(query_id, query_vec).collect()
    if not qrows:
        raise ValueError("queries frame is empty")
    qids = [r[0] for r in qrows]
    qx = _normalize(np.asarray([r[1] for r in qrows], dtype="float64"))
    # LUT[q][j][c] = <query_q sub_j, centroid_c> ; ADC score = sum_j LUT
    luts = np.stack(
        [
            np.stack([
                books[j] @ qx[qi, j * dsub : (j + 1) * dsub]
                for j in range(m)
            ])
            for qi in range(len(qids))
        ]
    )  # (nq, m, k)
    id_field = coded.schema[corpus_id]
    out_schema = T.StructType(
        [
            T.StructField("_qi", T.IntegerType()),
            T.StructField("_cid", id_field.dataType),
            T.StructField("approx_cos", T.DoubleType()),
        ]
    )

    def score(batches: Iterator) -> Iterator:
        import pandas as pd

        nq = luts.shape[0]
        cols = np.arange(m)
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array(pdf[code_col].tolist(), dtype="int64")  # (n, m)
            # gather: scores[q, i] = sum_j luts[q, j, codes[i, j]]
            scores = luts[:, cols, codes].sum(axis=2)  # (nq, n)
            cids = pdf[corpus_id].values
            parts = []
            for qi in range(nq):
                s = scores[qi]
                # same tie-break as the final window: score desc, id asc
                top = np.lexsort((cids, -s))[:k]
                parts.append(
                    pd.DataFrame(
                        {
                            "_qi": qi,
                            "_cid": cids[top],
                            "approx_cos": s[top],
                        }
                    )
                )
            yield pd.concat(parts, ignore_index=True)

    scored = coded.select(corpus_id, code_col).mapInPandas(
        score, schema=out_schema
    )
    qmap = F.array(*[F.lit(q) for q in qids])
    w = Window.partitionBy("_qi").orderBy(F.desc("approx_cos"), F.asc("_cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            qmap[F.col("_qi")].alias(query_id),
            F.col("_cid").alias(corpus_id),
            "approx_cos",
            "rank",
        )
    )


def ivfpq_topk(
    coded: DataFrame,
    queries: DataFrame,
    k: int,
    codebooks,
    centroids: list[list[float]],
    nprobe: int = 4,
    corpus_id: str = "vec_id",
    code_col: str = "pq_code",
    cell_col: str = "ivf_cell",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """FAISS IVFPQ: each query scores ONLY the PQ codes in its ``nprobe``
    nearest IVF cells — query cost independent of corpus size for fixed
    cell occupancy, at m bytes per corpus row.

    ``coded`` must carry ``cell_col`` (assign once with
    ``similarity_search._nearest_centroids_expr`` when encoding, persist
    bucketed by cell). Per-query probe sets are computed driver-side in
    numpy from the same spherical-cosine rule the assignment expression
    uses, and the scoring batch masks rows by cell membership before the
    LUT gather — everything else is ``pq_topk``'s prereduce shape. With
    nprobe = nlist this equals ``pq_topk`` exactly (asserted in tests)."""
    import numpy as np

    from pyspark.sql import Window

    if not codebooks:
        raise ValueError("codebooks is empty — train_pq_codebooks first")
    books = [np.asarray(b, dtype="float64") for b in codebooks]
    m = len(books)
    dsub = books[0].shape[1]
    qrows = queries.select(query_id, query_vec).collect()
    if not qrows:
        raise ValueError("queries frame is empty")
    qids = [r[0] for r in qrows]
    qx = _normalize(np.asarray([r[1] for r in qrows], dtype="float64"))
    c = np.asarray(centroids, dtype="float64")
    cn = np.linalg.norm(c, axis=1)
    cn = np.where(cn == 0, 1.0, cn)
    # cosine to each centroid (queries are already unit); ties to the
    # higher centroid id — same contract as _nearest_centroids_expr
    sims = (qx @ c.T) / cn
    probe_cells = []
    for qi in range(len(qids)):
        idx = sorted(range(c.shape[0]), key=lambda j: (-sims[qi, j], -j))
        probe_cells.append(np.asarray(idx[:nprobe]))
    luts = np.stack(
        [
            np.stack([
                books[j] @ qx[qi, j * dsub : (j + 1) * dsub]
                for j in range(m)
            ])
            for qi in range(len(qids))
        ]
    )
    id_field = coded.schema[corpus_id]
    out_schema = T.StructType(
        [
            T.StructField("_qi", T.IntegerType()),
            T.StructField("_cid", id_field.dataType),
            T.StructField("approx_cos", T.DoubleType()),
        ]
    )

    def score(batches: Iterator) -> Iterator:
        import pandas as pd

        nq = luts.shape[0]
        cols = np.arange(m)
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array(pdf[code_col].tolist(), dtype="int64")
            cells = pdf[cell_col].values
            cids = pdf[corpus_id].values
            parts = []
            for qi in range(nq):
                mask = np.isin(cells, probe_cells[qi])
                if not mask.any():
                    continue
                sub = codes[mask]
                s = luts[qi][cols, sub].sum(axis=1)
                sub_ids = cids[mask]
                top = np.lexsort((sub_ids, -s))[:k]
                parts.append(
                    pd.DataFrame(
                        {"_qi": qi, "_cid": sub_ids[top],
                         "approx_cos": s[top]}
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    scored = coded.select(corpus_id, code_col, cell_col).mapInPandas(
        score, schema=out_schema
    )
    qmap = F.array(*[F.lit(q) for q in qids])
    w = Window.partitionBy("_qi").orderBy(F.desc("approx_cos"), F.asc("_cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            qmap[F.col("_qi")].alias(query_id),
            F.col("_cid").alias(corpus_id),
            "approx_cos",
            "rank",
        )
    )
