"""R3 retrieval at scale (r6 verdict #4): 500K query rows x 1M chunks
through the hyperplane-LSH candidate path (retrieve_topk_lsh), with a
sampled recall cross-check against the exact inverted-index path.

Three scale lessons are baked into this tool's shape (each learned from
an ENOSPC or a pinned CPU on the first runs, fixed in retrieval.py):
  - band-key width auto-scales with corpus size (8-bit keys at 1M
    chunks put ~4K chunks in EVERY bucket);
  - rescoring is an Arrow merge-dot kernel over sorted arrays, never a
    candidate x bucket explode and never an interpreted map scan;
  - each phase runs in its OWN SparkSession: shuffle files live until
    the session stops, so a multi-phase tool in one session accumulates
    every phase's shuffles on disk simultaneously.
ngram_dim is sized to the corpus (2^18 at 1M chunks): a 4096-bucket
hashed space is DENSE at this scale — every posting list ~7K chunks —
which degenerates both the exact inverted index and the LSH signatures.

Writes benchmarks/KB_LSH_500K.json:
  rows, chunks, wall_sec for the full LSH retrieval (top-3 per row),
  rows with >=1 hit, and on a deterministic sample of queries the top-1
  agreement + exact-score parity vs retrieve_topk.

Usage: python tools/kb_lsh_scale.py [n_rows] [n_docs] [work_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000  # ~2 chunks/doc
SAMPLE_Q = 500
NGRAM_DIM = 1 << 18
# 32 bands x 16-bit keys, >=2-band collisions. Two hard constraints
# meet here: (a) the pre-filter band-join volume is n_bands x n_rows x
# bucket_occupancy rows NO MATTER what min_band_matches later discards
# (12-bit keys -> occupancy 244 -> ~2B rows -> ENOSPC; measured), so
# occupancy must stay ~15 (16-bit keys at 1M chunks); (b) a cos~0.93
# near-copy only collides per 16-bit band w.p. 0.885^16 ~ 0.14, so
# recall must come from MORE BANDS: P(>=2 of 32) ~ 0.95 vs 0.69 at 16
# bands. Random double-collisions stay ~0 (C(32,2)*(15/1M)^2*1M per
# query), so the rescore set is essentially just the true-ish pairs.
LSH = dict(n_planes=512, n_bands=32, min_band_matches=2)


def _word_expr(F, v):
    """50K word ids -> 4-letter base-26 words ("qkzv"). The first cut
    used "w" + digits: an 11-character alphabet whose WHOLE CORPUS holds
    ~1.7K distinct char-3grams, so every posting list carried ~56K
    chunks and the exact path's bucket join exploded to ~17B rows — a
    generator artifact (real text has 10-100K distinct trigrams), the
    same lesson as gen_scale_data's fixed-vocab shingle saturation."""
    import string

    letters = F.array(*[F.lit(c) for c in string.ascii_lowercase])
    return F.concat(*[
        F.element_at(
            letters,
            (F.floor(v / (26 ** k)) % 26 + 1).cast("int"),
        )
        for k in range(4)
    ])


def session():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    s = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def _rows_frame(spark):
    from pyspark.sql import functions as F

    q_words = F.transform(
        F.sequence(F.lit(0), F.lit(13)),
        lambda k: _word_expr(
            F, F.pmod(F.hash(F.col("src_doc") * 31 + k * 7), F.lit(50_000))
        ),
    )
    return (
        spark.range(N_ROWS)
        .select(
            F.concat(F.lit("q"), F.col("id")).alias("_row_id"),
            F.pmod(F.col("id") * 2654435761, F.lit(N_DOCS)).alias("src_doc"),
        )
        .withColumn("q", F.concat_ws(" ", q_words))
        .select("_row_id", "src_doc", "q")
    )


def _store(spark, work):
    from ondine_spark.knowledge.store import KnowledgeStore

    return KnowledgeStore(
        spark, os.path.join(work, "store"), ngram_dim=NGRAM_DIM
    )


def main() -> None:
    import tempfile

    work = sys.argv[3] if len(sys.argv) > 3 else tempfile.mkdtemp(
        prefix="kb_lsh_"
    )

    # ---- phase 1: corpus + ingest (own session)
    spark = session()
    from pyspark.sql import functions as F

    words = F.transform(
        F.sequence(F.lit(0), F.lit(24)),
        lambda k: _word_expr(
            F, F.pmod(F.hash(F.col("doc_id") * 31 + k * 7), F.lit(50_000))
        ),
    )
    docs = (
        spark.range(N_DOCS)
        .withColumnRenamed("id", "doc_id")
        .withColumn("text", F.concat_ws(" ", words))
    )
    store = _store(spark, work)
    t0 = time.monotonic()
    store.ingest(docs, max_tokens=16)
    t_ingest = time.monotonic() - t0
    n_chunks = store.chunks().count()
    spark.stop()
    print(f"# phase 1 done: {n_chunks} chunks in {t_ingest:.0f}s",
          file=sys.stderr, flush=True)

    # ---- phase 2: full LSH retrieval (own session)
    spark = session()
    from pyspark.sql import functions as F  # rebind on the new session

    from ondine_spark.knowledge.retrieval import (
        retrieve_topk,
        retrieve_topk_lsh,
    )

    store = _store(spark, work)
    rows = _rows_frame(spark)
    t0 = time.monotonic()
    lsh = retrieve_topk_lsh(rows, store, ["q"], top_k=3, **LSH)
    lsh.select("_row_id", "chunk_id", "score").write.mode(
        "overwrite"
    ).parquet(os.path.join(work, "lsh_topk.parquet"))
    t_lsh = time.monotonic() - t0
    out = spark.read.parquet(os.path.join(work, "lsh_topk.parquet"))
    n_lsh = out.count()
    rows_hit = out.select("_row_id").distinct().count()
    spark.stop()
    print(f"# phase 2 done: {n_lsh} topk rows in {t_lsh:.0f}s",
          file=sys.stderr, flush=True)

    # ---- phase 3: sampled exact-vs-LSH cross-check (own session)
    spark = session()
    from pyspark.sql import functions as F  # noqa: F811

    from ondine_spark.knowledge.retrieval import (  # noqa: F811
        retrieve_topk,
        retrieve_topk_lsh,
    )

    store = _store(spark, work)
    sample = _rows_frame(spark).filter(
        F.pmod(F.hash("_row_id"), F.lit(N_ROWS // SAMPLE_Q)) == 0
    ).cache()
    n_sample = sample.count()
    t0 = time.monotonic()
    exact1 = {
        r["_row_id"]: (r["chunk_id"], round(r["score"], 9))
        for r in retrieve_topk(sample, store, ["q"], top_k=1).collect()
    }
    t_exact_sample = time.monotonic() - t0
    lsh1 = {
        r["_row_id"]: (r["chunk_id"], round(r["score"], 9))
        for r in retrieve_topk_lsh(sample, store, ["q"], top_k=1,
                                   **LSH).collect()
    }
    agree = sum(
        1 for k, v in exact1.items() if lsh1.get(k, (None,))[0] == v[0]
    )
    score_match = sum(
        1 for k, v in exact1.items()
        if k in lsh1 and lsh1[k][0] == v[0] and lsh1[k][1] == v[1]
    )
    spark.stop()

    line = {
        "metric": "kb_retrieval_lsh_scale",
        "rows": N_ROWS,
        "docs": N_DOCS,
        "chunks": int(n_chunks),
        "ngram_dim": NGRAM_DIM,
        "lsh_params": LSH,
        "ingest_sec": round(t_ingest, 1),
        "lsh_topk_rows": int(n_lsh),
        "rows_with_hit": int(rows_hit),
        "lsh_wall_sec": round(t_lsh, 1),
        "sample_queries": int(n_sample),
        "exact_sample_wall_sec": round(t_exact_sample, 1),
        "top1_agreement": agree,
        "top1_agreement_frac": round(agree / max(n_sample, 1), 4),
        "score_parity_on_agreed": score_match == agree,
        "ts": time.time(),
    }
    print(json.dumps(line))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "benchmarks", "KB_LSH_500K.json"), "w") as f:
        json.dump(line, f, indent=1)


if __name__ == "__main__":
    main()
