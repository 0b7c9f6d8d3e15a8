"""R3 retrieval at scale (r6 verdict #4): 500K query rows x 1M chunks
through the hyperplane-LSH candidate path (retrieve_topk_lsh), with a
sampled recall cross-check against the exact inverted-index path.

Writes benchmarks/KB_LSH_500K.json:
  rows, chunks, wall_sec for the full LSH retrieval (top-3 per row),
  candidates surfaced, rows with >=1 hit, and on a deterministic sample
  of queries the top-1 agreement + exact-score parity vs retrieve_topk.

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
SAMPLE_Q = 2_000


def main() -> None:
    import tempfile

    work = sys.argv[3] if len(sys.argv) > 3 else tempfile.mkdtemp(
        prefix="kb_lsh_"
    )
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ondine_spark.knowledge.retrieval import (
        retrieve_topk,
        retrieve_topk_lsh,
    )
    from ondine_spark.knowledge.store import KnowledgeStore

    # --- corpus: ~25 pseudo-random words per doc -> 2 chunks at 16 tokens
    words = F.transform(
        F.sequence(F.lit(0), F.lit(24)),
        lambda k: F.concat(
            F.lit("w"),
            F.pmod(F.hash(F.col("doc_id") * 31 + k * 7), F.lit(50_000))
            .cast("string"),
        ),
    )
    docs = (
        spark.range(N_DOCS)
        .withColumnRenamed("id", "doc_id")
        .withColumn("text", F.concat_ws(" ", words))
    )
    store_path = os.path.join(work, "store")
    store = KnowledgeStore(spark, store_path, ngram_dim=4096)
    t0 = time.monotonic()
    store.ingest(docs, max_tokens=16)
    t_ingest = time.monotonic() - t0
    n_chunks = store.chunks().count()

    # --- queries: near-copies (prefix) of a deterministic chunk spread
    q_words = F.transform(
        F.sequence(F.lit(0), F.lit(13)),
        lambda k: F.concat(
            F.lit("w"),
            F.pmod(F.hash(F.col("src_doc") * 31 + k * 7), F.lit(50_000))
            .cast("string"),
        ),
    )
    rows = (
        spark.range(N_ROWS)
        .select(
            F.concat(F.lit("q"), F.col("id")).alias("_row_id"),
            F.pmod(F.col("id") * 2654435761, F.lit(N_DOCS)).alias("src_doc"),
        )
        .withColumn("q", F.concat_ws(" ", q_words))
        .select("_row_id", "src_doc", "q")
    )

    # --- full LSH retrieval
    t0 = time.monotonic()
    lsh = retrieve_topk_lsh(rows, store, ["q"], top_k=3)
    n_lsh = lsh.count()
    t_lsh = time.monotonic() - t0
    rows_hit = lsh.select("_row_id").distinct().count()

    # --- sampled cross-check vs the exact path
    sample = rows.filter(
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
        for r in retrieve_topk_lsh(sample, store, ["q"], top_k=1).collect()
    }
    agree = sum(
        1 for k, v in exact1.items() if lsh1.get(k, (None,))[0] == v[0]
    )
    score_match = sum(
        1 for k, v in exact1.items()
        if k in lsh1 and lsh1[k][0] == v[0] and lsh1[k][1] == v[1]
    )

    line = {
        "metric": "kb_retrieval_lsh_scale",
        "rows": N_ROWS,
        "docs": N_DOCS,
        "chunks": int(n_chunks),
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
