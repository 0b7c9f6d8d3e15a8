"""KB-LSH operating table (r7 verdict #6): recall vs rescore-candidate
volume across min_band_matches x band-key width, at a size cheap enough
to sweep (default 100K query rows x ~200K chunks, same generators as
tools/kb_lsh_scale.py so the points are comparable to KB_LSH_500K).

The 500K x 1M record is ONE operating point (32 bands x 16 bits,
min_band_matches=2 -> 96.4% top-1). This tool answers the two questions
that point leaves open:
  - is min_band_matches=2 what costs the missing recall, and
  - does min_band_matches=1 at wider keys (auto+2 bits) dominate it
    (same candidate volume, higher recall)?

For each config it records:
  - top-1 agreement vs the exact path on a deterministic query sample
    (recall proxy — the exact top-1 is config-independent, computed once);
  - the FULL candidate-pair count (the cost driver: rescore work, Arrow
    array payload, and shuffle volume are all proportional to it);
  - candidate pairs per query row.

Writes benchmarks/KB_LSH_SWEEP.json (one record per config) — the table
SCALE.md cites for the default choices.

Usage: python tools/kb_lsh_sweep.py [n_rows] [n_docs] [work_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.kb_lsh_scale import _rows_frame, _store, _word_expr, session  # noqa: E402
import tools.kb_lsh_scale as scale_mod  # noqa: E402

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000  # ~2 chunks/doc
SAMPLE_Q = 500
N_BANDS = 32  # the KB_LSH_500K record's band count — sweep around it


def main() -> None:
    import tempfile

    # the scale module's generators read its module-level sizes
    scale_mod.N_ROWS, scale_mod.N_DOCS = N_ROWS, N_DOCS
    work = sys.argv[3] if len(sys.argv) > 3 else tempfile.mkdtemp(
        prefix="kb_sweep_"
    )

    # ---- phase 1: corpus + ingest (own session; shuffle files die with it)
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
    n_chunks = store.chunk_count()
    print(f"# ingest: {n_chunks} chunks in {time.monotonic() - t0:.0f}s",
          file=sys.stderr, flush=True)

    # exact top-1 on the sample: config-independent, computed once
    from ondine_spark.knowledge.retrieval import (
        retrieve_topk,
        retrieve_topk_lsh,
    )

    sample = _rows_frame(spark).filter(
        F.pmod(F.hash("_row_id"), F.lit(N_ROWS // SAMPLE_Q)) == 0
    ).cache()
    n_sample = sample.count()
    exact1 = {
        r["_row_id"]: (r["chunk_id"], round(r["score"], 9))
        for r in retrieve_topk(sample, store, ["q"], top_k=1).collect()
    }
    spark.stop()
    auto_bits = min(20, max(8, math.ceil(math.log2(max(n_chunks, 1) / 16))))
    print(f"# exact sample done ({n_sample} queries); auto bits = {auto_bits}",
          file=sys.stderr, flush=True)

    records = []
    for bits_label, bits in (
        ("auto-1", auto_bits - 1), ("auto", auto_bits), ("auto+2", auto_bits + 2),
    ):
        for mbm in (1, 2, 3):
            cfg = dict(
                n_planes=N_BANDS * bits, n_bands=N_BANDS,
                min_band_matches=mbm,
            )
            spark = session()  # fresh session per config: shuffles released
            from pyspark.sql import functions as F  # noqa: F811

            store = _store(spark, work)
            rows = _rows_frame(spark)
            # cost: FULL candidate volume over all rows
            t0 = time.monotonic()
            n_cand = retrieve_topk_lsh(
                rows, store, ["q"], top_k=1, _candidates_only=True, **cfg
            ).count()
            t_cand = time.monotonic() - t0
            # recall: top-1 agreement on the sample
            sample = _rows_frame(spark).filter(
                F.pmod(F.hash("_row_id"), F.lit(N_ROWS // SAMPLE_Q)) == 0
            )
            lsh1 = {
                r["_row_id"]: r["chunk_id"]
                for r in retrieve_topk_lsh(
                    sample, store, ["q"], top_k=1, **cfg
                ).collect()
            }
            agree = sum(
                1 for k, v in exact1.items() if lsh1.get(k) == v[0]
            )
            spark.stop()
            rec = {
                "bits": bits, "bits_label": bits_label,
                "min_band_matches": mbm, "n_bands": N_BANDS,
                "candidates": int(n_cand),
                "candidates_per_row": round(n_cand / N_ROWS, 2),
                "candidate_count_wall_sec": round(t_cand, 1),
                "top1_agreement": agree,
                "top1_agreement_frac": round(agree / max(n_sample, 1), 4),
            }
            records.append(rec)
            print(json.dumps(rec), flush=True)

    out = {
        "metric": "kb_lsh_recall_cost_sweep",
        "rows": N_ROWS, "docs": N_DOCS, "chunks": int(n_chunks),
        "sample_queries": int(n_sample),
        "auto_bits": auto_bits,
        "configs": records,
        "ts": time.time(),
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "benchmarks", "KB_LSH_SWEEP.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"# {len(records)} configs -> benchmarks/KB_LSH_SWEEP.json",
          file=sys.stderr)


if __name__ == "__main__":
    main()
