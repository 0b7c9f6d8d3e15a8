"""KB retrieval at scale THROUGH THE PIPELINE SURFACE (round-8 closure
of the r7 verdict's "What's wrong #3"): the r7 scale work proved
retrieve_topk_lsh survives a 1M-chunk corpus, and round 8 wired it into
with_knowledge_base(method="auto") — this tool measures that the wiring
actually changes what a PIPELINE USER gets at scale, not just what a
direct caller of retrieval.py gets.

Four phases, each in its own SparkSession (shuffle files live until the
session stops — kb_lsh_scale.py lesson):
  1. corpus + ingest: N_DOCS docs -> ~2N chunks, ngram_dim 2^17
     (corpus-sized, same rationale as kb_lsh_scale). The ingest-time
     dim reaches the pipeline via the round-8 store_meta.json sidecar —
     the pipeline reopens the store with NO dim argument.
  2. full pipeline, method="exact": from_dataframe -> with_prompt ->
     with_knowledge_base(..., method="exact") -> mock LLM -> result.
  3. same pipeline, method="auto": the store is above
     LSH_AUTO_THRESHOLD so auto must route to the banded-LSH candidate
     path. Routing is evidenced structurally: the auto plan carries
     exactly one more MapInPandas (the Arrow rescore kernel) than the
     exact plan.
  4. contract agreement on a sample: attach_context(exact) vs
     attach_context(lsh) top-1 context equality.

Writes benchmarks/KB_PIPELINE_AUTO.json.

Usage: python tools/kb_pipeline_auto.py [n_docs] [n_rows] [work_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kb_lsh_scale import _word_expr, session  # noqa: E402  (tools/ sibling)

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
NGRAM_DIM = 1 << 17
SAMPLE_Q = 2_000
TEMPLATE = "Use the context to answer. Q: {q}"


def _docs(spark):
    from pyspark.sql import functions as F

    words = F.transform(
        F.sequence(F.lit(0), F.lit(24)),
        lambda k: _word_expr(
            F, F.pmod(F.hash(F.col("doc_id") * 31 + k * 7), F.lit(50_000))
        ),
    )
    return (
        spark.range(N_DOCS)
        .withColumnRenamed("id", "doc_id")
        .withColumn("text", F.concat_ws(" ", words))
    )


def _rows(spark):
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
            F.col("id").alias("uid"),
            F.pmod(F.col("id") * 2654435761, F.lit(N_DOCS)).alias("src_doc"),
        )
        .withColumn("q", F.concat_ws(" ", q_words))
        .select("uid", "q")
    )


def _pipeline(spark, store_path, method):
    from ondine_spark import PipelineBuilder
    from ondine_spark.llm.client import mock_client_factory

    return (
        PipelineBuilder(spark)
        .from_dataframe(_rows(spark), ["q"], id_column="uid")
        .with_prompt(TEMPLATE, ["answer"])
        .with_knowledge_base(store_path, ["q"], top_k=3, method=method)
        .with_custom_llm_client(mock_client_factory())
        .with_batch_size(25)
        .build()
    )


def main() -> None:
    import tempfile

    work = (
        sys.argv[3]
        if len(sys.argv) > 3
        else tempfile.mkdtemp(prefix="kb_pipe_")
    )
    store_path = os.path.join(work, "store")
    out: dict = {
        "metric": "kb_pipeline_auto",
        "n_docs": N_DOCS,
        "n_rows": N_ROWS,
        "ngram_dim": NGRAM_DIM,
    }

    # ---- phase 1: ingest
    spark = session()
    from ondine_spark.knowledge.store import KnowledgeStore

    t0 = time.monotonic()
    KnowledgeStore(spark, store_path, ngram_dim=NGRAM_DIM).ingest(
        _docs(spark), max_tokens=16
    )
    out["ingest_sec"] = round(time.monotonic() - t0, 1)
    store = KnowledgeStore(spark, store_path)  # bare reopen: sidecar dim
    assert store.ngram_dim == NGRAM_DIM, store.ngram_dim
    out["n_chunks"] = store.chunk_count()
    spark.stop()
    print(f"# ingest {out['ingest_sec']}s, {out['n_chunks']} chunks",
          file=sys.stderr, flush=True)

    # ---- phases 2+3: the same pipeline under both methods. The exact
    # arm is EXPECTED to die above the auto threshold (first run at
    # 20K rows x 200K chunks: the posting join + per-pair aggregation
    # spilled >70 GB and hit ENOSPC on a 76-GB-free disk) — record the
    # failure as the measurement instead of crashing the tool.
    arms = tuple(
        a for a in os.environ.get("KB_PIPE_ARMS", "exact,auto").split(",")
        if a
    )
    for method in arms:
        spark = session()
        try:
            # wall covers BUILD + count: result_frame construction runs
            # eager jobs (input persist, global index, chunk_count), so
            # timing only the count undercounts the user's experience
            t0 = time.monotonic()
            p = _pipeline(spark, store_path, method)
            frame = p.result_frame().select("uid", "answer", "_kb_count")
            n = frame.count()
            wall = round(time.monotonic() - t0, 1)
            from pyspark.sql import functions as F

            hits = frame.filter(F.col("_kb_count") > 0).count()
            plan = frame._jdf.queryExecution().executedPlan().toString()
            out[method] = {
                "wall_sec": wall,
                "rows": n,
                "rows_with_context": hits,
                "map_in_pandas_ops": plan.count("MapInPandas"),
            }
            print(f"# {method}: {wall}s, {hits}/{n} rows with context",
                  file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 — arm result, not tool bug
            out[method] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"# {method}: FAILED {out[method]['error'][:120]}",
                  file=sys.stderr, flush=True)
        finally:
            spark.stop()

    # routing evidence: auto == exact + 1 MapInPandas (the Arrow rescore).
    # When the exact arm died mid-join its plan still had the same shape
    # (0 extra kernels), so fall back to the smoke-scale invariant: the
    # auto plan must carry >=1 MapInPandas beyond the LLM client's.
    if (
        "exact" in out
        and "auto" in out
        and "error" not in out["exact"]
        and "error" not in out["auto"]
    ):
        out["auto_routed_to_lsh"] = (
            out["auto"]["map_in_pandas_ops"]
            == out["exact"]["map_in_pandas_ops"] + 1
        )
    else:
        out["auto_routed_to_lsh"] = (
            out.get("auto", {}).get("map_in_pandas_ops", 0) >= 2
        )

    # ---- phase 4: contract agreement on a sample
    spark = session()
    from pyspark.sql import functions as F

    from ondine_spark.knowledge.retrieval import attach_context
    from ondine_spark.knowledge.store import KnowledgeStore

    store = KnowledgeStore(spark, store_path)
    step = max(1, N_ROWS // SAMPLE_Q)
    sample = _rows(spark).filter(F.col("uid") % step == 0)
    sides = {}
    for method in ("exact", "lsh"):
        sides[method] = {
            r["uid"]: r["_kb_context"].split("\n")[0] if r["_kb_context"] else None
            for r in attach_context(
                sample.withColumnRenamed("uid", "_row_id"),
                store, ["q"], top_k=1, method=method,
            ).select(F.col("_row_id").alias("uid"), "_kb_context").collect()
        }
    keys = sorted(sides["exact"])
    agree = sum(1 for k in keys if sides["exact"][k] == sides["lsh"][k])
    out["sample_q"] = len(keys)
    out["top1_agreement"] = round(agree / max(len(keys), 1), 4)
    spark.stop()

    out["ts"] = time.time()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = os.path.join(repo, "benchmarks", "KB_PIPELINE_AUTO.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
