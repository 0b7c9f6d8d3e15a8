"""Plan hygiene audit: assert the physical-plan properties the engine's
scale story depends on, from the actual Catalyst output.

Checks (each is a claim from README's design table):
- input scan: equality filters PUSHED to parquet, ReadSchema pruned to
  the referenced columns only
- batched spine: exactly ONE exchange (on batch id) before the LLM stage,
  responses joined back via BroadcastHashJoin
- dedup/jaccard: no CartesianProduct / BroadcastNestedLoopJoin anywhere
- retrieval: inverted-index joins only (no crossJoin against the corpus)

Usage: python tools/plan_audit.py [sf_dir]   (prints PASS/FAIL per check)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("plan_audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from ondine_spark import PipelineBuilder, mock_client_factory

    failures = []

    def check(name, ok, detail=""):
        print(f"{'PASS' if ok else 'FAIL'} {name}" + (f" — {detail}" if detail else ""))
        if not ok:
            failures.append(name)

    # 1. scan pushdown + pruning
    p = (
        PipelineBuilder(spark)
        .from_parquet(f"{sf_dir}/documents.parquet", ["text"], id_column="doc_id")
        .with_filters({"lang": "en"})
        .with_prompt("Classify: {text}", ["sentiment"])
        .with_custom_llm_client(mock_client_factory())
        .build()
    )
    plan = plan_of(p.input_frame())
    check("scan.filter_pushdown", "EqualTo(lang,en)" in plan)
    rs = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = set(re.findall(r"(\w+):", rs.group(1))) if rs else set()
    check("scan.column_pruning", cols == {"doc_id", "text", "lang"},
          f"read columns: {sorted(cols)}")

    # 2. batched spine shape
    pb = (
        PipelineBuilder(spark)
        .from_parquet(f"{sf_dir}/documents.parquet", ["text"], id_column="doc_id")
        .with_prompt("Classify: {text}", ["sentiment"])
        .with_custom_llm_client(mock_client_factory())
        .with_batch_size(25)
        .build()
    )
    plan = plan_of(pb.result_frame())
    # formatted output lists each node once in the tree and once in the
    # details section — count the "(N) Exchange" detail headers only
    n_exchange = len(re.findall(r"\(\d+\) Exchange\b", plan))
    check("batch.single_shuffle", n_exchange == 1,
          f"{n_exchange} non-broadcast exchanges")
    check("batch.broadcast_result_join", "BroadcastHashJoin" in plan)
    check("batch.partial_agg", "ObjectHashAggregate" in plan)

    # 3. no cartesian products in pair-dedup
    from ondine_spark.operators.dedup import (
        connected_components,
        embedding_neardup_pairs,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    lsh = minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=8, bands=4)
    for name, frame in [
        ("jaccard", ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5)),
        ("jaccard_lowt", ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.05)),
        ("simhash", simhash_pairs(docs, "doc_id", "text")),
        ("emb_neardup", embedding_neardup_pairs(emb, "vec_id", "embedding")),
        # driver_threshold=0 forces the distributed star-rounds path —
        # that's the plan whose hygiene matters at scale
        ("components", connected_components(lsh, max_iter=2, driver_threshold=0)),
    ]:
        plan = plan_of(frame)
        bad = ("CartesianProduct" in plan) or ("BroadcastNestedLoopJoin" in plan)
        check(f"dedup.{name}.no_cartesian", not bad)

    # 3a. round-3 kernel shapes: the pair enumerators run as per-bucket
    # Arrow kernels with first-bucket ownership — their plans must carry
    # NO pair self-join and NO pair-dedup aggregate after the kernel
    # (regressing to join-then-dedup is the scale-killer the sf1 skew
    # probe caught: 50M duplicate emissions for 11M true pairs)
    plan = plan_of(lsh)
    check(
        "dedup.lsh_pairs.kernel_no_selfjoin",
        ("FlatMapGroupsInPandas" in plan or "MapInPandas" in plan)
        and "SortMergeJoin" not in plan
        and "BroadcastHashJoin" not in plan,
    )
    plan = plan_of(embedding_neardup_pairs(emb, "vec_id", "embedding"))
    check(
        "dedup.emb_neardup.kernel_no_selfjoin",
        "FlatMapGroupsInPandas" in plan and "Join" not in plan,
    )
    plan = plan_of(simhash_pairs(docs, "doc_id", "text"))
    # one shuffle exchange (the signature aggregation feeding the cached
    # blocks frame); the block self-join broadcasts, and first-block
    # ownership lives in the join condition (shiftright/bit_count) so no
    # pair-dedup aggregate follows
    check(
        "dedup.simhash.no_pair_dedup",
        len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1
        and "bit_count" in plan
        and "shiftright" in plan,
    )

    # 3b. curation plan shapes: sessionize's two windows share ONE
    # exchange; stratified sampling is a pure filter (zero exchanges,
    # reaches the scan as a data filter)
    from ondine_spark.operators.curation import (
        session_stats,
        stratified_hash_sample,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes)["ts"] in ("bigint", "long"):
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    plan = plan_of(
        session_stats(ev, "user_id", "ts", 1800, ("event_id",), "value")
    )
    n_exchange = len(re.findall(r"\(\d+\) Exchange\b", plan))
    check("curation.sessions.single_shuffle", n_exchange == 1,
          f"{n_exchange} exchanges")

    plan = plan_of(
        stratified_hash_sample(docs, "doc_id", "lang", {"en": 0.5}, 0.1)
    )
    n_exchange = len(re.findall(r"\(\d+\) Exchange\b", plan))
    check("curation.sample.zero_shuffle", n_exchange == 0,
          f"{n_exchange} exchanges")

    # 3c. paragraph dedup: no broadcast of corpus-derived sets (the
    # first-occurrence window + reassembly are hash-partitioned joins),
    # and no cartesian anywhere
    from ondine_spark.operators.curation import dedup_paragraphs

    plan = plan_of(dedup_paragraphs(docs, "doc_id", "text"))
    check("curation.para_dedup.no_cartesian",
          "CartesianProduct" not in plan
          and "BroadcastNestedLoopJoin" not in plan)

    # 4. retrieval is a key join, not a crossJoin
    import tempfile

    from ondine_spark.knowledge import KnowledgeStore, attach_context

    store = KnowledgeStore(spark, tempfile.mkdtemp())
    store.ingest(docs.limit(50), "doc_id", "text", max_tokens=32)
    rows = docs.limit(10).select(
        F.col("doc_id").alias("_row_id"), F.col("text").alias("q")
    )
    plan = plan_of(attach_context(rows, store, ["q"], top_k=2))
    check("retrieval.no_cartesian",
          "CartesianProduct" not in plan
          and "BroadcastNestedLoopJoin" not in plan)

    # 5. IVF probe: broadcast hash join on the cell id with NO corpus
    # repartition bought for it — the only exchange in the probe plan is
    # the final per-query ranking window (a forced repartition("_cell")
    # was removed in round 3: a broadcast join needs no co-location)
    from ondine_spark.operators.similarity_search import (
        ivf_topk,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    cents = train_ivf_centroids(emb, nlist=4)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    plan = plan_of(ivf_topk(emb, queries, k=3, centroids=cents, nprobe=4))
    n_exchange = len(re.findall(r"\(\d+\) Exchange\b", plan))
    # r8: spread_small adds ONE RoundRobin input-widening exchange before
    # the per-row scoring stage (local single-file inputs would otherwise
    # score on one core); the corpus must still never be KEY-shuffled —
    # the only keyed exchange allowed is the per-query rank window's
    n_keyed = len(re.findall(r"(hashpartitioning|rangepartitioning)", plan))
    check("ann.ivf_probe.broadcast_no_repartition",
          "BroadcastHashJoin" in plan and n_exchange <= 2 and n_keyed <= 1,
          f"{n_exchange} exchanges, {n_keyed} keyed")

    # 6. timestamp hygiene: the validity-window quarantine is a plain
    # range predicate, so it must reach the parquet scan as PushedFilters
    # (quarantining 100 TB at load costs a scan predicate, not a pass)
    from ondine_spark.operators.curation import filter_valid_timestamps

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = plan_of(filter_valid_timestamps(ev, "ts").select("event_id", "ts"))
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    check("hygiene.ts_filter_pushdown",
          pushed is not None and "GreaterThanOrEqual(ts" in pushed.group(1)
          and "LessThan(ts" in pushed.group(1),
          (pushed.group(1)[:100] if pushed else "no PushedFilters"))

    # 7. PQ path (r4 gate pq_codes_adc): the encode is a zero-exchange
    # Arrow pass, and the ADC scoring plan never cross-joins the corpus
    # (queries ship in the UDF closure; the ranking shuffle carries the
    # prereduced rows only)
    from ondine_spark.operators.product_quantization import pq_encode, pq_topk

    books4 = [[[0.1 * (c + j + d) for d in range(16)] for c in range(4)]
              for j in range(4)]
    coded = pq_encode(emb, "embedding", books4)
    plan = plan_of(coded)
    n_exchange = len(re.findall(r"\(\d+\) Exchange\b", plan))
    check("pq.encode.zero_shuffle", n_exchange == 0, f"{n_exchange} exchanges")
    plan = plan_of(pq_topk(coded, queries, k=3, codebooks=books4))
    check("pq.adc.no_cartesian",
          "CartesianProduct" not in plan
          and "BroadcastNestedLoopJoin" not in plan)

    # 8. BPE word-type counting (r4 gate bpe_word_tokens): the shuffle
    # carries word TYPES with a map-side partial aggregate, and the scan
    # reads only the text column
    from ondine_spark.operators.tokenizer import word_counts

    docs_raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = plan_of(word_counts(docs_raw, "text", pretokenizer="whitespace"))
    read = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in read.group(1).split(",")} if read else set()
    check("bpe.word_counts.partial_agg", "partial_count" in plan
          or "HashAggregate" in plan)
    check("bpe.word_counts.text_only_scan", cols == {"text"}, str(cols))

    # 9. quality classifier scoring (r4 gate quality_margin): tokenize →
    # murmur3-hash featurization stays JVM; the integer-margin fold is
    # ONE vectorized Arrow kernel (r8 — the dense interpreted fold was
    # ~1.3 s at sf0.1). No keyed shuffle; spread_small may add one
    # RoundRobin input-widening exchange.
    from ondine_spark.operators.quality_classifier import linear_margin

    plan = plan_of(
        linear_margin(
            docs_raw.select("doc_id", "text"), "text",
            [1] * 512, 0, num_features=256,
        )
    )
    n_exchange = len(re.findall(r"\(\d+\) Exchange\b", plan))
    n_keyed = len(re.findall(r"(hashpartitioning|rangepartitioning)", plan))
    check("quality.margin.zero_shuffle",
          n_keyed == 0 and n_exchange <= 1,
          f"{n_exchange} exchanges, {n_keyed} keyed")
    n_aep = len(re.findall(r"\(\d+\) ArrowEvalPython", plan))
    check("quality.margin.one_arrow_kernel",
          "BatchEvalPython" not in plan and "MapInPandas" not in plan
          and n_aep == 1,
          f"{n_aep} ArrowEvalPython")

    # 10. DSIR importance scoring (r5, gated inside sample_mix): like the
    # classifier margin, the weight projection must be zero-shuffle pure
    # JVM; the resample top-n must be a TakeOrdered (per-partition limit
    # pushed down), not a global Sort + collect
    from ondine_spark.operators.importance import dsir_resample, dsir_weights

    w = dsir_weights(
        docs_raw.select("doc_id", "text"), [1] * 256, "text",
        num_features=256, use_bigrams=False,
    )
    plan = plan_of(w)
    # r8: the weight projection stays pure JVM with ZERO keyed shuffles;
    # spread_small may add one RoundRobin input-widening exchange (local
    # single-file scans would otherwise fold every row on one core)
    n_keyed = len(re.findall(r"(hashpartitioning|rangepartitioning)", plan))
    n_exchange = len(re.findall(r"\(\d+\) Exchange\b", plan))
    check("dsir.weights.zero_shuffle", n_keyed == 0 and n_exchange <= 1,
          f"{n_exchange} exchanges, {n_keyed} keyed")
    # r8: the literal-mode fold is ONE vectorized Arrow kernel over the
    # JVM-computed bucket ids (was a per-token interpreted aggregate);
    # no row-at-a-time Python, no MapInPandas cardinality change
    n_aep = len(re.findall(r"\(\d+\) ArrowEvalPython", plan))
    check("dsir.weights.one_arrow_kernel",
          "BatchEvalPython" not in plan and "MapInPandas" not in plan
          and n_aep == 1,
          f"{n_aep} ArrowEvalPython")
    plan = plan_of(dsir_resample(w, "doc_id", "dsir_w_q", 10))
    check("dsir.resample.take_ordered", "TakeOrderedAndProject" in plan,
          "global sort instead of per-partition top-n")

    # training-shard export (r6): exactly ONE exchange (the window's
    # hash partitioning by shard — the data movement a shard export IS),
    # all-JVM, no global sort
    from ondine_spark.operators.curation import shard_for_training

    plan = plan_of(shard_for_training(docs_raw.select("doc_id"), 8))
    n_exchange = len(re.findall(r"\(\d+\) Exchange\b", plan))
    check("shards.one_exchange", n_exchange == 1, f"{n_exchange} exchanges")
    check("shards.jvm_only",
          "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
          and "MapInPandas" not in plan)
    check("shards.no_global_sort",
          not re.search(r"\(\d+\) Sort\b.*global=true", plan))

    # KB retrieval via LSH candidates (r7, verdict #4): the rows x chunks
    # retrieval must stay equi-join shaped — signature generation is one
    # groupBy per side, candidates come from a (band, key) hash join,
    # rescoring joins are bounded by candidates. No cartesian/BNLJ, no
    # Python.
    import tempfile

    from ondine_spark.knowledge.retrieval import retrieve_topk_lsh
    from ondine_spark.knowledge.store import KnowledgeStore

    kb_dir = tempfile.mkdtemp(prefix="plan_audit_kb_")
    store = KnowledgeStore(spark, os.path.join(kb_dir, "store"))
    store.ingest(
        docs_raw.select("doc_id", "text").limit(50), max_tokens=32
    )
    rows_q = docs_raw.select(
        F.col("doc_id").cast("string").alias("_row_id"),
        F.col("text").alias("q"),
    ).limit(20)
    plan = plan_of(retrieve_topk_lsh(rows_q, store, ["q"], top_k=3))
    check("kb_lsh.no_cartesian",
          "CartesianProduct" not in plan
          and "BroadcastNestedLoopJoin" not in plan)
    # signature generation and the candidate join stay JVM-side; the
    # only Python is the Arrow merge-dot rescore kernel (one MapInPandas
    # over the bounded candidate set — O(|q| log |c|) per pair; the JVM
    # higher-order-expression alternative is O(|q|·|c|) interpreted and
    # pinned the CPU at 500K×1M). Row-at-a-time Python stays banned.
    check("kb_lsh.no_row_python", "BatchEvalPython" not in plan)
    # formatted plans list each node twice (tree + detail section), so
    # count tree nodes only
    n_mip = len(re.findall(r"\(\d+\) MapInPandas", plan))
    check("kb_lsh.one_arrow_kernel", n_mip == 1, f"{n_mip} MapInPandas")
    # the chunk-side postings join on (band, key) is a real equi-join
    check("kb_lsh.equi_join",
          "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
          or "BroadcastHashJoin" in plan)

    # r8 (verdict #3): the scale path must be reachable from the PRODUCT
    # surface — with_knowledge_base(method="lsh") routes attach_context
    # through the LSH candidate join, visible as the one extra Arrow
    # rescore kernel relative to method="exact" in the same pipeline.
    def kb_pipeline_plan(method):
        p = (
            PipelineBuilder(spark)
            .from_dataframe(
                rows_q.withColumnRenamed("_row_id", "qid"),
                ["q"], id_column="qid",
            )
            .with_prompt("Answer: {q}", ["answer"])
            .with_custom_llm_client(mock_client_factory)
            .with_knowledge_base(store.path, ["q"], top_k=2, method=method)
            .build()
        )
        return plan_of(p.response_frame(resume=False))

    # r8: node counts no longer discriminate (the exact path carries its
    # own dense kernel below DENSE_AUTO_BYTES) — check kernel NAMES: the
    # LSH rescore kernel only in the lsh plan, the dense exact kernel in
    # the exact plan
    plan_lsh, plan_exact = kb_pipeline_plan("lsh"), kb_pipeline_plan("exact")
    check("kb_lsh.pipeline",
          "_merge_dot" in plan_lsh and "_merge_dot" not in plan_exact
          and "_score_batches" in plan_exact,
          "lsh/exact kernels not routed as expected")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
