"""R3 at scale (r6 verdict #4): LSH-candidate retrieval must match the
exact inverted-index retrieval on scores and hit most of its top-k —
recall < 1 only from band-collision misses, never from scoring drift.

Scale evidence (500K rows x 1M chunks) lives in
tools/kb_lsh_scale.py -> benchmarks/KB_LSH_500K.json; these tests pin
semantics at a size the suite can afford.
"""

import sys

import pytest
from pyspark import cloudpickle
from pyspark.sql import functions as F

from ondine_spark.knowledge.retrieval import (
    attach_context,
    retrieve_topk,
    retrieve_topk_lsh,
)
from ondine_spark.knowledge.store import KnowledgeStore

# test modules aren't importable on executors — ship closures by value
cloudpickle.register_pickle_by_value(sys.modules[__name__])


WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango",
]


def _text(i: int, salt: str = "") -> str:
    # 12 deterministic pseudo-random words per doc; distinct docs share
    # few ngrams, so the true nearest chunk for a near-copy query is its
    # source chunk
    out = []
    x = i * 2654435761 % (1 << 32)
    for k in range(12):
        x = (x * 1103515245 + 12345 + k) % (1 << 31)
        out.append(WORDS[x % len(WORDS)] + str(x % 97))
    return " ".join(out) + salt


@pytest.fixture(scope="module")
def kb(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("kb_lsh") / "store")
    docs = spark.createDataFrame(
        [(i, _text(i)) for i in range(400)], ["doc_id", "text"]
    )
    store = KnowledgeStore(spark, path, ngram_dim=2048)
    store.ingest(docs, max_tokens=64)
    return store


def test_lsh_scores_are_exact_on_shared_pairs(spark, kb):
    """Every (row, chunk) pair surfaced by BOTH paths carries the SAME
    cosine — LSH changes candidate generation, not scoring."""
    rows = spark.createDataFrame(
        [(f"q{i}", _text(i * 7 % 400)) for i in range(40)], ["_row_id", "q"]
    )
    exact = retrieve_topk(rows, kb, ["q"], top_k=5).select(
        "_row_id", "chunk_id", "score"
    )
    lsh = retrieve_topk_lsh(
        rows, kb, ["q"], top_k=5, n_planes=64, n_bands=8
    ).select("_row_id", "chunk_id", F.col("score").alias("lsh_score"))
    both = exact.join(lsh, on=["_row_id", "chunk_id"])
    n_both = both.count()
    assert n_both > 0
    drift = both.filter(
        F.abs(F.col("score") - F.col("lsh_score")) > 1e-9
    ).count()
    assert drift == 0, f"{drift}/{n_both} pairs scored differently"


def test_lsh_recall_at_top1(spark, kb):
    """Queries that are near-copies of a chunk's text: the LSH path must
    recover the exact path's top-1 for >= 90% of queries at 64 planes /
    8 bands (near-identical vectors agree on almost every hyperplane, so
    band collision probability is ~1)."""
    rows = spark.createDataFrame(
        [(f"q{i}", _text(i, salt=" zz9")) for i in range(100)],
        ["_row_id", "q"],
    )
    top1 = {
        r["_row_id"]: r["chunk_id"]
        for r in retrieve_topk(rows, kb, ["q"], top_k=1).collect()
    }
    lsh1 = {
        r["_row_id"]: r["chunk_id"]
        for r in retrieve_topk_lsh(rows, kb, ["q"], top_k=1).collect()
    }
    assert len(top1) == 100
    hits = sum(1 for k, v in top1.items() if lsh1.get(k) == v)
    assert hits >= 90, f"top-1 recall {hits}/100"


def test_lsh_hot_bucket_cap_bounds_candidates(spark, kb):
    """max_bucket=1 drops every multi-chunk (band, key) posting: the
    operator still runs and returns only candidates from singleton
    buckets — the worst-case candidate bound n_bands x max_bucket."""
    rows = spark.createDataFrame(
        [(f"q{i}", _text(i)) for i in range(10)], ["_row_id", "q"]
    )
    out = retrieve_topk_lsh(rows, kb, ["q"], top_k=3, max_bucket=1)
    # every returned score is a true cosine in (0, 1]
    bad = out.filter((F.col("score") <= 0) | (F.col("score") > 1.0 + 1e-9))
    assert bad.count() == 0


def test_lsh_plan_no_cartesian(spark, kb):
    rows = spark.createDataFrame(
        [(f"q{i}", _text(i)) for i in range(5)], ["_row_id", "q"]
    )
    plan = (
        retrieve_topk_lsh(rows, kb, ["q"], top_k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_min_band_matches_filters_but_keeps_near_copies(spark, kb):
    """min_band_matches=2: near-copy queries still recover their source
    chunk (near-identical signatures collide on ~all bands), and the
    returned candidate set is a subset of the 1-band candidate set."""
    rows = spark.createDataFrame(
        [(f"q{i}", _text(i, salt=" zz9")) for i in range(50)],
        ["_row_id", "q"],
    )
    one = retrieve_topk_lsh(rows, kb, ["q"], top_k=1)
    two = retrieve_topk_lsh(rows, kb, ["q"], top_k=1, min_band_matches=2)
    top1 = {r["_row_id"]: r["chunk_id"] for r in one.collect()}
    top2 = {r["_row_id"]: r["chunk_id"] for r in two.collect()}
    hits = sum(1 for k, v in top1.items() if top2.get(k) == v)
    assert hits >= 45, f"2-band top-1 kept {hits}/50 of 1-band top-1"
    # candidate subset property: every (row, chunk) surfaced at 2 bands
    # must also surface at 1 band
    pairs2 = {(r["_row_id"], r["chunk_id"]) for r in retrieve_topk_lsh(
        rows, kb, ["q"], top_k=5, min_band_matches=2).collect()}
    # top-5 re-ranking can differ when 2-band drops high-rank chunks, so
    # compare against the 1-band CANDIDATE superset via top_k large
    pairs1_all = {(r["_row_id"], r["chunk_id"]) for r in retrieve_topk_lsh(
        rows, kb, ["q"], top_k=1000).collect()}
    assert pairs2 <= pairs1_all


# ---------------------------------------------------------------- r8: the
# scale path is now reachable from the product surface (round-7 verdict
# #3): attach_context(method=...) dispatches, "auto" routes by corpus
# size, and with_knowledge_base plumbs it through a real pipeline plan.


def test_lsh_no_zero_dot_pairs(spark, kb):
    """LSH candidates that share NO ngram bucket with the query (pure
    band collisions) must be dropped, not returned as score-0 rows — the
    exact path's inner join on bucket can never surface them (r7
    ADVICE)."""
    rows = spark.createDataFrame(
        [(f"q{i}", _text(i)) for i in range(30)], ["_row_id", "q"]
    )
    out = retrieve_topk_lsh(rows, kb, ["q"], top_k=1000)
    assert out.filter(F.col("score") <= 0).count() == 0


def test_chunk_count_memoized_metadata_read(spark, kb):
    """chunk_count() == chunks().count(), served from parquet footers and
    memoized (repeat calls don't launch Spark jobs)."""
    expected = kb.chunks().count()
    kb._chunk_count = None
    assert kb.chunk_count() == expected
    assert kb._chunk_count == expected  # memoized
    assert kb.chunk_count() == expected


def test_attach_context_method_dispatch_parity(spark, kb):
    """Exact-copy queries: identical ngram vectors give identical
    hyperplane signatures, so every band collides and LSH recall is
    exactly 1.0 — method="lsh" must equal method="exact" row for row."""
    rows = spark.createDataFrame(
        [(f"q{i}", _text(i * 3 % 400)) for i in range(40)], ["_row_id", "q"]
    )
    exact = {
        r["_row_id"]: (r["_kb_context"], r["_evidence_count"])
        for r in attach_context(rows, kb, ["q"], top_k=1, method="exact").collect()
    }
    lsh = {
        r["_row_id"]: (r["_kb_context"], r["_evidence_count"])
        for r in attach_context(rows, kb, ["q"], top_k=1, method="lsh").collect()
    }
    assert len(exact) == 40
    assert exact == lsh


def test_attach_context_auto_routes_by_corpus_size(spark, kb):
    """auto → exact below LSH_AUTO_THRESHOLD (no Arrow rescore kernel in
    the plan), auto → lsh above it (kernel present). The threshold read
    is the memoized metadata count, so faking _chunk_count exercises the
    routing without a 100K-chunk ingest."""
    rows = spark.createDataFrame(
        [(f"q{i}", _text(i)) for i in range(5)], ["_row_id", "q"]
    )

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    small = plan(attach_context(rows, kb, ["q"], top_k=2, method="auto"))
    # 400 chunks → exact path; broadcast-sized corpus → its dense kernel
    # (r8), never the LSH rescore kernel
    assert "_merge_dot" not in small
    assert "_score_batches" in small
    try:
        kb._chunk_count = 200_000
        big = plan(attach_context(rows, kb, ["q"], top_k=2, method="auto"))
        assert "_merge_dot" in big  # forced over threshold → LSH rescore
        assert "_score_batches" not in big
    finally:
        kb._chunk_count = None
    with pytest.raises(ValueError, match="auto|exact|lsh"):
        attach_context(rows, kb, ["q"], method="nope")


def _identity_client_factory():
    class IdentityClient:
        def complete(self, prompt, system=None):
            from ondine_spark.llm.client import LLMResult

            text = "no-context"
            if prompt.startswith("Context:\n"):
                text = prompt.split("\n")[1][:40]
            return LLMResult(
                text=text, tokens_in=len(prompt.split()), tokens_out=4,
                model="id", cost="0.000001", latency_ms=0.1,
            )

    return IdentityClient()


def test_pipeline_kb_method_lsh(spark, kb):
    """with_knowledge_base(method="lsh") through PipelineBuilder: the
    response plan carries the LSH Arrow rescore kernel (scale path
    reachable from the product surface), and execution attaches the
    right chunk as context for exact-copy questions."""
    from ondine_spark import PipelineBuilder

    rows = spark.createDataFrame(
        [(f"q{i}", _text(i * 11 % 400)) for i in range(10)],
        ["qid", "question"],
    )

    def build(method):
        return (
            PipelineBuilder(spark)
            .from_dataframe(rows, ["question"], id_column="qid")
            .with_prompt("Answer: {question}", ["answer"])
            .with_custom_llm_client(_identity_client_factory)
            .with_knowledge_base(
                kb.path, ["question"], top_k=1, method=method
            )
            .build()
        )

    plan_lsh = (
        build("lsh").response_frame(resume=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    plan_exact = (
        build("exact").response_frame(resume=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # differential by kernel name (r8: the exact path legitimately
    # carries its own dense MapInPandas below DENSE_AUTO_BYTES, so node
    # counts no longer discriminate)
    assert "_merge_dot" in plan_lsh and "_merge_dot" not in plan_exact
    assert "_score_batches" in plan_exact

    res = build("lsh").execute()
    got = {r["qid"]: r["answer"] for r in res.data.collect()}
    assert len(got) == 10
    # every exact-copy question retrieved its source chunk as context
    for i in range(10):
        expected = _text(i * 11 % 400)[:40]
        assert got[f"q{i}"] == expected, (i, got[f"q{i}"], expected)

    with pytest.raises(ValueError, match="auto|exact|lsh"):
        PipelineBuilder(spark).with_knowledge_base(kb.path, ["q"], method="x")


def test_dense_impl_bit_identical_to_join(spark, kb):
    """retrieve_topk(impl='dense') — the r8 broadcast-matrix Arrow kernel
    — must return the SAME rows as impl='join': identical (row, chunk)
    sets, bit-identical float64 scores, identical ranks (score desc,
    chunk_id asc, ties included), for full retrieval and for a real
    top_k/min_score cut."""
    rows = spark.createDataFrame(
        [(f"q{i}", _text(i * 7 % 400) + (" extra" if i % 3 else ""))
         for i in range(60)],
        ["_row_id", "q"],
    )
    for kwargs in ({"top_k": 10 ** 6, "min_score": 0.0},
                   {"top_k": 3, "min_score": 0.05}):
        cols = ["_row_id", "chunk_id", "score", "rank"]
        j = sorted(
            (r["_row_id"], r["chunk_id"], r["score"], r["rank"])
            for r in retrieve_topk(
                rows, kb, ["q"], impl="join", **kwargs
            ).select(*cols).collect()
        )
        d = sorted(
            (r["_row_id"], r["chunk_id"], r["score"], r["rank"])
            for r in retrieve_topk(
                rows, kb, ["q"], impl="dense", **kwargs
            ).select(*cols).collect()
        )
        assert len(j) > 0
        assert j == d  # exact equality: float64 scores bit-identical


def test_dense_auto_threshold_routes_to_join(spark, kb):
    """auto falls back to the join shape when the chunk matrix would
    exceed DENSE_AUTO_BYTES (faked via the memoized count)."""
    rows = spark.createDataFrame([("q0", _text(3))], ["_row_id", "q"])

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    assert "_score_batches" in plan(retrieve_topk(rows, kb, ["q"]))
    try:
        kb._chunk_count = 10 ** 7  # 10M × 2048 × 8 B ≫ the 128 MiB budget
        assert "_score_batches" not in plan(retrieve_topk(rows, kb, ["q"]))
    finally:
        kb._chunk_count = None
