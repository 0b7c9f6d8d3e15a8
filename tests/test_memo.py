"""Cross-run prompt-keyed response memoization (reference
with_disk_cache/with_redis_cache: identical requests = $0 cost).

The key observable is the API-call count: a second run whose prompts
half-overlap the first must issue exactly half the calls.
"""

import math
from decimal import Decimal

from ondine_spark import PipelineBuilder, mock_client_factory


def _build(spark, rows, memo_dir, count_file, **kw):
    b = (
        PipelineBuilder(spark)
        .from_dataframe(
            spark.createDataFrame(rows), ["review"], id_column="review_id"
        )
        .with_prompt("Classify the sentiment of this review: {review}", ["sentiment"])
        .with_custom_llm_client(mock_client_factory(count_file=count_file))
        .with_response_memo(memo_dir)
    )
    for k, v in kw.items():
        getattr(b, f"with_{k}")(v)
    return b.build()


def _rows(lo, hi):
    return [
        {"review_id": f"r{i}", "review": f"review number {i} is great"}
        for i in range(lo, hi)
    ]


def _calls(count_file):
    try:
        with open(count_file) as fh:
            return sum(1 for _ in fh)
    except FileNotFoundError:
        return 0


def test_memo_half_overlap_halves_calls(spark, tmp_path):
    memo = str(tmp_path / "memo")
    cf = str(tmp_path / "calls.txt")
    res1 = _build(spark, _rows(0, 10), memo, cf).execute()
    assert res1.api_calls == 10
    assert _calls(cf) == 10
    assert res1.stats.total_cost > Decimal(0)

    # second run: rows 5-14 — 5 prompts already memoized, 5 fresh
    res2 = _build(spark, _rows(5, 15), memo, cf).execute()
    assert res2.api_calls == 5, "memo hits must not reach the provider"
    assert _calls(cf) == 15
    rows = {r["review_id"]: r["sentiment"] for r in res2.data.collect()}
    assert len(rows) == 10
    assert all(v == "positive" for v in rows.values())

    # third run: full overlap — zero provider calls, zero cost
    res3 = _build(spark, _rows(5, 15), memo, cf).execute()
    assert res3.api_calls == 0
    assert _calls(cf) == 15
    assert res3.stats.total_cost == Decimal(0)
    assert res3.quality.valid_rows == 10


def test_memo_dedupes_identical_prompts_within_run(spark, tmp_path):
    memo = str(tmp_path / "memo")
    cf = str(tmp_path / "calls.txt")
    rows = [
        {"review_id": f"r{i}", "review": f"text {i % 3} is great"}
        for i in range(12)
    ]
    res = _build(spark, rows, memo, cf).execute()
    # 12 rows, 3 distinct prompts -> 3 calls; every row still answered
    assert res.api_calls == 3
    assert _calls(cf) == 3
    assert res.quality.valid_rows == 12
    # cost charged once per distinct call, not per row
    per_call = Decimal(res.stats.total_cost) / 3
    assert per_call > 0


def test_memo_batched_mode(spark, tmp_path):
    """Memoization works at mega-batch granularity: an identical rerun
    reuses every batch response."""
    memo = str(tmp_path / "memo")
    cf = str(tmp_path / "calls.txt")
    res1 = _build(spark, _rows(0, 12), memo, cf, batch_size=4).execute()
    assert res1.api_calls == math.ceil(12 / 4)
    res2 = _build(spark, _rows(0, 12), memo, cf, batch_size=4).execute()
    assert res2.api_calls == 0, "identical batches must hit the memo"
    assert _calls(cf) == 3
    rows = {r["review_id"]: r["sentiment"] for r in res2.data.collect()}
    assert len(rows) == 12 and all(v == "positive" for v in rows.values())


def test_memo_failed_rows_not_memoized(spark, tmp_path):
    """Failures are never written to the memo — a rerun retries them."""
    from ondine_spark.llm.memo import read_memo

    memo = str(tmp_path / "memo")
    cf = str(tmp_path / "calls.txt")
    b = (
        PipelineBuilder(spark)
        .from_dataframe(
            spark.createDataFrame(
                [{"review_id": "r0", "review": "BOOM now"},
                 {"review_id": "r1", "review": "all great"}]
            ),
            ["review"], id_column="review_id",
        )
        .with_prompt("Classify: {review}", ["sentiment"])
        .with_custom_llm_client(
            mock_client_factory(count_file=cf, crash_on="BOOM")
        )
        .with_error_policy("skip")
        .with_response_memo(memo)
    )
    b.build().execute()
    memo_df = read_memo(spark, memo)
    assert memo_df is not None and memo_df.count() == 1


def test_memo_across_chunks(spark, tmp_path):
    """The chunked runner flushes the memo per committed chunk, so later
    chunks of the SAME run hit it for prompts already answered."""
    from ondine_spark.streaming.runner import execute_chunked

    memo = str(tmp_path / "memo")
    cf = str(tmp_path / "calls.txt")
    # 20 rows, 4 distinct prompts; chunk_size 10 -> chunk 2's prompts are
    # all already in the memo after chunk 1's flush
    rows = [
        {"review_id": f"r{i:02d}", "review": f"text {i % 4} is great"}
        for i in range(20)
    ]
    p = (
        PipelineBuilder(spark)
        .from_dataframe(spark.createDataFrame(rows), ["review"], id_column="review_id")
        .with_prompt("Classify: {review}", ["sentiment"])
        .with_custom_llm_client(mock_client_factory(count_file=cf))
        .with_response_memo(memo)
        .with_checkpoint_dir(str(tmp_path / "ckpt"), "memo-chunks")
        .build()
    )
    summary = execute_chunked(p, chunk_size=10)
    assert summary.total_rows == 20
    # 4 distinct prompts total; intra-chunk dedup + cross-chunk memo means
    # exactly 4 provider calls for the whole run
    assert _calls(cf) == 4


def test_memo_at_mega_batch_granularity(spark, tmp_path):
    """Memo x mega-batch economics: the memo keys whatever hits the
    provider, so with batch_size=5 a second run whose BATCHES half-overlap
    the first must only invoke the fresh batches, at exactly the fresh
    batches' cost."""
    memo = str(tmp_path / "memo")
    cf = str(tmp_path / "calls.txt")
    res1 = _build(spark, _rows(0, 20), memo, cf, batch_size=5).execute()
    assert res1.api_calls == 4  # ceil(20/5)
    assert _calls(cf) == 4
    cost1 = res1.stats.total_cost
    assert cost1 > Decimal(0)

    # second run: rows 10-29 -> batches [10-14],[15-19] are byte-identical
    # aggregated prompts (memo hits), [20-24],[25-29] are fresh
    res2 = _build(spark, _rows(10, 30), memo, cf, batch_size=5).execute()
    assert res2.api_calls == 2, "overlapping batches must come from the memo"
    assert _calls(cf) == 6
    rows = {r["review_id"]: r["sentiment"] for r in res2.data.collect()}
    assert len(rows) == 20 and all(v == "positive" for v in rows.values())

    # third run, full overlap: zero calls, zero cost
    res3 = _build(spark, _rows(10, 30), memo, cf, batch_size=5).execute()
    assert res3.api_calls == 0
    assert _calls(cf) == 6
    assert res3.stats.total_cost == Decimal(0)
    assert res3.quality.valid_rows == 20
