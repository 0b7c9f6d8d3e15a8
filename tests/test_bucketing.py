"""Bucketed tables (sources/bucketing.py): the join between two tables
bucketed on the same key must plan with ZERO exchanges — that's the whole
point of paying the shuffle at write time. Asserted from the actual
physical plan, not assumed.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from ondine_spark.sources.bucketing import (
    bucketed_join,
    read_bucketed,
    save_bucketed,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def no_broadcast(spark):
    """Force SMJ so the exchange-free property is observable on tiny data."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    left = spark.range(1000).selectExpr("id AS k", "id * 2 AS v")
    right = spark.range(1000).selectExpr("id AS k", "id * 3 AS w")
    save_bucketed(left, "b_left", "k", buckets=4, path=str(tmp_path / "l"))
    save_bucketed(right, "b_right", "k", buckets=4, path=str(tmp_path / "r"))

    joined = bucketed_join(spark, "b_left", "b_right", on="k")
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 0, plan
    assert joined.count() == 1000

    # the same join on raw path reads (bucketing lost) DOES shuffle —
    # proves the assertion above is meaningful, not vacuous
    raw = spark.read.parquet(str(tmp_path / "l")).join(
        spark.read.parquet(str(tmp_path / "r")), on="k"
    )
    assert len(re.findall(r"\(\d+\) Exchange\b", _plan(raw))) > 0


def test_mismatched_buckets_still_correct(spark, tmp_path, no_broadcast):
    left = spark.range(100).selectExpr("id AS k", "id AS v")
    right = spark.range(100).selectExpr("id AS k", "id AS w")
    save_bucketed(left, "m_left", "k", buckets=4, path=str(tmp_path / "l2"))
    save_bucketed(right, "m_right", "k", buckets=8, path=str(tmp_path / "r2"))
    joined = bucketed_join(spark, "m_left", "m_right", on="k")
    assert joined.count() == 100  # falls back to a shuffled join, same rows
