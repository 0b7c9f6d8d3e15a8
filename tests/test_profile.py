"""profile_table (operators/quality.py): one-pass per-column stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ondine_spark.operators.quality import profile_table


def test_profile_counts_nulls_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, "a", 5.0), (4, None, 2.5)],
        "id: long, s: string, x: double",
    )
    rows = {r.column: r for r in profile_table(df).collect()}
    assert set(rows) == {"id", "s", "x"}
    assert all(r.n_rows == 4 for r in rows.values())
    assert rows["s"].n_nulls == 1 and rows["s"].n_distinct == 2
    assert rows["x"].n_nulls == 1 and rows["x"].n_distinct == 2
    assert rows["id"].min_val == "1" and rows["id"].max_val == "4"
    assert rows["s"].min_val == "a" and rows["s"].max_val == "b"


def test_profile_skips_non_atomic_and_approx_mode(spark):
    df = spark.createDataFrame(
        [(1, [1, 2]), (2, [3])], "id: long, arr: array<int>"
    )
    rows = profile_table(df).collect()
    assert [r.column for r in rows] == ["id"]
    approx = {r.column: r for r in profile_table(df, exact_distinct=False).collect()}
    assert approx["id"].n_distinct == 2  # HLL exact at this cardinality

    with pytest.raises(ValueError):
        profile_table(df.select("arr"))
