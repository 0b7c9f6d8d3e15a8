"""Bucketed tables: pre-shuffled storage for repeated co-located joins.

A join between two tables bucketed on the same key with the same bucket
count needs NO exchange at query time — each bucket pair joins in place
(the classic sort-merge-bucket pattern). For pipelines that repeatedly
join the same large tables (response cache ⋈ inputs, chunk stores,
embedding shards), paying one shuffle at WRITE time removes a shuffle
from every subsequent query. tests/test_bucketing.py asserts the
exchange-free plan from actual Catalyst output.

Reference analogue: none (single-process engine); this is Spark-native
scale infrastructure for the same workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 32,
    path: str | None = None,
    mode: str = "overwrite",
    sort: bool = True,
) -> None:
    """Write ``df`` as a parquet table bucketed (and by default sorted)
    by ``key``. ``buckets`` must MATCH across tables that will be joined
    — mismatched bucket counts fall back to a normal shuffled join."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog, so
    this must be ``spark.table``, not ``spark.read.parquet`` — a raw path
    read loses the bucketing and re-shuffles on join)."""
    return spark.table(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Catalyst
    plans a sort-merge join with zero exchanges."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on=on, how=how
    )
