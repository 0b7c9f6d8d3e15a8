"""Partitioning helpers.

Local-mode parquet fixtures often arrive as ONE file = ONE partition, which
serializes CPU-bound operators (regex tokenize, md5 shingling, UDF batches).
``spread_small`` widens tiny inputs to the session's shuffle parallelism;
on a real cluster with many input splits it's a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def shuffle_partitions(df: DataFrame) -> int:
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))


def spread_small(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition when the input has fewer partitions than the
    target parallelism. One cheap shuffle of the (small) input buys full
    parallelism for every downstream CPU-bound stage."""
    target = min_partitions or shuffle_partitions(df)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
