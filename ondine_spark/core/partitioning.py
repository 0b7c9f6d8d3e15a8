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


# Skew-handling note (r9): the salted-aggregation helpers that lived here
# (with_salt / salted_agg / replicate_dim_join) were removed — they had
# zero call sites, and salted_agg was redundant by construction: Spark's
# hash aggregate already performs partial (map-side) aggregation for the
# sum/count/min/max aggregates it supported, so a hot key collapses to
# one partial row per map task without any salt. The operators that
# needed skew hardening (e.g. dup_ngram_fraction) use partially-
# aggregating groupBy shapes instead of windows; skewed JOIN partitions
# are handled by AQE (spark.sql.adaptive.skewJoin), and a broadcast-
# ineligible hot-key dim join, should one ever appear, is a ~10-line
# inline salt at the call site.
