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


# ----------------------------------------------------------- skew handling
# AQE (spark.sql.adaptive.skewJoin) re-splits skewed SORT-MERGE join
# partitions at runtime; these helpers cover the cases AQE doesn't:
# skewed AGGREGATION keys and broadcast-ineligible dim joins.

from pyspark.sql import Column  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SALT = "_salt"


def with_salt(df: DataFrame, n_salts: int = 16) -> DataFrame:
    """Random-but-deterministic salt from a row hash (no RNG state)."""
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(SALT, F.pmod(h, F.lit(n_salts)).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed keys: partial agg on
    (keys + salt) spreads a hot key over ``n_salts`` reducers; the final
    agg re-combines. ``aggs`` maps output name → RE-AGGREGABLE expression
    pair is handled by convention: sum/count/min/max only (partial name
    ``_p_<name>``)."""
    partial_exprs = []
    final_exprs = []
    for name, expr in aggs.items():
        fn = expr._jc.toString().split("(")[0].lower()
        partial_exprs.append(expr.alias(f"_p_{name}"))
        if fn.startswith("count"):
            final_exprs.append(F.sum(f"_p_{name}").alias(name))
        elif fn.startswith("min"):
            final_exprs.append(F.min(f"_p_{name}").alias(name))
        elif fn.startswith("max"):
            final_exprs.append(F.max(f"_p_{name}").alias(name))
        elif fn.startswith("sum"):
            final_exprs.append(F.sum(f"_p_{name}").alias(name))
        else:
            raise ValueError(
                f"salted_agg supports sum/count/min/max, got {fn!r}"
            )
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, SALT).agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def replicate_dim_join(
    skewed: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed fact ⋈ non-broadcastable dim: salt the fact side, replicate
    the dim side n_salts×, join on (key, salt) — a hot key spreads over
    n_salts tasks. (When the dim IS broadcastable, use F.broadcast and skip
    this.)"""
    f = skewed.withColumn(
        SALT, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int")
    )
    d = dim.crossJoin(
        F.broadcast(
            dim.sparkSession.range(n_salts).select(F.col("id").cast("int").alias(SALT))
        )
    )
    return f.join(d, on=[key, SALT], how=how).drop(SALT)
