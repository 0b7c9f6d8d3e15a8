"""Temporal joins Spark lacks as built-ins: as-of (point-in-time) and
range (interval-containment), both expressed without any non-equi join.

As-of: attach to each left row the most recent right row for the same
key with right_ts <= left_ts (backward direction).

The classic need: enrich events with the latest prior state (price at
trade time, last model version at request time, last purchase before a
pageview). Spark has no built-in as-of join; the naive encodings are a
non-equi range join (O(n·m) BroadcastNestedLoopJoin — unusable) or a
groupBy-collect merge in Python (driver-ish, unbounded memory per key).

This implementation uses the union + ordered-window pattern instead:
tag both sides, union them, sort each key's timeline once, and carry the
last-seen right payload forward with last(..., ignorenulls=True). Cost is
ONE shuffle on the key (the window sort), no join operator at all, and it
scales exactly like any windowed aggregation — 100 TB of events against
100 TB of state is fine as long as single keys fit a partition (skewed
keys: same AQE story as sessionize). DuckDB's native ASOF JOIN replays
the semantics for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: tuple[str, ...] | None = None,
    suffix: str = "_right",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join: every left row gains the payload of the latest
    right row with the same ``on`` key and ``right_ts`` <= ``left_ts``
    (NULLs when no such row). Right rows sharing (key, ts) are resolved to
    ONE row (greatest payload struct) first, so the result is
    deterministic on both engines.

    ``value_cols`` defaults to all right columns except the key and
    timestamp; each lands as ``<col><suffix>``. The matched timestamp
    itself is exposed as ``<right_ts><suffix>``. ``tolerance_seconds``
    additionally NULLs matches older than the window (pandas
    merge_asof-style tolerance).
    """
    if value_cols is None:
        value_cols = tuple(
            c for c in right.columns if c not in (on, right_ts)
        )

    payload = F.struct(
        F.col(right_ts).alias("_ts"), *[F.col(c) for c in value_cols]
    )
    # one deterministic right row per (key, ts): max payload struct —
    # map-side combinable, and mirrors the oracle's arg_max tiebreak
    r = (
        right.groupBy(F.col(on).alias(on), F.col(right_ts).alias("_ats"))
        .agg(F.max(payload).alias("_p"))
        .select(on, "_ats", "_p")
    )
    l_tag = left.select(
        F.col(on).alias(on),
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
    )
    r_tag = r.select(
        on,
        "_ats",
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        "_p",
    )
    # right sorts before left at equal ts (_side 0 < 1) => inclusive match
    w = (
        Window.partitionBy(on)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        l_tag.unionByName(r_tag)
        .withColumn("_match", F.last("_p", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    if tolerance_seconds is not None:
        in_window = (
            F.unix_timestamp(F.col("_ats"))
            - F.unix_timestamp(F.col("_match._ts"))
            <= tolerance_seconds
        )
        merged = merged.withColumn(
            "_match", F.when(in_window, F.col("_match"))
        )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("_match._ts").alias(f"{right_ts}{suffix}"))
    out_cols.extend(
        F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in value_cols
    )
    return merged.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    on: str | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval-containment join: every (left row, right row) pair with
    ``right_start`` <= ``left_ts`` <= ``right_end`` (inclusive), optionally
    also matching on an equality key ``on``.

    Spark plans a raw ``BETWEEN`` join predicate as a nested-loop join —
    quadratic, unusable beyond toy sizes. This instead buckets time into
    ``bucket_seconds``-wide cells: each interval is exploded to the cells
    it overlaps, each point belongs to exactly ONE cell, and the pair
    meets in an equi-join on (cell[, key]) before the exact containment
    filter. Because a point has a single cell, no post-join dedup is
    needed. Pick ``bucket_seconds`` near the typical interval length:
    the explode factor is ~interval/bucket, the candidate rate is
    ~bucket/interval — cost is ONE equi-join shuffle either way, just with
    different fan-outs. Left and right column names must not collide
    (except ``on``).
    """
    bs = float(bucket_seconds)
    start_b = F.floor(F.unix_timestamp(F.col(right_start)) / bs).cast("long")
    end_b = F.floor(F.unix_timestamp(F.col(right_end)) / bs).cast("long")
    # guard: sequence(a, b) DESCENDS when b < a (inverted intervals must
    # match nothing, not throw)
    cells = F.when(end_b >= start_b, F.sequence(start_b, end_b)).otherwise(
        F.array().cast("array<long>")
    )
    r = right.withColumn("_cell", F.explode(cells))
    l = left.withColumn(
        "_cell", F.floor(F.unix_timestamp(F.col(left_ts)) / bs).cast("long")
    )
    keys = ["_cell"] + ([on] if on else [])
    return (
        l.join(r, on=keys)
        .where(
            (F.col(left_ts) >= F.col(right_start))
            & (F.col(left_ts) <= F.col(right_end))
        )
        .drop("_cell")
    )
