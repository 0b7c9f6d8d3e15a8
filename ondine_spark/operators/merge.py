"""Result merge: stitch parsed output columns back onto the input table.

Reference: ondine/stages/result_writer_stage.py:74-125 (J1) and the inline
merge ondine/api/pipeline.py:900-927 (J2). All reference joins are
row-identity equi-joins — here a broadcast-able left join on ``_row_id``.
In the common single-plan case the output columns are computed in place on
the same DataFrame, so no join happens at all (Catalyst sees one linear
plan); the join path exists for composing separately-computed results
(auto-retry J3, composer J4, resume J5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ondine_spark.core.specs import MergeStrategy
from ondine_spark.sources.readers import ROW_ID


def merge_results(
    original: DataFrame,
    results: DataFrame,
    output_cols: list[str],
    strategy: MergeStrategy = MergeStrategy.REPLACE,
    broadcast_results: bool = False,
) -> DataFrame:
    """Left-join ``results`` (``_row_id`` + output cols) onto ``original``.

    REPLACE — new values win; APPEND — error if the column pre-exists;
    UPDATE — only fill nulls in existing columns.
    """
    existing = set(original.columns)
    if strategy == MergeStrategy.APPEND:
        clash = existing & set(output_cols)
        if clash:
            raise ValueError(f"APPEND merge: columns already exist: {sorted(clash)}")

    res = results.select(ROW_ID, *[F.col(c).alias(f"__new_{c}") for c in output_cols])
    if broadcast_results:
        res = F.broadcast(res)
    joined = original.join(res, on=ROW_ID, how="left")

    for c in output_cols:
        new = F.col(f"__new_{c}")
        if c in existing and strategy == MergeStrategy.UPDATE:
            value = F.coalesce(F.col(c), new)
        elif c in existing and strategy == MergeStrategy.REPLACE:
            value = F.coalesce(new, F.col(c))
        else:
            value = new
        joined = joined.withColumn(c, value)
    return joined.drop(*[f"__new_{c}" for c in output_cols])


def patch_retried_rows(
    result: DataFrame, retried: DataFrame, output_cols: list[str]
) -> DataFrame:
    """J3 auto-retry merge: retried values overwrite the failed originals
    (reference: ondine/api/pipeline.py:1848-1861)."""
    return merge_results(
        result, retried, output_cols, MergeStrategy.REPLACE, broadcast_results=True
    )
