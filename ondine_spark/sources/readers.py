"""Sources: scans S1-S5 + row identity.

Reference: ondine/stages/data_loader_stage.py:34-193 and the streaming
containers (ondine/adapters/containers/streaming_csv.py). Spark-first: all
formats go through ``spark.read`` (distributed, columnar-pruned); Excel is
driver-side pandas → createDataFrame, like the reference.

Row identity — the hard part (SURVEY.md §4 #1): the reference relies on
single-process file order. Distributed parity: use a user-declared key
column when available, else derive a deterministic ``row_id`` by sorting on
all columns... no — that reorders duplicates. We instead use
``F.monotonically_increasing_id()`` ONLY for intra-run identity, and for
resume-stable identity require either ``id_column`` or hash row content
(``xxhash64`` over all columns + an occurrence counter for duplicate rows).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ondine_spark.core.specs import DatasetSpec

ROW_ID = "_row_id"


def infer_format(path: str, explicit: str | None = None) -> str:
    if explicit:
        return explicit
    suffix = os.path.splitext(path)[1].lower().lstrip(".")
    return {
        "csv": "csv", "tsv": "csv", "parquet": "parquet", "pq": "parquet",
        "json": "json", "jsonl": "json", "ndjson": "json",
        "xlsx": "excel", "xls": "excel",
        "orc": "orc", "avro": "avro",
    }.get(suffix, suffix or "parquet")


def read_source(spark: SparkSession, spec: DatasetSpec) -> DataFrame:
    """S1-S5: load the source into a DataFrame (no row_id yet)."""
    src = spec.source
    if isinstance(src, DataFrame):
        return src
    if src is None:
        raise ValueError("DatasetSpec.source is required")
    if not isinstance(src, str):
        # pandas DataFrame or list[dict] (S5)
        import pandas as pd

        if isinstance(src, list):
            src = pd.DataFrame(src)
        return spark.createDataFrame(src)

    fmt = infer_format(src, spec.format)
    if fmt == "csv":
        sep = "\t" if src.endswith(".tsv") and spec.delimiter == "," else spec.delimiter
        return (
            spark.read.option("header", str(spec.header).lower())
            .option("sep", sep)
            .option("encoding", spec.encoding)
            .csv(src)
        )
    if fmt == "parquet":
        return spark.read.parquet(src)
    if fmt == "json":
        return spark.read.json(src)
    if fmt == "orc":
        return spark.read.orc(src)
    if fmt == "avro":
        # built into the Spark distribution as an external module; guard
        # with a clear message where the avro jar isn't on the classpath
        try:
            return spark.read.format("avro").load(src)
        except Exception as e:
            raise ValueError(
                "avro input needs the spark-avro module on the classpath "
                "(--packages org.apache.spark:spark-avro); convert to "
                "parquet/orc otherwise"
            ) from e
    if fmt == "excel":
        import pandas as pd

        try:
            pdf = pd.read_excel(src, sheet_name=spec.sheet_name)
            return spark.createDataFrame(pdf.astype(str))
        except ImportError:
            # openpyxl absent: the stdlib OOXML reader covers the data
            # subset (shared/inline strings, numbers, bools, sheet pick)
            from ondine_spark.sources.xlsx import read_xlsx

            cols, rows = read_xlsx(src, spec.sheet_name)
            pdf = pd.DataFrame(rows, columns=cols)
            return spark.createDataFrame(pdf.astype(str))
    raise ValueError(f"unsupported format: {fmt}")


def with_row_id(df: DataFrame, id_column: str | None = None) -> DataFrame:
    """Attach a stable ``_row_id``.

    With ``id_column``: row identity is the user's key (resume-stable across
    runs and re-partitions — the recommended mode at scale).
    Without: content hash + per-duplicate occurrence index — deterministic
    for a fixed dataset regardless of partitioning, unlike
    ``monotonically_increasing_id``. Costs one shuffle-free window over the
    hash (duplicate groups are tiny); acceptable for resume correctness.
    """
    if ROW_ID in df.columns:
        return df
    if id_column:
        return df.withColumn(ROW_ID, F.col(id_column).cast("string"))
    h = F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
    w = Window.partitionBy(h).orderBy(F.monotonically_increasing_id())
    occ = F.row_number().over(w)
    return df.withColumn(
        ROW_ID, F.concat_ws("-", h.cast("string"), occ.cast("string"))
    )


def load_dataset(spark: SparkSession, spec: DatasetSpec) -> DataFrame:
    """S6 DataLoaderStage: scan → validate required columns → equality
    filters → column pruning → row_id (reference:
    data_loader_stage.py:113-193). Filters/pruning are expressed
    declaratively so Catalyst pushes them into the parquet scan."""
    df = read_source(spark, spec)
    missing = [c for c in spec.input_columns if c not in df.columns]
    if missing:
        raise ValueError(f"missing required input columns: {missing}")
    for col, value in spec.filters.items():
        if col not in df.columns:
            raise ValueError(f"filter column not found: {col}")
        df = df.filter(F.col(col) == F.lit(value))
    keep = list(spec.input_columns) if spec.input_columns else df.columns
    if spec.id_column and spec.id_column not in keep:
        keep = [spec.id_column] + keep
    df = df.select(*keep)
    return with_row_id(df, spec.id_column)
