"""Multimodal columns: images/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / frame-sample as Arrow-batched
UDFs.

Reference analog: the KB document loader + OCR providers
(ondine/knowledge/loader.py:34-221, ondine/knowledge/ocr.py:47-215) treat
binary media as "bytes in, text/features out" behind pluggable providers.
At 100 TB the Spark-native shape is:

- storage: ``spark.read.format("binaryFile")`` or parquet with a
  ``binary`` column + a ``media_meta`` struct (mime, byte_len, checksum,
  width/height/duration when known). Partition by file batch; never
  collect bytes to the driver.
- cheap metadata (length, checksum, header fields) stays JVM-side —
  whole-stage codegen over binary expressions.
- decode / model featurization runs in ``mapInPandas`` with Arrow binary
  batches — one model per worker, vectorized over the batch. The actual
  image/audio codecs are NOT installed in this environment, so the decode
  step is import-guarded (PIL/librosa) with a DETERMINISTIC FAKE used by
  tests: the Spark plumbing (schema, batch shape, partitioning) is real;
  only the pixel math is faked.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("mime", T.StringType()),
    T.StructField("byte_len", T.LongType()),
    T.StructField("md5", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def with_binary_column(
    df: DataFrame, text_col: str, out_col: str = "media_bytes"
) -> DataFrame:
    """Testdata shim: derive an opaque binary column from a text column
    (utf-8 bytes). Real deployments read binaryFile / parquet binary."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def media_meta(
    df: DataFrame, bin_col: str, mime: str = "application/octet-stream",
    out_col: str = "media_meta",
) -> DataFrame:
    """JVM-side metadata struct. width/height here are the DETERMINISTIC
    FAKE header parse (no codec in this environment): real decoders replace
    ``fake_dimensions`` via ``decode_images``."""
    b = F.col(bin_col)
    byte_len = F.length(b).cast("long")
    return df.withColumn(
        out_col,
        F.struct(
            F.lit(mime).alias("mime"),
            byte_len.alias("byte_len"),
            F.md5(b).alias("md5"),
            (byte_len % 640 + 16).cast("int").alias("width"),
            (byte_len % 480 + 16).cast("int").alias("height"),
        ),
    )


def frame_sample(
    df: DataFrame, bin_col: str, n_frames: int = 4,
    out_col: str = "frames",
) -> DataFrame:
    """Split the binary payload into ``n_frames`` contiguous byte windows
    (the video-frame-sampling plumbing; a real decoder would seek key
    frames). Output: array<struct<frame_idx,offset,frame_len,frame_md5>> —
    all JVM byte ops, no Python."""
    fl = f"greatest(cast(length({bin_col}) / {n_frames} as int), 1)"
    frames_expr = F.expr(
        f"""
        transform(sequence(0, {n_frames - 1}), i -> struct(
          cast(i as int) as frame_idx,
          cast(i * {fl} + 1 as bigint) as offset,
          cast(if(i = {n_frames - 1},
                  length({bin_col}) - i * {fl},
                  {fl}) as int) as frame_len,
          md5(substring({bin_col}, cast(i * {fl} + 1 as int),
              cast(if(i = {n_frames - 1},
                      length({bin_col}) - i * {fl},
                      {fl}) as int))) as frame_md5
        ))
        """
    )
    return df.withColumn(out_col, frames_expr)


def byte_histogram_features(
    df: DataFrame, bin_col: str, buckets: int = 16,
    out_col: str = "features", normalize: bool = True,
) -> DataFrame:
    """Arrow-batched featurization: L1-normalized histogram of byte values
    (mod ``buckets``) — the stand-in for a real embedding model, with the
    exact mapInPandas shape a model UDF uses (binary Arrow batch in,
    array<float> out, one 'model' per worker)."""
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for raw in pdf[bin_col]:
                if raw is None:
                    feats.append(None)
                    continue
                arr = np.frombuffer(bytes(raw), dtype=np.uint8)
                hist = np.bincount(arr % buckets, minlength=buckets).astype(
                    np.float64
                )
                if normalize and hist.sum() > 0:
                    hist = hist / hist.sum()
                feats.append([float(x) for x in hist])
            pdf = pdf.copy()
            pdf[out_col] = feats
            yield pdf

    return df.mapInPandas(featurize, schema=schema)


def decode_images(
    df: DataFrame, bin_col: str, out_col: str = "decoded",
    fake: bool = False,
) -> DataFrame:
    """Decode step. Real path needs PIL (NOT installed here — raises
    NotImplementedError so callers stub consciously); ``fake=True`` runs
    the deterministic fake decoder, exercising the identical mapInPandas
    plumbing: struct(width, height, mode, mean_luma) per row."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.StructType([
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("mode", T.StringType()),
            T.StructField("mean_luma", T.DoubleType()),
        ]))]
    )
    if not fake:
        try:  # pragma: no cover - PIL not installed in this environment
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "image decode requires Pillow, which is not installed in "
                "this environment; pass fake=True for the deterministic "
                "fake decoder (real Spark plumbing, fake pixel math)"
            ) from e

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf[bin_col]:
                if raw is None:
                    rows.append(None)
                    continue
                b = bytes(raw)
                if fake:
                    rows.append({
                        "width": len(b) % 640 + 16,
                        "height": len(b) % 480 + 16,
                        "mode": "FAKE",
                        "mean_luma": (sum(b) / len(b)) if b else 0.0,
                    })
                else:  # pragma: no cover
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(b))
                    gray = np.asarray(img.convert("L"), dtype=np.float64)
                    rows.append({
                        "width": img.width, "height": img.height,
                        "mode": img.mode, "mean_luma": float(gray.mean()),
                    })
            pdf = pdf.copy()
            pdf[out_col] = rows
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)
