"""Confidence scoring (V4).

Reference (ondine/api/pipeline.py:1061-1090): default mode
``min(1, grounding*0.7 + min(support,5)/5*0.3)``; also ``sigmoid`` and
``grounding_only`` modes. Pure column arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CONFIDENCE = "_confidence_score"


def _blend(grounding: Column, support: Column) -> Column:
    return (
        grounding * 0.7 + F.least(support.cast("double"), F.lit(5.0)) / 5.0 * 0.3
    )


def confidence_scores(
    df: DataFrame,
    grounding_col: str = "_grounding_score",
    support_col: str = "_evidence_count",
    mode: str = "default",
    out_col: str = CONFIDENCE,
) -> DataFrame:
    g = F.coalesce(F.col(grounding_col), F.lit(0.0))
    s = (
        F.coalesce(F.col(support_col), F.lit(0))
        if support_col in df.columns
        else F.lit(0)
    )
    if mode == "grounding_only":
        score = g
    elif mode == "sigmoid":
        # steepness 10 centered at 0.5 over the blended score (our
        # parameterization of the reference's sigmoid mode)
        score = 1.0 / (1.0 + F.exp(-10.0 * (_blend(g, s) - 0.5)))
    else:
        score = F.least(F.lit(1.0), _blend(g, s))
    return df.withColumn(out_col, score)
