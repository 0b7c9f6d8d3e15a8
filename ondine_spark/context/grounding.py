"""Grounding (V1): score LLM outputs against source text (anti-hallucination).

Reference (ondine/api/pipeline.py:960-1022, ondine/context/text.py:33-72,
crates/ondine-core/src/evidence/grounding.rs:44-112): split the source into
sentences; grounding score = max over sentences of the 2-document TF-IDF
cosine (corpus = {output, sentence}, smoothed idf = ln(2/df)+1); below
``threshold`` → flag or discard the output.

Spark-first: NO per-pair Python. The pair cosine decomposes algebraically so
one term-level join computes every (row, sentence) pair at once:

With idf=1 for shared terms (df=2 → ln(1)+1) and idf=c=ln(2)+1 for solo
terms (df=1):
    dot        = Σ_shared tf_a·tf_b
    ‖a‖²       = shared_sq_a + c²·(S_a − shared_sq_a)
where S_a = Σ_t tf_a² is precomputable per side. So the plan is:
tokenize+explode both sides → join on term → one agg per pair → max per
row. Inverted-index shape: scales to any corpus, whole-stage codegen, and
the oracle can reproduce it in ANSI SQL.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ondine_spark.knowledge.chunker import split_sentences
from ondine_spark.sources.readers import ROW_ID

IDF_SOLO = math.log(2.0) + 1.0
GROUNDING_SCORE = "_grounding_score"
GROUNDED = "_grounded"

_TOKEN_RE = "[a-z0-9]+"


def _term_counts(df: DataFrame, keys: list[str], text_col: str) -> DataFrame:
    """(keys..., term, tf) — reference tokenization: [a-z0-9]+ on lowered
    text (ondine/context/text.py)."""
    terms = F.expr(
        f"filter(regexp_extract_all(lower({text_col}), '{_TOKEN_RE}', 0), x -> x != '')"
    )
    return (
        df.select(*keys, F.explode(terms).alias("term"))
        .groupBy(*keys, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def pairwise_tfidf_cosine(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_text: str,
    right_text: str,
) -> DataFrame:
    """(left_key, right_key, tfidf_cosine) for every pair sharing ≥1 term.

    Pairs sharing no term have cosine contributions only from solo terms —
    their dot is 0, so they're correctly absent (score 0)."""
    lt = _term_counts(left, [left_key], left_text)
    rt = _term_counts(right, [right_key], right_text)
    s_l = lt.groupBy(left_key).agg(F.sum(F.col("tf") * F.col("tf")).alias("S_l"))
    s_r = rt.groupBy(right_key).agg(F.sum(F.col("tf") * F.col("tf")).alias("S_r"))

    shared = (
        lt.alias("l")
        .join(rt.alias("r"), on="term")
        .groupBy(left_key, right_key)
        .agg(
            F.sum(F.col("l.tf") * F.col("r.tf")).alias("dot"),
            F.sum(F.col("l.tf") * F.col("l.tf")).alias("sq_l"),
            F.sum(F.col("r.tf") * F.col("r.tf")).alias("sq_r"),
        )
    )
    c2 = IDF_SOLO * IDF_SOLO
    norm_l = F.sqrt(F.col("sq_l") + c2 * (F.col("S_l") - F.col("sq_l")))
    norm_r = F.sqrt(F.col("sq_r") + c2 * (F.col("S_r") - F.col("sq_r")))
    return (
        shared.join(s_l, on=left_key)
        .join(s_r, on=right_key)
        .select(
            left_key,
            right_key,
            F.when((norm_l == 0) | (norm_r == 0), F.lit(0.0))
            .otherwise(F.col("dot") / (norm_l * norm_r))
            .alias("tfidf_cosine"),
        )
    )


def grounding_scores(
    df: DataFrame,
    output_col: str,
    source_col: str,
    threshold: float = 0.3,
    on_fail: str = "flag",
    id_col: str = ROW_ID,
) -> DataFrame:
    """Append ``_grounding_score`` (max sentence TF-IDF cosine) and either
    flag (``_grounded`` boolean) or discard (null the output) rows below
    ``threshold`` (reference policy: ondine/api/pipeline.py:1003-1018)."""
    sents = df.select(
        F.col(id_col),
        F.posexplode(split_sentences(F.col(source_col))).alias("sent_idx", "_sent"),
    )
    lt = _term_counts(df.select(id_col, output_col), [id_col], output_col)
    rt = _term_counts(sents, [id_col, "sent_idx"], "_sent")
    s_l = lt.groupBy(id_col).agg(F.sum(F.col("tf") * F.col("tf")).alias("S_l"))
    s_r = rt.groupBy(id_col, "sent_idx").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("S_r")
    )
    # join key is (row, term): grounding is within-row, so the shuffle stays
    # proportional to the data, never cross-row
    shared = (
        lt.alias("l")
        .join(rt.alias("r"), on=[id_col, "term"])
        .groupBy(id_col, "sent_idx")
        .agg(
            F.sum(F.col("l.tf") * F.col("r.tf")).alias("dot"),
            F.sum(F.col("l.tf") * F.col("l.tf")).alias("sq_l"),
            F.sum(F.col("r.tf") * F.col("r.tf")).alias("sq_r"),
        )
    )
    c2 = IDF_SOLO * IDF_SOLO
    norm_l = F.sqrt(F.col("sq_l") + c2 * (F.col("S_l") - F.col("sq_l")))
    norm_r = F.sqrt(F.col("sq_r") + c2 * (F.col("S_r") - F.col("sq_r")))
    pair_scores = (
        shared.join(s_l, on=id_col)
        .join(s_r, on=[id_col, "sent_idx"])
        .select(
            id_col,
            F.when((norm_l == 0) | (norm_r == 0), F.lit(0.0))
            .otherwise(F.col("dot") / (norm_l * norm_r))
            .alias("tfidf_cosine"),
        )
    )
    best = pair_scores.groupBy(id_col).agg(
        F.max("tfidf_cosine").alias(GROUNDING_SCORE)
    )
    out = df.join(best, on=id_col, how="left").fillna({GROUNDING_SCORE: 0.0})
    if on_fail == "discard":
        return out.withColumn(
            output_col,
            F.when(F.col(GROUNDING_SCORE) >= threshold, F.col(output_col)),
        )
    return out.withColumn(GROUNDED, F.col(GROUNDING_SCORE) >= threshold)
