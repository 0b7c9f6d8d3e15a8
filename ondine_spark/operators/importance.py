"""DSIR-style importance resampling for training-data selection.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023)
selects raw-corpus documents that look like a small target domain by

1. featurizing every document into hashed n-gram counts,
2. fitting two bag-of-ngrams models — one on the target sample, one on
   the raw corpus — and scoring each raw document with the
   log-likelihood ratio  w(x) = Σ_f tf_x(f) · log(p_target(f)/p_raw(f)),
3. resampling without replacement with the Gumbel top-k trick, which
   draws exactly n documents with probability proportional to exp(w).

Spark-idiomatic shape: featurization reuses the quality classifier's
stateless stages (null guard → RegexTokenizer → HashingTF murmur3
[→ NGram → HashingTF → assemble], quality_classifier._feature_stages),
so the hot path is pure JVM. The per-feature counts for BOTH
distributions come from ONE distributed pass (``Summarizer.sum`` —
a map-side-combinable vector sum whose result is 8·num_features bytes
on the driver, independent of corpus size); the log-ratio table is
quantized to 1e-6 BIGINTs and scored through
``quality_classifier.linear_margin``'s exact integer dot product, so
the weight is reproducible bit-for-bit by any engine that replays the
murmur3 bucketing (the same property the gated classifier margin has).
Resampling is a deterministic Gumbel top-k over seeded xxhash64
uniforms — one shuffle-free projection plus one global top-n.

At 100 TB: two full-corpus passes (count sum + scoring scan), zero
shuffles except the final top-n (which moves only n rows per
partition); driver state is two dense vectors of ``num_features``
doubles. The reference engine has no corpus-statistics selection
operator (its sampling surface is per-row predicates,
ondine/core/specifications.py) — this operator is part of the
training-data layer that extends it.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ondine_spark.operators.quality_classifier import (
    _feature_stages,
    linear_margin,
)


def dsir_llr_table(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    num_features: int = 1 << 16,
    use_bigrams: bool = True,
    alpha: float = 0.5,
    quant: float = 1e6,
) -> list[int]:
    """Fit the two hashed-ngram models and return the quantized
    log-likelihood-ratio table ``llr_q`` (length ``num_features`` or
    ``2*num_features`` with bigrams):

        llr_q[b] = round(quant * (ln p_target(b) - ln p_raw(b))),
        p(b) = (count(b) + alpha) / (N + alpha * B)     (add-alpha)

    Counts are exact integers (HashingTF term frequencies summed
    distributed via ``Summarizer.sum``), so the table — and therefore
    every downstream weight — is deterministic for a given corpus pair
    regardless of partitioning. One Spark job per distribution; the
    collected state is ``B`` doubles each.
    """
    from pyspark.ml.stat import Summarizer

    stages, feat = _feature_stages(text_col, num_features, use_bigrams)

    def counts(df: DataFrame) -> list[float]:
        out = df
        for st in stages:
            out = st.transform(out)
        row = out.agg(Summarizer.sum(F.col(feat)).alias("s")).head()
        vec = row["s"]
        return list(vec.toArray()) if vec is not None else []

    c_raw = counts(raw)
    c_tgt = counts(target)
    b = num_features * (2 if use_bigrams else 1)
    if not c_raw:
        c_raw = [0.0] * b
    if not c_tgt:
        c_tgt = [0.0] * b
    n_raw = sum(c_raw)
    n_tgt = sum(c_tgt)
    denom_r = math.log(n_raw + alpha * b)
    denom_t = math.log(n_tgt + alpha * b)
    return [
        int(round(quant * (
            (math.log(c_tgt[i] + alpha) - denom_t)
            - (math.log(c_raw[i] + alpha) - denom_r)
        )))
        for i in range(b)
    ]


def dsir_weights(
    df: DataFrame,
    llr_q: list[int],
    text_col: str = "text",
    num_features: int = 1 << 16,
    use_bigrams: bool = True,
    out_col: str = "dsir_w_q",
) -> DataFrame:
    """Append the quantized DSIR importance weight

        out_col = Σ_b tf_b · llr_q[b]        (exact BIGINT arithmetic)

    to every row — ``linear_margin`` with the LLR table as coefficients
    and intercept 0, i.e. a zero-shuffle JVM projection at scan speed.
    Divide by the ``quant`` used in :func:`dsir_llr_table` to recover
    the float log-likelihood ratio.
    """
    return linear_margin(
        df, text_col, llr_q, 0, num_features=num_features,
        use_bigrams=use_bigrams, out_col=out_col, tokens_col=None,
    )


def dsir_resample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    quant: float = 1e6,
    temperature: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """Draw ``n`` rows without replacement with probability proportional
    to ``exp(weight / (quant * temperature))`` — the Gumbel top-k trick
    (Vieira 2014; the DSIR paper's resampling step): per row, key =
    w/τ + Gumbel(0,1) with the Gumbel realized from a seeded xxhash64
    uniform, take the global top-n keys. Deterministic for a given
    (corpus, seed) under any partitioning.

    Scale shape: one projection + one total-order top-n. Spark's sort
    with a LIMIT pushes the limit into each partition (TakeOrdered), so
    the shuffle moves at most n rows per partition, not the corpus.
    """
    # xxhash64 -> uniform in (0, 1): 63 usable bits, never exactly 0 or 1
    u = (
        (F.shiftrightunsigned(F.xxhash64(F.col(id_col), F.lit(seed)), 1)
         + F.lit(1)).cast("double")
        / F.lit(float(1 << 63))
    )
    gumbel = -F.log(-F.log(u))
    key = F.col(weight_col).cast("double") / F.lit(quant * temperature) + gumbel
    return (
        df.withColumn("_dsir_key", key)
        .orderBy(F.col("_dsir_key").desc(), F.col(id_col))
        .limit(n)
        .drop("_dsir_key")
    )
