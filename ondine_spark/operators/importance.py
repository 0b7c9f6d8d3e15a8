"""DSIR-style importance resampling for training-data selection.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023)
selects raw-corpus documents that look like a small target domain by

1. featurizing every document into hashed n-gram counts,
2. fitting two bag-of-ngrams models — one on the target sample, one on
   the raw corpus — and scoring each raw document with the
   log-likelihood ratio  w(x) = Σ_f tf_x(f) · log(p_target(f)/p_raw(f)),
3. resampling without replacement with the Gumbel top-k trick, which
   draws exactly n documents with probability proportional to exp(w).

Spark-idiomatic shape — sparse end to end, no dense vectors at ANY
``num_features`` (the obvious HashingTF + vector dot implementation
densifies B doubles per row and builds a B-literal Catalyst expression;
at B = 2¹⁷ that is ~1 MB per row and a multi-minute plan build):

- featurization is lower + ``\\W+`` split (RegexTokenizer semantics)
  and ``F.hash`` bucketing (Spark SQL's murmur3, seed 42) — pure JVM
  expressions inside whole-stage codegen;
- the two models are fit in one explode → groupBy(bucket) pass each —
  map-side partial aggregation means the shuffle carries at most
  ``num_features`` rows per partition regardless of corpus size;
- the LLR table is quantized to 1e-6 BIGINTs and embedded as ONE
  constant-folded SQL array literal (a single parse, not B py4j
  round-trips); the per-document weight is an exact-integer
  ``F.aggregate`` over token instances — O(tokens) work, zero shuffle,
  reproducible bit-for-bit by any engine that replays the bucketing
  (the oracle does, in SQL);
- resampling is a deterministic Gumbel top-k over seeded xxhash64
  uniforms — ``TakeOrderedAndProject``, so the final shuffle moves at
  most n rows per partition.

At 100 TB: two token-scan + tiny-shuffle passes to fit, one scan to
score, driver state is one list of ``B`` ints. The reference engine has
no corpus-statistics selection operator (its sampling surface is
per-row predicates, ondine/core/specifications.py) — this operator is
part of the training-data layer that extends it.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str) -> Column:
    """lower + ``\\W+`` split, empties dropped — identical token stream
    to ML's RegexTokenizer(pattern=r"\\W+", toLowercase, minTokenLength=1)
    (both are Java regex on the JVM), as plain SQL expressions."""
    return F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\W+"),
        lambda x: F.length(x) >= 1,
    )


def _bigrams(toks: Column) -> Column:
    """Adjacent-pair bigrams joined by a single space (NGram semantics).

    zip_with over two slices, NOT transform + element_at(toks, i+2):
    ``toks`` is an expression (not a materialized column), and an
    element_at inside the lambda re-evaluates the whole split per
    POSITION — O(tokens²) per document (measured 8x on the bench
    corpus). zip_with evaluates each slice argument once per row."""
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )


def _bucket(w: Column, num_features: int) -> Column:
    """Spark SQL murmur3 (seed 42) bucket in [0, num_features)."""
    return F.pmod(F.hash(w), F.lit(num_features))


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
    log-likelihood-ratio table ``llr_q`` (length ``num_features`` for
    unigrams, ``2*num_features`` with bigrams appended — unigram bucket
    b at index b, bigram bucket b at ``num_features + b``):

        llr_q[b] = round(quant * (ln p_target(b) - ln p_raw(b))),
        p(b) = (count(b) + alpha) / (N + alpha * B)     (add-alpha)

    Counts are exact integers (explode → groupBy(bucket) with map-side
    combine), so the table — and every downstream weight — is
    deterministic for a given corpus pair regardless of partitioning.
    One Spark job per distribution; the collected state is at most
    ``B`` (bucket, count) rows each.
    """
    b_total = num_features * (2 if use_bigrams else 1)

    def counts(df: DataFrame) -> list[int]:
        inst = df.select(F.explode(_tokens(text_col)).alias("w")).select(
            _bucket(F.col("w"), num_features).alias("bkt")
        )
        if use_bigrams:
            big = df.select(
                F.explode(_bigrams(_tokens(text_col))).alias("w")
            ).select(
                (_bucket(F.col("w"), num_features)
                 + F.lit(num_features)).alias("bkt")
            )
            inst = inst.unionAll(big)
        out = [0] * b_total
        for r in inst.groupBy("bkt").agg(F.count(F.lit(1)).alias("c")).collect():
            out[r["bkt"]] = r["c"]
        return out

    c_raw = counts(raw)
    c_tgt = counts(target)
    n_raw = sum(c_raw)
    n_tgt = sum(c_tgt)
    denom_r = math.log(n_raw + alpha * b_total)
    denom_t = math.log(n_tgt + alpha * b_total)
    return [
        int(round(quant * (
            (math.log(c_tgt[i] + alpha) - denom_t)
            - (math.log(c_raw[i] + alpha) - denom_r)
        )))
        for i in range(b_total)
    ]


# Measured crossover (tools/dsir_scale.py, SCALE.md "Round 7"): the SQL
# literal costs ~30 µs per table entry to PARSE (plan build), the
# broadcast path a near-flat setup (Arrow createDataFrame + one-row
# broadcast). Below this many entries the literal's parse is cheaper
# than the broadcast fixed cost; above, plan build blows up (8.3 s at
# 2¹⁸ entries) while broadcast stays flat.
_LUT_BROADCAST_MIN = 1 << 15


def dsir_weights(
    df: DataFrame,
    llr_q: list[int],
    text_col: str = "text",
    num_features: int = 1 << 16,
    use_bigrams: bool = True,
    out_col: str = "dsir_w_q",
    lut_mode: str = "auto",
) -> DataFrame:
    """Append the quantized DSIR importance weight

        out_col = Σ_tokens llr_q[bucket(token)]
                  (+ Σ_bigrams llr_q[num_features + bucket(bigram)])

    to every row, in exact BIGINT arithmetic. Each token instance costs
    one murmur3 + one array index inside whole-stage codegen: zero
    shuffle, zero Python, no dense per-row vectors. Divide by the
    ``quant`` used in :func:`dsir_llr_table` to recover the float
    log-likelihood ratio.

    ``lut_mode`` picks how the LLR table reaches the executors —
    bit-identical outputs either way (same element_at lookups over the
    same integers, same murmur3 bucketing; pinned by
    tests/test_importance.py::test_lut_modes_bit_identical):

    - ``"literal"``: ONE constant-folded SQL array literal (a single
      SQL parse — NOT B ``F.lit`` py4j round-trips, which take minutes
      at B = 2¹⁷). Parse cost is ~30 µs/entry, so plan build blows up
      above ~2¹⁷ entries (measured: 8.3 s at B=2¹⁷ bigrams).
    - ``"broadcast"``: the table travels as DATA — a one-row DataFrame
      holding the full array, broadcast cross-joined onto ``df`` (a
      BroadcastNestedLoopJoin against a single row: no exchange on the
      corpus side), folded against, and dropped in the same projection
      so the array never materializes per output row. Plan size O(1)
      at any B.
    - ``"auto"`` (default): literal below ``_LUT_BROADCAST_MIN``
      entries, broadcast at or above — the measured crossover.
    """
    expect = num_features * (2 if use_bigrams else 1)
    if len(llr_q) != expect:
        raise ValueError(
            f"llr_q has {len(llr_q)} entries, expected {expect} "
            f"(num_features={num_features}, use_bigrams={use_bigrams})"
        )
    if lut_mode not in ("auto", "literal", "broadcast"):
        raise ValueError(f"unknown lut_mode {lut_mode!r}")
    broadcast_lut = lut_mode == "broadcast" or (
        lut_mode == "auto" and len(llr_q) >= _LUT_BROADCAST_MIN
    )

    lut_col = "__dsir_llr"
    while lut_col in df.columns:
        lut_col = "_" + lut_col
    if broadcast_lut:
        import pandas as pd

        spark = df.sparkSession
        one = spark.createDataFrame(
            pd.DataFrame({lut_col: [[int(v) for v in llr_q]]})
        ).select(F.col(lut_col).cast("array<bigint>").alias(lut_col))
        lut = F.col(lut_col)
        base = df.crossJoin(F.broadcast(one))
    else:
        lut = F.expr(
            "array(" + ",".join(f"{int(v)}L" for v in llr_q) + ")"
        )
        base = df
    toks = _tokens(text_col)

    def fold(arr: Column, offset: int) -> Column:
        return F.aggregate(
            arr,
            F.lit(0).cast("long"),
            lambda acc, w: acc + F.element_at(
                lut, _bucket(w, num_features) + F.lit(offset + 1)
            ),
        )

    w = fold(toks, 0)
    if use_bigrams:
        w = w + fold(_bigrams(toks), num_features)
    out = base.withColumn(out_col, w)
    return out.drop(lut_col) if broadcast_lut else out


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
    # xxhash64 -> uniform u in (0, 1]: 63 usable bits, never exactly 0,
    # but integers within ~2^10 of 2^63 round to exactly 1.0 as doubles
    # (probability ~2^-53 per row). Clamp below 1.0 so -log(u) is never
    # exactly 0 — otherwise ln(0) is NULL and the row would be silently
    # dropped from the top-n (desc sort puts NULLs last).
    u = (
        (F.shiftrightunsigned(F.xxhash64(F.col(id_col), F.lit(seed)), 1)
         + F.lit(1)).cast("double")
        / F.lit(float(1 << 63))
    )
    gumbel = -F.log(-F.log(F.least(u, F.lit(1.0 - 1e-16))))
    key = F.col(weight_col).cast("double") / F.lit(quant * temperature) + gumbel
    return (
        df.withColumn("_dsir_key", key)
        .orderBy(F.col("_dsir_key").desc(), F.col(id_col))
        .limit(n)
        .drop("_dsir_key")
    )
