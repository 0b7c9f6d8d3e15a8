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

from ondine_spark.core.partitioning import spread_small


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


def _bucket_instances(
    text_col: str, num_features: int, use_bigrams: bool
) -> Column:
    """Per-row array of LLR-table indices: unigram buckets, then (with
    bigrams) bigram buckets offset by ``num_features``. The token array
    is let-bound so the lower+split regex runs ONCE per row — the naive
    unigram-select ∪ bigram-select shape tokenizes each row twice (and
    the bigram zip_with's two slices a third/fourth time). Bucket
    arithmetic is unchanged, so downstream counts/sums are identical."""
    from ondine_spark.functions.similarity import let_bind

    def body(t: Column) -> Column:
        uni = F.transform(t, lambda w: _bucket(w, num_features))
        if not use_bigrams:
            return uni
        big = F.transform(
            _bigrams(t),
            lambda w: _bucket(w, num_features) + F.lit(num_features),
        )
        return F.concat(uni, big)

    return let_bind(_tokens(text_col), body)


def lut_fold_udf(lut: list[int]):
    """Vectorized Arrow kernel for Σ lut[index] over a per-row index
    array — the scoring primitive shared by ``dsir_weights`` (literal
    mode) and the quality classifier's ``linear_margin``. Exact int64
    adds (commutative), so the result is bit-identical to any
    sequential fold over the same instances. The lut ships once per
    task in the closure (8 B/entry)."""
    import numpy as np
    import pandas as pd

    lut_np = np.asarray([int(v) for v in lut], dtype=np.int64)

    def _fold_fn(batches):
        for s in batches:
            arrs = [np.asarray(a, dtype=np.int64) for a in s.values]
            n = len(arrs)
            lens = np.fromiter((a.size for a in arrs), dtype=np.int64,
                               count=n)
            out = np.zeros(n, dtype=np.int64)
            nz = np.flatnonzero(lens)
            if nz.size:
                # reduceat cannot express empty segments — sum the
                # non-empty docs only (empty docs keep the fold's init
                # value, 0)
                kept = [arrs[i] for i in nz]
                starts = np.concatenate(
                    ([0], np.cumsum(lens[nz])[:-1])
                )
                vals = lut_np[np.concatenate(kept)]
                out[nz] = np.add.reduceat(vals, starts)
            yield pd.Series(out)

    from typing import Iterator as _It

    # real typing objects (not strings): locally-imported pd would not
    # resolve for string annotations — same note as cosine_arrow
    _fold_fn.__annotations__ = {
        "batches": _It[pd.Series], "return": _It[pd.Series],
    }
    return F.pandas_udf(_fold_fn, "long")


def dsir_llr_table(
    raw: DataFrame,
    target: DataFrame | None,
    text_col: str = "text",
    num_features: int = 1 << 16,
    use_bigrams: bool = True,
    alpha: float = 0.5,
    quant: float = 1e6,
    target_predicate: Column | None = None,
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

    # ONE tagged pass for both distributions (r8, guide §2.3/§2.4): the
    # two-job shape tokenized raw and target separately (and each job
    # tokenized its rows once for unigrams and again for bigrams — four
    # regex-split passes total) and paid two shuffles + two collects.
    # Now each row is tokenized once (_bucket_instances let-binds the
    # token array), the raw/target streams are unioned with 0/1 tag
    # columns, and one groupBy(bkt) sums each side conditionally.
    # Counting is order-independent exact-integer arithmetic, so both
    # count vectors are identical to the two-job shape. spread_small
    # parallelizes single-file local scans (no-op on cluster inputs).
    # ``target_predicate`` (r8): when the target corpus is a filtered
    # subset of ``raw`` (the common "domain = rows matching P" setup),
    # passing the predicate instead of a second DataFrame fits both
    # distributions from ONE scan — each raw row contributes
    # (_r=1, _t=P(row)), which sums to exactly the counts the two-stream
    # union produces for (raw, raw.filter(P)). Exact integers, so the
    # returned table is identical.
    bkts = _bucket_instances(text_col, num_features, use_bigrams)
    if target_predicate is not None:
        if target is not None:
            raise ValueError(
                "pass either target or target_predicate, not both"
            )
        tagged = spread_small(
            raw.select(
                bkts.alias("_b"),
                F.lit(1).alias("_r"),
                F.when(target_predicate, F.lit(1)).otherwise(
                    F.lit(0)
                ).alias("_t"),
            )
        )
    elif target is None:
        raise ValueError("either target or target_predicate is required")
    else:
        tagged = spread_small(
            raw.select(
                bkts.alias("_b"), F.lit(1).alias("_r"), F.lit(0).alias("_t")
            )
        ).unionAll(
            spread_small(
                target.select(
                    bkts.alias("_b"), F.lit(0).alias("_r"), F.lit(1).alias("_t")
                )
            )
        )
    inst = tagged.select(F.explode("_b").alias("bkt"), "_r", "_t")
    c_raw = [0] * b_total
    c_tgt = [0] * b_total
    for r in (
        inst.groupBy("bkt")
        .agg(F.sum("_r").alias("cr"), F.sum("_t").alias("ct"))
        .collect()
    ):
        c_raw[r["bkt"]] = r["cr"]
        c_tgt[r["bkt"]] = r["ct"]
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


# Measured crossover (SCALE.md "Round 7"): the SQL literal costs
# ~30 µs per table entry to PARSE (plan build) plus a per-row cost
# that grows with the table (the array literal is materialized per
# evaluation); the broadcast-join path pays a near-flat setup (Arrow
# createDataFrame of B rows + one broadcast) and O(1) per token.
# Below this many entries the literal wins on fixed cost; above, its
# plan build blows up (28-66 s at 2¹⁸ entries) while broadcast stays
# flat.
_LUT_BROADCAST_MIN = 1 << 15


def dsir_weights(
    df: DataFrame,
    llr_q: list[int],
    text_col: str = "text",
    num_features: int = 1 << 16,
    use_bigrams: bool = True,
    out_col: str = "dsir_w_q",
    lut_mode: str = "auto",
    id_col: str | None = None,
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
    bit-identical outputs either way (same murmur3 bucketing, same
    exact-integer adds, which commute; pinned by
    tests/test_importance.py::test_lut_modes_bit_identical):

    - ``"literal"`` (historical name): the table ships ONCE PER TASK in
      the scoring kernel's closure as a numpy int64 array; bucket ids
      are computed by JVM expressions and the per-doc sum runs as one
      vectorized ``np.add.reduceat`` (r8 — this replaced a let-bound
      ``F.aggregate`` over a SQL array literal, which re-materialized
      the B-entry constant per row and folded interpreted per token).
      Closure bytes grow with B (8 B/entry), so this path is for small
      tables.
    - ``"broadcast"``: the table travels as DATA — a B-row (bucket,
      llr) DataFrame built via Arrow, broadcast-hash-joined onto the
      EXPLODED token instances, re-aggregated per row. Requires
      ``id_col`` with UNIQUE values (the rows are reassembled by key;
      duplicate ids would merge their weights). O(1) plan text,
      O(1) per-token work at any B; the two extra exchanges (per-id
      partial-aggregated sum + the join back) carry ~1 row per doc.
    - ``"auto"`` (default): literal below ``_LUT_BROADCAST_MIN``
      entries; broadcast at or above when ``id_col`` is given (else
      stays literal — the caller opted out of a join key).
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
        lut_mode == "auto"
        and len(llr_q) >= _LUT_BROADCAST_MIN
        and id_col is not None
    )
    if broadcast_lut and id_col is None:
        raise ValueError("lut_mode='broadcast' requires id_col")

    toks = _tokens(text_col)
    if broadcast_lut:
        spark = df.sparkSession
        try:
            # pyarrow Table → DataFrame is zero-copy-ish regardless of
            # the session's arrow conf; the pandas fallback without
            # spark.sql.execution.arrow.pyspark.enabled converts row by
            # row (measured 29 s at 2²¹ entries vs ~2 s via pyarrow)
            import pyarrow as pa

            lut_df = spark.createDataFrame(pa.table({
                "_bkt": pa.array(range(len(llr_q)), type=pa.int32()),
                "_llr": pa.array(
                    [int(v) for v in llr_q], type=pa.int64()
                ),
            }))
        except Exception:  # pragma: no cover - pyarrow always present here
            import pandas as pd

            lut_df = spark.createDataFrame(
                pd.DataFrame(
                    {"_bkt": range(len(llr_q)),
                     "_llr": [int(v) for v in llr_q]}
                )
            ).select(
                F.col("_bkt").cast("int"), F.col("_llr").cast("long")
            )
        # one let-bound tokenization per row (vs separate unigram and
        # bigram explodes re-running the split); identical bucket ids
        inst = spread_small(df).select(
            id_col,
            F.explode(
                _bucket_instances(text_col, num_features, use_bigrams)
            ).alias("_bkt"),
        )
        sums = (
            inst.join(F.broadcast(lut_df), on="_bkt")
            .groupBy(id_col)
            .agg(F.sum("_llr").alias(out_col))
        )
        # docs with zero tokens sum to 0, exactly like the empty fold
        return df.join(sums, on=id_col, how="left").withColumn(
            out_col, F.coalesce(F.col(out_col), F.lit(0).cast("long"))
        )

    # Literal-table fold as ONE vectorized Arrow kernel (r8): the
    # previous let-bound ``F.aggregate`` over the lut literal still
    # materialized the B-entry constant array per row and folded
    # interpreted per token (measured 0.98 s at sf0.1/B=2¹⁴). Now the
    # murmur3 bucket ids stay a JVM expression (identical hashing) and
    # the per-doc sum Σ lut[bucket] runs as one ``np.add.reduceat`` per
    # batch — exact int64 adds commute, so weights are bit-identical to
    # the fold (pinned together with the broadcast path by
    # test_lut_modes_bit_identical). Only the bucket-id array crosses
    # the Python boundary; the lut (B int64s) ships once per task in
    # the closure.
    fold_udf = lut_fold_udf(llr_q)
    inst = _bucket_instances(text_col, num_features, use_bigrams)
    return spread_small(df).withColumn(out_col, fold_udf(inst))


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
