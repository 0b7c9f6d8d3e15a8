"""Learned document-quality classifier (fastText/DataComp-style).

Rule-based quality (text_analysis.quality_rules — Gopher) catches
boilerplate and garbage; modern curation pipelines ALSO train a
lightweight linear classifier against a high-quality reference corpus
(positives = curated text, negatives = raw crawl) and keep documents by
predicted probability — the approach of CCNet, fastText-filtering
(Joulin et al. 2017) and DataComp-LM.

Spark-idiomatic shape: hashing-trick bag of word uni+bigrams
(``HashingTF`` — murmur3, fixed dimensionality, no vocabulary state to
ship) → TF scaling → ``LogisticRegression`` (pyspark.ml — distributed
L-BFGS; each iteration is one map-side-combinable gradient pass). Scoring
runs entirely JVM-side through the fitted PipelineModel: tokenize → hash
→ sparse dot + sigmoid. No Python in either the training hot loop or the
scoring path, so the classifier scores 100 TB at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _feature_stages(text_col: str, num_features: int, use_bigrams: bool):
    """The stateless featurization stages (null-guard -> tokenize ->
    hash [-> bigram hash -> assemble]) shared by training, scoring and
    the oracle-gateable ``linear_margin``. Returns (stages, feature_col)."""
    from pyspark.ml.feature import (
        HashingTF,
        NGram,
        RegexTokenizer,
        SQLTransformer,
        VectorAssembler,
    )

    stages = [
        # null text = no features (ML's RegexTokenizer NPEs on null);
        # inside the pipeline so BOTH fit and transform are null-safe
        # and the saved model carries the guard with it
        SQLTransformer(
            statement=(
                f"SELECT *, coalesce({text_col}, '') AS _qc_text "
                "FROM __THIS__"
            )
        ),
        RegexTokenizer(
            inputCol="_qc_text", outputCol="_qc_words",
            pattern=r"\W+", toLowercase=True, minTokenLength=1,
        ),
        HashingTF(
            inputCol="_qc_words", outputCol="_qc_tf1",
            numFeatures=num_features, binary=False,
        ),
    ]
    feature_cols = ["_qc_tf1"]
    if use_bigrams:
        stages += [
            NGram(n=2, inputCol="_qc_words", outputCol="_qc_bigrams"),
            HashingTF(
                inputCol="_qc_bigrams", outputCol="_qc_tf2",
                numFeatures=num_features, binary=False,
            ),
        ]
        feature_cols.append("_qc_tf2")
    if len(feature_cols) > 1:
        stages.append(
            VectorAssembler(inputCols=feature_cols, outputCol="_qc_features")
        )
        feat = "_qc_features"
    else:
        feat = feature_cols[0]
    return stages, feat


def _pipeline(text_col: str, num_features: int, reg_param: float,
              max_iter: int, use_bigrams: bool):
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression

    stages, feat = _feature_stages(text_col, num_features, use_bigrams)
    stages = list(stages)
    stages.append(
        LogisticRegression(
            featuresCol=feat, labelCol="_qc_label",
            predictionCol="_qc_pred", probabilityCol="_qc_prob",
            rawPredictionCol="_qc_raw",
            regParam=reg_param, maxIter=max_iter, standardization=False,
        )
    )
    return Pipeline(stages=stages)


def linear_margin(
    df: DataFrame,
    text_col: str,
    coefficients_q,
    intercept_q: int,
    num_features: int,
    use_bigrams: bool = True,
    out_col: str = "margin_q",
    tokens_col: str | None = "n_tok",
) -> DataFrame:
    """Integer-exact linear score through the SAME featurization stages
    the trained classifier uses (null guard -> RegexTokenizer ->
    HashingTF [-> NGram -> HashingTF -> assemble]), with 1e-6-quantized
    BIGINT weights:

        margin_q = intercept_q + Σ_b tf_b · coefficients_q[b]

    summed in exact integer arithmetic, so the value is reproducible
    bit-for-bit by any engine that replays the murmur3 bucketing — this
    is the oracle-gateable twin of ``score_quality`` (whose float dot +
    sigmoid is NOT stable under summation-order changes). Quantize a
    fitted model with ``int(round(c * 1e6))`` per coefficient; sign and
    ranking agreement with the float margin is pytest-asserted.

    Scale shape (r8): featurization stays the ML transformer chain
    (JVM — ``HashingTF`` hashes with ``hashUnsafeBytes2``, which SQL
    ``F.hash`` does NOT reproduce, so the stages cannot be replaced by
    plain expressions), but the dense per-dimension fold — a
    ``vector_to_array`` + interpreted ``F.aggregate`` over 2B entries
    per row, measured ~1.3 s of the 2.1 s gate query at sf0.1 — runs as
    one vectorized Arrow int64 matvec. tf counts are exact in float64
    (integers < 2⁵³) and int64 adds commute, so margins are
    bit-identical — pinned by test_linear_margin_matches_model_raw_
    margin, which scores through the fitted PipelineModel itself.
    ``spread_small`` widens single-file local scans; one
    ArrowEvalPython, zero keyed shuffles."""
    coefs = [int(c) for c in coefficients_q]
    expect = num_features * (2 if use_bigrams else 1)
    if len(coefs) != expect:
        raise ValueError(
            f"coefficients_q has {len(coefs)} entries, expected {expect} "
            f"(num_features={num_features}, use_bigrams={use_bigrams})"
        )
    import numpy as np
    import pandas as pd

    from pyspark.ml.functions import vector_to_array

    from ondine_spark.core.partitioning import spread_small

    stages, feat = _feature_stages(text_col, num_features, use_bigrams)
    out = spread_small(df)
    for st in stages:
        out = st.transform(out)

    coef_np = np.asarray(coefs, dtype=np.int64)
    icept = int(intercept_q)

    def _dot_fn(batches):
        for s in batches:
            if not len(s):
                yield pd.Series([], dtype="int64")
                continue
            # fixed-width rows (2B tf counts, exact integers in float64)
            x = np.asarray(s.tolist(), dtype=np.int64)
            yield pd.Series(x @ coef_np + icept)

    from typing import Iterator as _It

    _dot_fn.__annotations__ = {
        "batches": _It[pd.Series], "return": _It[pd.Series],
    }
    margin = F.pandas_udf(_dot_fn, "long")(vector_to_array(F.col(feat)))
    keep = list(df.columns)
    cols = keep + [margin.alias(out_col)]
    if tokens_col:
        cols.append(F.size("_qc_words").alias(tokens_col))
    return out.select(*cols)


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 16,
    reg_param: float = 1e-4,
    max_iter: int = 50,
    use_bigrams: bool = True,
):
    """Fit the classifier on a labeled frame (label 1 = high quality).
    Returns the fitted ``PipelineModel`` — broadcastable, saveable with
    ``model.write().save(path)``, and scoreable JVM-side. Train on a
    SAMPLE (10⁵–10⁶ rows is the literature norm); score the full corpus.

    Memory shape of ``num_features``: Spark ML's LR training keeps DENSE
    per-dimension summarizer/gradient buffers (several double arrays of
    length 2·num_features with bigrams) per task, merged treewise — the
    knob costs executor HEAP during fit, independent of data size
    (verified: 2¹⁸ OOMs a 1 GB local JVM; 2¹⁶ ≈ 1 MB/buffer is safe
    anywhere). Scoring is sparse and unaffected. Raise toward 2²⁰ only
    with multi-GB executors; collision noise at 2¹⁶ costs ~1% accuracy
    on quality filtering (hashing-trick literature, Weinberger et al.).
    """
    train = labeled.withColumn("_qc_label", F.col(label_col).cast("double"))
    return _pipeline(
        text_col, num_features, reg_param, max_iter, use_bigrams
    ).fit(train)


def score_quality(
    df: DataFrame,
    model,
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Append P(high quality) to every row. Pure JVM transform — safe to
    run over the full corpus. Input column name must match training."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    keep = [c for c in df.columns]
    return scored.select(
        *keep, vector_to_array(F.col("_qc_prob"))[1].alias(out_col)
    )


def filter_by_quality(
    df: DataFrame,
    model,
    text_col: str = "text",
    threshold: float = 0.5,
    out_col: str = "quality_prob",
) -> DataFrame:
    """Keep rows with predicted quality ≥ threshold (CCNet-style keep
    rule; pair with ``perplexity_buckets`` for the full CCNet recipe)."""
    return score_quality(df, model, text_col, out_col).filter(
        F.col(out_col) >= threshold
    )
