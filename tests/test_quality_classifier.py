"""Learned quality classifier: separates fluent text from gibberish on a
synthetic labeled set, scores JVM-side, and composes with the CCNet
perplexity-bucket keep rule."""

import random

import pytest
from pyspark.sql import functions as F

from ondine_spark.operators.quality_classifier import (
    filter_by_quality,
    score_quality,
    train_quality_classifier,
)
from ondine_spark.operators.curation import perplexity_buckets
from ondine_spark.operators.text_analysis import unigram_perplexity

GOOD_TEMPLATES = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "she walked to the market and bought fresh bread for the family dinner",
    "scientists discovered a new species of butterfly in the mountain forest",
    "the committee approved the proposal after a long and careful discussion",
    "children played in the park while their parents watched from the bench",
    "the library opens early in the morning and closes late in the evening",
]


def _gibberish(rng):
    chars = "qxzjvkw@#$%^&*()[]{}0123456789"
    return " ".join(
        "".join(rng.choice(chars) for _ in range(rng.randint(2, 12)))
        for _ in range(rng.randint(5, 15))
    )


@pytest.fixture(scope="module")
def labeled(spark):
    rng = random.Random(7)
    rows = []
    for i in range(300):
        t = rng.choice(GOOD_TEMPLATES)
        words = t.split()
        rng.shuffle(words)  # varied but still natural-vocabulary text
        rows.append((i, t if i % 2 else " ".join(words), 1))
    for i in range(300, 600):
        rows.append((i, _gibberish(rng), 0))
    return spark.createDataFrame(rows, ["id", "text", "label"])


def test_classifier_separates_quality(spark, labeled):
    train = labeled.filter(F.col("id") % 5 != 0)
    test = labeled.filter(F.col("id") % 5 == 0)
    model = train_quality_classifier(train, "text", "label")
    scored = score_quality(test, model, "text")
    acc = scored.select(
        F.avg(
            ((F.col("quality_prob") >= 0.5).cast("int") == F.col("label"))
            .cast("double")
        ).alias("acc")
    ).first()["acc"]
    assert acc >= 0.95
    # output keeps the input schema + the score column only
    assert scored.columns == test.columns + ["quality_prob"]


def test_filter_by_quality(spark, labeled):
    model = train_quality_classifier(labeled, "text", "label")
    kept = filter_by_quality(labeled, model, "text", threshold=0.5)
    labels = [r["label"] for r in kept.select("label").collect()]
    assert len(labels) > 200  # most good rows survive
    assert sum(labels) / len(labels) >= 0.95  # survivors are the good rows


def test_scores_are_probabilities(spark, labeled):
    model = train_quality_classifier(labeled, "text", "label",
                                     use_bigrams=False)
    bounds = score_quality(labeled, model, "text").agg(
        F.min("quality_prob").alias("lo"), F.max("quality_prob").alias("hi")
    ).first()
    assert 0.0 <= bounds["lo"] <= bounds["hi"] <= 1.0


def test_perplexity_buckets_ccnet(spark, documents):
    docs = documents.select("doc_id", "text").limit(300)
    ppl = unigram_perplexity(docs, "doc_id", "text")
    bucketed = perplexity_buckets(ppl, "perplexity")
    counts = {r["ppl_bucket"]: r["count"] for r in
              bucketed.groupBy("ppl_bucket").count().collect()}
    n = sum(v for k, v in counts.items() if k is not None)
    # thirds within sketch tolerance
    assert counts.get("head", 0) == pytest.approx(n / 3, rel=0.2)
    assert counts.get("tail", 0) == pytest.approx(n / 3, rel=0.25)
    # bucket boundaries respect ordering: max(head ppl) <= min(tail ppl)
    head_max = bucketed.filter(F.col("ppl_bucket") == "head").agg(
        F.max("perplexity")
    ).first()[0]
    tail_min = bucketed.filter(F.col("ppl_bucket") == "tail").agg(
        F.min("perplexity")
    ).first()[0]
    assert head_max <= tail_min


def test_classifier_null_text_safe(spark):
    """Null text must neither crash fit (ML's RegexTokenizer NPEs on
    null) nor scoring; the coalesce guard lives INSIDE the pipeline so a
    saved model carries it."""
    from ondine_spark.operators.quality_classifier import (
        score_quality,
        train_quality_classifier,
    )

    rows = [
        (0, None, 0.0), (1, "low low low", 0.0),
        (2, "the quick brown fox", 1.0), (3, "", 0.0),
        (4, "the quick brown dog", 1.0), (5, "spam spam spam", 0.0),
    ]
    df = spark.createDataFrame(rows, "id int, text string, label double")
    model = train_quality_classifier(df, "text", "label",
                                     num_features=1 << 12, max_iter=10)
    out = {r["id"]: r["quality_prob"] for r in
           score_quality(df, model, "text").collect()}
    assert len(out) == 6
    # null and empty text score identically (both featurize to nothing)
    assert out[0] == pytest.approx(out[3])


def test_linear_margin_matches_model_raw_margin(spark, labeled):
    """linear_margin with 1e-6-quantized weights from a fitted model
    reproduces the model's raw decision value to within the quantization
    bound — the integer path is the oracle-gateable twin of the float
    scoring, not a different function."""
    from pyspark.ml.functions import vector_to_array

    from ondine_spark.operators.quality_classifier import linear_margin

    nf = 256
    model = train_quality_classifier(
        labeled, "text", "label", num_features=nf, max_iter=15,
    )
    lr = model.stages[-1]
    coefs_q = [int(round(c * 1_000_000)) for c in lr.coefficients.toArray()]
    icp_q = int(round(lr.intercept * 1_000_000))

    sample = labeled.limit(40)
    got = {
        r["id"]: (r["margin_q"], r["n_tok"])
        for r in linear_margin(
            sample, "text", coefs_q, icp_q, num_features=nf,
        ).collect()
    }
    raw = {
        r["id"]: (r["raw"][1], r["ntok"])
        for r in model.transform(sample)
        .select(
            "id", vector_to_array("_qc_raw").alias("raw"),
            F.size("_qc_words").alias("ntok"),
        )
        .collect()
    }
    assert set(got) == set(raw)
    for i in got:
        margin_q, n_tok = got[i]
        # quantization error: 0.5e-6 per nonzero term + intercept; with
        # uni+bigram terms bounded by 2*n_tok occurrences
        bound = (2 * n_tok + 1) * 0.6e-6 + 1e-9
        assert margin_q / 1e6 == pytest.approx(raw[i][0], abs=bound)
        assert n_tok == raw[i][1]


def test_linear_margin_null_and_empty_text(spark):
    """Null and empty text featurize to nothing: margin == intercept,
    n_tok == 0 (the null guard lives in the shared feature stages)."""
    from ondine_spark.operators.quality_classifier import linear_margin

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "the the")], "id int, text string"
    )
    coefs = [7] * 512
    out = {
        r["id"]: (r["margin_q"], r["n_tok"])
        for r in linear_margin(df, "text", coefs, 1000, 256).collect()
    }
    assert out[0] == (1000, 0)
    assert out[1] == (1000, 0)
    # "the the": one distinct unigram twice + one bigram = 3 hits of 7
    assert out[2] == (1000 + 21, 2)


def test_linear_margin_rejects_bad_coef_length(spark):
    from ondine_spark.operators.quality_classifier import linear_margin

    df = spark.createDataFrame([(0, "x")], "id int, text string")
    with pytest.raises(ValueError, match="expected 512"):
        linear_margin(df, "text", [1, 2, 3], 0, 256)
