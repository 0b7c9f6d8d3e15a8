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
