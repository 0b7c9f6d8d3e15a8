"""DSIR importance resampling: the LLR weights rank target-like text
above off-domain text, are exactly reproducible under repartitioning
(integer arithmetic end to end), and the Gumbel top-k resample is
seed-deterministic and weight-monotone in expectation."""

import math

import pytest
from pyspark.sql import functions as F

from ondine_spark.operators.importance import (
    dsir_llr_table,
    dsir_resample,
    dsir_weights,
)

TARGETY = [
    "the theorem follows from the lemma by induction on the structure",
    "we prove the bound by a standard counting argument over the lattice",
    "the proof of the corollary uses the triangle inequality twice",
    "by symmetry the integral vanishes and the theorem follows",
]
RAWY = [
    "click here for the best deals on shoes and free shipping today",
    "the weather tomorrow will be sunny with a light breeze from the west",
    "her favourite recipe needs butter sugar flour and three fresh eggs",
    "the football match ended in a draw after extra time last night",
]


@pytest.fixture(scope="module")
def corpora(spark):
    raw_rows = [(i, RAWY[i % 4] + f" filler{i % 7}") for i in range(80)] + [
        (100 + i, TARGETY[i % 4] + f" filler{i % 5}") for i in range(20)
    ]
    raw = spark.createDataFrame(raw_rows, ["doc_id", "text"])
    target = spark.createDataFrame(
        [(i, TARGETY[i % 4]) for i in range(12)], ["doc_id", "text"]
    )
    return raw, target


def test_weights_rank_target_like_docs_higher(spark, corpora):
    raw, target = corpora
    llr = dsir_llr_table(raw, target, "text", num_features=512,
                         use_bigrams=False)
    w = dsir_weights(raw, llr, "text", num_features=512, use_bigrams=False)
    rows = {r["doc_id"]: r["dsir_w_q"] for r in w.collect()}
    targety = [v for k, v in rows.items() if k >= 100]
    rawy = [v for k, v in rows.items() if k < 100]
    # every target-like doc outscores every off-domain doc
    assert min(targety) > max(rawy)


def test_weights_partition_invariant(spark, corpora):
    raw, target = corpora
    llr = dsir_llr_table(raw, target, "text", num_features=256,
                         use_bigrams=True)
    base = None
    for n in (1, 3, 17):
        w = dsir_weights(
            raw.repartition(n), llr, "text",
            num_features=256, use_bigrams=True,
        )
        got = sorted((r["doc_id"], r["dsir_w_q"]) for r in w.collect())
        if base is None:
            base = got
        assert got == base
    # and the table itself is partitioning-independent (integer counts)
    llr2 = dsir_llr_table(
        raw.repartition(17), target.repartition(3), "text",
        num_features=256, use_bigrams=True,
    )
    assert llr2 == llr


def test_llr_matches_hand_computation(spark):
    # one-word corpora: every token lands in one bucket; check the
    # add-alpha formula end to end on a 8-bucket table
    raw = spark.createDataFrame([(0, "aaa aaa aaa aaa")], ["doc_id", "text"])
    tgt = spark.createDataFrame([(0, "aaa")], ["doc_id", "text"])
    b = 8
    llr = dsir_llr_table(raw, tgt, "text", num_features=b, use_bigrams=False,
                         alpha=0.5, quant=1e6)
    hot = [i for i, v in enumerate(llr) if v != 0 and abs(v) > 1]
    assert len(hot) <= b
    # the bucket holding 'aaa': ln((1+.5)/(1+4)) - ln((4+.5)/(4+4))
    expect = round(1e6 * (
        (math.log(1.5) - math.log(1 + 0.5 * b))
        - (math.log(4.5) - math.log(4 + 0.5 * b))
    ))
    assert expect in llr
    # empty buckets still carry the N_t vs N_r normalizer offset because
    # the add-alpha denominators differ; check one
    empty = round(1e6 * (
        (math.log(0.5) - math.log(1 + 0.5 * b))
        - (math.log(0.5) - math.log(4 + 0.5 * b))
    ))
    assert llr.count(empty) == b - 1


def test_null_and_empty_text_get_zero_features(spark, corpora):
    raw, target = corpora
    llr = dsir_llr_table(raw, target, "text", num_features=64,
                         use_bigrams=False)
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "the theorem follows")],
        ["doc_id", "text"],
    )
    w = {r["doc_id"]: r["dsir_w_q"]
         for r in dsir_weights(df, llr, "text", num_features=64,
                               use_bigrams=False).collect()}
    assert w[0] == 0 and w[1] == 0 and w[2] != 0


def test_resample_deterministic_and_weight_monotone(spark, corpora):
    raw, target = corpora
    llr = dsir_llr_table(raw, target, "text", num_features=512,
                         use_bigrams=False)
    w = dsir_weights(raw, llr, "text", num_features=512, use_bigrams=False)
    a = sorted(r["doc_id"] for r in
               dsir_resample(w, "doc_id", "dsir_w_q", 25, seed=7).collect())
    b = sorted(r["doc_id"] for r in
               dsir_resample(w.repartition(13), "doc_id", "dsir_w_q", 25,
                             seed=7).collect())
    assert a == b and len(a) == 25
    # target-like docs (20% of corpus, much higher weight) should dominate
    # the sample at low temperature
    c = dsir_resample(w, "doc_id", "dsir_w_q", 20, seed=3,
                      temperature=0.05).collect()
    target_frac = sum(1 for r in c if r["doc_id"] >= 100) / len(c)
    assert target_frac >= 0.9
    # different seed, different sample (temperature high enough to mix)
    d = sorted(r["doc_id"] for r in
               dsir_resample(w, "doc_id", "dsir_w_q", 25, seed=8,
                             temperature=5.0).collect())
    assert d != a


def test_lut_modes_bit_identical(spark):
    """r6 verdict #5: the broadcast-join LLR path must be bit-identical
    to the literal path (same murmur3 buckets, exact-integer adds
    commute) at B = 2^14 — the size where both run comfortably."""
    import random

    from pyspark.sql import functions as F

    nf = 1 << 14
    rnd = random.Random(41)
    llr = [rnd.randint(-500_000, 500_000) for _ in range(2 * nf)]
    docs = spark.createDataFrame(
        [(i, f"alpha beta{i % 17} gamma{i % 5} delta epsilon{i}")
         for i in range(200)],
        ["doc_id", "text"],
    )
    lit = {
        r["doc_id"]: r["dsir_w_q"]
        for r in dsir_weights(
            docs, llr, "text", num_features=nf, use_bigrams=True,
            lut_mode="literal",
        ).collect()
    }
    bj = {
        r["doc_id"]: r["dsir_w_q"]
        for r in dsir_weights(
            docs, llr, "text", num_features=nf, use_bigrams=True,
            lut_mode="broadcast", id_col="doc_id",
        ).collect()
    }
    assert lit == bj
    # empty/null text folds to exactly 0 on both paths
    edge = spark.createDataFrame(
        [(1, ""), (2, None)], ["doc_id", "text"]
    )
    for mode, kw in (("literal", {}), ("broadcast", {"id_col": "doc_id"})):
        vals = {
            r["doc_id"]: r["dsir_w_q"]
            for r in dsir_weights(
                edge, llr, "text", num_features=nf, use_bigrams=True,
                lut_mode=mode, **kw,
            ).collect()
        }
        assert vals == {1: 0, 2: 0}, (mode, vals)

    # auto: >= crossover entries + id_col -> broadcast join in the plan;
    # literal when no id_col is given
    auto = dsir_weights(
        docs, llr, "text", num_features=nf, use_bigrams=True,
        lut_mode="auto", id_col="doc_id",
    )
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    no_id = dsir_weights(
        docs, llr, "text", num_features=nf, use_bigrams=True,
        lut_mode="auto",
    )
    plan2 = no_id._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan2
    # small tables stay literal even with an id
    small_llr = [1] * 512
    small = dsir_weights(
        docs, small_llr, "text", num_features=256, use_bigrams=True,
        lut_mode="auto", id_col="doc_id",
    )
    assert "BroadcastHashJoin" not in (
        small._jdf.queryExecution().executedPlan().toString()
    )


def test_lut_broadcast_exact_at_2_20(spark):
    """r6 verdict #5 'gate-equal at B=2^20': the literal path cannot run
    there (minutes of plan parse), so the broadcast-join weights are
    checked against an INDEPENDENT exact recomputation — buckets pulled
    from Spark's murmur3 via a tiny explode query, the fold redone in
    exact Python ints."""
    import random

    from pyspark.sql import functions as F

    from ondine_spark.operators.importance import _bigrams, _bucket, _tokens

    nf = 1 << 20
    rnd = random.Random(99)
    llr = [rnd.randint(-500_000, 500_000) for _ in range(2 * nf)]
    docs = spark.createDataFrame(
        [(i, f"zeta{i} eta{i % 7} theta iota{i % 3} kappa{i}")
         for i in range(30)],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["dsir_w_q"]
        for r in dsir_weights(
            docs, llr, "text", num_features=nf, use_bigrams=True,
            lut_mode="broadcast", id_col="doc_id",
        ).collect()
    }
    uni = docs.select(
        "doc_id", F.explode(_tokens("text")).alias("w")
    ).select("doc_id", _bucket(F.col("w"), nf).alias("b")).collect()
    big = docs.select(
        "doc_id", F.explode(_bigrams(_tokens("text"))).alias("w")
    ).select("doc_id", (_bucket(F.col("w"), nf) + nf).alias("b")).collect()
    expected = {i: 0 for i in range(30)}
    for r in list(uni) + list(big):
        expected[r["doc_id"]] += llr[r["b"]]
    assert got == expected
