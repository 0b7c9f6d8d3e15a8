"""Both jaccard plans (prefix-filter ≥0.25, counting <0.25) against a
pure-Python oracle on a seeded random corpus with planted near-dups.
Guards the plan-dispatch boundary and the lossless filters (prefix,
length-ratio) in operators/dedup.py.
"""

from __future__ import annotations

import random

import pytest

from ondine_spark.operators.dedup import ngram_jaccard_pairs

VOCAB = [f"w{i}" for i in range(40)]


def _corpus(n_docs=80, seed=11):
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(0, 30))]
        docs.append((i, " ".join(words)))
    # planted near-dups: copy an earlier doc and perturb a few words
    for i in range(n_docs, n_docs + 20):
        base = list(docs[rng.randrange(n_docs)][1].split())
        for _ in range(rng.randint(0, 3)):
            if base:
                base[rng.randrange(len(base))] = rng.choice(VOCAB)
        docs.append((i, " ".join(base)))
    return docs


def _grams(text, n=3):
    w = text.split()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _oracle(docs, threshold):
    sets = {i: _grams(t) for i, t in docs}
    out = set()
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            ga, gb = sets[a], sets[b]
            if not ga or not gb:
                continue
            inter = len(ga & gb)
            j = inter / (len(ga) + len(gb) - inter)
            if j >= threshold:
                out.add((a, b, round(j, 9)))
    return out


@pytest.mark.parametrize("threshold", [0.05, 0.2, 0.25, 0.4, 0.7])
def test_jaccard_plans_match_oracle(spark, threshold):
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    got = {
        (r.a, r.b, round(r.jaccard, 9))
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=threshold, max_shingle_freq=None
        ).collect()
    }
    assert got == _oracle(docs, threshold)
