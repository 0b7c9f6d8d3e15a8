"""Winnowing fingerprints (functions/similarity.py) and substring-overlap
pairs (operators/dedup.py).

Oracle: a literal Python transcription of Schleimer et al.'s definition —
md5 every k-gram, min per w-window, distinct — checked per document, plus
the algorithm's core guarantee (a shared substring of length >= k+w-1
always yields a shared fingerprint) on constructed texts.
"""

from __future__ import annotations

import hashlib
import itertools

import pytest
from pyspark.sql import functions as F

from ondine_spark.functions.similarity import winnow_fingerprints
from ondine_spark.operators.dedup import winnow_overlap_pairs


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _winnow_py(text: str, k: int, w: int) -> set[int]:
    s = text.lower()
    grams = [s[i : i + k] for i in range(len(s) - k + 1)]
    if not grams:
        return set()
    hs = [_md5_long(g) for g in grams]
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "key agg row scan slow fast table value part hash value table",
    "short",
    "",
    "x" * 30,  # degenerate: all k-grams identical -> one fingerprint
    "ab",  # shorter than k
    "abcdefghijklm",  # exactly one k-gram at k=12 (fewer than w windows)
]


@pytest.mark.parametrize("k,w", [(12, 8), (5, 4)])
def test_matches_python_oracle(spark, k, w):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "id long, text string"
    )
    got = {
        r["id"]: set(r["fps"])
        for r in df.select(
            "id", winnow_fingerprints(F.col("text"), k, w).alias("fps")
        ).collect()
    }
    for i, t in enumerate(TEXTS):
        assert got[i] == _winnow_py(t, k, w), f"text #{i}"


def test_shared_substring_guarantee(spark):
    # Any common substring of length >= k + w - 1 must produce at least one
    # common fingerprint (the winnowing paper's correctness property).
    k, w = 12, 8
    common = "zqxwvutsrqponmlkjihgfedcba"  # len 26 >= 12 + 8 - 1
    a = "prefix one two three " + common + " suffix alpha"
    b = "totally different lead-in " + common + " other tail"
    fa, fb = _winnow_py(a, k, w), _winnow_py(b, k, w)
    assert fa & fb
    df = spark.createDataFrame([(0, a), (1, b)], "id long, text string")
    got = {
        r["id"]: set(r["fps"])
        for r in df.select(
            "id", winnow_fingerprints(F.col("text"), k, w).alias("fps")
        ).collect()
    }
    assert got[0] & got[1]


def test_overlap_pairs_counts(spark):
    k, w = 5, 4
    texts = {
        1: "alpha beta gamma delta epsilon zeta eta theta",
        2: "alpha beta gamma delta epsilon zeta eta thorn",  # near-dup of 1
        3: "one two three four five six seven eight nine ten",
        4: "completely unrelated words with nothing in common here",
    }
    fps = {i: _winnow_py(t, k, w) for i, t in texts.items()}
    expect = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        shared = len(fps[a] & fps[b])
        if shared >= 3:
            expect[(a, b)] = shared
    assert (1, 2) in expect  # the construction really is a near-dup pair
    df = spark.createDataFrame(list(texts.items()), "id long, text string")
    got = {
        (r["a"], r["b"]): r["shared"]
        for r in winnow_overlap_pairs(
            df, "id", "text", k=k, w=w, min_shared=3, max_df=100, impl="expr"
        ).collect()
    }
    assert got == expect


def test_overlap_max_df_drops_hot_fingerprints(spark):
    # A fingerprint present in every doc is a stop-gram: with max_df=1 no
    # fingerprint survives, so no pairs at all.
    t = "the exact same sentence repeated everywhere in the corpus okay"
    df = spark.createDataFrame([(i, t) for i in range(4)], "id long, text string")
    assert (
        winnow_overlap_pairs(df, "id", "text", min_shared=1, max_df=1).count() == 0
    )
    # with the cap lifted, all 6 pairs appear
    assert (
        winnow_overlap_pairs(df, "id", "text", min_shared=1, max_df=10).count() == 6
    )


# --------------------------------------------------------- arrow fast path

def _winnow_poly_py(text: str, k: int, w: int) -> set[int]:
    """Python oracle for the Arrow kernel's polynomial hash variant."""
    m1, b1 = 2147483647, 131
    m2, b2 = 2147483629, 137
    s = text.lower().encode("utf-8", "surrogatepass")
    if len(s) < k:
        return set()
    hs = []
    for i in range(len(s) - k + 1):
        h1 = h2 = 0
        for c in s[i : i + k]:
            h1 = (h1 * b1 + c) % m1
            h2 = (h2 * b2 + c) % m2
        hs.append((h1 << 31) | h2)
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


@pytest.mark.parametrize("k,w", [(12, 8), (5, 4)])
def test_arrow_impl_matches_poly_oracle(spark, k, w):
    from ondine_spark.operators.dedup import winnow_fingerprint_rows

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "id long, text string"
    )
    rows = winnow_fingerprint_rows(df, "id", "text", k, w, impl="arrow").collect()
    got: dict[int, set[int]] = {}
    for r in rows:
        got.setdefault(r["_id"], set()).add(r["fp"])
    for i, t in enumerate(TEXTS):
        want = _winnow_poly_py(t, k, w)
        assert got.get(i, set()) == want, f"text #{i}"


def test_arrow_and_expr_find_same_pairs(spark):
    # hash functions differ, so fingerprint VALUES differ — but both impls
    # select window minima over the same k-gram positions, so clear
    # substring near-dups must surface as pairs under either.
    from ondine_spark.operators.dedup import winnow_overlap_pairs

    core = "the quick brown fox jumps over the lazy dog by the river bank today"
    texts = {
        1: "A " + core + " tail one",
        2: "B " + core + " tail two",
        3: "nothing like the others at all here truly",
    }
    df = spark.createDataFrame(list(texts.items()), "id long, text string")
    kw = dict(k=12, w=8, min_shared=3, max_df=10)
    p_expr = {(r["a"], r["b"]) for r in winnow_overlap_pairs(df, "id", "text", impl="expr", **kw).collect()}
    p_arrow = {(r["a"], r["b"]) for r in winnow_overlap_pairs(df, "id", "text", impl="arrow", **kw).collect()}
    assert p_expr == p_arrow == {(1, 2)}
