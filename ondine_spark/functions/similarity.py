"""Similarity primitives: cosine, TF-IDF pair similarity, Jaccard, portable
hashing.

F10/F11 of the reference (TF-IDF 2-doc cosine for grounding:
ondine/context/text.py:33-72 and crates/ondine-core/src/text/mod.rs; dense
cosine: crates/ondine-core/src/evidence/store.rs:654-674), plus the
shingle/hash primitives the dedup operators build on.

All column functions here are pure JVM expressions (higher-order array
functions — whole-stage codegen, no Python). ``md5_long`` is deliberately
reproducible in ANSI SQL (``('0x'||substr(md5(x),1,15))::BIGINT`` in DuckDB)
so every hash-based operator stays oracle-checkable.
"""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import Column
from pyspark.sql import functions as F

# ------------------------------------------------------------ dense vectors

def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float/double> columns (JVM, no Python)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def finite_vector(col: Column) -> Column:
    """True iff the array is non-null and every component is a finite
    number. The corpus-hygiene predicate for every embedding consumer:
    a NaN/Inf component makes cosine NaN, and Spark's NaN ordering
    (NaN > everything) would rank such garbage FIRST in top-k windows
    and pass ``>= threshold`` pair filters; a single non-finite training
    row poisons a k-means mean; and a non-finite centroid renders an
    invalid SQL literal. Filter at ingestion, not per consumer."""
    return col.isNotNull() & F.forall(
        col,
        lambda x: x.isNotNull() & ~F.isnan(x) & (F.abs(x) < F.lit(float("inf"))),
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either norm is zero (reference
    semantics: evidence/store.rs:654-674 returns 0 for zero vectors)."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(d / (na * nb))


def sign_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket key: a '0101…' string with bit i =
    (vec · planes[i] >= 0). The plane matrix parses JVM-side from ONE SQL
    literal string — building it element-wise (a Column op per component)
    costs ~2 py4j round-trips each, ~1.5k driver-side calls at 8 planes ×
    64 dims, measured ~1 s of pure expression-construction time. ``D``
    suffixes keep the literals DOUBLE; ``repr`` round-trips bit-exactly."""
    sql = "array(" + ",".join(
        "array(" + ",".join(f"{float(x)!r}D" for x in p) + ")"
        for p in planes
    ) + ")"
    return F.array_join(
        F.transform(
            F.expr(sql),
            lambda p: F.when(dot(vec, p) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            ),
        ),
        "",
    )


def cosine_arrow(a: Column, b: Column) -> Column:
    """Arrow/numpy cosine for HIGH-VOLUME pair verification.

    Same math as :func:`cosine` (float64 dot / norms, 0.0 on zero norm)
    but vectorized in numpy over Arrow batches. The higher-order-function
    expression path is interpreted per element — fine for thousands of
    pairs, but a hot LSH bucket (mass-duplicated corpus) can emit millions
    of candidate pairs, where the expr path was measured ~40x slower than
    this kernel at sf1 (235 s -> ~6 s on the 2M-pair skew probe)."""
    import numpy as np
    import pandas as pd

    # NOTE: explicit Series annotations (not `from __future__ import
    # annotations` strings — those don't resolve for locally-imported pd)
    def _cos_fn(va, vb):
        if not len(va):
            return pd.Series([], dtype="float64")
        x = np.array(va.tolist(), dtype="float64")
        y = np.array(vb.tolist(), dtype="float64")
        d = (x * y).sum(axis=1)
        nx = np.sqrt((x * x).sum(axis=1))
        ny = np.sqrt((y * y).sum(axis=1))
        denom = nx * ny
        out = np.where(denom == 0, 0.0, d / np.where(denom == 0, 1.0, denom))
        return pd.Series(out)

    _cos_fn.__annotations__ = {"va": pd.Series, "vb": pd.Series,
                               "return": pd.Series}
    _cos = F.pandas_udf(_cos_fn, "double")
    return _cos(a, b)


# --------------------------------------------------------------- token sets

def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens (Python str.split parity: split on runs
    of whitespace, no empty tokens)."""
    t = F.split(F.trim(F.lower(col)), r"\s+")
    return F.filter(t, lambda x: x != "")


def let_bind(expr: Column, body) -> Column:
    """Evaluate ``expr`` ONCE and feed it to ``body`` (a Column→Column
    function) — ``transform(array(expr), x -> body(x))[1]``.

    Catalyst does not share common subexpressions across higher-order
    lambda bodies: an expression referenced inside ``transform`` re-runs
    per element. Binding it as the lambda variable makes it a per-row
    single evaluation (measured 5× on the shingle hot loop)."""
    return F.element_at(F.transform(F.array(expr), body), 1)


def word_ngrams(col: Column, n: int) -> Column:
    """Distinct word n-gram shingles of a text column (array<string>).

    The token array is let-bound so the split runs once per row; grams are
    built positionally with element_at (O(L·n) total, no array copies) —
    the shingle construction is the hot loop of every dedup operator."""
    return _word_ngrams(col, n, distinct=True)


def word_ngrams_all(col: Column, n: int) -> Column:
    """Positional (NON-distinct) word n-grams — one entry per window, in
    order. For repetition metrics where multiplicity is the signal."""
    return _word_ngrams(col, n, distinct=False)


def _word_ngrams(col: Column, n: int, distinct: bool) -> Column:
    dedup = F.array_distinct if distinct else (lambda c: c)
    toks = tokens(col)
    if n == 1:
        return dedup(toks)

    def build(t: Column) -> Column:
        # guard: sequence(1, m) with m < 1 is DESCENDING ([1, 0]) and the
        # element_at(t, 0) it produces throws under ANSI mode — docs
        # shorter than n words must yield an empty shingle array instead
        m = F.size(t) - n + 1
        idx = F.when(m >= 1, F.sequence(F.lit(1), m)).otherwise(
            F.array().cast("array<int>")
        )
        return dedup(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, i + k) for k in range(n)]
                ),
            )
        )

    return let_bind(toks, build)


def char_ngrams(col: Column, n: int) -> Column:
    """Distinct character n-gram shingles (for fingerprinting/minhash over
    short texts). Lowered string let-bound: one evaluation per row."""

    def build(s: Column) -> Column:
        # same ANSI guard as word_ngrams: m < 1 would make sequence descend
        m = F.length(s) - n + 1
        idx = F.when(m >= 1, F.sequence(F.lit(1), m)).otherwise(
            F.array().cast("array<int>")
        )
        grams = F.transform(idx, lambda i: F.substring(s, i, F.lit(n)))
        return F.array_distinct(F.filter(grams, lambda g: F.length(g) == n))

    return let_bind(F.lower(col), build)


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two array columns treated as sets."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )


# ----------------------------------------------------------- portable hashes

def md5_long(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative bigint. Identical in DuckDB:
    ``('0x' || substr(md5(x),1,15))::BIGINT`` — the portability contract
    that keeps MinHash/fingerprint operators oracle-checkable."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def seeded_md5_long(col: Column, seed: int) -> Column:
    return md5_long(F.concat(col, F.lit(f"#{seed}")))


def winnow_fingerprints(col: Column, k: int = 12, w: int = 8) -> Column:
    """Winnowing fingerprint set (Schleimer/Wilkerson/Aiken, SIGMOD 2003 —
    the MOSS algorithm): hash every character ``k``-gram of the lowercased
    text, slide a window of ``w`` consecutive hashes, keep each window's
    minimum, return the distinct minima as ``array<bigint>``.

    Guarantees: any shared substring of length >= k + w - 1 between two
    documents yields at least one shared fingerprint, so overlap on this
    set detects *substring-level* duplication (the signal suffix-array
    dedup uses) with ~1/w of the k-grams retained. Pure JVM expression;
    portable to the DuckDB oracle via ``md5_long``.

    Texts shorter than ``k`` get an empty set; texts with fewer than ``w``
    k-grams degrade to the single global minimum (one fingerprint).

    Every intermediate array is let-bound: Catalyst does not share
    subexpressions across higher-order lambdas, so an unbound ``hashes``
    array would be rebuilt (len(text) md5 calls) once *per window*,
    turning O(P·w) work into O(P²).
    """

    def build(s: Column) -> Column:
        p = F.greatest(F.length(s) - F.lit(k - 1), F.lit(0))

        def select_minima(hs: Column) -> Column:
            nw = F.size(hs) - F.lit(w - 1)
            wins = F.transform(
                F.sequence(F.lit(1), nw),
                lambda j: F.array_min(F.slice(hs, j, w)),
            )
            return F.when(nw >= 1, F.array_distinct(wins)).otherwise(
                F.array(F.array_min(hs))
            )

        hashes = F.transform(
            F.sequence(F.lit(1), p),
            lambda i: md5_long(F.substring(s, i, F.lit(k))),
        )
        # p >= 1 guard: sequence(1, 0) DESCENDS under ANSI — never build it
        return F.when(p >= 1, let_bind(hashes, select_minima)).otherwise(
            F.array().cast("array<bigint>")
        )

    return let_bind(F.lower(col), build)


# ------------------------------------------------- TF-IDF pair cosine (F10)

_WORD_RE = re.compile(r"[a-z0-9]+")


def _tf(text: str) -> Counter:
    return Counter(_WORD_RE.findall(text.lower()))


def tfidf_pair_cosine(a: str, b: str) -> float:
    """Exact port of the reference's 2-document TF-IDF cosine used for
    grounding (ondine/context/text.py:33-72): corpus = the two texts,
    smoothed idf = ln(N/df) + 1 with N=2, cosine over the union vocabulary.
    Pure Python — called inside pandas UDFs (grounding V1)."""
    ta, tb = _tf(a), _tf(b)
    if not ta or not tb:
        return 0.0
    vocab = set(ta) | set(tb)
    dots = na = nb = 0.0
    for w in vocab:
        df_w = (w in ta) + (w in tb)
        idf = math.log(2.0 / df_w) + 1.0
        wa = ta.get(w, 0) * idf
        wb = tb.get(w, 0) * idf
        dots += wa * wb
        na += wa * wa
        nb += wb * wb
    if na == 0 or nb == 0:
        return 0.0
    return dots / math.sqrt(na * nb)
