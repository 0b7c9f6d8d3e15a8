"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference surface (SURVEY.md §7 phase 6): exact, n-gram Jaccard,
MinHash+LSH, SimHash, and embedding-cosine near-dup — the standard corpus
cleaning toolkit, each designed for 100 TB scale:

- exact: hash-groupBy, fully map-side combinable.
- n-gram Jaccard: inverted-index join on shingles (never a cross join);
  frequent-shingle cap bounds the candidate blowup on hot shingles.
- MinHash+LSH: signature → bands → bucket self-join. Hashes are md5-based
  (portable — the DuckDB oracle replays them exactly).
- SimHash: 64-bit signature; Hamming-≤k pairs found by the 4-block
  pigeonhole trick (block-equality join), not pairwise comparison.
- embedding near-dup: random-hyperplane LSH buckets → cosine verify.

All shuffles are on compact keys (hashes/buckets); every operator ends in
a pair list or a keep-set join, both broadcast-able when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ondine_spark.core.partitioning import spread_small
from ondine_spark.functions.similarity import (
    cosine,
    cosine_arrow,
    finite_vector,
    md5_long,
    seeded_md5_long,
    word_ngrams,
)

# ---------------------------------------------------------------- exact (D1)

def exact_dedup(
    df: DataFrame, key_cols: list[str], order_col: str, keep: str = "min"
) -> DataFrame:
    """Keep one row per key (min/max of ``order_col`` — deterministic).
    groupBy+join rather than a window: the aggregate is map-side
    combinable, so the shuffle carries one row per key, not per input row.
    """
    agg = F.min(order_col) if keep == "min" else F.max(order_col)
    keep_ids = df.groupBy(*key_cols).agg(agg.alias(order_col))
    return df.join(keep_ids, on=key_cols + [order_col], how="left_semi")


def normalized_text(col):
    """Canonical text for exact dedup: lowercase, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


# ------------------------------------------------- n-gram Jaccard pairs (D2)

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """All pairs (a < b) with word-n-gram Jaccard ≥ threshold.

    Inverted-index plan: explode distinct shingles → (optionally drop
    shingles appearing in > max_shingle_freq docs — stop-shingles produce
    quadratic candidates and almost never decide a pair) → self-join on
    shingle → count common shingles per pair → Jaccard from set sizes.
    Output: a, b, jaccard.
    """
    df = spread_small(df)
    grams = df.select(
        F.col(id_col).alias("_id"), word_ngrams(F.col(text_col), n).alias("_g")
    ).withColumn("_size", F.size("_g"))
    posting = grams.select(
        "_id", "_size", F.explode("_g").alias("_shingle")
    )
    if threshold < 0.25:
        # low threshold: the prefix is nearly the whole set, so prefix
        # filtering prunes nothing and its verify join only adds cost —
        # count common shingles directly from the full postings
        return _jaccard_by_counting(posting, threshold, max_shingle_freq)
    # persist: grams feeds BOTH candidate generation and the verify join —
    # without it the shingle explode (the expensive scan) runs three times
    grams = grams.persist()

    # PREFIX FILTERING (lossless, SSJoin literature): two sets with
    # Jaccard ≥ t must share at least one of each other's
    # (|S| - ceil(t·|S|) + 1) RAREST shingles. Only those prefix shingles
    # generate candidates — hot stop-shingles fall outside every prefix, so
    # the quadratic blowup on common phrases disappears while the result
    # set stays EXACT (candidates are verified against the full sets).
    freq = posting.groupBy("_shingle").agg(F.count(F.lit(1)).alias("_df"))
    if max_shingle_freq is not None:
        # optional approximation knob kept from the previous plan: ignore
        # shingles appearing in more docs than the cap entirely
        freq = freq.filter(F.col("_df") <= max_shingle_freq)
    size_agg = F.first("_size")
    prefix_len = (
        size_agg - F.ceil(F.lit(threshold) * size_agg) + 1
    ).cast("int")
    ranked = (
        posting.join(freq, on="_shingle")
        .groupBy("_id")
        .agg(
            F.first("_size").alias("_size"),
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct("_df", "_shingle"))
                ),
                1,
                F.greatest(prefix_len, F.lit(1)),
            ).alias("_prefix"),
        )
    )
    # doc lists sorted by size → the length filter (lossless:
    # jaccard ≤ min/max sizes, so require min ≥ t·max) runs inside the
    # pair lambda and pruned candidates never materialize
    members = (
        ranked.select(
            F.struct(F.col("_size"), F.col("_id")).alias("_doc"),
            F.explode("_prefix").alias("_ps"),
        )
        .groupBy(F.col("_ps._shingle").alias("_shingle"))
        .agg(F.sort_array(F.collect_list("_doc")).alias("_docs"))
    )
    pairs = F.flatten(
        F.transform(
            "_docs",
            lambda x, i: F.transform(
                F.filter(
                    F.slice(
                        F.col("_docs"), i + 2,
                        F.greatest(F.size("_docs") - i - 1, F.lit(0)),
                    ),
                    lambda y: x["_size"] >= F.lit(threshold) * y["_size"],
                ),
                lambda y: F.struct(
                    F.least(x["_id"], y["_id"]).alias("a"),
                    F.greatest(x["_id"], y["_id"]).alias("b"),
                    (x["_size"] + y["_size"]).alias("_ss"),
                ),
            ),
        )
    )
    cand = (
        members.select(F.explode(pairs).alias("_p"))
        .select("_p.a", "_p.b", "_p._ss")
        .dropDuplicates(["a", "b"])
    )
    # exact verify on the candidate set only
    ga = grams.select(F.col("_id").alias("a"), F.col("_g").alias("_ga"))
    gb = grams.select(F.col("_id").alias("b"), F.col("_g").alias("_gb"))
    common = (
        cand.join(ga, on="a")
        .join(gb, on="b")
        .withColumn("_common", F.size(F.array_intersect("_ga", "_gb")))
        .drop("_ga", "_gb")
    )
    return (
        common.withColumn(
            "jaccard",
            F.col("_common") / (F.col("_ss") - F.col("_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def _jaccard_by_counting(
    posting: DataFrame, threshold: float, max_shingle_freq: int | None
) -> DataFrame:
    """Count-based exact plan: single scan, pair commons counted from the
    postings themselves (the doc's set size travels WITH each posting row,
    so no joins back to the input).

    Length filter (lossless): jaccard(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so
    any pair with min < t·max can be dropped BEFORE it reaches the pair
    shuffle. Doc lists are size-sorted so the filter applies during pair
    generation — pruned pairs are never materialized. The symmetric
    formula needs only |A|+|B|, so each pair carries one size-sum field.

    Pair generation is ONE shuffle (repartition on the shingle) + ONE
    streaming numpy pass (``mapInPandas`` over shingle-sorted
    partitions): per-group work is plain array slicing, so 150K tiny
    groups cost microseconds each (a groupBy().applyInPandas variant
    paid ~0.2 ms of pandas machinery PER GROUP — 16x slower at sf0.1 —
    and the original nested higher-order-function expression is
    interpreted per element, which a capped 1,000-doc stop-shingle turns
    into 500K interpreted pair expansions). Groups spanning Arrow
    batches are carried over inside the partition iterator.

    The ``max_shingle_freq`` cap is enforced INSIDE the kernel (r8): a
    group's size within the shingle-sorted partition IS the shingle's
    document frequency, so capped groups are skipped with one length
    check. The previous pre-filter (``groupBy(_shingle).count`` + join
    back) re-evaluated the shingle explode — the expensive CPU stage —
    a second time and added two exchanges for the same result set. At
    cluster scale a stop-shingle's postings now cross the one shuffle
    before being dropped (they used to be dropped map-side after the
    freq join), but they crossed that join's own shuffle anyway unless
    the keep-list broadcast; the capped group is skipped after a local
    sort, never expanded to pairs.
    """
    import numpy as np
    import pandas as pd

    max_df = max_shingle_freq if max_shingle_freq is not None else (1 << 62)
    id_dtype = dict(posting.dtypes)["_id"]
    thr = float(threshold)

    def gen_pairs(batches):
        def flush(pdf: pd.DataFrame):
            ids = pdf["_id"].to_numpy()
            sz = pdf["_size"].to_numpy(dtype="int64")
            sh = pdf["_shingle"].to_numpy()
            # group boundaries in the sorted batch
            starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
            ends = np.r_[starts[1:], len(sh)]
            outs_a, outs_b, outs_ss = [], [], []
            for s, e in zip(starts, ends):
                n = e - s
                if n < 2 or n > max_df:
                    continue
                gid, gsz = ids[s:e], sz[s:e]
                # sorted by (_shingle, _size): position i<j => size i<=j,
                # so the lossless length filter is min >= t*max
                ii, jj = np.nonzero(gsz[:, None] >= thr * gsz[None, :])
                m = ii < jj
                a, b = gid[ii[m]], gid[jj[m]]
                outs_a.append(np.minimum(a, b))
                outs_b.append(np.maximum(a, b))
                outs_ss.append(gsz[ii[m]] + gsz[jj[m]])
            if not outs_a:
                return None
            return pd.DataFrame({
                "a": np.concatenate(outs_a),
                "b": np.concatenate(outs_b),
                "_ss": np.concatenate(outs_ss),
            })

        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last = pdf["_shingle"].iloc[-1]
            is_last = (pdf["_shingle"] == last).to_numpy()
            carry = pdf[is_last]
            body = pdf[~is_last]
            out = flush(body) if len(body) else None
            if out is not None:
                yield out
        if carry is not None and len(carry):
            out = flush(carry)
            if out is not None:
                yield out

    common = (
        posting.repartition("_shingle")
        .sortWithinPartitions("_shingle", "_size", "_id")
        .mapInPandas(
            gen_pairs, schema=f"a {id_dtype}, b {id_dtype}, _ss long"
        )
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("_common"),
            F.first("_ss").alias("_ss"),
        )
    )
    return (
        common.withColumn(
            "jaccard",
            F.col("_common") / (F.col("_ss") - F.col("_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ------------------------------------------------------- MinHash + LSH (D3)

MINHASH_PRIME = (1 << 61) - 1  # Mersenne prime, shared with the oracle SQL
_MASK31 = (1 << 31) - 1
_MASK30 = (1 << 30) - 1


def minhash_coeffs(i: int) -> tuple[int, int]:
    """Deterministic per-permutation affine coefficients (a_i, b_i) for
    h_i(s) = (a_i·h(s) + b_i) mod (2⁶¹−1) — md5-derived so Spark and the
    DuckDB oracle inline the SAME constants."""
    import hashlib

    a = int.from_bytes(
        hashlib.md5(f"mh:a:{i}".encode()).digest()[:8], "big"
    ) % (MINHASH_PRIME - 1) + 1
    b = int.from_bytes(
        hashlib.md5(f"mh:b:{i}".encode()).digest()[:8], "big"
    ) % MINHASH_PRIME
    return a, b


def _cw_hash_expr(hh, hl, i: int):
    """(a_i·h + b_i) mod (2⁶¹−1) over the base hash's 31-bit limbs
    (h = hh·2³¹ + hl, h < 2⁶⁰), in pure bigint arithmetic — Spark has no
    int128, so the 61×60-bit product folds via 2⁶¹ ≡ 1 (mod p):
    a·h = a_hi·h_hi·2⁶² + (a_hi·h_lo + a_lo·h_hi)·2³¹ + a_lo·h_lo
        ≡ 2·a_hi·h_hi + cross_hi + cross_lo·2³¹ + a_lo·h_lo
    where cross = cross_hi·2³⁰ + cross_lo (2³⁰·2³¹ = 2⁶¹ ≡ 1). Every
    intermediate stays under 2⁶³ (worst sum < 1.75·2⁶²). The oracle
    computes the same value directly with HUGEINT."""
    a, b = minhash_coeffs(i)
    a_hi, a_lo = a >> 31, a & _MASK31
    term1 = F.lit(2 * a_hi) * hh  # a_hi < 2³⁰, hh < 2²⁹ → < 2⁶⁰
    cross = F.lit(a_hi) * hl + F.lit(a_lo) * hh  # < 2⁶²
    c_hi = F.shiftright(cross, 30)
    c_lo = cross.bitwiseAND(F.lit(_MASK30))
    term3 = F.lit(a_lo) * hl  # < 2⁶²
    s = (term1 + c_hi + c_lo * F.lit(1 << 31) + term3) % F.lit(MINHASH_PRIME)
    return (s + F.lit(b)) % F.lit(MINHASH_PRIME)


def _minhash_sig_kernel(num_hashes: int):
    """Arrow-batch kernel: per row, ``sig[i] = min over base hashes of
    (a_i·h + b_i) mod (2⁶¹−1)`` — the exact int64 limb arithmetic of
    :func:`_cw_hash_expr`, vectorized over the batch's flattened hash
    values with one ``np.minimum.reduceat`` per permutation. Rows with a
    null/empty hash array are dropped (same contract as the expression
    form's ``sig[0] IS NOT NULL`` filter)."""
    coeffs = [minhash_coeffs(i) for i in range(num_hashes)]

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            arrs, keep = [], []
            for idx, a in enumerate(pdf["_hs"].values):
                if a is None:
                    continue
                arr = np.asarray(a, dtype=np.int64)
                if arr.size:
                    arrs.append(arr)
                    keep.append(idx)
            if not arrs:
                yield pd.DataFrame(
                    {"_id": pdf["_id"].iloc[:0],
                     "sig": pd.Series([], dtype=object)}
                )
                continue
            lens = np.array([len(a) for a in arrs])
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            v = np.concatenate(arrs)
            hh = v >> 31
            hl = v & _MASK31
            sigs = np.empty((num_hashes, len(arrs)), dtype=np.int64)
            for i, (a, b) in enumerate(coeffs):
                a_hi, a_lo = a >> 31, a & _MASK31
                cross = a_hi * hl + a_lo * hh
                s = (
                    2 * a_hi * hh
                    + (cross >> 30)
                    + ((cross & _MASK30) << 31)
                    + a_lo * hl
                ) % MINHASH_PRIME
                sigs[i] = np.minimum.reduceat((s + b) % MINHASH_PRIME, starts)
            yield pd.DataFrame(
                {
                    "_id": pdf["_id"].iloc[keep].reset_index(drop=True),
                    "sig": [sigs[:, j].tolist() for j in range(len(arrs))],
                }
            )

    return gen


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 32, ngram: int = 3
) -> DataFrame:
    """Per-doc MinHash signature, datasketch-style: ONE md5 per shingle
    gives the 60-bit base hash h(s); permutation i is the affine map
    h_i(s) = (a_i·h(s) + b_i) mod (2⁶¹−1) with fixed md5-derived
    coefficients — independent permutations across i (a correlated
    variant sharing per-shingle randomness across i was measured to
    inflate est_jaccard badly: 86% of emitted pairs below true
    jaccard 0.05). The DuckDB oracle replays h(s) from the same md5
    substring and the affine map with HUGEINT.

    Split across the JVM/Arrow boundary by what each side is good at
    (r8): shingling and the per-shingle md5 stay JVM expressions
    (measured ~0.33 s at sf0.1 — string work inside codegen), while the
    ``num_hashes`` affine maps + mins run as ONE vectorized Arrow kernel
    over the flattened base-hash arrays (:func:`_minhash_sig_kernel`,
    bit-identical int64 limb math). The previous all-expression form
    paid ~15 interpreted Catalyst nodes × num_hashes per shingle inside
    nested higher-order lambdas — 2.68 s at sf0.1 vs 0.33 s for
    everything up to the base hashes; the kernel does the same
    arithmetic at numpy speed. Only (_id, array<bigint>) crosses the
    boundary — the text and shingle strings never leave the JVM.

    ZERO algorithmic shuffles either way. Output: id, sig
    array<bigint>; docs with no shingles are excluded.
    """
    grams = word_ngrams(F.col(text_col), ngram)  # already distinct
    id_type = dict(df.dtypes)[id_col]
    base = spread_small(df).select(
        F.col(id_col).alias("_id"),
        F.transform(grams, lambda s: md5_long(s)).alias("_hs"),
    )
    return base.mapInPandas(
        _minhash_sig_kernel(num_hashes),
        f"_id {id_type}, sig array<bigint>",
    )


def minhash_band_rows(
    sig: DataFrame, num_hashes: int, bands: int
) -> DataFrame:
    """Explode signatures into LSH band rows (_id, sig, band, key): one row
    per band, key = the band's signature slice joined as a string. Shared
    by batch pair-finding and the streaming signature store."""
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands
    return sig.select(
        "_id",
        "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.concat_ws(",", *[F.col("sig")[i * r + j].cast("string") for j in range(r)]).alias("key"),
                )
                for i in range(bands)
            ])
        ).alias("bk"),
    ).select("_id", "sig", "bk.band", "bk.key")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    ngram: int = 3,
    threshold: float | None = None,
    max_bucket_size: int | None = None,
    connectivity_only: bool = False,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding; optionally verify with the
    MinHash Jaccard estimate (matching rows of the signature).

    bands must divide num_hashes; rows-per-band r = num_hashes/bands gives
    the usual S-curve (collision prob = 1-(1-s^r)^b).
    Output: a, b, est_jaccard (signature agreement rate).

    ``connectivity_only`` (r9, guide §2.3 — shuffle decisions, not
    payloads): for consumers that only CLUSTER the pairs (connected
    components, near-dedup keep), the full pair set is massively
    redundant — a mass-duplicated corpus emits O(k²) pairs per k-doc
    bucket, all of which collapse into one component anyway (measured:
    50K docs → 11.4M pairs at the sf1h heaps corpus, pushing CC onto
    the distributed star path). In this mode the SAME pair detection
    feeds a bucket-local union-find and only a star forest per
    bucket-component is emitted — O(k) rows, ``(a, b)`` with no
    ``est_jaccard``. The union of per-bucket forests preserves each
    bucket subgraph's connectivity, and the pair graph is exactly the
    union of bucket subgraphs, so connected_components over the forest
    is IDENTICAL to connected_components over the full pair set
    (pinned by tests/test_dedup_clusters.py).

    ``max_bucket_size`` is the occupancy guard (SCALE.md sf10 lesson:
    pair enumeration is linear in rows + true pairs ONLY while bucket
    occupancy stays bounded): a (band, key) bucket larger than the cap is
    skipped entirely — an explicit recall-for-bound trade, the banding
    analog of jaccard's ``max_shingle_freq`` stop-shingles. A bucket that
    hot means either mass duplication (run exact/minhash DEDUP first —
    ``near_dedup`` composes them in that order) or a saturated signature
    space (raise num_hashes/bands). Default None = exact enumeration.
    """
    sig = minhash_signature(df, id_col, text_col, num_hashes, ngram)
    band_rows = minhash_band_rows(sig, num_hashes, bands)

    # Per-(band,key)-bucket numpy verify, NOT a band self-join: the join
    # shipped BOTH full signatures per candidate row and a mass-duplicated
    # corpus makes one band bucket quadratic (sf1 skew probe: a 5,000-doc
    # cluster -> 12.5M candidates x 4 bands = 50M pre-dedup join rows).
    # Here each signature travels once per band row; the quadratic part is
    # a blocked element-equality count inside the group, and sub-threshold
    # pairs never materialize. est_jaccard = #equal/num_hashes is an exact
    # integer ratio — bit-identical to the join path and the SQL oracle.
    import numpy as np
    import pandas as pd

    id_type = dict(df.dtypes)[id_col]
    thr = float(threshold) if threshold is not None else None
    nh, nb = num_hashes, bands
    r = num_hashes // bands

    own = max_bucket_size is None  # see ownership note below

    def one_bucket(ids, S, band_k, outs):
        """Emit pairs for one (band, key) bucket (ids sorted ascending)."""
        if len(ids) < 2:
            return
        if max_bucket_size is not None and len(ids) > max_bucket_size:
            return  # occupancy guard: documented approximation
        block = 1024
        for i0 in range(0, len(ids), block):
            # eqpos[i, j, h]: hash position h matches
            eqpos = S[i0 : i0 + block, None, :] == S[None, :, :]
            est = eqpos.sum(axis=2) / nh
            # FIRST-band ownership: a colliding pair is emitted only by
            # the earliest band whose slice matches — globally unique
            # output, so no cross-band duplicate emission and NO dedup
            # shuffle (the sf1 hot cluster emitted every pair from all 4
            # bands: 50M rows to dedup down to 12.5M).
            # Ownership note: with the occupancy cap active, a pair's
            # first-matching band may have been a SKIPPED hot bucket, so
            # ownership would silently drop pairs recoverable from later
            # small buckets — capped mode emits from every surviving
            # bucket and dedups instead (bounded volume by construction).
            band_all = eqpos.reshape(
                eqpos.shape[0], eqpos.shape[1], nb, r
            ).all(axis=3)
            if own:
                mask = band_all.argmax(axis=2) == band_k
            else:
                mask = band_all[:, :, band_k]
            if thr is not None:
                mask &= est >= thr
            ii, jj = np.nonzero(mask)
            gi = ii + i0
            m = gi < jj  # ids sorted -> position order == id order
            if m.any():
                outs.append((ids[gi[m]], ids[jj[m]], est[ii[m], jj[m]]))

    def one_bucket_cc(ids, S, band_k, outs):
        """Connectivity mode: identical pair detection, but the passing
        pairs of this bucket feed an in-kernel union-find (the same
        min-hooking + full-shortcutting iteration as the driver CC) and
        only (root, node) star edges are emitted. Blocks update the
        parent array incrementally — union is order-independent — so the
        O(k²) pair volume never materializes anywhere."""
        if len(ids) < 2:
            return
        if max_bucket_size is not None and len(ids) > max_bucket_size:
            return  # occupancy guard: documented approximation
        k = len(ids)
        parent = np.arange(k, dtype=np.int64)
        block = 1024
        for i0 in range(0, k, block):
            eqpos = S[i0 : i0 + block, None, :] == S[None, :, :]
            est = eqpos.sum(axis=2) / nh
            band_all = eqpos.reshape(
                eqpos.shape[0], eqpos.shape[1], nb, r
            ).all(axis=3)
            if own:
                mask = band_all.argmax(axis=2) == band_k
            else:
                mask = band_all[:, :, band_k]
            if thr is not None:
                mask &= est >= thr
            ii, jj = np.nonzero(mask)
            gi = ii + i0
            m = gi < jj
            cu, cv = gi[m], jj[m]
            if not len(cu):
                continue
            while True:
                pu, pv = parent[cu], parent[cv]
                hi = np.maximum(pu, pv)
                lo = np.minimum(pu, pv)
                before = parent.copy()
                np.minimum.at(parent, hi, lo)
                while True:
                    pp = parent[parent]
                    if np.array_equal(pp, parent):
                        break
                    parent = pp
                if np.array_equal(parent, before):
                    break
        non_root = parent != np.arange(k)
        if non_root.any():
            # ids sorted ascending -> the min-position root IS the
            # min-id member; a < b holds for every emitted edge
            outs.append((ids[parent[non_root]], ids[non_root]))

    def gen_pairs(batches):
        """Streaming pass over (band,key)-sorted partitions: group
        boundaries via array compares, per-group numpy — tiny buckets
        cost microseconds (a groupBy().applyInPandas variant paid ~0.2 ms
        pandas machinery per bucket: 5x slower at sf0.1 where nearly all
        20K buckets are singletons). Buckets spanning Arrow batches carry
        over inside the partition iterator."""

        def flush(pdf: pd.DataFrame):
            bandv = pdf["band"].to_numpy()
            keyv = pdf["key"].to_numpy()
            ids = pdf["_id"].to_numpy()
            S = np.array(pdf["sig"].tolist(), dtype="int64")
            newg = np.r_[True, (bandv[1:] != bandv[:-1]) | (keyv[1:] != keyv[:-1])]
            starts = np.flatnonzero(newg)
            ends = np.r_[starts[1:], len(ids)]
            outs: list = []
            bucket_fn = one_bucket_cc if connectivity_only else one_bucket
            for s, e in zip(starts, ends):
                bucket_fn(ids[s:e], S[s:e], int(bandv[s]), outs)
            if not outs:
                return None
            cols = {
                "a": np.concatenate([o[0] for o in outs]),
                "b": np.concatenate([o[1] for o in outs]),
            }
            if not connectivity_only:
                cols["est_jaccard"] = np.concatenate([o[2] for o in outs])
            return pd.DataFrame(cols)

        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_b, last_k = pdf["band"].iloc[-1], pdf["key"].iloc[-1]
            is_last = ((pdf["band"] == last_b) & (pdf["key"] == last_k)).to_numpy()
            carry = pdf[is_last]
            body = pdf[~is_last]
            out = flush(body) if len(body) else None
            if out is not None:
                yield out
        if carry is not None and len(carry):
            out = flush(carry)
            if out is not None:
                yield out

    schema = (
        f"a {id_type}, b {id_type}"
        if connectivity_only
        else f"a {id_type}, b {id_type}, est_jaccard double"
    )
    out = (
        band_rows.repartition("band", "key")
        .sortWithinPartitions("band", "key", "_id")
        .mapInPandas(gen_pairs, schema=schema)
    )
    if max_bucket_size is not None:
        # capped mode emits per surviving bucket (see ownership note)
        out = out.dropDuplicates(["a", "b"])
    return out


# ----------------------------------------------- winnowing substring overlap

def _winnow_arrow_fn(k: int, w: int):
    """Arrow-batch winnowing kernel: byte-level polynomial k-gram hashes
    (two 31-bit rolling hashes packed into one 62-bit int) + numpy
    sliding-window min, vectorized across the WHOLE batch (r8): all
    docs' lowered utf-8 bytes are concatenated into one buffer, the k
    multiply-add passes run over that single array with ONE deferred
    modulo each (k products of < 2⁴⁰ sum below 2⁶³, and modular
    reduction commutes with the deferred sum — bit-identical, measured
    ~4.7× on the hash passes), the width-w window min is w−1 shifted
    ``np.minimum`` passes (no strided gather), and the per-doc distinct
    runs as consecutive-dup drop + one lexsort. Positions straddling doc
    boundaries are excluded by construction (window starts are generated
    per doc). The previous per-doc loop paid ~25 small-array numpy
    dispatches per document."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        m1, b1 = 2147483647, 131
        m2, b2 = 2147483629, 137
        pw1 = np.array([pow(b1, k - 1 - j, m1) for j in range(k)], dtype=np.int64)
        pw2 = np.array([pow(b2, k - 1 - j, m2) for j in range(k)], dtype=np.int64)
        empty = np.array([], dtype=np.int64)
        for pdf in batches:
            bufs: list = []
            keep: list = []
            for idx, text in enumerate(pdf["_text"].values):
                if text is None:
                    continue
                b = text.lower().encode("utf-8", "surrogatepass")
                if len(b) >= k:  # p >= 1
                    bufs.append(b)
                    keep.append(idx)
            ids_kept = pdf["_id"].values[keep] if keep else empty
            if not bufs:
                yield pd.DataFrame(
                    {"_id": pd.Series(empty, dtype=pdf["_id"].dtype),
                     "fp": empty}
                )
                continue
            lens = np.array([len(b) for b in bufs], dtype=np.int64)
            s = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.int64)
            offs = np.concatenate(([0], np.cumsum(lens)))
            P = int(offs[-1]) - k + 1
            h1 = np.zeros(P, dtype=np.int64)
            h2 = np.zeros(P, dtype=np.int64)
            for j in range(k):
                seg = s[j : j + P]
                h1 += seg * pw1[j]
                h2 += seg * pw2[j]
            h1 %= m1
            h2 %= m2
            hs = (h1 << 31) | h2
            p_d = lens - k + 1  # valid k-gram starts per doc (all >= 1)
            id_chunks: list = []
            fp_chunks: list = []
            W = P - w + 1
            nw_d = np.where(p_d >= w, p_d - w + 1, 0)
            tot_w = int(nw_d.sum())
            if W > 0 and tot_w:
                wmin = hs[:W].copy()
                for shift in range(1, w):
                    np.minimum(wmin, hs[shift : shift + W], out=wmin)
                doc_idx = np.repeat(np.arange(len(lens)), nw_d)
                within = np.arange(tot_w) - np.repeat(
                    np.cumsum(nw_d) - nw_d, nw_d
                )
                vals = wmin[offs[doc_idx] + within]
                dup = np.zeros(tot_w, dtype=bool)
                dup[1:] = (doc_idx[1:] == doc_idx[:-1]) & (
                    vals[1:] == vals[:-1]
                )
                doc_idx, vals = doc_idx[~dup], vals[~dup]
                order = np.lexsort((vals, doc_idx))
                d_s, f_s = doc_idx[order], vals[order]
                first = np.ones(len(d_s), dtype=bool)
                first[1:] = (d_s[1:] != d_s[:-1]) | (f_s[1:] != f_s[:-1])
                id_chunks.append(ids_kept[d_s[first]])
                fp_chunks.append(f_s[first])
            small = np.flatnonzero(p_d < w)
            if len(small):
                sm = np.array(
                    [
                        hs[int(offs[d]) : int(offs[d]) + int(p_d[d])].min()
                        for d in small
                    ],
                    dtype=np.int64,
                )
                id_chunks.append(ids_kept[small])
                fp_chunks.append(sm)
            yield pd.DataFrame(
                {
                    "_id": pd.Series(
                        np.concatenate(id_chunks) if id_chunks else empty,
                        dtype=pdf["_id"].dtype,
                    ),
                    "fp": np.concatenate(fp_chunks) if fp_chunks else empty,
                }
            )

    return gen


def winnow_fingerprint_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 12,
    w: int = 8,
    impl: str = "arrow",
) -> DataFrame:
    """One row per (document, winnowed fingerprint): ``_id``, ``fp``.

    ``impl="arrow"`` (default): vectorized numpy kernel over mapInPandas —
    the throughput path. ``impl="expr"``: pure JVM expression built on
    ``md5_long`` — bit-reproducible in ANSI SQL, used by the correctness
    gates. Same algorithm, different hash functions, so fingerprint VALUES
    differ between impls but the selected substring windows are the same.

    The per-doc set is distinct by construction, so ``count(*)`` grouped by
    ``fp`` IS the document frequency — no count-distinct needed downstream.
    62-bit hashes: at ~10¹² corpus fingerprints birthday collisions exist
    but only add noise pairs that the ``min_shared`` co-occurrence floor
    filters out.
    """
    # single-file local inputs arrive as ONE partition, serializing the
    # CPU-heavy fingerprint stage (kernel or md5 expressions) on one
    # core; spread_small is a no-op on many-split cluster scans
    df = spread_small(df)
    if impl == "arrow":
        id_type = dict(df.dtypes)[id_col]
        return df.select(
            F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
        ).mapInPandas(_winnow_arrow_fn(k, w), f"_id {id_type}, fp long")
    from ondine_spark.functions.similarity import winnow_fingerprints

    return df.select(
        F.col(id_col).alias("_id"),
        F.explode(winnow_fingerprints(F.col(text_col), k, w)).alias("fp"),
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 12,
    w: int = 8,
    min_shared: int = 10,
    max_df: int = 20,
    impl: str = "arrow",
) -> DataFrame:
    """Substring-level near-dup pairs: documents sharing >= ``min_shared``
    winnowed fingerprints (any shared substring of length k+w-1 or more
    contributes — the signal suffix-array dedup pipelines use, without the
    suffix array).

    Scale shape: fingerprint rows → ONE hash shuffle on ``fp`` + local
    sort → streaming numpy pair kernel (df cap enforced by group length)
    → groupBy(a, b) count. All keys are bigints.

    Output: ``a``, ``b``, ``shared`` (number of co-occurring fingerprints).
    """
    import numpy as np
    import pandas as pd

    rows = winnow_fingerprint_rows(df, id_col, text_col, k, w, impl=impl)
    id_dtype = dict(rows.dtypes)["_id"]

    # Pair generation is ONE shuffle (repartition on the fingerprint) +
    # one streaming numpy pass over fp-sorted partitions — the same shape
    # as ``_jaccard_by_counting`` (r8). A group's length within the
    # sorted partition IS the fingerprint's document frequency, so
    # "stop-grams" seen in more than ``max_df`` documents (boilerplate —
    # without the cap a fingerprint in f docs emits C(f,2) pairs) are
    # skipped with one length check. The previous
    # ``groupBy(fp).agg(collect_list)`` + nested ``F.transform`` pair
    # expansion materialized n² interpreted structs per fingerprint;
    # per-doc fingerprints are distinct by construction and ids within a
    # group are sorted ascending, so ``np.triu_indices`` emits exactly
    # the a < b pairs the expression form produced.
    def gen_pairs(batches):
        def flush(pdf: pd.DataFrame):
            ids = pdf["_id"].to_numpy()
            fp = pdf["fp"].to_numpy()
            starts = np.flatnonzero(np.r_[True, fp[1:] != fp[:-1]])
            ends = np.r_[starts[1:], len(fp)]
            outs_a, outs_b = [], []
            for s, e in zip(starts, ends):
                n = e - s
                if n < 2 or n > max_df:
                    continue
                ii, jj = np.triu_indices(n, 1)
                gid = ids[s:e]
                outs_a.append(gid[ii])
                outs_b.append(gid[jj])
            if not outs_a:
                return None
            return pd.DataFrame(
                {"a": np.concatenate(outs_a), "b": np.concatenate(outs_b)}
            )

        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last = pdf["fp"].iloc[-1]
            is_last = (pdf["fp"] == last).to_numpy()
            carry = pdf[is_last]
            body = pdf[~is_last]
            out = flush(body) if len(body) else None
            if out is not None:
                yield out
        if carry is not None and len(carry):
            out = flush(carry)
            if out is not None:
                yield out

    pairs = (
        rows.repartition("fp")
        .sortWithinPartitions("fp", "_id")
        .mapInPandas(gen_pairs, schema=f"a {id_dtype}, b {id_dtype}")
    )
    return (
        pairs.groupBy("a", "b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


# ------------------------------------------------------------- SimHash (D4)

def _simhash_kernel():
    """Arrow-batch kernel for the 60 majority votes: per row, bit ``j`` of
    the signature is set iff ``2·|{h : bit_j(h)=1}| > |hashes|``. Exact
    integer counting — bit-identical to the previous per-bit expression
    form. One ``np.add.reduceat`` per bit over the batch's flattened hash
    values. Empty hash arrays keep sig 0 (two empty documents are
    identical content); null text never reaches the kernel."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            vals = pdf["_hs"].values
            nrows = len(vals)
            sig = np.zeros(nrows, dtype=np.int64)
            arrs = [np.asarray(a, dtype=np.int64) for a in vals]
            lens = np.array([a.size for a in arrs], dtype=np.int64)
            nz = np.flatnonzero(lens)
            if nz.size:
                # reduceat cannot represent empty segments — run it over
                # the non-empty docs only (empty docs keep sig 0)
                kept = [arrs[i] for i in nz]
                klens = lens[nz]
                starts = np.concatenate(([0], np.cumsum(klens)[:-1]))
                v = np.concatenate(kept)
                ksig = np.zeros(nz.size, dtype=np.int64)
                for j in range(60):
                    ones = np.add.reduceat((v >> j) & 1, starts)
                    ksig += (ones * 2 > klens).astype(np.int64) << j
                sig[nz] = ksig
            yield pd.DataFrame({
                "_id": pdf["_id"].reset_index(drop=True),
                "simhash": sig,
            })

    return gen


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over word tokens: bit j of the signature is the sign
    of sum over tokens of (bit j of md5_long(token) ? +1 : -1).

    Zero algorithmic shuffles (only ``spread_small``'s input widening
    appears in local mode). Split across the JVM/Arrow boundary like
    :func:`minhash_signature` (r8): tokenization + per-token md5 stay JVM
    expressions, while the 60 per-bit majority votes run as ONE vectorized
    Arrow kernel (:func:`_simhash_kernel` — exact integer counting, so
    signatures are bit-identical to the expression form). The previous
    per-bit ``F.filter`` chain paid 60 interpreted higher-order lambdas
    per row; only ``(_id, array<bigint>)`` crosses the Python boundary.
    Output: id, simhash (bigint; bit 63 unused to stay non-negative)."""
    toks = F.array_distinct(
        F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
            lambda x: x != "",
        )
    )
    hashes = F.transform(toks, lambda t: md5_long(t))
    id_type = dict(df.dtypes)[id_col]

    # null text has NO signature: a null token array would fold to sig 0,
    # which silently made every null-text doc a "duplicate" of every
    # other (and of genuinely empty docs). Empty TEXT keeps sig 0.
    return (
        spread_small(df.filter(F.col(text_col).isNotNull()))
        .select(F.col(id_col).alias("_id"), hashes.alias("_hs"))
        .mapInPandas(_simhash_kernel(), f"_id {id_type}, simhash bigint")
    )


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Pairs with Hamming distance ≤ max_hamming between 60-bit SimHashes.

    Pigeonhole: split the signature into max_hamming+1 blocks; any pair
    within distance k agrees on ≥1 block → equality join per block, then
    exact popcount verify. No pairwise scan."""
    nblocks = max_hamming + 1
    width = 60 // nblocks
    sig = simhash64(df, id_col, text_col)
    blocks = sig.select(
        "_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("blk"),
                    F.shiftright(F.col("simhash"), i * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("key"),
                )
                for i in range(nblocks)
            ])
        ).alias("bk"),
    ).select("_id", "simhash", "bk.blk", "bk.key")
    # persist: the blocks frame self-joins, and Spark computes each join
    # side independently — without this the signature aggregation (token
    # explode + 60 bit-vote sums, the expensive part) runs twice
    blocks = blocks.persist()
    a = blocks.select(F.col("_id").alias("a"), F.col("simhash").alias("_ha"), "blk", "key")
    b = blocks.select(F.col("_id").alias("b"), F.col("simhash").alias("_hb"), "blk", "key")
    xor = F.col("_ha").bitwiseXOR(F.col("_hb"))
    dist = F.bit_count(xor)
    # FIRST-block ownership (pure bit math): a pair agreeing on several
    # blocks is emitted only by the earliest one — no earlier block's
    # slice of the XOR may be zero. Output is globally unique, so the
    # dropDuplicates shuffle disappears entirely; under mass duplication
    # (near-identical hashes agree on ALL blocks) it was re-emitting
    # every hot pair nblocks times. Verify (cheap bit math) still runs
    # BEFORE any shuffle.
    mask = (1 << width) - 1
    no_earlier = F.lit(True)
    for m in range(nblocks - 1):
        agrees_m = (
            F.shiftright(xor, m * width).bitwiseAND(F.lit(mask)) == 0
        )
        no_earlier = no_earlier & ~((F.col("blk") > m) & agrees_m)
    return (
        a.join(b, on=["blk", "key"])
        .filter(F.col("a") < F.col("b"))
        .filter(no_earlier)
        .withColumn("hamming", dist)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


# ------------------------------------- pair → cluster resolution (D6)

def _symmetric(edges: DataFrame) -> DataFrame:
    return edges.select("a", "b").union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star (connect strictly-greater neighbors to the local min)
    or small-star (connect ≤ neighbors to the local min) round. Both emit
    normalized (min, other) edges, so a < b holds throughout."""
    nbr = _symmetric(edges).groupBy("a").agg(F.collect_set("b").alias("_vs"))
    m = F.least(F.col("a"), F.array_min("_vs"))
    if large:
        picked = F.filter("_vs", lambda v: v > F.col("a"))
    else:
        # small-star: neighbors ≤ u, plus u itself so the (m, u) edge
        # survives the round (u may exceed all its remaining neighbors)
        picked = F.array_union(
            F.filter("_vs", lambda v: v < F.col("a")), F.array(F.col("a"))
        )
    return (
        nbr.select(m.alias("_m"), F.explode(picked).alias("_v"))
        .filter(F.col("_m") != F.col("_v"))
        .select(
            F.least("_m", "_v").alias("a"), F.greatest("_m", "_v").alias("b")
        )
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iter: int = 25,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Resolve duplicate PAIRS into clusters: (node, component) where
    component = the smallest node id in the node's connected component.

    Adaptive: a deduped edge set of ≤ ``driver_threshold`` rows (two longs
    each — the threshold is ~16 MB) is collected and solved with a local
    union-find, the same way a small join side gets broadcast instead of
    shuffled; each distributed round below costs several jobs, so the
    driver path is strictly better while the graph fits. Above the
    threshold: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — converges in
    O(log n) rounds even for path graphs, each round a groupBy + explode
    on compact ids. ``localCheckpoint`` truncates lineage per round so the
    plan does not grow with iterations. Only nodes that appear in a pair
    are returned; both paths produce identical output (cross-checked in
    tests/test_dedup_clusters.py).

    Checkpoint hygiene: ``localCheckpoint`` blocks are RAW RDD caches —
    ``spark.catalog.clearCache()`` does NOT free them, and each star
    round materializes a full edge-set copy (≈214 MB at 11M edges), so
    without explicit cleanup a large run leaks rounds × reps copies into
    the block manager and every LATER job on the session degrades under
    the GC pressure (measured at sf1: same-session bench reps walked
    47 s → 96 s, and unrelated downstream queries doubled). Each round
    therefore unpersists the superseded checkpoint via the persistent-RDD
    registry; only the round backing the RETURNED frame stays alive (its
    lineage is truncated — freeing it would make the result
    unrecoverable).
    """
    from ondine_spark.core.checkpoints import checkpoint_df, unpersist_rdd_ids

    sc = pairs.sparkSession.sparkContext

    def _unpersist(ids: set) -> None:
        unpersist_rdd_ids(sc, ids)

    # checkpoint_df resolves each checkpoint's block id from its own
    # LogicalRDD — safe against concurrent checkpoints on a shared session
    edges, edges_ids = checkpoint_df(
        pairs.select(
            F.least(F.col(a), F.col(b)).alias("a"),
            F.greatest(F.col(a), F.col(b)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sig = edges.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("a", "b")).alias("h"),
    ).first()
    if sig.n <= driver_threshold:
        out_schema = edges.select(
            F.col("a").alias("node"), F.col("a").alias("component")
        ).schema
        spark = pairs.sparkSession
        # ONE Arrow collect instead of toLocalIterator: the iterator runs
        # one fetch (a driver-blocking mini-job) PER partition and builds
        # a Row object per edge — measured ~1.4 s of pure overhead at
        # sf0.1 where the edge set is only 836 rows across 32 shuffle
        # partitions. toPandas is a single job + columnar transfer.
        pdf = edges.toPandas()
        _unpersist(edges_ids)  # consumed; free now
        if len(pdf) == 0:
            return spark.createDataFrame([], schema=out_schema)
        import numpy as np

        ua = pdf["a"].to_numpy()
        vb = pdf["b"].to_numpy()
        if np.issubdtype(ua.dtype, np.integer):
            # vectorized min-hooking + full shortcutting: converges in
            # O(log n) rounds (same family as the distributed small-star
            # path), each round numpy-vectorized over all edges. Provably
            # the union-find answer: at the fixpoint every edge has
            # parent[u] == parent[v] and parent is idempotent, so labels
            # are constant per component; the component's minimum node
            # can never be hooked lower, so that constant is the min —
            # exactly the dict union-find's output (cross-checked in
            # tests/test_dedup_clusters.py).
            nodes, inv = np.unique(np.concatenate([ua, vb]),
                                   return_inverse=True)
            cu, cv = inv[: len(ua)], inv[len(ua):]
            parent = np.arange(len(nodes), dtype=np.int64)
            while True:
                pu, pv = parent[cu], parent[cv]
                hi = np.maximum(pu, pv)
                lo = np.minimum(pu, pv)
                before = parent.copy()
                np.minimum.at(parent, hi, lo)
                while True:
                    pp = parent[parent]
                    if np.array_equal(pp, parent):
                        break
                    parent = pp
                if np.array_equal(parent, before):
                    break
            import pandas as pd

            labels_pdf = pd.DataFrame(
                {"node": nodes, "component": nodes[parent]}
            )
            return spark.createDataFrame(labels_pdf, schema=out_schema)
        # non-integer node ids: classic dict union-find over the collected
        # columns (same output, no numpy fast path)
        parent_d: dict = {}

        def find(x):
            parent_d.setdefault(x, x)
            root = x
            while parent_d[root] != root:
                root = parent_d[root]
            while parent_d[x] != root:  # path compression
                parent_d[x], x = root, parent_d[x]
            return root

        for x, y in zip(ua.tolist(), vb.tolist()):
            ra, rb = find(x), find(y)
            if ra != rb:
                parent_d[max(ra, rb)] = min(ra, rb)
        labels = [(n_, find(n_)) for n_ in parent_d]
        return spark.createDataFrame(labels, schema=out_schema)
    for _ in range(max_iter):
        nxt, nxt_ids = checkpoint_df(
            _star_round(_star_round(edges, large=True), large=False)
        )
        nsig = nxt.select(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("a", "b")).alias("h"),
        ).first()
        _unpersist(edges_ids)  # superseded round — free its blocks
        edges, edges_ids = nxt, nxt_ids
        if (nsig.n, nsig.h) == (sig.n, sig.h):
            break
        sig = nsig
    # converged: every edge is (component-min, member). Checkpoint the
    # LABELS (one row per node — orders of magnitude smaller than the
    # edge set) so the final round's edge copy can be freed too; what
    # stays persisted per call is node-sized, not edge-sized.
    out, _out_ids = checkpoint_df(
        edges.select(F.col("b").alias("node"), F.col("a").alias("component"))
        .union(edges.select(F.col("a").alias("node"), F.col("a").alias("component")))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
    _unpersist(edges_ids)
    return out


def dedup_keep_representative(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    a: str = "a",
    b: str = "b",
    keep_by: str | None = None,
    components: DataFrame | None = None,
) -> DataFrame:
    """Drop every near-duplicate except one representative per connected
    component of the pair graph.

    ``keep_by=None`` keeps the smallest id. With ``keep_by=<score col>``
    the representative is the cluster's best row by that column (ties →
    larger id, via max over struct(score, id) — deterministic). Pass
    ``components`` (a precomputed ``connected_components`` frame, ideally
    persisted) when applying several keep policies over the same pair
    graph — the CC resolution is the expensive part and need not rerun
    per policy. The final anti-join carries no broadcast hint: at
    web-corpus drop rates (30-50% of a 100 TB corpus) the drop set is
    billions of rows, so a forced broadcast would OOM the executors. AQE
    broadcasts it automatically whenever its runtime size is under
    ``spark.sql.autoBroadcastJoinThreshold`` and falls back to a shuffled
    join otherwise (asserted by the tests/test_dedup_clusters.py plan test)."""
    comp = components if components is not None else connected_components(pairs, a, b)
    if keep_by is None:
        drop = comp.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias(id_col)
        )
    else:
        scored = comp.join(
            df.select(
                F.col(id_col).alias("node"), F.col(keep_by).alias("_score")
            ),
            on="node",
        )
        reps = scored.groupBy("component").agg(
            F.max(F.struct("_score", "node"))["node"].alias("_rep")
        )
        drop = (
            scored.join(reps, on="component")
            .filter(F.col("node") != F.col("_rep"))
            .select(F.col("node").alias(id_col))
        )
    return df.join(drop, on=id_col, how="left_anti")


def near_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    method: str = "minhash",
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    ngram: int = 3,
    max_hamming: int = 3,
    keep_by: str | None = None,
) -> DataFrame:
    """One-call corpus near-dedup: find duplicate pairs with the chosen
    method, resolve them into connected components, and keep one
    representative per cluster (smallest id, or best row by ``keep_by``).

    ``method``: "minhash" (LSH candidates filtered by signature-estimated
    Jaccard ≥ threshold — the 100 TB default), "jaccard" (exact n-gram
    Jaccard ≥ threshold — exact but heavier), or "simhash"
    (Hamming ≤ max_hamming; threshold unused). The composition inherits
    each stage's scale story: inverted-index/banding joins (never
    pairwise), star-rounds components above the driver threshold, and an
    unhinted anti-join for the final drop set (AQE broadcasts small drop
    sets at runtime, shuffles large ones).
    """
    if method == "minhash":
        # the pairs exist only to be clustered: star-forest mode keeps
        # the identical components while a mass-duplicated corpus's
        # O(k²)-per-bucket pair volume never materializes (r9)
        pairs = minhash_lsh_pairs(
            df, id_col, text_col, num_hashes, bands, ngram,
            threshold=threshold, connectivity_only=True,
        )
    elif method == "jaccard":
        pairs = ngram_jaccard_pairs(
            df, id_col, text_col, n=ngram, threshold=threshold
        )
    elif method == "simhash":
        pairs = simhash_pairs(df, id_col, text_col, max_hamming=max_hamming)
    else:
        raise ValueError(
            f"unknown near-dedup method {method!r}: "
            "expected minhash | jaccard | simhash"
        )
    return dedup_keep_representative(df, id_col, pairs, keep_by=keep_by)


# ------------------------------------------- embedding cosine near-dup (D5)

def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    num_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Scale path: random-hyperplane LSH — sign-pattern bucket key from
    ``num_planes`` deterministic hyperplanes (md5-derived pseudo-random
    components, no RNG state to ship) → self-join within bucket → exact
    cosine verify. High-cosine pairs agree on most sign bits; with 8 planes
    a ≥0.95 pair lands in the same bucket with high probability. For exact
    recall use brute_force (similarity_search module) on the suspect set.
    """
    id_type = dict(df.dtypes)[id_col]
    df = df.filter(finite_vector(F.col(vec_col)))
    probe = df.select(vec_col).first()
    if probe is None:
        # no non-null vector anywhere: no dim to infer, no pairs to emit
        return df.sparkSession.createDataFrame(
            [], f"a {id_type}, b {id_type}, cos_sim double"
        )
    dim = len(probe[0])
    # deterministic hyperplanes: component p[i][d] in [-1,1) from md5
    planes = [
        [
            (int.from_bytes(
                __import__("hashlib").md5(f"{seed}:{i}:{d}".encode()).digest()[:4],
                "big",
            ) / 2**31 - 1.0)
            for d in range(dim)
        ]
        for i in range(num_planes)
    ]
    from ondine_spark.functions.similarity import sign_bucket_expr

    vec = F.col(vec_col)
    keyed = df.select(
        F.col(id_col).alias("_id"),
        vec.alias("_v"),
        sign_bucket_expr(vec, planes).alias("_bucket"),
    )

    # Per-bucket BLAS verify, NOT a pair self-join. The sf1 skew probe
    # (10%-mass cluster = one hot sign bucket) showed the join-then-verify
    # plan shipping both 64-float vectors through Arrow for EVERY candidate
    # pair — O(cluster^2 · dim) serialization, 235 s for 2M pairs. Here
    # each vector travels ONCE (one shuffle of N rows on the bucket key);
    # the quadratic part runs as a blocked numpy matrix product inside the
    # group (4M dot products ≈ milliseconds of BLAS), and only qualifying
    # pairs are materialized. Per-group memory is O(n_bucket · dim +
    # qualifying pairs) via the row-block loop — a genuinely duplicated
    # cluster has quadratic OUTPUT, which no correct pair enumerator
    # avoids; everything else stays linear.
    import numpy as np
    import pandas as pd

    thr = float(threshold)

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id")  # position order == id order -> a < b
        ids = pdf["_id"].to_numpy()
        X = np.array(pdf["_v"].tolist(), dtype="float64")
        norms = np.sqrt((X * X).sum(axis=1))
        # >0 drops zero vectors (cosine(0,·)=0 by contract); isfinite
        # drops any NaN/Inf row that slipped past the frame filter
        keep = (norms > 0) & np.isfinite(norms)
        ids, X, norms = ids[keep], X[keep], norms[keep]
        if len(ids) < 2:
            return pd.DataFrame({"a": ids[:0], "b": ids[:0],
                                 "cos_sim": np.array([], dtype="float64")})
        Xn = X / norms[:, None]
        outs = []
        block = 2048
        for i0 in range(0, len(ids), block):
            S = Xn[i0 : i0 + block] @ Xn.T
            ii, jj = np.nonzero(S >= thr)
            gi = ii + i0
            m = gi < jj
            if m.any():
                outs.append(pd.DataFrame({
                    "a": ids[gi[m]], "b": ids[jj[m]], "cos_sim": S[ii[m], jj[m]],
                }))
        if not outs:
            return pd.DataFrame({"a": ids[:0], "b": ids[:0],
                                 "cos_sim": np.array([], dtype="float64")})
        return pd.concat(outs, ignore_index=True)

    return keyed.groupBy("_bucket").applyInPandas(
        bucket_pairs, schema=f"a {id_type}, b {id_type}, cos_sim double"
    )


# ------------------------------------------- semantic dedup (SemDeDup-style)

def seed_centroids(
    df: DataFrame, id_col: str, vec_col: str, k: int = 8
) -> list[list[float]]:
    """Deterministic centroid seeds: the ``k`` corpus vectors with the
    smallest ``md5_long(id)``. A hash order is as arbitrary as a random
    draw but reproducible across engines and runs — no RNG state to ship,
    and the SQL oracle can re-derive the exact same seeds. Centroid index
    = rank in hash order. Driver-side collect of k rows (k is small);
    the sort is a TakeOrderedAndProject, not a full shuffle."""
    rows = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .filter(finite_vector(F.col("_v")))  # null/NaN/Inf can't seed
        .orderBy(md5_long(F.col("_id").cast("string")))
        .limit(k)
        .collect()
    )
    return [list(map(float, r["_v"])) for r in rows]


def semantic_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    threshold: float = 0.9,
) -> DataFrame:
    """SemDeDup-style semantic near-dup candidates (Abbas et al., 2023):
    assign every embedding to its nearest centroid (cosine, ties to the
    higher centroid id), then compare pairs ONLY within a cluster and keep
    those with cosine >= ``threshold``.

    This is the standard trick for making embedding dedup sub-quadratic:
    pairwise cost drops from O(N²) to O(Σ cluster²). Centroids come from
    :func:`seed_centroids` (deterministic) or
    ``similarity_search.train_ivf_centroids`` (k-means, better balance).
    At scale, cluster count should grow ~√N so expected cluster size stays
    bounded; the intra-cluster join shuffles once on the small int cell id.
    A pathologically hot cell (most of the corpus in one cluster) degrades
    to the quadratic join — re-train with larger k or switch to
    ``embedding_neardup_pairs`` (LSH) if cluster sizes skew.

    Output: ``a``, ``b``, ``cell``, ``cos_sim``.
    """
    if not centroids:
        # no centroids (empty training corpus): no cells, no candidates
        idt = dict(df.dtypes)[id_col]
        return df.sparkSession.createDataFrame(
            [], f"a {idt}, b {idt}, cell int, cos_sim double"
        )
    from ondine_spark.operators.similarity_search import _nearest_centroids_expr

    assigned = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        # null/NaN/Inf vectors belong to no cell (NaN cosine would rank
        # an arbitrary cell FIRST under Spark's NaN-greatest ordering and
        # pass >= threshold pair filters)
        .filter(finite_vector(F.col("_v")))
        .withColumn("cell", _nearest_centroids_expr("_v", centroids, 1)[0])
    )
    # Pair stage (r8, wave 7): the previous intra-cluster self-join +
    # cosine_arrow verify shipped EVERY vector cluster-size times through
    # the join and then moved O(Σ cluster²) pairs × 2 vectors across the
    # Arrow boundary — 256 MB at sf0.1 vs the 2.5 MB of distinct vectors
    # — and the `cos_sim >= threshold` filter on the pandas-UDF column
    # re-evaluated the kernel (guide §4.4: two ArrowEvalPython nodes in
    # the plan). Now: ONE exchange on the cell id, vectors cross the
    # boundary once, and a per-cell numpy kernel enumerates the upper
    # triangle and thresholds in place. The cosine math is BIT-IDENTICAL
    # to cosine_arrow ((x*y).sum(axis=1), same norms, 0.0 on zero norm);
    # ids are sorted ascending inside each cell so triu pairs are exactly
    # the a < b set. Hot-cell behaviour is unchanged (quadratic within
    # the cell — documented above). The cosine itself is one normalized
    # BLAS gram product per cell row-block (cos(a,b) = (a/|a|)·(b/|b|)):
    # the per-pair elementwise form ((x*y).sum(axis=1), what cosine_arrow
    # does) materializes pairs × dim temporaries — O(cluster² · dim)
    # memory traffic — where the gram product is O(cluster · dim) reads
    # into a dense matmul (measured 1.3 s → 0.01 s on 252K pairs at
    # sf0.1). Values agree with cosine_arrow to ~1 ulp (same float64
    # dot, different summation order); the gate rounds to 6 decimals.
    # Zero-norm vectors keep cosine 0.0 exactly (normalized row is 0).
    # Row-blocking bounds peak memory at ROW_BLOCK × cluster doubles.
    import numpy as np
    import pandas as pd

    idt = dict(df.dtypes)[id_col]
    cell_t = dict(assigned.dtypes)["cell"]
    thr = float(threshold)
    out_schema = f"a {idt}, b {idt}, cell {cell_t}, cos_sim double"

    def cell_pair_kernel(batches):
        ROW_BLOCK = 4096

        def flush(pdf: pd.DataFrame):
            n = len(pdf)
            if n < 2:
                return None
            ids = pdf["_id"].to_numpy()
            V = np.array(pdf["_v"].tolist(), dtype="float64")
            nrm = np.sqrt((V * V).sum(axis=1))
            Vn = V / np.where(nrm == 0.0, 1.0, nrm)[:, None]
            outs = []
            for i0 in range(0, n - 1, ROW_BLOCK):
                i1 = min(i0 + ROW_BLOCK, n)
                G = Vn[i0:i1] @ Vn.T  # (i1-i0) × n
                bi, bj = np.nonzero(G >= thr)
                keep = bj > bi + i0  # upper triangle only (j > global i)
                bi, bj = bi[keep], bj[keep]
                if len(bi):
                    outs.append((ids[bi + i0], ids[bj], G[bi, bj]))
            if not outs:
                return None
            return pd.DataFrame({
                "a": np.concatenate([o[0] for o in outs]),
                "b": np.concatenate([o[1] for o in outs]),
                "cell": pdf["cell"].iloc[0],
                "cos_sim": np.concatenate([o[2] for o in outs]),
            })[["a", "b", "cell", "cos_sim"]]

        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last = pdf["cell"].iloc[-1]
            is_last = (pdf["cell"] == last).to_numpy()
            carry = pdf[is_last]
            body = pdf[~is_last]
            if len(body):
                for _, grp in body.groupby("cell", sort=False):
                    out = flush(grp)
                    if out is not None:
                        yield out
        if carry is not None and len(carry):
            out = flush(carry)
            if out is not None:
                yield out

    return (
        assigned.repartition("cell")
        .sortWithinPartitions("cell", "_id")
        .mapInPandas(cell_pair_kernel, schema=out_schema)
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    threshold: float = 0.9,
    keep_by: str | None = None,
) -> DataFrame:
    """Full SemDeDup: semantic pair candidates → connected components →
    keep one representative per duplicate set (smallest id, or best by
    ``keep_by``). Returns the deduplicated frame (all original columns)."""
    pairs = semantic_dup_pairs(df, id_col, vec_col, centroids, threshold)
    return dedup_keep_representative(
        df, id_col, pairs.select("a", "b"), keep_by=keep_by
    )
