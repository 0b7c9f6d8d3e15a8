"""Corpus-curation operators: sessionization, duplicate-n-gram fraction,
deterministic (stratified) hash sampling, per-key quota capping.

Beyond the reference surface (SURVEY.md §7 phase 6) — the selection/shaping
half of a training-data pipeline, complementing operators/dedup.py (removal)
and operators/text_analysis.py (scoring). All pure JVM column expressions
and single-purpose shuffles; nothing touches Python at run time, so every
operator here scales to the 100 TB tier and has an exact ANSI-SQL oracle.

Scale notes per operator:

- sessionize: ONE shuffle on the entity key (window partition). Skewed
  power users make one task hot; the window itself is a linear scan after
  the sort, so the mitigation is AQE skew splitting on the exchange, not a
  different algorithm.
- dup_ngram_fraction: two shuffles (gram -> doc). The gram-frequency
  aggregate is map-side combinable; hot grams ("of the and") concentrate
  counts, not rows, because grams are distinct-per-doc before exploding.
- hash_sample / stratified: zero shuffles — a deterministic filter on a
  hash of the id, pushed into the scan stage. Sampling is reproducible
  across runs/engines (md5-based, no RNG state).
- cap_per_key: ONE shuffle on the key. At 100 TB, pre-aggregate with a
  count-per-key broadcast to short-circuit keys already under quota
  (not done here: the plain window is exchange-minimal already).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ondine_spark.functions.similarity import md5_long, word_ngrams

# ------------------------------------------------------ timestamp hygiene

def filter_valid_timestamps(
    df: DataFrame,
    ts_col: str,
    min_ts: str = "1900-01-01",
    max_ts: str = "2200-01-01",
    quarantine: bool = False,
):
    """Keep rows whose ``ts_col`` is non-null and inside a sane validity
    window; with ``quarantine=True`` return ``(kept, quarantined)``.

    The timestamp analog of the embedding ``finite_vector`` filter: a
    100 TB event log WILL contain epoch-0 defaults, 9999-12-31
    sentinels, and pre-Gregorian garbage from broken parsers. Beyond
    being semantically wrong, extreme values are a PLATFORM hazard:
    PySpark cannot even ``collect()`` a year-1 timestamp (the
    hybrid-calendar rebase lands on year 0, which Python datetime
    rejects), so one poisoned row aborts an otherwise-correct job at
    result time. The comparison is a pure JVM filter — pushable to the
    scan — so quarantining at load costs one predicate."""
    col = F.col(ts_col)
    ok = (
        col.isNotNull()
        & (col >= F.lit(min_ts).cast("timestamp"))
        & (col < F.lit(max_ts).cast("timestamp"))
    )
    kept = df.filter(ok)
    if quarantine:
        return kept, df.filter(~F.coalesce(ok, F.lit(False)))
    return kept


# ------------------------------------------------------------- sessionize

def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the previous event of the same key exceeds ``gap_seconds``.

    Adds ``session_seq`` (1-based per key). ``order_cols`` break ts ties
    deterministically (pass the event id).
    """
    order = [F.col(ts_col), *[F.col(c) for c in order_cols]]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    new_session = (
        prev.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev) > gap_seconds)
    ).cast("int")
    # running sum of session starts = session ordinal; same single shuffle
    # (both windows share the partitioning + ordering)
    return df.withColumn(
        "session_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    order_cols: tuple[str, ...] = (),
    value_col: str | None = None,
) -> DataFrame:
    """Per-session rollup: start/end, event count, span seconds, and the
    value sum if given. One additional map-side-combinable aggregate after
    sessionize's window (the groupBy keys are a superset of the window
    partition key, so AQE keeps it on the same exchange)."""
    s = sessionize(df, key_col, ts_col, gap_seconds, order_cols)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("span_seconds"),
    ]
    if value_col is not None:
        # decimal-accumulated so the sum is independent of row arrival order
        # (double addition isn't associative; shuffle order isn't stable)
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("value_sum")
        )
    return s.groupBy(key_col, "session_seq").agg(*aggs)


# ---------------------------------------------- duplicate-n-gram fraction

def dup_ngram_fraction(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Per-document duplicate-n-gram fraction: of the document's DISTINCT
    word n-grams, the fraction that also occur in at least one other
    document. The Gopher/MassiveText-style repetition signal for corpus
    triage (docs with high cross-corpus n-gram overlap are boilerplate or
    near-dup tails that MinHash's doc-level threshold misses).

    Returns (id_col, n_grams, dup_grams, dup_frac); docs shorter than n
    words report 0 grams and 0.0 fraction.
    """
    # spread (r8): the gram explode + md5 map stage runs below the first
    # shuffle; a single-file local scan would serialize it on one core
    from ondine_spark.core.partitioning import spread_small

    grams = spread_small(df).select(
        F.col(id_col), F.explode_outer(word_ngrams(F.col(text_col), n)).alias("gram")
    )
    # distinct-per-doc already (word_ngrams dedups), so count(*) per gram
    # is the doc frequency; hash the gram to keep the shuffle key compact
    keyed = grams.select(
        F.col(id_col),
        F.when(F.col("gram").isNull(), None).otherwise(md5_long(F.col("gram"))).alias("g"),
    )
    # r9 (skew hardening, guide §2.3/§2.5): the r8 count-over-window on
    # the gram key had NO partial aggregation — every instance of a hot
    # gram (a corpus-scale stop phrase) landed in ONE window partition,
    # and AQE skew handling does not apply to windows. Same for the null
    # grams of every short doc, which shared one window partition.
    # Rewritten as the unique-complement identity over two plain
    # aggregations, both of which DO partial (map-side) aggregation, so a
    # hot key collapses to one partial row per map task before the
    # shuffle:
    #   dup_grams(doc) = n_grams(doc) − #{grams unique to the corpus
    #                                     owned by doc}
    # A df=1 gram has exactly one owner (per-doc grams are distinct —
    # word_ngrams dedups), so min(id) over its group IS that owner.
    # Exactly the old semantics: a non-null gram counts as dup iff its
    # hash's doc frequency ≥ 2; null grams are excluded from both sides.
    # The gram map stage (tokenize + explode) is evaluated once per
    # branch — pure, linearly-scaling map work, the price of removing
    # the single-reducer hot-key bottleneck (cf. window_chunking's r8
    # trade). The two groupBy(id) outputs share partitioning, so the
    # final join adds no exchange.
    # n_grams needs NO instance rows at all: it is the per-doc gram-array
    # size (summed per id to keep duplicate-id inputs aggregating exactly
    # like the old shape), so this branch skips the explode AND the md5 —
    # the second evaluation of the map stage costs one tokenize, not the
    # full hash chain.
    per_doc = (
        spread_small(df)
        .select(
            F.col(id_col),
            F.coalesce(
                F.size(word_ngrams(F.col(text_col), n)), F.lit(0)
            ).alias("_n"),
        )
        .groupBy(id_col)
        .agg(F.sum("_n").cast("bigint").alias("n_grams"))
    )
    uniq = (
        keyed.where(F.col("g").isNotNull())
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("_df"), F.min(id_col).alias(id_col))
        .where(F.col("_df") == 1)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_uniq"))
    )
    return (
        per_doc.join(uniq, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.col("n_grams"),
            (F.col("n_grams") - F.coalesce(F.col("_uniq"), F.lit(0))).alias(
                "dup_grams"
            ),
        )
        .withColumn(
            "dup_frac",
            F.when(F.col("n_grams") == 0, F.lit(0.0)).otherwise(
                F.col("dup_grams").cast("double") / F.col("n_grams").cast("double")
            ),
        )
    )


# ------------------------------------------------- deterministic sampling

def hash_sample(
    df: DataFrame, id_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose md5(id, seed) lands
    in the lowest ``fraction`` of the hash space. Reproducible across runs
    and engines (no RNG state), and a plain filter — it pushes past scans
    and composes with partition pruning."""
    return df.where(_hash_point(F.col(id_col), seed) < F.lit(float(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample English to 10%
    but keep all low-resource languages). ``fractions`` maps stratum value
    -> keep rate; unlisted strata use ``default_fraction``. Zero shuffles:
    the per-row threshold is a CASE expression over the stratum column."""
    thr: Column = F.lit(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(float(frac))).otherwise(thr)
    return df.where(_hash_point(F.col(id_col), 0) < thr)


def _hash_point(col: Column, seed: int) -> Column:
    """Uniform point in [0, 1): md5_long of (id '#' seed) over 16^15."""
    return md5_long(
        F.concat_ws("#", col.cast("string"), F.lit(str(seed)))
    ).cast("double") / F.lit(float(16 ** 15))


def shard_for_training(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "0",
    pos_col: str = "pos",
    shard_col: str = "shard",
    check_unique: bool = False,
) -> DataFrame:
    """Deterministic global shuffle + balanced shard assignment for
    training export: every row gets a ``shard`` in [0, n_shards) and a
    dense 0-based ``pos`` within its shard, both pure functions of
    (id, seed) — independent of input partitioning, cluster size, or
    run, so a re-export after a crash produces byte-identical shards
    (the property trainers need for resumable data loading).

    Spark-first shape: the shuffle key is one JVM ``hash()`` (murmur3)
    of ``id '#' seed``; shard = pmod(key, n); pos = row_number over
    (shard, ordered by key then id — the id tie-break makes hash
    collisions harmless). Exactly ONE exchange (the window's hash
    partitioning by shard), which IS the data movement a shard export
    must do; within-shard order is the pseudorandom permutation. Shard
    sizes concentrate at N/n by the hash's uniformity — the trainer-side
    balance this exists for. Oracle-gated (``export_shards``) via the
    bit-exact murmur3 SQL replay.

    ``write_training_shards`` is the sink form: same assignment,
    ``repartition(n, shard) + sortWithinPartitions`` so each shard is
    one sorted file set under ``shard=K/``.

    PRECONDITION: ``id_col`` values must be unique AFTER cast to string
    (the usual case for a document id). Two rows with the same id string
    are indistinguishable to any function of (id, seed), so their
    relative ``pos`` would fall back to partition order — i.e. the
    byte-identical-re-export guarantee holds only over unique ids. Pass
    ``check_unique=True`` to enforce it with one aggregation (an extra
    scan — opt-in because the caller usually knows its id is a key).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if check_unique:
        dup = (
            df.groupBy(F.col(id_col).cast("string").alias("_id"))
            .count().where(F.col("count") > 1).limit(1).count()
        )
        if dup:
            raise ValueError(
                f"shard_for_training: {id_col!r} has duplicate values "
                "(after cast to string); pos would not be deterministic"
            )
    kcol = "__ondine_shard_key"
    while kcol in df.columns:  # never clobber a user column
        kcol = "_" + kcol
    key = F.hash(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}")))
    out = df.withColumn(kcol, key).withColumn(
        shard_col, F.pmod(F.col(kcol), F.lit(n_shards))
    )
    w = Window.partitionBy(shard_col).orderBy(kcol, id_col)
    return out.withColumn(pos_col, F.row_number().over(w) - 1).drop(kcol)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "0",
) -> None:
    """Sink form of :func:`shard_for_training`: writes ``shard=K/``
    parquet directories, one sorted file per shard (each shard's rows
    are co-located in one writer task and sorted by the shuffle key, so
    a trainer streams shard K in its deterministic permutation order
    without a sort of its own)."""
    assigned = shard_for_training(df, n_shards, id_col, seed)
    key = F.hash(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}")))
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", key, id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def sample_to_token_budget(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    token_col: str,
    budget: int,
    budgets: Mapping[str, int] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Build a data mix: per stratum (e.g. language), keep a deterministic
    unbiased prefix of documents whose cumulative token count stays under
    the stratum's budget. Rows are ordered by md5(id, seed) — a
    reproducible random permutation — and a row is kept while the budget
    is not yet exhausted BEFORE it, so each stratum overshoots by at most
    one document (and a budget > 0 always yields at least one doc).

    ``budgets`` overrides the default ``budget`` per stratum value. ONE
    shuffle (the per-stratum window); the cumulative sum is exact integer
    arithmetic, so engines agree bit-for-bit.
    """
    thr: Column = F.lit(int(budget))
    for value, b in sorted((budgets or {}).items()):
        thr = F.when(F.col(strata_col) == value, F.lit(int(b))).otherwise(thr)
    shuffle_key = md5_long(
        F.concat_ws("#", F.col(id_col).cast("string"), F.lit(str(seed)))
    )
    w = (
        Window.partitionBy(strata_col)
        .orderBy(shuffle_key, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col).cast("long")).over(w)
    return (
        df.withColumn("_cum", cum)
        .where(F.col("_cum") - F.col(token_col) < thr)
        .drop("_cum")
    )


def perplexity_buckets(
    df: DataFrame,
    ppl_col: str = "perplexity",
    bucket_col: str = "ppl_bucket",
    head_frac: float = 1.0 / 3.0,
    tail_frac: float = 1.0 / 3.0,
    relative_error: float = 0.001,
) -> DataFrame:
    """CCNet-style head/middle/tail split on an LM-perplexity column
    (pair with ``text_analysis.unigram_perplexity`` / KenLM scores):
    the lowest-perplexity ``head_frac`` of rows is "head" (most fluent),
    the highest ``tail_frac`` is "tail", the rest "middle". CCNet keeps
    head+middle for pre-training and drops tail.

    Scale shape: thresholds come from ``approx_percentile`` (a single
    map-side-combinable sketch aggregate — ONE row to the driver side of
    the plan), then bucket assignment is a zero-shuffle broadcast
    cross-join + CASE. No global sort, no window: the full-corpus
    alternative (ntile) would shuffle every row into one ordering.
    NULL perplexities (empty docs) get a NULL bucket.
    """
    qs = df.agg(
        F.percentile_approx(
            ppl_col,
            F.array(F.lit(float(head_frac)), F.lit(1.0 - float(tail_frac))),
            F.lit(int(1.0 / relative_error)),
        ).alias("_qs")
    ).select(
        F.col("_qs")[0].alias("_head_max"), F.col("_qs")[1].alias("_tail_min")
    )
    return (
        df.crossJoin(F.broadcast(qs))
        .withColumn(
            bucket_col,
            F.when(F.col(ppl_col).isNull(), F.lit(None).cast("string"))
            .when(F.col(ppl_col) <= F.col("_head_max"), F.lit("head"))
            .when(F.col(ppl_col) > F.col("_tail_min"), F.lit("tail"))
            .otherwise(F.lit("middle")),
        )
        .drop("_head_max", "_tail_min")
    )


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_docs: int,
    out_col: str | None = None,
) -> DataFrame:
    """CCNet-style boilerplate stripping: a LINE (normalized: trimmed,
    lowercased) that occurs in MORE than ``max_docs`` distinct documents
    is presumed template chrome (headers, footers, cookie banners, nav)
    and removed from every document; remaining lines are rejoined in
    their original order. Documents losing all lines become ''.

    Scale shape: explode to (doc, pos, line) → distinct-pair count per
    line hash (map-side combinable) → anti-join on the small
    frequent-line set (broadcast: boilerplate is by definition few
    DISTINCT lines) → per-doc ordered re-assembly in one aggregate.
    ``max_docs`` is absolute; callers derive it from corpus size (e.g.
    0.5% of docs) so the operator never needs a driver-side count().
    """
    out_col = out_col or text_col
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    ).withColumn("_k", md5_long(F.trim(F.lower(F.col("_line")))))
    freq = (
        lines.select(id_col, "_k")
        .dropDuplicates([id_col, "_k"])
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_docs"))
        .where(F.col("_docs") > max_docs)
        .select("_k")
    )
    kept = lines.join(F.broadcast(freq), on="_k", how="left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("_rebuilt")
    )
    others = [c for c in df.columns if c != out_col]
    return df.join(rebuilt, on=id_col, how="left").select(
        *others, F.coalesce(F.col("_rebuilt"), F.lit("")).alias(out_col)
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    seq_len: int,
    n_shards: int = 256,
    seed: int = 0,
) -> DataFrame:
    """Assign documents to fixed-length training sequences ("packing"):
    documents are dealt into ``n_shards`` independent shards by a
    deterministic hash, laid end-to-end within each shard in a
    reproducible md5 order, and cut into ``seq_len``-token packs. A doc
    belongs to the pack where it STARTS (``offset`` = its start position
    within that pack); consumers that forbid boundary-crossing can filter
    ``offset + tokens > seq_len``.

    Sharding is what makes this scale: packing is inherently sequential
    (a running offset), so instead of one global ordering — a
    single-partition window — each shard packs independently and in
    parallel, exactly how a 1000-executor job would lay out a 100 TB
    corpus. ONE shuffle (the per-shard window); integer arithmetic
    throughout, so the layout is engine-exact and restart-stable.

    Output: input columns + shard, pack_id (per-shard ordinal), offset.
    """
    h = md5_long(
        F.concat_ws("#", F.col(id_col).cast("string"), F.lit(str(seed)))
    )
    shard = F.pmod(h, F.lit(int(n_shards))).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(h, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col).cast("long")).over(w)
    start = cum - F.col(token_col)
    return (
        df.withColumn("shard", shard)
        .withColumn("pack_id", F.floor(start / F.lit(int(seq_len))))
        .withColumn("offset", (start % F.lit(int(seq_len))).cast("int"))
    )


# ------------------------------------------------------------ quota caps

def cap_per_key(
    df: DataFrame,
    key_col: str,
    cap: int,
    order_by: tuple[Column, ...],
) -> DataFrame:
    """Keep at most ``cap`` rows per key, preferring rows first in
    ``order_by`` (e.g. quality desc, id asc for determinism) — the
    per-domain / per-source quota pass of corpus curation. One shuffle on
    the key; rank is computed in a single window scan."""
    w = Window.partitionBy(key_col).orderBy(*order_by)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= cap)
        .drop("_rk")
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n\n",
    min_chars: int = 10,
    out_col: str | None = None,
) -> DataFrame:
    """C4-style corpus-wide paragraph dedup: every repeated occurrence of
    a paragraph (normalized: trimmed, lowercased) is dropped, keeping the
    FIRST occurrence corpus-wide (ordered by (doc id, position) — the
    same deterministic tie-break C4 applies per three-sentence span).
    Paragraphs shorter than ``min_chars`` are never deduped (empty lines,
    separators, headings — dropping those would destroy formatting and
    they carry no duplication signal). Documents are reassembled with
    surviving paragraphs in their original order.

    Scale shape: explode to (doc, pos, para) → ONE shuffle on the
    paragraph hash for the first-occurrence window (row_number over
    (hash) ordered by (doc, pos)); short paragraphs bypass the shuffle
    entirely via the union branch, which also removes the empty-string
    skew key; per-doc ordered re-assembly is one aggregate. No corpus
    frame is ever collected or broadcast.
    """
    out_col = out_col or text_col
    # spread (r8): the paragraph explode + md5 normalization is the CPU
    # stage BELOW the first shuffle — a single-file local corpus would
    # run it on one core (no-op on cluster scans)
    from ondine_spark.core.partitioning import spread_small

    paras = spread_small(df).select(
        F.col(id_col).alias("_did"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("_pos", "_para"),
    )
    norm = F.trim(F.lower(F.col("_para")))
    dedupable = paras.where(F.length(norm) >= min_chars).withColumn(
        "_k", md5_long(norm)
    )
    w = Window.partitionBy("_k").orderBy("_did", "_pos")
    first = (
        dedupable.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_k", "_rn")
    )
    kept = first.unionByName(paras.where(F.length(norm) < min_chars))
    rebuilt = kept.groupBy("_did").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_para"))),
                lambda s: s["_para"],
            ),
            sep,
        ).alias("_rebuilt")
    )
    others = [c for c in df.columns if c != out_col]
    return df.join(
        rebuilt, on=F.col(id_col) == F.col("_did"), how="left"
    ).select(
        *others, F.coalesce(F.col("_rebuilt"), F.lit("")).alias(out_col)
    )


def excise_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int = 50,
    out_col: str | None = None,
) -> DataFrame:
    """Exact duplicate-SPAN removal (the substring-level dedup of Lee et
    al., "Deduplicating Training Data Makes Language Models Better",
    approximated at token-window granularity): every run of
    ``span_tokens`` consecutive tokens that occurs more than once in the
    corpus is excised from all but its globally-first occurrence (first =
    smallest (doc id, position) — one copy always survives). Documents
    are rebuilt from their surviving tokens.

    Scale shape: token windows are positional word-n-grams (JVM
    expression, no Python); window-hash frequency is one map-side
    combinable groupBy carrying the min-(doc,pos) first-occurrence in the
    same aggregate; per-doc removal windows collapse to disjoint
    intervals with a classic gaps-and-islands window (one shuffle on doc
    id); tokens are dropped via a per-doc interval range-join (interval
    count per doc is small — bounded by duplicated-span count, not text
    length). No corpus-derived set is ever collected or broadcast.
    """
    from ondine_spark.core.partitioning import spread_small
    from ondine_spark.functions.similarity import word_ngrams_all

    out_col = out_col or text_col
    n = span_tokens
    # spread (r8): the window-hash md5 chain runs below the first
    # shuffle; single-file local scans would serialize it on one core
    df = spread_small(df)
    toks = df.select(
        F.col(id_col).alias("_did"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+"))
         .alias("_pos", "_tok"),
    )
    wins = df.select(
        F.col(id_col).alias("_did"),
        F.posexplode(
            F.transform(
                word_ngrams_all(F.col(text_col), n), lambda g: md5_long(g)
            )
        ).alias("_start", "_h"),
    )
    freq = wins.groupBy("_h").agg(
        F.count(F.lit(1)).alias("_c"),
        F.min(F.struct("_did", "_start")).alias("_first"),
    ).where(F.col("_c") >= 2)
    # removal windows: every dup-window occurrence EXCEPT the global first
    remove = (
        wins.join(freq, on="_h")
        .where(
            ~((F.col("_did") == F.col("_first._did"))
              & (F.col("_start") == F.col("_first._start")))
        )
        .select("_did", F.col("_start").alias("_s"),
                (F.col("_start") + n).alias("_e"))
    )
    # gaps-and-islands: merge overlapping [s, e) intervals per doc
    w = Window.partitionBy("_did").orderBy("_s")
    prev_max = F.max("_e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = (
        remove.withColumn(
            "_new",
            F.when(prev_max.isNull() | (F.col("_s") > prev_max), 1).otherwise(0),
        )
        .withColumn(
            "_isl",
            F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("_did", "_isl")
        .agg(F.min("_s").alias("_s"), F.max("_e").alias("_e"))
    )
    survivors = toks.join(
        islands,
        on=[
            toks["_did"] == islands["_did"],
            toks["_pos"] >= islands["_s"],
            toks["_pos"] < islands["_e"],
        ],
        how="left_anti",
    )
    rebuilt = survivors.groupBy("_did").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_tok"))),
                lambda s: s["_tok"],
            ),
            " ",
        ).alias("_rebuilt")
    )
    others = [c for c in df.columns if c != out_col]
    return df.join(
        rebuilt, on=F.col(id_col) == F.col("_did"), how="left"
    ).select(
        *others, F.coalesce(F.col("_rebuilt"), F.lit("")).alias(out_col)
    )


# ------------------------------------------------------ decontamination

def decontaminate(
    train_df: DataFrame,
    bench_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Benchmark decontamination: per training document, how many of its
    distinct word n-grams also occur in the benchmark/eval corpus
    (GPT-3/Gopher-style n-gram contamination check; they use 8-13-grams
    on full-size documents).

    Returns (id_col, n_grams, contaminated_grams, contamination_frac,
    is_contaminated) — one row per training doc, ``is_contaminated`` when
    any n-gram overlaps. Docs shorter than ``n`` words report 0 grams.

    Scale shape: the benchmark side is tiny (eval sets are MBs against a
    100 TB corpus), so its distinct gram-hash set is broadcast — the train
    side never shuffles for the join; the only exchange is the map-side
    combinable per-doc aggregate. Grams are md5_long-hashed so the
    broadcast and the agg keys are fixed-width bigints, not strings.
    """
    bt = bench_text_col or text_col
    bench_grams = (
        bench_df.select(F.explode(word_ngrams(F.col(bt), n)).alias("gram"))
        .select(md5_long(F.col("gram")).alias("g"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    train_grams = train_df.select(
        F.col(id_col),
        F.explode_outer(word_ngrams(F.col(text_col), n)).alias("gram"),
    ).select(
        F.col(id_col),
        F.when(F.col("gram").isNull(), None)
        .otherwise(md5_long(F.col("gram")))
        .alias("g"),
    )
    joined = train_grams.join(F.broadcast(bench_grams), "g", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.col("g")).alias("n_grams"),
            F.coalesce(F.sum(F.col("_hit")), F.lit(0)).cast("bigint").alias(
                "contaminated_grams"
            ),
        )
        .withColumn(
            "contamination_frac",
            F.when(F.col("n_grams") == 0, F.lit(0.0)).otherwise(
                F.col("contaminated_grams").cast("double")
                / F.col("n_grams").cast("double")
            ),
        )
        .withColumn("is_contaminated", F.col("contaminated_grams") > 0)
    )
