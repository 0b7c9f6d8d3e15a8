"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

Training-data-pipeline operators beyond the reference surface (SURVEY.md §7
phase 6). Every function here is a pure JVM column expression — they run
inside whole-stage codegen at corpus scale, no Python — and each has an
exact ANSI-SQL equivalent so the DuckDB oracle can replay it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ondine_spark.functions.similarity import char_ngrams, md5_long

# ------------------------------------------------------------ token counting

#: BPE-ish tokenization: letter runs, single digits, punctuation singles —
#: a cheap proxy for subword token counts (cl100k-style) used for cost
#: estimation at corpus scale.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]|[^a-z0-9\s]"


def token_count_ws(col: Column) -> Column:
    """Whitespace token count (Python str.split parity)."""
    return F.size(F.filter(F.split(F.trim(col), r"\s+"), lambda x: x != ""))


def token_count_bpe(col: Column) -> Column:
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(BPE_ISH_PATTERN), 0))


def estimate_llm_tokens(col: Column) -> Column:
    """The reference's fallback token estimate: words × 1.3
    (reference: ondine/stages/llm_invocation_stage.py:557-579)."""
    return F.ceil(token_count_ws(col) * 1.3).cast("int")


# ------------------------------------------------------------ quality score

STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this",
)


def stopword_hits(col: Column) -> Column:
    """Number of whitespace tokens that are English stopwords."""
    toks = F.filter(F.split(F.trim(F.lower(col)), r"\s+"), lambda x: x != "")
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    p = F.length(F.regexp_replace(col, r"[^.,;:!?'\"()\-]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n.cast("double"))


def quality_score(col: Column) -> Column:
    """Composite quality heuristic in [0,1]:
      0.4·length_score (saturating at 1000 chars)
    + 0.3·stopword_score (stopword ratio ≥ 0.05 → full marks; word salad
      with no function words scores low)
    + 0.3·(1 − min(1, punct_ratio·10)) (punctuation-soup penalty).
    Deterministic, SQL-replayable."""
    n = F.length(col).cast("double")
    length_score = F.least(n / F.lit(1000.0), F.lit(1.0))
    toks = token_count_ws(col).cast("double")
    sw_ratio = F.when(toks == 0, F.lit(0.0)).otherwise(stopword_hits(col) / toks)
    sw_score = F.least(sw_ratio / F.lit(0.05), F.lit(1.0))
    p_score = F.lit(1.0) - F.least(punct_ratio(col) * 10.0, F.lit(1.0))
    return 0.4 * length_score + 0.3 * sw_score + 0.3 * p_score


# ------------------------------------------------------------- language ID

#: marker words per language (function words — high-frequency, short).
LANG_MARKERS: dict[str, tuple] = {
    "en": ("the", "and", "is", "of", "to", "in", "that", "with"),
    "es": ("el", "la", "los", "las", "es", "y", "de", "que", "en", "un"),
    "fr": ("le", "la", "les", "est", "et", "de", "que", "en", "une", "du"),
    "de": ("der", "die", "das", "ist", "und", "von", "mit", "ein", "nicht"),
    "zh": ("的", "是", "在", "了", "和", "有", "我", "不"),
}


def lang_scores(col: Column) -> dict[str, Column]:
    toks = F.filter(F.split(F.trim(F.lower(col)), r"\s+"), lambda x: x != "")
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_id(col: Column, min_hits: int = 1) -> Column:
    """Argmax of marker-word hits; ties broken by the fixed language order
    of LANG_MARKERS; 'unknown' when no language reaches min_hits."""
    scores = lang_scores(col)
    best = None
    best_score = None
    for lang, s in scores.items():
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            better = s > best_score
            best = F.when(better, F.lit(lang)).otherwise(best)
            best_score = F.when(better, s).otherwise(best_score)
    return F.when(best_score >= min_hits, best).otherwise(F.lit("unknown"))


# ---------------------------------------------------------- fingerprinting

def fingerprint_exact(col: Column) -> Column:
    """Exact-dup fingerprint: md5 of normalized text."""
    norm = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    return F.md5(norm)


def fingerprint_rolling(col: Column, n: int = 8) -> Column:
    """Winnowing-style fingerprint: minimum md5_long over character
    n-grams of the lowercased text — stable under small edits anywhere
    except the minimizing window. bigint, portable to the SQL oracle."""
    grams = char_ngrams(col, n)
    hashed = F.transform(grams, lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("bigint"))
    return F.array_min(hashed)


# --------------------------------------- repetition / quality rule filters

def mean_word_length(col: Column) -> Column:
    """Mean characters per whitespace token (0.0 for empty text)."""
    toks = F.filter(F.split(F.trim(col), r"\s+"), lambda x: x != "")

    def stats(t: Column) -> Column:
        total = F.aggregate(
            t, F.lit(0), lambda acc, x: acc + F.length(x)
        ).cast("double")
        return F.when(F.size(t) == 0, F.lit(0.0)).otherwise(
            total / F.size(t).cast("double")
        )

    from ondine_spark.functions.similarity import let_bind

    return let_bind(toks, stats)


def intra_dup_ngram_chars(
    df, id_col: str, text_col: str, n: int = 2
):
    """Per-document intra-doc repetition: the fraction of n-gram-window
    characters that belong to windows occurring ≥2 times WITHIN the doc
    (Gopher's duplicate-n-gram-character signal; dup_ngram_fraction is
    the cross-doc complement). Weighted by multiplicity: a gram occurring
    k ≥ 2 times contributes all k·len(gram) characters to the numerator.

    Returns (id_col, total_chars, dup_chars, intra_dup_frac). Shuffles
    once on (doc, gram) — map-side combinable — then once on doc.
    """
    from ondine_spark.core.partitioning import spread_small
    from ondine_spark.functions.similarity import word_ngrams_all

    # r8 rewrite — a PER-DOC statistic must not shuffle the corpus's
    # grams: the old explode → groupBy(doc, gram) → groupBy(doc) moved
    # every gram instance through two exchanges. The grams stay a JVM
    # array per row; ONE Arrow kernel counts within-doc multiplicities
    # (vectorized pandas groupby per batch) — zero keyed shuffles.
    # Integer char sums are order-free; the frac is the same double
    # division; gram length counts code points, exactly like Spark's
    # length() (UTF8String.numChars == Python len()).
    base = spread_small(df).select(
        F.col(id_col), word_ngrams_all(F.col(text_col), n).alias("_g")
    )
    id_type = dict(base.dtypes)[id_col]
    out_schema = (
        f"{id_col} {id_type}, total_chars long, dup_chars long, "
        "intra_dup_frac double"
    )

    def _intra_batches(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            nrows = len(pdf)
            lists = [x if x is not None else [] for x in pdf["_g"]]
            lens = np.fromiter(
                (len(a) for a in lists), dtype=np.int64, count=nrows
            )
            total = np.zeros(nrows, dtype=np.int64)
            dup = np.zeros(nrows, dtype=np.int64)
            if lens.sum() > 0:
                row_of = np.repeat(np.arange(nrows), lens)
                flat = pd.Series(
                    [g for a in lists for g in a], dtype="object"
                )
                # Spark length() counts CODE POINTS (UTF8String.numChars)
                # — exactly Python len()
                glen = flat.str.len().to_numpy(dtype=np.int64)
                grp = pd.DataFrame(
                    {"r": row_of, "g": flat, "l": glen}
                ).groupby(["r", "g"], sort=False)
                agg = grp["l"].agg(["count", "first"])
                cnt = agg["count"].to_numpy(dtype=np.int64)
                chars = cnt * agg["first"].to_numpy(dtype=np.int64)
                r_idx = agg.index.get_level_values("r").to_numpy(
                    dtype=np.int64
                )
                np.add.at(total, r_idx, chars)
                np.add.at(dup, r_idx, np.where(cnt >= 2, chars, 0))
            frac = np.where(
                total == 0, 0.0, dup.astype(np.float64)
                / np.where(total == 0, 1, total).astype(np.float64)
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "total_chars": total,
                    "dup_chars": dup,
                    "intra_dup_frac": frac,
                }
            )

    return base.mapInPandas(_intra_batches, schema=out_schema)


def quality_rules(
    col: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_punct_ratio: float = 0.3,
    min_stopword_hits: int = 2,
) -> dict[str, Column]:
    """Gopher/MassiveText-style quality rule booleans (word-count bounds,
    mean-word-length bounds, punctuation-soup cap, must contain function
    words). Each rule is its own boolean column so corpora can be triaged
    per rule; AND them (``passes_quality``) for the filter."""
    words = token_count_ws(col)
    mwl = mean_word_length(col)
    return {
        "rule_word_count": (words >= min_words) & (words <= max_words),
        "rule_mean_word_len": (mwl >= min_mean_word_len)
        & (mwl <= max_mean_word_len),
        "rule_punct": punct_ratio(col) <= max_punct_ratio,
        "rule_stopwords": stopword_hits(col) >= min_stopword_hits,
    }


def passes_quality(col: Column, **thresholds) -> Column:
    """AND of all quality_rules."""
    rules = quality_rules(col, **thresholds)
    out = F.lit(True)
    for c in rules.values():
        out = out & c
    return out


# ----------------------------------------------------------- redaction

#: conservative patterns: emails, URLs, long digit runs (phone/card-ish).
#: Deliberately simple & deterministic — SQL-replayable, no catastrophic
#: backtracking at corpus scale.
REDACT_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("number", r"\b[0-9][0-9 ()+.-]{7,}[0-9]\b", "<NUMBER>"),
)


def redact_pii(col: Column) -> Column:
    """Replace emails, URLs, and long digit runs with typed placeholder
    tokens — the standard scrub before LLM training. Pure JVM regexp
    chain; order matters (emails before bare numbers)."""
    out = col
    for _, pat, token in REDACT_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind match counts (for corpus PII audits)."""
    return {
        name: F.size(F.regexp_extract_all(col, F.lit(pat), 0))
        for name, pat, _ in REDACT_PATTERNS
    }


# ------------------------------------------------- unigram LM perplexity

def unigram_perplexity(
    df, id_col: str, text_col: str, alpha: float = 1.0
):
    """Per-document perplexity under an add-alpha-smoothed unigram LM fit
    on the corpus itself — the cheap stand-in for CCNet's KenLM quality
    signal: fluent prose full of common words scores low, gibberish and
    rare-token soup scores high.

    p(w) = (c(w) + alpha) / (N + alpha * V); per doc,
    cross_entropy = -(1/T) * sum_w c_dw * log2 p(w); ppl = 2^H.
    Returns (id_col, n_tokens, cross_entropy, perplexity); empty docs get
    NULL entropy/perplexity.

    Scale shape: tokens are pre-aggregated per (doc, token) before the
    vocabulary join, so the join carries type counts, not token instances.
    The vocabulary frame (one row per distinct corpus token) grows
    sub-linearly with corpus size (~1e8 types at 100 TB) — too big to
    broadcast, so it shuffle-joins on the token; both inputs are already
    hash-partitioned on that key by their aggregates, so the join adds no
    extra exchange. The corpus totals (N, V) are two scalars cross-joined
    as a 1-row broadcast.
    """
    out, _vocab = _unigram_perplexity_frames(df, id_col, text_col, alpha)
    return out


def _unigram_perplexity_frames(
    df, id_col: str, text_col: str, alpha: float = 1.0
):
    """Internals of :func:`unigram_perplexity`, also returning the corpus
    ``vocab`` frame (one row per distinct token) so callers that need the
    vocabulary size too — :func:`lm_perplexities` feeds it to the bigram
    model — can reuse this subplan instead of re-tokenizing the corpus."""
    toks = df.select(
        F.col(id_col),
        F.explode_outer(
            F.filter(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("tok"),
    )
    doc_counts = toks.groupBy(id_col, "tok").agg(
        F.count(F.when(F.col("tok").isNotNull(), 1)).alias("c_dw")
    )
    vocab = (
        doc_counts.where(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.sum("c_dw").alias("c_w"))
    )
    totals = vocab.agg(
        F.sum("c_w").cast("double").alias("corpus_n"),
        F.count(F.lit(1)).cast("double").alias("vocab_v"),
    )
    logp = vocab.crossJoin(F.broadcast(totals)).select(
        "tok",
        F.log2(
            (F.col("c_w") + F.lit(float(alpha)))
            / (F.col("corpus_n") + F.lit(float(alpha)) * F.col("vocab_v"))
        ).alias("logp"),
    )
    joined = doc_counts.join(logp, "tok", "left")
    per_doc = joined.groupBy(id_col).agg(
        F.coalesce(F.sum("c_dw"), F.lit(0)).cast("bigint").alias("n_tokens"),
        F.sum(F.col("c_dw") * F.col("logp")).alias("_sum_logp"),
    )
    h = -F.col("_sum_logp") / F.col("n_tokens").cast("double")
    out = per_doc.select(
        F.col(id_col),
        "n_tokens",
        F.when(F.col("n_tokens") == 0, F.lit(None).cast("double"))
        .otherwise(h)
        .alias("cross_entropy"),
        F.when(F.col("n_tokens") == 0, F.lit(None).cast("double"))
        .otherwise(F.pow(F.lit(2.0), h))
        .alias("perplexity"),
    )
    return out, vocab


def bigram_perplexity(
    df, id_col: str, text_col: str, alpha: float = 1.0,
    vocab_df=None,
):
    """Per-document perplexity under an add-alpha-smoothed *bigram* LM fit
    on the corpus — one step closer to CCNet's KenLM signal than
    :func:`unigram_perplexity`: it scores word ORDER, so shuffled or
    templated text stands out even when its word frequencies look normal.

    p(w2|w1) = (c(w1 w2) + alpha) / (c(w1 ·) + alpha * V), V = unigram
    vocabulary size; per doc H = -(1/T) * sum c_d(w1 w2) * log2 p, T = the
    doc's bigram instance count; ppl = 2^H. Docs with < 2 tokens get NULL.
    Returns (id_col, n_bigrams, cross_entropy, perplexity).

    Scale shape mirrors the unigram operator: the corpus is reduced to
    per-(doc, bigram) type counts before any join; the bigram LM frame is
    built by one groupBy over those counts plus a re-aggregation on the
    context word, and joins back on the bigram key — both sides already
    hash-partitioned on it. V is a 1-row broadcast.
    """
    from ondine_spark.functions.similarity import tokens, word_ngrams_all

    bg = df.select(
        F.col(id_col),
        F.explode_outer(word_ngrams_all(F.col(text_col), 2)).alias("bg"),
    )
    doc_counts = bg.groupBy(id_col, "bg").agg(
        F.count(F.when(F.col("bg").isNotNull(), 1)).alias("c_db")
    )
    corpus = (
        doc_counts.where(F.col("bg").isNotNull())
        .groupBy("bg")
        .agg(F.sum("c_db").alias("c_b"))
    )
    ctx = corpus.groupBy(F.split(F.col("bg"), " ")[0].alias("w1")).agg(
        F.sum("c_b").alias("c_w1")
    )
    if vocab_df is not None:
        # optimization seam (r8): callers computing the unigram model too
        # already hold the corpus vocabulary — one row per distinct token
        # — so the bigram model can take V from it (one tiny aggregate
        # over an exchange-reusable subplan) instead of re-tokenizing the
        # whole corpus a third time. count(*) over distinct-token rows ==
        # count_distinct(tok) over token instances, exactly.
        vocab = vocab_df.agg(
            F.count(F.lit(1)).cast("double").alias("vocab_v")
        )
    else:
        vocab = (
            df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
            .agg(F.count_distinct("tok").cast("double").alias("vocab_v"))
        )
    a = F.lit(float(alpha))
    logp = (
        corpus.join(ctx, F.split(F.col("bg"), " ")[0] == F.col("w1"))
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            F.log2((F.col("c_b") + a) / (F.col("c_w1") + a * F.col("vocab_v"))).alias("logp"),
        )
    )
    per_doc = (
        doc_counts.join(logp, "bg", "left")
        .groupBy(id_col)
        .agg(
            F.coalesce(F.sum("c_db"), F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.sum(F.col("c_db") * F.col("logp")).alias("_sum_logp"),
        )
    )
    h = -F.col("_sum_logp") / F.col("n_bigrams").cast("double")
    return per_doc.select(
        F.col(id_col),
        "n_bigrams",
        F.when(F.col("n_bigrams") == 0, F.lit(None).cast("double"))
        .otherwise(h)
        .alias("cross_entropy"),
        F.when(F.col("n_bigrams") == 0, F.lit(None).cast("double"))
        .otherwise(F.pow(F.lit(2.0), h))
        .alias("perplexity"),
    )


def lm_perplexities(
    df, id_col: str, text_col: str, alpha: float = 1.0
):
    """Unigram AND bigram LM cross-entropies in one frame, per doc —
    ``unigram_perplexity ⋈ bigram_perplexity`` with the bigram model's
    vocabulary size taken from the unigram model's vocab frame (r8
    optimization: the standalone bigram operator re-tokenizes the whole
    corpus just to count distinct tokens; here that third tokenize pass
    collapses to one tiny aggregate whose subplan Spark de-duplicates
    via ReusedExchange). Column-for-column identical to joining the two
    operators: V is the same integer either way, every other expression
    is shared code.

    Returns (id_col, n_tokens, cross_entropy_unigram, n_bigrams,
    cross_entropy_bigram)."""
    uni, vocab = _unigram_perplexity_frames(df, id_col, text_col, alpha)
    bi = bigram_perplexity(df, id_col, text_col, alpha, vocab_df=vocab)
    return (
        uni.select(
            id_col, "n_tokens",
            F.col("cross_entropy").alias("cross_entropy_unigram"),
        )
        .join(
            bi.select(
                id_col, "n_bigrams",
                F.col("cross_entropy").alias("cross_entropy_bigram"),
            ),
            on=id_col,
        )
    )
