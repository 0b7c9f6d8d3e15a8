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
