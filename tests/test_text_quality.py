"""Quality-rule filters and intra-doc repetition metrics."""

from pyspark.sql import functions as F

from ondine_spark.operators.text_analysis import (
    intra_dup_ngram_chars,
    mean_word_length,
    passes_quality,
    quality_rules,
)


def test_mean_word_length(spark):
    df = spark.createDataFrame(
        [(1, "ab cd ef"), (2, ""), (3, "  spaced   out  ")],
        "id long, text string",
    )
    got = {
        r.id: r.mwl
        for r in df.select(
            "id", mean_word_length(F.col("text")).alias("mwl")
        ).collect()
    }
    assert got[1] == 2.0
    assert got[2] == 0.0
    assert got[3] == (6 + 3) / 2  # "spaced", "out"


def test_intra_dup_ngram_chars(spark):
    df = spark.createDataFrame(
        [
            # "a b" occurs twice (positions 1 and 3): 2 windows of 3 chars
            # duplicated out of 4 windows total
            (1, "a b a b c"),
            (2, "x y z"),        # no repeated bigram
            (3, "solo"),          # < 2 words -> zero windows
        ],
        "id long, text string",
    )
    out = {r.id: r for r in intra_dup_ngram_chars(df, "id", "text", 2).collect()}
    # windows doc1: "a b","b a","a b","b c" -> total chars 12, dup 6
    assert out[1].total_chars == 12 and out[1].dup_chars == 6
    assert out[1].intra_dup_frac == 0.5
    assert out[2].dup_chars == 0 and out[2].intra_dup_frac == 0.0
    assert out[3].total_chars == 0 and out[3].intra_dup_frac == 0.0


def test_quality_rules_and_filter(spark):
    good = "the quick brown fox jumps over the lazy dog " * 5  # 45 words
    df = spark.createDataFrame(
        [
            (1, good),
            (2, "word " * 5),                     # too few words
            (3, "!!! ??? ... ;;; " * 40),         # punctuation soup
            (4, ("zz " * 40) + "qq"),             # no stopwords
        ],
        "id long, text string",
    )
    kw = dict(min_words=30, max_words=1000, max_punct_ratio=0.2)
    rules = quality_rules(F.col("text"), **kw)
    out = {
        r.id: r
        for r in df.select(
            "id",
            *[c.alias(k) for k, c in rules.items()],
            passes_quality(F.col("text"), **kw).alias("keep"),
        ).collect()
    }
    assert out[1].keep
    assert not out[2].rule_word_count and not out[2].keep
    assert not out[3].rule_punct and not out[3].keep
    assert not out[4].rule_stopwords and not out[4].keep


def test_redact_pii(spark):
    from ondine_spark.operators.text_analysis import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@corp.example.org today"),
            (2, "see https://a.example/path?q=1#frag and http://b.io"),
            (3, "call +1 (555) 123-4567 or 08 123 456 789"),
            (4, "clean text with no identifiers at all"),
        ],
        "id long, text string",
    )
    counts = pii_counts(F.col("text"))
    out = {
        r.id: r
        for r in df.select(
            "id",
            redact_pii(F.col("text")).alias("red"),
            *[c.alias(k) for k, c in counts.items()],
        ).collect()
    }
    assert out[1].red == "mail me at <EMAIL> today" and out[1].email == 1
    assert out[2].red == "see <URL> and <URL>" and out[2].url == 2
    assert "<NUMBER>" in out[3].red and out[3].number == 2
    assert out[4].red == out[4].asDict()["red"] and out[4].email == 0
    assert "no identifiers" in out[4].red


def test_remove_boilerplate_lines(spark):
    from ondine_spark.operators.curation import remove_boilerplate_lines

    rows = [
        (i, f"HEADER\nunique body {i}\nFOOTER") for i in range(10)
    ]
    rows.append((99, "HEADER\nFOOTER"))  # doc that is ALL boilerplate
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r.id: r.text
        for r in remove_boilerplate_lines(df, "id", "text", max_docs=5).collect()
    }
    assert out[0] == "unique body 0"
    assert out[7] == "unique body 7"
    assert out[99] == ""           # everything stripped -> empty doc
    assert len(out) == 11          # no rows lost


# ------------------------------------------------- unigram LM perplexity

def test_unigram_perplexity_hand_computed(spark):
    import math

    from ondine_spark.operators.text_analysis import unigram_perplexity

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "   ")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r
        for r in unigram_perplexity(df, "doc_id", "text").collect()
    }
    # corpus: a=2, b=2, c=1 -> N=5, V=3; add-1: p(a)=p(b)=3/8, p(c)=2/8
    h1 = -math.log2(3 / 8)  # all three tokens of doc 1 have p=3/8
    assert got[1]["n_tokens"] == 3
    assert abs(got[1]["cross_entropy"] - h1) < 1e-12
    assert abs(got[1]["perplexity"] - 8 / 3) < 1e-12
    h2 = -(math.log2(3 / 8) + math.log2(2 / 8)) / 2
    assert abs(got[2]["cross_entropy"] - h2) < 1e-12
    # whitespace-only doc: present, NULL entropy/perplexity
    assert got[3]["n_tokens"] == 0
    assert got[3]["cross_entropy"] is None
    assert got[3]["perplexity"] is None


# ------------------------------------------------- bigram LM perplexity

def test_bigram_perplexity_hand_computed(spark):
    import math

    from ondine_spark.operators.text_analysis import bigram_perplexity

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a"), (3, "solo"), (4, " ")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r for r in bigram_perplexity(df, "doc_id", "text").collect()
    }
    # corpus bigrams: "a b"=2, "b a"=2; contexts: a->2, b->2; V = 3 (a,b,solo)
    # p(b|a) = (2+1)/(2+3) = 3/5 ; p(a|b) = (2+1)/(2+3) = 3/5
    assert got[1]["n_bigrams"] == 3
    h1 = -math.log2(3 / 5)
    assert abs(got[1]["cross_entropy"] - h1) < 1e-12
    assert abs(got[1]["perplexity"] - 5 / 3) < 1e-12
    assert got[2]["n_bigrams"] == 1
    assert abs(got[2]["cross_entropy"] - h1) < 1e-12
    # single-token and empty docs: present, NULL scores
    for d in (3, 4):
        assert got[d]["n_bigrams"] == 0
        assert got[d]["cross_entropy"] is None
        assert got[d]["perplexity"] is None


def test_bigram_ranks_shuffled_text_worse(spark):
    # word order is the whole point: a corpus of one repeated fluent
    # sentence vs one doc with the same words scrambled — the scrambled
    # doc must score strictly higher perplexity, while the unigram LM
    # cannot distinguish them at all.
    from ondine_spark.operators.text_analysis import (
        bigram_perplexity,
        unigram_perplexity,
    )

    fluent = "the cat sat on the mat"
    scrambled = "mat the on sat cat the"
    rows = [(i, fluent) for i in range(5)] + [(99, scrambled)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    bg = {r["doc_id"]: r["perplexity"] for r in bigram_perplexity(df, "doc_id", "text").collect()}
    ug = {r["doc_id"]: r["perplexity"] for r in unigram_perplexity(df, "doc_id", "text").collect()}
    assert bg[99] > bg[0]
    assert abs(ug[99] - ug[0]) < 1e-9


def test_lm_perplexities_fused_matches_separate_ops(spark):
    # r8 optimization: the fused frame takes the bigram model's V from
    # the unigram vocab subplan instead of a third corpus tokenize —
    # must be column-for-column identical to joining the two operators.
    from ondine_spark.operators.text_analysis import (
        bigram_perplexity,
        lm_perplexities,
        unigram_perplexity,
    )

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a"), (3, "solo"), (4, " "),
         (5, "the cat sat on the mat"), (6, "mat the on sat cat the")],
        ["doc_id", "text"],
    )
    fused = {r["doc_id"]: r for r in lm_perplexities(df, "doc_id", "text").collect()}
    uni = {r["doc_id"]: r for r in unigram_perplexity(df, "doc_id", "text").collect()}
    bi = {r["doc_id"]: r for r in bigram_perplexity(df, "doc_id", "text").collect()}
    assert set(fused) == set(uni) == set(bi)
    for d in fused:
        assert fused[d]["n_tokens"] == uni[d]["n_tokens"]
        assert fused[d]["n_bigrams"] == bi[d]["n_bigrams"]
        for got, want in (
            (fused[d]["cross_entropy_unigram"], uni[d]["cross_entropy"]),
            (fused[d]["cross_entropy_bigram"], bi[d]["cross_entropy"]),
        ):
            if want is None:
                assert got is None
            else:
                assert abs(got - want) < 1e-12


def test_bigram_perplexity_vocab_df_seam(spark):
    # passing the unigram vocab frame must give bit-equal results to the
    # internal count_distinct tokenize (V is the same integer)
    from ondine_spark.operators.text_analysis import (
        _unigram_perplexity_frames,
        bigram_perplexity,
    )

    df = spark.createDataFrame(
        [(1, "x y x"), (2, "y z"), (3, "")], ["doc_id", "text"]
    )
    _, vocab = _unigram_perplexity_frames(df, "doc_id", "text")
    with_seam = {r["doc_id"]: r for r in bigram_perplexity(
        df, "doc_id", "text", vocab_df=vocab).collect()}
    without = {r["doc_id"]: r for r in bigram_perplexity(
        df, "doc_id", "text").collect()}
    assert set(with_seam) == set(without)
    for d in with_seam:
        assert with_seam[d]["n_bigrams"] == without[d]["n_bigrams"]
        a, b = with_seam[d]["cross_entropy"], without[d]["cross_entropy"]
        assert (a is None and b is None) or a == b
