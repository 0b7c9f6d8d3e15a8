"""Unit tests for corpus-curation operators (sessions, dup-ngram fraction,
deterministic sampling, quota caps)."""

import datetime as dt

from pyspark.sql import functions as F

from ondine_spark.operators.curation import (
    cap_per_key,
    dup_ngram_fraction,
    hash_sample,
    session_stats,
    sessionize,
    stratified_hash_sample,
)


def _ts(minute):
    return dt.datetime(2026, 1, 1, 12, minute, 0)


def _events_df(spark):
    rows = [
        # user 1: two sessions split by a 45-min gap
        (1, 1, _ts(0), 10.0),
        (2, 1, _ts(10), 20.0),
        (3, 1, _ts(55), 5.0),
        # user 2: one session, events exactly at the 30-min boundary (gap
        # == 1800 s is NOT a new session: strict > )
        (4, 2, _ts(0), 1.0),
        (5, 2, _ts(30), 2.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def test_sessionize_gap_splits(spark):
    out = sessionize(
        _events_df(spark), "user_id", "ts", 1800, order_cols=("event_id",)
    )
    got = {
        (r.event_id): r.session_seq for r in out.collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


def test_session_stats_rollup(spark):
    out = session_stats(
        _events_df(spark), "user_id", "ts", 1800,
        order_cols=("event_id",), value_col="value",
    )
    rows = {(r.user_id, r.session_seq): r for r in out.collect()}
    assert set(rows) == {(1, 1), (1, 2), (2, 1)}
    s11 = rows[(1, 1)]
    assert s11.n_events == 2
    assert s11.span_seconds == 600
    assert s11.value_sum == 30.0
    assert rows[(2, 1)].n_events == 2  # 1800-s gap stays one session


def test_dup_ngram_fraction(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown cat sleeps"),
            (3, "completely unrelated words here now"),
            (4, "ab"),  # shorter than n words -> 0 grams
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dup_ngram_fraction(df, "doc_id", "text", 3).collect()}
    assert set(out) == {1, 2, 3, 4}
    # docs 1 and 2 share exactly "the quick brown" (1 of 3 grams each)
    assert out[1].n_grams == 3 and out[1].dup_grams == 1
    assert out[1].dup_frac == 1 / 3
    assert out[2].dup_grams == 1
    assert out[3].dup_grams == 0 and out[3].dup_frac == 0.0
    assert out[4].n_grams == 0 and out[4].dup_frac == 0.0


def test_hash_sample_deterministic_and_monotone(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in hash_sample(df, "doc_id", 0.3, seed=7).collect()}
    b = {r.doc_id for r in hash_sample(df, "doc_id", 0.3, seed=7).collect()}
    assert a == b  # reproducible
    assert 200 < len(a) < 400  # roughly the asked fraction
    bigger = {r.doc_id for r in hash_sample(df, "doc_id", 0.6, seed=7).collect()}
    assert a <= bigger  # nested samples: raising the rate only adds rows
    assert hash_sample(df, "doc_id", 0.0, seed=7).count() == 0


def test_stratified_sample_rates(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "yo") for i in range(1000)],
        "doc_id long, lang string",
    )
    out = stratified_hash_sample(
        df, "doc_id", "lang", {"en": 0.0, "yo": 1.0}, default_fraction=0.5
    )
    langs = {r.lang for r in out.collect()}
    assert langs == {"yo"}
    assert out.count() == 500


def test_cap_per_key_keeps_top(spark):
    df = spark.createDataFrame(
        [(k, i, 100 - i) for k in ("a", "b") for i in range(10)],
        "src string, doc_id long, score long",
    )
    out = cap_per_key(
        df, "src", 3, (F.col("score").desc(), F.col("doc_id"))
    )
    rows = out.collect()
    assert len(rows) == 6
    # highest scores survive; helper column is dropped
    assert {r.doc_id for r in rows} == {0, 1, 2}
    assert "_rk" not in out.columns


def test_sample_to_token_budget(spark):
    from ondine_spark.operators.curation import sample_to_token_budget

    df = spark.createDataFrame(
        [(i, "en" if i < 50 else "fr", 100) for i in range(100)],
        "doc_id long, lang string, n_tokens long",
    )
    out = sample_to_token_budget(
        df, "doc_id", "lang", "n_tokens", budget=1000, budgets={"fr": 250}
    )
    by_lang = {
        r.lang: r.total
        for r in out.groupBy("lang")
        .agg(F.sum("n_tokens").alias("total"), F.count("*").alias("n"))
        .collect()
    }
    assert by_lang["en"] == 1000   # exact fill: 10 docs of 100 tokens
    assert by_lang["fr"] == 300    # 250 budget -> 2 full docs + overshoot 1
    # deterministic: same call returns the same ids
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in sample_to_token_budget(
            df, "doc_id", "lang", "n_tokens", budget=1000, budgets={"fr": 250}
        ).collect()
    )
    assert a == b


def test_pack_sequences_layout(spark):
    from ondine_spark.operators.curation import pack_sequences

    df = spark.createDataFrame(
        [(i, 100) for i in range(40)], "doc_id long, n_tokens long"
    )
    out = pack_sequences(df, "doc_id", "n_tokens", seq_len=250, n_shards=2)
    rows = out.collect()
    assert len(rows) == 40
    for shard in (0, 1):
        layout = sorted(
            ((r.pack_id, r.offset) for r in rows if r.shard == shard)
        )
        # contiguous: each doc starts where the previous ended (mod 250)
        pos = 0
        for pack_id, offset in layout:
            assert pack_id == pos // 250
            assert offset == pos % 250
            pos += 100
    # deterministic across invocations
    again = pack_sequences(df, "doc_id", "n_tokens", seq_len=250, n_shards=2)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


# ------------------------------------------------------ decontamination

def test_decontaminate_flags_overlapping_ngrams(spark):
    train = spark.createDataFrame(
        [
            (1, "x a b c d e"),      # grams "a b c d" + "b c d e" overlap
            (2, "p q r s t u"),      # clean
            (3, "a b c"),            # shorter than n=4 -> 0 grams
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(100, "a b c d e")], ["doc_id", "text"])

    from ondine_spark.operators.curation import decontaminate

    got = {
        r["doc_id"]: r
        for r in decontaminate(train, bench, "doc_id", "text", n=4).collect()
    }
    assert got[1]["n_grams"] == 3
    assert got[1]["contaminated_grams"] == 2
    assert got[1]["is_contaminated"] is True
    assert got[2]["contaminated_grams"] == 0
    assert got[2]["is_contaminated"] is False
    assert got[3]["n_grams"] == 0
    assert got[3]["contamination_frac"] == 0.0


def test_decontaminate_counts_distinct_grams_once(spark):
    # repeated contaminated gram in one doc counts once (distinct shingles)
    train = spark.createDataFrame(
        [(1, "a b c d a b c d")], ["doc_id", "text"]
    )
    bench = spark.createDataFrame([(9, "a b c d")], ["doc_id", "text"])

    from ondine_spark.operators.curation import decontaminate

    row = decontaminate(train, bench, "doc_id", "text", n=4).collect()[0]
    # distinct grams of the train doc: "a b c d", "b c d a", "c d a b",
    # "d a b c" -> only "a b c d" is in the bench set
    assert row["n_grams"] == 4
    assert row["contaminated_grams"] == 1


def test_dedup_paragraphs_keeps_first_occurrence(spark):
    """C4-style paragraph dedup: repeated paragraphs survive only in the
    first (doc_id, pos) occurrence; short paragraphs are never deduped;
    order within docs is preserved."""
    from ondine_spark.operators.curation import dedup_paragraphs

    shared = "subscribe to our newsletter for updates"
    rows = [
        (1, f"unique one body text here\n\n{shared}\n\nsecond unique para"),
        (2, f"{shared}\n\nanother document entirely\n\n--"),
        (3, f"third doc leading content\n\n{shared.upper()}"),  # case-insensitive
        (4, "--\n\n--\n\nshort seps kept"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in dedup_paragraphs(df, "doc_id", "text").collect()}
    # doc 1 is the first occurrence (doc order) -> keeps the shared para
    assert out[1] == rows[0][1]
    # docs 2 and 3 lose it (case-insensitive normalization)
    assert out[2] == "another document entirely\n\n--"
    assert out[3] == "third doc leading content"
    # "--" is under min_chars -> kept everywhere, even repeated
    assert out[4] == "--\n\n--\n\nshort seps kept"


def test_dedup_paragraphs_duplicate_within_one_doc(spark):
    from ondine_spark.operators.curation import dedup_paragraphs

    df = spark.createDataFrame(
        [(7, "repeated paragraph body\n\nmiddle part\n\nrepeated paragraph body")],
        "doc_id long, text string",
    )
    out = dedup_paragraphs(df, "doc_id", "text").collect()[0]["text"]
    assert out == "repeated paragraph body\n\nmiddle part"


def test_dedup_paragraphs_noop_when_all_unique(spark):
    """Docs with no repeated paragraphs round-trip byte-identically."""
    from ondine_spark.operators.curation import dedup_paragraphs

    rows = [(i, f"alpha paragraph {i}\n\nbeta paragraph {i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in dedup_paragraphs(df, "doc_id", "text").collect()}
    assert out == dict(rows)


def test_excise_duplicate_spans_keeps_first_occurrence(spark):
    """Lee-et-al-style span excision: a repeated 5-token run survives only
    in its globally-first (doc, pos) occurrence; unrelated text is
    untouched."""
    from ondine_spark.operators.curation import excise_duplicate_spans

    span = "the quick brown fox jumps"
    rows = [
        (1, f"intro words here {span} tail one"),
        (2, f"{span} completely different tail"),
        (3, "no duplication in this document at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in excise_duplicate_spans(df, "doc_id", "text",
                                           span_tokens=5).collect()}
    assert out[1] == rows[0][1]                       # first occurrence kept
    assert out[2] == "completely different tail"      # span excised
    assert out[3] == rows[2][1]                       # untouched


def test_excise_duplicate_spans_overlapping_runs_merge(spark):
    """A duplicated run longer than span_tokens produces overlapping
    duplicated windows; the merged interval must excise the WHOLE run in
    the non-first doc, not leave fragments."""
    from ondine_spark.operators.curation import excise_duplicate_spans

    run = "a b c d e f g h"  # 8 tokens, span_tokens=5 -> 4 overlapping wins
    df = spark.createDataFrame(
        [(1, f"keep {run} one"), (2, f"{run} other side")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"]
           for r in excise_duplicate_spans(df, "doc_id", "text",
                                           span_tokens=5).collect()}
    assert out[1] == f"keep {run} one"
    assert out[2] == "other side"


def test_excise_duplicate_spans_short_docs_untouched(spark):
    from ondine_spark.operators.curation import excise_duplicate_spans

    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["text"]
           for r in excise_duplicate_spans(df, "doc_id", "text",
                                           span_tokens=5).collect()}
    # both docs are shorter than one span window -> nothing to excise
    assert out == {1: "tiny doc", 2: "tiny doc"}


def test_shard_for_training_deterministic_and_balanced(spark):
    from ondine_spark.operators.curation import shard_for_training

    rows = [(f"doc{i:04d}", f"text {i}") for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def snapshot(frame):
        return sorted(
            (r["doc_id"], r["shard"], r["pos"])
            for r in shard_for_training(frame, 8, seed="s1").collect()
        )

    base = snapshot(df.coalesce(1))
    # assignment and within-shard positions are invariant to layout
    assert snapshot(df.repartition(7)) == base
    assert snapshot(df.repartition(32, "text")) == base

    # shards are hash-balanced: all 8 within +-20% of N/8 at N=2000
    from collections import Counter

    sizes = Counter(s for _, s, _ in base)
    assert set(sizes) == set(range(8))
    assert all(abs(v - 250) <= 50 for v in sizes.values()), sizes

    # pos is dense 0..k-1 per shard
    per = {}
    for _, s, p in base:
        per.setdefault(s, []).append(p)
    for s, ps in per.items():
        assert sorted(ps) == list(range(len(ps)))

    # a different seed produces a different permutation
    other = sorted(
        (r["doc_id"], r["shard"], r["pos"])
        for r in shard_for_training(df, 8, seed="s2").collect()
    )
    assert other != base


def test_write_training_shards_layout(spark, tmp_path):
    from ondine_spark.operators.curation import (
        shard_for_training,
        write_training_shards,
    )

    rows = [(f"d{i:03d}", i) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "v"])
    out = str(tmp_path / "shards")
    write_training_shards(df, out, 4, seed="x")

    back = spark.read.parquet(out)
    assert back.count() == 300
    assert sorted(r["shard"] for r in back.select("shard").distinct().collect()) == [0, 1, 2, 3]
    # file order within a shard == pos order (trainer streams without sorting)
    import glob

    for k in range(4):
        files = sorted(glob.glob(f"{out}/shard={k}/*.parquet"))
        assert len(files) == 1, files  # one sorted file per shard
        import pyarrow.parquet as pq

        t = pq.read_table(files[0]).to_pydict()
        assert t["pos"] == sorted(t["pos"])


def test_shard_for_training_check_unique_and_col_collision(spark):
    """ADVICE r6: duplicate ids break pos determinism — check_unique=True
    must raise; and a user column named like the internal shuffle key
    must survive untouched."""
    import pytest as _pytest

    from ondine_spark.operators.curation import shard_for_training

    dup = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], ["doc_id", "v"]
    )
    with _pytest.raises(ValueError, match="duplicate"):
        shard_for_training(dup, 2, check_unique=True).collect()

    # unique ids pass the check and produce the same frame as unchecked
    uniq = spark.createDataFrame(
        [(f"d{i}", i) for i in range(50)], ["doc_id", "v"]
    )
    checked = sorted(
        (r["doc_id"], r["shard"], r["pos"])
        for r in shard_for_training(uniq, 4, check_unique=True).collect()
    )
    unchecked = sorted(
        (r["doc_id"], r["shard"], r["pos"])
        for r in shard_for_training(uniq, 4).collect()
    )
    assert checked == unchecked

    # a pre-existing column with the internal key name is not clobbered
    clash = uniq.withColumnRenamed("v", "__ondine_shard_key")
    out = shard_for_training(clash, 4)
    got = {r["doc_id"]: r["__ondine_shard_key"] for r in out.collect()}
    assert got == {f"d{i}": i for i in range(50)}
    assert {r["doc_id"]: (r["shard"], r["pos"]) for r in out.collect()} == {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shard_for_training(uniq, 4).collect()
    }


def test_dup_ngram_fraction_duplicate_ids_merge_like_instances(spark):
    """r9 internals change (unique-complement aggregation instead of the
    count-over-window): duplicate ids must still aggregate per id with
    instance-counting semantics — every row's gram instances count."""
    df = spark.createDataFrame(
        [(1, "a b c d"), (1, "a b c x"), (2, "a b c y")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dup_ngram_fraction(df, "doc_id", "text", 3).collect()}
    # "a b c" occurs in 3 instances (doc 1 twice, doc 2 once) -> dup;
    # the three "b c ?" grams are corpus-unique
    assert out[1].n_grams == 4 and out[1].dup_grams == 2
    assert out[1].dup_frac == 0.5
    assert out[2].n_grams == 2 and out[2].dup_grams == 1


def test_dup_ngram_fraction_plan_is_window_free(spark):
    """r9 skew hardening: the gram doc-frequency must come from partially
    aggregating groupBys (hot keys collapse map-side), never a window
    over the gram key (no partial aggregation — one reducer per hot
    gram at corpus scale, and AQE skew handling does not cover windows)."""
    import contextlib
    import io

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dup_ngram_fraction(df, "doc_id", "text", 3).explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan, plan
    assert "HashAggregate" in plan
