"""BPE tokenizer: training parity vs a from-scratch reference
implementation, encode/decode roundtrips, and distributed == driver-side
tokenization."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from ondine_spark.operators.tokenizer import (
    BpeTokenizer,
    END_OF_WORD,
    bpe_token_count,
    pretokenize,
    tokenize_with_bpe,
    train_bpe,
    word_counts,
)

CORPUS = [
    "the lower the newest the widest",
    "low lower lowest new newer newest",
    "wide wider widest low low low",
    "the new lower house, the widest room!",
    "newest lowest widest -- the the the",
]


def _reference_bpe(word_freqs, num_merges, mode):
    """Sennrich et al. (2016) BPE, the naive O(merges × types) version:
    recount every pair from scratch each round. Ground truth for the
    incremental trainer."""
    if mode == "whitespace":
        words = {tuple(w) + (END_OF_WORD,): c for w, c in word_freqs.items()}
    else:
        words = {tuple(w): c for w, c in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, c in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        new_words = {}
        ns = best[0] + best[1]
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(ns)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
        words = new_words
    return merges


@pytest.mark.parametrize("mode", ["gpt2", "whitespace"])
def test_train_matches_reference_implementation(mode):
    freqs = Counter()
    for line in CORPUS:
        freqs.update(pretokenize(line, mode))
    expected = _reference_bpe(freqs, 40, mode)
    tok = train_bpe(list(freqs.items()), num_merges=40, pretokenizer=mode)
    assert tok.merges == expected


@pytest.mark.parametrize("mode", ["gpt2", "whitespace"])
def test_encode_decode_roundtrip(mode):
    freqs = Counter()
    for line in CORPUS:
        freqs.update(pretokenize(line, mode))
    tok = train_bpe(list(freqs.items()), num_merges=30, pretokenizer=mode)
    for line in CORPUS:
        pieces = tok.encode(line)
        if mode == "gpt2":
            assert tok.decode(pieces) == line
        else:
            assert tok.decode(pieces) == " ".join(line.split())
        ids = tok.encode_ids(line)
        assert all(i >= 0 for i in ids)  # training corpus fully in-vocab
        assert tok.decode_ids(ids) == tok.decode(pieces)


def test_merges_actually_compress():
    freqs = Counter()
    for line in CORPUS:
        freqs.update(pretokenize(line, "gpt2"))
    tok0 = BpeTokenizer([], alphabet=sorted({c for w in freqs for c in w}))
    tok = train_bpe(list(freqs.items()), num_merges=50)
    n_chars = sum(len(tok0.encode(line)) for line in CORPUS)
    n_bpe = sum(len(tok.encode(line)) for line in CORPUS)
    assert n_bpe < n_chars / 2  # repeated subwords collapse


def test_unknown_chars_get_minus_one():
    tok = train_bpe([("abc", 5), ("abd", 3)], num_merges=5,
                    pretokenizer="whitespace")
    ids = tok.encode_ids("abz")
    assert -1 in ids  # 'z' unseen → sentinel, not a crash


def test_serialization_roundtrip():
    tok = train_bpe([("hello", 5), ("help", 3)], num_merges=10,
                    pretokenizer="whitespace")
    clone = BpeTokenizer.from_dict(tok.to_dict())
    assert clone.merges == tok.merges
    assert clone.vocab == tok.vocab
    assert clone.encode("hello help") == tok.encode("hello help")


@pytest.mark.parametrize("mode", ["gpt2", "whitespace"])
def test_word_counts_match_local(spark, mode):
    df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    got = {
        r["word"]: r["count"]
        for r in word_counts(df, "text", pretokenizer=mode).collect()
    }
    want = Counter()
    for line in CORPUS:
        want.update(pretokenize(line, mode))
    assert got == dict(want)


def test_distributed_tokenize_matches_driver(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )
    tok = train_bpe(word_counts(df, "text"), num_merges=40)
    out = tokenize_with_bpe(df, "text", tok).orderBy("doc_id").collect()
    for row in out:
        assert row["token_ids"] == tok.encode_ids(row["text"])
        assert row["n_tokens"] == len(row["token_ids"])
    cnt = bpe_token_count(df, "text", tok).orderBy("doc_id").collect()
    for row in cnt:
        assert row["n_tokens"] == len(tok.encode(row["text"]))


def test_end_to_end_on_documents(spark, documents):
    docs = documents.select("doc_id", "text").limit(200)
    tok = train_bpe(word_counts(docs, "text"), num_merges=200, min_count=2)
    assert len(tok.merges) > 50
    out = bpe_token_count(docs, "text", tok)
    stats = out.agg(
        F.sum("n_tokens").alias("total"), F.min("n_tokens").alias("mn")
    ).first()
    assert stats["total"] > 0 and stats["mn"] >= 0
    # BPE tokens ≥ whitespace words (merges never cross pre-token bounds)
    ws = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("w")
    ).first()["w"]
    assert stats["total"] >= ws


def test_training_is_deterministic(spark, documents):
    docs = documents.select("text").limit(100)
    t1 = train_bpe(word_counts(docs, "text"), num_merges=100, min_count=2)
    t2 = train_bpe(
        word_counts(docs, "text").repartition(7), num_merges=100, min_count=2
    )
    assert t1.merges == t2.merges
    assert t1.vocab == t2.vocab


def test_py_whitespace_matches_isspace_exactly():
    from ondine_spark.operators.tokenizer import PY_WHITESPACE

    scan = "".join(chr(i) for i in range(0x110000) if chr(i).isspace())
    assert PY_WHITESPACE == scan


def test_word_counts_unicode_whitespace(spark):
    # NBSP / NEL / FS are str.split() separators but NOT Java \s — the
    # JVM counting path must agree with Python pretokenize on them
    texts = [
        "foo\xa0bar foo",          # NBSP
        "baz\x85qux",              # NEL
        "a\x1cb c",           # FS control char
        "plain ascii words",
        "ideographic　space",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = {
        r["word"]: r["count"]
        for r in word_counts(df, "text", pretokenizer="whitespace").collect()
    }
    want = Counter()
    for t in texts:
        want.update(pretokenize(t, "whitespace"))
    assert got == dict(want)


def test_roundtrip_when_merge_produces_alphabet_symbol():
    # '</w>' is an alphabet symbol in whitespace mode AND producible from
    # merges over '<','/','w','>' — set-difference serialization dropped
    # it and shifted every vocab id after a save/load round-trip
    merges = [("<", "/"), ("</", "w"), ("</w", ">")]
    alphabet = ["<", "/", "w", ">", END_OF_WORD]
    tok = BpeTokenizer(merges, pretokenizer="whitespace", alphabet=alphabet)
    assert "</w>" in tok.vocab  # the collision actually occurs
    clone = BpeTokenizer.from_dict(tok.to_dict())
    assert clone.vocab == tok.vocab
    assert clone.encode_ids("</w") == tok.encode_ids("</w")
