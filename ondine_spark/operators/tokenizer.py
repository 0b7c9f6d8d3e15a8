"""Distributed BPE tokenizer: corpus-scale training and tokenization.

A training-data pipeline needs real token counts (token budgets, packing,
cost estimates) and a trainable vocabulary, not just the whitespace /
regex estimators in text_analysis.py. This implements classic byte-pair
encoding (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
with Subword Units") the way production trainers structure it:

1. ``word_counts`` — ONE distributed pass: pre-tokenize, then reduce to
   the (word, count) TYPE table. The shuffle carries word *types* (bounded
   by vocabulary growth, Heaps' law), not the corpus tokens; partials are
   combined per partition before the shuffle.
2. ``train_bpe`` — merge learning over the collected type table on the
   driver. This is the standard practice (HF ``tokenizers`` trains from
   exactly this table): a 100 TB corpus has a few 10⁷ distinct words above
   any sane ``min_count``, which fits driver memory by orders of
   magnitude, while pair-count maintenance is incremental — training cost
   is O(types + merges·affected-words), independent of corpus size.
3. ``tokenize_with_bpe`` / ``bpe_token_count`` — the learned merge ranks
   ship to executors inside an Arrow-batched pandas UDF with a per-worker
   word cache (Zipf: the overwhelming majority of word occurrences are
   cache hits). Embarrassingly parallel, zero shuffle.

Pre-tokenization parity: the SAME Python ``pretokenize`` function drives
both counting and encoding (mode "gpt2"), so train and apply can never
disagree. Mode "whitespace" additionally has a pure-JVM counting path
(split + explode + groupBy) for maximum counting throughput; its
semantics (str.split on runs of whitespace) are replicated exactly.

Reference parity note: the reference estimates tokens heuristically
(ondine/utils/token_estimator.py — chars/4 with model tables); this module
goes beyond it with a real trainable tokenizer, per the brief's
training-data-pipeline mandate.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from typing import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# GPT-2-style pre-tokenizer, expressed with Python-re-portable classes:
# [^\W\d_] == unicode letters, \d == decimal digits. Contractions first,
# then space-prefixed letter runs / digit runs / punctuation runs, then
# trailing-safe whitespace. Spaces travel WITH the following token (the
# " the" convention), so decode is plain concatenation.
_GPT2_PAT = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+"
)

END_OF_WORD = "</w>"

# The EXACT character set Python str.split() (str.isspace()) splits on,
# as an explicit Java-regex character class. Java's \s is ASCII-only and
# even (?U)\s (White_Space property) differs from Python (\x1c-\x1f are
# isspace() but not White_Space), so the set is enumerated literally.
# tests/test_tokenizer.py asserts this matches a full-codepoint scan.
PY_WHITESPACE = "".join(
    chr(c)
    for c in (
        0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20,
        0x85, 0xA0, 0x1680,
        0x2000, 0x2001, 0x2002, 0x2003, 0x2004, 0x2005, 0x2006, 0x2007,
        0x2008, 0x2009, 0x200A, 0x2028, 0x2029, 0x202F, 0x205F, 0x3000,
    )
)
_JVM_WS_SPLIT = "[" + PY_WHITESPACE + "]+"


def pretokenize(text: str, mode: str = "gpt2") -> list[str]:
    """Split text into pre-tokens (the units BPE merges within)."""
    if text is None:
        return []
    if mode == "whitespace":
        return text.split()
    if mode == "gpt2":
        return _GPT2_PAT.findall(text)
    raise ValueError(f"unknown pretokenizer mode: {mode}")


# ------------------------------------------------------------- word counts

def word_counts(
    df: DataFrame, text_col: str, pretokenizer: str = "gpt2"
) -> DataFrame:
    """The (word, count) type table — the only distributed pass BPE
    training needs. Output: ``word`` (string), ``count`` (long).

    "whitespace" counts fully JVM-side (split → explode → map-side
    combined groupBy). "gpt2" pre-tokenizes in Python (the same
    ``pretokenize`` the encoder uses) but still emits per-partition
    PARTIAL counts from the Arrow worker, so the shuffle carries one row
    per (partition, word-type), never per token.
    """
    if pretokenizer == "whitespace":
        # _JVM_WS_SPLIT enumerates Python's isspace() set so the JVM split
        # agrees with str.split() on unicode whitespace (NBSP, \x85, ...).
        return (
            df.select(
                F.explode(F.split(F.col(text_col), _JVM_WS_SPLIT)).alias("word")
            )
            .filter(F.col("word") != "")
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("count"))
        )

    out_schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("count", T.LongType()),
        ]
    )

    def count_partition(batches: Iterator) -> Iterator:
        import pandas as pd

        acc: Counter = Counter()
        for pdf in batches:
            for text in pdf[text_col]:
                if text:
                    acc.update(pretokenize(text, "gpt2"))
        if acc:
            yield pd.DataFrame(
                {"word": list(acc.keys()), "count": list(acc.values())}
            )

    return (
        df.select(text_col)
        .mapInPandas(count_partition, schema=out_schema)
        .groupBy("word")
        .agg(F.sum("count").alias("count"))
    )


# ------------------------------------------------------------ BPE training

def _word_symbols(word: str, mode: str) -> tuple[str, ...]:
    """A word as its initial symbol sequence. Whitespace mode appends the
    classic end-of-word marker so decode can restore word boundaries; gpt2
    mode keeps spaces inside tokens, so no marker is needed."""
    if mode == "whitespace":
        return tuple(word) + (END_OF_WORD,)
    return tuple(word)


def train_bpe(
    counts: DataFrame | Iterable[tuple[str, int]],
    num_merges: int = 1000,
    min_count: int = 1,
    min_pair_count: int = 2,
    pretokenizer: str = "gpt2",
    max_types: int = 50_000_000,
) -> "BpeTokenizer":
    """Learn BPE merges from a (word, count) table.

    Incremental pair-count maintenance (pair → weighted count plus a
    pair → affected-word index): each merge touches only the words that
    contain the pair, so training cost does not rescan the table per
    merge. Ties break deterministically: highest count, then
    lexicographically smallest pair — same data in, same merges out, on
    any machine.

    ``min_count`` floors the type table before training (rare types are
    noise and the driver-memory knob); ``max_types`` is a hard guard that
    raises rather than silently degrading if the collect would be huge.
    """
    if isinstance(counts, DataFrame):
        counts = counts.filter(F.col("count") >= min_count)
        n = counts.count()
        if n > max_types:
            raise ValueError(
                f"{n} word types exceed max_types={max_types}; raise "
                "min_count (the type table must fit on the driver)"
            )
        rows = [(r["word"], r["count"]) for r in counts.toLocalIterator()]
    else:
        rows = [(w, c) for w, c in counts if c >= min_count]
    # deterministic processing order regardless of partitioning
    rows.sort()

    words: list[list[str]] = []
    freqs: list[int] = []
    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for word, cnt in rows:
        syms = list(_word_symbols(word, pretokenizer))
        idx = len(words)
        words.append(syms)
        freqs.append(cnt)
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += cnt
            pair_words[(a, b)].add(idx)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # max count, lexicographically-smallest pair on ties
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < min_pair_count:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for wi in list(pair_words[best]):
            syms = words[wi]
            cnt = freqs[wi]
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            # retract the old adjacencies, add the new ones
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= cnt
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                    pair_words.pop(p, None)
                else:
                    s = pair_words.get(p)
                    if s is not None:
                        s.discard(wi)
            for p in zip(out, out[1:]):
                pair_counts[p] += cnt
                pair_words[p].add(wi)
            words[wi] = out
    alphabet = sorted(
        {c for w, _ in rows for c in _word_symbols(w, pretokenizer)}
    )
    return BpeTokenizer(merges, pretokenizer=pretokenizer, alphabet=alphabet)


class BpeTokenizer:
    """Greedy lowest-rank BPE encoder over learned merges.

    ``vocab`` maps piece → id: base alphabet first (sorted), then each
    merge's joined string in merge order (first occurrence wins when two
    merge paths produce the same string). Unknown characters at encode
    time become their own pieces with id -1 (callers may remap)."""

    def __init__(
        self,
        merges: list[tuple[str, str]],
        pretokenizer: str = "gpt2",
        alphabet: list[str] | None = None,
    ):
        self.merges = list(merges)
        self.pretokenizer = pretokenizer
        # kept verbatim for to_dict: deriving it back from vocab by
        # set-difference drops alphabet symbols that a merge can also
        # produce (e.g. '</w>' from '<','/','w','>'), shifting vocab ids
        # across a save/load round-trip.
        self.alphabet = list(alphabet or [])
        self.ranks = {pair: i for i, pair in enumerate(self.merges)}
        vocab: dict[str, int] = {}
        for sym in alphabet or []:
            vocab.setdefault(sym, len(vocab))
        for a, b in self.merges:
            vocab.setdefault(a + b, len(vocab))
        self.vocab = vocab
        self._cache: dict[str, list[str]] = {}

    # -- encoding ----------------------------------------------------------
    def encode_word(self, word: str) -> list[str]:
        hit = self._cache.get(word)
        if hit is not None:
            return hit
        syms = list(_word_symbols(word, self.pretokenizer))
        while len(syms) > 1:
            ranked = [
                (self.ranks.get(p, 1 << 60), i)
                for i, p in enumerate(zip(syms, syms[1:]))
            ]
            rank, i = min(ranked)
            if rank >= 1 << 60:
                break
            syms[i : i + 2] = [syms[i] + syms[i + 1]]
        if len(self._cache) < 200_000:  # per-worker LRU-ish bound
            self._cache[word] = syms
        return syms

    def encode(self, text: str) -> list[str]:
        out: list[str] = []
        for w in pretokenize(text, self.pretokenizer):
            out.extend(self.encode_word(w))
        return out

    def encode_ids(self, text: str) -> list[int]:
        return [self.vocab.get(p, -1) for p in self.encode(text)]

    def decode(self, pieces: list[str]) -> str:
        if self.pretokenizer == "whitespace":
            text = "".join(pieces)
            return text.replace(END_OF_WORD, " ").rstrip(" ")
        return "".join(pieces)

    def decode_ids(self, ids: list[int]) -> str:
        rev = {i: p for p, i in self.vocab.items()}
        return self.decode([rev.get(i, "") for i in ids])

    # -- (de)serialization for broadcast / persistence ---------------------
    def to_dict(self) -> dict:
        return {
            "merges": [list(m) for m in self.merges],
            "pretokenizer": self.pretokenizer,
            "alphabet": list(self.alphabet),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "BpeTokenizer":
        return cls(
            [tuple(m) for m in d["merges"]],
            pretokenizer=d.get("pretokenizer", "gpt2"),
            alphabet=d.get("alphabet"),
        )


# -------------------------------------------------------- distributed apply

def tokenize_with_bpe(
    df: DataFrame,
    text_col: str,
    tokenizer: BpeTokenizer,
    out_col: str = "token_ids",
    count_col: str | None = "n_tokens",
) -> DataFrame:
    """Append BPE token ids (array<int>) and optionally a token count.
    The tokenizer state (merges + vocab) serializes once into the UDF
    closure and is reconstructed once per Python worker; the per-worker
    word cache then makes encoding cost ~O(unique words per partition)."""
    state = tokenizer.to_dict()

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _enc(s):
        import pandas as pd

        tok = BpeTokenizer.from_dict(state)
        return pd.Series([tok.encode_ids(t) if t else [] for t in s])

    out = df.withColumn(out_col, _enc(F.col(text_col)))
    if count_col:
        out = out.withColumn(count_col, F.size(out_col))
    return out


def bpe_token_count(
    df: DataFrame, text_col: str, tokenizer: BpeTokenizer,
    count_col: str = "n_tokens",
) -> DataFrame:
    """Token counts only (no id arrays in the output — cheaper plan when
    the count is all a budget/packing stage needs)."""
    state = tokenizer.to_dict()

    @F.pandas_udf(T.IntegerType())
    def _cnt(s):
        import pandas as pd

        tok = BpeTokenizer.from_dict(state)
        return pd.Series(
            [len(tok.encode(t)) if t else 0 for t in s], dtype="int32"
        )

    return df.withColumn(count_col, _cnt(F.col(text_col)))
