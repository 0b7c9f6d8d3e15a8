"""Embedders (R7) — pluggable text → vector encoders.

Reference surface (ondine/knowledge/embedders.py:25-121): a local
sentence-transformers embedder and API embedders behind one protocol, with
the unit-test suite forcing a deterministic fake
(tests/unit/conftest.py:17-47). Here the *deterministic* embedder is the
first-class citizen: hashed char-ngram term frequencies, L2-normalized —
stable across runs/machines, zero model downloads, and the bucket hashing
(md5) is reproducible in ANSI SQL so retrieval built on it stays
oracle-checkable. Real model embedders plug in behind the same protocol via
import-guard (not available in this environment).

Two forms:
- ``ngram_buckets`` — JVM-side bucket multiset as map<int,int> (used by the
  knowledge store's dense scoring; no Python anywhere).
- ``DeterministicEmbedder`` / ``embed_column`` — array<float> dense vectors
  via an Arrow-batched pandas UDF (for operators that genuinely need a
  dense column, e.g. embedding_neardup_pairs or ANN over
  ``embeddings.parquet``-style data).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ondine_spark.functions.similarity import char_ngrams, md5_long


def ngram_buckets(col: Column, n: int = 3, dim: int = 512) -> Column:
    """array<bigint> of md5-hashed char-ngram buckets (with multiplicity).

    The JVM 'embedding' primitive: explode it and groupBy (id, bucket) to
    get sparse term-frequency vectors as a FRAME — an inverted index, the
    shape that scales (cosine between texts = a join on bucket, never a
    crossJoin over dense vectors)."""
    from ondine_spark.functions.similarity import let_bind

    def build(s: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.length(s) - n + 1, F.lit(0)))
        all_grams = F.transform(idx, lambda i: F.substring(s, i, F.lit(n)))
        return F.transform(
            F.filter(all_grams, lambda g: F.length(g) == n),
            lambda g: md5_long(g) % dim,
        )

    return let_bind(F.lower(col), build)


class DeterministicEmbedder:
    """Hash-based dense embedder: md5(char-3gram) → bucket, tf counts,
    L2-normalized. Same text → same vector, any machine, no model."""

    def __init__(self, dim: int = 64, n: int = 3):
        self.dim = dim
        self.n = n

    def embed(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            s = (t or "").lower()
            for j in range(max(0, len(s) - self.n + 1)):
                g = s[j : j + self.n]
                h = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
                out[i, h % self.dim] += 1.0
            nrm = float(np.linalg.norm(out[i]))
            if nrm > 0:
                out[i] /= nrm
        return out

    def embed_one(self, text: str) -> list[float]:
        return self.embed([text])[0].tolist()


def sentence_transformer_embedder(model_name: str):
    """Real-model embedder behind an import guard (U5 protocol)."""
    try:
        from sentence_transformers import SentenceTransformer  # noqa
    except ImportError as e:  # pragma: no cover - not installed here
        raise ImportError(
            "sentence-transformers is not installed; use "
            "DeterministicEmbedder or install the model package"
        ) from e
    model = SentenceTransformer(model_name)

    class _STEmbedder:
        dim = model.get_sentence_embedding_dimension()

        def embed(self, texts):
            return model.encode(texts, normalize_embeddings=True)

    return _STEmbedder()


def embed_column(
    df, text_col: str, out_col: str = "embedding", dim: int = 64, n: int = 3
):
    """Append an array<float> embedding column (Arrow-batched pandas UDF —
    one embedder per worker, vectorized over the batch)."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        emb = DeterministicEmbedder(dim=dim, n=n)
        for s in it:
            vecs = emb.embed(s.fillna("").tolist())
            yield pd.Series(list(vecs))

    return df.withColumn(out_col, _embed(F.col(text_col)))
