"""Train once, reuse everywhere: persisting trained pipeline artifacts.

A production corpus pipeline trains its small model-like artifacts —
the BPE merge table, PQ codebooks, IVF coarse centroids — ONCE on a
bounded sample, persists them, and reuses them for every later run
(nightly increments, the streaming variant, another cluster). This
example trains, saves, reloads, and shows the reloaded artifacts
reproduce the originals exactly. Paths are local here; on a cluster
the same calls write through the Hadoop FS API (hdfs://, s3a://).
"""

import tempfile

from _session import session

from pyspark.sql import functions as F

from ondine_spark.operators.artifacts import (
    load_artifact,
    load_bpe_tokenizer,
    save_artifact,
    save_bpe_tokenizer,
)
from ondine_spark.operators.tokenizer import (
    tokenize_with_bpe,
    train_bpe,
    word_counts,
)

spark = session()
workdir = tempfile.mkdtemp(prefix="ondine_artifacts_")

corpus = spark.createDataFrame(
    [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "she sells sea shells by the sea shore"),
        (3, "the lazy dog sleeps while the quick fox runs"),
        (4, "sea shells and sea shores and quick brown foxes"),
    ],
    "doc_id int, text string",
)

print("=== 1. Train and persist a BPE tokenizer ===")
tok = train_bpe(word_counts(corpus, "text"), num_merges=60)
save_bpe_tokenizer(tok, f"{workdir}/bpe.json", spark=spark)
print(f"saved {len(tok.merges)} merges to {workdir}/bpe.json")

print("=== 2. Reload (as a later run would) and tokenize ===")
tok2 = load_bpe_tokenizer(f"{workdir}/bpe.json", spark=spark)
assert tok2.merges == tok.merges and tok2.vocab == tok.vocab
tokenize_with_bpe(corpus, "text", tok2).select(
    "doc_id", "n_tokens", F.slice("token_ids", 1, 6).alias("first_ids")
).show()

print("=== 3. Generic artifacts: PQ codebooks / IVF centroids ===")
emb = corpus.select(
    "doc_id",
    F.array(*[
        (F.crc32(F.concat_ws(":", F.lit(d), "text")) % 1000 / 500.0 - 1.0)
        for d in range(8)
    ]).alias("embedding"),
)
from ondine_spark.operators.product_quantization import train_pq_codebooks

books = train_pq_codebooks(emb, "embedding", m=4, nbits=2, max_train_rows=10)
save_artifact(f"{workdir}/books.json", "pq_codebooks", books, spark=spark)
books2 = load_artifact(f"{workdir}/books.json", expect="pq_codebooks", spark=spark)
assert books2 == books
print(f"codebooks round-trip exact: {len(books2)} sub-quantizers")

spark.stop()
