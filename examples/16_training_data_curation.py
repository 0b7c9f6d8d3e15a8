"""Training-data curation: tokenizer, quality filtering, CCNet buckets.

Beyond the reference surface: the corpus-curation toolkit a pre-training
data pipeline needs — train a BPE tokenizer on the corpus, count real
tokens, score quality with a learned classifier, and split by LM
perplexity (CCNet head/middle/tail), all over DataFrames.
"""

import random

from _session import session

from pyspark.sql import functions as F

from ondine_spark.operators.curation import perplexity_buckets
from ondine_spark.operators.quality_classifier import (
    score_quality,
    train_quality_classifier,
)
from ondine_spark.operators.text_analysis import unigram_perplexity
from ondine_spark.operators.tokenizer import (
    bpe_token_count,
    train_bpe,
    word_counts,
)

spark = session()

corpus = spark.createDataFrame(
    [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "she sells sea shells by the sea shore"),
        (3, "the lazy dog sleeps while the quick fox runs"),
        (4, "qx zj wk vv 93 @@ ## $$ zz qq xx jj"),
        (5, "sea shells and sea shores and quick brown foxes"),
        (6, "%% ^^ && ** (( )) qxz jvk wqx 001 002"),
    ],
    "doc_id int, text string",
)

print("=== 1. Train a BPE tokenizer on the corpus, count real tokens ===")
tok = train_bpe(word_counts(corpus, "text"), num_merges=100)
print(f"learned {len(tok.merges)} merges, vocab size {len(tok.vocab)}")
counted = bpe_token_count(corpus, "text", tok)
counted.select("doc_id", "n_tokens").show()

print("=== 2. Learned quality classifier (fastText-style) ===")
rng = random.Random(0)
labeled = corpus.withColumn(
    "label", (F.col("doc_id").isin(4, 6) == False).cast("int")  # noqa: E712
)
model = train_quality_classifier(
    labeled, "text", "label", use_bigrams=False, max_iter=20
)
score_quality(corpus, model, "text").select(
    "doc_id", F.round("quality_prob", 3).alias("quality_prob")
).show()

print("=== 3. CCNet perplexity buckets (head / middle / tail) ===")
ppl = unigram_perplexity(corpus, "doc_id", "text")
perplexity_buckets(ppl, "perplexity").select(
    "doc_id", F.round("perplexity", 1).alias("ppl"), "ppl_bucket"
).orderBy("doc_id").show()

spark.stop()
