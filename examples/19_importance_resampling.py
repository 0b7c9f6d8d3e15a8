"""DSIR importance resampling: select raw-corpus docs that look like a
target domain (Xie et al., NeurIPS 2023).

Beyond the reference surface: fit hashed-ngram bag models of a small
curated target sample and of the raw corpus (one distributed pass
each), weight every raw document by the quantized log-likelihood ratio
(an exact-integer, zero-shuffle JVM projection), then draw a fixed-size
sample without replacement via the Gumbel top-k trick — deterministic
for a given seed under any partitioning.
"""

from _session import session

from ondine_spark.operators.importance import (
    dsir_llr_table,
    dsir_resample,
    dsir_weights,
)

spark = session()

# the raw crawl: mostly chatter, some math-flavoured prose
raw = spark.createDataFrame(
    [
        (1, "click here for the best deals on shoes and free shipping"),
        (2, "the weather tomorrow will be sunny with a light breeze"),
        (3, "we prove the bound by induction on the lattice structure"),
        (4, "her favourite recipe needs butter sugar and three eggs"),
        (5, "the theorem follows from the lemma and the triangle inequality"),
        (6, "the football match ended in a draw after extra time"),
        (7, "by symmetry the integral vanishes and the corollary follows"),
        (8, "subscribe to our newsletter for weekly updates and offers"),
    ],
    "doc_id int, text string",
)

# the target domain: a small curated math sample
target = spark.createDataFrame(
    [
        (101, "we prove the theorem by a counting argument"),
        (102, "the proof of the lemma uses the triangle inequality"),
        (103, "by induction the bound follows for every lattice"),
    ],
    "doc_id int, text string",
)

print("=== 1. Fit both hashed-ngram models, one pass each ===")
llr = dsir_llr_table(raw, target, "text", num_features=4096)
print(f"LLR table: {len(llr)} buckets, {sum(1 for v in llr if v)} non-trivial")

print("=== 2. Weight every raw doc (exact-integer, zero-shuffle) ===")
weighted = dsir_weights(raw, llr, "text", num_features=4096)
weighted.orderBy("doc_id").show(truncate=46)

print("=== 3. Resample 3 docs ∝ exp(weight), Gumbel top-k ===")
picked = dsir_resample(weighted, "doc_id", "dsir_w_q", 3,
                       temperature=0.1, seed=7)
picked.select("doc_id", "text").orderBy("doc_id").show(truncate=56)

spark.stop()
