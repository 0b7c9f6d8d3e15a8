"""Training-data curation: the dedup toolkit (beyond the reference —
the operators a 100 TB data pipeline needs).

Exact, MinHash-LSH, SimHash and embedding near-dup all emit (a, b) pair
frames; connected components resolves pairs to clusters; a keep policy
picks one representative per cluster. Every operator is oracle-checked
against DuckDB in the test gates.
"""

from _session import session

from ondine_spark.operators.dedup import (
    connected_components,
    dedup_keep_representative,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

spark = session()
docs = spark.createDataFrame(
    [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),  # near-dup of 1
        (3, "spark executes dataframe plans through catalyst"),
        (4, "spark executes dataframe plans through catalyst quickly"),  # near-dup of 3
        (5, "an entirely different document about cooking pasta"),
    ],
    "doc_id long, text string",
)

pairs = minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=8, bands=4,
                          threshold=0.25)
print("LSH near-dup pairs (est_jaccard = signature agreement):")
pairs.show()

clusters = connected_components(pairs)
print("pair graph resolved to clusters:")
clusters.show()

kept = dedup_keep_representative(docs, "doc_id", pairs)
print(f"after dedup (min-id representative): {sorted(r.doc_id for r in kept.collect())}")

print("exact-jaccard pairs (verified, threshold 0.5):")
ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).show()

print("simhash pairs (hamming <= 3):")
simhash_pairs(docs, "doc_id", "text").show()
