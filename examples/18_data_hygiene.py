"""Degenerate-input hygiene: quarantine the garbage before it costs you.

A real 100 TB corpus contains every pathological value class somewhere:
null text, NaN/Inf embeddings, epoch-0 and pre-Gregorian timestamps.
Each is worse than wrong — NaN cosines outrank every real match under
Spark's NaN ordering, a single non-finite row poisons k-means training,
and PySpark cannot even collect() a year-1 timestamp (one poisoned row
aborts a job at result time). The engine filters all of these at
ingestion; this example shows the explicit operators.
"""

import datetime

from _session import session

from pyspark.sql import functions as F

from ondine_spark.functions.similarity import finite_vector
from ondine_spark.operators.curation import filter_valid_timestamps
from ondine_spark.operators.similarity_search import (
    brute_force_topk,
    train_ivf_centroids,
)

spark = session()

NAN, INF = float("nan"), float("inf")

# --- embeddings: non-finite vectors never train, match, or rank --------
emb = spark.createDataFrame(
    [
        (0, [NAN, NAN]),          # broken encoder output
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [INF, 0.0]),          # overflowed feature
        (4, None),                # missing embedding
    ],
    "vec_id int, embedding array<double>",
)

clean = emb.filter(finite_vector(F.col("embedding")))
print("usable vectors:", sorted(r.vec_id for r in clean.collect()))

# every consumer applies the same predicate internally — garbage rows
# simply never appear in results:
queries = spark.createDataFrame(
    [(9, [1.0, 0.0])], "query_id int, query_vec array<double>"
)
top = brute_force_topk(emb, queries, k=5)
print("top-k over the dirty frame:",
      [(r.vec_id, round(r.cos_sim, 3)) for r in top.collect()])
centroids = train_ivf_centroids(emb, nlist=2)
print("trained centroids are finite:", centroids)

# --- timestamps: validity-window quarantine ----------------------------
events = spark.createDataFrame(
    [
        (0, datetime.datetime(1, 1, 1)),        # broken parser output
        (1, datetime.datetime(1970, 1, 1)),     # epoch default
        (2, datetime.datetime(2024, 6, 1, 12)), # sane
        (3, datetime.datetime(2400, 1, 1)),     # sentinel future
        (4, None),
    ],
    "event_id int, ts timestamp",
)
kept, quarantined = filter_valid_timestamps(events, "ts", quarantine=True)
print("kept events:", sorted(r.event_id for r in kept.collect()))
# the quarantined side is counted, not collected — a year-1 timestamp
# cannot round-trip into a Python datetime at all
print("quarantined:", quarantined.count())
