"""Training-shard export: deterministic global shuffle + balanced shards.

Beyond the reference surface: the last step of a training-data pipeline
is laying the curated corpus out for the trainer — N balanced shards,
each in a pseudorandom but REPRODUCIBLE order, so data loading can
resume mid-epoch and a re-export after a crash is byte-identical.
``shard_for_training`` derives shard and in-shard position purely from
(id, seed); ``write_training_shards`` writes one sorted file per
``shard=K/`` directory so the trainer streams without sorting.
"""

import tempfile

from _session import session

from ondine_spark.operators.curation import (
    shard_for_training,
    write_training_shards,
)

spark = session()

docs = spark.createDataFrame(
    [(i, f"document number {i} body text") for i in range(24)],
    "doc_id int, text string",
)

assigned = shard_for_training(docs, n_shards=4, id_col="doc_id", seed="epoch0")
print("assignment (shard, pos) is a pure function of (doc_id, seed):")
assigned.orderBy("shard", "pos").show(12, truncate=False)

# the same call under ANY partitioning yields the identical layout
again = shard_for_training(docs.repartition(7), 4, "doc_id", seed="epoch0")
assert sorted(map(tuple, assigned.collect())) == sorted(map(tuple, again.collect()))
print("re-derived under repartition(7): identical — export is restart-stable")

# a new seed = a new epoch permutation
epoch1 = shard_for_training(docs, 4, "doc_id", seed="epoch1")
moved = (
    assigned.select("doc_id", "shard")
    .join(epoch1.select("doc_id", epoch1.shard.alias("s1")), "doc_id")
    .where("shard != s1")
    .count()
)
print(f"seed 'epoch1' reshuffles {moved}/24 docs into different shards")

out = tempfile.mkdtemp(prefix="shards_")
write_training_shards(docs, out, n_shards=4, id_col="doc_id", seed="epoch0")
back = spark.read.parquet(out)
print(f"wrote {back.count()} rows under {out}/shard=K/ (one sorted file each)")

spark.stop()
