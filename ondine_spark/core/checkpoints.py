"""localCheckpoint block hygiene.

``DataFrame.localCheckpoint`` caches the materialized RDD in the block
manager as a RAW RDD cache: ``DataFrame.unpersist()`` and
``spark.catalog.clearCache()`` both operate on the SQL CacheManager and
never free it, so iterative checkpointing (connected components, long
chunked runs) silently accumulates full-data copies for the lifetime of
the session — measured at sf1 as same-session runs degrading 2x while
the block manager filled with dead edge sets.

The only handle Spark exposes is the persistent-RDD registry. The
pattern: snapshot ids before creating a checkpoint, diff after, and
unpersist the recorded ids once the checkpointed frame is no longer
reachable (it is lineage-truncated — freeing a checkpoint that still
backs a live result makes that result unrecoverable)."""

from __future__ import annotations


def persistent_rdd_ids(sc) -> set:
    """Ids of all currently-persisted RDDs (includes localCheckpoints)."""
    return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}


def unpersist_rdd_ids(sc, ids: set, blocking: bool = False) -> None:
    """Unpersist the given registry ids (no-op for already-freed ids)."""
    reg = sc._jsc.getPersistentRDDs()
    for i in ids:
        rdd = reg.get(i)
        if rdd is not None:
            rdd.unpersist(blocking)
