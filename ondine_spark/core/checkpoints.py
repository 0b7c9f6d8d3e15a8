"""localCheckpoint block hygiene.

``DataFrame.localCheckpoint`` caches the materialized RDD in the block
manager as a RAW RDD cache: ``DataFrame.unpersist()`` and
``spark.catalog.clearCache()`` both operate on the SQL CacheManager and
never free it, so iterative checkpointing (connected components, long
chunked runs) silently accumulates full-data copies for the lifetime of
the session — measured at sf1 as same-session runs degrading 2x while
the block manager filled with dead edge sets.

Use ``checkpoint_df``: it reads the backing RDD id directly off the
returned frame's LogicalRDD. The earlier pattern (snapshot registry ids,
checkpoint, diff) is RACY on a shared session — a checkpoint created by
a concurrent thread inside the snapshot window lands in the diff and
gets unpersisted, and since localCheckpoint truncates lineage the other
computation's frame becomes unrecoverable (block-not-found). Unpersist
the recorded id only once the checkpointed frame is no longer reachable
(freeing a checkpoint that still backs a live result breaks it)."""

from __future__ import annotations

import warnings


def checkpoint_df(df, eager: bool = True):
    """``df.localCheckpoint(eager)`` → ``(checkpointed_frame, rdd_ids)``.

    ``rdd_ids`` is the block-manager entry backing the checkpoint,
    resolved from the returned frame's own LogicalRDD — concurrency-safe
    by construction (no global-registry diff window). If a future Spark
    stops exposing the plan's RDD, the id set comes back empty (that one
    checkpoint leaks for the session, with a warning) rather than risking
    a cross-thread unpersist of someone else's live checkpoint."""
    cdf = df.localCheckpoint(eager=eager)
    try:
        rid = int(cdf._jdf.queryExecution().analyzed().rdd().id())
        return cdf, {rid}
    except Exception:  # pragma: no cover - version-drift guard
        warnings.warn(
            "could not resolve the localCheckpoint RDD id from the plan; "
            "this checkpoint's blocks will not be freed",
            RuntimeWarning,
        )
        return cdf, set()


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
