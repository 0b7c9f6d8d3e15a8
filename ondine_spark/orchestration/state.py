"""Checkpoint state memento (O8).

Reference (ondine/adapters/checkpoint_storage.py, orchestration/
state_manager.py, execution_context.py:266-316): a gzip-JSON memento of
the run's counters saved every checkpoint interval, deleted on success.

Spark-first: the durable RESPONSE cache is the resume source of truth
(sources/cache.py); the memento carries only driver-side counters (chunks
committed, rows, cumulative cost) so an operator inspecting a crashed run
sees progress without scanning the cache."""

from __future__ import annotations

import gzip
import json
import os
import time
from dataclasses import asdict, dataclass, field


@dataclass
class RunMemento:
    session_id: str
    chunks_committed: int = 0
    rows_processed: int = 0
    cumulative_cost: str = "0"
    updated_at: float = field(default_factory=time.time)


class StateManager:
    def __init__(self, checkpoint_dir: str, session_id: str):
        self.dir = checkpoint_dir
        self.session_id = session_id
        os.makedirs(checkpoint_dir, exist_ok=True)

    @property
    def path(self) -> str:
        # the memento filename embeds the session id; percent-encode path
        # separators (and '%' so the encoding round-trips) — a session id
        # like "run 6/alpha" must not create directories
        safe = self.session_id.replace("%", "%25").replace("/", "%2F")
        return os.path.join(self.dir, f"{safe}.state.json.gz")

    def save(self, memento: RunMemento) -> None:
        memento.updated_at = time.time()
        # per-writer tmp name: multiple PROCESSES save the same session's
        # memento concurrently (multiprocess chunk workers share one
        # checkpoint dir), and a shared "<path>.tmp" races — writer A's
        # os.replace moves the file away while writer B is between write
        # and replace, so B's replace dies FileNotFoundError (seen live
        # in the 3-worker shared-budget test, round 8). Unique tmp +
        # atomic replace = last-writer-wins, no cross-writer interference.
        tmp = f"{self.path}.{os.getpid()}.{time.monotonic_ns()}.tmp"
        with gzip.open(tmp, "wt") as f:
            json.dump(asdict(memento), f)
        os.replace(tmp, self.path)  # atomic on POSIX

    @property
    def _legacy_path(self) -> str:
        # Pre-escaping filename: session ids containing '%' (but no '/',
        # which never produced a loadable file) wrote here. Kept as a
        # read-only fallback so pre-upgrade runs keep their counters.
        return os.path.join(self.dir, f"{self.session_id}.state.json.gz")

    def load(self) -> RunMemento | None:
        path = self.path
        if not os.path.exists(path):
            legacy = self._legacy_path
            if legacy == path or not os.path.exists(legacy):
                return None
            path = legacy
        with gzip.open(path, "rt") as f:
            return RunMemento(**json.load(f))

    def cleanup(self) -> None:
        for p in (self.path, self._legacy_path):
            if os.path.exists(p):
                os.remove(p)
