"""RunRegistry (O11): driver-side durable job index.

Reference (ondine/orchestration/run_registry.py): a SQLite WAL table of
runs with the state machine PENDING → RUNNING → SUCCEEDED/FAILED/PARTIAL,
co-located with checkpoints, used by the CLI (status/resume) and the
provider-batch submit/collect handoff.

The registry is driver-side metadata, not data-plane — SQLite via the
stdlib is the right tool on Spark too (one row per run; the 100 TB data
never touches it).
"""

from __future__ import annotations

import json
import os
import sqlite3
import time
from dataclasses import dataclass
from enum import Enum


class RunState(str, Enum):
    PENDING = "PENDING"
    RUNNING = "RUNNING"
    SUCCEEDED = "SUCCEEDED"
    FAILED = "FAILED"
    PARTIAL = "PARTIAL"


_ALLOWED = {
    RunState.PENDING: {RunState.RUNNING, RunState.FAILED},
    RunState.RUNNING: {RunState.SUCCEEDED, RunState.FAILED, RunState.PARTIAL},
    RunState.PARTIAL: {RunState.RUNNING, RunState.FAILED, RunState.SUCCEEDED},
    RunState.SUCCEEDED: set(),
    RunState.FAILED: {RunState.RUNNING},  # resume re-enters RUNNING
}


@dataclass
class RunRecord:
    run_id: str
    state: RunState
    created_at: float
    updated_at: float
    session_id: str | None
    checkpoint_dir: str | None
    provider_job_id: str | None
    meta: dict


class RunRegistry:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self._conn = sqlite3.connect(path)
        self._conn.execute("PRAGMA journal_mode=WAL")
        self._conn.execute(
            """CREATE TABLE IF NOT EXISTS runs (
                 run_id TEXT PRIMARY KEY,
                 state TEXT NOT NULL,
                 created_at REAL NOT NULL,
                 updated_at REAL NOT NULL,
                 session_id TEXT,
                 checkpoint_dir TEXT,
                 provider_job_id TEXT,
                 meta TEXT NOT NULL DEFAULT '{}'
               )"""
        )
        self._conn.commit()

    def create(self, run_id: str, session_id: str | None = None,
               checkpoint_dir: str | None = None, **meta) -> RunRecord:
        now = time.time()
        self._conn.execute(
            "INSERT INTO runs (run_id, state, created_at, updated_at, "
            "session_id, checkpoint_dir, meta) VALUES (?,?,?,?,?,?,?)",
            (run_id, RunState.PENDING.value, now, now, session_id,
             checkpoint_dir, json.dumps(meta)),
        )
        self._conn.commit()
        return self.get(run_id)

    def transition(self, run_id: str, state: RunState | str, **meta_updates):
        state = RunState(state)
        rec = self.get(run_id)
        if state != rec.state and state not in _ALLOWED[rec.state]:
            raise ValueError(
                f"illegal transition {rec.state.value} → {state.value} "
                f"for run {run_id}"
            )
        # None values DELETE keys (e.g. clearing a stale error on resume)
        meta = {**rec.meta, **meta_updates}
        meta = {k: v for k, v in meta.items() if v is not None}
        self._conn.execute(
            "UPDATE runs SET state=?, updated_at=?, meta=? WHERE run_id=?",
            (state.value, time.time(), json.dumps(meta), run_id),
        )
        self._conn.commit()
        return self.get(run_id)

    def set_provider_job(self, run_id: str, provider_job_id: str):
        self._conn.execute(
            "UPDATE runs SET provider_job_id=?, updated_at=? WHERE run_id=?",
            (provider_job_id, time.time(), run_id),
        )
        self._conn.commit()

    def get(self, run_id: str) -> RunRecord:
        row = self._conn.execute(
            "SELECT run_id, state, created_at, updated_at, session_id, "
            "checkpoint_dir, provider_job_id, meta FROM runs WHERE run_id=?",
            (run_id,),
        ).fetchone()
        if row is None:
            raise KeyError(f"unknown run: {run_id}")
        return RunRecord(
            run_id=row[0], state=RunState(row[1]), created_at=row[2],
            updated_at=row[3], session_id=row[4], checkpoint_dir=row[5],
            provider_job_id=row[6], meta=json.loads(row[7]),
        )

    def list(self, state: RunState | str | None = None) -> list[RunRecord]:
        q = ("SELECT run_id FROM runs"
             + (" WHERE state=?" if state else "")
             + " ORDER BY created_at")
        rows = self._conn.execute(
            q, (RunState(state).value,) if state else ()
        ).fetchall()
        return [self.get(r[0]) for r in rows]

    def close(self):
        self._conn.close()
