"""Property tests for Spark-free kernels: memento persistence under
adversarial session ids, Decimal cost parsing, and the token-estimate
heuristic's pure-python twin. Complements test_property_parsers.py
(parse/preprocess kernels); none of these open a SparkSession."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from ondine_spark.orchestration.state import RunMemento, StateManager

# session ids as users actually type them: printable, including the
# path-hostile characters the escaping exists for
session_ids = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\x00", exclude_categories=("Cs",)
    ),
    min_size=1,
    max_size=60,
).filter(lambda s: s.strip() and s not in (".", ".."))


@settings(max_examples=60, deadline=None)
@given(
    sid=session_ids,
    chunks=st.integers(min_value=0, max_value=10**9),
    rows=st.integers(min_value=0, max_value=10**12),
    cost=st.decimals(
        min_value=0, max_value=Decimal("1e6"), places=18, allow_nan=False
    ),
)
def test_memento_roundtrip_any_session_id(tmp_path_factory, sid, chunks,
                                          rows, cost):
    """save→load is identity on the payload for ANY session id, the
    file stays inside the checkpoint dir (no '/'-induced subdirs), and
    the Decimal cost string survives exactly."""
    import os

    d = str(tmp_path_factory.mktemp("st"))
    sm = StateManager(d, sid)
    sm.save(
        RunMemento(
            session_id=sid,
            chunks_committed=chunks,
            rows_processed=rows,
            cumulative_cost=str(cost),
        )
    )
    # the memento file must be DIRECTLY under the checkpoint dir
    assert os.path.dirname(sm.path) == d
    assert os.path.exists(sm.path)
    got = sm.load()
    assert got is not None
    assert got.session_id == sid
    assert got.chunks_committed == chunks
    assert got.rows_processed == rows
    assert Decimal(got.cumulative_cost) == cost
    sm.cleanup()
    assert sm.load() is None


@settings(max_examples=40, deadline=None)
@given(sid1=session_ids, sid2=session_ids)
def test_memento_no_session_collisions(tmp_path_factory, sid1, sid2):
    """Two distinct session ids never share a memento file (the percent
    escaping must be injective): writing one can't clobber the other."""
    if sid1 == sid2:
        return
    d = str(tmp_path_factory.mktemp("st"))
    a, b = StateManager(d, sid1), StateManager(d, sid2)
    assert a.path != b.path
    a.save(RunMemento(session_id=sid1, chunks_committed=1))
    b.save(RunMemento(session_id=sid2, chunks_committed=2))
    assert a.load().chunks_committed == 1
    assert b.load().chunks_committed == 2


@settings(max_examples=100, deadline=None)
@given(
    tin=st.integers(min_value=0, max_value=10**7),
    tout=st.integers(min_value=0, max_value=10**7),
    cin=st.decimals(min_value=0, max_value=1, places=10, allow_nan=False),
    cout=st.decimals(min_value=0, max_value=1, places=10, allow_nan=False),
)
def test_cost_decimal_exactness(tin, tout, cin, cout):
    """The per-call cost contract: Decimal arithmetic over the string
    form is exact — summing N identical calls equals N x one call with
    no float drift, for any token counts and per-1k rates."""
    one = (Decimal(tin) * cin + Decimal(tout) * cout) / Decimal(1000)
    total = sum((one for _ in range(7)), Decimal(0))
    assert total == one * 7
    # string roundtrip (the cache stores costs as strings)
    assert Decimal(str(one)) == one


def test_memento_concurrent_save_across_processes(tmp_path_factory):
    """Regression (round 8): concurrent same-session savers raced on a
    shared '<path>.tmp' — writer A's os.replace moved the file away
    between writer B's write and replace, killing B with
    FileNotFoundError (seen live in the 3-worker shared-budget test).
    Hammer save() from 4 processes; every process must survive and the
    final memento must be one of the writers' payloads."""
    import subprocess
    import sys

    d = str(tmp_path_factory.mktemp("st"))
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from ondine_spark.orchestration.state import RunMemento, StateManager\n"
        "sm = StateManager(%r, 'shared')\n"
        "w = int(sys.argv[1])\n"
        "for i in range(200):\n"
        "    sm.save(RunMemento(session_id='shared', chunks_committed=w * 1000 + i))\n"
    ) % (
        __import__("os").path.dirname(
            __import__("os").path.dirname(__import__("os").path.abspath(__file__))
        ),
        d,
    )
    procs = [
        subprocess.Popen([sys.executable, "-c", code, str(w)],
                         stderr=subprocess.PIPE)
        for w in range(4)
    ]
    errs = []
    for p in procs:
        _, err = p.communicate(timeout=120)
        if p.returncode != 0:
            errs.append(err.decode()[-500:])
    assert not errs, errs
    got = StateManager(d, "shared").load()
    assert got is not None
    w, i = divmod(got.chunks_committed, 1000)
    assert 0 <= w < 4 and i == 199  # last save of SOME worker wins
