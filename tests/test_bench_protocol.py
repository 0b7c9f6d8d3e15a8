"""Bench artifact hygiene (r7 verdict #1): the history band must be
formed from CLEAN sessions only — a run recorded under external host
load is evidence about the box, not the code, and must not stretch the
band that flags the next dirty run."""

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import _history_band  # noqa: E402


def _row(value, clean=None, queries=("q1", "q2"), sf=0.1, cpus=None):
    r = {
        "value": value,
        "queries": {q: 1.0 for q in queries},
        "sf": sf,
    }
    if clean is not None:
        r["clean"] = clean
    if cpus is not None:
        r["cpus"] = cpus
    return r


def test_history_band_ignores_dirty_sessions(tmp_path):
    hist = tmp_path / "history.jsonl"
    rows = [
        _row(45.0, clean=True),
        _row(48.0, clean=True),
        _row(62.2, clean=False),  # the loaded r7-style outlier
        _row(50.0, clean=True),
    ]
    hist.write_text("".join(json.dumps(r) + "\n" for r in rows))
    band = _history_band(str(hist), {"q1", "q2"}, 0.1, 32)
    assert band["n"] == 3
    assert band["band"] == [45.0, 50.0]  # 62.2 excluded
    assert band["median"] == 48.0


def test_history_band_pre_gate_rows_count_as_clean(tmp_path):
    """Rows written before the clean flag existed (rounds <= 4) have no
    'clean' key and must still participate."""
    hist = tmp_path / "history.jsonl"
    rows = [_row(40.0), _row(44.0, clean=True), _row(90.0, clean=False)]
    hist.write_text("".join(json.dumps(r) + "\n" for r in rows))
    band = _history_band(str(hist), {"q1", "q2"}, 0.1, 32)
    assert band["n"] == 2
    assert band["band"] == [40.0, 44.0]


def test_history_band_filters_by_query_set_and_sf(tmp_path):
    hist = tmp_path / "history.jsonl"
    rows = [
        _row(45.0, clean=True),
        _row(10.0, clean=True, queries=("q1",)),  # different query set
        _row(11.0, clean=True, sf=1.0),  # different sf
    ]
    hist.write_text("".join(json.dumps(r) + "\n" for r in rows))
    band = _history_band(str(hist), {"q1", "q2"}, 0.1, 32)
    assert band == {"n": 1, "median": 45.0, "band": [45.0, 45.0]}


def test_history_band_none_when_no_clean_rows(tmp_path):
    hist = tmp_path / "history.jsonl"
    hist.write_text(json.dumps(_row(62.0, clean=False)) + "\n")
    assert _history_band(str(hist), {"q1", "q2"}, 0.1, 32) is None


def test_history_band_filters_by_core_count(tmp_path):
    """r8: the driver also benches at reduced cores to measure scaling;
    those sessions are evidence about scaling, not drift at the standard
    width. Legacy rows without a cpus field were all 32-core runs."""
    hist = tmp_path / "history.jsonl"
    rows = [
        _row(45.0, clean=True),              # legacy row -> cpus 32
        _row(47.0, clean=True, cpus=32),
        _row(120.0, clean=True, cpus=8),     # low-core scaling run
    ]
    hist.write_text("".join(json.dumps(r) + "\n" for r in rows))
    band = _history_band(str(hist), {"q1", "q2"}, 0.1, 32)
    assert band == {"n": 2, "median": 47.0, "band": [45.0, 47.0]}
    band8 = _history_band(str(hist), {"q1", "q2"}, 0.1, 8)
    assert band8 == {"n": 1, "median": 120.0, "band": [120.0, 120.0]}


def test_median_odd_and_even():
    from bench import _median

    assert _median([1.0, 2.0, 9.0]) == 2.0
    assert _median([1.0, 2.0, 3.0, 9.0]) == 2.5
    assert _median([5.0]) == 5.0


def test_bench_source_carries_noop_metric_additions_only():
    """r8 verdict #2: the noop-sink metric must ride ALONGSIDE the
    count() metric — same contract line, new keys, old keys untouched
    (the 8-round history band is keyed on the count metric)."""
    import inspect

    import bench

    src = inspect.getsource(bench.main)
    # the additions exist
    for key in ('"queries_noop"', '"value_noop"', '"clean_noop"'):
        assert key in src, key
    # and the original contract keys survive
    for key in ('"metric"', '"value"', '"unit"', '"queries"', '"sf"'):
        assert key in src, key
    assert 'format("noop")' in src
