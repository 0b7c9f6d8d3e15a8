"""Timestamp hygiene: extreme/garbage timestamps must be quarantinable.

PySpark cannot even collect() a year-1 timestamp (hybrid-calendar rebase
produces year 0, which Python datetime rejects) — one poisoned row
aborts an otherwise-correct job at result time, so the filter has to run
JVM-side before any collect.
"""

from __future__ import annotations

import datetime

import pytest

from ondine_spark.operators.curation import filter_valid_timestamps


@pytest.fixture()
def events(spark):
    rows = [
        (0, datetime.datetime(1, 1, 1)),           # pre-Gregorian garbage
        (1, datetime.datetime(1899, 12, 31)),      # below default window
        (2, datetime.datetime(1970, 1, 1)),        # epoch default
        (3, datetime.datetime(2024, 6, 1, 12)),    # sane
        (4, datetime.datetime(2400, 1, 1)),        # sentinel future
        (5, None),                                  # null
    ]
    return spark.createDataFrame(rows, "id int, ts timestamp")


def test_year1_timestamp_cannot_even_collect(events):
    # the platform hazard this operator exists for
    with pytest.raises(Exception):
        events.collect()


def test_filter_keeps_only_sane_window(events):
    kept = filter_valid_timestamps(events, "ts")
    assert sorted(r.id for r in kept.collect()) == [2, 3]


def test_quarantine_returns_both_sides(events):
    kept, bad = filter_valid_timestamps(events, "ts", quarantine=True)
    assert sorted(r.id for r in kept.collect()) == [2, 3]
    # the quarantined frame contains the poisoned rows; count() is safe
    # (no Python conversion), which is exactly how it should be handled
    assert bad.count() == 4


def test_custom_window(events):
    kept = filter_valid_timestamps(
        events, "ts", min_ts="1800-01-01", max_ts="2500-01-01"
    )
    assert sorted(r.id for r in kept.collect()) == [1, 2, 3, 4]
