"""As-of join: backward point-in-time semantics, tie handling, tolerance,
and the no-range-join plan shape."""

import datetime as dt

from pyspark.sql import functions as F

from ondine_spark.operators.asof import asof_join


def _t(minute, second=0):
    return dt.datetime(2026, 1, 1, 12, minute, second)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 1, _t(10)),
            (2, 1, _t(20)),
            (3, 1, _t(5)),   # before any right row
            (4, 2, _t(30)),
            (5, 3, _t(30)),  # key with no right rows at all
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _t(10), 100.0),  # equal-ts: inclusive match for event 1
            (1, _t(15), 150.0),
            (2, _t(0), 900.0),
        ],
        "user_id long, ts timestamp, price double",
    )
    return left, right


def test_backward_semantics(spark):
    left, right = _frames(spark)
    out = {
        r.event_id: r
        for r in asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="ts"
        ).collect()
    }
    assert out[1].price_right == 100.0  # ts == right ts -> matches
    assert out[2].price_right == 150.0  # latest prior, not first
    assert out[2].ts_right == _t(15)
    assert out[3].price_right is None   # nothing at-or-before
    assert out[4].price_right == 900.0
    assert out[5].price_right is None   # key absent from right
    # left columns survive untouched
    assert set(out[1].asDict()) == {
        "event_id", "user_id", "ts", "ts_right", "price_right"
    }


def test_tolerance_exact(spark):
    left, right = _frames(spark)
    out = {
        r.event_id: r.price_right
        for r in asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="ts",
            tolerance_seconds=299,
        ).collect()
    }
    assert out[1] == 100.0
    assert out[2] is None          # 300 s > 299 s tolerance
    assert out[4] is None          # 30 min stale


def test_right_ties_resolve_to_max_payload(spark):
    left = spark.createDataFrame(
        [(1, 1, _t(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _t(10), 1.0), (1, _t(10), 2.0)],
        "user_id long, ts timestamp, price double",
    )
    (row,) = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts"
    ).collect()
    assert row.price_right == 2.0


def test_plan_has_no_join_operator(spark):
    import contextlib
    import io

    left, right = _frames(spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="ts"
        ).explain("formatted")
    plan = buf.getvalue()
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct", "SortMergeJoin"):
        assert bad not in plan


# ----------------------------------------------------------- range join

def test_range_join_containment(spark):
    from ondine_spark.operators.asof import range_join

    points = spark.createDataFrame(
        [(1, 1, _t(10)), (2, 1, _t(59, 59)), (3, 1, _t(0)), (4, 2, _t(10))],
        "pid long, k long, ts timestamp",
    )
    ivals = spark.createDataFrame(
        [
            (100, 1, _t(5), _t(15)),    # catches pid 1
            (101, 1, _t(8), _t(10)),    # ALSO catches pid 1 (overlap ok)
            (102, 1, _t(59), _t(59, 59)),  # boundary-inclusive: pid 2
            (103, 2, _t(59, 59), _t(5)),   # inverted: matches nothing
        ],
        "iid long, k long, lo timestamp, hi timestamp",
    )
    out = range_join(
        points, ivals, left_ts="ts", right_start="lo", right_end="hi",
        on="k", bucket_seconds=60,
    )
    got = sorted((r.pid, r.iid) for r in out.collect())
    assert got == [(1, 100), (1, 101), (2, 102)]


def test_range_join_no_key_and_wide_interval(spark):
    from ondine_spark.operators.asof import range_join

    points = spark.createDataFrame(
        [(1, _t(0)), (2, _t(30)), (3, _t(59, 59))], "pid long, ts timestamp"
    )
    # one interval spanning many 60-s buckets: explode covers them all
    ivals = spark.createDataFrame(
        [(7, _t(0), _t(45))], "iid long, lo timestamp, hi timestamp"
    )
    out = range_join(
        points, ivals, left_ts="ts", right_start="lo", right_end="hi",
        bucket_seconds=60,
    )
    assert sorted(r.pid for r in out.collect()) == [1, 2]


def test_range_join_plan_is_equi_join(spark):
    import contextlib
    import io

    from ondine_spark.operators.asof import range_join

    points = spark.createDataFrame([(1, _t(0))], "pid long, ts timestamp")
    ivals = spark.createDataFrame(
        [(7, _t(0), _t(45))], "iid long, lo timestamp, hi timestamp"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        range_join(
            points, ivals, left_ts="ts", right_start="lo", right_end="hi"
        ).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
