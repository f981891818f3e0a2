"""Interval join: exactness vs brute-force, plan shape (hash join on
bucket, never nested-loop), multi-bucket spans."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pdfmef_spark.operators.rangejoin import interval_join


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def test_interval_join_matches_brute_force(spark):
    events = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", _ts(i % 24, i % 60, i % 60)) for i in range(500)],
        "event_id long, k string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("a", _ts(1), _ts(4)),
            ("a", _ts(3), _ts(5)),   # overlapping intervals both match
            ("b", _ts(2), _ts(2)),   # empty half-open interval matches nothing
            ("b", _ts(10), _ts(23)), # longer than bucket: spans many buckets
        ],
        "k string, start timestamp, end timestamp",
    )
    got = {
        (r.event_id, r.start)
        for r in interval_join(
            events, intervals, by=["k"], bucket_seconds=3600,
            max_buckets_per_interval=16,  # the 13h interval is deliberate
        ).collect()
    }
    ev = events.collect()
    iv = intervals.collect()
    want = {
        (e.event_id, i.start)
        for e in ev
        for i in iv
        if e.k == i.k and i.start <= e.ts < i.end
    }
    assert got == want and len(want) > 0

    # auto-derived bucket width (bucket_seconds=None) gives the same result
    got_auto = {
        (r.event_id, r.start)
        for r in interval_join(
            events, intervals, by=["k"], bucket_seconds=None
        ).collect()
    }
    assert got_auto == want


def test_interval_join_fanout_guard_raises(spark):
    """A pathological long interval must fail loudly, not explode onto
    thousands of buckets silently (VERDICT r02)."""
    import pytest

    events = spark.createDataFrame([(1, _ts(12))], "event_id long, ts timestamp")
    intervals = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), dt.datetime(2024, 3, 1))],  # 60 days
        "start timestamp, end timestamp",
    )
    with pytest.raises(ValueError, match="buckets"):
        interval_join(events, intervals, bucket_seconds=3600)


def test_interval_join_left_preserves_unmatched_events(spark):
    """how='left': events outside every interval survive null-extended —
    the containment predicate rides the join condition (ADVICE r02)."""
    import pytest

    events = spark.createDataFrame(
        [(1, "a", _ts(2)), (2, "a", _ts(20)), (3, "b", _ts(2, 30))],
        "event_id long, k string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [("a", _ts(1), _ts(4))], "k string, start timestamp, end timestamp"
    )
    rows = {
        (r.event_id, r.start)
        for r in interval_join(
            events, intervals, by=["k"], bucket_seconds=3600 * 4, how="left"
        ).collect()
    }
    # event 1 matches; events 2 (wrong time) and 3 (wrong key) survive with nulls
    assert rows == {(1, _ts(1)), (2, None), (3, None)}

    with pytest.raises(ValueError, match="unsupported"):
        interval_join(events, intervals, by=["k"], how="full")


def test_interval_join_plan_is_hash_join(spark):
    events = spark.range(1000).select(
        F.col("id").alias("event_id"),
        (F.lit("2024-01-01").cast("timestamp") + F.make_interval(mins=F.col("id").cast("int"))).alias("ts"),
    )
    intervals = spark.range(48).select(
        (F.lit("2024-01-01").cast("timestamp") + F.make_interval(hours=F.col("id").cast("int"))).alias("start"),
        (F.lit("2024-01-01").cast("timestamp") + F.make_interval(hours=(F.col("id") + 1).cast("int"))).alias("end"),
    )
    plan = (
        interval_join(events, intervals, bucket_seconds=3600)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "__bucket" in plan  # the equi-join key
