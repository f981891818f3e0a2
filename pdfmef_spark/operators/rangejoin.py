"""Interval (range) join via time-bucketed equi-join.

`events.ts BETWEEN interval.start AND interval.end` has no hash-join
key, so Catalyst falls back to BroadcastNestedLoop/Cartesian — O(n*m)
compares, a non-starter at 10^12 rows. The scale-safe formulation maps
both sides onto fixed-width time buckets: an event joins on its single
bucket, an interval explodes onto every bucket it overlaps (<=2 when
`bucket_seconds` >= the longest interval), the join becomes a plain
shuffled hash join on (by..., bucket), and an exact containment filter
removes boundary over-matches. Same blocking discipline as the LSH
operators: candidates first, exact predicate second, never all-pairs.

No reference counterpart (pdfmef has no temporal joins); companion to
the as-of backward join (operators/asof.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: list[str] | None = None,
    bucket_seconds: int = 21_600,
    how: str = "inner",
) -> DataFrame:
    """Rows of `events` joined to every interval containing them
    (half-open: start <= ts < end), equality on `by` columns.

    Pick `bucket_seconds` ~ the maximum interval length: each interval
    then lands in at most 2 buckets and the candidate fan-out is ~2x
    rows, independent of table sizes.
    """
    by = by or []
    ev = events.withColumn(
        "__bucket",
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long"),
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bucket_seconds).cast("long"),
                F.floor(F.unix_timestamp(F.col(end_col)) / bucket_seconds).cast("long"),
            )
        ),
    )
    joined = ev.join(iv, [*by, "__bucket"], how).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("__bucket")
