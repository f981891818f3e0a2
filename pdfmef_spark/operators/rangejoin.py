"""Interval (range) join via time-bucketed equi-join.

`events.ts BETWEEN interval.start AND interval.end` has no hash-join
key, so Catalyst falls back to BroadcastNestedLoop/Cartesian — O(n*m)
compares, a non-starter at 10^12 rows. The scale-safe formulation maps
both sides onto fixed-width time buckets: an event joins on its single
bucket, an interval explodes onto every bucket it overlaps (<=2 when
`bucket_seconds` >= the longest interval), the join becomes a plain
shuffled hash join on (by..., bucket), and an exact containment
predicate (inside the join condition, so outer semantics survive)
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
    bucket_seconds: int | None = 21_600,
    how: str = "inner",
    max_buckets_per_interval: int = 8,
) -> DataFrame:
    """Rows of `events` joined to every interval containing them
    (half-open: start <= ts < end), equality on `by` columns.

    `bucket_seconds` should be ~ the maximum interval length: each
    interval then lands in at most 2 buckets and the candidate fan-out
    is ~2x rows, independent of table sizes. Pass ``bucket_seconds=None``
    to auto-derive it from ``max(end - start)`` (one cheap aggregate over
    the intervals side — the small side by assumption). An explicit
    value that would explode any interval onto more than
    `max_buckets_per_interval` buckets raises instead of silently
    fanning out (`len/bucket` copies of a long interval is the quiet
    way to melt a shuffle at scale).

    `how` may be 'inner' or 'left' (events-preserving: unmatched events
    survive with null interval columns — the containment predicate is
    part of the join condition, not a post-filter, so null-extended
    rows are never dropped). Interval-preserving outer joins ('right' /
    'full') are rejected: an unmatched interval exploded onto k buckets
    would surface k null-extended duplicates.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"interval_join: how={how!r} unsupported — use 'inner' or 'left' "
            "(events-preserving); interval-preserving outer joins would "
            "duplicate null-extended intervals across their exploded buckets"
        )
    by = by or []

    span = F.floor(F.unix_timestamp(F.col(end_col))) - F.floor(
        F.unix_timestamp(F.col(start_col))
    )
    if bucket_seconds is None:
        mx = intervals.agg(F.max(span).alias("mx")).collect()[0]["mx"]
        bucket_seconds = max(int(mx or 0), 1)
    else:
        worst = intervals.agg(
            F.max(F.ceil(span / F.lit(int(bucket_seconds)))).alias("w")
        ).collect()[0]["w"]
        if worst is not None and int(worst) + 1 > max_buckets_per_interval:
            raise ValueError(
                f"interval_join: longest interval spans ~{int(worst) + 1} "
                f"buckets of {bucket_seconds}s (> max_buckets_per_interval="
                f"{max_buckets_per_interval}); raise bucket_seconds (or pass "
                "bucket_seconds=None to auto-derive) instead of exploding"
            )

    ev = events.withColumn(
        "__bucket",
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long"),
    )
    iv = intervals.withColumn(
        "__iv_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bucket_seconds).cast("long"),
                F.floor(F.unix_timestamp(F.col(end_col)) / bucket_seconds).cast("long"),
            )
        ),
    )
    for c in by:
        iv = iv.withColumnRenamed(c, f"__iv_{c}")
    cond = F.col("__bucket") == F.col("__iv_bucket")
    for c in by:
        cond = cond & (F.col(c) == F.col(f"__iv_{c}"))
    cond = (
        cond
        & (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) < F.col(end_col))
    )
    joined = ev.join(iv, cond, how)
    drop = ["__bucket", "__iv_bucket", *[f"__iv_{c}" for c in by]]
    return joined.drop(*drop)
