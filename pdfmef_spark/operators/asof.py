"""As-of (backward) join: attach to each left row the latest right row
with right.ts <= left.ts, per key.

Spark has no native ASOF JOIN; this is the standard union-sort-window
composition:

    union(left tagged, right tagged)
      -> window per key ordered by (ts, tag)
      -> last_value(right cols, ignoreNulls) carried forward
      -> keep left rows

Scale notes: the window partitions by the `by` key, so parallelism =
key cardinality; for un-keyed as-of at scale you range-partition by
time and duplicate right-side boundary rows into the next range (same
trick Flink/kdb use). Right rows sort before left rows at equal ts
(tag ordering) => ties are inclusive (right.ts == left.ts matches),
matching DuckDB's ASOF semantics (ON left.ts >= right.ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: list[str],
    value_cols: list[str],
) -> DataFrame:
    """left + latest-right-at-or-before per `by` key. Left rows with no
    earlier right row get NULL value_cols (left-outer as-of)."""
    l_tag = left.withColumn("__tag", F.lit(1))
    r_tag = right.select(
        *by, ts_col, *value_cols
    ).withColumn("__tag", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        W.partitionBy(*by)
        .orderBy(F.col(ts_col), F.col("__tag"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    for v in value_cols:
        unioned = unioned.withColumn(v, F.last(v, ignorenulls=True).over(w))
    return unioned.filter(F.col("__tag") == 1).drop("__tag")
