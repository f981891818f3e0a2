"""As-of (backward) join: attach to each left row the latest right row
with right.ts <= left.ts, per key.

Spark has no native ASOF JOIN; this is the standard union-sort-window
composition:

    union(left tagged, right tagged)
      -> window per key ordered by (ts, tag)
      -> last_value(right-row STRUCT, ignoreNulls) carried forward
      -> keep left rows

The matched right row is carried as a single struct so multi-column
values stay atomic — per-column last(ignorenulls) could stitch values
from different right rows when a right row carries NULLs.

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
    how: str = "left",
) -> DataFrame:
    """left + latest-right-at-or-before per `by` key.

    how='left' (default): left rows with no earlier right row survive
    with NULL value_cols — DuckDB `ASOF LEFT JOIN` semantics.
    how='inner': such rows are dropped — DuckDB `ASOF JOIN` semantics.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    l_tag = left.withColumn("__tag", F.lit(1))
    r_tag = right.select(
        *by, ts_col, F.struct(*[F.col(v) for v in value_cols]).alias("__rv")
    ).withColumn("__tag", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        W.partitionBy(*by)
        .orderBy(F.col(ts_col), F.col("__tag"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("__rv", F.last("__rv", ignorenulls=True).over(w))
    out = carried.filter(F.col("__tag") == 1)
    if how == "inner":
        out = out.filter(F.col("__rv").isNotNull())
    return out.select(
        *left.columns, *[F.col(f"__rv.{v}").alias(v) for v in value_cols]
    )
