"""Column-function helpers: normalization, salting, skew-aware joins.

All JVM-side built-ins (whole-stage codegen) — no Python in these paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def normalize_surface(col: Column) -> Column:
    """Canonicalize an entity surface form for linking.

    lowercase -> drop leading article -> reorder "Last, First" ->
    strip periods -> collapse whitespace. Pure built-ins so the
    normalization runs inside codegen at any scale.
    """
    c = F.lower(F.trim(col))
    c = F.regexp_replace(c, r"^the ", "")
    c = F.when(
        c.contains(", "),
        F.concat_ws(" ", F.substring_index(c, ", ", -1), F.substring_index(c, ", ", 1)),
    ).otherwise(c)
    c = F.regexp_replace(c, r"\.", "")
    c = F.regexp_replace(c, r" +", " ")
    return F.trim(c)


def salt_column(key: Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) derived from the key itself plus
    a row-varying component — used to split a hot key across reducers."""
    return F.pmod(F.xxhash64(key, F.rand(seed=42) * 1e9), F.lit(n_salts)).cast("int")


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    agg_exprs: list[Column],
    final_exprs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups by (keys..., salt) — hub keys split across n_salts
    reducers; phase 2 re-aggregates the partials. For algebraic aggs
    (count/sum/min/max) pass the partial exprs and the matching final
    re-agg exprs over the partial column names.

    Note: Spark's hash aggregation already does map-side partial
    aggregation, which removes most agg skew; this helper exists for
    the cases where the *reduce* side still hot-spots (very low group
    cardinality with extreme frequency skew) and as the explicit
    skew-handling primitive the pipeline can opt into.
    """
    salted = df.withColumn("__salt", salt_column(F.concat_ws("", *group_cols), n_salts))
    partial = salted.groupBy(*group_cols, "__salt").agg(*agg_exprs)
    return partial.groupBy(*group_cols).agg(*final_exprs)


def salted_join_small_skewed(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a big skewed fact against a small-but-not-broadcastable dim by
    replicating every dim row n_salts times and salting the fact side.

    At local/test scale `F.broadcast(small)` is strictly better; this is
    the explicit fallback for cluster scale where the dim exceeds the
    broadcast threshold but hub keys would hot-spot a shuffle join.
    (AQE skew-join splitting covers the same case adaptively; this is
    the deterministic variant.)
    """
    exploded = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    fact = big.withColumn("__salt", salt_column(F.col(key), n_salts))
    out = fact.join(exploded, [key, "__salt"], how)
    return out.drop("__salt")


def char_shingles(col: Column, k: int = 3) -> Column:
    """Distinct character k-grams of a string — JVM-side via
    sequence+transform (no Python), the shingle base for MinHash/Jaccard."""
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    idx = F.sequence(F.lit(1), F.greatest(F.length(padded) - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: padded.substr(i, F.lit(k))))
