"""Vocabulary-growth stress for entity linking.

The synthetic corpus draws surfaces from fixed pools (corpus.py), so the
links stage looks ~constant in doc count there. Real web surface forms
grow with corpus size; this module generates a mentions table whose
DISTINCT surface count grows linearly with n and drives the full
link_entities path (LSH bands + token/prefix blocks + Arrow scoring)
over it at two sizes, recording throughput scaling. Validates the
"caps keep candidate generation bucketed" claim under vocabulary growth
(reference analog: pdfmef's author/affiliation strings grow with the
crawl, src/extractor/csxextract/extractors/tei.py:45-65).

Everything is a pure function of the row index — deterministic at any
parallelism, nothing collected to the driver but the final count.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

VARIANTS_PER_ENTITY = 3


def stress_mentions(spark: SparkSession, n_entities: int) -> DataFrame:
    """3 alias mentions per entity; distinct-surface count = 3*n.

    Last names are fixed-width md5-hex tokens: equal-length strings never
    prefix-match unless equal, and hex noise keeps cross-entity character
    Jaccard far below the 0.70 link threshold, so every accepted pair is
    within-entity. Per entity, (canonical, initialed) is guaranteed by the
    shared-last-token block and (canonical, extended) by the
    two-token-prefix block; (initialed, extended) sits just under the
    threshold — tests assert 2n <= links <= 3n and zero cross-entity pairs.
    """
    base = spark.range(VARIANTS_PER_ENTITY * n_entities).select(
        F.floor(F.col("id") / VARIANTS_PER_ENTITY).alias("e"),
        (F.col("id") % VARIANTS_PER_ENTITY).alias("v"),
    )
    first = F.concat(F.lit("Fn"), F.pmod(F.col("e"), F.lit(37)))
    last = F.concat(F.lit("Ln"), F.substring(F.md5(F.col("e").cast("string")), 1, 8))
    surface = (
        F.when(F.col("v") == 0, F.concat(first, F.lit(" "), last))
        .when(F.col("v") == 1, F.concat(F.substring(first, 1, 1), F.lit(". "), last))
        .otherwise(F.concat(first, F.lit(" "), last, F.lit(" Labs")))
    )
    return base.select(F.lit("PERSON").alias("type"), surface.alias("surface"))


def linking_scaling(
    spark: SparkSession, n_small: int = 10_000, growth: int = 4, reps: int = 2
) -> dict:
    """Run link_entities at n and growth*n entities; report best-of-reps
    wall-clock, surfaces/sec, and the time ratio (linear growth => ratio
    ~= growth; an unbucketed quadratic path would show ~growth**2).

    Reps ALTERNATE between the two sizes (small, large, small, large)
    so a throttle phase on this burstable VM cannot land entirely on one
    side and invert the ratio (same discipline as tools/scaling_run.py).
    """
    from pdfmef_spark.operators.linking import link_entities

    sizes = {"small": n_small, "large": n_small * growth}
    best: dict[str, float] = {}
    links_n: dict[str, int] = {}
    for _ in range(reps):
        for tag, n in sizes.items():
            m = stress_mentions(spark, n)
            t0 = time.time()
            links_n[tag] = link_entities(m).count()
            dt = time.time() - t0
            best[tag] = min(best.get(tag, dt), dt)

    out: dict = {"growth": growth, "reps": reps}
    for tag, n in sizes.items():
        out[tag] = {
            "entities": n,
            "surfaces": VARIANTS_PER_ENTITY * n,
            "links": links_n[tag],
            "sec": round(best[tag], 3),
            "surfaces_per_sec": round(VARIANTS_PER_ENTITY * n / best[tag], 1),
        }
    out["time_ratio"] = round(out["large"]["sec"] / out["small"]["sec"], 3)
    return out
