"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Pipeline (kg_*) queries are oracled against the MATERIALIZED corpus
and golden-truth parquet (read_parquet over the cache the Spark-free
bootstrap builds, sources/bootstrap.py); relational/dedup/similarity/
text queries run over the driver's pre-registered testdata views with
pure-SQL oracles. Every catalog entry carries a full hash oracle —
including kg_entity_links, whose greedy Python pair scorer is not
SQL-expressible but whose end-to-end effect is: post-CC cluster
membership over the labeled golden surfaces vs the recursive-CTE
transitive closure of golden_links WHERE same_entity — EXCEPT the two
deliberate approximation variants (event_value_quantiles_approx,
kg_two_hop_reach_hll): sketch outputs are engine-specific by design,
so they take the rows-only check and are tolerance-gated against
their exact twins in pytest (test_similarity).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

# make the engine importable regardless of the driver's cwd
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _flagship(spark: SparkSession, sf: float) -> DataFrame:
    """Top-10 most-mentioned entities: scan -> Arrow UDF extract ->
    triples -> explode mentions -> groupBy/count -> orderBy/limit."""
    from pdfmef_spark.operators import extract, triples as triples_op
    from pdfmef_spark.sources import store

    pages = store.read_pages(spark, sf)
    ext = extract.extract_pages(pages)
    trip = triples_op.extract_triples(ext)
    mentions = triples_op.mentions_from_triples(trip)
    return (
        mentions.groupBy("surface", "type")
        .agg(F.count("*").alias("n_mentions"))
        .orderBy(F.desc("n_mentions"), "surface")
        .limit(10)
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on the sf0.001 corpus; driver checks rows>0."""
    return _flagship(spark, 0.001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pdfmef_spark.plans import queries as Q

    return Q.catalog()


def oracle_sql() -> dict[str, str]:
    from pdfmef_spark.plans import queries as Q

    return Q.oracles()
