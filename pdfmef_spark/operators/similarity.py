"""Similarity search over embedding columns: brute-force cosine top-k
baseline + IVF-style (coarse-quantizer bucketed) scale path.

`embeddings(vec_id, embedding array<float>, label)` is the input shape.

Brute force: query broadcast against all vectors, JVM-side dot products,
window top-k — exact, O(N) per query; right when queries are few.

IVF path: k-means-lite coarse centroids (sampled, trained driver-side
once, broadcast), every vector assigned to nearest centroid (one pass),
queries probe only the nprobe nearest centroid buckets — the standard
inverted-file ANN layout re-expressed relationally: assignment is a
groupBy-free map, probing is a semi-join on centroid id.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window as W, functions as F

from pdfmef_spark.operators.dedup import cosine_sim


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    q_id_col: str = "q_id", q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact cosine top-k per query. queries is small -> broadcast;
    the big side never shuffles (window partitions by query id)."""
    joined = emb.crossJoin(F.broadcast(queries))
    scored = joined.withColumn("cosine", cosine_sim(F.col(vec_col), F.col(q_vec_col)))
    w = W.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, F.round("cosine", 6).alias("cosine"), "rank")
    )


def train_centroids(
    emb: DataFrame, n_centroids: int = 16, vec_col: str = "embedding",
    sample: int = 2048, iters: int = 8, seed: int = 42,
) -> np.ndarray:
    """k-means on a driver-side sample (Lloyd's, fixed iters, seeded).

    At 100 TB the sample is still a few thousand rows — the training
    cost is O(sample * k * iters) on the driver; assignment of the full
    table stays distributed."""
    rows = emb.select(vec_col).limit(sample).collect()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
    return cents


def _nearest_centroid_col(vec_col, cents: np.ndarray):
    """Column: argmax centroid id by dot product (JVM-side expressions)."""
    best_id = F.lit(0)
    best_dot = None
    for cid, c in enumerate(cents):
        dot = F.aggregate(
            F.zip_with(vec_col, F.array(*[F.lit(float(v)) for v in c]), lambda a, b: a * b),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        if best_dot is None:
            best_dot = dot
        else:
            best_id = F.when(dot > best_dot, F.lit(cid)).otherwise(best_id)
            best_dot = F.greatest(dot, best_dot)
    return best_id


def ivf_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10, n_centroids: int = 16,
    nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
    q_id_col: str = "q_id", q_vec_col: str = "q_vec",
) -> DataFrame:
    """IVF ANN: probe only the nprobe closest centroid buckets per query.

    Recall < 1.0 by construction; tested against the brute-force oracle
    for recall@k >= 0.9 with nprobe=4/16 buckets.
    """
    cents = train_centroids(emb, n_centroids, vec_col)
    tagged = emb.withColumn("cent", _nearest_centroid_col(F.col(vec_col), cents))

    # per-query probe list: nprobe nearest centroids (computed driver-side
    # for the broadcast-small query set)
    qrows = queries.collect()
    probe_rows = []
    for r in qrows:
        qv = np.array(r[q_vec_col], dtype=np.float64)
        qv /= max(np.linalg.norm(qv), 1e-12)
        order = np.argsort(-(cents @ qv))[:nprobe]
        for c in order:
            probe_rows.append((r[q_id_col], int(c), list(map(float, r[q_vec_col]))))
    spark = emb.sparkSession
    probes = spark.createDataFrame(
        probe_rows, f"{q_id_col} long, cent int, {q_vec_col} array<double>"
    )

    joined = tagged.join(F.broadcast(probes), "cent")
    scored = joined.withColumn("cosine", cosine_sim(F.col(vec_col), F.col(q_vec_col)))
    w = W.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, F.round("cosine", 6).alias("cosine"), "rank")
    )
