"""Extra benchmarks (guide §1.4): operator-level isolation that the
frozen bench.py cannot host. Not part of the driver contract; numbers
are cited in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py dedup [sf_dir] [reps]     # 4 dedup pipelines, cold+warm
  python bench_extra.py dedup_scale [sf_dir] [mult]  # synthetic mult-x corpus
  python bench_extra.py graph20m [n_edges]        # distributed CC+PR at scale
  python bench_extra.py pipeline_stages [sf]      # kg stage decomposition
"""

from __future__ import annotations

import json
import os
import sys
import time


def get_session():
    from pdfmef_spark.session import get_spark

    return get_spark(
        "bench_extra", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )


DEDUP_NAMES = [
    "minhash_dedup",
    "ngram_jaccard_dedup_capped",
    "simhash_dedup",
    "embedding_near_dups",
]


def dedup_bench(sf_dir: str, reps: int = 2) -> None:
    """Cold = fresh caches (clearCache + release_caches between names);
    warm = immediate second run reusing the persisted bases."""
    from pdfmef_spark.operators import dedup as dedup_op
    from pdfmef_spark.plans import queries as Q

    spark = get_session()
    cat = Q.catalog()
    out: dict[str, dict] = {}
    for name in DEDUP_NAMES:
        times: list[float] = []
        for rep in range(max(reps, 2)):
            if rep == 0:
                dedup_op.release_caches()
                spark.catalog.clearCache()
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            cat[name](spark, sf_dir).collect()
            times.append(round(time.time() - t0, 3))
        out[name] = {"cold_sec": times[0], "warm_sec": min(times[1:])}
    print(json.dumps(out), flush=True)


def dedup_scale(sf_dir: str, mult: int = 10) -> None:
    """Approximate the driver's larger-sf documents table: replicate the
    sf documents mult-x with per-copy id offsets and a per-copy token
    stamp appended to the text (keeps family structure, prevents the
    copies from collapsing into giant exact-duplicate families)."""
    import tempfile

    from pyspark.sql import functions as F

    from pdfmef_spark.operators import dedup as dedup_op

    spark = get_session()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" copystamp{i}")).alias("text"),
        )
        for i in range(mult)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    tmp = tempfile.mkdtemp(prefix="dedup_scale_")
    big.write.mode("overwrite").parquet(f"{tmp}/documents")
    big = spark.read.parquet(f"{tmp}/documents")
    out: dict[str, float] = {"docs": n0 * mult}
    for label, fn in {
        "minhash_pairs": lambda: dedup_op.minhash_dedup_pairs(big, verify_threshold=0.8),
        "simhash_pairs": lambda: dedup_op.simhash_dedup_pairs(big, max_hamming=3),
    }.items():
        dedup_op.release_caches()
        spark.catalog.clearCache()
        t0 = time.time()
        spark.sparkContext.setJobDescription(f"dedup_scale {label}")
        n = fn().count()
        out[label] = {"sec": round(time.time() - t0, 3), "pairs": n}
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out), flush=True)


def graph20m(n_edges: int = 20_000_000) -> None:
    """VERDICT r5 #5: distributed CC + PageRank past toy edge counts, on
    a skewed graph (power-law dst, max degree ~1e5), per-iteration wall
    recorded. driver_cutoff=0 forces the star-iteration path."""
    from pyspark.sql import functions as F

    from pdfmef_spark.operators import components, pagerank as pr_op

    spark = get_session()
    n_nodes = n_edges // 3
    g = spark.range(n_edges).select(
        F.concat(F.lit("n"), F.pmod(F.xxhash64("id"), F.lit(n_nodes))).alias("src"),
        F.concat(
            F.lit("n"),
            F.floor(
                F.lit(float(n_nodes))
                * F.pow(
                    F.pmod(F.xxhash64(F.col("id") + 13), F.lit(1_000_000))
                    / F.lit(1_000_000.0),
                    F.lit(4.0),
                )
            ).cast("long"),
        ).alias("dst"),
    ).localCheckpoint()
    hub = (
        g.select(F.col("dst").alias("n")).groupBy("n").count().agg(F.max("count")).first()[0]
    )
    out: dict = {"edges": n_edges, "nodes": n_nodes, "max_degree": int(hub)}
    t0 = time.time()
    spark.sparkContext.setJobDescription(f"cc_distributed_{n_edges}")
    iters: list = []
    comp = components.connected_components(g, driver_cutoff=0, iteration_log=iters)
    out["cc_components"] = comp.select("component").distinct().count()
    out["cc_sec"] = round(time.time() - t0, 3)
    out["cc_iterations"] = [
        {"round": r, "sec": s, "edges": n} for r, s, n in iters
    ]
    t0 = time.time()
    spark.sparkContext.setJobDescription(f"pagerank_{n_edges}")
    ranks = pr_op.pagerank(g, iterations=5)
    ranks.orderBy(F.desc("pr")).limit(1).collect()
    out["pagerank_sec"] = round(time.time() - t0, 3)
    out["pagerank_iters"] = 5
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "dedup":
        dedup_bench(
            sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1",
            int(sys.argv[3]) if len(sys.argv) > 3 else 2,
        )
    elif cmd == "dedup_scale":
        dedup_scale(
            sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1",
            int(sys.argv[3]) if len(sys.argv) > 3 else 10,
        )
    elif cmd == "graph20m":
        graph20m(int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000)
    else:
        raise SystemExit(f"unknown cmd {cmd}")
