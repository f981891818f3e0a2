"""spark-submit entry point for the KG pipeline.

Packaging contract (north_rule): the engine ships as a zip passed via
--py-files; the driver script only parses args and calls the library.

    cd /root/repo && zip -qr /tmp/pdfmef_spark.zip pdfmef_spark
    spark-submit --master local[32] \
        --py-files /tmp/pdfmef_spark.zip \
        --conf spark.sql.shuffle.partitions=64 \
        tools/submit_pipeline.py --sf 0.01 --out /tmp/kg_out

On a real cluster the same command takes --master yarn/k8s and the
session configs ship as --conf (see pdfmef_spark.session.ENGINE_CONFS).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--out", required=True)
    ap.add_argument("--run-id", default=None)
    ap.add_argument(
        "--incremental", action="store_true",
        help="ledger-gated delta run (pipeline.run_pipeline_incremental): "
        "re-submitting with a grown corpus extracts only new urls",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from pdfmef_spark import pipeline as P
    from pdfmef_spark.sources import store

    pages = store.read_pages(spark, args.sf)
    n = pages.count()
    t0 = time.time()
    runner = P.run_pipeline_incremental if args.incremental else P.run_pipeline
    run = runner(spark, pages, args.out, run_id=args.run_id)
    dt = time.time() - t0
    print(
        "PIPELINE_RESULT "
        + json.dumps(
            {
                "docs": n,
                "seconds": round(dt, 2),
                "docs_per_sec": round(n / dt, 2),
                "nodes": run.df("nodes").count(),
                "edges": run.df("edges").count(),
                "stages": {k: v.seconds for k, v in run.results.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
