"""End-to-end KG pipeline runner with per-stage manifest + resume.

Stage DAG (all DataFrame -> DataFrame; topology fixed, like the
reference's hard-coded runnable order, src/extractor/main.py:71-98,
but declared data-dependencies instead of insertion order):

    pages -> extracted -> triples -> mentions -> links -> assignments
                              `-----------------------------> nodes, edges

Each stage writes partitioned parquet + manifest rows
(run_id, stage, partition_id, status, rows_out, n_errors, content_sha).
A rerun skips any stage whose manifest records status=complete — the
generalization of pdfmef's CRAWLED/EXTRACTING/PASS/FAIL state machine
(properties.config:27-31, wrappers.py:180-195): state is data in a
table, not a log to re-parse (main.py:23-41 re-parses logs; we don't).

Kill the job between stages and rerun: completed stages are read back
from parquet, not recomputed (asserted by tests/test_resume.py).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

STAGES = ["extracted", "triples", "mentions", "links", "assignments", "nodes", "edges"]


@dataclass
class StageResult:
    name: str
    df: DataFrame
    recomputed: bool
    rows: int = -1
    seconds: float = 0.0
    metrics: dict | None = None


@dataclass
class PipelineRun:
    out_dir: str
    run_id: str
    results: dict[str, StageResult] = field(default_factory=dict)

    def df(self, stage: str) -> DataFrame:
        return self.results[stage].df


def _manifest_path(out_dir: str) -> str:
    return f"{out_dir}/manifest"


def _completed_stages(spark: SparkSession, out_dir: str) -> set[str]:
    """One manifest read per run (not one per stage)."""
    mp = _manifest_path(out_dir)
    if not os.path.exists(mp):
        return set()
    m = spark.read.parquet(mp)
    return {
        r.stage
        for r in m.filter(F.col("status") == "complete").select("stage").distinct().collect()
    }


def _per_partition_counts(path: str) -> list[int]:
    """Rows per output file, footer-metadata only, ordered by file path.

    pyarrow dataset discovery skips `_SUCCESS`/dot files and resolves
    hive partition dirs; `fragment.metadata` reads just the parquet
    footer through the dataset's filesystem (local here, s3/gcs/abfs
    the same way), so no data pass over the stage output ever happens.
    """
    import pyarrow.dataset as pads

    dset = pads.dataset(path, format="parquet", partitioning="hive")
    frags = sorted(dset.get_fragments(), key=lambda fr: fr.path)
    return [fr.metadata.num_rows for fr in frags]


def _write_stage(
    spark: SparkSession, out_dir: str, run_id: str, stage: str, df: DataFrame,
    error_col: str | None = None,
    partition_by: list[str] | None = None,
    extra_obs=None,
    out_metrics: dict | None = None,
) -> DataFrame:
    """Write stage output + manifest.

    Totals (rows, errors, content sha) ride the write job itself via
    ``df.observe`` (zero extra passes); per-partition row counts come
    from the just-written parquet FOOTERS only (pyarrow dataset
    fragment metadata — a few KB per file, no data pages touched, and
    fragment discovery works against any pyarrow filesystem, so the
    same code path holds on an object store). The reference recovers
    the same information by re-parsing its result log
    (src/extractor/main.py:23-41) — here it is observed once and
    stored as data, with zero re-scan of the stage output.
    """
    path = f"{out_dir}/{stage}"
    err_expr = (
        F.sum(F.when(F.col(error_col).isNotNull(), 1).otherwise(0))
        if error_col and error_col in df.columns
        else F.sum(F.lit(0))
    )
    from pyspark.sql import Observation

    obs = Observation(f"{stage}_metrics")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_out"),
        err_expr.cast("long").alias("n_errors"),
        F.coalesce(F.bit_xor(F.xxhash64(F.struct("*"))), F.lit(0)).alias("sha_long"),
    )
    writer = observed.write.mode("overwrite")
    if partition_by:
        # hive layout on low-cardinality columns (edges by pred, nodes by
        # type): downstream per-predicate/per-type reads prune partitions
        # at the scan (the Iceberg-table shape from the north star)
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    totals = obs.get
    # operator-level side metrics (e.g. linking cap drop counters) rode
    # the same write job via their own Observation — available now
    metrics_json = None
    if extra_obs is not None:
        import json

        try:
            vals = {k: int(v) for k, v in dict(extra_obs.get).items()}
        except Exception:
            # Spark 4.1 AQE empty-relation propagation drops sub-root
            # CollectMetrics rows when the stage output is EMPTY (the
            # root observation above still delivers). An empty stage has
            # no candidates to have capped — record the metrics as absent
            # rather than failing the write.
            vals = None
        if vals is not None:
            if out_metrics is not None:
                out_metrics.update(vals)
            metrics_json = json.dumps(vals, sort_keys=True)

    records = []
    for pid, n_rows in enumerate(_per_partition_counts(path)):
        # dense index over sorted file paths: unique even under hive
        # partitioned layouts where task-numbered file names repeat
        # across partition directories
        records.append(
            (run_id, stage, pid, "partition_done", None, n_rows, None, None, None)
        )
    records.append(
        (run_id, stage, -1, "complete", None, int(totals["rows_out"]),
         int(totals["n_errors"]), format(int(totals["sha_long"]) & (2**64 - 1), "x"),
         metrics_json)
    )
    manifest = spark.createDataFrame(
        records,
        "run_id string, stage string, partition_id int, status string, "
        "rows_in long, rows_out long, n_errors long, content_sha string, "
        "metrics string",
    ).withColumn("updated_ts", F.current_timestamp())
    manifest.coalesce(1).write.mode("append").parquet(_manifest_path(out_dir))
    return spark.read.parquet(path)


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    run_id: str | None = None,
    link_threshold: float = 0.70,
) -> PipelineRun:
    """Run (or resume) the full pipeline; every stage idempotent."""
    from pdfmef_spark.operators import components, extract, graph, linking, triples as triples_op

    run_id = run_id or f"run-{int(time.time())}"
    os.makedirs(out_dir, exist_ok=True)
    run = PipelineRun(out_dir=out_dir, run_id=run_id)

    completed = _completed_stages(spark, out_dir)

    def stage(
        name: str, build, error_col: str | None = None,
        partition_by: list[str] | None = None,
        extra_obs=None,
    ) -> DataFrame:
        if name in completed:
            df = spark.read.parquet(f"{out_dir}/{name}")
            run.results[name] = StageResult(name, df, recomputed=False)
            return df
        t0 = time.time()
        metrics: dict = {}
        df = _write_stage(
            spark, out_dir, run_id, name, build(), error_col=error_col,
            partition_by=partition_by, extra_obs=extra_obs, out_metrics=metrics,
        )
        run.results[name] = StageResult(
            name, df, recomputed=True, seconds=round(time.time() - t0, 2),
            metrics=metrics or None,
        )
        return df

    extracted = stage("extracted", lambda: extract.extract_pages(pages), error_col="error")
    triples = stage("triples", lambda: triples_op.extract_triples(extracted))
    mentions = stage("mentions", lambda: triples_op.mentions_from_triples(triples))
    # candidate caps drop hot buckets silently at scale — observe the
    # drop counters on the links write job and store them in the manifest
    from pyspark.sql import Observation

    cap_obs = Observation(f"links_caps_{run_id}")
    links = stage(
        "links",
        lambda: linking.link_entities(mentions, link_threshold, cap_obs=cap_obs),
        extra_obs=cap_obs,
    )

    keys = linking.surface_keys(mentions)
    assignments = stage("assignments", lambda: components.assign_components(keys, links))

    # materialize_graph is pure plan construction (no jobs run until a
    # stage writes), so building both outputs up front costs nothing on
    # resume and each stage writes its own DataFrame — no hand-off state
    nodes_df, edges_df = graph.materialize_graph(triples, keys, assignments)
    stage("nodes", lambda: nodes_df, partition_by=["type"])
    stage("edges", lambda: edges_df, partition_by=["pred"])
    return run
