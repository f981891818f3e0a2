"""Fixed-iteration PageRank over the citation graph (iterative joins).

The reference materializes the citation graph but never ranks it
(bin/buildXML.pl:53-64 merges per-doc citation XML; no analytics).
A KG built from 10^12 web pages is consumed through exactly this kind
of graph analytic — rank-by-citation is the canonical one — so the
engine ships it as a first-class operator over the `edges` table.

Deterministic cross-engine contract (what makes the DuckDB oracle a
bit-exact hash check despite floating point): the two aggregation
results per iteration — each node's in-contribution sum and the global
dangling-rank sum — are rounded to ``round_dp`` decimals; every other
arithmetic step is a fixed IEEE-754 expression tree evaluated over
identical inputs. Caveat (known limitation, not a guarantee): rounding
an order-dependent double sum is only probabilistically stable — a sum
landing within ~1 ulp of a round-half boundary can round differently
per engine. At the tested graph sizes no such boundary case occurs; if
one ever flakes the hash gate, compare at ``round_dp - 1`` (a guard
digit) rather than treating it as a correctness regression.

Scale design (10^12-edge citation graph, 1000 executors):

* per-iteration cost = one keyed shuffle join (ranks -> edges on src)
  plus one groupBy(dst) whose sum is algebraic, so map-side partial
  aggregation absorbs hub fan-in (the `cites` hot-page skew) before
  the shuffle; AQE skew-split handles the residual.
* the degree-joined edge table is built once, hash-partitioned by src
  and cached that way, so the per-iteration contribution join
  exchanges ONLY the O(nodes) rank vector — the O(edges) side never
  re-shuffles (round 6; previously the edge cache was partitioned by
  (src, dst) from distinct() and re-exchanged every iteration).
  The caches are released before returning (the final rank vector is
  checkpointed first, so the returned DataFrame owns its own blocks).
* dangling mass: on the production path (checkpoint_every=1) it is an
  ``observe`` metric on the SAME job that materializes each
  iteration's checkpoint — the identical F.sum over the identical
  rows, returned as a scalar and folded into the next iteration as a
  literal, so the separate aggregate job + per-iteration
  BroadcastExchange build disappear (round 6: per-iteration jobs
  2 -> 1, 3-iteration loop best-of 10.9 s -> 6.5 s on the sf1.0 cites
  graph, bit-identical ranks). Other checkpoint cadences keep the
  1-row-aggregate crossJoin(broadcast) shape. The dangling-node test
  rides the rank vector as a precomputed boolean (the node property is
  static), replacing a per-iteration anti-join; the node count is
  collected once as a scalar literal.
* lineage: ranks localCheckpoint() every ``checkpoint_every``
  iterations (default: every iteration). This is not just plan-depth
  hygiene — each iteration consumes the previous rank vector THREE
  times (contribution join, dangling-mass aggregate, node rebuild), so
  an unmaterialized rank lineage recomputes upstream a growing number
  of times per extra iteration; truncating every iteration makes the
  cost exactly one join + one aggregate per step (measured: 5
  iterations on a 1.2M-edge graph dropped ~5x — 109 s to 20 s on
  local[32] — when the default changed from checkpoint-every-5 to
  every-1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    round_dp: int = 9,
    checkpoint_every: int = 1,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """edges(src, dst[, weight]) -> ranks(node, pr) after ``iterations``.

    r_{k+1}(v) = (1-d)/N + d * (contrib_k(v) + dang_k/N)
      contrib_k(v) = round( sum_{(u,v) in E} r_k(u)*w/str(u), round_dp )
      dang_k       = round( sum_{str(u)=0} r_k(u),            round_dp )

    Unweighted (``weight=None``): duplicate (src, dst) pairs collapse
    first and str(u) = out-degree. Weighted: ``weight`` must be an
    INTEGER-valued column (edge multiplicities / doc counts) — integer
    doubles sum exactly, so the out-strength is order-independent and
    the cross-engine bit-exactness contract still holds. r_0 = 1/N
    uniform; ranks sum to ~1 every iteration (dangling mass is
    redistributed, not dropped).
    """
    if weight is None:
        e = (
            edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            .distinct()
            .withColumn("w", F.lit(1.0).cast("double"))
            .cache()
        )
    else:
        # weight contract: NULL / non-positive weights are dropped up
        # front (mirrored by WHERE w > 0 in pagerank_oracle_sql) — a
        # node whose total out-weight were 0 would divide to NaN and
        # silently poison every downstream rank.
        e = (
            edges.select(
                F.col(src).alias("src"),
                F.col(dst).alias("dst"),
                F.col(weight).cast("double").alias("w"),
            )
            .filter(F.col("w") > 0)
            .cache()
        )
    deg = e.groupBy("src").agg(F.sum("w").alias("deg"))
    # degree attached to the edge table ONCE, hash-partitioned by src
    # and cached that way (round 6, guide §2.4): the per-iteration
    # contribution join previously re-joined deg and re-exchanged the
    # FULL edge table every iteration (the cached distinct() leaves e
    # partitioned by (src, dst), which a join on src cannot reuse).
    # Now only the O(nodes) rank vector moves per iteration; the
    # O(edges) relation is exchanged exactly once for the whole run.
    # `w` and `deg` stay separate columns so the contribution term
    # keeps the exact (rank * w) / deg expression tree — bit-identical
    # to the oracle contract.
    ed = e.repartition("src").join(deg, "src").cache()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        # dangling flag precomputed once: the per-iteration dangling
        # mass was an anti-join of ranks against deg (one extra join +
        # exchange per iteration) for a node property that never
        # changes. The flag rides the rank vector instead and the
        # dangling aggregate becomes a filter + 1-row sum — same rows
        # summed, same round_dp contract.
        .join(
            deg.select(F.col("src").alias("node"), F.lit(False).alias("dangling")),
            "node",
            "left",
        )
        .select("node", F.coalesce("dangling", F.lit(True)).alias("dangling"))
        .cache()
    )
    # node count as a scalar literal (round 6): the count was a 1-row
    # singleton crossJoin-broadcast into every iteration's plan — one
    # BroadcastExchange job per iteration for a value that never
    # changes. One count() of the cached node table (O(1) driver data,
    # the rangejoin.py precedent) folds it into codegen as a literal;
    # n < 2^53 so float(n) is exact and base/n etc. are the same IEEE
    # ops as before.
    n = F.lit(float(nodes.count())).cast("double")

    ranks = nodes.select(
        "node", "dangling", (F.lit(1.0).cast("double") / n).alias("rank")
    )

    base = F.lit(1.0).cast("double") - F.lit(damping).cast("double")
    d = F.lit(damping).cast("double")

    # Production path (checkpoint_every=1, round 6): the dangling-mass
    # aggregate rides the SAME job that materializes each iteration's
    # checkpoint, as an ``observe`` metric over the just-built rank
    # vector — the same F.sum over the same rows, delivered as a scalar
    # and folded into the next iteration as a literal. The previous
    # shape ran a separate 2-stage aggregate job PLUS a
    # BroadcastExchange build per iteration just to ship one double
    # into the plan; per-iteration jobs drop 2 -> 1 (measured at sf1.0,
    # 653k cites edges, interleaved A/B: best-of 6.5 s vs 10.9 s for
    # the 3-iteration loop, rank vectors bit-identical). round_dp
    # rounding keeps the cross-engine contract exactly as before.
    obs_dang = checkpoint_every == 1

    def _ckpt_with_dang(df: DataFrame) -> tuple[DataFrame, float]:
        from pyspark.sql import Observation

        ob = Observation()
        df = df.observe(
            ob,
            F.round(
                F.coalesce(
                    F.sum(F.when(F.col("dangling"), F.col("rank"))),
                    F.lit(0.0).cast("double"),
                ),
                round_dp,
            ).alias("dang"),
        ).localCheckpoint(eager=True)
        return df, float(ob.get["dang"])

    dang_lit = None
    if obs_dang:
        ranks, dang_lit = _ckpt_with_dang(ranks)
    for i in range(iterations):
        contrib = (
            ed.join(ranks.select(F.col("node").alias("src"), "rank"), "src")
            .groupBy("dst")
            .agg(
                # for w == 1.0 this is bit-identical to rank/deg
                # (IEEE multiply by 1.0 is exact), so the unweighted
                # oracle contract is unchanged
                F.round(
                    F.sum(F.col("rank") * F.col("w") / F.col("deg")), round_dp
                ).alias("contrib")
            )
            .withColumnRenamed("dst", "node")
        )
        if obs_dang:
            dang_col = F.lit(dang_lit).cast("double")
        else:
            dang = (
                ranks.filter(F.col("dangling"))
                .agg(
                    F.round(
                        F.coalesce(F.sum("rank"), F.lit(0.0).cast("double")), round_dp
                    ).alias("dang")
                )
            )
            dang_col = F.col("dang")
        ranks = nodes.join(contrib, "node", "left")
        if not obs_dang:
            ranks = ranks.crossJoin(F.broadcast(dang))
        ranks = ranks.select(
            "node",
            "dangling",
            (
                base / n
                + d
                * (
                    F.coalesce(F.col("contrib"), F.lit(0.0).cast("double"))
                    + dang_col / n
                )
            ).alias("rank"),
        )
        if obs_dang:
            if (i + 1) < iterations:
                ranks, dang_lit = _ckpt_with_dang(ranks)
        elif checkpoint_every and (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    out = ranks.select("node", F.col("rank").alias("pr"))
    if checkpoint_every:
        # materialize the final ranks so the cached edge/degree/node
        # relations can be released — the returned DataFrame reads its
        # own checkpoint blocks, not the loop's lineage
        out = out.localCheckpoint(eager=True)
    # unpersist UNCONDITIONALLY — the checkpoint_every=0 path (debug /
    # plan inspection only) must not leak three cached relations for
    # the session lifetime; its un-checkpointed lineage simply
    # recomputes them if the caller executes the plan
    for df in (e, nodes, ed):
        df.unpersist()
    return out


def pagerank_oracle_sql(
    edges_sql: str, iterations: int = 3, damping: float = 0.85, round_dp: int = 9,
    weighted: bool = False,
) -> str:
    """The identical computation as ANSI SQL (DuckDB), iterations
    unrolled into chained CTEs. ``edges_sql`` must yield (src, dst) —
    plus an integer-valued ``w`` when ``weighted``.

    Every arithmetic step mirrors :func:`pagerank`'s expression tree
    with explicit DOUBLE casts so DuckDB doesn't route literals through
    DECIMAL — the hash gate then checks bit-identical doubles.
    """
    d = f"CAST({damping!r} AS DOUBLE)"
    if weighted:
        # mirror pagerank()'s weight contract: NULL / non-positive
        # weights dropped before degree computation
        e_cte = (
            f"e AS (SELECT src, dst, CAST(w AS DOUBLE) AS w FROM ({edges_sql}) "
            "WHERE CAST(w AS DOUBLE) > 0)"
        )
        deg_cte = "deg AS (SELECT src, sum(w) AS deg FROM e GROUP BY src)"
        term = "r.rank * e.w / deg.deg"
    else:
        e_cte = f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))"
        deg_cte = "deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY src)"
        term = "r.rank / deg.deg"
    ctes = [
        e_cte,
        "nd AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nd)",
        deg_cte,
        "r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM nd)",
    ]
    for k in range(1, iterations + 1):
        p = f"r{k - 1}"
        ctes.append(
            f"""c{k} AS (
              SELECT e.dst AS node, round(sum({term}), {round_dp}) AS contrib
              FROM e JOIN {p} r ON e.src = r.node JOIN deg ON deg.src = e.src
              GROUP BY e.dst)"""
        )
        ctes.append(
            f"""g{k} AS (
              SELECT round(coalesce(sum(r.rank), CAST(0.0 AS DOUBLE)), {round_dp}) AS dang
              FROM {p} r LEFT JOIN deg ON r.node = deg.src WHERE deg.src IS NULL)"""
        )
        ctes.append(
            f"""r{k} AS (
              SELECT nd.node,
                     (CAST(1.0 AS DOUBLE) - {d}) / (SELECT n FROM nn)
                     + {d} * (coalesce(c.contrib, CAST(0.0 AS DOUBLE))
                              + (SELECT dang FROM g{k}) / (SELECT n FROM nn)) AS rank
              FROM nd LEFT JOIN c{k} c ON nd.node = c.node)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, rank AS pr FROM r{iterations} ORDER BY node"
    )
