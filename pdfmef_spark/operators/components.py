"""Connected components via alternating large-star / small-star joins.

The canonicalization step of the north_rule: link edges over normalized
surface keys -> one component id per real-world entity. GraphFrames is
not available in this sandbox, so this is the sanctioned iterative-join
formulation (Kiveris et al., "Connected Components in MapReduce and
Beyond", SOCC'14): both operations are plain DataFrame join+groupBy and
converge in O(log^2 n) rounds; every round is checkpointed to truncate
lineage (at cluster scale: reliable checkpoint dir; locally:
localCheckpoint).

Node ids are strings ("type|norm"); min() under lexicographic order
serves as the component representative selector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MAX_ITERATIONS = 25


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) + {u})."""
    b = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = b.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.withColumn("m", F.least(F.col("mn"), F.col("src"))).select("src", "m")
    return (
        b.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges high->low; connect all low neighbors (and u) to the min."""
    b = (
        edges.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    mins = b.groupBy("src").agg(F.min("dst").alias("m"))
    out = (
        b.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .union(mins.select(F.col("src"), F.col("m").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return out


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


# Driver fast-path bound: 2M string-pair edges is ~200 MB of driver
# heap and well under a second of vectorized label propagation —
# comfortably safe, and ~10 shuffle rounds (each a fixed scheduling
# latency that does NOT shrink with executor count) cheaper than the
# star iterations. Measured in the round-4/5 scaling work: at 167k link
# edges the distributed path cost a flat ~9 s at any core count, the
# driver path ~2 s; at 1M docs (just over the old 500k cutoff) the
# distributed path cost the assignments stage 55 s at 2 cores / 27 s at
# 8 — pure per-iteration barrier latency at local scale. On a real
# cluster size this to driver memory; the distributed path is exercised
# separately (bench cc_distributed, driver_cutoff=0) and tested
# identical.
DRIVER_CUTOFF = 2_000_000


def _driver_union_find(edges: DataFrame) -> DataFrame:
    """Small-graph fast path: collect edges, solve components on the
    driver, parallelize assignments back. Identical result to the
    iterative-join path (same min-representative), ~10 shuffle rounds
    cheaper.

    Driver work is a FLAT cost at any executor count, so it is kept
    fully vectorized: Arrow transfer (toPandas), np.unique to SORTED
    int codes (so min code == lexicographic-min string — the
    representative contract), then min-label propagation with pointer
    jumping: each round pushes the smaller label across every edge
    (np.minimum.at) and then compresses label chains (labels =
    labels[labels] to a fixed point). Rounds needed ~ log(diameter);
    every step is a whole-array C operation: measured 2.5 s at 2M edges
    with an adversarial 200k-node chain (14 rounds), far less on the
    star-like clusters linking emits (the earlier per-edge Python
    union-find loop cost ~1 s at 500k edges)."""
    import numpy as np
    import pandas as pd

    pdf = edges.toPandas()
    both = pd.concat([pdf["src"], pdf["dst"]], ignore_index=True)
    # np.unique returns SORTED uniques, so integer order == string order
    uniq, codes = np.unique(both.to_numpy(dtype=object), return_inverse=True)
    n = len(pdf)
    a_codes, b_codes = codes[:n], codes[n:]
    labels = np.arange(len(uniq), dtype=np.int64)

    while True:
        before = labels
        # push the min label across every edge, both directions
        edge_min = np.minimum(labels[a_codes], labels[b_codes])
        labels = labels.copy()
        np.minimum.at(labels, a_codes, edge_min)
        np.minimum.at(labels, b_codes, edge_min)
        # pointer jumping: compress label chains to their fixed point
        while True:
            jumped = labels[labels]
            if np.array_equal(jumped, labels):
                break
            labels = jumped
        if np.array_equal(labels, before):
            break

    out = pd.DataFrame({"node": uniq, "component": uniq[labels]})
    # explicit schema: an empty pandas frame (zero-edge graph) cannot
    # infer one, and object-dtype strings should not round-trip via
    # sampling anyway
    return edges.sparkSession.createDataFrame(
        out, "node string, component string"
    )


def connected_components(
    links: DataFrame,
    driver_cutoff: int = DRIVER_CUTOFF,
    iteration_log: list | None = None,
) -> DataFrame:
    """links(src, dst, ...) -> (node, component) for every node in links.

    Component id = lexicographic min node of the component.

    Adaptive strategy: below `driver_cutoff` edges the graph fits on the
    driver and a union-find there saves ~6 shuffle rounds per star
    iteration (pure latency at local scale); above it, the alternating
    large-star/small-star iterative-join path runs fully distributed.
    Both paths produce identical assignments (tested either way).
    """
    edges = links.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    # size gate via limit(cutoff+1).count(): short-circuits instead of
    # counting the whole edge set when the graph is large
    if driver_cutoff and edges.limit(driver_cutoff + 1).count() <= driver_cutoff:
        assign = _driver_union_find(edges)
    else:
        edges = edges.localCheckpoint()
        prev = None
        for it in range(MAX_ITERATIONS):
            import time as _time

            t0 = _time.time()
            edges = _small_star(_large_star(edges)).localCheckpoint()
            fp = _fingerprint(edges)
            if iteration_log is not None:
                # (round, seconds, edge count) — the fingerprint rides
                # the same pass, so this costs nothing extra
                iteration_log.append((it, round(_time.time() - t0, 2), fp[0]))
            if fp == prev:
                break
            prev = fp
        else:
            raise RuntimeError("connected_components did not converge")

        # converged star graph: every edge is (node, component_min)
        assign = edges.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    # nodes that ended as representatives (or isolated in links) map to themselves
    all_nodes = (
        links.select(F.col("src").alias("node"))
        .union(links.select(F.col("dst").alias("node")))
        .distinct()
    )
    return (
        all_nodes.join(assign, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )


def assign_components(keys: DataFrame, links: DataFrame) -> DataFrame:
    """Every (type, norm) key -> component id ("type|min-norm").

    Keys that never appear in a link are their own singleton component.
    """
    typed_links = links.select(
        F.concat_ws("|", "type", "src").alias("src"),
        F.concat_ws("|", "type", "dst").alias("dst"),
    )
    comp = connected_components(typed_links)
    nodes = keys.select("type", "norm").distinct().withColumn(
        "node", F.concat_ws("|", "type", "norm")
    )
    return (
        nodes.join(comp, "node", "left")
        .select(
            "type",
            "norm",
            F.coalesce("component", "node").alias("component"),
        )
    )


def delta_component_remap(prev_assign: DataFrame, delta_links: DataFrame) -> DataFrame:
    """(rep, component): merged id per representative touched by delta
    links — the O(delta) core of :func:`assign_components_delta`,
    exposed separately (round 6) so the pipeline can prune its bucketed
    assignment writes to only the components this remap actually moves.

    Endpoints of delta links map to their current representative
    (previous component for old norms, own node id for new); connected
    components over that O(delta)-edge representative graph yields the
    merged id per representative. Rows with rep == component are
    untouched components that happened to gain an internal link.
    """
    node_of = F.concat_ws("|", "type", "norm")
    prev_rep = prev_assign.select("type", "norm", F.col("component").alias("rep"))
    ends = (
        delta_links.select("type", F.col("src").alias("norm"))
        .unionByName(delta_links.select("type", F.col("dst").alias("norm")))
        .distinct()
    )
    reps = ends.join(prev_rep, ["type", "norm"], "left").select(
        "type", "norm", F.coalesce("rep", node_of).alias("rep")
    )
    r_src = reps.select(
        F.col("type").alias("ts"), F.col("norm").alias("sn"), F.col("rep").alias("rs")
    )
    r_dst = reps.select(
        F.col("type").alias("td"), F.col("norm").alias("dn"), F.col("rep").alias("rd")
    )
    rep_edges = (
        delta_links.join(
            r_src, (F.col("type") == F.col("ts")) & (F.col("src") == F.col("sn"))
        )
        .join(r_dst, (F.col("type") == F.col("td")) & (F.col("dst") == F.col("dn")))
        .select(F.col("rs").alias("src"), F.col("rd").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return connected_components(rep_edges).withColumnRenamed("node", "rep")


def assign_components_delta(
    prev_assign: DataFrame, delta_links: DataFrame, new_norms: DataFrame
) -> DataFrame:
    """Incremental ``assign_components``: merge-only component update.

    Valid exactly when the link set GREW (links = prev UNION delta, no
    deletions — the incremental pipeline guarantees this on delta-links
    ticks; cap-crossing and crash-retry ticks rebuild fully). Because a
    component id is the lexicographic min member node, and every
    previous component's id IS the min of its members, the merged
    component's id equals the min over the merged representatives —
    so the update is a remap of O(delta) representatives, never a CC
    over the full links table:

      * endpoints of delta links map to their current representative
        (previous component id for old norms, own node id for new);
      * connected components over that representative graph — O(delta
        links) edges, tiny — yields rep -> merged id;
      * previous assignments remap through it (identity when
        untouched); new norms join it (singleton when unlinked).

    Equality with a from-scratch ``assign_components`` over the merged
    keys/links is pinned by tests (operator-level and pipeline
    byte-identity).
    """
    node_of = F.concat_ws("|", "type", "norm")
    remap = delta_component_remap(prev_assign, delta_links)
    old_part = (
        prev_assign.join(remap, prev_assign["component"] == remap["rep"], "left")
        .select(
            prev_assign["type"],
            prev_assign["norm"],
            F.coalesce(remap["component"], prev_assign["component"]).alias("component"),
        )
    )
    new_part = (
        new_norms.select("type", "norm")
        .distinct()
        .withColumn("node", node_of)
        .join(remap, F.col("node") == remap["rep"], "left")
        .select(
            "type", "norm",
            F.coalesce(remap["component"], F.col("node")).alias("component"),
        )
    )
    return old_part.unionByName(new_part)
