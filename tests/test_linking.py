"""Entity linking: pair scoring P/R on golden labeled pairs, blocking recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdfmef_spark.functions import normalize_surface
from pdfmef_spark.operators import linking
from pdfmef_spark.sources import store


def test_pair_scoring_on_golden_links(spark):
    """Score every labeled golden pair directly (no blocking): P/R >= 0.95."""
    gl = store.read_golden(spark, 0.001, "golden_links")
    scored = gl.withColumn(
        "score",
        linking.pair_score_udf(
            normalize_surface(F.col("surface_a")),
            normalize_surface(F.col("surface_b")),
            linking._char_jaccard_expr(
                normalize_surface(F.col("surface_a")),
                normalize_surface(F.col("surface_b")),
            ),
        ),
    ).withColumn("pred_same", F.col("score") >= 0.70)
    agg = scored.groupBy("same_entity", "pred_same").count().collect()
    c = {(r.same_entity, r.pred_same): r["count"] for r in agg}
    tp = c.get((True, True), 0)
    fp = c.get((False, True), 0)
    fn = c.get((True, False), 0)
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    assert precision >= 0.95, f"precision {precision:.3f} (fp={fp})"
    assert recall >= 0.95, f"recall {recall:.3f} (fn={fn})"


def test_blocking_recall_on_corpus(spark, smoke_pages):
    """Candidate generation must cover >=95% of true same-entity pairs
    actually co-occurring in the corpus mentions."""
    from pdfmef_spark.operators import extract, triples as triples_op

    ext = extract.extract_pages(smoke_pages)
    trip = triples_op.extract_triples(ext)
    mentions = triples_op.mentions_from_triples(trip)
    keys = linking.surface_keys(mentions)
    pairs = linking.candidate_pairs(keys)

    gold = store.read_golden(spark, 0.001, "golden_surfaces")
    gk = gold.select(
        "entity_key", normalize_surface(F.col("surface")).alias("norm")
    ).distinct()
    true_pairs = (
        gk.alias("x")
        .join(gk.alias("y"), (F.col("x.entity_key") == F.col("y.entity_key")) & (F.col("x.norm") < F.col("y.norm")))
        .select(F.col("x.norm").alias("a"), F.col("y.norm").alias("b"))
        .distinct()
    )
    n_true = true_pairs.count()
    covered = true_pairs.join(pairs.select("a", "b").distinct(), ["a", "b"], "left_semi").count()
    assert covered / max(n_true, 1) >= 0.95, f"blocking recall {covered}/{n_true}"


def test_end_to_end_linking_quality(spark, smoke_pages):
    """Cluster assignments vs golden entity keys: pairwise P/R >= 0.95."""
    from pdfmef_spark.operators import components, extract, triples as triples_op

    ext = extract.extract_pages(smoke_pages)
    trip = triples_op.extract_triples(ext)
    mentions = triples_op.mentions_from_triples(trip)
    keys = linking.surface_keys(mentions)
    links = linking.link_entities(mentions)
    assign = components.assign_components(keys, links)

    gold = store.read_golden(spark, 0.001, "golden_surfaces")
    gk = (
        gold.select("entity_key", normalize_surface(F.col("surface")).alias("norm"))
        .distinct()
        .join(assign.select("norm", "component").distinct(), "norm")
    )
    # pairwise over norms that share an entity_key (truth) vs share a component (pred)
    x, y = gk.alias("x"), gk.alias("y")
    joined = x.join(y, F.col("x.norm") < F.col("y.norm"))
    both = joined.select(
        (F.col("x.entity_key") == F.col("y.entity_key")).alias("truth"),
        (F.col("x.component") == F.col("y.component")).alias("pred"),
    )
    c = {(r.truth, r.pred): r["count"] for r in both.groupBy("truth", "pred").count().collect()}
    tp = c.get((True, True), 0)
    fp = c.get((False, True), 0)
    fn = c.get((True, False), 0)
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    assert precision >= 0.95, f"cluster precision {precision:.3f} (fp={fp})"
    assert recall >= 0.95, f"cluster recall {recall:.3f} (fn={fn})"


def test_cap_drop_counters_planted_hot_bucket(spark):
    """A planted hot last-token block (> TOKEN_BLOCK_CAP members) must be
    dropped AND counted — recall loss from capping is measured, never
    silent (VERDICT r02). A benign vocabulary drops (and counts) zero."""
    from pyspark.sql import Observation

    n_hot = linking.TOKEN_BLOCK_CAP + 44
    hot = spark.createDataFrame(
        [("ORG", f"acme{i:04d} corp") for i in range(n_hot)],
        "type string, surface string",
    )
    # threshold 0.0 keeps the output non-empty: AQE's empty-relation
    # propagation drops sub-root CollectMetrics rows on empty results
    obs = Observation("hot_caps")
    linking.link_entities(hot, 0.0, cap_obs=obs).count()
    m = {k: int(v) for k, v in dict(obs.get).items()}
    assert m["buckets_dropped"] >= 1
    assert m["members_dropped"] >= n_hot

    benign = spark.createDataFrame(
        [("ORG", f"acme{i:04d} corp{i:04d}") for i in range(50)],
        "type string, surface string",
    )
    obs2 = Observation("benign_caps")
    linking.link_entities(benign, 0.0, cap_obs=obs2).count()
    m2 = {k: int(v) for k, v in dict(obs2.get).items()}
    assert m2 == {"buckets_dropped": 0, "members_dropped": 0}


def test_prefilter_is_lossless(spark, smoke_pages):
    """The JVM score-upper-bound pre-filter must never drop a pair that the
    exact scorer would accept: links(with prefilter) == brute-force exact
    scoring of ALL candidate pairs, scores bit-identical."""
    from pdfmef_spark.operators import extract, triples as triples_op

    ext = extract.extract_pages(smoke_pages)
    trip = triples_op.extract_triples(ext)
    mentions = triples_op.mentions_from_triples(trip)
    keys = linking.surface_keys(mentions)
    pairs = linking.candidate_pairs(keys).persist()
    try:
        pdf = pairs.toPandas()
        brute = set()
        for t, x, y in zip(pdf["type"], pdf["a"], pdf["b"]):
            tok = linking._token_score(x, y)
            s = max(0.6 * tok + 0.4 * linking._char_jaccard(x, y), 0.8 * tok)
            if s >= 0.70:
                brute.add((t, x, y, s))
        got = {
            (r.type, r.src, r.dst, r.score)
            for r in linking.score_pairs(pairs, 0.70).collect()
        }
        assert got == brute, (
            f"prefilter dropped/changed pairs: only_brute={brute - got} "
            f"only_got={got - brute}"
        )
    finally:
        pairs.unpersist()


def test_char_jaccard_expr_matches_python(spark):
    """JVM shingle Jaccard must be bit-identical to _char_jaccard."""
    rows = [
        ("alan turing", "a turing"),
        ("acme corp", "acme corporation"),
        ("x", "x"),
        ("a", "b"),
        ("orbital logic", "orbital logic systems"),
    ]
    df = spark.createDataFrame(rows, "a string, b string").withColumn(
        "cj", linking._char_jaccard_expr(F.col("a"), F.col("b"))
    )
    for r in df.collect():
        assert r.cj == linking._char_jaccard(r.a, r.b), (r.a, r.b)
