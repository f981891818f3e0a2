"""Entity linking: normalization -> MinHash-LSH blocking -> pair scoring.

Generalizes the reference's implicit entity identity (pdfmef treats each
extracted surface form as-is; authors/affiliations are pipe-joined
strings, src/extractor/csxextract/extractors/tei.py:45-65) into explicit
alias resolution: "Alan Turing" / "A. Turing" / "Turing, Alan" must land
in one entity.

Scale design (the part that must survive 10^12 docs):
  * the quadratic surface x surface space is never materialized — only
    LSH-band buckets and last-token blocks generate candidates;
  * MinHash signatures are computed entirely JVM-side (shingles via
    sequence/transform, per-seed xxhash64 + array_min) — no Python;
  * hot buckets are frequency-capped (a stopword-ish token or a
    degenerate band would otherwise explode one reducer — the same hub
    problem pdfmef's `cites` edges have);
  * only the final pair scoring (token/initialism logic) is Python, as
    a vectorized Arrow batch over the (small) candidate-pair set.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from pdfmef_spark.functions import char_shingles, normalize_surface

N_HASHES = 64
N_BANDS = 16  # 16 bands x 4 rows
ROWS_PER_BAND = N_HASHES // N_BANDS
BUCKET_CAP = 64      # skip LSH buckets larger than this (hot-band guard)
TOKEN_BLOCK_CAP = 256  # skip last-token blocks larger than this


def surface_keys(mentions: DataFrame) -> DataFrame:
    """Distinct (type, surface) with mention counts and normalized key."""
    return (
        mentions.groupBy("type", "surface")
        .agg(F.count("*").alias("freq"))
        .withColumn("norm", normalize_surface(F.col("surface")))
        .filter(F.length("norm") > 0)
    )


def _band_hashes(shingle_col):
    """Array of N_BANDS band hashes from JVM-side MinHash signatures.

    One compact nested expression — hash index rides as a lambda
    variable into xxhash64(shingle, idx). (Unrolling 64 copies of
    array_min(transform(...)) makes Janino compile a huge generated
    class: ~15-20 s of fixed plan-compile latency per job.)
    """
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(N_HASHES - 1)),
        lambda i: F.array_min(F.transform(shingle_col, lambda s: F.xxhash64(s, i))),
    )

    def bands_of(sig_col):
        return F.transform(
            F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
            lambda b: F.xxhash64(
                *[
                    F.element_at(sig_col, b * ROWS_PER_BAND + r + 1)
                    for r in range(ROWS_PER_BAND)
                ]
            ),
        )

    return sig, bands_of


def _bucket_pairs_capped(keyed: DataFrame, cap_obs=None) -> DataFrame:
    """Generate (type, a, b) pairs across ALL blocking families with ONE
    shuffle: groupBy (type, bkey) -> sorted member list (capped) ->
    JVM-side pair expansion (transform x slice) -> explode.

    Pair expansion happens bucket-locally inside codegen and hot buckets
    are dropped by the cap before any pair materializes — the shape that
    survives 10^12-row inputs. The member cap depends on the bkey family
    prefix: LSH band buckets ("b:") cap at BUCKET_CAP, token / prefix
    blocks ("t:"/"p:") at TOKEN_BLOCK_CAP.

    `cap_obs` (a pyspark Observation) rides the same job and records how
    much the caps actually dropped — buckets_dropped / members_dropped —
    at zero extra passes. At test scale the caps drop nothing (oracles
    prove recall); at 100 TB hot buckets WILL be dropped, and recall
    loss must be a measured number in the run manifest, not an
    assumption (the reference hits the same hub problem silently on its
    `cites` edges, parscit.py:19-44).
    """
    grouped = keyed.groupBy("type", "bkey").agg(
        F.array_sort(F.collect_set("norm")).alias("members")
    )
    cap = F.when(
        F.col("bkey").startswith("b:"), F.lit(BUCKET_CAP)
    ).otherwise(F.lit(TOKEN_BLOCK_CAP))
    if cap_obs is not None:
        over = F.size("members") > cap
        grouped = grouped.observe(
            cap_obs,
            F.sum(F.when(over, 1).otherwise(0)).cast("long").alias("buckets_dropped"),
            F.sum(F.when(over, F.size("members")).otherwise(0)).cast("long").alias("members_dropped"),
        )
    small = grouped.filter(
        (F.size("members") >= 2) & (F.size("members") <= cap)
    )
    pairs = small.select(
        F.col("type"),
        F.explode(
            F.flatten(
                F.transform(
                    F.col("members"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("members"),
                            i + 2,
                            F.greatest(F.size("members") - i - 1, F.lit(0)),
                        ),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("p"),
    )
    return pairs.select("type", F.col("p.a").alias("a"), F.col("p.b").alias("b"))


def candidate_pairs(keys: DataFrame, cap_obs=None) -> DataFrame:
    """(type, a, b) candidate pairs, a < b, from LSH bands + last-token
    blocks + two-token-prefix blocks.

    All three blocking families are tagged into ONE keyed relation
    (type, bkey, norm) — "b:<band>:<hash>", "t:<token>", "p:<prefix>" —
    built by a SINGLE projection (array concat + one explode), so the
    whole candidate generation costs exactly three exchanges: the norms
    distinct, the (type, bkey) groupBy, and the final pair distinct.
    (The previous shape re-ran the norms-distinct subtree and a groupBy
    per family: 7 exchanges.) Per-family caps ride on the bkey prefix.
    """
    norms = keys.select("type", "norm").distinct()

    sig_expr, bands_of = _band_hashes(char_shingles(F.col("norm")))
    # sig materializes as a named column (stacked projection, no shuffle)
    # so the 64-hash signature expression is computed once per row, not
    # re-inlined into every element_at of every band hash
    signed = norms.withColumn("sig", sig_expr)
    band_keys = F.transform(
        bands_of(F.col("sig")),
        lambda bh, i: F.concat_ws(":", F.lit("b"), i, bh),
    )
    # last-token block: catches initialisms ("a turing" ~ "alan turing")
    # whose shingle overlap is too low for the LSH bands.
    tok = F.substring_index(F.col("norm"), " ", -1)
    tok_keys = F.when(
        F.length(tok) > 1, F.array(F.concat(F.lit("t:"), tok))
    ).otherwise(F.array().cast("array<string>"))
    # two-token-prefix block: catches truncation aliases
    # ("orbital logic" ~ "orbital logic systems") whose shingle Jaccard
    # (~0.5-0.65) is below the r=4 LSH collision knee.
    pre_keys = F.when(
        F.size(F.split(F.col("norm"), " ")) >= 2,
        F.array(F.concat(F.lit("p:"), F.substring_index(F.col("norm"), " ", 2))),
    ).otherwise(F.array().cast("array<string>"))

    keyed = signed.select(
        "type", "norm",
        F.explode(F.concat(band_keys, tok_keys, pre_keys)).alias("bkey"),
    )
    pairs = _bucket_pairs_capped(keyed, cap_obs=cap_obs)
    return pairs.distinct()


def _token_score(a: str, b: str) -> float:
    """Order-insensitive token alignment with initial matching."""
    ta, tb = a.split(), b.split()
    if not ta or not tb:
        return 0.0
    short, long_ = (ta, tb) if len(ta) <= len(tb) else (tb, ta)
    total = 0.0
    used: set[int] = set()
    for s in short:
        best, best_j = 0.0, -1
        for j, l in enumerate(long_):
            if j in used:
                continue
            if s == l:
                sc = 1.0
            elif len(s) == 1 and l.startswith(s):
                sc = 0.9
            elif len(l) == 1 and s.startswith(l):
                sc = 0.9
            elif len(s) >= 3 and len(l) >= 3 and (s.startswith(l) or l.startswith(s)):
                sc = 0.7
            else:
                sc = 0.0
            if sc > best:
                best, best_j = sc, j
        if best_j >= 0:
            used.add(best_j)
        total += best
    # penalize unmatched length difference mildly
    return total / (len(short) + 0.35 * (len(long_) - len(short)))


def _char_jaccard(a: str, b: str, k: int = 3) -> float:
    pa = f" {a} "
    pb = f" {b} "
    sa = {pa[i : i + k] for i in range(max(1, len(pa) - k + 1))}
    sb = {pb[i : i + k] for i in range(max(1, len(pb) - k + 1))}
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


@F.pandas_udf(T.DoubleType())
def pair_score_udf(a: pd.Series, b: pd.Series, cj: pd.Series) -> pd.Series:
    """Exact pair score given the (JVM-precomputed) char Jaccard ``cj``.

    Python computes ONLY the greedy token alignment; the shingle Jaccard
    arrives as a column (bit-identical to :func:`_char_jaccard` — same
    shingle set, same int/int division), so the Arrow batch never
    re-derives shingles the JVM already built for the LSH signatures.
    """
    out = []
    for x, y, c in zip(a, b, cj):
        tok = _token_score(x, y)
        blend = 0.6 * tok + 0.4 * c
        # initialism pairs ("b eich" ~ "brendan eich") have near-perfect
        # token alignment but poor shingle overlap — let a strong token
        # score carry the decision on its own.
        out.append(max(blend, 0.8 * tok))
    return pd.Series(out)


def _char_jaccard_expr(a, b):
    """JVM-side shingle Jaccard, bit-identical to :func:`_char_jaccard`:
    ``char_shingles`` builds the same padded distinct 3-gram set, and
    size/size division over identical ints yields the identical double."""
    sa, sb = char_shingles(a), char_shingles(b)
    return (
        F.size(F.array_intersect(sa, sb)).cast("double")
        / F.size(F.array_union(sa, sb)).cast("double")
    )


def _token_score_upper_expr(a, b):
    """JVM-side UPPER BOUND on :func:`_token_score` (codegen, no Python).

    The greedy alignment assigns each short-side token its best match
    among *unused* long-side tokens; dropping the used-set constraint
    (best over ALL long tokens, per short token) can only increase each
    per-token score, so the sum — and the length-normalized total — is
    a sound upper bound. Used to pre-filter candidate pairs before the
    Arrow scorer: a pair whose upper-bounded score misses the threshold
    can never pass, so Python scores only survivors.
    """
    ta, tb = F.split(a, " "), F.split(b, " ")
    na, nb = F.size(ta), F.size(tb)
    short = F.when(na <= nb, ta).otherwise(tb)
    long_ = F.when(na <= nb, tb).otherwise(ta)
    ns = F.least(na, nb).cast("double")
    nl = F.greatest(na, nb).cast("double")

    def best_for(s):
        return F.array_max(
            F.transform(
                long_,
                lambda l: F.when(s == l, F.lit(1.0))
                .when(
                    ((F.length(s) == 1) & l.startswith(s))
                    | ((F.length(l) == 1) & s.startswith(l)),
                    F.lit(0.9),
                )
                .when(
                    (F.length(s) >= 3)
                    & (F.length(l) >= 3)
                    & (s.startswith(l) | l.startswith(s)),
                    F.lit(0.7),
                )
                .otherwise(F.lit(0.0)),
            )
        )

    total = F.aggregate(
        F.transform(short, best_for), F.lit(0.0), lambda acc, x: acc + x
    )
    return total / (ns + 0.35 * (nl - ns))


def score_pairs(pairs: DataFrame, threshold: float = 0.70) -> DataFrame:
    """LINKS(type, src, dst, score): JVM pre-filter + Arrow-batched scoring.

    Two-stage: (1) a codegen'd upper bound on the final score —
    ``max(0.6*tok_ub + 0.4*cj, 0.8*tok_ub)`` with the EXACT char Jaccard
    and the no-used-set token bound — prunes pairs that cannot reach the
    threshold; (2) the Arrow scorer computes the exact greedy token
    alignment only for survivors, reusing the JVM Jaccard column. The
    output set and every score double are identical to scoring all
    pairs (the bound is sound), but the Python-side work drops to the
    survivor fraction.
    """
    cj = _char_jaccard_expr(F.col("a"), F.col("b"))
    tok_ub = _token_score_upper_expr(F.col("a"), F.col("b"))
    pre = pairs.withColumn("cj", cj).filter(
        F.greatest(0.6 * tok_ub + 0.4 * F.col("cj"), 0.8 * tok_ub) >= F.lit(threshold)
    )
    scored = pre.withColumn(
        "score", pair_score_udf(F.col("a"), F.col("b"), F.col("cj"))
    )
    return scored.filter(F.col("score") >= threshold).select(
        "type", F.col("a").alias("src"), F.col("b").alias("dst"), "score"
    )


def link_entities(
    mentions: DataFrame | None = None, threshold: float = 0.70, cap_obs=None,
    keys: DataFrame | None = None,
) -> DataFrame:
    """mentions -> LINKS over normalized surface keys (per type).

    Pass ``keys`` when the caller already holds (and persisted) the
    surface vocabulary: computing it is a full shuffle over the
    mentions table, and the pipeline needs the same vocabulary again
    for component assignment and graph materialization — recomputing
    it inside the links stage would pay that shuffle twice per run.
    (The incremental pipeline passes keys ONLY — its vocabulary is the
    sum of per-batch deltas, never a historical-mentions scan.)
    """
    if keys is None:
        if mentions is None:
            raise ValueError("link_entities needs mentions or keys")
        keys = surface_keys(mentions)
    return score_pairs(candidate_pairs(keys, cap_obs=cap_obs), threshold)
