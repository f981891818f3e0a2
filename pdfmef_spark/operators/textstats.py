"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

All JVM-side built-ins (no Python in the hot path), designed as the
quality/filter gates of a training-data pipeline — the web-scale
generalization of pdfmef's AcademicPaperFilter gate
(src/extractor/csxextract/filters.py:9-48): score every document
cheaply, filter before the expensive stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "with", "from", "that", "this", "for"],
    "de": ["der", "die", "das", "und", "mit", "für", "nicht"],
    "fr": ["le", "la", "les", "et", "pour", "avec", "dans"],
    "es": ["el", "la", "los", "y", "para", "con", "que"],
}


def lang_id(text_col: Column) -> Column:
    """Heuristic language id: CJK codepoint ratio, else stopword voting.

    Returns one of en/de/fr/es/zh/und. Pure built-ins: the token
    membership tests compile to array expressions in codegen.
    """
    cjk = F.length(F.regexp_replace(text_col, r"[^一-鿿]", ""))
    total = F.greatest(F.length(text_col), F.lit(1))
    toks = F.split(F.lower(text_col), r"\s+")
    votes = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in _LANG_MARKERS.items()
    }
    best = None
    for lang, v in votes.items():
        if best is None:
            best, best_lang = v, F.lit(lang)
        else:
            best_lang = F.when(v > best, F.lit(lang)).otherwise(best_lang)
            best = F.greatest(v, best)
    return (
        F.when((cjk / total) > 0.2, F.lit("zh"))
        .when(best >= 2, best_lang)
        .otherwise(F.lit("und"))
    )


def token_count(text_col: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text_col), r"\s+"))


def bpe_ish_token_count(text_col: Column) -> Column:
    """BPE-ish subword proxy: word-piece regex split (letters runs, digit
    runs, punctuation singles) — a deterministic stand-in for a real
    tokenizer's piece count."""
    return F.size(
        F.regexp_extract_all(text_col, F.lit(r"[A-Za-zÀ-ɏ]+|[0-9]+|[^\sA-Za-z0-9]"), 0)
    )


def quality_score(text_col: Column) -> Column:
    """[0,1] quality score from length / punctuation / stopword ratios
    (the C4/Gopher-style heuristics, closed-form in SQL).

    Components:
      len_ok:   1 if 200 <= chars <= 20000 (ramped below/above)
      punct:    sentence-terminator density sanity
      stop:     stopword ratio >= 0.05
      alpha:    alphabetic char ratio
    """
    chars = F.length(text_col).cast("double")
    len_ok = F.least(chars / 200.0, F.lit(1.0)) * F.least(F.lit(20000.0) / F.greatest(chars, F.lit(1.0)), F.lit(1.0))
    terms = F.length(F.regexp_replace(text_col, r"[^.!?]", "")).cast("double")
    toks = token_count(text_col).cast("double")
    punct = F.least(terms / F.greatest(toks / 30.0, F.lit(1.0)), F.lit(1.0))
    stops = F.size(
        F.array_intersect(
            F.split(F.lower(text_col), r"\s+"),
            F.array(*[F.lit(w) for w in _LANG_MARKERS["en"]]),
        )
    ).cast("double")
    stop_ratio = F.least(stops / F.greatest(toks * 0.02, F.lit(1.0)), F.lit(1.0))
    alpha = (
        F.length(F.regexp_replace(text_col, r"[^A-Za-zÀ-ɏ一-鿿]", "")).cast("double")
        / F.greatest(chars, F.lit(1.0))
    )
    return F.round((0.3 * len_ok + 0.2 * punct + 0.2 * stop_ratio + 0.3 * alpha), 6)


def rolling_fingerprint(text_col: Column, window: int = 8) -> Column:
    """Deterministic document fingerprint: min of xxhash64 over rolling
    token windows (a winnowing-style robust content id)."""
    toks = F.split(F.lower(text_col), r"\s+")
    n = F.greatest(F.size(toks) - (window - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n), lambda i: F.concat_ws(" ", F.slice(toks, i, window))
    )
    return F.array_min(F.transform(grams, lambda g: F.xxhash64(g)))


# stoplist for keyphrase candidates: the marker stopwords plus generic
# filler — shared with the SQL oracle via keyphrase_stoplist()
_KEYPHRASE_STOP = sorted(
    {w for ws in _LANG_MARKERS.values() for w in ws}
    | {"about", "shows", "study", "page", "results", "report", "data",
       "large", "small", "into", "over", "under", "between", "their",
       "there", "these", "those", "will", "would", "could", "should"}
)


def keyphrase_stoplist() -> list[str]:
    return list(_KEYPHRASE_STOP)


def keyphrases_topk(
    docs: DataFrame, k: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Top-k keyphrases per document (reference analog: per-document
    keyphrase extraction with KEYPHRASE_TOP_N=5, csxextract/config.py:25-28;
    the hulth/kea/ceke ranking models become a deterministic tf x length
    score — the operator SHAPE is the point: candidate generation,
    per-doc scoring, bounded top-k).

    Plan: explode tokens -> groupBy(doc, token) partial+final count ->
    per-doc window top-k. Shuffles on (doc, token) — fine at any scale
    (map-side combine absorbs repeats; the window partitions by doc so
    parallelism = document count)."""
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok")
    )
    cand = toks.filter(
        (F.length("tok") >= 4)
        & F.col("tok").rlike("^[a-z]+$")
        & ~F.col("tok").isin(*_KEYPHRASE_STOP)
    )
    counts = cand.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    scored = counts.withColumn("score", (F.col("tf") * F.length("tok")).cast("bigint"))
    w = W.partitionBy(id_col).orderBy(F.desc("score"), "tok")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, F.col("tok").alias("phrase"), "tf", "score", "rank")
    )


def document_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """All text stats as columns — one codegen'd projection, no shuffle."""
    c = F.col(text_col)
    return docs.withColumns(
        {
            "lang_pred": lang_id(c),
            "n_tokens": token_count(c),
            "n_pieces": bpe_ish_token_count(c),
            "quality": quality_score(c),
            "fingerprint": rolling_fingerprint(c),
        }
    )


def textrank_keyphrases(
    docs: DataFrame,
    k: int = 5,
    iterations: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Graph-based keyphrases: TextRank over per-document token
    co-occurrence (reference analog: the graph-ranked members of the
    keyphrase method family — hulth/kea/ceke, csxextract/config.py:25-28
    — beside the frequency-based :func:`keyphrases_topk`).

    Construction: candidate tokens (same filter + stoplist as the tf
    method), edges between CONSECUTIVE candidates (window=2, both
    directions, self-loops dropped), node key = doc_id || 0x1f || token
    so one global :func:`~pdfmef_spark.operators.pagerank.pagerank` call
    ranks every document's graph at once — per-doc ordering is unaffected
    by the global normalization (the (1-d)/N and dangling terms are
    uniform additive constants across nodes). Top-k per doc by (pr desc,
    token): pr doubles are bit-identical cross-engine under pagerank's
    rounding contract, so the selection hash-oracles exactly.

    Scale: candidate/pair generation is per-doc map work (one array
    filter + one adjacent-pair transform); the composite node key keeps
    the graph a single edge relation — shuffles are pagerank's own
    keyed joins, parallelism = tokens x docs, no per-doc driver loop.
    """
    from pdfmef_spark.operators.pagerank import pagerank

    sep = "\x1f"
    arr = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: (F.length(t) >= 4)
        & t.rlike("^[a-z]+$")
        & ~t.isin(*_KEYPHRASE_STOP),
    )
    d = docs.select(F.col(id_col).cast("string").alias("doc"), arr.alias("toks"))
    pairs = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.struct(
                F.element_at(F.col("toks"), i).alias("a"),
                F.element_at(F.col("toks"), i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    e = (
        d.select("doc", F.explode(pairs).alias("p"))
        .filter(F.col("p.a") != F.col("p.b"))
        .select(
            F.concat_ws(sep, F.col("doc"), F.col("p.a")).alias("src"),
            F.concat_ws(sep, F.col("doc"), F.col("p.b")).alias("dst"),
        )
    )
    bidir = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank(bidir, iterations=iterations)
    parsed = ranks.select(
        F.substring_index("node", sep, 1).cast("long").alias(id_col),
        F.substring_index("node", sep, -1).alias("phrase"),
        "pr",
    )
    w = W.partitionBy(id_col).orderBy(F.desc("pr"), "phrase")
    return (
        parsed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "phrase", "pr", "rank")
    )
