"""Algorithm-block extraction (M9 analog).

The reference's AlgorithmsExtractor shells out to a jar+perl pipeline
that emits per-algorithm records — algoid, caption, and the reference
sentences elsewhere in the document that mention the algorithm
(src/extractor/csxextract/extractors/algorithms.py:17-46;
resources/algextract/perl/AlgoXmlGenerator.pl fields
algoid/caption/reftext) — gated behind AcademicPaperFilter.

Spark-first re-expression: definitions ("Algorithm N: caption") and
reference-mention counts are pure string/regex work, so the whole
operator is one whole-stage-codegen projection + explode — zero Python,
zero shuffle. The per-document jar timeout (20 s, algorithms.py:27)
maps to nothing: a regex projection cannot stall a task the way an
external process can.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEF_RE = r"^Algorithm ([0-9]+): "
_MENTION_RE = r"Algorithm ([0-9]+)"


def extract_algorithms(extracted: DataFrame, lang_gate: str | None = "en") -> DataFrame:
    """EXTRACTED -> ALGORITHMS(url, algo_id, caption, n_refs).

    A definition is a line "Algorithm N: <caption>"; n_refs counts the
    other mentions of "Algorithm N" in the same document (the reference's
    reftext sentences). Lang gate mirrors the AcademicPaperFilter
    dependency the reference declares.
    """
    src = extracted
    if lang_gate is not None and "lang" in src.columns:
        src = src.filter(F.col("lang") == lang_gate)
    if "error" in src.columns:
        src = src.filter(F.col("error").isNull())

    lines = F.split(F.col("text"), "\n")
    defs = F.filter(lines, lambda line: line.rlike(_DEF_RE))
    recs = F.transform(
        defs,
        lambda line: F.struct(
            F.regexp_extract(line, _DEF_RE, 1).cast("int").alias("algo_id"),
            F.regexp_replace(line, _DEF_RE, "").alias("caption"),
        ),
    )
    mention_ids = F.regexp_extract_all(F.col("text"), F.lit(_MENTION_RE), 1)
    exploded = src.select(
        "url", F.explode(recs).alias("r"), mention_ids.alias("ids")
    )
    return exploded.select(
        "url",
        F.col("r.algo_id").alias("algo_id"),
        F.col("r.caption").alias("caption"),
        (
            F.size(
                F.filter("ids", lambda x: x == F.col("r.algo_id").cast("string"))
            )
            - 1
        ).cast("int").alias("n_refs"),
    )
