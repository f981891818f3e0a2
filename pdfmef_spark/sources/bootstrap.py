"""Spark-free corpus materializer for the DuckDB oracle side.

The driver's correctness gate runs each Spark query AND its DuckDB
oracle; the kg_* oracles `read_parquet()` the materialized corpus /
golden tables. Whichever side runs first must find the files, so this
module can build the exact same cache with pyarrow only — every row is
the same pure function `corpus.gen_page(i, n)` the distributed
generator maps, and the url-hash bucket column uses the pure-Python
XXH64 (bit-compatible with Spark's `xxhash64`, pinned by test).

Protocol matches sources/store.py: same directory layout, same
versioned `_COMPLETE` marker — each side skips work the other did.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from pdfmef_spark import corpus
from pdfmef_spark.functions.xxh64 import xxh64_signed

_PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("sha256_text", pa.string()),
        ("bucket", pa.int32()),
    ]
)

_TRIPLES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("subj_type", pa.string()),
        ("obj_type", pa.string()),
        ("span_start", pa.int32()),
        ("span_end", pa.int32()),
    ]
)

_SURFACES_SCHEMA = pa.schema(
    [("url", pa.string()), ("surface", pa.string()), ("entity_key", pa.string())]
)

_ENTITIES_SCHEMA = pa.schema(
    [
        ("entity_key", pa.string()),
        ("canonical", pa.string()),
        ("type", pa.string()),
        ("aliases", pa.list_(pa.string())),
    ]
)

_LINKS_SCHEMA = pa.schema(
    [("surface_a", pa.string()), ("surface_b", pa.string()), ("same_entity", pa.bool_())]
)

_ALGOS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("algo_id", pa.int32()),
        ("caption", pa.string()),
        ("n_refs", pa.int32()),
    ]
)


def _write(out: str, name: str, table: pa.Table, row_group_size: int) -> None:
    d = f"{out}/{name}"
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        table, f"{d}/part-00000.parquet", row_group_size=row_group_size,
        compression="zstd",
    )


def ensure_corpus(sf: float, cache_dir: str | None = None) -> str:
    """Materialize the sf corpus without Spark (idempotent, versioned)."""
    from pdfmef_spark.sources import store

    cache_dir = cache_dir or store.DEFAULT_CACHE
    out = store.corpus_dir(sf, cache_dir)
    marker = f"{out}/_COMPLETE"
    if store._marker_current(marker):
        return out
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)

    n = corpus.n_pages_for_sf(sf)
    pages: dict[str, list] = {k: [] for k in _PAGES_SCHEMA.names}
    triples: list[dict] = []
    surfaces: list[dict] = []
    algos: list[dict] = []
    for i in range(n):
        r = corpus.gen_page(i, n)
        for k in ("url", "warc_ts", "html", "text", "lang", "sha256_text"):
            pages[k].append(r[k])
        pages["bucket"].append(xxh64_signed(r["url"].encode()) % store.N_BUCKETS)
        triples.extend(r["triples"])
        surfaces.extend(
            {"url": r["url"], "surface": s, "entity_key": k} for s, k in r["used"]
        )
        algos.extend(r["algorithms"])

    rg = max(256, n // 32)  # row groups sized so a Spark scan parallelizes
    _write(out, "pages", pa.Table.from_pydict(pages, schema=_PAGES_SCHEMA), rg)
    _write(
        out, "golden_triples",
        pa.Table.from_pylist(triples, schema=_TRIPLES_SCHEMA), max(1024, len(triples) // 32),
    )
    _write(
        out, "golden_surfaces",
        pa.Table.from_pylist(surfaces, schema=_SURFACES_SCHEMA), max(1024, len(surfaces) // 32),
    )
    ents = [
        dict(zip(("entity_key", "canonical", "type", "aliases"), row))
        for row in corpus.golden_entity_rows()
    ]
    _write(out, "golden_entities", pa.Table.from_pylist(ents, schema=_ENTITIES_SCHEMA), 4096)
    links = [
        dict(zip(("surface_a", "surface_b", "same_entity"), row))
        for row in corpus.golden_link_rows()
    ]
    _write(out, "golden_links", pa.Table.from_pylist(links, schema=_LINKS_SCHEMA), 4096)
    _write(out, "golden_algorithms", pa.Table.from_pylist(algos, schema=_ALGOS_SCHEMA), 4096)
    with open(marker, "w") as fh:
        fh.write(f"v={store.CORPUS_VERSION} n={n}\n")
    return out
