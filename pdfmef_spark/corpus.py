"""Deterministic synthetic Common-Crawl-style corpus + golden truth.

Generates the ``pages(url, warc_ts, html, text, lang)`` input table
(shape fixed by BASELINE.json input_hint) and the golden oracle tables
(``golden_triples``, ``golden_text_hashes``, ``golden_entities``,
``golden_links``) that the pipeline is graded against.

Everything is a pure function of (SEED, row index i, corpus size n):
generation is distributed via ``spark.range(n).mapInPandas`` and the
result is byte-identical at any parallelism — which is also what makes
the extract stage's byte-identity contract testable (reference analog:
per-file sha1 conversion checksums, bin/processCrawls.pl:159-170).

The planted content generalizes the reference's entity model
(SURVEY.md §1.3): titles/authors/affiliations/keywords/citations
(reference: src/extractor/csxextract/extractors/tei.py:31-92,
parscit.py:19-44) become (subj, pred, obj) relation sentences over
PERSON/ORG/PLACE/TERM/DOC entities.
"""

from __future__ import annotations

import hashlib
import html as html_mod
import random
from datetime import datetime, timedelta, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

SEED = 42

# ---------------------------------------------------------------------------
# Entity pools (built once, deterministically; identical on every executor)
# ---------------------------------------------------------------------------

_FIRST = [
    "Alan", "Grace", "Ada", "Edsger", "Barbara", "Donald", "John", "Maria",
    "Claude", "Leslie", "Tim", "Radia", "Vint", "Frances", "Niklaus", "Tony",
    "Robin", "Edgar", "Jim", "Butler", "Ken", "Dennis", "Bjarne", "Guido",
    "Yukihiro", "Anders", "Brendan", "Rasmus", "Linus", "Margaret", "Katherine",
    "Dorothy", "Mary", "Evelyn", "Annie", "Gladys", "Melba", "Ruth", "Ida",
    "Karen",
]
_LAST = [
    "Turing", "Hopper", "Lovelace", "Dijkstra", "Liskov", "Knuth", "McCarthy",
    "Mayer", "Shannon", "Lamport", "Berners-Lee", "Perlman", "Cerf", "Allen",
    "Wirth", "Hoare", "Milner", "Codd", "Gray", "Lampson", "Thompson",
    "Ritchie", "Stroustrup", "Rossum", "Matsumoto", "Hejlsberg", "Eich",
    "Lerdorf", "Torvalds", "Hamilton", "Johnson", "Vaughan", "Jackson",
    "Boyd", "Easley", "West", "Roy", "Mouton", "Barnes", "Spärck",
]
_ORG_A = [
    "Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne", "Cyberdyne",
    "Tyrell", "Aperture", "BlackMesa", "Hooli", "PiedPiper", "Vandelay",
    "Wonka", "Oscorp", "Massive", "Soylent", "Gringotts", "Monarch",
    "Zenith", "Orbital", "Quantum", "Vertex", "Nimbus", "Cascade",
    "Silverline", "Ironwood", "Bluepeak", "Redwood", "Starlight",
]
_ORG_B = [
    "Data", "Cloud", "Web", "Graph", "Search", "Crawl", "Index", "Vector",
    "Stream", "Batch", "Query", "Table", "Shard", "Cache", "Lake",
    "Mesh", "Edge", "Core", "Signal", "Logic", "Neural", "Crypto",
    "Fusion", "Matrix", "Pixel",
]
_ORG_SUFFIX = ["Labs", "Institute", "University", "Corp", "Group", "Systems"]
_PLACES = [
    "London", "Cambridge", "Zurich", "Amsterdam", "Helsinki", "Kyoto",
    "Toronto", "Bangalore", "Nairobi", "Lisbon", "Oslo", "Prague",
    "Santiago", "Austin", "Seattle", "Dublin", "Vienna", "Seoul",
    "Singapore", "Stockholm", "Reykjavik", "Montreal", "Geneva", "Taipei",
    "Wellington", "Vancouver", "Boston", "Edinburgh", "Munich", "Lyon",
    "Porto", "Bergen", "Gdansk", "Brno", "Graz", "Leiden", "Uppsala",
    "Aarhus", "Tampere", "Ghent", "Bologna", "Pisa", "Heidelberg",
    "Tsukuba", "Hsinchu", "Daejeon", "Rehovot", "Haifa",
]
_TERMS = [
    "dataflow", "sharding", "indexing", "crawling", "ranking", "caching",
    "hashing", "parsing", "sketching", "sampling", "joins", "shuffles",
    "lineage", "checkpoints", "watermarks", "partitions", "encodings",
    "compression", "vectorization", "codegen", "optimizers", "planners",
    "catalogs", "manifests", "snapshots", "compaction", "clustering",
    "bucketing", "salting", "skew", "broadcast", "spill", "predicate",
    "pruning", "statistics", "cardinality", "selectivity", "tokenization",
    "stemming", "embeddings", "similarity", "deduplication", "canonicalization",
    "provenance", "observability", "orchestration", "scheduling", "retries",
    "idempotency", "backpressure", "batching", "pipelining", "streaming",
    "windowing", "aggregation", "materialization", "serialization",
    "quantization", "annealing", "regularization", "convergence",
    "normalization", "federation", "replication",
]
_DE_WORDS = ("der die das und mit für über unter immer wieder zwischen "
             "arbeit wissen schnell daten netz seite bericht forschung").split()
_FR_WORDS = ("le la les et pour avec dans sur toujours entre travail "
             "savoir vite données réseau page rapport recherche").split()
_ZH_WORDS = "数据 网络 页面 报告 研究 工作 知识 快速 系统 查询 索引 分析".split()
_FILLER = ("the a with from into over about results analysis report shows "
           "study page web new large scale open model data system method "
           "approach design review summary notes update detail").split()


def _build_pools():
    rng = random.Random(f"{SEED}-pools")
    persons, seen_init = [], set()
    while len(persons) < 240:
        f, l = rng.choice(_FIRST), rng.choice(_LAST)
        if (f, l) in seen_init or (f[0], l) in seen_init:
            continue
        seen_init.add((f, l))
        seen_init.add((f[0], l))
        canonical = f"{f} {l}"
        aliases = [canonical, f"{f[0]}. {l}", f"{l}, {f}"]
        persons.append({
            "entity_key": f"person:{len(persons)}", "canonical": canonical,
            "type": "PERSON", "aliases": aliases,
        })
    orgs, seen_ab = [], set()
    # index 0 is the HUB entity: mentioned on ~10% of all pages (skew axis).
    hub = {
        "entity_key": "org:0", "canonical": "Global Web Consortium",
        "type": "ORG",
        "aliases": ["Global Web Consortium", "Global Web", "The Global Web Consortium"],
    }
    orgs.append(hub)
    while len(orgs) < 100:
        a, b = rng.choice(_ORG_A), rng.choice(_ORG_B)
        if (a, b) in seen_ab:
            continue
        seen_ab.add((a, b))
        suffix = rng.choice(_ORG_SUFFIX)
        # A couple of '&'-bearing names exercise the escape/unescape contract
        # (reference analog: double-unescape, csxextract/utils.py:4-11).
        if len(orgs) % 17 == 3:
            full = f"{a} & {b} {suffix}"
            aliases = [full, f"{a} & {b}", f"The {a} & {b} {suffix}"]
        else:
            full = f"{a} {b} {suffix}"
            aliases = [full, f"{a} {b}", f"The {a} {b} {suffix}"]
        orgs.append({
            "entity_key": f"org:{len(orgs)}", "canonical": full,
            "type": "ORG", "aliases": aliases,
        })
    places = [
        {"entity_key": f"place:{i}", "canonical": p, "type": "PLACE", "aliases": [p]}
        for i, p in enumerate(_PLACES)
    ]
    terms = [
        {"entity_key": f"term:{i}", "canonical": t, "type": "TERM", "aliases": [t]}
        for i, t in enumerate(_TERMS)
    ]
    return persons, orgs, places, terms


PERSONS, ORGS, PLACES, TERMS = _build_pools()
HUB_ORG = ORGS[0]

_BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)


def n_pages_for_sf(sf: float) -> int:
    return max(10, int(round(500_000 * sf)))


def _domain(j: int, n: int) -> str:
    """Domain for page j. Domain 0 is the hub domain (~10% of urls)."""
    n_dom = max(5, int(0.02 * n))
    rng = random.Random(f"{SEED}-domain-{j}")
    if rng.random() < 0.10:
        d = 0
    else:
        d = 1 + int((n_dom - 1) * (rng.random() ** 2))  # skewed toward low ranks
    return f"site{d:04d}.example.org"


def url_for(j: int, n: int) -> str:
    return f"https://{_domain(j, n)}/articles/{j:08d}"


# ---------------------------------------------------------------------------
# Sentence builders. Each returns (sentence_text, triples) where each triple
# is (subj, pred, obj, subj_type, obj_type, subj_off, subj_len) with
# subj_off relative to sentence start.
# ---------------------------------------------------------------------------

def _alias(rng: random.Random, ent: dict) -> str:
    return rng.choice(ent["aliases"])


def _sent_works_for(rng, used):
    p, o = rng.choice(PERSONS), rng.choice(ORGS[1:])
    pa, oa = _alias(rng, p), _alias(rng, o)
    used.append((pa, p)); used.append((oa, o))
    return f"{pa} works for {oa}.", [(pa, "worksFor", oa, "PERSON", "ORG", 0, len(pa))]


def _sent_located_in(rng, used, org=None):
    o = org or rng.choice(ORGS[1:])
    pl = rng.choice(PLACES)
    oa = _alias(rng, o)
    used.append((oa, o)); used.append((pl["canonical"], pl))
    return (f"{oa} is located in {pl['canonical']}.",
            [(oa, "locatedIn", pl["canonical"], "ORG", "PLACE", 0, len(oa))])


def _sent_founded_by(rng, used, org=None):
    o = org or rng.choice(ORGS[1:])
    p = rng.choice(PERSONS)
    oa, pa = _alias(rng, o), _alias(rng, p)
    used.append((oa, o)); used.append((pa, p))
    return (f"{oa} was founded by {pa}.",
            [(oa, "foundedBy", pa, "ORG", "PERSON", 0, len(oa))])


def _sent_affiliated(rng, used, org=None):
    p = rng.choice(PERSONS)
    o = org or rng.choice(ORGS[1:])
    pa, oa = _alias(rng, p), _alias(rng, o)
    used.append((pa, p)); used.append((oa, o))
    return (f"{pa} is affiliated with {oa}.",
            [(pa, "affiliatedWith", oa, "PERSON", "ORG", 0, len(pa))])


def _sent_distractor(rng, _used):
    k = rng.randint(6, 12)
    words = [rng.choice(_FILLER) for _ in range(k)]
    s = " ".join(words)
    return s[0].upper() + s[1:] + ".", []


def _sent_cjk(rng, _used):
    words = [rng.choice(_ZH_WORDS) for _ in range(rng.randint(4, 8))]
    return "".join(words) + " ✨\U0001f310.", []


_REL_BUILDERS = [_sent_works_for, _sent_located_in, _sent_founded_by, _sent_affiliated]


def _foreign_sentence(rng, lang):
    pool = {"de": _DE_WORDS, "fr": _FR_WORDS, "zh": _ZH_WORDS}.get(lang)
    if pool is None:
        return " ".join("~#*" for _ in range(rng.randint(3, 6))) + "."
    sep = "" if lang == "zh" else " "
    s = sep.join(rng.choice(pool) for _ in range(rng.randint(6, 10)))
    return (s if lang == "zh" else s[0].upper() + s[1:]) + "."


# ---------------------------------------------------------------------------
# Page content: pure function of (i, n)
# ---------------------------------------------------------------------------

def _page_content(i: int, n: int) -> dict:
    """Normal (non-special-cased) content for page i.

    Returns dict with: lang, title, blocks (list of block dicts), where each
    block dict has 'text', 'triples' [(s,p,o,st,ot,off,len) abs-in-block],
    'anchors' [(anchor_text, href)] for html rendering.
    """
    rng = random.Random(f"{SEED}-content-{i}")
    lang = "en" if rng.random() < 0.90 else rng.choice(["de", "fr", "zh", "und"])

    t1, t2 = rng.choice(TERMS), rng.choice(TERMS)
    title = f"Notes on {t1['canonical']} and {t2['canonical']}"
    used: list = []
    blocks: list[dict] = []
    blocks.append({"text": title, "triples": [
        ("__URL__", "hasTitle", title, "DOC", "TERM", 0, len(title))], "anchors": []})

    if lang != "en":
        # Non-en pages carry no golden truth: the pipeline's language gate
        # excludes them (reference analog: AcademicPaperFilter rejection).
        blocks[0]["triples"] = []
        for _ in range(rng.randint(2, 4)):
            sents = [_foreign_sentence(rng, lang) for _ in range(rng.randint(1, 3))]
            blocks.append({"text": " ".join(sents), "triples": [], "anchors": []})
        return {"lang": lang, "title": title, "blocks": blocks, "used": [],
                "algorithms": []}

    # byline -> hasAuthor
    authors = rng.sample(PERSONS, rng.randint(1, 2))
    names = [_alias(rng, a) for a in authors]
    for al, a in zip(names, authors):
        used.append((al, a))
    byline = "By " + " and ".join(names)
    btrips, off = [], 3
    for al in names:
        btrips.append(("__URL__", "hasAuthor", al, "DOC", "PERSON", off, len(al)))
        off += len(al) + len(" and ")
    blocks.append({"text": byline, "triples": btrips, "anchors": []})

    # abstract -> hasAbstract (reference header entity: tei.py:81-92 strips
    # the heading and double-unescapes the body; here the heading is the
    # "Abstract: " prefix and ~1/13 bodies carry a literal entity escape
    # ("R&amp;D" in text -> "R&D" in the golden object) to pin the
    # second-unescape contract).
    abs_body = " ".join(
        _sent_distractor(rng, used)[0] for _ in range(rng.randint(1, 2))
    )
    if i % 13 == 4:
        abs_body = abs_body[:-1] + " at the R&amp;D group."
    abs_block = "Abstract: " + abs_body
    blocks.append({"text": abs_block, "triples": [
        ("__URL__", "hasAbstract", html_mod.unescape(abs_body), "DOC", "TERM",
         len("Abstract: "), len(abs_body))], "anchors": []})

    hub_here = rng.random() < 0.10  # hub entity on ~10% of pages
    n_paras = rng.randint(2, 4)
    for pi in range(n_paras):
        sents, trips, anchors = [], [], []
        cursor = 0
        n_sent = rng.randint(1, 3)
        for si in range(n_sent):
            r = rng.random()
            if hub_here and pi == 0 and si == 0:
                builder = rng.choice([_sent_located_in, _sent_founded_by, _sent_affiliated])
                s, ts = builder(rng, used, org=HUB_ORG)
            elif r < 0.55:
                s, ts = rng.choice(_REL_BUILDERS)(rng, used)
            elif r < 0.65 and i % 53 == 5:
                s, ts = _sent_cjk(rng, used)
            elif r < 0.80:
                # citation sentence with an in-content anchor -> cites edge
                j = (i + 1 + rng.randrange(max(1, n - 1))) % n
                href = url_for(j, n)
                anchor_text = f"the site{j % 97:04d} report"
                s = f"See {anchor_text} for details."
                ts = [("__URL__", "cites", href, "DOC", "DOC", 4, len(anchor_text))]
                anchors.append((anchor_text, href))
            else:
                s, ts = _sent_distractor(rng, used)
            if sents:
                cursor += 1  # the joining space
            for (su, pr, ob, st, ot, o_, l_) in ts:
                trips.append((su, pr, ob, st, ot, cursor + o_, l_))
            sents.append(s)
            cursor += len(s)
        blocks.append({"text": " ".join(sents), "triples": trips, "anchors": anchors})

    # figures -> M8 analog truth (reference: per-doc figure entities with
    # captions, csxextract/extractors/figures2.py:39-52). Dedicated rng
    # stream so planting does not shift existing draws. Three planted
    # shapes: <figure> with <figcaption> (caption also becomes a text
    # block), a caption-less <figure> whose <img alt> is the caption
    # (no text block — alt is an attribute), and a standalone in-paragraph
    # <img alt> (no text block).
    frng = random.Random(f"{SEED}-fig-{i}")
    if frng.random() < 0.25:
        for k in range(1, frng.randint(1, 2) + 1):
            t = frng.choice(TERMS)["canonical"]
            u = frng.choice(TERMS)["canonical"]
            caption = f"Figure {k}: {frng.choice(['throughput', 'latency', 'coverage', 'accuracy'])} of {t} versus {u}"
            shape = frng.random()
            if shape < 0.60:
                blocks.append({
                    "text": caption, "triples": [
                        ("__URL__", "hasFigure", caption, "DOC", "TERM",
                         0, len(caption))],
                    "anchors": [],
                    "html": (
                        f'<figure><img src="/img/f{k}.png" alt="fig {k}">'
                        f"<figcaption>{html_mod.escape(caption)}</figcaption></figure>"
                    ),
                })
            elif shape < 0.85:
                blocks.append({
                    "text": "", "triples": [
                        ("__URL__", "hasFigure", caption, "DOC", "TERM", 0, 0)],
                    "anchors": [],
                    "html": (
                        f'<figure><img src="/img/f{k}.png" '
                        f'alt="{html_mod.escape(caption)}"></figure>'
                    ),
                })
            else:
                lead = f"The chart on {t} is shown inline."
                blocks.append({
                    "text": lead, "triples": [
                        ("__URL__", "hasFigure", caption, "DOC", "TERM", 0, 0)],
                    "anchors": [],
                    "html": (
                        f"<p>{html_mod.escape(lead)} "
                        f'<img src="/img/s{k}.png" alt="{html_mod.escape(caption)}"></p>'
                    ),
                })

    # multi-unit ordered affiliation -> the reference's orgName comparator
    # truth (tei.py:124-143: institution > department > laboratory,
    # pipe-joined). Units appear in a shuffled sentence order; the golden
    # affiliationString is the rank-ordered pipe-join and the golden
    # affiliatedWith object is the institution unit.
    xrng = random.Random(f"{SEED}-affil-{i}")
    if xrng.random() < 0.15:
        person = xrng.choice(PERSONS)
        pa = xrng.choice(person["aliases"])
        inst = xrng.choice(ORGS[1:])
        ia = xrng.choice(inst["aliases"][:2])  # no "The ..." alias in a list
        dept = f"{xrng.choice(TERMS)['canonical'].title()} Department"
        lab = f"{xrng.choice(TERMS)['canonical'].title()} Laboratory"
        shuffled = [ia, f"the {dept}", f"the {lab}"]
        xrng.shuffle(shuffled)
        sent = f"{pa} is affiliated with {shuffled[0]}, {shuffled[1]}, and {shuffled[2]}."
        used.append((pa, person))
        used.append((ia, inst))
        blocks.append({
            "text": sent,
            "triples": [
                (pa, "affiliatedWith", ia, "PERSON", "ORG", 0, len(pa)),
                (pa, "affiliationString", f"{ia} | {dept} | {lab}",
                 "PERSON", "TERM", 0, len(pa)),
            ],
            "anchors": [],
        })

    # algorithm section -> M9 analog truth (reference: AlgorithmsExtractor
    # emits algoid/caption plus reference sentences elsewhere in the doc,
    # csxextract/extractors/algorithms.py:17-46 + AlgoXmlGenerator.pl).
    # Dedicated rng stream so planting does not shift existing draws.
    algos: list[dict] = []
    arng = random.Random(f"{SEED}-algo-{i}")
    if arng.random() < 0.30:
        for k in sorted(arng.sample([1, 2, 3], arng.randint(1, 2))):
            verb = arng.choice(["merging", "splitting", "ranking", "pruning"])
            topic = arng.choice(TERMS)["canonical"]
            caption = f"A {verb} procedure for {topic}."
            blocks.append({"text": f"Algorithm {k}: {caption}",
                           "triples": [], "anchors": []})
            n_refs = arng.randint(0, 2)
            for _ in range(n_refs):
                step = arng.choice(_TERMS)
                blocks.append({
                    "text": f"As shown in Algorithm {k}, the {step} step dominates.",
                    "triples": [], "anchors": [],
                })
            algos.append({"algo_id": k, "caption": caption, "n_refs": n_refs})

    tags = rng.sample(TERMS, rng.randint(2, 4))
    tag_line = "Tags: " + ", ".join(t["canonical"] for t in tags)
    ttrips, off = [], len("Tags: ")
    for t in tags:
        ttrips.append(("__URL__", "hasKeyword", t["canonical"], "DOC", "TERM", off, len(t["canonical"])))
        off += len(t["canonical"]) + 2
        used.append((t["canonical"], t))
    blocks.append({"text": tag_line, "triples": ttrips, "anchors": []})
    return {"lang": lang, "title": title, "blocks": blocks, "used": used,
            "algorithms": algos}


def _render_html(i: int, n: int, content: dict, empty: bool, boiler_only: bool) -> str:
    rng = random.Random(f"{SEED}-html-{i}")
    esc = lambda s: html_mod.escape(s)  # noqa: E731
    dom = _domain(i, n)
    nav_items = " | ".join(
        f'<a href="/{p}">{p.capitalize()}</a>'
        for p in rng.sample(["home", "news", "about", "archive", "contact", "topics"], rng.randint(3, 5))
    )
    head = (
        "<!DOCTYPE html>\n<html><head><meta charset=\"utf-8\">"
        f"<title>{esc(content['title'])}</title>"
        "<style>body{margin:0;font-family:serif}.ad{color:#999}</style>"
        f"<script>var pageId={i};function track(){{console.log('{rng.randrange(10 ** 6)}');}}</script>"
        "</head>\n<body>\n"
        f"<header><nav>{nav_items}</nav></header>\n"
    )
    aside = f"<aside class=\"ad\">Advertisement {rng.randrange(1000)} — subscribe today!</aside>\n"
    footer = f"<footer>&copy; 2026 {esc(dom)} · All rights reserved</footer>\n</body></html>"

    if boiler_only:
        return head + aside + footer
    if empty:
        return head + "<main><article></article></main>\n" + aside + footer

    parts = ["<main><article>\n"]
    for bi, block in enumerate(content["blocks"]):
        if "html" in block:
            # pre-rendered markup (figure / inline-img blocks)
            parts.append(block["html"] + "\n")
            continue
        tag = "h1" if bi == 0 else "p"
        cls = ' class="byline"' if bi == 1 and content["lang"] == "en" else ""
        btext = block["text"]
        # render anchors: replace each anchor_text occurrence with <a> markup
        rendered = esc(btext)
        for (atext, href) in block["anchors"]:
            rendered = rendered.replace(esc(atext), f'<a href="{esc(href)}">{esc(atext)}</a>', 1)
        parts.append(f"<{tag}{cls}>{rendered}</{tag}>\n")
    parts.append("</article></main>\n")
    return head + "".join(parts) + aside + footer


def gen_page(i: int, n: int) -> dict:
    """Full deterministic record for page i: pages row + golden rows."""
    url = url_for(i, n)
    empty = i % 211 == 7
    boiler_only = i % 211 == 8
    dup_of = i - 1 if (i % 97 == 13 and i > 0) else None

    content = _page_content(dup_of if dup_of is not None else i, n)
    if empty or boiler_only:
        text = ""
        triples: list = []
        used: list = []
        title = content["title"]
        lang = content["lang"]
    else:
        blocks = content["blocks"]
        # empty-text blocks (caption-less figures, inline imgs) contribute
        # triples but no text line — the extractor drops empty blocks, so
        # the golden text must skip them too (byte-identity contract)
        text = "\n".join(b["text"] for b in blocks if b["text"])
        title, lang, used = content["title"], content["lang"], content["used"]
        triples = []
        off = 0
        for b in blocks:
            for (su, pr, ob, st, ot, o_, l_) in b["triples"]:
                su = url if su == "__URL__" else su
                triples.append({
                    "url": url, "subj": su, "pred": pr, "obj": ob,
                    "subj_type": st, "obj_type": ot,
                    "span_start": off + o_, "span_end": off + o_ + l_,
                })
            if b["text"]:
                off += len(b["text"]) + 1

    html = _render_html(i, n, content, empty, boiler_only)
    ts = _BASE_TS + timedelta(seconds=i * (30 * 86400 / max(n, 1)))
    return {
        "url": url,
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
        "sha256_text": hashlib.sha256(text.encode("utf-8")).hexdigest(),
        "triples": triples,
        "used": [(surface, ent["entity_key"]) for surface, ent in used],
        "algorithms": [] if (empty or boiler_only) else [
            {"url": url, **a} for a in content["algorithms"]
        ],
    }


# ---------------------------------------------------------------------------
# Distributed generation
# ---------------------------------------------------------------------------

_PAGES_GEN_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("sha256_text", T.StringType(), False),
    ]
)

_GOLDEN_TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("subj_type", T.StringType(), False),
        T.StructField("obj_type", T.StringType(), False),
        T.StructField("span_start", T.IntegerType(), False),
        T.StructField("span_end", T.IntegerType(), False),
    ]
)

_GOLDEN_SURFACES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("surface", T.StringType(), False),
        T.StructField("entity_key", T.StringType(), False),
    ]
)


def pages_df(spark: SparkSession, n: int, parallelism: int | None = None) -> DataFrame:
    parallelism = parallelism or max(8, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [gen_page(int(i), n) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "url": [r["url"] for r in rows],
                    "warc_ts": [r["warc_ts"] for r in rows],
                    "html": [r["html"] for r in rows],
                    "text": [r["text"] for r in rows],
                    "lang": [r["lang"] for r in rows],
                    "sha256_text": [r["sha256_text"] for r in rows],
                }
            )

    return (
        spark.range(n, numPartitions=parallelism)
        .mapInPandas(gen, schema=_PAGES_GEN_SCHEMA)
    )


def golden_triples_df(spark: SparkSession, n: int, parallelism: int | None = None) -> DataFrame:
    parallelism = parallelism or max(8, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for i in pdf["id"]:
                out.extend(gen_page(int(i), n)["triples"])
            yield pd.DataFrame(out, columns=[f.name for f in _GOLDEN_TRIPLES_SCHEMA])

    return spark.range(n, numPartitions=parallelism).mapInPandas(gen, schema=_GOLDEN_TRIPLES_SCHEMA)


def golden_surfaces_df(spark: SparkSession, n: int, parallelism: int | None = None) -> DataFrame:
    """(url, surface, entity_key) for every entity mention planted — the
    linking/canonicalization truth."""
    parallelism = parallelism or max(8, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i in pdf["id"]:
                r = gen_page(int(i), n)
                out.extend(
                    {"url": r["url"], "surface": s, "entity_key": k} for s, k in r["used"]
                )
            yield pd.DataFrame(out, columns=["url", "surface", "entity_key"])

    return spark.range(n, numPartitions=parallelism).mapInPandas(gen, schema=_GOLDEN_SURFACES_SCHEMA)


_GOLDEN_ALGOS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("algo_id", T.IntegerType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("n_refs", T.IntegerType(), False),
    ]
)


def golden_algorithms_df(spark: SparkSession, n: int, parallelism: int | None = None) -> DataFrame:
    """(url, algo_id, caption, n_refs) for every planted algorithm block —
    the M9-analog extraction truth."""
    parallelism = parallelism or max(8, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i in pdf["id"]:
                out.extend(gen_page(int(i), n)["algorithms"])
            yield pd.DataFrame(out, columns=[f.name for f in _GOLDEN_ALGOS_SCHEMA])

    return spark.range(n, numPartitions=parallelism).mapInPandas(gen, schema=_GOLDEN_ALGOS_SCHEMA)


def golden_entity_rows() -> list[tuple]:
    return [
        (e["entity_key"], e["canonical"], e["type"], e["aliases"])
        for e in PERSONS + ORGS + PLACES + TERMS
    ]


def golden_entities_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        golden_entity_rows(),
        "entity_key string, canonical string, type string, aliases array<string>",
    )


def golden_link_rows() -> list[tuple]:
    """Labeled surface pairs: positives within clusters, hard negatives across."""
    rng = random.Random(f"{SEED}-links")
    rows = []
    pool = PERSONS + ORGS
    for e in pool:
        a = e["aliases"]
        for x in range(len(a)):
            for y in range(x + 1, len(a)):
                rows.append((a[x], a[y], True))
    # hard negatives: shared surname / shared org head-word
    by_last: dict[str, list] = {}
    for p in PERSONS:
        by_last.setdefault(p["canonical"].split()[-1], []).append(p)
    for last, group in by_last.items():
        for x in range(len(group)):
            for y in range(x + 1, len(group)):
                rows.append((group[x]["canonical"], group[y]["canonical"], False))
    by_head: dict[str, list] = {}
    for o in ORGS[1:]:
        by_head.setdefault(o["canonical"].split()[0], []).append(o)
    for head, group in by_head.items():
        for x in range(len(group)):
            for y in range(x + 1, len(group)):
                rows.append((group[x]["canonical"], group[y]["canonical"], False))
    # random easy negatives
    for _ in range(300):
        a, b = rng.sample(pool, 2)
        rows.append((a["canonical"], b["canonical"], False))
    return rows


def golden_links_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        golden_link_rows(), "surface_a string, surface_b string, same_entity boolean"
    )
