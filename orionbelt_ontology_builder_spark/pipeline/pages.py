"""Deterministic synthesis of Common-Crawl-style pages
(BASELINE.json input_hint: ``pages(url, warc_ts, html, text, lang)``).

Everything is a pure function of the page id — generation runs inside
``mapInPandas`` (Arrow-batched, no per-row Python at the Spark layer, no
driver materialization), so the same ids produce the same bytes at any
parallelism and any scale.  No external data, no randomness source other
than the id-keyed arithmetic below (seed folded into the formulas).

World model:
  * ~900 distinct word-pair stems x numeric suffix -> unique entities;
    each entity has 3 alias surface forms (concatenated / hyphenated /
    spaced) to exercise MinHash-LSH blocking + canonicalization;
  * a fixed 5-class taxonomy (child, parent) pairs;
  * page i emits: a located-in fact, a works-with fact, a type fact, a
    taxonomy sentence (1 page in 7), filler sentences and boilerplate nav
    that the extractor must ignore.

``ground_truth_edges`` recomputes the expected canonical triples from
the same formulas — the P/R >= 0.95 oracle (BASELINE.json).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..model import PAGES_SCHEMA

WORDS_A = [
    "Zephyr", "Granite", "Harbor", "Falcon", "Cedar", "Quartz", "Ember",
    "Willow", "Summit", "Raven", "Delta", "Onyx", "Maple", "Aurora",
    "Basalt", "Crystal", "Dune", "Echo", "Fjord", "Gale", "Haven",
    "Iris", "Juniper", "Krypton", "Lagoon", "Mesa", "Nimbus", "Opal",
    "Pinnacle",
]  # 29
WORDS_B = [
    "Works", "Labs", "Forge", "Mills", "Foundry", "Systems", "Dynamics",
    "Holdings", "Ventures", "Partners", "Industries", "Collective",
    "Union", "Assembly", "Council", "Society", "Exchange", "Alliance",
    "Network", "Bureau", "Institute", "Consortium", "Guild", "League",
    "Syndicate", "Cooperative", "Trust", "Group", "Atelier", "Studio",
    "House",
]  # 31
WORDS_C = [
    "North", "South", "East", "West", "Prime", "Global", "Central",
    "Pacific", "Atlantic", "Nordic", "Alpine", "Coastal", "Urban",
    "Rural", "Metro", "Inter", "Trans", "Ultra", "Mega", "Micro",
    "Neo", "Proto", "Meta", "Omni", "Poly", "Mono", "Duo", "Tri",
    "Quad", "Penta", "Hexa", "Hepta", "Octo", "Nova", "Vera", "Zeta",
    "Axiom",
]  # 37

#: (child, parent, article) taxonomy — the class_hierarchy ground truth.
TAXONOMY = [
    ("Company", "Organization", "an"),
    ("City", "Place", "a"),
    ("Person", "Agent", "an"),
    ("River", "Place", "a"),
    ("University", "Organization", "an"),
]

CLASS_NAMES = [t[0] for t in TAXONOMY]

FILLER = [
    "The weather that day was unremarkable and the markets stayed calm",
    "Readers sent in many letters about the previous edition",
    "Nothing else of note happened during the quarter",
    "Several unrelated announcements were postponed until spring",
]

EPOCH = 1609459200  # 2021-01-01T00:00:00Z, fixed


def n_entities(n_pages: int) -> int:
    """Entity vocabulary grows with the corpus (as on the real web), so
    linking + canonicalization work scales with page count instead of
    saturating — the property the N-vs-4N scaling evidence measures.

    Safety of the link threshold at any vocabulary size: every alias
    embeds the unique ``e`` digit suffix, so two DISTINCT entities —
    even ones sharing all three stem words (possible every
    lcm(29,31,37)=33,263 ids) — differ in their digit windows, bounding
    cross-entity 4-gram Jaccard at ~0.7, while same-entity alias
    variants normalize to the identical string (J=1.0).  The 0.9 verify
    threshold (linking.verified_same_as) sits in that margin."""
    return max(10, n_pages // 5)


def entity_stem(e: int) -> str:
    return f"{WORDS_A[e % 29]}{WORDS_B[e % 31]}{WORDS_C[e % 37]}{e:04d}"


def entity_aliases(e: int) -> list[str]:
    """Three surface forms per entity (concatenated / spaced / hyphenated)."""
    a, b, c = WORDS_A[e % 29], WORDS_B[e % 31], WORDS_C[e % 37]
    return [f"{a}{b}{c}{e:04d}", f"{a} {b}{c}{e:04d}", f"{a}{b}{c}-{e:04d}"]


def entity_class(e: int) -> str:
    return CLASS_NAMES[e % len(CLASS_NAMES)]


def located_target(e: int, k: int) -> int:
    return (e * 7 + 3) % k


def works_target(e: int, k: int) -> int:
    return (e * 13 + 5) % k


def page_sentences(i: int, k: int) -> list[str]:
    """The body sentences of page i (pure function; the extraction ground
    truth derives from the same calls)."""
    e = i % k
    al = entity_aliases(e)
    loc = entity_aliases(located_target(e, k))
    wrk = entity_aliases(works_target(e, k))
    cls = entity_class(e)
    art = "an" if cls[0] in "AEIOU" else "a"
    sents = [
        f"{al[i % 3]} is located in {loc[(i // 3) % 3]}.",
        f"{al[(i + 1) % 3]} works with {wrk[(i // 2) % 3]}.",
        f"{al[(i + 2) % 3]} is {art} {cls}.",
        FILLER[i % len(FILLER)] + ".",
    ]
    if i % 7 == 0:
        child, parent, article = TAXONOMY[(i // 7) % len(TAXONOMY)]
        sents.insert(2, f"Every {child} is {article} {parent}.")
    return sents


#: distinct hosts in the synthetic web (page i lives on site i % N_SITES)
N_SITES = 97


def page_links(i: int) -> list[str]:
    """Deterministic outlinks of page ``i`` — the pure spec shared by
    the HTML synthesizer, the link-extraction operator's tests, and the
    DuckDB arithmetic twin (``pipeline/links.py``).  Three anchors:
    the site root (self-host), a "related bulletin" at ``i // 2``
    (generally cross-host), and the next bulletin on the same host at
    ``i + N_SITES`` (dangles past the crawl tail — real webs have
    dangling links)."""
    return [
        f"https://site{i % N_SITES}.example/",
        page_url(i // 2),
        page_url(i + N_SITES),
    ]


def page_html(i: int, k: int) -> bytes:
    sents = page_sentences(i, k)
    body = "</p>\n<p>".join(sents)
    title = f"Bulletin {i}"
    home, rel, nxt = page_links(i)
    html = (
        f"<!DOCTYPE html><html><head><title>{title}</title>"
        f"<style>p {{ margin: 0 }}</style>"
        f"<script>var x = {i}; // tracking &amp; noise</script>"
        f"</head>\n<body>\n<nav><a href=\"{home}\">Home</a> | Archive"
        f" | About | <a href=\"{rel}\">Bulletin {i // 2}</a>"
        f" | <a href=\"{nxt}\">Bulletin {i + N_SITES}</a></nav>\n"
        f"<!-- page {i} -->\n"
        f"<h1>{title}</h1>\n<p>{body}</p>\n"
        f"<footer>&copy; Bulletin syndicate &amp; co</footer>\n"
        f"</body></html>"
    )
    return html.encode("utf-8")


def page_url(i: int, n_sites: int = N_SITES) -> str:
    return f"https://site{i % n_sites}.example/page/{i}"


def synthesize_pages(
    spark: SparkSession, n_pages: int, partitions: int | None = None
) -> DataFrame:
    """Distributed pages table; ``text`` is the golden extracted text
    (computed with the same shared extractor the pipeline uses, so the
    byte-identity invariant anchors to one implementation)."""
    from ..session import ship_package
    from .textextract import html_to_text

    ship_package(spark)
    k = n_entities(n_pages)
    rng = spark.range(n_pages)
    if partitions:
        rng = rng.repartition(partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].astype("int64")
            htmls = [page_html(int(i), k) for i in ids]
            yield pd.DataFrame(
                {
                    "url": [page_url(int(i)) for i in ids],
                    "warc_ts": pd.to_datetime(
                        EPOCH + ids * 60, unit="s"
                    ),
                    "html": htmls,
                    "text": [html_to_text(h) for h in htmls],
                    "lang": ["en" if int(i) % 11 else "de" for i in ids],
                }
            )

    return rng.mapInPandas(gen, PAGES_SCHEMA)


# --------------------------------------------------------------------------
# ground truth (the P/R oracle)
# --------------------------------------------------------------------------


def normalize_surface(s: str) -> str:
    """Canonical normalization for P/R comparison: alias variants of one
    entity normalize to the same key."""
    return s.replace("-", "").replace(" ", "").lower()


def ground_truth_triples(n_pages: int) -> set[tuple[str, str, str]]:
    """Expected canonical (subj, pred, obj) set, normalized surfaces."""
    k = n_entities(n_pages)
    out: set[tuple[str, str, str]] = set()
    for i in range(n_pages):
        e = i % k
        s = normalize_surface(entity_stem(e))
        out.add((s, "locatedIn", normalize_surface(entity_stem(located_target(e, k)))))
        out.add((s, "worksWith", normalize_surface(entity_stem(works_target(e, k)))))
        out.add((s, "type", normalize_surface(entity_class(e))))
        if i % 7 == 0:
            child, parent, _ = TAXONOMY[(i // 7) % len(TAXONOMY)]
            out.add(
                (
                    normalize_surface(child),
                    "subClassOf",
                    normalize_surface(parent),
                )
            )
    return out


def ground_truth_df(spark: SparkSession, n_pages: int) -> DataFrame:
    """Distributed twin of ``ground_truth_triples``: the expected
    canonical (s, p, o) set as a DataFrame, generated inside
    ``mapInPandas`` from the same id-keyed formulas.  At 2M pages the
    ~6.3M-row truth set never leaves the executors — feed this to
    ``run.precision_recall`` so the P/R gate is join-computed."""
    k = n_entities(n_pages)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            s_col: list[str] = []
            p_col: list[str] = []
            o_col: list[str] = []
            for i in pdf["id"]:
                i = int(i)
                e = i % k
                s = normalize_surface(entity_stem(e))
                for p, o in (
                    ("locatedIn", normalize_surface(entity_stem(located_target(e, k)))),
                    ("worksWith", normalize_surface(entity_stem(works_target(e, k)))),
                    ("type", normalize_surface(entity_class(e))),
                ):
                    s_col.append(s)
                    p_col.append(p)
                    o_col.append(o)
                if i % 7 == 0:
                    child, parent, _ = TAXONOMY[(i // 7) % len(TAXONOMY)]
                    s_col.append(normalize_surface(child))
                    p_col.append("subClassOf")
                    o_col.append(normalize_surface(parent))
            yield pd.DataFrame({"s": s_col, "p": p_col, "o": o_col})

    return (
        spark.range(n_pages)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(gen, "s string, p string, o string")
        .distinct()
    )
