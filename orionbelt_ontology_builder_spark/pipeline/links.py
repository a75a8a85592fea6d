"""Web link-graph extraction — hyperlinks -> host graph.

A Common-Crawl-scale KG build needs the *link* graph next to the
*fact* graph: host-level edges drive crawl prioritization, PageRank-
style quality priors, and spam/farm detection (the public WebGraph /
Common Crawl host-graph artifacts are exactly this table).  The
reference engine has no crawler surface; this is an engine addition
shaped for the north-star input (pages(url, warc_ts, html, text,
lang)).

Scale shape: href extraction is a native ``regexp_extract_all`` over
the decoded html — whole-stage-codegen projection, no Python, no
shuffle.  The host rollup is ONE (src_host, dst_host) aggregation with
map-side partials; host-pair keys are heavy-tailed but the aggregate
is associative, so partials absorb the skew before the shuffle (the
classic combiner answer; no salting needed for a count).  At 10^12
pages the only wide exchange is vocabulary-sized (host pairs), not
page-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "extract_links",
    "host_link_graph",
    "host_link_graph_oracle",
    "host_edges_cte",
    "crawl_frontier",
    "crawl_frontier_oracle",
    "anchor_texts",
    "anchor_texts_oracle",
]

#: one regex both for Spark and tests: anchor href values
_HREF_RE = r'href="([^"]+)"'
#: host slice of an absolute http(s) URL
_HOST_RE = "^https?://([^/]+)"


def extract_links(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url): every anchor href on every page.  Pure
    narrow projection (decode + regexp_extract_all + explode); filters
    to absolute http(s) targets — fragments/relative links are crawl-
    frontier concerns, not graph edges."""
    return (
        pages.select(
            F.col("url").alias("src_url"),
            F.explode(
                F.expr(
                    f"regexp_extract_all(decode(html, 'UTF-8'),"
                    f" '{_HREF_RE}', 1)"
                )
            ).alias("dst_url"),
        )
        .filter(F.col("dst_url").rlike(_HOST_RE))
    )


def host_link_graph(pages: DataFrame) -> DataFrame:
    """(src_host, dst_host, n_links, n_src_pages): the host-level link
    graph — total anchor count and distinct linking pages per directed
    host pair.  One hash aggregation over the exploded links; the
    distinct-page count is two-phase (partial sets never materialize:
    Spark plans count(distinct) as a double aggregation)."""
    links = extract_links(pages)
    return (
        links.select(
            F.regexp_extract("src_url", _HOST_RE, 1).alias("src_host"),
            F.regexp_extract("dst_url", _HOST_RE, 1).alias("dst_host"),
            "src_url",
        )
        .groupBy("src_host", "dst_host")
        .agg(
            F.count("*").alias("n_links"),
            F.countDistinct("src_url").alias("n_src_pages"),
        )
        .orderBy("src_host", "dst_host")
    )


def host_link_graph_oracle(n_pages: int) -> str:
    """DuckDB twin — an *independent derivation*: instead of re-parsing
    HTML it recomputes the expected host edges from the synthesizer's
    link spec (``pages.page_links``: self-host root, related at i // 2,
    same-host next at i + N_SITES).  Hash-equality against the Spark
    side therefore proves the whole extract-parse-rollup path, not just
    that two regexes agree."""
    from .pages import N_SITES

    h = f"'site' || (i % {N_SITES}) || '.example'"
    return f"""
WITH ids AS (SELECT unnest(generate_series(0, {n_pages - 1})) AS i),
links AS (
  SELECT {h} AS src_host, {h} AS dst_host, i FROM ids
  UNION ALL
  SELECT {h}, 'site' || ((i // 2) % {N_SITES}) || '.example', i FROM ids
  UNION ALL
  SELECT {h}, 'site' || ((i + {N_SITES}) % {N_SITES}) || '.example', i
  FROM ids
)
SELECT src_host, dst_host,
  count(*)::BIGINT AS n_links,
  count(DISTINCT i)::BIGINT AS n_src_pages
FROM links
GROUP BY src_host, dst_host
ORDER BY src_host, dst_host
"""


def host_edges_cte(n_pages: int) -> str:
    """``edges(src, dst)`` CTE chain (arithmetic twin of the distinct
    host-pair set) for composing with ``graphstats``' SQL twins."""
    from .pages import N_SITES

    h = f"'site' || (i % {N_SITES}) || '.example'"
    return f"""ids AS (SELECT unnest(generate_series(0, {n_pages - 1})) AS i),
lnk AS (
  SELECT {h} AS src, {h} AS dst FROM ids
  UNION ALL
  SELECT {h}, 'site' || ((i // 2) % {N_SITES}) || '.example' FROM ids
  UNION ALL
  SELECT {h}, 'site' || ((i + {N_SITES}) % {N_SITES}) || '.example'
  FROM ids
),
edges AS (SELECT DISTINCT src, dst FROM lnk)"""


def crawl_frontier(
    pages: DataFrame, k_per_host: int = 2
) -> DataFrame:
    """(host, url, n_inlinks, pos): the next politeness-capped fetch
    batch — linked-but-not-yet-crawled URLs, prioritized by in-link
    count, at most ``k_per_host`` per destination host (the per-host
    cap IS the politeness budget of one scheduling round).

    Scale shape: candidate set = anti-join of distinct link targets
    against the crawled url set (both sides pre-shrunk to distinct
    urls); priority = ONE url-keyed count aggregation; the per-host
    rank window partitions by host, whose population is already capped
    by the candidate dedup — at web scale hosts are many and small,
    the window never sees a corpus-sized partition."""
    links = extract_links(pages)
    crawled = pages.select(F.col("url").alias("dst_url")).distinct()
    cand = (
        links.select("dst_url")
        .join(crawled, "dst_url", "left_anti")
        .groupBy("dst_url")
        .agg(F.count("*").alias("n_inlinks"))
        .withColumn("host", F.regexp_extract("dst_url", _HOST_RE, 1))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(
        F.desc("n_inlinks"), F.col("dst_url")
    )
    return (
        cand.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k_per_host)
        .select(
            "host", F.col("dst_url").alias("url"), "n_inlinks", "pos"
        )
        .orderBy("host", "pos")
    )


def crawl_frontier_oracle(n_pages: int, k_per_host: int = 2) -> str:
    """DuckDB twin — again an independent arithmetic derivation of the
    frontier from the synthesizer's link spec + crawled-id range."""
    from .pages import N_SITES

    root = f"'https://site' || (i % {N_SITES}) || '.example/'"

    def page(url_i: str) -> str:
        return (
            f"'https://site' || (({url_i}) % {N_SITES})"
            f" || '.example/page/' || ({url_i})"
        )

    return f"""
WITH ids AS (SELECT unnest(generate_series(0, {n_pages - 1})) AS i),
targets AS (
  SELECT {root} AS dst_url FROM ids
  UNION ALL SELECT {page('i // 2')} FROM ids
  UNION ALL SELECT {page(f'i + {N_SITES}')} FROM ids
),
crawled AS (SELECT {page('i')} AS dst_url FROM ids),
cand AS (
  SELECT t.dst_url, count(*)::BIGINT AS n_inlinks
  FROM targets t ANTI JOIN crawled c ON t.dst_url = c.dst_url
  GROUP BY t.dst_url),
ranked AS (
  SELECT regexp_extract(dst_url, '^https?://([^/]+)', 1) AS host,
    dst_url AS url, n_inlinks,
    row_number() OVER (
      PARTITION BY regexp_extract(dst_url, '^https?://([^/]+)', 1)
      ORDER BY n_inlinks DESC, dst_url) AS pos
  FROM cand)
SELECT host, url, n_inlinks, pos
FROM ranked WHERE pos <= {k_per_host}
ORDER BY host, pos
"""


def anchor_texts(pages: DataFrame) -> DataFrame:
    """(url, anchor, n_refs): the anchor-text index — for every linked
    URL, each distinct text used to link to it and how often.  Anchor
    text is the classic off-page naming evidence for entity linking
    and search (the linked page's "what others call it" signal).

    Scale shape: whole anchor tags come out of ONE
    ``regexp_extract_all`` pass; href/text split per element inside a
    ``transform`` lambda (no second scan, no Python); then a single
    (url, anchor) count aggregation with map-side combine."""
    pair = F.explode(
        F.expr(
            "transform(regexp_extract_all(decode(html, 'UTF-8'),"
            " '<a href=\"[^\"]*\">[^<]*</a>', 0),"
            " t -> struct(regexp_extract(t, 'href=\"([^\"]+)\"', 1)"
            " AS url, regexp_extract(t, '>([^<]*)<', 1) AS anchor))"
        )
    ).alias("p")
    return (
        pages.select(pair)
        .select("p.url", "p.anchor")
        .filter(F.col("url").rlike(_HOST_RE))
        .groupBy("url", "anchor")
        .agg(F.count("*").alias("n_refs"))
        .orderBy("url", "anchor")
    )


def anchor_texts_oracle(n_pages: int) -> str:
    """DuckDB arithmetic twin: the synthesizer's three anchors per page
    are ('Home' -> site root), ('Bulletin i//2' -> page i//2),
    ('Bulletin i+N_SITES' -> page i+N_SITES)."""
    from .pages import N_SITES

    root = f"'https://site' || (i % {N_SITES}) || '.example/'"

    def page(url_i: str) -> str:
        return (
            f"'https://site' || (({url_i}) % {N_SITES})"
            f" || '.example/page/' || ({url_i})"
        )

    return f"""
WITH ids AS (SELECT unnest(generate_series(0, {n_pages - 1})) AS i),
anchors AS (
  SELECT {root} AS url, 'Home' AS anchor FROM ids
  UNION ALL
  SELECT {page('i // 2')}, 'Bulletin ' || (i // 2) FROM ids
  UNION ALL
  SELECT {page(f'i + {N_SITES}')}, 'Bulletin ' || (i + {N_SITES})
  FROM ids
)
SELECT url, anchor, count(*)::BIGINT AS n_refs
FROM anchors
GROUP BY url, anchor
ORDER BY url, anchor
"""


def host_reciprocity(pages: DataFrame) -> DataFrame:
    """(host, n_out_hosts, n_in_hosts, n_reciprocal, reciprocity):
    link-farm / spam-ring signal — per host, distinct outbound and
    inbound neighbor hosts and how many outbound links are returned
    (TrustRank-style reciprocity; farms show reciprocity near 1.0,
    organic hosts much lower).  Self-loops excluded.

    Scale shape: distinct host pairs only (vocabulary-sized after the
    page rollup); reciprocity = ONE self-join of that pair set on the
    reversed key + two tiny per-host aggregations."""
    links = extract_links(pages)
    e = (
        links.select(
            F.regexp_extract("src_url", _HOST_RE, 1).alias("src"),
            F.regexp_extract("dst_url", _HOST_RE, 1).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.intersect(rev)
    outs = e.groupBy("src").agg(F.count("*").alias("n_out_hosts"))
    ins = e.groupBy("dst").agg(F.count("*").alias("n_in_hosts"))
    rec = recip.groupBy("src").agg(F.count("*").alias("n_reciprocal"))
    return (
        outs.withColumnRenamed("src", "host")
        .join(ins.withColumnRenamed("dst", "host"), "host", "outer")
        .join(rec.withColumnRenamed("src", "host"), "host", "outer")
        .select(
            "host",
            F.coalesce("n_out_hosts", F.lit(0)).alias("n_out_hosts"),
            F.coalesce("n_in_hosts", F.lit(0)).alias("n_in_hosts"),
            F.coalesce("n_reciprocal", F.lit(0)).alias("n_reciprocal"),
            (
                F.coalesce("n_reciprocal", F.lit(0))
                / F.greatest(F.coalesce("n_out_hosts", F.lit(0)), F.lit(1))
                .cast("double")
            ).alias("reciprocity"),
        )
        .orderBy("host")
    )


def host_reciprocity_oracle(n_pages: int) -> str:
    """DuckDB twin over the arithmetic edge derivation."""
    return f"""
WITH {host_edges_cte(n_pages)},
e AS (SELECT src, dst FROM edges WHERE src <> dst),
recip AS (
  SELECT a.src, a.dst FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src),
outs AS (SELECT src AS host, count(*)::BIGINT AS n_out_hosts FROM e GROUP BY 1),
ins AS (SELECT dst AS host, count(*)::BIGINT AS n_in_hosts FROM e GROUP BY 1),
rec AS (SELECT src AS host, count(*)::BIGINT AS n_reciprocal FROM recip GROUP BY 1),
hosts AS (
  SELECT host FROM outs UNION SELECT host FROM ins)
SELECT h.host,
  coalesce(o.n_out_hosts, 0)::BIGINT AS n_out_hosts,
  coalesce(i.n_in_hosts, 0)::BIGINT AS n_in_hosts,
  coalesce(r.n_reciprocal, 0)::BIGINT AS n_reciprocal,
  coalesce(r.n_reciprocal, 0)
    / greatest(coalesce(o.n_out_hosts, 0), 1)::DOUBLE AS reciprocity
FROM hosts h
LEFT JOIN outs o USING (host)
LEFT JOIN ins i USING (host)
LEFT JOIN rec r USING (host)
ORDER BY h.host
"""


def host_crawl_recency(pages: DataFrame) -> DataFrame:
    """(host, n_pages, first_ts, last_ts, span_hours): per-host crawl
    coverage — how many pages, when first/last fetched, and the span.
    Drives re-crawl scheduling (stale hosts first) and coverage audits.

    Scale shape: ONE host-keyed min/max/count aggregation over a
    narrow (host, warc_ts) projection; map-side partials absorb the
    host skew."""
    return (
        pages.select(
            F.regexp_extract("url", _HOST_RE, 1).alias("host"),
            "warc_ts",
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("n_pages"),
            F.min("warc_ts").alias("first_ts"),
            F.max("warc_ts").alias("last_ts"),
        )
        .withColumn(
            "span_hours",
            (
                F.col("last_ts").cast("long")
                - F.col("first_ts").cast("long")
            )
            / F.lit(3600.0),
        )
        .orderBy("host")
    )


def host_crawl_recency_oracle(n_pages: int) -> str:
    """Arithmetic twin: warc_ts = EPOCH + i*60 by the synthesizer spec."""
    from .pages import EPOCH, N_SITES

    return f"""
WITH ids AS (SELECT unnest(generate_series(0, {n_pages - 1})) AS i),
p AS (
  SELECT 'site' || (i % {N_SITES}) || '.example' AS host,
         to_timestamp({EPOCH} + i * 60)::TIMESTAMP AS warc_ts
  FROM ids)
SELECT host,
  count(*)::BIGINT AS n_pages,
  min(warc_ts) AS first_ts,
  max(warc_ts) AS last_ts,
  (epoch(max(warc_ts)) - epoch(min(warc_ts))) / 3600.0 AS span_hours
FROM p
GROUP BY host
ORDER BY host
"""
