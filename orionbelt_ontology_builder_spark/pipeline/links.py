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

__all__ = ["extract_links", "host_link_graph", "host_link_graph_oracle"]

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
