"""Crawl-metadata sources: robots.txt and XML sitemaps — the two
machine-readable files every polite crawl reads before fetching a host
(RFC 9309 / sitemaps.org, public specs).  Both parse as line/regex
algebra in the engine's codec style (WARC/N-Triples stance): the file
is a LINE or TEXT column, grouping is a running-count window
partitioned by host, and every field extraction is a native
expression — no Python in the parse path.

``datapipe.urls.url_rules_filter`` consumes the rule table produced
here (longest-prefix-match allow/deny); ``pipeline.linking`` and the
frontier ops consume sitemap URLs as seed candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "parse_robots",
    "parse_robots_sql",
    "robots_fixture_df",
    "robots_fixture_values",
    "parse_sitemap",
    "parse_sitemap_sql",
    "sitemap_fixture_df",
    "sitemap_fixture_values",
]

# one directive per line: "Field: value" with optional whitespace and
# trailing comments; char-class regex (no backslash escapes) so Spark
# and DuckDB read the identical pattern (engineering notes)
_DIRECTIVE_RX = "^[ ]*([A-Za-z-]+)[ ]*:[ ]*([^#]*)"

#: two hosts: a two-group file (wildcard group + a specific bot with
#: its own rules), comments, a sitemap pointer, and a crawl-delay the
#: subset surfaces as a directive row; second host is allow-all with
#: an empty disallow (the RFC's "allow everything" idiom).
ROBOTS_FILES: list[tuple[str, str]] = [
    ("ex.org",
     "# robots for ex.org\n"
     "User-agent: *\n"
     "Disallow: /private/\n"
     "Allow: /private/press/\n"
     "Crawl-delay: 2\n"
     "\n"
     "User-agent: trainingbot\n"
     "User-agent: otherbot\n"
     "Disallow: /\n"
     "Sitemap: https://ex.org/sitemap.xml\n"),
    ("open.site",
     "User-agent: *\n"
     "Disallow:\n"),
]


def robots_fixture_df(spark) -> DataFrame:
    return spark.createDataFrame(ROBOTS_FILES, "host string, body string")


def robots_fixture_values() -> str:
    rows = ",\n    ".join(
        "('{}', '{}')".format(h, b.replace("'", "''").replace("\n", "\\n"))
        for h, b in ROBOTS_FILES
    )
    return f"r(host, body) AS (SELECT host, replace(body, '\\n', chr(10)) FROM (VALUES\n    {rows}) t(host, body))"


def parse_robots(files: DataFrame) -> DataFrame:
    """(host, group_id, user_agent, directive, value) — every directive
    of every robots.txt, grouped per RFC 9309: consecutive
    ``User-agent`` lines open a group; following ``Allow`` /
    ``Disallow`` / ``Crawl-delay`` rows belong to EVERY agent of that
    group (the one-row-per-agent fan-out below); ``Sitemap`` is
    host-global per the spec and carries an empty agent (NULL-free
    output contract, the WARC lesson).  Comments and
    blank lines drop.

    Plan: lines via ``posexplode(split(body))``, group assembly is a
    running count of agent-line starts over a PER-HOST window (the
    WARC record-assembly shape — no global sort), the agent fan-out is
    a per-group equi-join of two host-partitioned slices."""
    lines = files.select(
        "host",
        F.posexplode(F.split("body", "\n")).alias("line_no", "line"),
    ).select(
        "host",
        "line_no",
        F.lower(F.regexp_extract("line", _DIRECTIVE_RX, 1)).alias("field"),
        F.trim(F.regexp_extract("line", _DIRECTIVE_RX, 2)).alias("value"),
    ).filter(F.col("field") != "")
    w = Window.partitionBy("host").orderBy("line_no")
    # a User-agent line starts a new group only when the PREVIOUS kept
    # line was not also a User-agent line (consecutive UA lines share
    # one group per the RFC)
    marked = lines.withColumn(
        "prev_field", F.lag("field").over(w)
    ).withColumn(
        "group_id",
        F.sum(
            F.when(
                (F.col("field") == "user-agent")
                & (
                    F.col("prev_field").isNull()
                    | (F.col("prev_field") != "user-agent")
                ),
                1,
            ).otherwise(0)
        ).over(w),
    )
    agents = (
        marked.filter(F.col("field") == "user-agent")
        .select(
            "host", "group_id", F.lower(F.col("value")).alias("user_agent")
        )
    )
    rules = marked.filter(
        F.col("field").isin("allow", "disallow", "crawl-delay")
    ).select("host", "group_id", "line_no", "field", "value")
    grouped = rules.join(agents, ["host", "group_id"]).select(
        "host",
        "group_id",
        "user_agent",
        F.col("field").alias("directive"),
        "value",
    )
    sitemaps = marked.filter(F.col("field") == "sitemap").select(
        "host",
        F.lit(0).alias("group_id"),
        F.lit("").alias("user_agent"),  # NULL-free contract (r2 lesson)
        F.lit("sitemap").alias("directive"),
        "value",
    )
    return grouped.unionByName(sitemaps).orderBy(
        "host", "group_id", "user_agent", "directive", "value"
    )


def parse_robots_sql(files_cte: str) -> str:
    """DuckDB twin; ``files_cte`` must define ``r(host, body)``."""
    return f"""
WITH {files_cte.strip()},
lines AS MATERIALIZED (
  SELECT host, i AS line_no,
    lower(regexp_extract(ln, '{_DIRECTIVE_RX}', 1)) AS field,
    trim(regexp_extract(ln, '{_DIRECTIVE_RX}', 2)) AS value
  FROM (
    SELECT host,
      unnest(string_split(body, chr(10))) AS ln,
      unnest(range(len(string_split(body, chr(10))))) AS i
    FROM r)
  WHERE lower(regexp_extract(ln, '{_DIRECTIVE_RX}', 1)) <> ''),
marked AS MATERIALIZED (
  SELECT *,
    (sum(CASE WHEN field = 'user-agent'
              AND (prev_field IS NULL OR prev_field <> 'user-agent')
             THEN 1 ELSE 0 END)
      OVER (PARTITION BY host ORDER BY line_no))::BIGINT AS group_id
  FROM (
    SELECT *, lag(field) OVER (PARTITION BY host ORDER BY line_no)
      AS prev_field
    FROM lines)),
agents AS (
  SELECT host, group_id, lower(value) AS user_agent
  FROM marked WHERE field = 'user-agent'),
rules AS (
  SELECT host, group_id, field, value FROM marked
  WHERE field IN ('allow', 'disallow', 'crawl-delay'))
SELECT host, group_id, user_agent, directive, value FROM (
  SELECT r2.host, r2.group_id, a.user_agent, r2.field AS directive,
         r2.value
  FROM rules r2 JOIN agents a USING (host, group_id)
  UNION ALL
  SELECT host, 0, '', 'sitemap', value FROM marked
  WHERE field = 'sitemap')
ORDER BY host, group_id, user_agent, directive, value"""


# ------------------------------------------------------------------ #
# XML sitemaps
# ------------------------------------------------------------------ #

_LOC_RX = "<loc>([^<]*)</loc>"
_URLBLOCK_RX = "<url>(.*?)</url>"
_LASTMOD_RX = "<lastmod>([^<]*)</lastmod>"
_PRIORITY_RX = "<priority>([^<]*)</priority>"

SITEMAP_DOCS: list[tuple[str, str]] = [
    ("https://ex.org/sitemap.xml",
     '<?xml version="1.0"?><urlset>'
     "<url><loc>https://ex.org/</loc><lastmod>2024-01-01</lastmod>"
     "<priority>1.0</priority></url>"
     "<url><loc>https://ex.org/a</loc><lastmod>2024-02-03</lastmod></url>"
     "<url><loc>https://ex.org/b</loc><priority>0.5</priority></url>"
     "</urlset>"),
    ("https://open.site/sm.xml",
     "<urlset><url><loc>https://open.site/x</loc></url></urlset>"),
]


def sitemap_fixture_df(spark) -> DataFrame:
    return spark.createDataFrame(SITEMAP_DOCS, "sitemap string, xml string")


def sitemap_fixture_values() -> str:
    rows = ",\n    ".join(
        f"('{s}', '{x}')" for s, x in SITEMAP_DOCS
    )
    return f"d(sitemap, xml) AS (VALUES\n    {rows})"


def parse_sitemap(docs: DataFrame) -> DataFrame:
    """(sitemap, url, lastmod, priority) — sitemaps.org urlset entries:
    one ``<url>`` block per row (regex subset: no namespaces/CDATA —
    the dialect-neutral stance of the webtables parser), ``lastmod`` /
    ``priority`` optional ('' when absent, NULL-free like the WARC
    contract).  Pure ``regexp_extract_all`` + explode projection."""
    blocks = docs.select(
        "sitemap",
        F.explode(
            F.expr(f"regexp_extract_all(xml, '{_URLBLOCK_RX}', 1)")
        ).alias("block"),
    )
    return (
        blocks.select(
            "sitemap",
            F.regexp_extract("block", _LOC_RX, 1).alias("url"),
            F.regexp_extract("block", _LASTMOD_RX, 1).alias("lastmod"),
            F.regexp_extract("block", _PRIORITY_RX, 1).alias("priority"),
        )
        .filter(F.col("url") != "")
        .orderBy("sitemap", "url")
    )


def parse_sitemap_sql(docs_cte: str) -> str:
    """DuckDB twin; ``docs_cte`` must define ``d(sitemap, xml)``."""
    return f"""
WITH {docs_cte.strip()},
blocks AS (
  SELECT sitemap,
    unnest(regexp_extract_all(xml, '{_URLBLOCK_RX}', 1)) AS block
  FROM d)
SELECT sitemap,
  regexp_extract(block, '{_LOC_RX}', 1) AS url,
  regexp_extract(block, '{_LASTMOD_RX}', 1) AS lastmod,
  regexp_extract(block, '{_PRIORITY_RX}', 1) AS priority
FROM blocks
WHERE regexp_extract(block, '{_LOC_RX}', 1) <> ''
ORDER BY sitemap, url"""
