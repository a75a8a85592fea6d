"""URL canonicalization for web-corpus pipelines.

Common-Crawl-style corpora key everything on the page URL (dedup,
re-crawl reconciliation, lineage joins), and raw URLs disagree on
case, default ports, tracking params, fragments and trailing slashes.
``normalize_urls`` maps each raw URL to a canonical form with pure
native expressions — one narrow codegen projection, no UDF, no
shuffle — so the canonical key is computable inline in any scan at
corpus scale.

Rules (deliberately the portable, mechanical subset):
  * scheme + host lowercased; ``www.`` prefix dropped from the host
  * default ports ``:80`` (http) / ``:443`` (https) dropped
  * fragment (``#...``) dropped
  * tracking params removed: ``utm_*``, ``fbclid``, ``gclid``, ``ref``
  * remaining query params sorted (stable key under param reordering)
  * trailing ``/`` dropped from non-root paths

Every rule is expressed identically in the DuckDB oracle (string +
list functions); the engines' regex dialects agree on the ASCII
patterns used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRACKING = "^(utm_[a-z]+|fbclid|gclid|ref)="

#: deterministic raw-URL corpus — single source of truth for the Spark
#: query and the DuckDB VALUES CTE (the sf tables carry no raw URLs).
URL_FIXTURE: list[tuple[int, str]] = [
    (0, "HTTP://WWW.Example.COM:80/Path/Page?b=2&utm_source=x&a=1#frag"),
    (1, "https://example.com/Path/Page?a=1&b=2"),
    (2, "https://shop.example.co.uk:443/items/?gclid=zzz"),
    (3, "http://example.com"),
    (4, "https://example.com/"),
    (5, "http://www.news.site:8080/a/b?ref=rss&id=7&utm_medium=email"),
    (6, "https://example.com/Path/Page/?b=2&a=1&fbclid=abc"),
    (7, "ftp://files.example.com/pub/data.bin"),
]


def url_fixture_df(spark) -> DataFrame:
    return spark.createDataFrame(URL_FIXTURE, "url_id long, url string")


def url_fixture_cte(alias: str = "urls") -> str:
    rows = ", ".join(
        "(" + str(i) + ", '" + u.replace("'", "''") + "')"
        for i, u in URL_FIXTURE
    )
    return f"{alias}(url_id, url) AS (VALUES {rows})"


def normalize_urls(urls: DataFrame) -> DataFrame:
    """(url_id, url, norm_url, host) — canonical URL + bare host."""
    scheme = F.lower(F.regexp_extract("url", "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract("url", "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    host = F.regexp_replace(
        F.regexp_replace(hostport, ":[0-9]+$", ""), "^www\\.", ""
    )
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == F.lit("80")))
        & ~((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    rest = F.regexp_replace(
        F.regexp_extract("url", "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1),
        "#.*$",
        "",
    )
    path = F.regexp_replace(rest, "\\?.*$", "")
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, "(.)/$", "$1")
    )
    query = F.regexp_extract(rest, "\\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING),
        )
    )
    qnorm = F.array_join(kept, "&")
    norm = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")),
    )
    return urls.select(
        "url_id", "url", norm.alias("norm_url"), host.alias("host")
    ).orderBy("url_id")


def normalize_urls_oracle(table: str = "urls") -> str:
    return f"""
WITH {url_fixture_cte()},
p AS (
  SELECT url_id, url,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
    regexp_replace(regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1), '#.*$', '') AS rest
  FROM {table}),
q AS (
  SELECT url_id, url, scheme,
    regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''), '^www\\.', '') AS host,
    regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
    CASE WHEN regexp_replace(rest, '\\?.*$', '') = '' THEN '/'
         ELSE regexp_replace(regexp_replace(rest, '\\?.*$', ''), '(.)/$', '\\1')
    END AS path,
    regexp_extract(rest, '\\?([^#]*)', 1) AS query
  FROM p),
k AS (
  SELECT url_id, url, scheme, host, port, path,
    array_to_string(list_sort(list_filter(string_split(query, '&'),
      x -> x <> '' AND NOT regexp_matches(x, '{TRACKING}'))), '&') AS qnorm
  FROM q)
SELECT url_id, url,
  scheme || '://' || host ||
  CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
            AND NOT (scheme = 'https' AND port = '443')
       THEN ':' || port ELSE '' END ||
  path ||
  CASE WHEN qnorm <> '' THEN '?' || qnorm ELSE '' END AS norm_url,
  host
FROM k ORDER BY url_id
"""


def source_mix(docs: DataFrame) -> DataFrame:
    """(source, n_docs, total_tokens, avg_chars) — corpus-mix totals per
    source, the numbers a pre-training data-mixing step weights by.
    Map-side partial aggregation (hash agg on a low-cardinality key)
    then one narrow shuffle of the partials — the canonical scalable
    groupBy."""
    from .textstats import norm_col

    norm = norm_col()
    return (
        docs.select(
            "source",
            "n_chars",
            F.when(norm == "", 0)
            .otherwise(F.size(F.split(norm, " ")))
            .alias("n_toks"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            F.avg(F.col("n_chars").cast("double")).alias("avg_chars"),
        )
        .orderBy("source")
    )


def source_mix_oracle() -> str:
    from .textstats import norm_sql, tokens_sql

    return f"""
WITH t AS (
  SELECT source, n_chars,
    CASE WHEN {norm_sql()} = '' THEN 0
         ELSE len({tokens_sql(norm_sql())}) END AS n_toks
  FROM documents)
SELECT source, count(*) AS n_docs, sum(n_toks) AS total_tokens,
       avg(n_chars::DOUBLE) AS avg_chars
FROM t GROUP BY source ORDER BY source
"""
