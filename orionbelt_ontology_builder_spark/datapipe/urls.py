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
SELECT source, count(*) AS n_docs, sum(n_toks)::BIGINT AS total_tokens,
       avg(n_chars::DOUBLE) AS avg_chars
FROM t GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------- #
# robots-style URL rule filtering (longest-prefix-match)
# --------------------------------------------------------------------- #

#: (host, allow, path_prefix) — robots.txt-shaped crawl rules for the
#: URL fixture: per host, the LONGEST matching prefix decides; on an
#: exact length tie allow wins; hosts/paths with no matching rule
#: default to allow (the documented robots longest-match semantics —
#: public Google/RFC 9309 spec).
URL_RULES: list[tuple[str, bool, str]] = [
    ("example.com", False, "/Path"),
    ("example.com", True, "/Path/Page"),
    ("news.site", False, "/"),
    ("news.site", True, "/a"),
    ("shop.example.co.uk", False, "/items"),
]


def url_rules_df(spark) -> DataFrame:
    return spark.createDataFrame(
        URL_RULES, "host string, allow boolean, prefix string"
    )


def url_rules_values() -> str:
    rows = ", ".join(
        f"('{h}', {str(a).lower()}, '{p}')" for h, a, p in URL_RULES
    )
    return f"rules(host, allow, prefix) AS (VALUES {rows})"


def url_rules_filter(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """(url_id, host, path, decision, rule_prefix) — RFC 9309 robots
    semantics applied to every URL: among the URL's host's rules whose
    ``prefix`` prefixes the raw path, the longest wins; a length tie
    goes to allow; no match (or unknown host) defaults to allow with
    an empty ``rule_prefix``.

    The winner is one ``max(struct(len(prefix), allow, prefix))`` per
    URL — exact integer/boolean lexicographic max, bit-stable.  Rule
    tables are robots.txt-sized: the join broadcasts, the per-URL agg
    is map-side combinable, and the URL side never shuffles wide —
    the plan a 100 TB frontier filter needs."""
    hostport = F.lower(
        F.regexp_extract("url", "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    host = F.regexp_replace(
        F.regexp_replace(hostport, ":[0-9]+$", ""), "^www\\.", ""
    )
    path = F.regexp_replace(
        F.regexp_extract("url", "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1),
        "[?#].*$",
        "",
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    parsed = urls.select("url_id", host.alias("host"), path.alias("path"))
    matched = (
        parsed.join(F.broadcast(rules), "host")
        .filter(F.col("path").startswith(F.col("prefix")))
        .groupBy("url_id")
        .agg(
            F.max(
                F.struct(
                    F.length("prefix").alias("l"),
                    F.col("allow").alias("a"),
                    F.col("prefix").alias("p"),
                )
            ).alias("w")
        )
        .select(
            "url_id",
            F.when(F.col("w.a"), F.lit("allow"))
            .otherwise(F.lit("deny"))
            .alias("decision"),
            F.col("w.p").alias("rule_prefix"),
        )
    )
    return (
        parsed.join(matched, "url_id", "left")
        .select(
            "url_id",
            "host",
            "path",
            F.coalesce("decision", F.lit("allow")).alias("decision"),
            F.coalesce("rule_prefix", F.lit("")).alias("rule_prefix"),
        )
        .orderBy("url_id")
    )


def url_rules_filter_sql(
    urls_cte: str = None, rules_cte: str = None
) -> str:
    """DuckDB twin; defaults to the module fixtures."""
    u = urls_cte if urls_cte is not None else url_fixture_cte()
    r = rules_cte if rules_cte is not None else url_rules_values()
    return f"""
WITH {u.strip()},
{r.strip()},
parsed AS (
  SELECT url_id,
    regexp_replace(regexp_replace(
      lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
      ':[0-9]+$', ''), '^www\\.', '') AS host,
    CASE WHEN regexp_replace(
        regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1),
        '[?#].*$', '') = '' THEN '/'
      ELSE regexp_replace(
        regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1),
        '[?#].*$', '') END AS path
  FROM urls),
matched AS (
  SELECT p.url_id,
    (max(struct_pack(l := length(r.prefix), a := r.allow, p := r.prefix))).a AS a,
    (max(struct_pack(l := length(r.prefix), a := r.allow, p := r.prefix))).p AS rp
  FROM parsed p JOIN rules r ON p.host = r.host
  WHERE starts_with(p.path, r.prefix)
  GROUP BY p.url_id)
SELECT p.url_id, p.host, p.path,
  CASE WHEN m.url_id IS NULL THEN 'allow'
       WHEN m.a THEN 'allow' ELSE 'deny' END AS decision,
  coalesce(m.rp, '') AS rule_prefix
FROM parsed p LEFT JOIN matched m ON p.url_id = m.url_id
ORDER BY p.url_id
"""
