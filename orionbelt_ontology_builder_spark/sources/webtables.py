"""HTML table extraction — the WebTables program (Cafarella et al.,
VLDB 2008, public literature): relational tables embedded in web pages
are the single richest structured-fact source a crawl offers, and
their (row entity, column header, cell value) unrolling is exactly a
triple table.

Parser scope (regex-grammar subset, dialect-neutral so Spark's Java
regex and DuckDB's RE2 agree): one ``<table>`` per document,
``<tr>`` rows containing ``<th>`` or ``<td>`` cells, no colspan/
rowspan/nesting (such tables parse cell-wise; spans are a documented
non-goal — the reference decoder for the messy web is an Arrow UDF
behind the same output contract).  The first row's ``<th>`` cells are
the column headers; each later row becomes facts keyed by its first
cell: ``(row_key, header_j, cell_j)``.

Plan shape: rows via ``regexp_extract_all`` + positional explode,
cells the same one level down — pure projection fan-out bounded by
table size, then one (doc, row) - (doc, header) positional equi-join;
no shuffle before the final sort.  Corpus-scale cost is linear in
cell count, the same shape as the gazetteer n-gram pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "extract_jsonld_islands",
    "extract_jsonld_islands_sql",
    "ld_docs_df",
    "ld_docs_values",
    "extract_web_tables",
    "extract_web_tables_sql",
    "webtable_fixture_df",
    "webtable_fixture_values",
]

_ROW_RX = "<tr[^>]*>(.*?)</tr>"
_CELL_RX = "<t[hd][^>]*>(.*?)</t[hd]>"

#: two documents with one table each: a 3-column entity table and a
#: 2-column table with messy whitespace + an attribute-carrying <td>.
WEBTABLE_DOCS: list[tuple[int, str]] = [
    (0,
     "<html><body><p>intro</p><table>"
     "<tr><th>city</th><th>country</th><th>population</th></tr>"
     "<tr><td>berlin</td><td>germany</td><td>3600000</td></tr>"
     "<tr><td>paris</td><td>france</td><td>2100000</td></tr>"
     "</table></body></html>"),
    (1,
     "<html><table>"
     "<tr><th>company</th><th>founded</th></tr>"
     "<tr><td class=x>acme</td><td> 1999 </td></tr>"
     "</table><p>footer</p></html>"),
]


def webtable_fixture_df(spark) -> DataFrame:
    return spark.createDataFrame(WEBTABLE_DOCS, "doc_id long, html string")


def webtable_fixture_values() -> str:
    rows = ",\n    ".join(f"({i}, '{h}')" for i, h in WEBTABLE_DOCS)
    return f"d(doc_id, html) AS (VALUES\n    {rows})"


def extract_web_tables(docs: DataFrame) -> DataFrame:
    """(doc_id, row_key, header, value) — WebTables unrolling of
    ``docs(doc_id, html)``: header row = row 0, each data row keyed by
    its first cell, cells matched positionally to headers (ragged
    tails drop — a cell with no header carries no predicate); values
    are whitespace-trimmed."""
    rows = docs.select(
        "doc_id",
        F.posexplode(F.expr(f"regexp_extract_all(html, '{_ROW_RX}', 1)"))
        .alias("row_idx", "row_html"),
    )
    cells = rows.select(
        "doc_id", "row_idx",
        F.posexplode(
            F.expr(f"regexp_extract_all(row_html, '{_CELL_RX}', 1)")
        ).alias("col_idx", "cell"),
    ).withColumn("cell", F.trim("cell"))
    headers = cells.filter(F.col("row_idx") == 0).select(
        "doc_id",
        F.col("col_idx").alias("h_idx"),
        F.col("cell").alias("header"),
    )
    keys = cells.filter(
        (F.col("row_idx") > 0) & (F.col("col_idx") == 0)
    ).select("doc_id", "row_idx", F.col("cell").alias("row_key"))
    return (
        cells.filter((F.col("row_idx") > 0) & (F.col("col_idx") > 0))
        .join(headers, "doc_id")
        .filter(F.col("col_idx") == F.col("h_idx"))
        .join(keys, ["doc_id", "row_idx"])
        .select("doc_id", "row_key", "header", F.col("cell").alias("value"))
        .orderBy("doc_id", "row_key", "header")
    )


def extract_web_tables_sql(docs_cte: str) -> str:
    """DuckDB twin; ``docs_cte`` must define ``d(doc_id, html)``."""
    return f"""
WITH {docs_cte.strip()},
rows_ AS (
  SELECT doc_id,
    unnest(range(len(regexp_extract_all(html, '{_ROW_RX}', 1))))
      AS row_idx,
    unnest(regexp_extract_all(html, '{_ROW_RX}', 1)) AS row_html
  FROM d),
cells AS MATERIALIZED (
  SELECT doc_id, row_idx,
    unnest(range(len(regexp_extract_all(row_html, '{_CELL_RX}', 1))))
      AS col_idx,
    trim(unnest(regexp_extract_all(row_html, '{_CELL_RX}', 1))) AS cell
  FROM rows_),
headers AS (
  SELECT doc_id, col_idx AS h_idx, cell AS header
  FROM cells WHERE row_idx = 0),
keys_ AS (
  SELECT doc_id, row_idx, cell AS row_key
  FROM cells WHERE row_idx > 0 AND col_idx = 0)
SELECT c.doc_id, k.row_key, h.header, c.cell AS value
FROM cells c
JOIN headers h ON c.doc_id = h.doc_id AND c.col_idx = h.h_idx
JOIN keys_ k ON c.doc_id = k.doc_id AND c.row_idx = k.row_idx
WHERE c.row_idx > 0 AND c.col_idx > 0
ORDER BY c.doc_id, k.row_key, h.header"""


# --------------------------------------------------------------------- #
# schema.org JSON-LD script extraction from HTML
# --------------------------------------------------------------------- #

#: '[+]' instead of an escaped plus: Spark SQL string literals consume
#: backslashes while DuckDB keeps them — a char class needs neither.
_LD_RX = '<script type="application/ld[+]json">(.*?)</script>'

#: two pages embedding schema.org JSON-LD islands (the dominant
#: structured-data carrier on the real web), one with two islands.
LD_DOCS: list[tuple[int, str]] = [
    (0,
     '<html><head><script type="application/ld+json">'
     '{"@id": "http://ex.org/acme", "@type": "http://schema.org/Organization",'
     ' "http://schema.org/name": "Acme Corp"}'
     "</script></head><body>x</body></html>"),
    (1,
     '<html><script type="application/ld+json">'
     '{"@id": "http://ex.org/berlin", "@type": "http://schema.org/City"}'
     '</script><p>mid</p><script type="application/ld+json">'
     '{"@id": "http://ex.org/alice", "http://schema.org/worksFor":'
     ' {"@id": "http://ex.org/acme"}}'
     "</script></html>"),
]


def ld_docs_df(spark):
    return spark.createDataFrame(LD_DOCS, "doc_id long, html string")


def extract_jsonld_islands(docs) -> "DataFrame":
    """(doc_id, subj, pred, obj, obj_kind, obj_lang, obj_dt) — every
    schema.org JSON-LD island in the HTML parsed through the engine's
    JSON-LD codec (``parsers.parse_jsonld``), island extraction as a
    native ``regexp_extract_all`` projection.

    Fully distributed: the island PULL is a native
    ``regexp_extract_all`` projection over the page scan, and the JSON
    decode wraps the engine's ``parse_jsonld`` codec in an Arrow
    ``mapInPandas`` batch — no driver-side materialization anywhere in
    the plan, so the corpus path is the fixture path.  An island that
    fails to parse (malformed JSON in the wild) contributes zero rows
    rather than failing the batch."""
    from ..session import ship_package
    from .parsers import parse_jsonld

    ship_package(docs.sparkSession)
    schema = (
        "doc_id long, subj string, pred string, obj string,"
        " obj_kind string, obj_lang string, obj_dt string"
    )

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            out: list[tuple] = []
            for doc_id, island in zip(pdf["doc_id"], pdf["island"]):
                try:
                    triples = parse_jsonld(island)
                except Exception:
                    continue
                for t in triples:
                    out.append((int(doc_id), *t))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "subj", "pred", "obj",
                    "obj_kind", "obj_lang", "obj_dt",
                ],
            )

    islands = docs.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(html, '{_LD_RX}', 1)")
        ).alias("island"),
    )
    return islands.mapInPandas(decode, schema).orderBy(
        "doc_id", "subj", "pred", "obj"
    )


def extract_jsonld_islands_sql(docs_cte: str) -> str:
    """DuckDB twin: the same island regex, islands decoded with
    DuckDB's native JSON functions for the fixture's flat-object
    subset (@id/@type/IRI-keyed values; nested @id objects become uri
    objects, strings become literals)."""
    return f"""
WITH {docs_cte.strip()},
islands AS (
  SELECT doc_id, unnest(regexp_extract_all(html, '{_LD_RX}', 1)) AS js
  FROM d),
kv AS (
  SELECT doc_id, js,
    json_extract_string(js, '$."@id"') AS subj,
    unnest(json_keys(js::JSON)) AS k
  FROM islands)
SELECT doc_id, subj,
  CASE WHEN k = '@type'
       THEN 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
       ELSE k END AS pred,
  CASE
    WHEN k = '@type' THEN json_extract_string(js, '$."@type"')
    WHEN json_type(js::JSON, '$."' || k || '"') = 'OBJECT'
      THEN json_extract_string(js, '$."' || k || '"."@id"')
    ELSE json_extract_string(js, '$."' || k || '"')
  END AS obj,
  CASE
    WHEN k = '@type' THEN 'uri'
    WHEN json_type(js::JSON, '$."' || k || '"') = 'OBJECT' THEN 'uri'
    ELSE 'literal'
  END AS obj_kind,
  CAST(NULL AS VARCHAR) AS obj_lang,
  CAST(NULL AS VARCHAR) AS obj_dt
FROM kv
WHERE k NOT IN ('@id')
ORDER BY doc_id, subj, pred, obj"""


def ld_docs_values() -> str:
    rows = ",\n    ".join(
        "({}, '{}')".format(i, h.replace("'", "''")) for i, h in LD_DOCS
    )
    return f"d(doc_id, html) AS (VALUES\n    {rows})"


# --------------------------------------------------------------------- #
# hreflang alternate-language links
# --------------------------------------------------------------------- #

#: attribute order varies in the wild; both orders are matched with
#: one alternation (char-class regex, dialect-neutral).
_HREFLANG_RX = (
    '<link rel="alternate" hreflang="([a-z-]+)" href="([^"]*)"'
    '|<link rel="alternate" href="([^"]*)" hreflang="([a-z-]+)"'
)

HREFLANG_DOCS: list[tuple[str, str]] = [
    ("http://ex.org/en/page",
     '<html><head>'
     '<link rel="alternate" hreflang="de" href="http://ex.org/de/page">'
     '<link rel="alternate" hreflang="fr" href="http://ex.org/fr/page">'
     '<link rel="alternate" href="http://ex.org/es/page" hreflang="es">'
     '<link rel="stylesheet" href="http://ex.org/style.css">'
     "</head></html>"),
    ("http://ex.org/solo",
     "<html><head><title>no alternates</title></head></html>"),
]


def hreflang_docs_df(spark):
    return spark.createDataFrame(HREFLANG_DOCS, "url string, html string")


def hreflang_docs_values() -> str:
    rows = ",\n    ".join(f"('{u}', '{h}')" for u, h in HREFLANG_DOCS)
    return f"d(url, html) AS (VALUES\n    {rows})"


def extract_hreflang(docs) -> "DataFrame":
    """(url, lang, alt_url) — declared alternate-language versions of
    each page: the publisher-asserted page alignment that seeds bitext
    candidate mining BEFORE any content comparison (the STRAND
    link-structure signal).  Both attribute orders matched; non-
    alternate links ignored.  Pure regexp_extract_all projection +
    positional zip — one page scan."""
    langs = F.expr(
        f"regexp_extract_all(html, '{_HREFLANG_RX}', 1)"
    )
    hrefs = F.expr(
        f"regexp_extract_all(html, '{_HREFLANG_RX}', 2)"
    )
    hrefs2 = F.expr(
        f"regexp_extract_all(html, '{_HREFLANG_RX}', 3)"
    )
    langs2 = F.expr(
        f"regexp_extract_all(html, '{_HREFLANG_RX}', 4)"
    )
    z = F.arrays_zip(
        F.concat(langs, langs2).alias("lang"),
        F.concat(hrefs, hrefs2).alias("href"),
    )
    return (
        docs.select("url", F.explode(z).alias("m"))
        .select(
            "url",
            F.col("m.lang").alias("lang"),
            F.col("m.href").alias("alt_url"),
        )
        .filter((F.col("lang") != "") & (F.col("alt_url") != ""))
        .orderBy("url", "lang")
    )


def extract_hreflang_sql(docs_cte: str) -> str:
    """DuckDB twin: same regex, same group-wise zip (each match fills
    either groups 1+2 or 3+4; the empty half drops in the filter)."""
    return f"""
WITH {docs_cte.strip()},
m AS (
  SELECT url,
    unnest(regexp_extract_all(html, '{_HREFLANG_RX}', 1)) AS l1,
    unnest(regexp_extract_all(html, '{_HREFLANG_RX}', 2)) AS h1,
    unnest(regexp_extract_all(html, '{_HREFLANG_RX}', 3)) AS h2,
    unnest(regexp_extract_all(html, '{_HREFLANG_RX}', 4)) AS l2
  FROM d)
SELECT url,
       CASE WHEN l1 <> '' THEN l1 ELSE l2 END AS lang,
       CASE WHEN l1 <> '' THEN h1 ELSE h2 END AS alt_url
FROM m
WHERE (l1 <> '' AND h1 <> '') OR (l2 <> '' AND h2 <> '')
ORDER BY url, lang"""
