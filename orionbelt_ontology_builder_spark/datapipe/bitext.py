"""Bitext / comparable-document candidate mining — the STRAND family
(Resnik & Smith 2003, public literature): translated or parallel pages
betray themselves through language-INDEPENDENT anchor tokens (numbers,
dates, proper names, product codes) that survive translation
verbatim.  Machine-translation training data starts from exactly this
candidate generation over a web crawl.

Anchor rule (data-derived, no external lexicon): a token is an anchor
if it contains a digit, OR if it occurs in documents of at least two
different languages (cross-lingual document frequency — names travel,
function words don't).  Candidates are cross-language document pairs
sharing >= ``min_shared`` distinct anchors.

Plan shape: one token explode feeds (a) the cross-lingual-df anchor
table (two keyed aggs) and (b) the anchor postings; candidate pairs
come from the postings self-join — an inverted index equi-join on the
anchor, the same sum(df^2)-bounded shape as ``sparse_cosine_pairs``,
with the identical ``max_df`` guard against stop-anchor blowup
("2024" appearing in half the crawl must not generate n^2 pairs;
a df-capped anchor simply stops being evidence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import _exploded_terms

__all__ = ["bitext_candidates", "bitext_candidates_sql"]


def bitext_candidates(
    docs: DataFrame, min_shared: int = 2, max_df: int = 50
) -> DataFrame:
    """(doc_a, doc_b, lang_a, lang_b, n_shared) — cross-language
    document pairs sharing >= ``min_shared`` distinct anchor tokens;
    ``doc_a < doc_b``; anchors with document frequency > ``max_df``
    are dropped before the pair join (skew guard, one stage early)."""
    toks = (
        _exploded_terms(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "term")
        .distinct()
        .persist()  # consumers: anchor table + postings
    )
    cross_df = (
        toks.groupBy("term")
        .agg(
            F.count_distinct("lang").alias("n_langs"),
            F.count(F.lit(1)).alias("df"),
        )
        .filter(
            (F.col("df") <= max_df)
            & ((F.col("n_langs") >= 2) | F.col("term").rlike("[0-9]"))
        )
        .select("term")
    )
    post = toks.join(F.broadcast(cross_df), "term")
    a = post.select(
        F.col("doc_id").alias("doc_a"), F.col("lang").alias("lang_a"), "term"
    )
    b = post.select(
        F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b"), "term"
    )
    return (
        a.join(b, "term")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("lang_a") != F.col("lang_b"))
        )
        .groupBy("doc_a", "doc_b", "lang_a", "lang_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .orderBy("doc_a", "doc_b")
    )


def bitext_candidates_sql(
    docs_cte: str, min_shared: int = 2, max_df: int = 50
) -> str:
    """DuckDB twin; ``docs_cte`` must define ``d(doc_id, lang, text)``
    (normalized like the engine's norm_sql)."""
    from .textstats import norm_sql, tokens_sql

    return f"""
WITH {docs_cte.strip()},
ex AS (
  SELECT doc_id, lang, unnest({tokens_sql(norm_sql())}) AS term FROM d),
toks AS MATERIALIZED (
  SELECT DISTINCT doc_id, lang, term FROM ex WHERE term <> ''),
anchors AS (
  SELECT term FROM toks
  GROUP BY term
  HAVING count(*) <= {max_df}
     AND (count(DISTINCT lang) >= 2 OR regexp_matches(term, '[0-9]'))),
post AS MATERIALIZED (
  SELECT t.* FROM toks t JOIN anchors a ON t.term = a.term)
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       x.lang AS lang_a, y.lang AS lang_b,
       count(*)::BIGINT AS n_shared
FROM post x JOIN post y
  ON x.term = y.term AND x.doc_id < y.doc_id AND x.lang <> y.lang
GROUP BY 1, 2, 3, 4
HAVING count(*) >= {min_shared}
ORDER BY doc_a, doc_b"""


#: Comparable-corpus fixture: one 3-language parallel cluster, one
#: 2-language cluster, a cross-language single-anchor pair ("mild" —
#: below min_shared, must NOT surface), and monolingual noise.
BITEXT_DOCS: list[tuple[int, str, str]] = [
    (0, "en", "acme opened 3 new plants in berlin during 1998"),
    (1, "de", "acme eroeffnete 1998 in berlin 3 neue werke"),
    (2, "fr", "acme a ouvert 3 usines a berlin en 1998"),
    (3, "en", "the weather was mild and dry all spring"),
    (4, "de", "das wetter war mild und trocken"),
    (5, "en", "globex shipped 500 units to paris in 2001"),
    (6, "fr", "globex a expedie 500 unites a paris en 2001"),
    (7, "de", "der markt blieb ruhig ohne zahlen"),
]


def bitext_docs_df(spark) -> DataFrame:
    return spark.createDataFrame(
        BITEXT_DOCS, "doc_id long, lang string, text string"
    )


def bitext_docs_values() -> str:
    rows = ",\n    ".join(
        f"({i}, '{lang}', '{t}')" for i, lang, t in BITEXT_DOCS
    )
    return f"d(doc_id, lang, text) AS (VALUES\n    {rows})"
