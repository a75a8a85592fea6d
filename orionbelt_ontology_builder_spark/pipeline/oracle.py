"""DuckDB arithmetic twins of the KG pipeline's north-star outputs.

The page synthesizer (``pipeline/pages.py``) is pure id-keyed
arithmetic, so every pipeline output has an INDEPENDENT SQL derivation:
these oracles replay the word-list formulas in DuckDB — template string
assembly instead of the regex HTML extractor, normalized-key grouping
instead of MinHash-LSH + connected components — and must agree with the
Spark pipeline bit-for-bit.  That agreement is exactly the P/R=1.0
argument (pipeline/linking.py margin story) made driver-checkable:

* same-entity alias variants normalize (strip ``-``/space, lowercase)
  to ONE string -> Jaccard 1.0 -> always verified-linked, so a
  connected component is precisely a normalized-key group;
* cross-entity Jaccard is bounded ~0.7 by the digit-suffix windows,
  under the 0.9 verify threshold, so no component ever spans keys;
* the CC representative is the component min, i.e. the group min.

Reference analogue: ontology_manager.py:517-528 (get_class_hierarchy
materialization — the reference's north-star output this pipeline
re-expresses at crawl scale).
"""

from __future__ import annotations

from . import pages as P


def _list_sql(words: list[str]) -> str:
    inner = ", ".join("'" + w.replace("'", "''") + "'" for w in words)
    return f"[{inner}]"


def _base_ctes(n_pages: int) -> str:
    """Shared CTEs: page ids, entity alias surfaces, class/taxonomy rows.

    ``al(e, j, s)`` enumerates the three surface forms of every entity;
    ``px(i, e)`` maps page id -> subject entity — both straight from the
    ``pages.py`` formulas (entity_aliases / n_entities / page_sentences).
    """
    k = P.n_entities(n_pages)
    wa, wb, wc = _list_sql(P.WORDS_A), _list_sql(P.WORDS_B), _list_sql(P.WORDS_C)
    cls = _list_sql(P.CLASS_NAMES)
    tax_rows = ", ".join(
        f"({i}, '{c}', '{p}', '{a}')" for i, (c, p, a) in enumerate(P.TAXONOMY)
    )
    return f"""
ents AS (
  SELECT e,
    {wa}[(e % 29)::INT + 1] AS a,
    {wb}[(e % 31)::INT + 1] || {wc}[(e % 37)::INT + 1] AS bc,
    lpad(e::VARCHAR, 4, '0') AS sf
  FROM (SELECT unnest(range({k})) AS e)),
al AS MATERIALIZED (
  SELECT e, j,
    CASE j WHEN 0 THEN a || bc || sf
           WHEN 1 THEN a || ' ' || bc || sf
           ELSE a || bc || '-' || sf END AS s
  FROM ents, (SELECT unnest([0, 1, 2]) AS j)),
cls AS (
  SELECT ci, {cls}[ci::INT + 1] AS c
  FROM (SELECT unnest(range({len(P.CLASS_NAMES)})) AS ci)),
tax(idx, child, parent, article) AS (VALUES {tax_rows}),
px AS (SELECT i, i % {k} AS e
       FROM (SELECT unnest(range({n_pages})) AS i))"""


def _raw_triples_cte(n_pages: int) -> str:
    """``tr(subj, pred, obj)`` — the extractor's expected output,
    derived from the sentence formulas (page_sentences) rather than by
    parsing HTML."""
    k = P.n_entities(n_pages)
    return f"""
tr AS MATERIALIZED (
  SELECT s1.s AS subj, 'locatedIn' AS pred, s2.s AS obj
  FROM px
  JOIN al s1 ON s1.e = px.e AND s1.j = px.i % 3
  JOIN al s2 ON s2.e = (7 * px.e + 3) % {k} AND s2.j = (px.i // 3) % 3
  UNION ALL
  SELECT s1.s, 'worksWith', s2.s
  FROM px
  JOIN al s1 ON s1.e = px.e AND s1.j = (px.i + 1) % 3
  JOIN al s2 ON s2.e = (13 * px.e + 5) % {k} AND s2.j = (px.i // 2) % 3
  UNION ALL
  SELECT s1.s, 'type', cls.c
  FROM px
  JOIN al s1 ON s1.e = px.e AND s1.j = (px.i + 2) % 3
  JOIN cls ON cls.ci = px.e % {len(P.CLASS_NAMES)}
  UNION ALL
  SELECT t.child, 'subClassOf', t.parent
  FROM px JOIN tax t ON t.idx = (px.i // 7) % {len(P.TAXONOMY)}
  WHERE px.i % 7 = 0)"""


def _cmap_cte() -> str:
    """``cmap(mention, canonical)`` — component = normalized-key group,
    representative = group min; groups of one mention have no sameAs
    pair and never reach connected components (see module docstring)."""
    return """
ment AS (
  SELECT DISTINCT subj AS m FROM tr
  UNION SELECT DISTINCT obj FROM tr),
keyed AS (
  SELECT m, lower(replace(replace(m, '-', ''), ' ', '')) AS nk FROM ment),
grp AS (
  SELECT nk, min(m) AS canon, count(*) AS n FROM keyed GROUP BY nk),
cmap AS MATERIALIZED (
  SELECT keyed.m AS mention, grp.canon AS canonical
  FROM keyed JOIN grp USING (nk) WHERE grp.n >= 2)"""


def kg_edges_sql(n_pages: int) -> str:
    return f"""
WITH {_base_ctes(n_pages)}, {_raw_triples_cte(n_pages)}, {_cmap_cte()}
SELECT DISTINCT
  coalesce(c1.canonical, tr.subj) AS subj,
  pred,
  coalesce(c2.canonical, tr.obj) AS obj
FROM tr
LEFT JOIN cmap c1 ON c1.mention = tr.subj
LEFT JOIN cmap c2 ON c2.mention = tr.obj
ORDER BY subj, pred, obj"""


def kg_canonical_map_sql(n_pages: int) -> str:
    return f"""
WITH {_base_ctes(n_pages)}, {_raw_triples_cte(n_pages)}, {_cmap_cte()}
SELECT mention, canonical FROM cmap ORDER BY mention"""


def kg_class_hierarchy_sql(n_pages: int) -> str:
    return f"""
WITH {_base_ctes(n_pages)}, {_raw_triples_cte(n_pages)}, {_cmap_cte()}
SELECT DISTINCT
  coalesce(c1.canonical, tr.subj) AS child,
  coalesce(c2.canonical, tr.obj) AS parent
FROM tr
LEFT JOIN cmap c1 ON c1.mention = tr.subj
LEFT JOIN cmap c2 ON c2.mention = tr.obj
WHERE pred = 'subClassOf'
ORDER BY child, parent"""


def page_text_extract_sql(n_pages: int) -> str:
    """(url, md5(text)) — expected extracted text assembled DIRECTLY
    from the sentence/nav/footer templates (no HTML, no regex pipeline),
    differential against html_to_text over the synthesized bytes."""
    k = P.n_entities(n_pages)
    filler = _list_sql(P.FILLER)
    return f"""
WITH {_base_ctes(n_pages)},
sent AS (
  SELECT px.i,
    s1.s || ' is located in ' || s2.s || '.' AS loc_line,
    w1.s || ' works with ' || w2.s || '.' AS wrk_line,
    CASE WHEN px.i % 7 = 0
         THEN 'Every ' || t.child || ' is ' || t.article || ' ' ||
              t.parent || '.' END AS tax_line,
    t1.s || ' is ' ||
      CASE WHEN substr(cls.c, 1, 1) IN ('A','E','I','O','U')
           THEN 'an' ELSE 'a' END || ' ' || cls.c || '.' AS typ_line,
    {filler}[(px.i % {len(P.FILLER)})::INT + 1] || '.' AS fil_line
  FROM px
  JOIN al s1 ON s1.e = px.e AND s1.j = px.i % 3
  JOIN al s2 ON s2.e = (7 * px.e + 3) % {k} AND s2.j = (px.i // 3) % 3
  JOIN al w1 ON w1.e = px.e AND w1.j = (px.i + 1) % 3
  JOIN al w2 ON w2.e = (13 * px.e + 5) % {k} AND w2.j = (px.i // 2) % 3
  JOIN al t1 ON t1.e = px.e AND t1.j = (px.i + 2) % 3
  JOIN cls ON cls.ci = px.e % {len(P.CLASS_NAMES)}
  JOIN tax t ON t.idx = (px.i // 7) % {len(P.TAXONOMY)})
SELECT
  'https://site' || (i % {P.N_SITES})::VARCHAR || '.example/page/'
    || i::VARCHAR AS url,
  md5(concat_ws(chr(10),
    'Bulletin ' || i::VARCHAR,
    'Home | Archive | About | Bulletin ' || (i // 2)::VARCHAR ||
      ' | Bulletin ' || (i + {P.N_SITES})::VARCHAR,
    'Bulletin ' || i::VARCHAR,
    loc_line, wrk_line, tax_line, typ_line, fil_line,
    '&copy; Bulletin syndicate & co')) AS text_md5
FROM sent
ORDER BY url"""
