"""Cross-graph ontology alignment proposals.

The precursor to the reference's merge/conflict machinery
(``ontology_manager.py`` merge modes; repo ``operators/setops.py``):
before two ontologies can be merged, matching entities must be FOUND.
:func:`align_entities` proposes (uri_a, uri_b, score, evidence) matches
between same-kind entities of two graphs using three cascading
signals — exact normalized rdfs:label match, exact local-name match,
and token-Jaccard label overlap — keeping the strongest evidence per
pair.  Classic label-based ontology matching (the anchor stage of
systems like PARIS / LogMap, public literature).

Scale shape: entity/label tables are vocabulary-sized relative to
instance data, but at web scale an *induced* schema can still hold
millions of classes, so every signal is an equi-join on a normalized
key (label_norm / name_norm / token), never an O(n²) similarity pass.
The token join carries a document-frequency guard: tokens more common
than ``max_token_df`` in either graph (stopword-like, join-exploding)
are dropped — the same hot-bucket cap as MinHash-LSH linking
(pipeline/linking.py), applied before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import OWL, RDF, RDFS, local_name_col

__all__ = ["align_entities", "align_entities_sql"]

_KINDS = (OWL.Class, OWL.ObjectProperty, OWL.DatatypeProperty)
_TOKEN_SPLIT = "[^a-z0-9]+"


def _entities(triples: DataFrame, kinds) -> DataFrame:
    """(uri, kind, name_norm, label_norm) — one row per typed entity;
    label is the deterministic min rdfs:label."""
    typed = (
        triples.filter(
            (F.col("pred") == RDF.type) & F.col("obj").isin(list(kinds))
        )
        .select(F.col("subj").alias("uri"), F.col("obj").alias("kind"))
        .distinct()
    )
    labels = (
        triples.filter(F.col("pred") == RDFS.label)
        .groupBy(F.col("subj").alias("uri"))
        .agg(F.min("obj").alias("label"))
    )
    return typed.join(labels, "uri", "left").select(
        "uri",
        "kind",
        F.lower(local_name_col(F.col("uri"))).alias("name_norm"),
        F.lower(F.trim(F.col("label"))).alias("label_norm"),
    )


def align_entities(
    a: DataFrame,
    b: DataFrame,
    kinds=_KINDS,
    min_jaccard: float = 0.5,
    max_token_df: int = 1000,
) -> DataFrame:
    """(uri_a, uri_b, kind, score, evidence) alignment proposals.

    evidence ∈ {'label', 'name', 'tokens'} by decreasing strength;
    label/name matches score 1.0, token matches score their Jaccard
    (≥ ``min_jaccard``).  One row per (uri_a, uri_b) — the strongest
    evidence wins."""
    ea = _entities(a, kinds)
    eb = _entities(b, kinds)

    lab = (
        ea.filter(F.col("label_norm").isNotNull())
        .alias("x")
        .join(
            eb.filter(F.col("label_norm").isNotNull()).alias("y"),
            ["kind", "label_norm"],
        )
        .select(
            F.col("x.uri").alias("uri_a"),
            F.col("y.uri").alias("uri_b"),
            "kind",
            F.lit(1.0).alias("score"),
            F.lit(3).alias("rank"),
        )
    )
    nam = (
        ea.alias("x")
        .join(eb.alias("y"), ["kind", "name_norm"])
        .select(
            F.col("x.uri").alias("uri_a"),
            F.col("y.uri").alias("uri_b"),
            "kind",
            F.lit(1.0).alias("score"),
            F.lit(2).alias("rank"),
        )
    )

    def _tokens(e: DataFrame, side: str) -> DataFrame:
        toks = e.filter(F.col("label_norm").isNotNull()).select(
            F.col("uri").alias(f"uri_{side}"),
            "kind",
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(F.col("label_norm"), _TOKEN_SPLIT),
                        lambda t: t != "",
                    )
                )
            ).alias("token"),
        )
        # stopword-like token guard: drop high-DF tokens pre-shuffle
        df_counts = toks.groupBy("kind", "token").agg(
            F.count(F.lit(1)).alias("df")
        )
        hot = df_counts.filter(F.col("df") > max_token_df).select(
            "kind", "token"
        )
        return toks.join(F.broadcast(hot), ["kind", "token"], "left_anti")

    ta, tb = _tokens(ea, "a"), _tokens(eb, "b")
    na = ta.groupBy("uri_a").agg(F.count(F.lit(1)).alias("n_a"))
    nb = tb.groupBy("uri_b").agg(F.count(F.lit(1)).alias("n_b"))
    shared = (
        ta.join(tb, ["kind", "token"])
        .groupBy("uri_a", "uri_b", "kind")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    jac = (
        shared.join(F.broadcast(na), "uri_a")
        .join(F.broadcast(nb), "uri_b")
        .withColumn(
            "score",
            F.col("n_shared")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        )
        .filter(F.col("score") >= min_jaccard)
        .select("uri_a", "uri_b", "kind", "score", F.lit(1).alias("rank"))
    )

    allm = lab.unionByName(nam).unionByName(jac)
    best = (
        allm.groupBy("uri_a", "uri_b", "kind")
        .agg(F.max(F.struct("score", "rank")).alias("s"))
        .select(
            "uri_a",
            "uri_b",
            "kind",
            F.col("s.score").alias("score"),
            F.element_at(
                F.lit(["tokens", "name", "label"]), F.col("s.rank")
            ).alias("evidence"),
        )
        .orderBy("uri_a", "uri_b")
    )
    return best


def align_entities_sql(
    cte_a: str,
    cte_b: str,
    kinds=_KINDS,
    min_jaccard: float = 0.5,
    max_token_df: int = 1000,
) -> str:
    """DuckDB twin.  ``cte_a``/``cte_b`` are WITH-clause bodies naming
    relations ``ta``/``tb`` with triple columns."""
    kind_list = ", ".join(f"'{k}'" for k in kinds)

    def ent(src: str, name: str) -> str:
        return f"""
{name} AS MATERIALIZED (
  SELECT t.subj AS uri, t.obj AS kind,
    lower(coalesce(nullif(regexp_extract(t.subj, '([^/#]+)$', 1), ''),
                   t.subj)) AS name_norm,
    lower(trim(l.label)) AS label_norm
  FROM (SELECT DISTINCT subj, obj FROM {src}
        WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
          AND obj IN ({kind_list})) t
  LEFT JOIN (SELECT subj, min(obj) AS label FROM {src}
             WHERE pred = 'http://www.w3.org/2000/01/rdf-schema#label'
             GROUP BY subj) l ON t.subj = l.subj)"""

    def toks(ename: str, name: str, side: str) -> str:
        return f"""
{name}0 AS (
  SELECT uri AS uri_{side}, kind, tok AS token
  FROM {ename}, unnest(list_distinct(list_filter(
       string_split_regex(label_norm, '{_TOKEN_SPLIT}'),
       x -> x <> ''))) AS u(tok)
  WHERE label_norm IS NOT NULL),
{name} AS MATERIALIZED (
  SELECT * FROM {name}0
  WHERE NOT EXISTS (
    SELECT 1 FROM {name}0 h
    WHERE h.kind = {name}0.kind AND h.token = {name}0.token
    GROUP BY h.kind, h.token HAVING count(*) > {max_token_df}))"""

    return f"""{cte_a},{cte_b},{ent("ta", "ea")},{ent("tb", "eb")},{toks("ea", "toka", "a")},{toks("eb", "tokb", "b")},
lab AS (
  SELECT x.uri AS uri_a, y.uri AS uri_b, x.kind,
         1.0::DOUBLE AS score, 3 AS rank
  FROM ea x JOIN eb y
    ON x.kind = y.kind AND x.label_norm = y.label_norm
  WHERE x.label_norm IS NOT NULL AND y.label_norm IS NOT NULL),
nam AS (
  SELECT x.uri, y.uri, x.kind, 1.0::DOUBLE, 2
  FROM ea x JOIN eb y
    ON x.kind = y.kind AND x.name_norm = y.name_norm),
na AS (SELECT uri_a, count(*) AS n_a FROM toka GROUP BY 1),
nb AS (SELECT uri_b, count(*) AS n_b FROM tokb GROUP BY 1),
jac AS (
  SELECT s.uri_a, s.uri_b, s.kind,
    s.n_shared::DOUBLE / (na.n_a + nb.n_b - s.n_shared) AS score, 1
  FROM (SELECT a.uri_a, b.uri_b, a.kind, count(*) AS n_shared
        FROM toka a JOIN tokb b
          ON a.kind = b.kind AND a.token = b.token
        GROUP BY 1, 2, 3) s
  JOIN na ON s.uri_a = na.uri_a
  JOIN nb ON s.uri_b = nb.uri_b
  WHERE s.n_shared::DOUBLE / (na.n_a + nb.n_b - s.n_shared)
        >= {min_jaccard}),
allm AS (
  SELECT * FROM lab UNION ALL SELECT * FROM nam
  UNION ALL SELECT * FROM jac)
SELECT uri_a, uri_b, kind,
  (max({{'score': score, 'rank': rank}})).score AS score,
  (['tokens', 'name', 'label'])[
    (max({{'score': score, 'rank': rank}})).rank] AS evidence
FROM allm
GROUP BY uri_a, uri_b, kind
ORDER BY uri_a, uri_b
"""
