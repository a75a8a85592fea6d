"""Horn-rule mining over the knowledge graph — the AMIE family
(Galárraga et al., WWW 2013, public literature) restricted to the
workhorse shape: chain rules of the form

    p(x, y) ∧ q(y, z)  ⇒  r(x, z)

scored by *support* (how many head facts the body derives) and *PCA
confidence* (support divided by body instances whose subject asserts
ANY ``r`` fact — the partial-completeness denominator that keeps
open-world KGs from punishing unknown facts as false).  Mined rules
are the input for link prediction ("acme is based where its office
city is"), error detection (high-confidence rule violations), and the
``construct_rule`` materializer that applies them.

Plan shape — everything is predicate-keyed relational algebra:

1. body paths: ONE self-join of the object-edge table on the chain
   variable ``y`` (shuffle key = join node), deduplicated to distinct
   ``(p, q, x, z)`` bindings — rule instances, not fact multiplicity;
2. head probe: bindings equi-joined to edges on ``(x, z)`` — every
   matching ``r`` yields a candidate rule and the join count IS the
   support (no per-rule iteration: all rules of the shape are scored
   in one pass);
3. PCA denominator: bindings joined to the distinct ``(x, r)``
   subject-predicate pairs — counts body instances where the subject
   has *some* ``r`` fact.

Scale shape: step 1 is the transitive-closure first-hop plan (same
key, same skew levers — hub nodes salt on ``y``); steps 2-3 are
map-side-combinable counting aggs over the binding table.  The rule
lattice never materializes: low-support rules die in the final HAVING
filter, and the binding table is bounded by the two-hop path count the
``join_size_estimate`` advisor prices before running.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import RDF

__all__ = [
    "amie_chain_rules",
    "amie_chain_rules_sql",
    "rule_fixture_df",
    "rule_fixture_cte",
]

_KG = "http://kg.example.org/"


def _u(s: str, p: str, o: str) -> tuple:
    return (_KG + s, _KG + p, _KG + o, "uri", None, None)


#: Planted chain rule worksFor(x,y) ∧ basedIn(y,z) ⇒ livesIn(x,z):
#: three confirming employees, one violating (eve works at acme but
#: lives in paris — a PCA counter-instance, not an unknown), one
#: subject with no livesIn fact at all (frank: unknown under PCA,
#: excluded from the denominator), plus reverse-direction noise edges.
RULE_FIXTURE: list[tuple] = [
    _u("alice", "worksFor", "acme"),
    _u("bob", "worksFor", "acme"),
    _u("carol", "worksFor", "globex"),
    _u("eve", "worksFor", "acme"),
    _u("frank", "worksFor", "globex"),
    _u("acme", "basedIn", "berlin"),
    _u("globex", "basedIn", "paris"),
    _u("alice", "livesIn", "berlin"),
    _u("bob", "livesIn", "berlin"),
    _u("carol", "livesIn", "paris"),
    _u("eve", "livesIn", "paris"),
    _u("berlin", "cityIn", "germany"),
    _u("paris", "cityIn", "france"),
    _u("alice", "citizenOf", "germany"),
    _u("bob", "citizenOf", "germany"),
    _u("carol", "citizenOf", "france"),
]


def rule_fixture_df(spark) -> DataFrame:
    from ..model import triples_df

    return triples_df(spark, RULE_FIXTURE)


def rule_fixture_cte(alias: str = "triples") -> str:
    vals = ",\n    ".join(
        "("
        + ", ".join(
            "CAST(NULL AS VARCHAR)" if v is None else f"'{v}'" for v in r
        )
        + ")"
        for r in RULE_FIXTURE
    )
    return (
        f"{alias}(subj, pred, obj, obj_kind, obj_lang, obj_dt) AS "
        f"(SELECT DISTINCT * FROM (VALUES\n    {vals}))"
    )


def amie_chain_rules(
    triples: DataFrame, min_support: int = 2, min_conf: float = 0.1
) -> DataFrame:
    """(body_p, body_q, head_r, support, n_pca, pca_conf) — chain
    rules ``body_p(x,y) ∧ body_q(y,z) ⇒ head_r(x,z)`` with support >=
    ``min_support`` and PCA confidence >= ``min_conf``.  Trivial
    self-derivations (the head predicate appearing as either body
    atom) are excluded, as are reflexive bindings (x = z)."""
    # edges feeds both body atoms, the head probe, and the PCA pairs;
    # bindings feeds support and PCA — persist both or each consumer
    # recomputes the whole subtree (the engineering notes multi-consumer trap).
    edges = (
        triples.filter(
            F.col("obj_kind").isin("uri", "bnode")
            & (F.col("pred") != RDF.type)
        )
        .select("subj", "pred", "obj")
        .distinct()
        .persist()
    )
    a = edges.select(
        F.col("subj").alias("x"), F.col("pred").alias("p"), F.col("obj").alias("y")
    )
    b = edges.select(
        F.col("subj").alias("y"), F.col("pred").alias("q"), F.col("obj").alias("z")
    )
    bindings = (
        a.join(b, "y")
        .filter(F.col("x") != F.col("z"))
        .select("p", "q", "x", "z")
        .distinct()
        .persist()
    )
    heads = edges.select(
        F.col("subj").alias("x"), F.col("pred").alias("r"), F.col("obj").alias("z")
    )
    support = (
        bindings.join(heads, ["x", "z"])
        .filter((F.col("r") != F.col("p")) & (F.col("r") != F.col("q")))
        .groupBy("p", "q", "r")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    subj_preds = edges.select(
        F.col("subj").alias("x"), F.col("pred").alias("r")
    ).distinct()
    pca = (
        bindings.join(subj_preds, "x")
        .filter((F.col("r") != F.col("p")) & (F.col("r") != F.col("q")))
        .groupBy("p", "q", "r")
        .agg(F.count(F.lit(1)).alias("n_pca"))
    )
    return (
        support.join(pca, ["p", "q", "r"])
        .select(
            F.col("p").alias("body_p"),
            F.col("q").alias("body_q"),
            F.col("r").alias("head_r"),
            "support",
            "n_pca",
            (F.col("support").cast("double") / F.col("n_pca")).alias("pca_conf"),
        )
        .filter(
            (F.col("support") >= min_support)
            & (
                F.col("support").cast("double") / F.col("n_pca")
                >= F.lit(min_conf)
            )
        )
        .orderBy("body_p", "body_q", "head_r")
    )


def rule_predictions(
    triples: DataFrame, min_support: int = 2, min_conf: float = 0.5
) -> DataFrame:
    """(subj, pred, obj, body_p, body_q, pca_conf) — the link-
    prediction output of the mined rules: head facts the rule bodies
    derive that the KG does NOT yet assert, carrying the deriving rule
    and its confidence.  Closes the mine->apply loop the same way
    ``axioms_from_mining`` closes induce->assert: predictions are
    triples-shaped and ready for curation review or a confidence-gated
    merge.

    Plan: re-derive bindings once (same one-shuffle self-join as the
    miner), broadcast the (tiny) accepted-rule table onto them, and
    anti-join the existing facts away — prediction volume is bounded
    by bindings x accepted rules, never corpus x rules."""
    rules = amie_chain_rules(triples, min_support, min_conf).select(
        F.col("body_p").alias("p"),
        F.col("body_q").alias("q"),
        F.col("head_r").alias("r"),
        "pca_conf",
    )
    edges = (
        triples.filter(
            F.col("obj_kind").isin("uri", "bnode")
            & (F.col("pred") != RDF.type)
        )
        .select("subj", "pred", "obj")
        .distinct()
        .persist()
    )
    a = edges.select(
        F.col("subj").alias("x"), F.col("pred").alias("p"), F.col("obj").alias("y")
    )
    b = edges.select(
        F.col("subj").alias("y"), F.col("pred").alias("q"), F.col("obj").alias("z")
    )
    bindings = (
        a.join(b, "y")
        .filter(F.col("x") != F.col("z"))
        .select("p", "q", "x", "z")
        .distinct()
    )
    derived = bindings.join(F.broadcast(rules), ["p", "q"])
    existing = edges.select(
        F.col("subj").alias("x"), F.col("pred").alias("r"), F.col("obj").alias("z")
    )
    return (
        derived.join(existing, ["x", "r", "z"], "left_anti")
        .select(
            F.col("x").alias("subj"),
            F.col("r").alias("pred"),
            F.col("z").alias("obj"),
            F.col("p").alias("body_p"),
            F.col("q").alias("body_q"),
            "pca_conf",
        )
        .orderBy("subj", "pred", "obj", "body_p")
    )


def rule_predictions_sql(
    triples_cte: str = "triples",
    min_support: int = 2,
    min_conf: float = 0.5,
) -> str:
    """DuckDB twin: the miner's CTE chain (shared helper, no string
    surgery on rendered SQL) plus the broadcast-apply and the
    existing-fact anti-join."""
    return f"""{_amie_ctes(triples_cte)},
rules AS MATERIALIZED (
  SELECT sup.p, sup.q, sup.r, support::DOUBLE / n_pca AS pca_conf
  FROM sup JOIN pca ON sup.p = pca.p AND sup.q = pca.q AND sup.r = pca.r
  WHERE support >= {min_support}
    AND support::DOUBLE / n_pca >= {min_conf!r})
SELECT bi.x AS subj, ru.r AS pred, bi.z AS obj,
       bi.p AS body_p, bi.q AS body_q, ru.pca_conf
FROM bindings bi JOIN rules ru ON bi.p = ru.p AND bi.q = ru.q
WHERE NOT EXISTS (
  SELECT 1 FROM edges e
  WHERE e.subj = bi.x AND e.pred = ru.r AND e.obj = bi.z)
ORDER BY subj, pred, obj, body_p"""


def _amie_ctes(triples_cte: str = "triples") -> str:
    """The miner's shared CTE chain (edges -> bindings -> sup -> pca),
    composed by BOTH ``amie_chain_rules_sql`` and
    ``rule_predictions_sql`` — one definition, so a cosmetic edit here
    cannot silently desynchronize the prediction oracle."""
    return f"""
edges AS MATERIALIZED (
  SELECT DISTINCT subj, pred, obj FROM {triples_cte}
  WHERE obj_kind IN ('uri', 'bnode') AND pred <> '{RDF.type}'),
bindings AS MATERIALIZED (
  SELECT DISTINCT a.pred AS p, b.pred AS q, a.subj AS x, b.obj AS z
  FROM edges a JOIN edges b ON a.obj = b.subj
  WHERE a.subj <> b.obj),
sup AS (
  SELECT bi.p, bi.q, h.pred AS r, count(*)::BIGINT AS support
  FROM bindings bi JOIN edges h ON bi.x = h.subj AND bi.z = h.obj
  WHERE h.pred <> bi.p AND h.pred <> bi.q
  GROUP BY 1, 2, 3),
sp AS (SELECT DISTINCT subj AS x, pred AS r FROM edges),
pca AS (
  SELECT bi.p, bi.q, sp.r, count(*)::BIGINT AS n_pca
  FROM bindings bi JOIN sp ON bi.x = sp.x
  WHERE sp.r <> bi.p AND sp.r <> bi.q
  GROUP BY 1, 2, 3)"""


def amie_chain_rules_sql(
    triples_cte: str = "triples",
    min_support: int = 2,
    min_conf: float = 0.1,
) -> str:
    """DuckDB twin over a 6-column ``triples`` relation; identical
    binding/support/PCA cascade."""
    return f"""{_amie_ctes(triples_cte)}
SELECT sup.p AS body_p, sup.q AS body_q, sup.r AS head_r,
       support, n_pca,
       support::DOUBLE / n_pca AS pca_conf
FROM sup JOIN pca ON sup.p = pca.p AND sup.q = pca.q AND sup.r = pca.r
WHERE support >= {min_support}
  AND support::DOUBLE / n_pca >= {min_conf!r}
ORDER BY body_p, body_q, head_r"""
