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

__all__ = [
    "align_entities",
    "align_entities_sql",
    "fs_weights",
    "fs_weights_sql",
    "fs_pair_scores",
    "fs_pair_scores_sql",
    "golden_records",
    "golden_records_sql",
    "paris_matches",
    "paris_matches_sql",
    "paris_fixture_df",
    "paris_fixture_cte",
    "property_alignment",
    "property_alignment_sql",
    "propalign_fixture_df",
    "propalign_fixture_cte",
]

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


# ---------------------------------------------------------------------------
# Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter 1969,
# public literature; the scoring model behind Splink/dedupe-style ER).
# Complements the MinHash-LSH blocking in pipeline/linking.py: blocking
# proposes candidate pairs, FS turns per-field agreement patterns into
# a calibrated log-likelihood match score.
# ---------------------------------------------------------------------------


def fs_weights(pairs: DataFrame, fields: list[str]) -> DataFrame:
    """(field, m_prob, u_prob, w_agree, w_disagree) — per-field
    Fellegi-Sunter parameters estimated from a labeled candidate-pair
    set: ``m = P(agree | match)``, ``u = P(agree | non-match)``, both
    add-1 smoothed so the log-weights are always finite;
    ``w_agree = ln(m/u)``, ``w_disagree = ln((1-m)/(1-u))``.

    ``pairs`` carries ``is_match`` (0/1) plus one 0/1 agreement column
    per entry of ``fields``.

    Scale shape: ONE conditional-aggregation pass over the pair table
    (2 sums per field + 2 totals, all map-side combinable) collapses
    to a single row; the per-field explode is a ``stack`` over that
    row — constant-size, no second scan."""
    aggs = [
        F.sum("is_match").alias("n_match"),
        F.count(F.lit(1)).alias("n_pairs"),
    ]
    for f in fields:
        aggs.append(
            F.sum(F.when(F.col("is_match") == 1, F.col(f)).otherwise(0)).alias(
                f"am_{f}"
            )
        )
        aggs.append(
            F.sum(F.when(F.col("is_match") == 0, F.col(f)).otherwise(0)).alias(
                f"au_{f}"
            )
        )
    row = pairs.agg(*aggs)
    mu_cols = []
    for f in fields:
        mu_cols.append(
            ((F.col(f"am_{f}") + F.lit(1.0)) / (F.col("n_match") + F.lit(2.0)))
            .alias(f"m_{f}")
        )
        mu_cols.append(
            (
                (F.col(f"au_{f}") + F.lit(1.0))
                / ((F.col("n_pairs") - F.col("n_match")) + F.lit(2.0))
            ).alias(f"u_{f}")
        )
    wide = row.select(*mu_cols)
    stack = "stack({n}, {args}) as (field, m_prob, u_prob)".format(
        n=len(fields),
        args=", ".join(f"'{f}', m_{f}, u_{f}" for f in fields),
    )
    return (
        wide.select(F.expr(stack))
        .select(
            "field",
            "m_prob",
            "u_prob",
            F.log(F.col("m_prob") / F.col("u_prob")).alias("w_agree"),
            F.log(
                (F.lit(1.0) - F.col("m_prob")) / (F.lit(1.0) - F.col("u_prob"))
            ).alias("w_disagree"),
        )
        .orderBy("field")
    )


def fs_weights_sql(pairs_cte: str, fields: list[str]) -> str:
    """DuckDB twin: one agg CTE + per-field UNION ALL arms (same
    doubles as Spark's stack over the identical agg row)."""
    sums = ",\n    ".join(
        f"sum(CASE WHEN is_match = 1 THEN {f} ELSE 0 END) AS am_{f},\n"
        f"    sum(CASE WHEN is_match = 0 THEN {f} ELSE 0 END) AS au_{f}"
        for f in fields
    )
    arms = "\n  UNION ALL ".join(
        f"SELECT '{f}' AS field,\n"
        f"    (am_{f} + 1.0) / (n_match + 2.0) AS m_prob,\n"
        f"    (au_{f} + 1.0) / ((n_pairs - n_match) + 2.0) AS u_prob\n"
        f"  FROM agg"
        for f in fields
    )
    return f"""
WITH {pairs_cte.strip()},
agg AS (
  SELECT sum(is_match) AS n_match, count(*) AS n_pairs,
    {sums}
  FROM pairs),
mu AS (
  {arms})
SELECT field, m_prob, u_prob,
  ln(m_prob / u_prob) AS w_agree,
  ln((1.0 - m_prob) / (1.0 - u_prob)) AS w_disagree
FROM mu ORDER BY field
"""


def fs_pair_scores(pairs: DataFrame, fields: list[str]) -> DataFrame:
    """(id_a, id_b, is_match, n_agree, score) — every candidate pair
    scored with the Fellegi-Sunter log-likelihood: agreement on field
    f contributes ``w_agree_f``, disagreement ``w_disagree_f`` (both
    from :func:`fs_weights`' smoothed m/u estimates over the same pair
    set).  Threshold on ``score`` to split link / possible / non-link.

    Scale shape: the weights are ONE broadcast row (the same single
    agg pass as fs_weights, never materializing the per-field table),
    so scoring is a pure projection over the pair table — zero extra
    shuffles after blocking."""
    aggs = [
        F.sum("is_match").alias("n_match"),
        F.count(F.lit(1)).alias("n_pairs"),
    ]
    for f in fields:
        aggs.append(
            F.sum(F.when(F.col("is_match") == 1, F.col(f)).otherwise(0)).alias(
                f"am_{f}"
            )
        )
        aggs.append(
            F.sum(F.when(F.col("is_match") == 0, F.col(f)).otherwise(0)).alias(
                f"au_{f}"
            )
        )
    w_cols = []
    for f in fields:
        m = (F.col(f"am_{f}") + F.lit(1.0)) / (F.col("n_match") + F.lit(2.0))
        u = (F.col(f"au_{f}") + F.lit(1.0)) / (
            (F.col("n_pairs") - F.col("n_match")) + F.lit(2.0)
        )
        w_cols.append(F.log(m / u).alias(f"wa_{f}"))
        w_cols.append(
            F.log((F.lit(1.0) - m) / (F.lit(1.0) - u)).alias(f"wd_{f}")
        )
    weights = pairs.agg(*aggs).select(*w_cols)

    score = None
    n_agree = None
    for f in fields:
        term = F.when(F.col(f) == 1, F.col(f"wa_{f}")).otherwise(
            F.col(f"wd_{f}")
        )
        score = term if score is None else score + term
        n_agree = F.col(f) if n_agree is None else n_agree + F.col(f)
    return (
        pairs.crossJoin(F.broadcast(weights))
        .select(
            "id_a",
            "id_b",
            "is_match",
            n_agree.alias("n_agree"),
            score.alias("score"),
        )
        .orderBy("id_a", "id_b")
    )


def fs_pair_scores_sql(pairs_cte: str, fields: list[str]) -> str:
    """DuckDB twin: identical one-row weight CTE cross-joined in; the
    score's addition order follows ``fields`` order on both sides so
    the doubles are bit-stable."""
    sums = ",\n    ".join(
        f"sum(CASE WHEN is_match = 1 THEN {f} ELSE 0 END) AS am_{f},\n"
        f"    sum(CASE WHEN is_match = 0 THEN {f} ELSE 0 END) AS au_{f}"
        for f in fields
    )
    w_exprs = ",\n    ".join(
        f"ln(((am_{f} + 1.0) / (n_match + 2.0))"
        f" / ((au_{f} + 1.0) / ((n_pairs - n_match) + 2.0))) AS wa_{f},\n"
        f"    ln((1.0 - ((am_{f} + 1.0) / (n_match + 2.0)))"
        f" / (1.0 - ((au_{f} + 1.0) / ((n_pairs - n_match) + 2.0))))"
        f" AS wd_{f}"
        for f in fields
    )
    n_agree = " + ".join(f"p.{f}" for f in fields)
    score = " + ".join(
        f"CASE WHEN p.{f} = 1 THEN w.wa_{f} ELSE w.wd_{f} END"
        for f in fields
    )
    return f"""
WITH {pairs_cte.strip()},
agg AS (
  SELECT sum(is_match) AS n_match, count(*) AS n_pairs,
    {sums}
  FROM pairs),
w AS (
  SELECT
    {w_exprs}
  FROM agg)
SELECT p.id_a, p.id_b, p.is_match,
  ({n_agree})::BIGINT AS n_agree,
  {score} AS score
FROM pairs p CROSS JOIN w
ORDER BY p.id_a, p.id_b
"""


def golden_records(
    records: DataFrame,
    fields: list[str],
    cluster: str = "cluster_id",
    ts: str = "ts",
    rec_id: str = "rec_id",
) -> DataFrame:
    """(cluster_id, n_records, <fields...>) — survivorship / golden-
    record construction, the step AFTER entity resolution: each
    cluster's member records merge into one canonical record by
    per-field "latest non-null wins" (recency by ``ts``, ties broken
    by ``rec_id`` — a total order, so the winner is deterministic).
    NULL fields never win: an old record's populated value beats a
    newer record's missing one — the standard MDM survivorship rule.

    Scale shape: ONE aggregation keyed on the cluster id — every
    field's winner is a conditional struct-max riding the same shuffle
    with map-side partials (max ignores the NULL the when() leaves on
    null-field rows); no window, no per-field self-joins."""
    aggs = [F.count(F.lit(1)).alias("n_records")]
    for f in fields:
        aggs.append(
            F.max(
                F.when(
                    F.col(f).isNotNull(),
                    F.struct(
                        F.col(ts).alias("t"),
                        F.col(rec_id).alias("r"),
                        F.col(f).alias("v"),
                    ),
                )
            ).alias(f"w_{f}")
        )
    g = records.groupBy(F.col(cluster)).agg(*aggs)
    return g.select(
        cluster,
        "n_records",
        *[F.col(f"w_{f}.v").alias(f) for f in fields],
    ).orderBy(cluster)


def golden_records_sql(
    records_cte: str,
    fields: list[str],
    cluster: str = "cluster_id",
    ts: str = "ts",
    rec_id: str = "rec_id",
) -> str:
    """DuckDB twin; ``records_cte`` defines ``records(...)``.  max over
    CASE-guarded structs ignores NULLs exactly like Spark."""
    winners = ",\n  ".join(
        f"(max(CASE WHEN {f} IS NOT NULL THEN "
        f"struct_pack(t := {ts}, r := {rec_id}, v := {f}) END)).v AS {f}"
        for f in fields
    )
    return f"""
WITH {records_cte.strip()}
SELECT {cluster}, count(*)::BIGINT AS n_records,
  {winners}
FROM records
GROUP BY {cluster}
ORDER BY {cluster}
"""


# ---------------------------------------------------------------------------
# PARIS-style probabilistic instance alignment (Suchanek, Abiteboul &
# Senellart, VLDB 2012, public literature).  The VALUE-evidence
# complement to label-based align_entities: two instances from
# different graphs are the same entity when they share FACTS, and a
# shared fact is strong evidence exactly when few entities carry it
# (inverse functionality).  The reference workbench has no cross-graph
# instance matcher at all — its merge modes (ontology_manager.py merge/
# MERGE_OVERWRITE) assume URIs already agree; this operator produces
# the sameAs candidates that make such a merge sound.
# ---------------------------------------------------------------------------

_PARIS_A_NS = "http://a.example.org/"
_PARIS_B_NS = "http://b.example.org/"
_PARIS_EX = "http://schema.test.org/"


def _pa(n: str) -> str:
    return _PARIS_A_NS + n


def _pb(n: str) -> str:
    return _PARIS_B_NS + n


def _px(n: str) -> str:
    return _PARIS_EX + n


#: Two small instance graphs about (partially) the same people.
#: alice↔alice_smith share a UNIQUE email (functional ⇒ near-proof);
#: bob↔robert a unique phone; carol↔carola only low-functionality
#: facts (city, job) ⇒ a moderate score; the shared rdf:type Person
#: fact is carried by everyone ⇒ weight 1/25, evidence ~nil.
PARIS_A: list[tuple] = []
PARIS_B: list[tuple] = []


def _paris_build() -> None:
    from ..model import RDF, t_lit, t_uri

    person = _px("Person")
    for ns, rows, facts in (
        (
            _pa,
            PARIS_A,
            [
                ("alice", "email", "alice@example.org"),
                ("alice", "city", "berlin"),
                ("alice", "job", "engineer"),
                ("bob", "phone", "555-0199"),
                ("bob", "city", "berlin"),
                ("bob", "job", "engineer"),
                ("carol", "city", "berlin"),
                ("carol", "job", "teacher"),
                ("dave", "email", "dave@example.org"),
                ("dave", "city", "munich"),
                ("erin", "city", "munich"),
                ("erin", "job", "teacher"),
            ],
        ),
        (
            _pb,
            PARIS_B,
            [
                ("alice_smith", "email", "alice@example.org"),
                ("alice_smith", "city", "berlin"),
                ("robert", "phone", "555-0199"),
                ("robert", "city", "berlin"),
                ("robert", "job", "engineer"),
                ("carola", "city", "berlin"),
                ("carola", "job", "teacher"),
                ("david", "city", "munich"),
                ("eve", "job", "engineer"),
                ("eve", "city", "paris"),
            ],
        ),
    ):
        subjects = []
        for s, p, o in facts:
            rows.append(t_lit(ns(s), _px(p), o))
            if s not in subjects:
                subjects.append(s)
        rows.extend(t_uri(ns(s), RDF.type, person) for s in subjects)


_paris_build()


def paris_fixture_df(spark, which: str) -> DataFrame:
    from ..model import triples_df

    return triples_df(spark, PARIS_A if which == "a" else PARIS_B)


def paris_fixture_cte(which: str, alias: str) -> str:
    rows = PARIS_A if which == "a" else PARIS_B

    def q(v):
        return "CAST(NULL AS VARCHAR)" if v is None else "'" + v.replace("'", "''") + "'"

    vals = ",\n    ".join("(" + ", ".join(q(v) for v in r) + ")" for r in rows)
    return (
        f"{alias}(subj, pred, obj, obj_kind, obj_lang, obj_dt) AS "
        f"(SELECT DISTINCT * FROM (VALUES\n    {vals}))"
    )


#: Clamp so the noisy-or log never sees ln(0) when a fact is unique on
#: both sides (w = 1): score prints as 1 under the driver's %.6g.
_W_CLAMP = 1.0 - 1e-12


def paris_matches(
    a: DataFrame,
    b: DataFrame,
    min_score: float = 0.05,
    max_fact_pairs: int = 1000,
) -> DataFrame:
    """(uri_a, uri_b, shared_facts, score) — PARIS-style instance
    alignment by shared-fact evidence.

    Each fact key (pred, obj, obj_kind) carried by ``n_a`` subjects in
    A and ``n_b`` in B licenses n_a x n_b candidate pairs; its evidence
    weight is the inverse, w = 1 / (n_a * n_b) — the discrete form of
    PARIS's inverse-functionality weighting (a unique shared email is
    near-proof, a shared city is noise).  Pair score is the noisy-or
    1 - prod(1 - w) over shared facts.

    Scale shape: ONE equi-join per side on the fact key — the same
    bucket-join geometry as MinHash-LSH blocking (pipeline/linking.py),
    with the identical hot-bucket guard: fact keys licensing more than
    ``max_fact_pairs`` candidates (stopword-like values such as a
    common rdf:type) are dropped BEFORE the shuffle, never exploded.
    Weight/count tables are per-distinct-fact aggregates with map-side
    partials; no similarity pass is ever all-pairs."""
    key = ["pred", "obj", "obj_kind"]
    fa = a.select("subj", *key).distinct()
    fb = b.select("subj", *key).distinct()
    na = fa.groupBy(*key).agg(F.count("*").alias("n_a"))
    nb = fb.groupBy(*key).agg(F.count("*").alias("n_b"))
    w = (
        na.join(nb, key)
        .filter((F.col("n_a") * F.col("n_b")) <= max_fact_pairs)
        .select(
            *key,
            (F.lit(1.0) / (F.col("n_a") * F.col("n_b"))).alias("w"),
        )
    )
    pairs = (
        fa.withColumnRenamed("subj", "uri_a")
        .join(w, key)
        .join(fb.withColumnRenamed("subj", "uri_b"), key)
    )
    scored = pairs.groupBy("uri_a", "uri_b").agg(
        F.count("*").alias("shared_facts"),
        (
            F.lit(1.0)
            - F.exp(F.sum(F.log(F.lit(1.0) - F.least(F.col("w"), F.lit(_W_CLAMP)))))
        ).alias("score"),
    )
    return scored.filter(F.col("score") >= min_score).orderBy("uri_a", "uri_b")


def paris_matches_sql(
    cte_a: str,
    cte_b: str,
    min_score: float = 0.05,
    max_fact_pairs: int = 1000,
) -> str:
    """DuckDB twin; ``cte_a``/``cte_b`` name relations ``ta``/``tb``."""
    return f"""
WITH {cte_a},
{cte_b},
fa AS (SELECT DISTINCT subj, pred, obj, obj_kind FROM ta),
fb AS (SELECT DISTINCT subj, pred, obj, obj_kind FROM tb),
w AS MATERIALIZED (
  SELECT na.pred, na.obj, na.obj_kind,
         1.0 / (na.n_a * nb.n_b) AS w
  FROM (SELECT pred, obj, obj_kind, count(*) AS n_a
        FROM fa GROUP BY 1, 2, 3) na
  JOIN (SELECT pred, obj, obj_kind, count(*) AS n_b
        FROM fb GROUP BY 1, 2, 3) nb
    ON na.pred = nb.pred AND na.obj = nb.obj
   AND na.obj_kind = nb.obj_kind
  WHERE na.n_a * nb.n_b <= {max_fact_pairs})
SELECT fa.subj AS uri_a, fb.subj AS uri_b,
  count(*)::BIGINT AS shared_facts,
  1.0 - exp(sum(ln(1.0 - least(w.w, {_W_CLAMP!r})))) AS score
FROM fa
JOIN w ON fa.pred = w.pred AND fa.obj = w.obj
      AND fa.obj_kind = w.obj_kind
JOIN fb ON fb.pred = w.pred AND fb.obj = w.obj
       AND fb.obj_kind = w.obj_kind
GROUP BY 1, 2
HAVING 1.0 - exp(sum(ln(1.0 - least(w.w, {_W_CLAMP!r})))) >= {min_score}
ORDER BY uri_a, uri_b
"""


# ---------------------------------------------------------------------------
# Instance-based property alignment (extension-overlap schema matching;
# the subrelation test of PARIS and of classic instance-based matchers
# like DUMAS/COMA, public literature).  After entity canonicalization
# the two graphs talk about the SAME subject URIs through DIFFERENT
# predicate vocabularies; overlapping (subj, obj) extensions expose
# equivalentProperty candidates that align_entities (label evidence)
# cannot see when names share nothing (ex:email vs foaf:mbox).
# ---------------------------------------------------------------------------

_PROP_E_NS = "http://e.example.org/"
_PROP_FOAF = "http://xmlns.com/foaf/0.1/"


PROPALIGN_A: list[tuple] = []
PROPALIGN_B: list[tuple] = []


def _propalign_build() -> None:
    from ..model import t_lit

    def ea(s, p, o):
        PROPALIGN_A.append(t_lit(_PROP_E_NS + s, _px(p), o))

    def eb(s, p, o):
        PROPALIGN_B.append(t_lit(_PROP_E_NS + s, _PROP_FOAF + p, o))

    mails = {
        "alice": "alice@example.org",
        "bob": "bob@example.org",
        "carol": "carol@example.org",
    }
    towns = {"alice": "berlin", "bob": "berlin", "carol": "munich", "dave": "munich"}
    names = {"alice": "Alice", "bob": "Bob", "carol": "Carol", "dave": "Dave"}
    for s, m in mails.items():
        ea(s, "email", m)
        eb(s, "mbox", m)  # foaf:mbox == ex:email exactly
    for s, t in towns.items():
        ea(s, "town", t)
        eb(s, "city", t if s != "dave" else "paris")  # one disagreement
    for s, n in names.items():
        ea(s, "name", n)
    for s in ("alice", "bob"):
        eb(s, "name", names[s])
    eb("eve", "name", "Eve")  # B-only subject
    for s in ("alice", "bob", "carol"):
        eb(s, "nick", s[:2])  # no A counterpart


_propalign_build()


def propalign_fixture_df(spark, which: str) -> DataFrame:
    from ..model import triples_df

    return triples_df(spark, PROPALIGN_A if which == "a" else PROPALIGN_B)


def propalign_fixture_cte(which: str, alias: str) -> str:
    rows = PROPALIGN_A if which == "a" else PROPALIGN_B

    def q(v):
        return "CAST(NULL AS VARCHAR)" if v is None else "'" + v.replace("'", "''") + "'"

    vals = ",\n    ".join("(" + ", ".join(q(v) for v in r) + ")" for r in rows)
    return (
        f"{alias}(subj, pred, obj, obj_kind, obj_lang, obj_dt) AS "
        f"(SELECT DISTINCT * FROM (VALUES\n    {vals}))"
    )


def property_alignment(
    a: DataFrame,
    b: DataFrame,
    min_overlap: int = 2,
    min_jaccard: float = 0.3,
    max_value_df: int = 64,
) -> DataFrame:
    """(pred_a, pred_b, n_shared, n_a, n_b, jaccard) —
    owl:equivalentProperty candidates by extension overlap.

    jaccard = |ext(pred_a) ∩ ext(pred_b)| / |ext(pred_a) ∪ ext(pred_b)|
    over distinct (subj, obj, obj_kind) extension pairs; rdf:type rows
    are excluded (class membership is alignment input, not a property
    to align).

    Scale shape: the only shuffle-join key is (subj, obj, obj_kind);
    keys carried by more than ``max_value_df`` predicates on either
    side (degenerate values like empty strings) are dropped before the
    join — the standard hot-bucket cap.  Extension sizes are map-side-
    combinable aggregates; predicate vocabulary is tiny, so the final
    jaccard join broadcasts."""
    from ..model import RDF

    def ext(g: DataFrame) -> DataFrame:
        e = (
            g.filter(F.col("pred") != RDF.type)
            .select("pred", "subj", "obj", "obj_kind")
            .distinct()
        )
        hot = (
            e.groupBy("subj", "obj", "obj_kind")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_value_df)
            .select("subj", "obj", "obj_kind")
        )
        return e.join(F.broadcast(hot), ["subj", "obj", "obj_kind"], "left_anti")

    ea = ext(a)
    eb = ext(b)
    ta = ea.groupBy(F.col("pred").alias("pred_a")).agg(F.count("*").alias("n_a"))
    tb = eb.groupBy(F.col("pred").alias("pred_b")).agg(F.count("*").alias("n_b"))
    inter = (
        ea.withColumnRenamed("pred", "pred_a")
        .join(
            eb.withColumnRenamed("pred", "pred_b"),
            ["subj", "obj", "obj_kind"],
        )
        .groupBy("pred_a", "pred_b")
        .agg(F.count("*").alias("n_shared"))
    )
    out = (
        inter.join(F.broadcast(ta), "pred_a")
        .join(F.broadcast(tb), "pred_b")
        .withColumn(
            "jaccard",
            F.col("n_shared")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast("double"),
        )
    )
    return out.filter(
        (F.col("n_shared") >= min_overlap) & (F.col("jaccard") >= min_jaccard)
    ).select("pred_a", "pred_b", "n_shared", "n_a", "n_b", "jaccard").orderBy(
        "pred_a", "pred_b"
    )


def property_alignment_sql(
    cte_a: str,
    cte_b: str,
    min_overlap: int = 2,
    min_jaccard: float = 0.3,
    max_value_df: int = 64,
) -> str:
    """DuckDB twin; ``cte_a``/``cte_b`` name relations ``ta``/``tb``."""
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

    def ext(src: str, name: str) -> str:
        return f"""
{name}0 AS (
  SELECT DISTINCT pred, subj, obj, obj_kind FROM {src}
  WHERE pred <> '{rdf_type}'),
{name} AS MATERIALIZED (
  SELECT * FROM {name}0
  WHERE NOT EXISTS (
    SELECT 1 FROM {name}0 h
    WHERE h.subj = {name}0.subj AND h.obj = {name}0.obj
      AND h.obj_kind = {name}0.obj_kind
    GROUP BY h.subj, h.obj, h.obj_kind
    HAVING count(*) > {max_value_df}))"""

    return f"""
WITH {cte_a},
{cte_b},{ext("ta", "ea")},{ext("tb", "eb")},
inter AS (
  SELECT ea.pred AS pred_a, eb.pred AS pred_b,
         count(*)::BIGINT AS n_shared
  FROM ea JOIN eb
    ON ea.subj = eb.subj AND ea.obj = eb.obj
   AND ea.obj_kind = eb.obj_kind
  GROUP BY 1, 2),
na AS (SELECT pred AS pred_a, count(*)::BIGINT AS n_a FROM ea GROUP BY 1),
nb AS (SELECT pred AS pred_b, count(*)::BIGINT AS n_b FROM eb GROUP BY 1)
SELECT i.pred_a, i.pred_b, i.n_shared, na.n_a, nb.n_b,
  i.n_shared / (na.n_a + nb.n_b - i.n_shared)::DOUBLE AS jaccard
FROM inter i JOIN na USING (pred_a) JOIN nb USING (pred_b)
WHERE i.n_shared >= {min_overlap}
  AND i.n_shared / (na.n_a + nb.n_b - i.n_shared)::DOUBLE >= {min_jaccard}
ORDER BY pred_a, pred_b
"""


# ---------------------------------------------------------------------------
# Precision-recall threshold sweep over scored candidate pairs — the
# operating-point picker for Fellegi-Sunter / LSH linkage scores:
# every prefix of the score-ranked pair list is a candidate threshold,
# and the sweep reads off (precision, recall, F1) at each.
# ---------------------------------------------------------------------------


def pr_curve(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "is_match",
    tie_cols: tuple = ("id_a", "id_b"),
) -> DataFrame:
    """(rank, score, is_match, tp, fp, fn, precision, recall, f1) —
    one curve point per pair, ranked by (score desc, tie_cols): the
    metrics of the threshold "link everything scored at least this
    pair".

    Scale note: a PR curve is an inherently GLOBAL order, so this runs
    one global window sort — correct for the candidate-pair tables it
    grades (post-blocking, millions of rows at most, and candidate
    sets are sub-linear in corpus size by construction).  For larger
    sweeps, pre-bucket scores to fixed quantile thresholds first.
    Cumulative counts are integer; ratios are single divisions."""
    from pyspark.sql import Window

    w = Window.orderBy(
        F.col(score_col).desc(), *[F.col(c) for c in tie_cols]
    ).rowsBetween(Window.unboundedPreceding, 0)
    tot = scored.agg(F.sum(label_col).alias("n_pos"))
    cum = (
        scored.withColumn("tp", F.sum(label_col).over(w))
        .withColumn("rank", F.count(F.lit(1)).over(w))
        .crossJoin(F.broadcast(tot))
    )
    return cum.select(
        "rank",
        F.col(score_col).alias("score"),
        F.col(label_col).alias("is_match"),
        "tp",
        (F.col("rank") - F.col("tp")).alias("fp"),
        (F.col("n_pos") - F.col("tp")).alias("fn"),
        (F.col("tp") / F.col("rank").cast("double")).alias("precision"),
        (F.col("tp") / F.col("n_pos").cast("double")).alias("recall"),
        (
            2.0
            * F.col("tp")
            / (F.col("rank") + F.col("n_pos")).cast("double")
        ).alias("f1"),
    ).orderBy("rank")


def pr_curve_sql(
    scored_sql: str,
    score_col: str = "score",
    label_col: str = "is_match",
    tie_cols: tuple = ("id_a", "id_b"),
) -> str:
    """DuckDB twin over a full scored-pairs SELECT."""
    ties = ", ".join(tie_cols)
    return f"""
WITH scored AS ({scored_sql}),
tot AS (SELECT sum({label_col})::BIGINT AS n_pos FROM scored),
cum AS (
  SELECT *,
    sum({label_col}) OVER w AS tp,
    count(*) OVER w AS rank
  FROM scored
  WINDOW w AS (ORDER BY {score_col} DESC, {ties}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT rank::BIGINT AS rank, {score_col} AS score, {label_col} AS is_match,
  tp::BIGINT AS tp, (rank - tp)::BIGINT AS fp,
  (tot.n_pos - tp)::BIGINT AS fn,
  tp / rank::DOUBLE AS precision,
  tp / tot.n_pos::DOUBLE AS recall,
  2.0 * tp / (rank + tot.n_pos)::DOUBLE AS f1
FROM cum CROSS JOIN tot
ORDER BY rank"""


def dedupe_entities(
    triples: DataFrame,
    min_score: float = 0.2,
    max_fact_pairs: int = 1000,
) -> DataFrame:
    """(uri_a, uri_b, shared_facts, score) — WITHIN-graph duplicate
    detection: :func:`paris_matches` of a graph against itself with
    the diagonal and mirror pairs removed (uri_a < uri_b).  The
    value-evidence alias detector for a single induced KG — the
    precursor to emitting owl:sameAs and running the CC
    canonicalization pass.

    Same scale shape as paris_matches (fact-key bucket joins with the
    hot-fact cap); the self-join doubles nothing because both sides
    are the same distinct-fact projection.  NOTE the self-match weight
    deflation: a fact carried by n entities weighs 1/n² here (each
    entity sits on both join sides), so a unique duplicated email
    scores 1/4 per fact, not 1 — hence the lower default gate than
    the cross-graph matcher."""
    out = paris_matches(
        triples, triples, min_score=min_score, max_fact_pairs=max_fact_pairs
    )
    return out.filter(F.col("uri_a") < F.col("uri_b")).orderBy(
        "uri_a", "uri_b"
    )


def dedupe_entities_sql(
    cte: str, min_score: float = 0.2, max_fact_pairs: int = 1000
) -> str:
    """DuckDB twin — the paris twin on (ta, ta-as-tb) plus the
    uri_a < uri_b cut."""
    inner = paris_matches_sql(
        cte,
        "tb AS (SELECT * FROM ta)",
        min_score=min_score,
        max_fact_pairs=max_fact_pairs,
    )
    return f"""
SELECT * FROM ({inner.strip()})
WHERE uri_a < uri_b
ORDER BY uri_a, uri_b"""


# ---------------------------------------------------------------------------
# Learned linkage scoring: batch-gradient logistic regression on the
# per-field agreement vectors — the LEARNED counterpart of the
# closed-form Fellegi-Sunter weights (Splink-style EM is the classic
# unsupervised route; with labeled pairs plain LR is the simplest
# calibrated scorer).  No MLlib: the trainer is pure DataFrame
# algebra so the DuckDB twin can unroll it CTE-for-CTE.
# ---------------------------------------------------------------------------


def lr_weights(
    pairs: DataFrame,
    fields: list[str],
    iters: int = 8,
    lr: float = 0.5,
) -> DataFrame:
    """(param, weight) — logistic-regression parameters ('bias' +
    one row per field) after ``iters`` full-batch gradient steps from
    a zero init on pairs(is_match, <fields...>).

    Each step is ONE map-side-combinable aggregation computing every
    gradient component ((sigma(z)-y)·x averaged over pairs); the
    weight state is a 1-row DataFrame crossJoined into the next
    step — no driver-side collect, the same loop discipline as
    pagerank.  Full-batch (not SGD) keeps the math row-order-free up
    to float-sum association; the driver's %.6g normalization absorbs
    the last-ulp partition-order wiggle."""
    n = len(fields)
    state = pairs.sparkSession.createDataFrame(
        [tuple([0.0] * (n + 1))],
        ", ".join(["b double"] + [f"w{i} double" for i in range(n)]),
    )
    for _ in range(iters):
        z = F.col("b") + sum(
            (F.col(f"w{i}") * F.col(fields[i]) for i in range(n)),
            start=F.lit(0.0),
        )
        sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = sig - F.col("is_match")
        joined = pairs.crossJoin(F.broadcast(state))
        grads = joined.agg(
            F.avg(err).alias("gb"),
            *[
                F.avg(err * F.col(fields[i])).alias(f"g{i}")
                for i in range(n)
            ],
            F.first("b").alias("b0"),
            *[F.first(f"w{i}").alias(f"w0{i}") for i in range(n)],
        )
        state = grads.select(
            (F.col("b0") - F.lit(lr) * F.col("gb")).alias("b"),
            *[
                (F.col(f"w0{i}") - F.lit(lr) * F.col(f"g{i}")).alias(f"w{i}")
                for i in range(n)
            ],
        ).localCheckpoint(eager=True)
    rows = [F.struct(F.lit("bias").alias("param"), F.col("b").alias("weight"))]
    rows += [
        F.struct(F.lit(fields[i]).alias("param"), F.col(f"w{i}").alias("weight"))
        for i in range(n)
    ]
    return (
        state.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.param", "r.weight")
        .orderBy("param")
    )


def lr_weights_sql(
    pairs_cte: str,
    fields: list[str],
    iters: int = 8,
    lr: float = 0.5,
) -> str:
    """DuckDB twin: the gradient steps unrolled as chained 1-row CTEs
    with the identical update arithmetic.  ``pairs_cte`` is a WITH
    body defining ``pairs(is_match, <fields...>)`` (the same fragment
    fs_weights_sql consumes)."""
    n = len(fields)
    zero = ", ".join(["0.0 AS b"] + [f"0.0 AS w{i}" for i in range(n)])
    rounds = []
    prev = "s0"
    for k in range(1, iters + 1):
        z = " + ".join(
            [f"{prev}.b"] + [f"{prev}.w{i} * p.{fields[i]}" for i in range(n)]
        )
        err = f"(1.0 / (1.0 + exp(-({z}))) - p.is_match)"
        gsel = ", ".join(
            [f"avg({err}) AS gb"]
            + [f"avg({err} * p.{fields[i]}) AS g{i}" for i in range(n)]
            + [f"any_value({prev}.b) AS b0"]
            + [f"any_value({prev}.w{i}) AS w0{i}" for i in range(n)]
        )
        wsel = ", ".join(
            [f"b0 - {lr!r} * gb AS b"]
            + [f"w0{i} - {lr!r} * g{i} AS w{i}" for i in range(n)]
        )
        rounds.append(
            f"g{k} AS (SELECT {gsel} FROM pairs p CROSS JOIN {prev}),\n"
            f"s{k} AS (SELECT {wsel} FROM g{k})"
        )
        prev = f"s{k}"
    params = " UNION ALL ".join(
        ["SELECT 'bias' AS param, b AS weight FROM " + prev]
        + [
            f"SELECT '{fields[i]}', w{i} FROM {prev}"
            for i in range(n)
        ]
    )
    return f"""
WITH {pairs_cte},
s0 AS (SELECT {zero}),
{",".join(rounds)}
SELECT param, weight FROM ({params})
ORDER BY param"""
