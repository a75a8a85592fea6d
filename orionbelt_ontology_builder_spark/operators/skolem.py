"""Blank-node skolemization via iterative (Weisfeiler-Leman-style)
signature refinement.

Merging graphs from many extraction sources (the 10^12-page KG build)
needs bnode identity that survives re-serialization: two loads of the
same restriction axiom must produce the SAME node, or every merge
duplicates every axiom.  The reference leans on rdflib keeping bnode
ids stable within one process (``ontology_manager.py`` restriction
builders); at cluster scale ids are per-partition allocations, so we
skolemize instead: name each bnode by a content hash of its
neighborhood, refined over ``rounds`` iterations so bnodes that only
differ through a chain of other bnodes (RDF list spines, nested
restrictions) still get distinct names.

Structurally *identical* bnodes collapse into one skolem IRI — the
desirable "lean" behavior: loading the same owl:Restriction twice
yields one node, which is exactly what merge wants.

Scale shape: bnodes are axiom-scale (schema machinery — restrictions,
list spines), orders of magnitude smaller than instance data, so the
per-round groupBy + broadcast-join loop touches tiny tables; the only
data-scale pass is the final subj/obj rewrite, a broadcast hash join
of the (small) bnode→IRI map against the triples scan.  The
signature aggregation sorts per-bnode description arrays whose length
is the bnode's degree (bounded by axiom arity) — collect_list here is
deliberate and cheap; the md5 inputs are precomputed projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["skolemize_bnodes", "skolemize_bnodes_sql"]

_MARK = "_:"  # round-0 neighbor placeholder


def _is_bnode(col):
    return col.startswith("_:")


def skolemize_bnodes(
    triples: DataFrame,
    base: str = "http://example.org/.well-known/genid/",
    rounds: int = 4,
) -> DataFrame:
    """Rewrite every blank node to ``base + <wl-signature md5>``;
    returns the full (distinct) triple set with ``obj_kind`` 'bnode'
    promoted to 'uri'.  ``rounds`` bounds how long a bnode-only chain
    can be while keeping distinct names (RDF list spines of length ≤
    rounds resolve; default 4 covers the reference's axiom shapes)."""
    lit_slot = F.concat_ws(
        "|",
        F.col("obj_kind"),
        F.col("obj"),
        F.coalesce(F.col("obj_lang"), F.lit("")),
        F.coalesce(F.col("obj_dt"), F.lit("")),
    )
    # static description edges: (b, pred, neighbor-or-literal, is_bnode_nbr)
    sub_rows = (
        triples.filter(_is_bnode(F.col("subj")))
        .select(
            F.col("subj").alias("b"),
            F.concat(F.lit("S|"), F.col("pred")).alias("p"),
            F.when(_is_bnode(F.col("obj")) & (F.col("obj_kind") == "bnode"),
                   F.col("obj")).alias("nbr"),
            F.when(~(_is_bnode(F.col("obj")) & (F.col("obj_kind") == "bnode")),
                   lit_slot).alias("slot"),
        )
    )
    obj_rows = (
        triples.filter(_is_bnode(F.col("obj")) & (F.col("obj_kind") == "bnode"))
        .select(
            F.col("obj").alias("b"),
            F.concat(F.lit("O|"), F.col("pred")).alias("p"),
            F.when(_is_bnode(F.col("subj")), F.col("subj")).alias("nbr"),
            F.when(~_is_bnode(F.col("subj")), F.col("subj")).alias("slot"),
        )
    )
    desc = sub_rows.unionByName(obj_rows).persist()

    # round 0: neighbor bnodes replaced by a constant marker
    def _sig(df_with_slot: DataFrame) -> DataFrame:
        d = F.concat_ws("|", F.col("p"), F.col("eff"))
        return (
            df_with_slot.select("b", d.alias("d"))
            .groupBy("b")
            .agg(
                F.md5(
                    F.array_join(F.array_sort(F.collect_list("d")), "\n")
                ).alias("sig")
            )
        )

    sigs = _sig(
        desc.withColumn(
            "eff",
            F.coalesce(F.col("slot"), F.lit(_MARK)),
        )
    )
    for _ in range(rounds):
        nbr_sig = sigs.select(
            F.col("b").alias("nbr"), F.col("sig").alias("nsig")
        )
        refined = desc.join(F.broadcast(nbr_sig), "nbr", "left").withColumn(
            "eff", F.coalesce(F.col("slot"), F.col("nsig"), F.lit(_MARK))
        )
        sigs = _sig(refined)

    iri = sigs.select(
        "b", F.concat(F.lit(base), F.col("sig")).alias("iri")
    )
    smap = F.broadcast(iri.withColumnRenamed("b", "subj"))
    omap = F.broadcast(
        iri.select(F.col("b").alias("obj"), F.col("iri").alias("oiri"))
    )
    out = (
        triples.join(smap, "subj", "left")
        .join(omap, "obj", "left")
        .select(
            F.coalesce("iri", "subj").alias("subj"),
            "pred",
            F.when(
                (F.col("obj_kind") == "bnode") & F.col("oiri").isNotNull(),
                F.col("oiri"),
            ).otherwise(F.col("obj")).alias("obj"),
            F.when(F.col("obj_kind") == "bnode", "uri")
            .otherwise(F.col("obj_kind")).alias("obj_kind"),
            "obj_lang",
            "obj_dt",
        )
        .distinct()
        .orderBy("subj", "pred", "obj")
    )
    return out


def skolemize_bnodes_sql(
    triples_cte: str,
    base: str = "http://example.org/.well-known/genid/",
    rounds: int = 4,
) -> str:
    """DuckDB twin: the same refinement with rounds unrolled as chained
    CTEs (string_agg ORDER BY = Spark's sorted array_join)."""
    desc = f"""
desc_rows AS MATERIALIZED (
  SELECT subj AS b, 'S|' || pred AS p,
    CASE WHEN obj_kind = 'bnode' AND starts_with(obj, '_:')
         THEN obj END AS nbr,
    CASE WHEN NOT (obj_kind = 'bnode' AND starts_with(obj, '_:'))
         THEN obj_kind || '|' || obj || '|' || coalesce(obj_lang, '')
              || '|' || coalesce(obj_dt, '') END AS slot
  FROM triples WHERE starts_with(subj, '_:')
  UNION ALL
  SELECT obj AS b, 'O|' || pred,
    CASE WHEN starts_with(subj, '_:') THEN subj END,
    CASE WHEN NOT starts_with(subj, '_:') THEN subj END
  FROM triples WHERE obj_kind = 'bnode' AND starts_with(obj, '_:'))"""
    sig0 = """
sig0 AS (
  SELECT b, md5(string_agg(p || '|' || coalesce(slot, '_:'),
                chr(10) ORDER BY p || '|' || coalesce(slot, '_:'))) AS sig
  FROM desc_rows GROUP BY b)"""
    rounds_sql = []
    prev = "sig0"
    for k in range(1, rounds + 1):
        rounds_sql.append(f"""
sig{k} AS (
  SELECT d.b,
    md5(string_agg(
      d.p || '|' || coalesce(d.slot, s.sig, '_:'),
      chr(10) ORDER BY d.p || '|' || coalesce(d.slot, s.sig, '_:'))) AS sig
  FROM desc_rows d LEFT JOIN {prev} s ON d.nbr = s.b
  GROUP BY d.b)""")
        prev = f"sig{k}"
    return f"""{triples_cte},{desc},{sig0},{",".join(rounds_sql)},
iri AS MATERIALIZED (
  SELECT b, '{base}' || sig AS iri FROM {prev})
SELECT DISTINCT
  coalesce(si.iri, t.subj) AS subj,
  t.pred,
  CASE WHEN t.obj_kind = 'bnode' AND oi.iri IS NOT NULL
       THEN oi.iri ELSE t.obj END AS obj,
  CASE WHEN t.obj_kind = 'bnode' THEN 'uri' ELSE t.obj_kind END
    AS obj_kind,
  t.obj_lang, t.obj_dt
FROM triples t
LEFT JOIN iri si ON t.subj = si.b
LEFT JOIN iri oi ON t.obj = oi.b AND t.obj_kind = 'bnode'
ORDER BY subj, pred, obj
"""
