"""Property-graph projection of the triple store — the RDF-to-LPG
(labeled-property-graph) mapping every graph-analytics/Neo4j-style
consumer wants: one NODE row per resource carrying its type labels and
its data-property attributes, one EDGE row per object-property triple.
The W3C "RDF to property graph" mapping note and the openCypher data
model are the public references; the projection rules here are the
conventional ones:

* node set   = every subject plus every uri/bnode object;
* labels     = local names of the node's ``rdf:type`` objects
               (sorted, comma-joined — deterministic);
* properties = the node's literal triples as sorted
               ``localname=value`` pairs (semicolon-joined; lang/
               datatype qualifiers dropped in the flat view);
* edges      = uri/bnode-object triples excluding ``rdf:type`` (types
               became labels), rel = predicate local name.

Scale shape: nodes are one union + one groupBy on the resource key
(map-side combinable after the distinct); edges are a pure filtered
projection — both partition by the same subject key the edge tables
already use, so the export rides the existing bucketing.  The
aggregation strings are precomputed projections; only sort+join runs
inside the agg (the engineering notes ObjectHashAggregate note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import RDF, local_name_col

__all__ = ["pg_nodes", "pg_nodes_sql", "pg_edges", "pg_edges_sql"]

#: DuckDB local-name twin (mirrors model.local_name_col).
_LN = (
    "list_extract(string_split(list_extract("
    "string_split({c}, '#'), -1), '/'), -1)"
)


def pg_nodes(triples: DataFrame) -> DataFrame:
    """(node, labels_csv, props_csv) — one row per resource."""
    subj = triples.select(F.col("subj").alias("node"))
    objs = triples.filter(
        F.col("obj_kind").isin("uri", "bnode")
    ).select(F.col("obj").alias("node"))
    nodes = subj.unionByName(objs).distinct()

    labels = (
        triples.filter(F.col("pred") == RDF.type)
        .select(
            F.col("subj").alias("node"),
            local_name_col(F.col("obj")).alias("label"),
        )
        .distinct()
        .groupBy("node")
        .agg(
            F.array_join(F.sort_array(F.collect_list("label")), ",").alias(
                "labels_csv"
            )
        )
    )
    props = (
        triples.filter(F.col("obj_kind") == "literal")
        .select(
            F.col("subj").alias("node"),
            F.concat_ws(
                "=", local_name_col(F.col("pred")), F.col("obj")
            ).alias("kv"),
        )
        .distinct()
        .groupBy("node")
        .agg(
            F.array_join(F.sort_array(F.collect_list("kv")), "; ").alias(
                "props_csv"
            )
        )
    )
    return (
        nodes.join(labels, "node", "left")
        .join(props, "node", "left")
        .select(
            "node",
            F.coalesce("labels_csv", F.lit("")).alias("labels_csv"),
            F.coalesce("props_csv", F.lit("")).alias("props_csv"),
        )
        .orderBy("node")
    )


def pg_nodes_sql(triples_cte: str = "triples") -> str:
    """DuckDB twin over a ``triples`` relation (the standard 6-column
    layout)."""
    ln_obj = _LN.format(c="obj")
    ln_pred = _LN.format(c="pred")
    return f"""
nodes AS (
  SELECT subj AS node FROM {triples_cte}
  UNION
  SELECT obj FROM {triples_cte} WHERE obj_kind IN ('uri', 'bnode')),
labels AS (
  SELECT subj AS node,
         string_agg(DISTINCT {ln_obj}, ',' ORDER BY {ln_obj}) AS labels_csv
  FROM {triples_cte}
  WHERE pred = '{RDF.type}'
  GROUP BY subj),
props AS (
  SELECT subj AS node,
         string_agg(DISTINCT {ln_pred} || '=' || obj,
                    '; ' ORDER BY {ln_pred} || '=' || obj) AS props_csv
  FROM {triples_cte}
  WHERE obj_kind = 'literal'
  GROUP BY subj)
SELECT n.node,
       coalesce(l.labels_csv, '') AS labels_csv,
       coalesce(p.props_csv, '') AS props_csv
FROM nodes n
LEFT JOIN labels l ON n.node = l.node
LEFT JOIN props p ON n.node = p.node
ORDER BY n.node"""


def pg_edges(triples: DataFrame) -> DataFrame:
    """(src, rel, dst) — distinct object-property edges; types are
    labels, not edges."""
    return (
        triples.filter(
            F.col("obj_kind").isin("uri", "bnode")
            & (F.col("pred") != RDF.type)
        )
        .select(
            F.col("subj").alias("src"),
            local_name_col(F.col("pred")).alias("rel"),
            F.col("obj").alias("dst"),
        )
        .distinct()
        .orderBy("src", "rel", "dst")
    )


def pg_edges_sql(triples_cte: str = "triples") -> str:
    ln_pred = _LN.format(c="pred")
    return f"""
SELECT DISTINCT subj AS src, {ln_pred} AS rel, obj AS dst
FROM {triples_cte}
WHERE obj_kind IN ('uri', 'bnode') AND pred <> '{RDF.type}'
ORDER BY src, rel, dst"""
