"""Ontology induction from relational tables (triples source).

Deterministically maps the driver's TPC-H-ish tables into the canonical
triples model: regions/nations become a two-level class hierarchy,
customers/suppliers become individuals typed by their nation class with
data-property assertions.  This gives the engine a *large* graph (millions
of triples at sf0.1) whose expected contents are recomputable in plain SQL
— the differential-oracle anchor for every graph operator, and the bench
workload.

Scale notes: pure projections + one broadcast join (nation/region are
tiny); triple generation is a ``unionByName`` of per-predicate projections
so it stays map-side, no shuffle until the consumer asks for one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import OWL, RDF, RDFS, XSD

BASE = "http://example.org/tpch#"


def _proj(df: DataFrame, subj, pred: str, obj, kind: str, dt: str | None = None):
    return df.select(
        subj.alias("subj"),
        F.lit(pred).alias("pred"),
        obj.alias("obj"),
        F.lit(kind).alias("obj_kind"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(dt).cast("string").alias("obj_dt"),
    )


def induce_triples(
    spark: SparkSession, sf_dir: str, include_individuals: bool = True
) -> DataFrame:
    """Build a triples DataFrame from ``{sf_dir}/{region,nation,customer,
    supplier}.parquet``.

    Mapping (deterministic, reproducible in SQL):
      * region R    -> ``:Region_<r_name>`` a ``owl:Class``, label = r_name
      * nation N    -> ``:Nation_<n_name>`` a ``owl:Class``,
                       subClassOf its region class, label = n_name
      * customer C  -> ``:customer_<c_custkey>`` a ``owl:NamedIndividual``
                       and a ``:Nation_<n_name>``; label = c_name;
                       ``:acctbal`` literal (xsd:double);
                       ``:mktsegment`` literal
      * supplier S  -> same shape with ``:supplier_<s_suppkey>``
    """
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")

    region_cls = F.concat(F.lit(BASE + "Region_"), F.col("r_name"))
    nation_cls = F.concat(F.lit(BASE + "Nation_"), F.col("n_name"))

    parts = [
        _proj(region, region_cls, RDF.type, F.lit(OWL.Class), "uri"),
        _proj(region, region_cls, RDFS.label, F.col("r_name"), "literal"),
        _proj(nation, nation_cls, RDF.type, F.lit(OWL.Class), "uri"),
        _proj(nation, nation_cls, RDFS.label, F.col("n_name"), "literal"),
    ]
    # nation -> region subclass edge (broadcast join; region has 5 rows)
    nr = nation.join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    )
    parts.append(_proj(nr, nation_cls, RDFS.subClassOf, region_cls, "uri"))

    if include_individuals:
        for tbl, prefix, key, name_col, nk, bal, seg in [
            ("customer", "customer_", "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
            ("supplier", "supplier_", "s_suppkey", "s_name", "s_nationkey", "s_acctbal", None),
        ]:
            df = spark.read.parquet(f"{sf_dir}/{tbl}.parquet")
            ind = F.concat(F.lit(BASE + prefix), F.col(key).cast("string"))
            dfn = df.join(
                F.broadcast(nation), df[nk] == nation["n_nationkey"]
            )
            parts += [
                _proj(df, ind, RDF.type, F.lit(OWL.NamedIndividual), "uri"),
                _proj(dfn, ind, RDF.type, nation_cls, "uri"),
                _proj(df, ind, RDFS.label, F.col(name_col), "literal"),
                _proj(
                    df,
                    ind,
                    BASE + "acctbal",
                    F.format_string("%.2f", F.col(bal)),
                    "literal",
                    XSD.double,
                ),
            ]
            if seg:
                parts.append(
                    _proj(df, ind, BASE + "mktsegment", F.col(seg), "literal")
                )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def induce_entity_edges(
    spark: SparkSession, sf_dir: str, include_orders: bool = True
) -> DataFrame:
    """(src, dst) typed entity edge list from the relational foreign
    keys — the graph-analytics companion to ``induce_triples``:

      * ``n:<name>  -> r:<name>``   nation -> its region
      * ``c:<key>   -> n:<name>``   customer -> its nation
      * ``s:<key>   -> n:<name>``   supplier -> its nation
      * ``o:<key>   -> c:<key>``    order -> its customer (optional)

    Deterministic, recomputable in plain SQL (the oracle builds the
    identical list), and shaped like a real KG edge table: zipfian-ish
    in-degree (regions/nations are hubs), string node ids.  Pure
    projections + broadcast joins against the tiny nation/region dims —
    no shuffle."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")

    def edge(df, s, d):
        return df.select(s.alias("src"), d.alias("dst"))

    nr = nation.join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    )
    parts = [
        edge(
            nr,
            F.concat(F.lit("n:"), F.col("n_name")),
            F.concat(F.lit("r:"), F.col("r_name")),
        )
    ]
    for tbl, pfx, key, nk in [
        ("customer", "c:", "c_custkey", "c_nationkey"),
        ("supplier", "s:", "s_suppkey", "s_nationkey"),
    ]:
        df = spark.read.parquet(f"{sf_dir}/{tbl}.parquet")
        dfn = df.join(F.broadcast(nation), df[nk] == nation["n_nationkey"])
        parts.append(
            edge(
                dfn,
                F.concat(F.lit(pfx), F.col(key).cast("string")),
                F.concat(F.lit("n:"), F.col("n_name")),
            )
        )
    if include_orders:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        parts.append(
            edge(
                orders,
                F.concat(F.lit("o:"), F.col("o_orderkey").cast("string")),
                F.concat(F.lit("c:"), F.col("o_custkey").cast("string")),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


ENTITY_EDGES_SQL = """
edges AS (
  SELECT 'n:' || n_name AS src, 'r:' || r_name AS dst
  FROM nation JOIN region ON n_regionkey = r_regionkey
  UNION ALL
  SELECT 'c:' || c_custkey, 'n:' || n_name
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  UNION ALL
  SELECT 's:' || s_suppkey, 'n:' || n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  UNION ALL
  SELECT 'o:' || o_orderkey, 'c:' || o_custkey FROM orders)
"""


def induce_lineitem_edges(
    spark: SparkSession, sf_dir: str, max_orderkey: int = 200
) -> DataFrame:
    """(src, dst) tri-partite co-occurrence edges from a lineitem
    slice: every line item asserts order—part, part—supplier and
    order—supplier edges, so each (order, part, supplier) row closes a
    triangle — the densest graph the testdata induces (triangle-count
    probe input).  ``max_orderkey`` bounds the slice the same way the
    quadratic-recall dedup oracles are bounded (predicate pushed to the
    parquet scan)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_orderkey") <= max_orderkey
    )
    o = F.concat(F.lit("o:"), F.col("l_orderkey").cast("string"))
    p = F.concat(F.lit("p:"), F.col("l_partkey").cast("string"))
    s = F.concat(F.lit("s:"), F.col("l_suppkey").cast("string"))

    return (
        li.select(o.alias("src"), p.alias("dst"))
        .unionByName(li.select(p.alias("src"), s.alias("dst")))
        .unionByName(li.select(o.alias("src"), s.alias("dst")))
    )


def lineitem_edges_sql(max_orderkey: int = 200) -> str:
    return f"""
edges AS (
  SELECT 'o:' || l_orderkey AS src, 'p:' || l_partkey AS dst
  FROM lineitem WHERE l_orderkey <= {max_orderkey}
  UNION ALL
  SELECT 'p:' || l_partkey, 's:' || l_suppkey
  FROM lineitem WHERE l_orderkey <= {max_orderkey}
  UNION ALL
  SELECT 'o:' || l_orderkey, 's:' || l_suppkey
  FROM lineitem WHERE l_orderkey <= {max_orderkey})
"""


def induce_triples_sql(include_individuals: bool = True) -> str:
    """DuckDB CTE fragment ``triples(subj, pred, obj, obj_kind)``
    mirroring :func:`induce_triples` row-for-row (lang/datatype slots
    omitted — the profiling consumers read only the four core columns).
    Compose as ``"WITH " + induce_triples_sql() + ", ..."``."""
    core = f"""triples AS (
  SELECT '{BASE}Region_' || r_name AS subj, '{RDF.type}' AS pred,
         '{OWL.Class}' AS obj, 'uri' AS obj_kind FROM region
  UNION ALL
  SELECT '{BASE}Region_' || r_name, '{RDFS.label}', r_name, 'literal'
  FROM region
  UNION ALL
  SELECT '{BASE}Nation_' || n_name, '{RDF.type}', '{OWL.Class}', 'uri'
  FROM nation
  UNION ALL
  SELECT '{BASE}Nation_' || n_name, '{RDFS.label}', n_name, 'literal'
  FROM nation
  UNION ALL
  SELECT '{BASE}Nation_' || n_name, '{RDFS.subClassOf}',
         '{BASE}Region_' || r_name, 'uri'
  FROM nation JOIN region ON n_regionkey = r_regionkey"""
    if include_individuals:
        core += f"""
  UNION ALL
  SELECT '{BASE}customer_' || c_custkey, '{RDF.type}',
         '{OWL.NamedIndividual}', 'uri' FROM customer
  UNION ALL
  SELECT '{BASE}customer_' || c_custkey, '{RDF.type}',
         '{BASE}Nation_' || n_name, 'uri'
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  UNION ALL
  SELECT '{BASE}customer_' || c_custkey, '{RDFS.label}', c_name, 'literal'
  FROM customer
  UNION ALL
  SELECT '{BASE}customer_' || c_custkey, '{BASE}acctbal',
         printf('%.2f', c_acctbal), 'literal' FROM customer
  UNION ALL
  SELECT '{BASE}customer_' || c_custkey, '{BASE}mktsegment',
         c_mktsegment, 'literal' FROM customer
  UNION ALL
  SELECT '{BASE}supplier_' || s_suppkey, '{RDF.type}',
         '{OWL.NamedIndividual}', 'uri' FROM supplier
  UNION ALL
  SELECT '{BASE}supplier_' || s_suppkey, '{RDF.type}',
         '{BASE}Nation_' || n_name, 'uri'
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  UNION ALL
  SELECT '{BASE}supplier_' || s_suppkey, '{RDFS.label}', s_name, 'literal'
  FROM supplier
  UNION ALL
  SELECT '{BASE}supplier_' || s_suppkey, '{BASE}acctbal',
         printf('%.2f', s_acctbal), 'literal' FROM supplier"""
    return core + ")"
