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
