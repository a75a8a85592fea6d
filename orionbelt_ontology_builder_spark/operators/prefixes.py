"""Prefix management as a side-table (SURVEY.md §2.8; reference
``ontology_manager.py:117-176``).

The reference keeps prefix bindings in rdflib's NamespaceManager; here
they are a tiny ``(prefix, namespace, source)`` DataFrame riding next to
the triples table — broadcast-sized metadata at any scale (a 100 TB graph
still has dozens of prefixes, not millions), so every op below is a
driver-cheap projection/union on a handful of rows.

Semantics mirrored:
  * standard prefixes (owl rdf rdfs xsd skos dc dcterms) are protected —
    ``remove_prefix`` raises (``:166-167``)
  * ``add_prefix`` overrides an existing binding of the same prefix
    (``graph.bind(..., override=True)``, ``:162-163``)
  * listings sort default-first then alphabetically (``:139``, ``:158``)
  * source classification standard / default / custom (``:145-151``)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import PREFIXES_SCHEMA, STANDARD_PREFIXES

#: reference ``OntologyManager.STANDARD_PREFIXES`` (``:117``)
PROTECTED = set(STANDARD_PREFIXES)

DEFAULT_LABEL = "(default)"


def default_prefix_table(spark: SparkSession, base_uri: str) -> DataFrame:
    """The bindings a fresh manager starts with (``__init__`` ``:64-71``):
    the seven standard prefixes plus the default namespace."""
    rows = [(p, ns, "standard") for p, ns in sorted(STANDARD_PREFIXES.items())]
    rows.append((DEFAULT_LABEL, base_uri, "default"))
    return spark.createDataFrame(rows, PREFIXES_SCHEMA)


def add_prefix(prefixes: DataFrame, prefix: str, namespace: str) -> DataFrame:
    """Bind (override=True): drop any existing row for the prefix, add
    the new binding as ``custom`` (reference ``add_prefix`` ``:162-163``)."""
    spark = prefixes.sparkSession
    new = spark.createDataFrame([(prefix, namespace, "custom")], PREFIXES_SCHEMA)
    return prefixes.filter(F.col("prefix") != prefix).unionByName(new)


def remove_prefix(prefixes: DataFrame, prefix: str) -> DataFrame:
    """Remove a custom binding; standard prefixes are protected
    (reference ``remove_prefix`` ``:165-176``)."""
    if prefix in PROTECTED:
        raise ValueError(f"Cannot remove standard prefix '{prefix}'")
    return prefixes.filter(F.col("prefix") != prefix)


def get_all_prefixes(prefixes: DataFrame) -> DataFrame:
    """Sorted listing, default-first (reference ``get_all_prefixes``
    ``:143-160``): sort key is '' for the default row."""
    return prefixes.orderBy(
        F.when(F.col("prefix") == DEFAULT_LABEL, F.lit("")).otherwise(
            F.col("prefix")
        )
    )


def resolve_prefixes(df: DataFrame, prefixes: DataFrame, uri_col: str) -> DataFrame:
    """Annotate ``df`` with the bound prefix of ``uri_col`` (reference
    ``_get_prefix_for_uri`` ``:1321-1327``): broadcast the prefix table,
    longest-namespace match wins, unbound -> NULL.

    The prefix table is broadcast so the theta-join (startswith) is a
    map-side nested loop over ~dozens of rows — no shuffle of ``df``.
    """
    from pyspark.sql.window import Window

    p = F.broadcast(
        prefixes.select(
            F.col("prefix").alias("_pfx"), F.col("namespace").alias("_ns")
        )
    )
    d = df.withColumn("_rid", F.monotonically_increasing_id())
    joined = d.join(p, F.col(uri_col).startswith(F.col("_ns")), "left")
    order = F.row_number().over(
        Window.partitionBy("_rid").orderBy(F.length(F.col("_ns")).desc_nulls_last())
    )
    return (
        joined.withColumn("_rk", order)
        .filter(F.col("_rk") == 1)
        .select(*df.columns, F.col("_pfx").alias("prefix"))
    )
