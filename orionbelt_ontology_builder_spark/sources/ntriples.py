"""N-Triples codec as native Spark SQL (SURVEY.md §2.1).

The reference serializes/parses via rdflib (``ontology_manager.py:
2295-2297``, ``2400-2408``); N-Triples is the one W3C syntax that is
line-oriented, so at 100 TB it is the right bulk interchange format:
``spark.read.text`` splits by line, the codec below is a pure projection
(regexp_extract / concat), and both directions run inside whole-stage
codegen with zero Python.

Escaping follows the N-Triples spec for the control set
(``\\`` ``"`` LF CR TAB); parsing accepts uri / bnode / literal objects
with optional ``@lang`` or ``^^<datatype>`` qualifiers — exactly the
lossless 6-column term encoding of the triples schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import TRIPLES_SCHEMA


def _escape(c):
    out = F.regexp_replace(c, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', '\\\\"')
    out = F.regexp_replace(out, "\n", "\\\\n")
    out = F.regexp_replace(out, "\r", "\\\\r")
    out = F.regexp_replace(out, "\t", "\\\\t")
    return out


def _unescape(c):
    # reverse order of _escape; placeholder dance avoids double-unescape
    # of a literal backslash followed by n/r/t
    out = F.regexp_replace(c, r"\\\\", "\x00")
    out = F.regexp_replace(out, r"\\n", "\n")
    out = F.regexp_replace(out, r"\\r", "\r")
    out = F.regexp_replace(out, r"\\t", "\t")
    out = F.regexp_replace(out, r'\\"', '"')
    return F.regexp_replace(out, "\x00", r"\\")


def _term(node, kind):
    """Render subject/object by term kind."""
    return (
        F.when(kind == "uri", F.concat(F.lit("<"), node, F.lit(">")))
        .when(kind == "bnode", node)  # already "_:label"
        .otherwise(F.concat(F.lit('"'), _escape(node), F.lit('"')))
    )


def _nt_line_expr():
    """Column expression rendering the 6 triple columns as one
    N-Triples line (shared by serialize_nt / serialize_nq)."""
    subj_kind = F.when(
        F.col("subj").startswith("_:"), F.lit("bnode")
    ).otherwise(F.lit("uri"))
    obj_base = _term(F.col("obj"), F.col("obj_kind"))
    obj_full = (
        F.when(
            (F.col("obj_kind") == "literal") & F.col("obj_lang").isNotNull(),
            F.concat(obj_base, F.lit("@"), F.col("obj_lang")),
        )
        .when(
            (F.col("obj_kind") == "literal") & F.col("obj_dt").isNotNull(),
            F.concat(obj_base, F.lit("^^<"), F.col("obj_dt"), F.lit(">")),
        )
        .otherwise(obj_base)
    )
    return F.concat(
        _term(F.col("subj"), subj_kind),
        F.lit(" <"),
        F.col("pred"),
        F.lit("> "),
        obj_full,
        F.lit(" ."),
    )


def serialize_nt(triples: DataFrame) -> DataFrame:
    """triples -> one N-Triples ``line`` per row (order-insensitive)."""
    return triples.select(_nt_line_expr().alias("line"))


#: One regex per term position; anchored so junk lines yield NULLs.
_SUBJ = r"^(?:<([^>]*)>|(_:\S+))\s"
_PRED = r"^\s*(?:<[^>]*>|_:\S+)\s+<([^>]*)>"
_OBJ = (
    r"^\s*(?:<[^>]*>|_:\S+)\s+<[^>]*>\s+"
    r"(?:<([^>]*)>|(_:\S+)|\"((?:[^\"\\]|\\.)*)\""
    r"(?:@([A-Za-z0-9-]+)|\^\^<([^>]*)>)?)\s*\.\s*$"
)


def parse_nt(lines: DataFrame, column: str = "line") -> DataFrame:
    """N-Triples lines -> 6-column triples (malformed lines dropped).

    Pure projection: three anchored ``regexp_extract`` families; scales
    with input splits (``spark.read.text`` on a 100 TB dump gives
    per-block line parsing with no cross-row state).
    """
    c = F.col(column)
    s_uri = F.regexp_extract(c, _SUBJ, 1)
    s_bn = F.regexp_extract(c, _SUBJ, 2)
    pred = F.regexp_extract(c, _PRED, 1)
    o_uri = F.regexp_extract(c, _OBJ, 1)
    o_bn = F.regexp_extract(c, _OBJ, 2)
    o_lit = F.regexp_extract(c, _OBJ, 3)
    o_lang = F.regexp_extract(c, _OBJ, 4)
    o_dt = F.regexp_extract(c, _OBJ, 5)
    # Full-line gate: a row is a triple only if the whole object-term
    # grammar anchored at EOL matches.  Without it a line like
    # '<s> <p> .' (no object) extracts '' everywhere and the otherwise-
    # branch would fabricate an empty literal instead of dropping it.
    ok = c.rlike(_OBJ)
    parsed = lines.filter(ok).select(
        F.when(s_uri != "", s_uri).otherwise(s_bn).alias("subj"),
        pred.alias("pred"),
        F.when(o_uri != "", o_uri)
        .when(o_bn != "", o_bn)
        .otherwise(_unescape(o_lit))
        .alias("obj"),
        F.when(o_uri != "", F.lit("uri"))
        .when(o_bn != "", F.lit("bnode"))
        .otherwise(F.lit("literal"))
        .alias("obj_kind"),
        F.when(o_lang != "", o_lang).cast("string").alias("obj_lang"),
        F.when(o_dt != "", o_dt).cast("string").alias("obj_dt"),
    )
    return parsed.filter(
        (F.col("subj") != "") & (F.col("pred") != "")
    )


def write_nt(triples: DataFrame, path: str) -> None:
    """Bulk sink: one text part per partition (the snapshot format)."""
    serialize_nt(triples).write.mode("overwrite").text(path)


def read_nt(spark: SparkSession, path: str) -> DataFrame:
    """Bulk source: line-parallel parse of an N-Triples dump."""
    lines = spark.read.text(path).withColumnRenamed("value", "line")
    return parse_nt(lines)


def snapshot(triples: DataFrame, path: str) -> None:
    """Parquet snapshot (the undo/versioning checkpoint — Iceberg
    ``VERSION AS OF`` on a real cluster, a plain dir locally;
    reference ``take_snapshot`` ``ontology_manager.py:2400-2402``)."""
    triples.write.mode("overwrite").parquet(path)


def restore(spark: SparkSession, path: str) -> DataFrame:
    """Read a snapshot back (reference ``restore_snapshot`` ``:2404-2408``)."""
    return spark.read.schema(TRIPLES_SCHEMA).parquet(path)


# --------------------------------------------------------------------------
# N-Quads (triples + named graph / provenance term)
# --------------------------------------------------------------------------

#: object term optionally followed by a <graph> IRI before the dot.
_OBJQ = (
    r"^\s*(?:<[^>]*>|_:\S+)\s+<[^>]*>\s+"
    r"(?:<([^>]*)>|(_:\S+)|\"((?:[^\"\\]|\\.)*)\""
    r"(?:@([A-Za-z0-9-]+)|\^\^<([^>]*)>)?)"
    r"(?:\s+<([^>]*)>)?\s*\.\s*$"
)


def serialize_nq(quads: DataFrame) -> DataFrame:
    """quads (triples + nullable ``graph`` uri column) -> one N-Quads
    ``line`` per row.  Null graph = default graph (plain triple line)
    — the standard way to ship per-source provenance
    (graph = crawl/source IRI) through a line-parallel bulk format.
    Pure projection like serialize_nt."""
    line = _nt_line_expr()
    return quads.select(
        F.when(
            F.col("graph").isNotNull(),
            F.concat(
                F.regexp_replace(line, r" \.$", ""),
                F.lit(" <"),
                F.col("graph"),
                F.lit("> ."),
            ),
        )
        .otherwise(line)
        .alias("line")
    )


def parse_nq(lines: DataFrame, column: str = "line") -> DataFrame:
    """N-Quads lines -> 7-column quads (6 triple columns + ``graph``,
    null for default-graph lines; malformed lines dropped).  The same
    anchored-regex pure projection as parse_nt — per-block line
    parsing, no cross-row state, no joins."""
    c = F.col(column)
    s_uri = F.regexp_extract(c, _SUBJ, 1)
    s_bn = F.regexp_extract(c, _SUBJ, 2)
    pred = F.regexp_extract(c, _PRED, 1)
    o_uri = F.regexp_extract(c, _OBJQ, 1)
    o_bn = F.regexp_extract(c, _OBJQ, 2)
    o_lit = F.regexp_extract(c, _OBJQ, 3)
    o_lang = F.regexp_extract(c, _OBJQ, 4)
    o_dt = F.regexp_extract(c, _OBJQ, 5)
    graph = F.regexp_extract(c, _OBJQ, 6)
    parsed = lines.filter(c.rlike(_OBJQ)).select(
        F.when(s_uri != "", s_uri).otherwise(s_bn).alias("subj"),
        pred.alias("pred"),
        F.when(o_uri != "", o_uri)
        .when(o_bn != "", o_bn)
        .otherwise(_unescape(o_lit))
        .alias("obj"),
        F.when(o_uri != "", F.lit("uri"))
        .when(o_bn != "", F.lit("bnode"))
        .otherwise(F.lit("literal"))
        .alias("obj_kind"),
        F.when(o_lang != "", o_lang).cast("string").alias("obj_lang"),
        F.when(o_dt != "", o_dt).cast("string").alias("obj_dt"),
        F.when(graph != "", graph).cast("string").alias("graph"),
    )
    return parsed.filter((F.col("subj") != "") & (F.col("pred") != ""))
