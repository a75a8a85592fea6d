"""N-Triples codec round-trip tests (SURVEY.md §2.1, M0 keystone)."""

from __future__ import annotations

import pytest

from orionbelt_ontology_builder_spark import fixtures as FX
from orionbelt_ontology_builder_spark.model import TRIPLES_SCHEMA
from orionbelt_ontology_builder_spark.sources import ntriples as NT

TRICKY = [
    ("http://x.org/a", "http://x.org/p", "http://x.org/b", "uri", None, None),
    ("_:b1", "http://x.org/p", "_:b2", "bnode", None, None),
    ("http://x.org/a", "http://x.org/p", "plain text", "literal", None, None),
    ("http://x.org/a", "http://x.org/p", "tagged", "literal", "en-GB", None),
    ("http://x.org/a", "http://x.org/p", "42", "literal", None,
     "http://www.w3.org/2001/XMLSchema#integer"),
    ("http://x.org/a", "http://x.org/p", 'has "quotes" and \\backslash\\',
     "literal", None, None),
    ("http://x.org/a", "http://x.org/p", "line1\nline2\ttabbed\rcr",
     "literal", None, None),
    ("http://x.org/a", "http://x.org/p", 'ends with \\', "literal", None, None),
    ("http://x.org/a", "http://x.org/p", "\\n not a newline", "literal", None, None),
    ("http://x.org/a", "http://x.org/p", "Ünïcödé ✓ 中文", "literal", None, None),
    ("http://x.org/a", "http://x.org/p", "", "literal", None, None),
]


def _roundtrip(spark, rows):
    df = spark.createDataFrame(rows, TRIPLES_SCHEMA)
    back = NT.parse_nt(NT.serialize_nt(df))
    return sorted(map(tuple, back.collect()))


def test_roundtrip_tricky_literals(spark):
    assert _roundtrip(spark, TRICKY) == sorted(TRICKY)


@pytest.mark.parametrize("name", ["populated_om", "skos_om", "axioms_om"])
def test_roundtrip_fixtures(spark, name):
    rows = [tuple(r) for r in FX.FIXTURES[name]]
    assert _roundtrip(spark, rows) == sorted(set(rows))


def test_malformed_lines_dropped(spark):
    lines = spark.createDataFrame(
        [("<http://a> <http://p> <http://b> .",),
         ("# a comment",),
         ("",),
         ("garbage line",)],
        "line string",
    )
    out = NT.parse_nt(lines).collect()
    assert len(out) == 1
    assert out[0]["subj"] == "http://a"


def test_snapshot_restore_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(TRICKY, TRIPLES_SCHEMA)
    NT.snapshot(df, str(tmp_path / "snap"))
    back = NT.restore(spark, str(tmp_path / "snap"))
    assert sorted(map(tuple, back.collect())) == sorted(TRICKY)


def test_write_read_nt_files(spark, tmp_path):
    df = spark.createDataFrame(TRICKY, TRIPLES_SCHEMA)
    NT.write_nt(df, str(tmp_path / "dump"))
    back = NT.read_nt(spark, str(tmp_path / "dump"))
    assert sorted(map(tuple, back.collect())) == sorted(TRICKY)


def test_nq_roundtrip_graph_term(spark):
    from pyspark.sql import functions as F
    from orionbelt_ontology_builder_spark.fixtures import fixture_triples
    from orionbelt_ontology_builder_spark.sources import ntriples as NT

    quads = fixture_triples(spark, "axioms_om").withColumn(
        "graph",
        F.when(F.col("obj_kind") == "literal", F.lit("http://g/a")),
    )
    back = NT.parse_nq(NT.serialize_nq(quads))
    want = sorted(map(tuple, quads.collect()))
    got = sorted(map(tuple, back.select(*quads.columns).collect()))
    assert got == want
    # graph term round-trips exactly where set, null elsewhere
    assert any(r[-1] == "http://g/a" for r in got)
    assert any(r[-1] is None for r in got)


def test_nq_malformed_and_default_graph_lines(spark):
    from orionbelt_ontology_builder_spark.sources import ntriples as NT

    lines = spark.createDataFrame(
        [
            ('<s> <p> "v" <http://g> .',),
            ("<s> <p> <o> .",),                       # default graph
            ('<s> <p> "x"@en <http://g> .',),
            ("<s> <p> .",),                           # malformed: dropped
            ('<s> <p> "tricky ." <http://g> .',),     # dot inside literal
        ],
        "line string",
    )
    rows = {(r["obj"], r["graph"]) for r in NT.parse_nq(lines).collect()}
    assert rows == {
        ("v", "http://g"), ("o", None), ("x", "http://g"),
        ("tricky .", "http://g"),
    }
