from __future__ import annotations

from orionbelt_ontology_builder_spark.fixtures import BASE
from orionbelt_ontology_builder_spark.model import SKOS, TRIPLES_SCHEMA, t_uri
from orionbelt_ontology_builder_spark.operators import fixpoint


def test_transitive_closure_chain(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    got = {(r["src"], r["dst"]) for r in fixpoint.transitive_closure(edges).collect()}
    assert got == {
        ("a", "b"), ("b", "c"), ("c", "d"),
        ("a", "c"), ("b", "d"), ("a", "d"),
    }


def test_transitive_closure_handles_cycle(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    got = {(r["src"], r["dst"]) for r in fixpoint.transitive_closure(edges).collect()}
    assert got == {("a", "b"), ("b", "a"), ("a", "a"), ("b", "b")}


def test_connected_components(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "p")], ["src", "dst"]
    )
    comp = {r["node"]: r["component"] for r in fixpoint.connected_components(edges).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == "x"


def test_connected_components_long_chain(spark):
    n = 40
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n)], ["src", "dst"]
    )
    comp = {r["node"]: r["component"] for r in fixpoint.connected_components(edges).collect()}
    assert set(comp.values()) == {"n000"}
    assert len(comp) == n + 1


def test_expand_superclasses(populated_om):
    from orionbelt_ontology_builder_spark.model import RDFS

    closure = fixpoint.expand_superclasses(populated_om, RDFS.subClassOf)
    got = {(r["cls"], r["ancestor"]) for r in closure.collect()}
    assert (BASE + "Employee", BASE + "Person") in got
    assert (BASE + "Employee", BASE + "Employee") in got  # includes self


def test_broader_cycle_detection(spark, skos_om):
    clean = fixpoint.detect_broader_cycles(skos_om, SKOS.broader)
    assert clean.count() == 0
    cyc = skos_om.unionByName(
        spark.createDataFrame(
            [
                t_uri(BASE + "X", SKOS.broader, BASE + "Y"),
                t_uri(BASE + "Y", SKOS.broader, BASE + "X"),
            ],
            TRIPLES_SCHEMA,
        )
    )
    found = {r["concept"] for r in fixpoint.detect_broader_cycles(cyc, SKOS.broader).collect()}
    assert found == {BASE + "X", BASE + "Y"}
