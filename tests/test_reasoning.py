from __future__ import annotations

import pytest

from orionbelt_ontology_builder_spark.fixtures import BASE, fixture_triples
from orionbelt_ontology_builder_spark.model import (
    OWL,
    RDF,
    RDFS,
    TRIPLES_SCHEMA,
    t_uri,
)
from orionbelt_ontology_builder_spark.operators.reasoning import apply_reasoning


def _has(df, s, p, o):
    return (
        df.filter((df.subj == s) & (df.pred == p) & (df.obj == o)).count() == 1
    )


def test_type_propagation_and_domain(spark, populated_om):
    extra = spark.createDataFrame(
        [t_uri(BASE + "alice", BASE + "worksFor", BASE + "acme")], TRIPLES_SCHEMA
    )
    expanded, n = apply_reasoning(populated_om.unionByName(extra))
    # rdfs9: alice is Employee, Employee subClassOf Person -> alice a Person
    assert _has(expanded, BASE + "alice", RDF.type, BASE + "Person")
    # rdfs2: worksFor domain Person -> alice a Person (same), rdfs3: acme a Organization (already)
    assert n > 0


def test_subclass_transitivity(spark):
    rows = [
        t_uri(BASE + "A", RDFS.subClassOf, BASE + "B"),
        t_uri(BASE + "B", RDFS.subClassOf, BASE + "C"),
        t_uri(BASE + "C", RDFS.subClassOf, BASE + "D"),
    ]
    expanded, n = apply_reasoning(spark.createDataFrame(rows, TRIPLES_SCHEMA))
    assert _has(expanded, BASE + "A", RDFS.subClassOf, BASE + "D")
    assert n == 3  # A->C, A->D, B->D


def test_inverse_and_symmetric(spark):
    rows = [
        t_uri(BASE + "hasPart", OWL.inverseOf, BASE + "partOf"),
        t_uri(BASE + "x", BASE + "hasPart", BASE + "y"),
        t_uri(BASE + "knows", RDF.type, OWL.SymmetricProperty),
        t_uri(BASE + "a", BASE + "knows", BASE + "b"),
    ]
    expanded, _ = apply_reasoning(spark.createDataFrame(rows, TRIPLES_SCHEMA))
    assert _has(expanded, BASE + "y", BASE + "partOf", BASE + "x")
    assert _has(expanded, BASE + "b", BASE + "knows", BASE + "a")


def test_transitive_property_and_sameas(spark):
    rows = [
        t_uri(BASE + "ancestorOf", RDF.type, OWL.TransitiveProperty),
        t_uri(BASE + "a", BASE + "ancestorOf", BASE + "b"),
        t_uri(BASE + "b", BASE + "ancestorOf", BASE + "c"),
        t_uri(BASE + "e1", OWL.sameAs, BASE + "e2"),
        t_uri(BASE + "e2", OWL.sameAs, BASE + "e3"),
    ]
    expanded, _ = apply_reasoning(spark.createDataFrame(rows, TRIPLES_SCHEMA))
    assert _has(expanded, BASE + "a", BASE + "ancestorOf", BASE + "c")
    assert _has(expanded, BASE + "e3", OWL.sameAs, BASE + "e1")
    assert _has(expanded, BASE + "e1", OWL.sameAs, BASE + "e3")


def test_reasoning_idempotent(populated_om):
    once, n1 = apply_reasoning(populated_om)
    twice, n2 = apply_reasoning(once)
    assert n2 == 0
    assert twice.count() == once.count()
