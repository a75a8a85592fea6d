"""Integration tests on the reference repo's bundled sample ontologies
(real-world pizza/wine/foaf/prov-o/goodrelations/gist files — data, not
code), mirroring the reference's test_samples.py invariants: load, min
entity counts, statistics/validation shape, search hits, round-trip.

Our round-trip is asserted EXACT (not the reference's <10% bnode-drift
tolerance) because the engine preserves bnode labels through
serialize/parse."""

from __future__ import annotations

import os

import pytest

from orionbelt_ontology_builder_spark.operators import validation, views
from orionbelt_ontology_builder_spark.sources import parsers as PAR
from orionbelt_ontology_builder_spark.sources import serializers as SER

SAMPLES = "/root/reference/samples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLES), reason="reference samples not present"
)


def _load(spark, fname):
    fmt = "ttl" if fname.endswith(".ttl") else "xml"
    text = open(os.path.join(SAMPLES, fname), encoding="utf-8").read()
    return PAR.parse(spark, text, fmt).cache()


def test_pizza_classes_and_restrictions(spark):
    t = _load(spark, "pizza.owl")
    assert t.count() > 1900
    classes = views.get_classes(t)
    assert classes.count() >= 50            # reference: >=50 pizza classes
    rest = views.get_restrictions(t)
    assert rest.count() > 100               # pizza is restriction-heavy
    stats = views.get_statistics(t).first()
    assert stats["classes"] >= 50 and stats["total_triples"] > 1900


def test_wine_class_expressions(spark):
    from orionbelt_ontology_builder_spark.operators import lists

    t = _load(spark, "wine.owl")
    exprs = lists.get_class_expressions(t)
    assert exprs.count() > 30               # unionOf/oneOf via Collections
    assert t.count() > 1900


def test_foaf_properties(spark):
    t = _load(spark, "foaf.rdf")
    props = views.get_object_properties(t)
    dprops = views.get_data_properties(t)
    assert props.count() + dprops.count() > 40
    hits = views.search(t, "person")
    assert hits.count() > 0


def test_geography_thesaurus_skos(spark):
    t = _load(spark, "geography-thesaurus.ttl")
    concepts = views.get_concepts(t)
    assert concepts.count() >= 100          # reference: 100+ concepts
    hierarchy = views.get_concept_hierarchy(t)
    assert hierarchy.count() >= 100
    issues = validation.validate_skos(t)
    assert set(issues.columns) == {"severity", "issue_type", "subject", "message"}


def test_provo_loads_and_validates(spark):
    t = _load(spark, "prov-o.ttl")
    assert t.count() > 1000
    issues = validation.validate(t)
    assert issues.count() >= 0              # shape check; runs end-to-end


@pytest.mark.parametrize("fname", ["pizza.owl", "geography-thesaurus.ttl"])
def test_roundtrip_exact(spark, fname):
    t = _load(spark, fname)
    rows = [
        (r["subj"], r["pred"], r["obj"], r["obj_kind"], r["obj_lang"], r["obj_dt"])
        for r in t.collect()
    ]
    for ser, par in [(SER.to_turtle, PAR.parse_turtle),
                     (SER.to_rdfxml, PAR.parse_rdfxml),
                     (SER.to_jsonld, PAR.parse_jsonld)]:
        back = par(ser(rows))
        assert sorted(set(back)) == sorted(set(rows))


@pytest.mark.parametrize(
    "fname",
    [
        "geography-thesaurus.ttl",
        "prov-o.ttl",
        "gist/gistCore14.1.0.ttl",
        "gist/gistRdfsAnnotations14.1.0.ttl",
        "gist/gistSubClassAssertions14.1.0.ttl",
        "gist/gistMediaTypes14.1.0.ttl",
    ],
)
def test_statement_counter_matches_parser(spark, fname):
    """The independent separator-counting statement counter
    (sources/stmtcount.py) agrees with the Turtle parser's triple count
    on every sample Turtle file — the cross-check that keeps the
    upper_ontology_stats oracle's total_triples column from being
    self-certified by the parser it grades."""
    from orionbelt_ontology_builder_spark.sources import stmtcount as SC

    text = open(os.path.join(SAMPLES, fname), encoding="utf-8").read()
    independent = SC.count_turtle_statements(text)
    parsed = PAR.parse(spark, text, "ttl").count()
    assert independent == parsed


def test_gist_total_triples_derivation():
    """oracle_sql()'s upper_ontology_stats total_triples equals the
    independent counter's sum over required+default gist modules."""
    from orionbelt_ontology_builder_spark import templates as T
    from orionbelt_ontology_builder_spark.sources import stmtcount as SC

    total = sum(
        SC.count_turtle_statements(T.load_upper_ontology_module(m))
        for m in T.UPPER_ONTOLOGIES[0]["modules"]
        if m.get("required") or m.get("default")
    )
    assert total == 3409  # the parser-independent regression value
