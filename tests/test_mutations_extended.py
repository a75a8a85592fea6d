"""Round-2 mutation surface: restrictions, annotation alias map +
exact-literal delete, update_* upserts, rename guard, metadata/import
setters, SKOS update/delete, axiom builders, bulk ops.

Mirrors the reference's test laws: tests/test_annotations.py,
test_metadata.py, test_skos.py, test_bulk.py, test_properties.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orionbelt_ontology_builder_spark.fixtures import BASE, ONT
from orionbelt_ontology_builder_spark.model import (
    OWL,
    RDF,
    RDFS,
    SKOS,
    XSD,
)
from orionbelt_ontology_builder_spark.model import DCT_NS
from orionbelt_ontology_builder_spark.operators import lists, mutations, views


def _objs(df, subj, pred):
    return sorted(
        r["obj"] for r in df.filter((df.subj == subj) & (df.pred == pred)).collect()
    )


# ------------------------------------------------------------------ #
# annotations (reference tests/test_annotations.py)
# ------------------------------------------------------------------ #


def test_add_annotation_alias_and_lang(populated_om):
    out = mutations.add_annotation(populated_om, "Person", "label", "Persona", BASE, lang="es")
    rows = out.filter(
        (out.subj == BASE + "Person") & (out.pred == RDFS.label) & (out.obj == "Persona")
    ).collect()
    assert len(rows) == 1 and rows[0]["obj_lang"] == "es"


def test_add_annotation_dcterms_alias(populated_om):
    out = mutations.add_annotation(populated_om, "Person", "title", "The Person", BASE)
    assert _objs(out, BASE + "Person", DCT_NS + "title") == ["The Person"]


def test_add_annotation_unknown_name_uses_base(populated_om):
    out = mutations.add_annotation(populated_om, "Person", "myNote", "x", BASE)
    assert _objs(out, BASE + "Person", BASE + "myNote") == ["x"]


def test_delete_language_tagged_annotation(populated_om):
    out = mutations.add_annotation(populated_om, "Person", "label", "Persona", BASE, lang="es")
    out = mutations.delete_annotation(out, "Person", "label", BASE, value="Persona", lang="es")
    assert "Persona" not in _objs(out, BASE + "Person", RDFS.label)
    # the untagged English label survives
    assert "Person" in _objs(out, BASE + "Person", RDFS.label)


def test_delete_without_lang_removes_all_matching_values(populated_om):
    out = mutations.add_annotation(populated_om, "Person", "label", "Persona", BASE, lang="es")
    out = mutations.add_annotation(out, "Person", "label", "Persona", BASE, lang="fr")
    out = mutations.delete_annotation(out, "Person", "label", BASE, value="Persona")
    assert "Persona" not in _objs(out, BASE + "Person", RDFS.label)


def test_delete_by_predicate_only(populated_om):
    out = mutations.add_annotation(populated_om, "Person", "comment", "Note 1", BASE)
    out = mutations.add_annotation(out, "Person", "comment", "Note 2", BASE)
    out = mutations.delete_annotation(out, "Person", "comment", BASE)
    assert _objs(out, BASE + "Person", RDFS.comment) == []


def test_delete_by_datatype(populated_om):
    spark = populated_om.sparkSession
    extra = spark.createDataFrame(
        [(BASE + "Person", BASE + "age", "42", "literal", None, XSD.integer)],
        populated_om.schema,
    )
    out = mutations.add_triples(populated_om, extra)
    out = mutations.delete_annotation(
        out, "Person", "age", BASE, value="42", datatype="integer"
    )
    assert _objs(out, BASE + "Person", BASE + "age") == []


# ------------------------------------------------------------------ #
# update_* upserts
# ------------------------------------------------------------------ #


def test_update_class_label_and_parent_swap(populated_om):
    out = mutations.update_class(
        populated_om, "Employee", BASE,
        new_label="Staff", new_parent="Organization", remove_parent="Person",
    )
    assert _objs(out, BASE + "Employee", RDFS.label) == ["Staff"]
    assert _objs(out, BASE + "Employee", RDFS.subClassOf) == [BASE + "Organization"]


def test_update_class_empty_string_clears(populated_om):
    out = mutations.update_class(populated_om, "Person", BASE, new_label="")
    assert _objs(out, BASE + "Person", RDFS.label) == []


def test_update_property_range_datatype_dispatch(populated_om):
    out = mutations.update_property(populated_om, "hasName", BASE, new_range="integer")
    assert _objs(out, BASE + "hasName", RDFS.range) == [XSD.integer]
    out2 = mutations.update_property(populated_om, "worksFor", BASE, new_range="Person")
    assert _objs(out2, BASE + "worksFor", RDFS.range) == [BASE + "Person"]


def test_update_individual_class_swap(populated_om):
    out = mutations.update_individual(
        populated_om, "alice", BASE, add_class="Person", remove_class="Employee"
    )
    types = _objs(out, BASE + "alice", RDF.type)
    assert BASE + "Person" in types and BASE + "Employee" not in types
    assert OWL.NamedIndividual in types


def test_rename_checked_refuses_existing_target(populated_om):
    out, ok = mutations.rename_checked(
        populated_om, BASE + "Employee", BASE + "Person", [OWL.Class]
    )
    assert not ok
    assert out.filter(out.subj == BASE + "Employee").count() > 0


def test_rename_checked_applies_when_free(populated_om):
    out, ok = mutations.rename_checked(
        populated_om, BASE + "Employee", BASE + "Staff", [OWL.Class]
    )
    assert ok
    assert out.filter(out.subj == BASE + "Employee").count() == 0


def test_rename_same_name_noop(populated_om):
    out, ok = mutations.rename_checked(
        populated_om, BASE + "Person", BASE + "Person", [OWL.Class]
    )
    assert ok and out.count() == populated_om.count()


# ------------------------------------------------------------------ #
# ontology metadata / imports (reference tests/test_metadata.py)
# ------------------------------------------------------------------ #


def test_set_metadata(populated_om):
    out = mutations.set_ontology_metadata(
        populated_om, ONT, label="My Ontology", comment="A test", creator="Tester"
    )
    assert _objs(out, ONT, RDFS.label) == ["My Ontology"]
    assert _objs(out, ONT, RDFS.comment) == ["A test"]
    assert _objs(out, ONT, DCT_NS + "creator") == ["Tester"]


def test_clear_metadata(populated_om):
    out = mutations.set_ontology_metadata(populated_om, ONT, label="X", comment="Y")
    out = mutations.set_ontology_metadata(out, ONT, label="", comment="")
    assert _objs(out, ONT, RDFS.label) == []
    assert _objs(out, ONT, RDFS.comment) == []


def test_omitted_params_leave_unchanged(populated_om):
    out = mutations.set_ontology_metadata(populated_om, ONT, label="Keep")
    out = mutations.set_ontology_metadata(out, ONT, comment="New comment")
    assert _objs(out, ONT, RDFS.label) == ["Keep"]
    assert _objs(out, ONT, RDFS.comment) == ["New comment"]


def test_version_iri_set_and_clear(populated_om):
    out = mutations.set_ontology_metadata(populated_om, ONT, version_iri="http://example.org/v1")
    assert _objs(out, ONT, OWL.versionIRI) == ["http://example.org/v1"]
    out = mutations.set_ontology_metadata(out, ONT, version_iri="")
    assert _objs(out, ONT, OWL.versionIRI) == []


def test_add_remove_import(populated_om):
    out = mutations.add_import(populated_om, ONT, "http://example.org/other")
    assert _objs(out, ONT, OWL.imports) == ["http://example.org/other"]
    out = mutations.remove_import(out, ONT, "http://example.org/other")
    assert _objs(out, ONT, OWL.imports) == []


# ------------------------------------------------------------------ #
# restrictions (reference ontology_manager.py:1101-1195)
# ------------------------------------------------------------------ #


def test_add_restriction_some_values_roundtrip(populated_om):
    out = mutations.add_restriction(
        populated_om, "Person", "worksFor", "someValuesFrom", "Organization", BASE
    )
    rows = views.get_restrictions(out).collect()
    got = [
        (r["on_property"], r["restriction_type"], r["value"], list(r["applied_to"]))
        for r in rows
    ]
    assert (
        BASE + "worksFor", "someValuesFrom", BASE + "Organization", [BASE + "Person"]
    ) in got


def test_add_restriction_qualified_cardinality(populated_om):
    out = mutations.add_restriction(
        populated_om, "Person", "worksFor", "qualifiedCardinality", 2, BASE,
        on_class="Organization",
    )
    rows = views.get_restrictions(out).collect()
    match = [r for r in rows if r["restriction_type"] == "qualifiedCardinality"]
    assert match and match[0]["value"] == "2" and match[0]["on_class"] == BASE + "Organization"


def test_add_restriction_has_value_literal_vs_uri(populated_om):
    out = mutations.add_restriction(
        populated_om, "Person", "hasName", "hasValue", "Bob", BASE
    )
    r = out.filter(out.pred == OWL.hasValue).collect()[0]
    assert r["obj_kind"] == "literal" and r["obj"] == "Bob"
    out2 = mutations.add_restriction(
        populated_om, "Person", "worksFor", "hasValue", "http://x.org/acme", BASE
    )
    r2 = out2.filter(out2.pred == OWL.hasValue).collect()[0]
    assert r2["obj_kind"] == "uri"


def test_add_restriction_unknown_type_raises(populated_om):
    with pytest.raises(ValueError, match="Unknown restriction type"):
        mutations.add_restriction(populated_om, "Person", "worksFor", "bogus", 1, BASE)


def test_delete_restriction_removes_bnode_and_link(populated_om):
    out = mutations.add_restriction(
        populated_om, "Person", "worksFor", "someValuesFrom", "Organization", BASE
    )
    out = mutations.delete_restriction(out, "Person", "worksFor", "someValuesFrom", BASE)
    assert out.filter(out.pred == OWL.onProperty).count() == 0
    assert views.get_restrictions(out).count() == 0
    assert out.count() == populated_om.count()


def test_delete_restriction_keeps_other_classes(populated_om):
    out = mutations.add_restriction(
        populated_om, "Person", "worksFor", "someValuesFrom", "Organization", BASE
    )
    out = mutations.add_restriction(
        out, "Organization", "worksFor", "minCardinality", 1, BASE
    )
    out = mutations.delete_restriction(out, "Person", "worksFor", "someValuesFrom", BASE)
    rows = views.get_restrictions(out).collect()
    assert len(rows) == 1 and list(rows[0]["applied_to"]) == [BASE + "Organization"]


# ------------------------------------------------------------------ #
# SKOS update/delete (reference tests/test_skos.py)
# ------------------------------------------------------------------ #


def test_update_concept_broader_swap_maintains_inverse(skos_om):
    out = mutations.update_concept(skos_om, "Dog", BASE, new_broader="Cat")
    assert _objs(out, BASE + "Dog", SKOS.broader) == [BASE + "Cat"]
    assert BASE + "Dog" in _objs(out, BASE + "Cat", SKOS.narrower)
    # the old Animal->Dog narrower mirror is gone
    assert BASE + "Dog" not in _objs(out, BASE + "Animal", SKOS.narrower)


def test_update_concept_clear_broader(skos_om):
    out = mutations.update_concept(skos_om, "Dog", BASE, new_broader="")
    assert _objs(out, BASE + "Dog", SKOS.broader) == []
    assert BASE + "Dog" not in _objs(out, BASE + "Animal", SKOS.narrower)


def test_update_concept_scheme_swap(skos_om):
    out = mutations.update_concept(
        skos_om, "Dog", BASE, add_scheme="Other", remove_scheme="MyScheme"
    )
    assert _objs(out, BASE + "Dog", SKOS.inScheme) == [BASE + "Other"]


def test_update_concept_pref_label(skos_om):
    out = mutations.update_concept(skos_om, "Dog", BASE, new_pref_label="Hound")
    assert _objs(out, BASE + "Dog", SKOS.prefLabel) == ["Hound"]


def test_update_concept_scheme_label(skos_om):
    out = mutations.update_concept_scheme(skos_om, "MyScheme", BASE, new_label="Renamed")
    assert _objs(out, BASE + "MyScheme", RDFS.label) == ["Renamed"]


def test_delete_concept_scheme_cleans_inscheme(skos_om):
    out = mutations.delete_concept_scheme(skos_om, "MyScheme", BASE)
    assert out.filter(out.subj == BASE + "MyScheme").count() == 0
    assert out.filter((out.pred == SKOS.inScheme) & (out.obj == BASE + "MyScheme")).count() == 0


def test_add_concept_relation_unknown_raises(skos_om):
    with pytest.raises(ValueError, match="Unknown SKOS relation"):
        mutations.add_concept_relation(skos_om, "Dog", "invalidRel", "Cat", BASE)


def test_add_concept_relation_short_name_symmetric(skos_om):
    out = mutations.add_concept_relation(skos_om, "Dog", "related", "Cat", BASE)
    assert BASE + "Cat" in _objs(out, BASE + "Dog", SKOS.related)
    assert BASE + "Dog" in _objs(out, BASE + "Cat", SKOS.related)


def test_add_concept_with_lang(populated_om):
    out = mutations.add_concept(populated_om, "Hund", BASE, pref_label="Hund", lang="de")
    r = out.filter((out.subj == BASE + "Hund") & (out.pred == SKOS.prefLabel)).collect()[0]
    assert r["obj_lang"] == "de"


# ------------------------------------------------------------------ #
# typed relations with vocab maps
# ------------------------------------------------------------------ #


def test_class_relation_add_remove(populated_om):
    out = mutations.add_class_relation(populated_om, "Person", "disjointWith", "Organization", BASE)
    assert _objs(out, BASE + "Person", OWL.disjointWith) == [BASE + "Organization"]
    out = mutations.remove_class_relation(out, "Person", "disjointWith", "Organization", BASE)
    assert _objs(out, BASE + "Person", OWL.disjointWith) == []


def test_unknown_relation_type_is_noop(populated_om):
    out = mutations.add_class_relation(populated_om, "Person", "bogus", "Organization", BASE)
    assert out.count() == populated_om.count()


def test_individual_relation_same_as(populated_om):
    out = mutations.add_individual_relation(populated_om, "alice", "sameAs", "acme", BASE)
    assert _objs(out, BASE + "alice", OWL.sameAs) == [BASE + "acme"]


# ------------------------------------------------------------------ #
# axiom builders round-trip through the lists decoders
# ------------------------------------------------------------------ #


def test_property_chain_builder_roundtrip(populated_om):
    out = mutations.add_property_chain(
        populated_om, "worksFor", ["memberOf", "employs"], BASE
    )
    rows = lists.get_property_chains(out).collect()
    got = [(r["property"], list(r["chain"])) for r in rows]
    assert (BASE + "worksFor", [BASE + "memberOf", BASE + "employs"]) in got


def test_class_expression_union_roundtrip(populated_om):
    out = mutations.add_class_expression(
        populated_om, "Agent", "unionOf", BASE, classes=["Person", "Organization"]
    )
    rows = lists.get_class_expressions(out).collect()
    got = [(r["cls"], r["expression_type"], list(r["members"])) for r in rows]
    assert (BASE + "Agent", "unionOf", [BASE + "Person", BASE + "Organization"]) in got


def test_class_expression_complement(populated_om):
    out = mutations.add_class_expression(
        populated_om, "NonPerson", "complementOf", BASE, classes=["Person"]
    )
    rows = lists.get_class_expressions(out).collect()
    got = [(r["cls"], r["expression_type"], list(r["members"])) for r in rows]
    assert (BASE + "NonPerson", "complementOf", [BASE + "Person"]) in got


def test_class_expression_one_of(populated_om):
    out = mutations.add_class_expression(
        populated_om, "Founders", "oneOf", BASE, individuals=["alice", "acme"]
    )
    rows = lists.get_class_expressions(out).collect()
    got = [(r["cls"], r["expression_type"], list(r["members"])) for r in rows]
    assert (BASE + "Founders", "oneOf", [BASE + "alice", BASE + "acme"]) in got


def test_all_different_builder_roundtrip(populated_om):
    out = mutations.add_all_different(populated_om, ["alice", "acme"], BASE)
    rows = lists.get_all_different(out).collect()
    assert any(list(r["members"]) == [BASE + "alice", BASE + "acme"] for r in rows)


def test_has_key_builder_roundtrip(populated_om):
    out = mutations.add_has_key(populated_om, "Person", ["hasName"], BASE)
    rows = lists.get_has_keys(out).collect()
    assert any(
        r["cls"] == BASE + "Person" and list(r["key_properties"]) == [BASE + "hasName"]
        for r in rows
    )


def test_disjoint_union_builder_roundtrip(populated_om):
    out = mutations.add_disjoint_union(
        populated_om, "Agent", ["Person", "Organization"], BASE
    )
    rows = lists.get_disjoint_unions(out).collect()
    assert any(
        r["cls"] == BASE + "Agent"
        and list(r["members"]) == [BASE + "Person", BASE + "Organization"]
        for r in rows
    )


# ------------------------------------------------------------------ #
# bulk ops (reference tests/test_bulk.py)
# ------------------------------------------------------------------ #


def test_parse_bulk_text_simple():
    assert mutations.parse_bulk_text("A\nB\n\nC\n") == [
        {"name": "A"}, {"name": "B"}, {"name": "C"}
    ]


def test_parse_bulk_text_csv_header_autodetect():
    text = "name,label,parent\nDog,The Dog,Animal\nCat,,Animal\n"
    rows = mutations.parse_bulk_text(text)
    assert rows == [
        {"name": "Dog", "label": "The Dog", "parent": "Animal"},
        {"name": "Cat", "label": "", "parent": "Animal"},
    ]


def test_parse_bulk_text_explicit_columns_short_row():
    rows = mutations.parse_bulk_text("Dog,Canine", columns=["name", "label", "parent"])
    assert rows == [{"name": "Dog", "label": "Canine", "parent": ""}]


def test_parse_bulk_text_skips_empty_names():
    rows = mutations.parse_bulk_text("name,label\n,NoName\nDog,OK")
    assert rows == [{"name": "Dog", "label": "OK"}]


def test_bulk_add_properties_object(populated_om):
    spark = populated_om.sparkSession
    staged = spark.createDataFrame(
        [("manages", "Person", "Person", "Manages"),
         ("worksFor", "Person", "Organization", "dup — skipped")],
        "name string, domain string, range string, label string",
    )
    out = mutations.bulk_add_properties(populated_om, staged, BASE, "object")
    props = {r["name"] for r in views.get_object_properties(out).collect()}
    assert "manages" in props
    # existing property not duplicated / relabeled
    assert _objs(out, BASE + "worksFor", RDFS.label) == []


def test_bulk_add_properties_data_xsd_default(populated_om):
    spark = populated_om.sparkSession
    staged = spark.createDataFrame(
        [("hasAge", "Person", "integer", None), ("hasNick", "Person", None, None)],
        "name string, domain string, range string, label string",
    )
    out = mutations.bulk_add_properties(populated_om, staged, BASE, "data")
    assert _objs(out, BASE + "hasAge", RDFS.range) == [XSD.integer]
    assert _objs(out, BASE + "hasNick", RDFS.range) == [XSD.string]


def test_bulk_add_individuals_requires_class(populated_om):
    spark = populated_om.sparkSession
    staged = spark.createDataFrame(
        [("bob", "Person", "Bob"), ("ghost", None, "Ghost")],
        "name string, class string, label string",
    )
    out = mutations.bulk_add_individuals(populated_om, staged, BASE)
    names = {r["name"] for r in views.get_individuals(out).collect()}
    assert "bob" in names and "ghost" not in names


def test_bulk_update_annotations_mixed(populated_om):
    spark = populated_om.sparkSession
    updates = spark.createDataFrame(
        [
            ("Person", "comment", "A human", None, "add"),
            ("Person", "label", "Person", None, "delete"),
            ("", "label", "bad", None, "add"),           # missing resource → ignored
            ("Organization", "label", None, None, "add"),  # missing value → ignored
        ],
        "resource string, predicate string, value string, lang string, action string",
    )
    out = mutations.bulk_update_annotations(populated_om, updates, BASE)
    assert _objs(out, BASE + "Person", RDFS.comment) == ["A human"]
    assert _objs(out, BASE + "Person", RDFS.label) == []
    assert _objs(out, BASE + "Organization", RDFS.label) == ["Organization"]


# ------------------------------------------------------------------ #
# provenance reification round-trip + mined-axiom materialization
# ------------------------------------------------------------------ #


def test_reify_provenance_roundtrip_recovers_facts(spark):
    from pyspark.sql import functions as F

    from orionbelt_ontology_builder_spark.operators import align, lists

    facts = align.paris_fixture_df(spark, "a").withColumn(
        "source", F.lit("http://src.example.org/x")
    )
    reified = lists.reify_with_provenance(facts)
    decoded = lists.decode_reification(reified)
    orig = {
        (r["subj"], r["pred"], r["obj"], r["obj_kind"])
        for r in facts.select("subj", "pred", "obj", "obj_kind")
        .distinct()
        .collect()
    }
    back = {
        (r["t_subj"], r["t_pred"], r["t_obj"], r["t_obj_kind"])
        for r in decoded.collect()
    }
    assert back == orig
    # every statement carries exactly the one provenance annotation
    assert all(r["n_annotations"] == 1 for r in decoded.collect())
    # content-addressed ids: same fact from two sources -> same node
    f2 = facts.withColumn("source", F.lit("http://src.example.org/y"))
    r2 = lists.reify_with_provenance(facts.unionByName(f2))
    assert (
        r2.filter(F.col("pred").endswith("annotatedSource")).count()
        == len(orig)
    )


def test_axioms_from_mining_materializes_verdicts(spark):
    from orionbelt_ontology_builder_spark import fixtures as FX
    from orionbelt_ontology_builder_spark.operators import (
        mutations as mut,
        profiling,
    )

    t = FX.fixture_triples(spark, "invprops_om")
    out = mut.axioms_from_mining(
        functional=profiling.suggest_functional(t),
        inverse=profiling.suggest_inverse(t),
    ).collect()
    B = FX.BASE
    triples = {(r["subj"], r["pred"], r["obj"]) for r in out}
    OWLNS = "http://www.w3.org/2002/07/owl#"
    RDFT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert (B + "hasChild", OWLNS + "inverseOf", B + "hasParent") in triples
    assert (B + "marriedTo", RDFT, OWLNS + "SymmetricProperty") in triples
    assert (B + "hasParent", RDFT, OWLNS + "FunctionalProperty") in triples
    # hasChild is multi-valued -> never functional
    assert (B + "hasChild", RDFT, OWLNS + "FunctionalProperty") not in triples
