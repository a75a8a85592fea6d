from __future__ import annotations

from orionbelt_ontology_builder_spark.fixtures import BASE
from orionbelt_ontology_builder_spark.model import OWL, RDF, RDFS, type_slice
from orionbelt_ontology_builder_spark.operators import mutations, views


def test_add_class(populated_om):
    out = mutations.add_class(populated_om, "Robot", BASE, label="Robot", parent="Person")
    names = [r["name"] for r in views.get_classes(out).collect()]
    assert "Robot" in names
    h = {r["class_name"]: r["children"] for r in views.get_class_hierarchy(out).collect()}
    assert "Robot" in h["Person"]


def test_delete_class_cascades_to_instances(populated_om):
    # reference tests/test_classes.py:32 — deleting Employee removes
    # alice's (rdf:type Employee) assertion too
    out = mutations.delete_resource(populated_om, BASE + "Employee")
    assert out.filter(
        (out.subj == BASE + "alice") & (out.obj == BASE + "Employee")
    ).count() == 0
    assert out.filter(out.subj == BASE + "Employee").count() == 0


def test_rename_class_rewrites_references(populated_om):
    out = mutations.rename_resource(populated_om, BASE + "Person", BASE + "Human")
    assert out.filter(out.subj == BASE + "Person").count() == 0
    assert out.filter(out.obj == BASE + "Person").count() == 0
    # Employee subClassOf now points at Human
    assert out.filter(
        (out.subj == BASE + "Employee") & (out.pred == RDFS.subClassOf)
    ).collect()[0]["obj"] == BASE + "Human"
    # literal "Person" label is untouched (obj_kind guard)
    assert out.filter((out.obj == "Person") & (out.obj_kind == "literal")).count() == 1


def test_upsert_annotation(populated_om):
    out = mutations.update_annotation(populated_om, BASE + "Person", RDFS.label, "Humano", lang="es")
    rows = out.filter((out.subj == BASE + "Person") & (out.pred == RDFS.label)).collect()
    assert len(rows) == 1
    assert rows[0]["obj"] == "Humano"
    assert rows[0]["obj_lang"] == "es"


def test_set_base_uri(populated_om):
    out = mutations.set_base_uri(populated_om, BASE, "http://new.org/v2#")
    assert out.filter(out.subj.startswith(BASE)).count() == 0
    assert out.filter(out.subj == "http://new.org/v2#Person").count() > 0
    assert out.count() == populated_om.count()


def test_bulk_add_classes_skips_existing(spark, populated_om):
    staged = spark.createDataFrame(
        [("Person", "Person2", None), ("Robot", "Robot", "a robot")],
        ["name", "label", "comment"],
    )
    out = mutations.bulk_add_classes(populated_om, staged, BASE)
    # Person existed -> skipped entirely (no second label)
    assert out.filter((out.subj == BASE + "Person") & (out.obj == "Person2")).count() == 0
    assert type_slice(out, OWL.Class).count() == 4


def test_bulk_delete(spark, populated_om):
    names = spark.createDataFrame([("Employee",), ("acme",)], ["name"])
    out = mutations.bulk_delete_resources(populated_om, names, BASE)
    assert out.filter(out.subj == BASE + "Employee").count() == 0
    assert out.filter((out.obj == BASE + "acme")).count() == 0


def test_add_concept_auto_inverse(spark, skos_om):
    from orionbelt_ontology_builder_spark.model import SKOS

    out = mutations.add_concept(skos_om, "Fish", BASE, scheme="MyScheme", pref_label="Fish", broader="Animal")
    assert out.filter(
        (out.subj == BASE + "Animal") & (out.pred == SKOS.narrower) & (out.obj == BASE + "Fish")
    ).count() == 1
