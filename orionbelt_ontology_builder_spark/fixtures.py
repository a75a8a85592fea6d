"""Golden test fixtures mirroring the reference's pytest fixtures.

``populated_om`` and ``skos_om`` reproduce
``/root/reference/tests/conftest.py:5-33`` triple-for-triple (incl. the
auto-added inverse ``skos:narrower`` edges the reference emits at
``ontology_manager.py:1473-1476``).  See FIXTURES.md.

The same rows feed both sides of the driver's differential check:
  * Spark: ``fixture_triples(spark, name)`` -> DataFrame
  * DuckDB: ``fixture_sql_values(name)`` -> a ``(VALUES ...)`` relation
    embedded in the oracle SQL, so both engines see identical input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .model import (
    OWL,
    RDF,
    RDFS,
    SKOS,
    TRIPLES_SCHEMA,
    XSD,
    t_lit,
    t_uri,
)

BASE = "http://test.org/ont#"
ONT = "http://test.org/ont"


def _e(name: str) -> str:
    return BASE + name


#: Fixture A — OWL graph (reference tests/conftest.py:11-22). 20 triples.
POPULATED_OM: list[tuple] = [
    t_uri(ONT, RDF.type, OWL.Ontology),
    t_uri(_e("Person"), RDF.type, OWL.Class),
    t_lit(_e("Person"), RDFS.label, "Person"),
    t_uri(_e("Organization"), RDF.type, OWL.Class),
    t_lit(_e("Organization"), RDFS.label, "Organization"),
    t_uri(_e("Employee"), RDF.type, OWL.Class),
    t_uri(_e("Employee"), RDFS.subClassOf, _e("Person")),
    t_lit(_e("Employee"), RDFS.label, "Employee"),
    t_uri(_e("worksFor"), RDF.type, OWL.ObjectProperty),
    t_uri(_e("worksFor"), RDFS.domain, _e("Person")),
    t_uri(_e("worksFor"), RDFS.range, _e("Organization")),
    t_uri(_e("hasName"), RDF.type, OWL.DatatypeProperty),
    t_uri(_e("hasName"), RDFS.domain, _e("Person")),
    t_uri(_e("hasName"), RDFS.range, XSD.string),
    t_uri(_e("alice"), RDF.type, OWL.NamedIndividual),
    t_uri(_e("alice"), RDF.type, _e("Employee")),
    t_lit(_e("alice"), RDFS.label, "Alice"),
    t_uri(_e("acme"), RDF.type, OWL.NamedIndividual),
    t_uri(_e("acme"), RDF.type, _e("Organization")),
    t_lit(_e("acme"), RDFS.label, "ACME Corp"),
]

#: Fixture B — SKOS graph (reference tests/conftest.py:25-33). 16 triples.
SKOS_OM: list[tuple] = [
    t_uri(ONT, RDF.type, OWL.Ontology),
    t_uri(_e("MyScheme"), RDF.type, SKOS.ConceptScheme),
    t_lit(_e("MyScheme"), RDFS.label, "My Scheme"),
    t_uri(_e("Animal"), RDF.type, SKOS.Concept),
    t_uri(_e("Animal"), SKOS.inScheme, _e("MyScheme")),
    t_lit(_e("Animal"), SKOS.prefLabel, "Animal"),
    t_uri(_e("Dog"), RDF.type, SKOS.Concept),
    t_uri(_e("Dog"), SKOS.inScheme, _e("MyScheme")),
    t_lit(_e("Dog"), SKOS.prefLabel, "Dog"),
    t_uri(_e("Dog"), SKOS.broader, _e("Animal")),
    t_uri(_e("Animal"), SKOS.narrower, _e("Dog")),
    t_uri(_e("Cat"), RDF.type, SKOS.Concept),
    t_uri(_e("Cat"), SKOS.inScheme, _e("MyScheme")),
    t_lit(_e("Cat"), SKOS.prefLabel, "Cat"),
    t_uri(_e("Cat"), SKOS.broader, _e("Animal")),
    t_uri(_e("Animal"), SKOS.narrower, _e("Cat")),
]

#: Merge/diff fixture pair — two graphs sharing :Person with differing
#: labels (reference tests/test_merge.py:114, test_diff.py:26-73).
DIFF_A: list[tuple] = [
    t_uri(ONT, RDF.type, OWL.Ontology),
    t_uri(_e("Person"), RDF.type, OWL.Class),
    t_lit(_e("Person"), RDFS.label, "Person"),
    t_uri(_e("Animal"), RDF.type, OWL.Class),
    t_lit(_e("Animal"), RDFS.label, "Animal"),
    t_uri(_e("Dog"), RDF.type, OWL.Class),
    t_uri(_e("Dog"), RDFS.subClassOf, _e("Animal")),
]

DIFF_B: list[tuple] = [
    t_uri(ONT, RDF.type, OWL.Ontology),
    t_uri(_e("Person"), RDF.type, OWL.Class),
    t_lit(_e("Person"), RDFS.label, "Human"),  # modified label
    t_uri(_e("Animal"), RDF.type, OWL.Class),
    t_lit(_e("Animal"), RDFS.label, "Animal"),
    t_uri(_e("Cat"), RDF.type, OWL.Class),  # added resource
    t_uri(_e("Cat"), RDFS.subClassOf, _e("Animal")),
]

#: Validation negative fixture (FIXTURES.md §4): orphan class, missing
#: label, untyped individual, domain mismatch, duplicate labels.
VALIDATION_OM: list[tuple] = POPULATED_OM + [
    t_uri(_e("Orphan"), RDF.type, OWL.Class),
    t_lit(_e("Orphan"), RDFS.label, "Orphan"),
    t_uri(_e("NoLabel"), RDF.type, OWL.Class),
    t_uri(_e("NoLabel"), RDFS.subClassOf, _e("Person")),
    t_uri(_e("ghost"), RDF.type, OWL.NamedIndividual),
    t_lit(_e("ghost"), RDFS.label, "Ghost"),
    t_uri(_e("acme"), _e("worksFor"), _e("Person")),  # domain mismatch: acme is Organization
    t_uri(_e("DupA"), RDF.type, OWL.Class),
    t_lit(_e("DupA"), RDFS.label, "Duplicate"),
    t_uri(_e("DupB"), RDF.type, OWL.Class),
    t_lit(_e("DupB"), RDFS.label, "Duplicate"),
]

FIXTURES: dict[str, list[tuple]] = {
    "populated_om": POPULATED_OM,
    "skos_om": SKOS_OM,
    "diff_a": DIFF_A,
    "diff_b": DIFF_B,
    "validation_om": VALIDATION_OM,
}


def fixture_triples(spark: SparkSession, name: str) -> DataFrame:
    return spark.createDataFrame(FIXTURES[name], TRIPLES_SCHEMA)


def _sql_str(v: str | None) -> str:
    if v is None:
        return "CAST(NULL AS VARCHAR)"
    return "'" + v.replace("'", "''") + "'"


def fixture_sql_values(name: str) -> str:
    """Render a fixture as a DuckDB VALUES relation with triple columns.

    Usable as ``WITH triples(subj,pred,obj,obj_kind,obj_lang,obj_dt) AS
    (<this>) SELECT ...`` so the oracle runs on byte-identical input.
    """
    rows = ",\n    ".join(
        "(" + ", ".join(_sql_str(v) for v in row) + ")" for row in FIXTURES[name]
    )
    return f"(VALUES\n    {rows})"


def fixture_cte(name: str, alias: str = "triples") -> str:
    """``alias(subj,...) AS (VALUES ...)`` clause body for a WITH list."""
    return (
        f"{alias}(subj, pred, obj, obj_kind, obj_lang, obj_dt) AS "
        f"(SELECT * FROM {fixture_sql_values(name)})"
    )
