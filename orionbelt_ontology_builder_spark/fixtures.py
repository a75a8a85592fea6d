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
    DC_NS,
    OWL,
    RDF,
    RDFS,
    SKOS,
    TRIPLES_SCHEMA,
    XSD,
    t_bnode,
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

#: OWL-RL inconsistency fixture: one planted violation per false-rule
#: (cax-dw via subclass inheritance, prp-asyp, prp-irp, prp-pdw,
#: eq-diff1 with reversed statement directions, cls-nothing2) over the
#: populated base graph.
CONSISTENCY_OM: list[tuple] = POPULATED_OM + [
    t_uri(_e("Person"), OWL.disjointWith, _e("Organization")),
    t_uri(_e("bob"), RDF.type, _e("Employee")),          # => Person (closure)
    t_uri(_e("bob"), RDF.type, _e("Organization")),      # cax-dw hit
    t_uri(_e("mentors"), RDF.type, OWL.ObjectProperty),
    t_uri(_e("mentors"), RDF.type, OWL.AsymmetricProperty),
    t_uri(_e("alice"), _e("mentors"), _e("bob")),
    t_uri(_e("bob"), _e("mentors"), _e("alice")),        # prp-asyp hit
    t_uri(_e("knows"), RDF.type, OWL.IrreflexiveProperty),
    t_uri(_e("carol"), _e("knows"), _e("carol")),        # prp-irp hit
    t_uri(_e("hasBoss"), OWL.propertyDisjointWith, _e("mentors")),
    t_uri(_e("dave"), _e("hasBoss"), _e("erin")),
    t_uri(_e("dave"), _e("mentors"), _e("erin")),        # prp-pdw hit
    t_uri(_e("frank"), OWL.sameAs, _e("grace")),
    t_uri(_e("grace"), OWL.differentFrom, _e("frank")),  # eq-diff1 (reversed)
    t_uri(_e("hank"), RDF.type, OWL.Nothing),            # cls-nothing2
]

#: Axiom-rich fixture: restrictions, RDF-list axioms (unionOf,
#: propertyChainAxiom, hasKey, distinctMembers, disjointUnionOf),
#: relation axioms, annotations with lang/datatype — exercising the
#: reference's advanced-axiom surface (``ontology_manager.py:1101-1996``).
AXIOMS_OM: list[tuple] = POPULATED_OM + [
    # someValuesFrom restriction applied to Employee
    t_uri("_:r1", RDF.type, OWL.Restriction),
    t_uri("_:r1", OWL.onProperty, _e("worksFor")),
    t_uri("_:r1", OWL.someValuesFrom, _e("Organization")),
    t_bnode(_e("Employee"), RDFS.subClassOf, "_:r1"),
    # minCardinality restriction applied to Person
    t_uri("_:r2", RDF.type, OWL.Restriction),
    t_uri("_:r2", OWL.onProperty, _e("hasName")),
    t_lit("_:r2", OWL.minCardinality, "1", dt=XSD.nonNegativeInteger),
    t_bnode(_e("Person"), RDFS.subClassOf, "_:r2"),
    # Agent = unionOf(Person, Organization), also disjointUnionOf
    t_uri(_e("Agent"), RDF.type, OWL.Class),
    t_bnode(_e("Agent"), OWL.unionOf, "_:u1"),
    t_uri("_:u1", RDF.first, _e("Person")),
    t_bnode("_:u1", RDF.rest, "_:u2"),
    t_uri("_:u2", RDF.first, _e("Organization")),
    t_uri("_:u2", RDF.rest, RDF.nil),
    t_bnode(_e("Agent"), OWL.disjointUnionOf, "_:d1"),
    t_uri("_:d1", RDF.first, _e("Person")),
    t_bnode("_:d1", RDF.rest, "_:d2"),
    t_uri("_:d2", RDF.first, _e("Organization")),
    t_uri("_:d2", RDF.rest, RDF.nil),
    # property chain: worksFor o worksFor -> worksFor (toy transitivity)
    t_bnode(_e("worksFor"), OWL.propertyChainAxiom, "_:c1"),
    t_uri("_:c1", RDF.first, _e("worksFor")),
    t_bnode("_:c1", RDF.rest, "_:c2"),
    t_uri("_:c2", RDF.first, _e("worksFor")),
    t_uri("_:c2", RDF.rest, RDF.nil),
    # hasKey on Person
    t_bnode(_e("Person"), OWL.hasKey, "_:k1"),
    t_uri("_:k1", RDF.first, _e("hasName")),
    t_uri("_:k1", RDF.rest, RDF.nil),
    # AllDifferent(alice, acme)
    t_uri("_:ad1", RDF.type, OWL.AllDifferent),
    t_bnode("_:ad1", OWL.distinctMembers, "_:m1"),
    t_uri("_:m1", RDF.first, _e("alice")),
    t_bnode("_:m1", RDF.rest, "_:m2"),
    t_uri("_:m2", RDF.first, _e("acme")),
    t_uri("_:m2", RDF.rest, RDF.nil),
    # relation axioms
    t_uri(_e("Worker"), RDF.type, OWL.Class),
    t_uri(_e("Employee"), OWL.equivalentClass, _e("Worker")),
    t_uri(_e("Person"), OWL.disjointWith, _e("Organization")),
    t_uri(_e("employs"), RDF.type, OWL.ObjectProperty),
    t_uri(_e("worksFor"), OWL.inverseOf, _e("employs")),
    t_uri(_e("alice2"), RDF.type, OWL.NamedIndividual),
    t_uri(_e("alice"), OWL.sameAs, _e("alice2")),
    # ontology-node metadata + an import
    t_lit(ONT, RDFS.label, "Test Ontology"),
    t_lit(ONT, RDFS.comment, "An ontology for tests"),
    t_uri(ONT, OWL.versionIRI, "http://test.org/ont/1.0"),
    t_lit(ONT, DC_NS + "creator", "Test Author"),
    t_uri(ONT, OWL.imports, "http://purl.org/dc/elements/1.1/"),
    # annotations with lang + datatype
    t_lit(_e("Person"), DC_NS + "creator", "Alice Smith", lang="en"),
    t_lit(_e("Person"), SKOS.altLabel, "Human", lang="en"),
    t_lit(_e("Person"), OWL.versionInfo, "1.0", dt=XSD.string),
]

ORG_BASE = "http://example.org/org#"


def _o(name: str) -> str:
    return ORG_BASE + name


#: Expected triples of the "Organization" starter template rendered at
#: ``ORG_BASE`` (templates.py catalog).  Hand-enumerated independently of
#: the Turtle text so the driver oracle checks render+parse against a
#: second authority, not against itself.  27 triples.
TEMPLATE_ORG: list[tuple] = [
    t_uri(_o("Organization"), RDF.type, OWL.Class),
    t_lit(_o("Organization"), RDFS.label, "Organization"),
    t_uri(_o("Team"), RDF.type, OWL.Class),
    t_lit(_o("Team"), RDFS.label, "Team"),
    t_uri(_o("Team"), RDFS.subClassOf, _o("Organization")),
    t_uri(_o("Person"), RDF.type, OWL.Class),
    t_lit(_o("Person"), RDFS.label, "Person"),
    t_uri(_o("memberOf"), RDF.type, OWL.ObjectProperty),
    t_lit(_o("memberOf"), RDFS.label, "member of"),
    t_uri(_o("memberOf"), RDFS.domain, _o("Person")),
    t_uri(_o("memberOf"), RDFS.range, _o("Organization")),
    t_uri(_o("leads"), RDF.type, OWL.ObjectProperty),
    t_lit(_o("leads"), RDFS.label, "leads"),
    t_uri(_o("leads"), RDFS.domain, _o("Person")),
    t_uri(_o("leads"), RDFS.range, _o("Team")),
    t_uri(_o("partOf"), RDF.type, OWL.ObjectProperty),
    t_lit(_o("partOf"), RDFS.label, "part of"),
    t_uri(_o("partOf"), RDFS.domain, _o("Team")),
    t_uri(_o("partOf"), RDFS.range, _o("Organization")),
    t_uri(_o("fullName"), RDF.type, OWL.DatatypeProperty),
    t_lit(_o("fullName"), RDFS.label, "full name"),
    t_uri(_o("fullName"), RDFS.domain, _o("Person")),
    t_uri(_o("fullName"), RDFS.range, XSD.string),
    t_uri(_o("headcount"), RDF.type, OWL.DatatypeProperty),
    t_lit(_o("headcount"), RDFS.label, "headcount"),
    t_uri(_o("headcount"), RDFS.domain, _o("Organization")),
    t_uri(_o("headcount"), RDFS.range, XSD.integer),
]

#: AXIOMS_OM plus an intersection class expression and an individual
#: typed with it — exercises the OWL RL class-expression membership
#: rules (cls-int1/int2/uni): bob is typed Employee AND Organization
#: (-> Adult via cls-int1), dave is typed Adult (-> both members via
#: cls-int2), Organization-typed individuals gain Agent via cls-uni
#: (Agent = unionOf(Person, Organization) already in AXIOMS_OM).
CLSEXPR_OM: list[tuple] = AXIOMS_OM + [
    t_uri(_e("Adult"), RDF.type, OWL.Class),
    t_bnode(_e("Adult"), OWL.intersectionOf, "_:i1"),
    t_uri("_:i1", RDF.first, _e("Employee")),
    t_bnode("_:i1", RDF.rest, "_:i2"),
    t_uri("_:i2", RDF.first, _e("Organization")),
    t_uri("_:i2", RDF.rest, RDF.nil),
    t_uri(_e("dave"), RDF.type, OWL.NamedIndividual),
    t_uri(_e("dave"), RDF.type, _e("Adult")),
    t_uri(_e("bob"), RDF.type, OWL.NamedIndividual),
    t_uri(_e("bob"), RDF.type, _e("Employee")),
    t_uri(_e("bob"), RDF.type, _e("Organization")),
]

#: RDF container fixture (rdf:Seq / Bag / Alt with rdf:_n membership):
#: an ordered author Seq whose _10 index must sort NUMERICALLY after
#: _2, a uri-membered Bag, an Alt, and an untyped rdf:_1 carrier that
#: get_containers must exclude.
_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
CONTAINERS_OM: list[tuple] = [
    t_uri(_e("AuthorList"), RDF.type, RDF.Seq),
    t_lit(_e("AuthorList"), RDFS.label, "author list"),
    t_lit(_e("AuthorList"), _RDF_NS + "_1", "alice"),
    t_lit(_e("AuthorList"), _RDF_NS + "_2", "bob"),
    t_lit(_e("AuthorList"), _RDF_NS + "_10", "jane"),
    t_uri(_e("Contributors"), RDF.type, RDF.Bag),
    t_uri(_e("Contributors"), _RDF_NS + "_1", _e("alice")),
    t_uri(_e("Contributors"), _RDF_NS + "_2", _e("bob")),
    t_uri(_e("Mirrors"), RDF.type, RDF.Alt),
    t_lit(_e("Mirrors"), _RDF_NS + "_1", "http://m1.example.org/"),
    t_lit(_e("Mirrors"), _RDF_NS + "_2", "http://m2.example.org/"),
    t_lit(_e("NotAContainer"), _RDF_NS + "_1", "orphan member"),
]

#: Tangled-DAG hierarchy fixture for ontology shape metrics: one root
#: (Thing), Employee with TWO parents (Person, Role — tangledness),
#: ancestor-set depth 4 for Employee ({Person, Agent, Role, Thing}),
#: Thing fan-out 3.
HIERARCHY_OM: list[tuple] = [
    t_uri(_e(c), RDF.type, OWL.Class)
    for c in (
        "Thing", "Agent", "Person", "Employee", "Organization",
        "Role", "Place", "City",
    )
] + [
    t_uri(_e(c), RDFS.subClassOf, _e(p))
    for c, p in (
        ("Agent", "Thing"),
        ("Role", "Thing"),
        ("Place", "Thing"),
        ("Person", "Agent"),
        ("Organization", "Agent"),
        ("Employee", "Person"),
        ("Employee", "Role"),
        ("City", "Place"),
    )
]

#: SDType fixture: typed Persons (name/knows/livesIn) and Cities
#: (label, in:livesIn), plus untyped entities whose predicate usage
#: votes their type — u1/u3 -> Person, u2 -> City, u4 carries only the
#: ambiguous seeAlso feature (0.5/0.5, type-asc tiebreak -> City).
SDTYPE_OM: list[tuple] = [
    t_uri(_e("p1"), RDF.type, _e("Person")),
    t_uri(_e("p2"), RDF.type, _e("Person")),
    t_uri(_e("p3"), RDF.type, _e("Person")),
    t_uri(_e("c1"), RDF.type, _e("City")),
    t_uri(_e("c2"), RDF.type, _e("City")),
    t_lit(_e("p1"), _e("name"), "P One"),
    t_lit(_e("p2"), _e("name"), "P Two"),
    t_lit(_e("p3"), _e("name"), "P Three"),
    t_lit(_e("c1"), RDFS.label, "City One"),
    t_lit(_e("c2"), RDFS.label, "City Two"),
    t_uri(_e("p1"), _e("knows"), _e("p2")),
    t_uri(_e("p2"), _e("knows"), _e("p3")),
    t_uri(_e("p1"), _e("livesIn"), _e("c1")),
    t_uri(_e("p2"), _e("livesIn"), _e("c2")),
    t_lit(_e("p3"), RDFS.seeAlso, "elsewhere"),
    t_lit(_e("c2"), RDFS.seeAlso, "elsewhere too"),
    # untyped entities to infer
    t_lit(_e("u1"), _e("name"), "U One"),
    t_uri(_e("u1"), _e("knows"), _e("p1")),
    t_uri(_e("u1"), _e("livesIn"), _e("c1")),
    t_uri(_e("p3"), _e("livesIn"), _e("u2")),
    t_lit(_e("u2"), RDFS.label, "U City"),
    t_lit(_e("u3"), _e("name"), "U Three"),
    t_lit(_e("u4"), RDFS.seeAlso, "ambiguous"),
]

#: Reification fixture: a classic rdf:Statement with two provenance
#: annotations, an owl:Axiom annotating a subClassOf with one comment,
#: an incomplete rdf:Statement (no object slot) and an untyped full
#: slot-set — both of which decode_reification must drop.
REIFIED_OM: list[tuple] = [
    t_bnode(_e("alice"), _e("knows"), "_:unused"),  # background noise
    t_uri("_:st1", RDF.type, RDF.Statement),
    t_uri("_:st1", RDF.subject, _e("alice")),
    t_uri("_:st1", RDF.predicate, _e("knows")),
    t_uri("_:st1", RDF.object, _e("bob")),
    t_lit("_:st1", _e("source"), "http://crawl.example.org/p1"),
    t_lit("_:st1", _e("confidence"), "0.9"),
    t_uri(_e("ax1"), RDF.type, OWL.Axiom),
    t_uri(_e("ax1"), OWL.annotatedSource, _e("Employee")),
    t_uri(_e("ax1"), OWL.annotatedProperty, RDFS.subClassOf),
    t_uri(_e("ax1"), OWL.annotatedTarget, _e("Person")),
    t_lit(_e("ax1"), RDFS.comment, "asserted by curator"),
    t_uri("_:st2", RDF.type, RDF.Statement),
    t_uri("_:st2", RDF.subject, _e("alice")),
    t_uri("_:st3", RDF.subject, _e("alice")),
    t_uri("_:st3", RDF.predicate, _e("knows")),
    t_uri("_:st3", RDF.object, _e("carol")),
]

#: Lexical-form fixture: one well-formed and one malformed literal per
#: validated XSD datatype, plus an untyped literal and an unknown
#: custom datatype that validate_literals must pass through silently.
_XSD = "http://www.w3.org/2001/XMLSchema#"
BADLITS_OM: list[tuple] = [
    t_lit(_e("ok"), _e("age"), "42", dt=_XSD + "integer"),
    t_lit(_e("ok"), _e("height"), "1.75", dt=_XSD + "decimal"),
    t_lit(_e("ok"), _e("flag"), "true", dt=_XSD + "boolean"),
    t_lit(_e("ok"), _e("born"), "1990-05-17", dt=_XSD + "date"),
    t_lit(_e("ok"), _e("seen"), "2020-01-01T12:00:00Z", dt=_XSD + "dateTime"),
    t_lit(_e("ok"), _e("score"), "1e-3", dt=_XSD + "double"),
    t_lit(_e("bad"), _e("age"), "forty", dt=_XSD + "integer"),
    t_lit(_e("bad"), _e("height"), "1.75m", dt=_XSD + "decimal"),
    t_lit(_e("bad"), _e("flag"), "yes", dt=_XSD + "boolean"),
    t_lit(_e("bad"), _e("born"), "1990-13-40", dt=_XSD + "date"),
    t_lit(_e("bad"), _e("seen"), "yesterday", dt=_XSD + "dateTime"),
    t_lit(_e("bad"), _e("score"), ".", dt=_XSD + "double"),
    t_lit(_e("free"), _e("note"), "anything goes"),  # untyped: valid
    t_lit(_e("free"), _e("custom"), "opaque", dt=_e("customType")),
]

#: Inverse/symmetric mining fixture: hasParent/hasChild are partial
#: transposes (jaccard 2/3), marriedTo is symmetric for one couple and
#: one-directional for another (self-transpose jaccard exactly 0.5 —
#: the threshold boundary), likes has no reverse evidence at all.
INVPROPS_OM: list[tuple] = [
    t_uri(_e("alice"), _e("hasParent"), _e("bob")),
    t_uri(_e("carol"), _e("hasParent"), _e("bob")),
    t_uri(_e("dave"), _e("hasParent"), _e("erin")),
    t_uri(_e("bob"), _e("hasChild"), _e("alice")),
    t_uri(_e("bob"), _e("hasChild"), _e("carol")),
    t_uri(_e("fay"), _e("marriedTo"), _e("gus")),
    t_uri(_e("gus"), _e("marriedTo"), _e("fay")),
    t_uri(_e("hal"), _e("marriedTo"), _e("ivy")),
    t_uri(_e("jon"), _e("likes"), _e("kim")),
]

#: SKOS-XL + language-coverage fixture: reified label nodes with
#: tagged/untagged literalForms (the sentinel tiebreak path), a
#: dangling pointer without a form, and plain tagged rdfs/skos labels
#: for the per-language coverage rollup.
SKOSXL_NS_F = "http://www.w3.org/2008/05/skos-xl#"
SKOSXL_OM: list[tuple] = [
    t_bnode(_e("cA"), SKOSXL_NS_F + "prefLabel", "_:l1"),
    t_lit("_:l1", SKOSXL_NS_F + "literalForm", "alpha", lang="en"),
    t_bnode(_e("cA"), SKOSXL_NS_F + "altLabel", "_:l2"),
    t_lit("_:l2", SKOSXL_NS_F + "literalForm", "alfa", lang="de"),
    t_bnode(_e("cB"), SKOSXL_NS_F + "prefLabel", "_:l3"),
    t_lit("_:l3", SKOSXL_NS_F + "literalForm", "beta", lang="fr"),
    t_lit("_:l3", SKOSXL_NS_F + "literalForm", "beta"),
    t_bnode(_e("cB"), SKOSXL_NS_F + "hiddenLabel", "_:l4"),
    t_lit("_:l4", SKOSXL_NS_F + "literalForm", "b3ta"),
    t_bnode(_e("cC"), SKOSXL_NS_F + "prefLabel", "_:l5"),  # dangling
    # plain labels for language_coverage
    t_lit(_e("cA"), RDFS.label, "alpha plain", lang="en"),
    t_lit(_e("cB"), SKOS.prefLabel, "beta plain", lang="en"),
    t_lit(_e("cB"), SKOS.altLabel, "beta alt", lang="de"),
    t_lit(_e("cC"), RDFS.label, "gamma untagged"),
]

#: SKOS crosswalk + deprecation-hygiene fixture: two schemes with
#: exact/close/narrow mappings (one endpoint scheme-less -> NULL), a
#: deprecated concept still referenced as an object, and a deprecated
#: predicate still used in live assertions.
_SKOS_NS_F = "http://www.w3.org/2004/02/skos/core#"
MAPPINGS_OM: list[tuple] = [
    t_uri(_e("red"), SKOS.inScheme, _e("Colors")),
    t_uri(_e("crimson"), SKOS.inScheme, _e("Colors")),
    t_uri(_e("rouge"), SKOS.inScheme, _e("Couleurs")),
    t_uri(_e("bleu"), SKOS.inScheme, _e("Couleurs")),
    t_uri(_e("red"), SKOS.exactMatch, _e("rouge")),
    t_uri(_e("crimson"), SKOS.closeMatch, _e("rouge")),
    t_uri(_e("red"), SKOS.narrowMatch, _e("warm")),  # scheme-less end
    t_lit(_e("oldRed"), "http://www.w3.org/2002/07/owl#deprecated", "true"),
    t_uri(_e("crimson"), RDFS.seeAlso, _e("oldRed")),  # still referenced
    t_lit(_e("oldProp"), "http://www.w3.org/2002/07/owl#deprecated", "true"),
    t_uri(_e("red"), _e("oldProp"), _e("bleu")),  # deprecated pred in use
    t_lit(_e("retired"), "http://www.w3.org/2002/07/owl#deprecated", "true"),
    # 'retired' is referenced by nobody -> absent from the report
]

FIXTURES: dict[str, list[tuple]] = {
    "template_org": TEMPLATE_ORG,
    "populated_om": POPULATED_OM,
    "skos_om": SKOS_OM,
    "diff_a": DIFF_A,
    "diff_b": DIFF_B,
    "validation_om": VALIDATION_OM,
    "consistency_om": CONSISTENCY_OM,
    "axioms_om": AXIOMS_OM,
    "clsexpr_om": CLSEXPR_OM,
    "containers_om": CONTAINERS_OM,
    "hierarchy_om": HIERARCHY_OM,
    "sdtype_om": SDTYPE_OM,
    "reified_om": REIFIED_OM,
    "badlits_om": BADLITS_OM,
    "invprops_om": INVPROPS_OM,
    "skosxl_om": SKOSXL_OM,
    "mappings_om": MAPPINGS_OM,
}


def fixture_triples(spark: SparkSession, name: str) -> DataFrame:
    from .model import local_df

    return local_df(spark, FIXTURES[name], TRIPLES_SCHEMA)


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
