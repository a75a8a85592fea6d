"""Turtle / RDF-XML / JSON-LD serializer+parser round-trips (SURVEY §2.1).

Pure driver-side codecs; Spark only enters through the ``parse`` facade.
"""

from __future__ import annotations

import pytest

from orionbelt_ontology_builder_spark import fixtures as FX
from orionbelt_ontology_builder_spark.sources import parsers as PAR
from orionbelt_ontology_builder_spark.sources import serializers as SER

PAIRS = [
    ("turtle", SER.to_turtle, PAR.parse_turtle),
    ("rdfxml", SER.to_rdfxml, PAR.parse_rdfxml),
    ("jsonld", SER.to_jsonld, PAR.parse_jsonld),
]


@pytest.mark.parametrize("fmt,ser,par", PAIRS, ids=[p[0] for p in PAIRS])
@pytest.mark.parametrize(
    "fixture", ["populated_om", "skos_om", "axioms_om", "validation_om"]
)
def test_roundtrip_fixture(fmt, ser, par, fixture):
    rows = [tuple(r) for r in FX.FIXTURES[fixture]]
    assert sorted(set(par(ser(rows)))) == sorted(set(rows))


def test_turtle_surface_forms():
    ttl = """
@prefix ex: <http://e.org/> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
# a comment
ex:A a owl:Class ;
  ex:size 42 ;
  ex:ratio 3.14 ;
  ex:exp 1e3 ;
  ex:flag true, false ;
  ex:note \"\"\"tri "quoted"
text\"\"\" ;
  ex:tagged "hi"@en-GB ;
  owl:unionOf ( ex:B ex:C ) ;
  ex:via [ ex:p ex:q ] .
"""
    rows = PAR.parse_turtle(ttl)
    d = {(r[1], r[2]) for r in rows}
    X = "http://www.w3.org/2001/XMLSchema#"
    assert ("http://e.org/size", "42") in d
    by_po = {(r[1], r[2]): r for r in rows}
    assert by_po[("http://e.org/size", "42")][5] == X + "integer"
    assert by_po[("http://e.org/ratio", "3.14")][5] == X + "decimal"
    assert by_po[("http://e.org/exp", "1e3")][5] == X + "double"
    assert by_po[("http://e.org/flag", "true")][5] == X + "boolean"
    assert by_po[("http://e.org/tagged", "hi")][4] == "en-GB"
    assert 'tri "quoted"\ntext' in [r[2] for r in rows]
    # collection expands to first/rest cells ending in nil
    firsts = [r for r in rows if r[1].endswith("#first")]
    assert len(firsts) == 2


def test_rdfxml_features():
    xml = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://e.org/" xml:lang="de">
  <ex:Thing rdf:about="http://e.org/A">
    <ex:label>hallo</ex:label>
    <ex:label xml:lang="en">hello</ex:label>
    <ex:count rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">5</ex:count>
    <ex:link rdf:resource="http://e.org/B"/>
    <ex:nested rdf:parseType="Resource">
      <ex:p rdf:resource="http://e.org/C"/>
    </ex:nested>
    <ex:child>
      <rdf:Description rdf:nodeID="n1">
        <ex:p>v</ex:p>
      </rdf:Description>
    </ex:child>
  </ex:Thing>
</rdf:RDF>"""
    rows = PAR.parse_rdfxml(xml)
    t = {(r[1], r[2], r[3], r[4], r[5]) for r in rows}
    RT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert (RT, "http://e.org/Thing", "uri", None, None) in t
    assert ("http://e.org/label", "hallo", "literal", "de", None) in t
    assert ("http://e.org/label", "hello", "literal", "en", None) in t
    assert ("http://e.org/count", "5", "literal", None,
            "http://www.w3.org/2001/XMLSchema#integer") in t
    assert ("http://e.org/link", "http://e.org/B", "uri", None, None) in t
    assert ("http://e.org/p", "http://e.org/C", "uri", None, None) in t
    assert ("http://e.org/p", "v", "literal", "de", None) in t


def test_jsonld_context_and_lists():
    doc = """{
  "@context": {"ex": "http://e.org/", "name": "http://e.org/name"},
  "@graph": [
    {"@id": "ex:A", "@type": "ex:Thing",
     "name": {"@value": "Ada", "@language": "en"},
     "ex:chain": {"@list": [{"@id": "ex:B"}, {"@id": "ex:C"}]},
     "ex:n": 7}
  ]
}"""
    rows = PAR.parse_jsonld(doc)
    t = {(r[1], r[2]) for r in rows}
    assert ("http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://e.org/Thing") in t
    assert ("http://e.org/name", "Ada") in t
    firsts = [r for r in rows if r[1].endswith("#first")]
    assert {r[2] for r in firsts} == {"http://e.org/B", "http://e.org/C"}
    n = [r for r in rows if r[1] == "http://e.org/n"][0]
    assert n[2] == "7" and n[5] == "http://www.w3.org/2001/XMLSchema#integer"


def test_parse_facade_dispatch(spark):
    rows = [tuple(r) for r in FX.FIXTURES["populated_om"]]
    for fmt in ["ttl", "xml", "jsonld"]:
        ser = {"ttl": SER.to_turtle, "xml": SER.to_rdfxml,
               "jsonld": SER.to_jsonld}[fmt]
        df = PAR.parse(spark, ser(rows), fmt)
        assert sorted(map(tuple, df.collect())) == sorted(set(rows))
    with pytest.raises(ValueError):
        PAR.parse(spark, "", "unknown-fmt")


def test_n3_export_roundtrips_as_turtle(spark):
    """serialize(df, 'n3') renders the Turtle subset of Notation3
    (reference exports n3 via rdflib; same subset for this data model)."""
    rows = [tuple(r) for r in FX.FIXTURES["populated_om"]]
    df = FX.fixture_triples(spark, "populated_om")
    text = SER.serialize(df, "n3")
    assert sorted(set(PAR.parse_turtle(text))) == sorted(set(rows))


def test_jsonld_list_context_merged_and_prefixes():
    doc = """{
  "@context": [
    {"ex": "http://example.org/"},
    {"foaf": "http://xmlns.com/foaf/0.1/", "@vocab": "http://v.org/"}
  ],
  "@graph": [{"@id": "ex:A", "@type": "foaf:Agent"}]
}"""
    rows = PAR.parse_jsonld(doc)
    t = {(r[0], r[2]) for r in rows}
    assert ("http://example.org/A", "http://xmlns.com/foaf/0.1/Agent") in t
    # prefix extraction: merged list context, '@' keys skipped, sorted
    assert PAR.jsonld_prefixes(doc) == [
        ("ex", "http://example.org/"),
        ("foaf", "http://xmlns.com/foaf/0.1/"),
    ]


def test_jsonld_prefixes_edge_cases():
    assert PAR.jsonld_prefixes("not json at all") == []
    assert PAR.jsonld_prefixes('{"@graph": []}') == []
    assert PAR.jsonld_prefixes('["expanded", "form"]') == []
    # default prefix name + non-http values skipped
    got = PAR.jsonld_prefixes(
        '{"@context": {"": "http://d.org/", "name": "relative", '
        '"ex": "https://e.org/"}}'
    )
    assert got == [("(default)", "http://d.org/"), ("ex", "https://e.org/")]


# ------------------------------------------------------------------ #
# N3 (real parser, not a Turtle alias)
# ------------------------------------------------------------------ #

N3_DOC = """
@prefix ex: <http://x.org/> .
ex:a = ex:b .
ex:c has ex:p ex:d .
ex:d is ex:p of ex:e .
ex:f!ex:g a ex:H .
ex:i^ex:j ex:k ex:l .
"""


def test_n3_equality_has_is_of_and_paths():
    rows = set(PAR.parse_n3(N3_DOC))
    X = "http://x.org/"
    OWL_SAME = "http://www.w3.org/2002/07/owl#sameAs"
    RDF_T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert (X + "a", OWL_SAME, X + "b", "uri", None, None) in rows
    assert (X + "c", X + "p", X + "d", "uri", None, None) in rows
    # 'is p of' inverts: e p d
    assert (X + "e", X + "p", X + "d", "uri", None, None) in rows
    # forward path: f g _:gen1 . _:gen1 a H
    assert (X + "f", X + "g", "_:gen1", "bnode", None, None) in rows
    assert ("_:gen1", RDF_T, X + "H", "uri", None, None) in rows
    # backward path as subject: _:gen2 j i . _:gen2 k l
    assert ("_:gen2", X + "j", X + "i", "uri", None, None) in rows
    assert ("_:gen2", X + "k", X + "l", "uri", None, None) in rows


def test_n3_parses_full_turtle_subset():
    rows = [tuple(r) for r in FX.FIXTURES["axioms_om"]]
    assert sorted(set(PAR.parse_n3(SER.to_turtle(rows)))) == sorted(set(rows))


@pytest.mark.parametrize(
    "doc,msg",
    [
        ("@forAll <http://x.org/v> .", "quantification"),
        ("@forSome <http://x.org/v> .", "quantification"),
    ],
)
def test_n3_quantifiers_rejected_clearly(doc, msg):
    """r5 scope decision: quantifiers stay permanently rejected (no
    faithful flat-triple encoding); the error names the decision."""
    with pytest.raises(NotImplementedError, match=msg):
        PAR.parse_n3(doc)


LOG = "http://www.w3.org/2000/10/swap/log#"


def test_n3_formula_terms_encode_as_reified_statements():
    """r5: `{...}` terms and => / <= implications load as the
    documented reified log:Formula encoding."""
    RDF_T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rows = PAR.parse_n3(
        "{ <http://a> <http://b> <http://c> . } => "
        "{ <http://a> <http://d> <http://c> . } ."
    )
    assert ("_:gen1", RDF_T, LOG + "Formula", "uri", None, None) in rows
    assert ("_:gen3", RDF_T, LOG + "Formula", "uri", None, None) in rows
    assert ("_:gen1", LOG + "implies", "_:gen3", "bnode", None, None) in rows
    # antecedent statement fully reified under the antecedent formula
    assert ("_:gen1", LOG + "includes", "_:gen2", "bnode", None, None) in rows
    R = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    assert ("_:gen2", R + "subject", "http://a", "uri", None, None) in rows
    assert ("_:gen2", R + "predicate", "http://b", "uri", None, None) in rows
    assert ("_:gen2", R + "object", "http://c", "uri", None, None) in rows
    # <= inverts: B log:implies A
    rows2 = PAR.parse_n3("<http://a> <= <http://b> .")
    assert rows2 == [
        ("http://b", LOG + "implies", "http://a", "uri", None, None)
    ]


def test_turtle_mode_still_rejects_n3_tokens():
    with pytest.raises(ValueError):
        PAR.parse_turtle("<http://a> = <http://b> .")
