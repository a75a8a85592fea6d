"""Templates module + display-name / delete-impact render / viz
expansion layers (reference templates.py, app.py:3236-3402,
ontology_manager.py:457-478, app.py:3730-3739)."""

from __future__ import annotations

import os

import pytest

from orionbelt_ontology_builder_spark import fixtures as FX
from orionbelt_ontology_builder_spark import templates as T
from orionbelt_ontology_builder_spark.model import TRIPLES_SCHEMA
from orionbelt_ontology_builder_spark.operators import views


# --------------------------------------------------------------------- #
# template catalog + renderer
# --------------------------------------------------------------------- #


def test_template_names():
    names = T.get_template_names()
    assert names == [
        "Organization", "Product Catalog", "Event",
        "Person / Contact", "SKOS Thesaurus",
    ]


def test_get_template_unknown_is_none():
    assert T.get_template("nope") is None
    assert T.get_upper_ontology("nope") is None


def test_render_substitutes_every_placeholder():
    for name in T.get_template_names():
        ttl = T.render_template(T.get_template(name), "http://x.org/o#")
        assert "{base_uri}" not in ttl
        assert "http://x.org/o#" in ttl


def test_load_template_matches_hand_enumerated_fixture(spark):
    got = sorted(
        tuple(r)
        for r in T.load_template(spark, "Organization", FX.ORG_BASE).collect()
    )
    assert got == sorted(FX.TEMPLATE_ORG)


def test_load_template_unknown_raises(spark):
    with pytest.raises(KeyError):
        T.load_template(spark, "nope", "http://x/")


def test_every_template_parses_nonempty(spark):
    for name in T.get_template_names():
        df = T.load_template(spark, name, "http://x.org/o#")
        assert df.count() > 5


# --------------------------------------------------------------------- #
# upper-ontology loader (gated: needs the bundled sample files)
# --------------------------------------------------------------------- #

_HAVE_SAMPLES = os.path.isdir(T.SAMPLES_DIR)


@pytest.mark.skipif(not _HAVE_SAMPLES, reason="sample dir absent")
def test_upper_ontology_gist_core_loads(spark):
    df = T.load_upper_ontology(
        spark, "gist (Semantic Arts)", modules=["gistCore"]
    )
    classes = views.get_classes(df)
    assert classes.count() >= 50  # reference test_templates expectation


@pytest.mark.skipif(not _HAVE_SAMPLES, reason="sample dir absent")
def test_upper_ontology_default_modules_superset(spark):
    core = T.load_upper_ontology(
        spark, "gist (Semantic Arts)", modules=["gistCore"]
    ).count()
    default = T.load_upper_ontology(spark, "gist (Semantic Arts)").count()
    assert default > core  # annotations + subclass assertions included


def test_upper_ontology_unknown_module_raises(spark):
    with pytest.raises(KeyError):
        T.load_upper_ontology(
            spark, "gist (Semantic Arts)", modules=["nope"]
        )


# --------------------------------------------------------------------- #
# delete-impact text render
# --------------------------------------------------------------------- #


def test_format_delete_impact_person(populated_om):
    lines = [
        r["line"]
        for r in views.format_delete_impact(
            populated_om, FX.BASE + "Person"
        ).collect()
    ]
    assert lines[0].startswith("Deleting **")
    assert "5 triple(s)" in lines[0]
    assert any("1 subclass link(s) lost" in l for l in lines)
    assert any("2 property domain reference(s) lost" in l for l in lines)
    assert any("3 inbound relation(s) removed" in l for l in lines)
    # zero-count lines suppressed
    assert not any("instance(s)" in l for l in lines)
    assert not any("range reference" in l for l in lines)


# --------------------------------------------------------------------- #
# display-name heuristic
# --------------------------------------------------------------------- #


def test_display_name_prefers_label(spark):
    ax = FX.fixture_triples(spark, "axioms_om")
    row = views.infer_display_name(ax, "http://test.org/ont").collect()[0]
    assert row["display_name"] == "Test Ontology"


@pytest.mark.parametrize(
    "uri,expect",
    [
        ("http://example.org/ontologies/v2.1/biology#", "biology"),
        ("http://purl.org/net/foo/", "foo"),
        ("http://example.org/v1.0/", "example.org"),
    ],
)
def test_display_name_derivation(spark, uri, expect):
    empty = spark.createDataFrame([], TRIPLES_SCHEMA)
    row = views.infer_display_name(empty, uri).collect()[0]
    assert row["display_name"] == expect


# --------------------------------------------------------------------- #
# viz expansion layers
# --------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def viz_graph(spark):
    return (
        FX.fixture_triples(spark, "axioms_om")
        .unionByName(FX.fixture_triples(spark, "skos_om"))
        .cache()
    )


def test_viz_annotation_layer_skips_label_comment(viz_graph):
    rows = views.viz_annotation_layer(viz_graph).collect()
    assert rows, "expected annotation nodes"
    assert all(r["pred_name"] not in ("label", "comment") for r in rows)
    assert all(r["ann_id"].startswith("ann_") for r in rows)
    # values longer than 30 chars are truncated with ellipsis
    for r in rows:
        if len(r["value"]) > 30:
            assert r["value_display"].endswith("...")
            assert len(r["value_display"]) == 33


def test_viz_annotation_layer_only_visible_subjects(viz_graph):
    srcs = {
        r["src"] for r in views.viz_annotation_layer(viz_graph).collect()
    }
    from orionbelt_ontology_builder_spark.model import OWL, type_slice

    visible = {
        r["subj"]
        for r in type_slice(viz_graph, OWL.Class)
        .unionByName(type_slice(viz_graph, OWL.NamedIndividual))
        .collect()
    }
    assert srcs <= visible


def test_viz_triple_expansion_shapes(viz_graph):
    rows = views.viz_triple_expansion(viz_graph).collect()
    assert rows
    linked = [r for r in rows if not r["is_new"]]
    fresh = [r for r in rows if r["is_new"]]
    assert linked and fresh
    # linked edges point at visible URIs (raw URIs, not synthetic ids)
    assert all(r["obj_id"].startswith("http") for r in linked)
    assert all(
        r["obj_id"].startswith(("triple_", "lit_")) for r in fresh
    )
    # literal labels truncated at 30+ellipsis
    for r in fresh:
        if r["obj_kind"] == "literal":
            assert len(r["obj_label"]) <= 33


def test_viz_triple_expansion_cap(viz_graph):
    rows = views.viz_triple_expansion(viz_graph, max_new=2).collect()
    new_ids = {r["obj_id"] for r in rows if r["is_new"]}
    assert len(new_ids) == 2
    # cap is deterministic: smallest ids win
    all_ids = {
        r["obj_id"]
        for r in views.viz_triple_expansion(viz_graph).collect()
        if r["is_new"]
    }
    assert new_ids == set(sorted(all_ids)[:2])


def test_viz_edges_includes_related(spark):
    from orionbelt_ontology_builder_spark.model import (
        SKOS, t_uri,
    )
    from orionbelt_ontology_builder_spark.model import RDF

    base = "http://x.org/o#"
    t = spark.createDataFrame(
        [
            t_uri(base + "A", RDF.type, SKOS.Concept),
            t_uri(base + "B", RDF.type, SKOS.Concept),
            t_uri(base + "A", SKOS.related, base + "B"),
        ],
        TRIPLES_SCHEMA,
    )
    kinds = {r["kind"] for r in views.viz_edges(t).collect()}
    assert "related" in kinds
