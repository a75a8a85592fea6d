"""Mirrors the reference's manager-level read tests
(/root/reference/tests/test_classes.py, test_skos.py, test_search.py)."""

from __future__ import annotations

from orionbelt_ontology_builder_spark.fixtures import BASE
from orionbelt_ontology_builder_spark.operators import views


def test_get_classes(populated_om):
    rows = views.get_classes(populated_om).collect()
    names = [r["name"] for r in rows]
    assert names == ["Employee", "Organization", "Person"]
    emp = next(r for r in rows if r["name"] == "Employee")
    assert emp["label"] == "Employee"
    assert emp["parents"] == [BASE + "Person"]
    person = next(r for r in rows if r["name"] == "Person")
    assert person["children"] == [BASE + "Employee"]


def test_class_hierarchy(populated_om):
    h = {r["class_name"]: r["children"] for r in views.get_class_hierarchy(populated_om).collect()}
    assert h == {"Person": ["Employee"], "Organization": [], "Employee": []}


def test_object_properties(populated_om):
    rows = views.get_object_properties(populated_om).collect()
    assert len(rows) == 1
    wf = rows[0]
    assert wf["name"] == "worksFor"
    assert wf["domain"] == BASE + "Person"
    assert wf["range"] == BASE + "Organization"
    assert wf["functional"] is False


def test_data_properties(populated_om):
    rows = views.get_data_properties(populated_om).collect()
    assert len(rows) == 1
    assert rows[0]["name"] == "hasName"


def test_individuals(populated_om):
    rows = views.get_individuals(populated_om).collect()
    assert [r["name"] for r in rows] == ["acme", "alice"]
    alice = next(r for r in rows if r["name"] == "alice")
    assert alice["classes"] == [BASE + "Employee"]


def test_statistics(populated_om):
    s = views.get_statistics(populated_om).collect()[0]
    assert s["classes"] == 3
    assert s["object_properties"] == 1
    assert s["data_properties"] == 1
    assert s["individuals"] == 2
    assert s["total_triples"] == 20


def test_search_ranks_name_first(populated_om):
    rows = views.search(populated_om, "person").collect()
    assert rows[0]["name"] == "Person"
    assert rows[0]["match_field"] == "name"


def test_concept_schemes(skos_om):
    rows = views.get_concept_schemes(skos_om).collect()
    assert len(rows) == 1
    assert rows[0]["concept_count"] == 3


def test_concepts(skos_om):
    rows = views.get_concepts(skos_om).collect()
    assert [r["name"] for r in rows] == ["Animal", "Cat", "Dog"]
    dog = next(r for r in rows if r["name"] == "Dog")
    assert dog["broader"] == [BASE + "Animal"]
    animal = next(r for r in rows if r["name"] == "Animal")
    assert sorted(animal["narrower"]) == [BASE + "Cat", BASE + "Dog"]


def test_concept_hierarchy(skos_om):
    h = {r["concept_name"]: r["children"] for r in views.get_concept_hierarchy(skos_om).collect()}
    assert h == {"Animal": ["Cat", "Dog"], "Dog": [], "Cat": []}


def test_infer_namespace(populated_om):
    row = views.infer_namespace(populated_om).collect()[0]
    assert row["namespace"] == BASE


def test_delete_impact(populated_om):
    imp = views.get_delete_impact(populated_om, BASE + "Employee").collect()[0]
    assert imp["subclasses"] == 0
    assert imp["instances"] == 1  # alice
    assert imp["direct_triples"] == 3


# ------------------------------------------------------------------ #
# import-time base-URI resolution (reference
# tests/test_import_namespace.py + _update_namespace_from_graph)
# ------------------------------------------------------------------ #


def _resolve(spark, rows, dpns=None):
    from orionbelt_ontology_builder_spark.model import TRIPLES_SCHEMA, t_uri

    t = spark.createDataFrame([t_uri(*r) for r in rows], TRIPLES_SCHEMA)
    return views.resolve_base_uri(t, default_prefix_ns=dpns).collect()[0]


def test_base_uri_from_ontology_decl_hash(spark):
    from orionbelt_ontology_builder_spark.model import OWL, RDF

    r = _resolve(spark, [
        ("http://imported.org/ont", RDF.type, OWL.Ontology),
        ("http://imported.org/ont#Dog", RDF.type, OWL.Class),
    ])
    assert r["base_uri"] == "http://imported.org/ont#"
    assert r["source"] == "ontology"


def test_base_uri_from_ontology_decl_slash(spark):
    from orionbelt_ontology_builder_spark.model import OWL, RDF

    r = _resolve(spark, [
        ("http://example.com/vocab", RDF.type, OWL.Ontology),
        ("http://example.com/vocab/Fruit", RDF.type, OWL.Class),
    ])
    assert r["base_uri"] == "http://example.com/vocab/"


def test_base_uri_default_prefix_beats_inference(spark):
    from orionbelt_ontology_builder_spark.model import OWL, RDF

    rows = [
        ("http://noont.org/schema#Cat", RDF.type, OWL.Class),
        ("http://other.org/x#Y", RDF.type, OWL.Class),
    ]
    r = _resolve(spark, rows, dpns="http://noont.org/schema#")
    assert r["source"] == "default_prefix"
    assert r["base_uri"] == "http://noont.org/schema#"
    # a STANDARD default prefix is ignored -> falls through to inference
    from orionbelt_ontology_builder_spark.model import OWL_NS

    r2 = _resolve(spark, rows, dpns=OWL_NS)
    assert r2["source"] == "inferred"


def test_base_uri_inference_excludes_standard_namespaces(spark):
    from orionbelt_ontology_builder_spark.model import OWL, OWL_NS, RDF

    r = _resolve(spark, [
        ("http://many.org/a#X1", RDF.type, OWL.Class),
        ("http://many.org/a#X2", RDF.type, OWL.Class),
        (OWL_NS + "T1", RDF.type, OWL.Class),
        (OWL_NS + "T2", RDF.type, OWL.Class),
        (OWL_NS + "T3", RDF.type, OWL.Class),
    ])
    assert r["base_uri"] == "http://many.org/a#"
    assert r["source"] == "inferred"


def test_search_empty_and_whitespace_query_returns_nothing(populated_om):
    assert views.search(populated_om, "").count() == 0
    assert views.search(populated_om, "   ").count() == 0


def test_search_no_results(populated_om):
    assert views.search(populated_om, "zzzznotfound").count() == 0


def test_search_partial_and_case_insensitive(populated_om):
    got = {r["name"] for r in views.search(populated_om, "emp").collect()}
    assert "Employee" in got


# ------------------------------------------------------------------ #
# delete-impact + usages law ports (reference tests/test_delete_impact.py,
# tests/test_usages.py — remaining laws beyond the oracle check)
# ------------------------------------------------------------------ #


def _impact(populated_om, name):
    return views.get_delete_impact(populated_om, BASE + name).collect()[0]


def test_class_impact_shows_subclasses_and_instances(populated_om):
    person = _impact(populated_om, "Person")
    assert person["subclasses"] == 1          # Employee
    assert person["instances"] == 0           # alice is typed Employee
    emp = _impact(populated_om, "Employee")
    assert emp["instances"] == 1              # alice


def test_class_impact_shows_domain_and_range_of(populated_om):
    person = _impact(populated_om, "Person")
    assert person["domain_of"] == 2           # worksFor, hasName
    org = _impact(populated_om, "Organization")
    assert org["range_of"] == 1               # worksFor
    assert org["instances"] == 1              # acme


def test_class_impact_total_positive(populated_om):
    assert _impact(populated_om, "Person")["total_affected"] > 0


def test_property_impact_shows_assertions(populated_om):
    from orionbelt_ontology_builder_spark.model import TRIPLES_SCHEMA, t_uri

    spark = populated_om.sparkSession
    withassert = populated_om.unionByName(
        spark.createDataFrame(
            [t_uri(BASE + "alice", BASE + "worksFor", BASE + "acme")],
            TRIPLES_SCHEMA,
        )
    )
    imp = views.get_delete_impact(withassert, BASE + "worksFor").collect()[0]
    assert imp["as_predicate"] == 1
    assert imp["direct_triples"] == 3         # type + domain + range decls


def test_individual_impact_shows_relations(populated_om):
    from orionbelt_ontology_builder_spark.model import TRIPLES_SCHEMA, t_uri

    spark = populated_om.sparkSession
    withrel = populated_om.unionByName(
        spark.createDataFrame(
            [t_uri(BASE + "alice", BASE + "worksFor", BASE + "acme")],
            TRIPLES_SCHEMA,
        )
    )
    imp = views.get_delete_impact(withrel, BASE + "acme").collect()[0]
    assert imp["inbound_references"] == 1     # alice worksFor acme


def test_isolated_class_has_minimal_impact(populated_om):
    from orionbelt_ontology_builder_spark.operators import mutations

    iso = mutations.add_class(populated_om, "Isolated", BASE)
    imp = views.get_delete_impact(iso, BASE + "Isolated").collect()[0]
    assert imp["subclasses"] == 0 and imp["instances"] == 0
    assert imp["inbound_references"] == 0
    assert imp["direct_triples"] >= 1         # its own type decl


def test_usages_laws(populated_om):
    # class inbound usages: Person is object of subClassOf + domain x2
    u = views.get_resource_usages(populated_om, BASE + "Person")
    kinds = {(r["direction"], r["pred"]) for r in u.collect()}
    assert any(d == "inbound" for d, _ in kinds)
    # property as predicate after an assertion
    from orionbelt_ontology_builder_spark.model import TRIPLES_SCHEMA, t_uri

    spark = populated_om.sparkSession
    withrel = populated_om.unionByName(
        spark.createDataFrame(
            [t_uri(BASE + "alice", BASE + "worksFor", BASE + "acme")],
            TRIPLES_SCHEMA,
        )
    )
    u2 = views.get_resource_usages(withrel, BASE + "worksFor").collect()
    assert any(r["direction"] == "predicate" for r in u2)
    # isolated class: no usages beyond its own decls
    from orionbelt_ontology_builder_spark.operators import mutations

    iso = mutations.add_class(populated_om, "Isolated2", BASE)
    u3 = views.get_resource_usages(iso, BASE + "Isolated2").collect()
    assert all(r["direction"] != "inbound" for r in u3)


def test_deep_instance_counts_rollup(populated_om):
    """alice is a direct Employee instance and rolls up to Person
    through the closure; Organization counts acme only; Person has no
    direct instances."""
    out = {r["class_uri"]: r
           for r in views.deep_instance_counts(populated_om).collect()}
    assert set(out) == {BASE + c
                        for c in ("Person", "Organization", "Employee")}
    assert out[BASE + "Employee"]["n_direct"] == 1
    assert out[BASE + "Employee"]["n_deep"] == 1
    assert out[BASE + "Person"]["n_direct"] == 0
    assert out[BASE + "Person"]["n_deep"] == 1
    assert out[BASE + "Organization"]["n_direct"] == 1
    assert out[BASE + "Organization"]["n_deep"] == 1


def test_extract_module_follows_axiom_deps(spark):
    """Seeding at Employee pulls Person (subClassOf), the someValuesFrom
    restriction bnode and its onProperty/filler targets, and Worker
    (equivalentClass) — but no individuals and not Agent's machinery."""
    from orionbelt_ontology_builder_spark.fixtures import fixture_triples

    mod = views.extract_module(
        fixture_triples(spark, "axioms_om"), [BASE + "Employee"]
    ).collect()
    subjects = {r["subj"] for r in mod}
    assert BASE + "Employee" in subjects
    assert BASE + "Person" in subjects           # via subClassOf
    assert "_:r1" in subjects                    # Employee's restriction
    assert BASE + "worksFor" in subjects         # via onProperty
    assert BASE + "Worker" in subjects           # via equivalentClass
    assert BASE + "alice" not in subjects        # instances excluded
    assert BASE + "Agent" not in subjects        # unrelated machinery


def test_viz_property_edges_layers_and_both_ends(spark):
    from orionbelt_ontology_builder_spark.fixtures import fixture_triples
    from orionbelt_ontology_builder_spark.model import TRIPLES_SCHEMA, t_uri

    extra = [
        t_uri(BASE + "alice", BASE + "worksFor", BASE + "acme"),
        t_uri(BASE + "alice", BASE + "worksFor", BASE + "ghost"),
    ]
    t = fixture_triples(spark, "populated_om").unionByName(
        spark.createDataFrame(extra, TRIPLES_SCHEMA)
    )
    out = {(r["src"], r["dst"], r["kind"]): r["label"]
           for r in views.viz_property_edges(t).collect()}
    # schema layer: worksFor drawn domain(Person) -> range(Organization)
    assert out[(BASE + "Person", BASE + "Organization", "property")] \
        == "worksFor"
    # assertion layer: alice -> acme labeled by the predicate
    assert out[(BASE + "alice", BASE + "acme", "assertion")] == "worksFor"
    # dangling edge to undeclared 'ghost' filtered by both-ends rule
    assert not any(d.endswith("ghost") for _, d, _k in out)


# ------------------------------------------------------------------ #
# fact_ranking (entity summarization) + rdf containers + bcubed
# ------------------------------------------------------------------ #


def test_fact_ranking_rare_fact_first(spark):
    from orionbelt_ontology_builder_spark.model import triples_df, t_lit

    t = triples_df(spark, [
        t_lit("s1", "p_common", "x"),
        t_lit("s1", "p_rare", "u1"),
        t_lit("s2", "p_common", "x"),
        t_lit("s3", "p_common", "y"),
    ])
    rows = views.fact_ranking(t, k=2).collect()
    by_subj = {}
    for r in rows:
        by_subj.setdefault(r["subj"], []).append(r)
    # s1: unique (p_rare,u1) scores N/df_fact = 3 > shared (p_common,x) 1.5
    s1 = by_subj["s1"]
    assert [r["pred"] for r in s1] == ["p_rare", "p_common"]
    assert abs(s1[0]["score"] - 3.0) < 1e-12
    assert abs(s1[1]["score"] - 1.5) < 1e-12
    # s3's unique value of the common predicate outranks s2's shared one
    assert abs(by_subj["s3"][0]["score"] - 3.0) < 1e-12
    assert abs(by_subj["s2"][0]["score"] - 1.5) < 1e-12


def test_rdf_containers_numeric_order_and_typing(spark):
    from orionbelt_ontology_builder_spark import fixtures as FX
    from orionbelt_ontology_builder_spark.operators import lists

    rows = lists.get_containers(
        FX.fixture_triples(spark, "containers_om")
    ).collect()
    seqs = [(r["idx"], r["member"]) for r in rows
            if r["container"].endswith("AuthorList")]
    # numeric, not lexicographic: _10 sorts AFTER _2
    assert seqs == [(1, "alice"), (2, "bob"), (10, "jane")]
    # the rdfs:label row is not a member; untyped carrier excluded
    assert all(r["ctype"] in ("Seq", "Bag", "Alt") for r in rows)
    assert not any(r["container"].endswith("NotAContainer") for r in rows)
    bag = [r for r in rows if r["ctype"] == "Bag"]
    assert len(bag) == 2 and all(r["member_kind"] == "uri" for r in bag)


def test_bcubed_classic_example(spark):
    from orionbelt_ontology_builder_spark.datapipe import dedup

    ids = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id int")
    truth = spark.createDataFrame(
        [(1, "t1"), (2, "t1"), (3, "t1"), (4, "t2"), (5, "t2")],
        "doc_id int, cluster string",
    )
    pred = spark.createDataFrame(
        [(1, "p1"), (2, "p1"), (3, "p2"), (4, "p2")],  # 5 missing -> singleton
        "doc_id int, cluster string",
    )
    r = dedup.bcubed_eval(ids, pred, truth).collect()[0]
    assert r["n_items"] == 5
    assert abs(r["bcubed_precision"] - 0.8) < 1e-12
    assert abs(r["bcubed_recall"] - (2/3 + 2/3 + 1/3 + 0.5 + 0.5) / 5) < 1e-12
    p, q = r["bcubed_precision"], r["bcubed_recall"]
    assert abs(r["bcubed_f1"] - 2 * p * q / (p + q)) < 1e-12


def test_bcubed_perfect_clustering_is_one(spark):
    from orionbelt_ontology_builder_spark.datapipe import dedup

    ids = spark.createDataFrame([(i,) for i in range(1, 4)], "doc_id int")
    m = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id int, cluster string"
    )
    r = dedup.bcubed_eval(ids, m, m).collect()[0]
    assert r["bcubed_precision"] == 1.0 == r["bcubed_recall"] == r["bcubed_f1"]


def test_ontology_metrics_tangled_dag(spark):
    from orionbelt_ontology_builder_spark import fixtures as FX

    r = views.ontology_metrics(
        FX.fixture_triples(spark, "hierarchy_om")
    ).collect()[0]
    assert r["n_classes"] == 8 and r["n_edges"] == 8
    assert r["n_roots"] == 1            # Thing
    assert r["n_leaves"] == 3           # Employee, Organization, City
    assert r["n_multi_parent"] == 1     # Employee (Person + Role)
    assert r["max_fanout"] == 3         # Thing -> Agent, Role, Place
    # Employee's ancestor set {Person, Agent, Role, Thing}
    assert r["max_depth"] == 4
    # depths: Thing 0, Agent/Role/Place 1, Person/Org/City 2, Employee 4
    assert abs(r["avg_depth"] - (0 + 1 + 1 + 1 + 2 + 2 + 2 + 4) / 8) < 1e-12
    assert abs(r["inheritance_richness"] - 1.0) < 1e-12


def test_ontology_metrics_cycle_safe(spark):
    from orionbelt_ontology_builder_spark.model import (
        RDFS, t_uri, triples_df,
    )

    t = triples_df(spark, [
        t_uri("A", RDFS.subClassOf, "B"),
        t_uri("B", RDFS.subClassOf, "A"),
    ])
    r = views.ontology_metrics(t).collect()[0]
    # both classes see the full {A, B} ancestor set; no hang
    assert r["n_classes"] == 2 and r["max_depth"] == 2
    assert r["n_roots"] == 0 and r["n_leaves"] == 0


def test_flatten_skosxl(spark):
    from orionbelt_ontology_builder_spark import fixtures as FX

    rows = views.flatten_skosxl(
        FX.fixture_triples(spark, "skosxl_om")
    ).collect()
    got = {(r["concept"], r["label_kind"]): (r["literal"], r["lang"])
           for r in rows}
    B = FX.BASE
    assert got[(B + "cA", "pref")] == ("alpha", "en")
    assert got[(B + "cA", "alt")] == ("alfa", "de")
    # tagged form wins the min over the untagged one (sentinel sorts
    # null-lang last)
    assert got[(B + "cB", "pref")] == ("beta", "fr")
    assert got[(B + "cB", "hidden")] == ("b3ta", None)
    # dangling pointer (no literalForm) dropped
    assert not any(c == B + "cC" for c, _ in got)


def test_language_coverage_buckets(spark):
    from orionbelt_ontology_builder_spark import fixtures as FX

    rows = {r["lang"]: r for r in views.language_coverage(
        FX.fixture_triples(spark, "skosxl_om")
    ).collect()}
    # plain labels only (skosxl pointers are not label literals):
    # en: cA + cB, de: cB, (none): cC; 3 labeled entities total
    assert rows["en"]["n_entities"] == 2
    assert abs(rows["en"]["coverage"] - 2 / 3) < 1e-12
    assert rows["de"]["n_entities"] == 1
    assert rows["(none)"]["n_labels"] == 1


def test_skos_mappings_crosswalk(spark):
    from orionbelt_ontology_builder_spark import fixtures as FX

    rows = views.skos_mappings(
        FX.fixture_triples(spark, "mappings_om")
    ).collect()
    B = FX.BASE
    got = {(r["match_type"], r["concept_a"], r["concept_b"]):
           (r["scheme_a"], r["scheme_b"]) for r in rows}
    assert got[("exact", B + "red", B + "rouge")] == (
        B + "Colors", B + "Couleurs")
    assert got[("close", B + "crimson", B + "rouge")][1] == B + "Couleurs"
    # scheme-less endpoint -> NULL scheme, row still present
    assert got[("narrow", B + "red", B + "warm")] == (B + "Colors", None)


def test_deprecated_usage_report(spark):
    from orionbelt_ontology_builder_spark import fixtures as FX

    rows = views.deprecated_usage(
        FX.fixture_triples(spark, "mappings_om")
    ).collect()
    B = FX.BASE
    got = {(r["deprecated_entity"], r["used_by"]): r for r in rows}
    # referenced as object
    assert (B + "oldRed", B + "crimson") in got
    # used as predicate
    op = got[(B + "oldProp", B + "red")]
    assert op["pred"] == B + "oldProp" and op["n_uses"] == 1
    # deprecated but unreferenced -> absent
    assert not any(d == B + "retired" for d, _ in got)


def test_viz_edges_parallel_fanout(spark):
    """Reference app.py:3404-3419: parallel edges between one unordered
    node pair alternate curvedCW/curvedCCW with growing roundness;
    singleton pairs render straight."""
    from orionbelt_ontology_builder_spark import fixtures as FX
    from orionbelt_ontology_builder_spark import model as M
    from orionbelt_ontology_builder_spark.operators import views

    B = FX.BASE
    t = spark.createDataFrame(
        [
            M.t_uri(B + "x", M.RDF.type, M.SKOS.Concept),
            M.t_uri(B + "y", M.RDF.type, M.SKOS.Concept),
            M.t_uri(B + "z", M.RDF.type, M.SKOS.Concept),
            M.t_uri(B + "x", M.SKOS.broader, B + "y"),
            M.t_uri(B + "x", M.SKOS.related, B + "y"),
            M.t_uri(B + "y", M.SKOS.related, B + "x"),
            M.t_uri(B + "z", M.SKOS.broader, B + "y"),  # singleton pair
        ],
        M.TRIPLES_SCHEMA,
    )
    rows = {(r.src, r.dst, r.kind): r for r in views.viz_edges(t).collect()}
    # order within the x-y group: kind asc, src, dst ->
    #   (x,y,broader)=0, (x,y,related)=1, (y,x,related)=2
    e0 = rows[(B + "x", B + "y", "broader")]
    e1 = rows[(B + "x", B + "y", "related")]
    e2 = rows[(B + "y", B + "x", "related")]
    assert (e0.fan_idx, e0.fan_curve, e0.fan_roundness) == (0, "curvedCW", 0.2)
    assert (e1.fan_idx, e1.fan_curve, e1.fan_roundness) == (1, "curvedCCW", 0.2)
    assert (e2.fan_idx, e2.fan_curve) == (2, "curvedCW")
    assert abs(e2.fan_roundness - 0.2) < 1e-15
    s = rows[(B + "z", B + "y", "broader")]
    assert (s.fan_idx, s.fan_curve, s.fan_roundness) == (0, "", 0.0)
