"""Taxonomy induction (Hearst patterns) + transitive reduction."""

from __future__ import annotations

import duckdb

from orionbelt_ontology_builder_spark.operators import taxonomy as T


def test_hearst_expected_pairs_and_support(spark):
    got = {
        (r["hypernym"], r["hyponym"], r["pattern"]): r["support"]
        for r in T.hearst_patterns(T.hearst_sentences_df(spark)).collect()
    }
    # repeated cue -> support 2; list members all extracted
    assert got[("animals", "dogs", "such_as")] == 2
    assert got[("animals", "cats", "such_as")] == 1
    assert got[("animals", "horses", "such_as")] == 1
    assert got[("metals", "copper", "including")] == 2
    assert got[("metals", "zinc", "including")] == 1
    # reversed-role rule: "dogs and other animals"
    assert got[("animals", "dogs", "and_other")] == 1
    assert got[("metals", "copper", "and_other")] == 1
    assert got[("vehicles", "cars", "and_other")] == 1
    # the same sentence also feeds such_as (vehicles such as trucks)
    assert got[("vehicles", "trucks", "such_as")] == 1
    assert got[("fruits", "apples", "especially")] == 1
    assert got[("fruits", "pears", "especially")] == 1
    # no hypernym ever appears as its own hyponym
    assert all(h != o for (h, o, _p) in got)


def test_hearst_matches_sql_twin(spark):
    got = [
        (r["hypernym"], r["hyponym"], r["pattern"], r["support"])
        for r in T.hearst_patterns(T.hearst_sentences_df(spark)).collect()
    ]
    want = duckdb.sql(
        T.hearst_patterns_sql(T.hearst_sentences_values())
    ).fetchall()
    assert got == [tuple(r) for r in want]


def test_hierarchy_reduction_plants(spark):
    got = {
        (r["subclass"], r["superclass"]): r["status"]
        for r in T.hierarchy_reduction(T.hier_edges_df(spark)).collect()
    }
    assert got == {
        ("Car", "Vehicle"): "kept",
        ("Vehicle", "Artifact"): "kept",
        ("Car", "Artifact"): "redundant",
        ("Artifact", "Thing"): "kept",
        ("Vehicle", "Thing"): "redundant",
        ("Car", "Thing"): "redundant",
        ("Boat", "Vehicle"): "kept",
        ("Dog", "Animal"): "kept",
        ("Animal", "Thing"): "kept",
    }


def test_hierarchy_reduction_matches_sql_twin_and_closure_law(spark):
    from orionbelt_ontology_builder_spark.operators.fixpoint import (
        transitive_closure,
    )

    got = [
        (r["subclass"], r["superclass"], r["status"])
        for r in T.hierarchy_reduction(T.hier_edges_df(spark)).collect()
    ]
    want = duckdb.sql(
        T.hierarchy_reduction_sql(T.hier_edges_values())
    ).fetchall()
    assert got == [tuple(r) for r in want]
    # law: dropping redundant edges preserves the transitive closure
    kept = spark.createDataFrame(
        [(a, c) for a, c, s in got if s == "kept"], "src string, dst string"
    )
    full = spark.createDataFrame(
        [(a, c) for a, c, _ in got], "src string, dst string"
    )
    clo_kept = {tuple(r) for r in transitive_closure(kept).collect()}
    clo_full = {tuple(r) for r in transitive_closure(full).collect()}
    assert clo_kept == clo_full


def test_acronym_pairs_expected_and_twin(spark):
    got = [
        (r["acronym"], r["expansion"], r["support"])
        for r in T.acronym_pairs(T.acronym_sentences_df(spark)).collect()
    ]
    as_map = {(a, e): s for a, e, s in got}
    assert as_map[("WHO", "world health organization")] == 2
    assert as_map[("LLM", "large language model")] == 1
    assert as_map[("EU", "european union")] == 1
    assert as_map[("RF", "random forest")] == 1
    assert as_map[("KG", "knowledge graphs")] == 1
    # initials mismatch rejected: "banana split (XY)"
    assert not any(a == "XY" for a, _, _ in got)
    want = duckdb.sql(
        T.acronym_pairs_sql(T.acronym_sentences_values())
    ).fetchall()
    assert got == [tuple(r) for r in want]


# ------------------------------------------------------------------ #
# Gazetteer spotting + co-mention + functional suggestion
# ------------------------------------------------------------------ #


def test_gazetteer_leftmost_longest(spark):
    from orionbelt_ontology_builder_spark.operators import taxonomy as TX

    rows = TX.gazetteer_mentions(TX.gaz_sentences_df(spark)).collect()
    got = {(r["doc_id"], r["surface"]) for r in rows}
    # the 3-gram wins over both nested shorter matches in doc 1
    assert (1, "new york times") in got
    assert (1, "new york") not in got and (1, "york") not in got
    # standalone shorter surfaces still match elsewhere
    assert (0, "new york") in got and (2, "york") in got
    # entity-free doc contributes nothing
    assert not any(d == 4 for d, _ in got)


def test_gazetteer_custom_dictionary(spark):
    from orionbelt_ontology_builder_spark.operators import taxonomy as TX

    sents = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id int, text string"
    )
    out = TX.gazetteer_mentions(
        sents, gazetteer=[("beta gamma", "e:BG"), ("beta", "e:B")]
    ).collect()
    assert [(r["surface"], r["entity"]) for r in out] == [("beta gamma", "e:BG")]


def test_suggest_functional_rates_and_gate(spark):
    from orionbelt_ontology_builder_spark.model import t_lit, triples_df
    from orionbelt_ontology_builder_spark.operators import profiling

    rows = []
    for s in ("s1", "s2", "s3"):
        rows.append(t_lit(s, "p_fun", f"v_{s}"))     # one value each
        rows.append(t_lit(s, "p_multi", "a"))
        rows.append(t_lit(s, "p_multi", "b"))        # two values each
    rows.append(t_lit("s1", "p_rare", "x"))          # support 1
    out = {r["pred"]: r for r in profiling.suggest_functional(
        triples_df(spark, rows)
    ).collect()}
    assert out["p_fun"]["suggested"] is True
    assert out["p_fun"]["violation_rate"] == 0.0
    assert out["p_multi"]["suggested"] is False
    assert out["p_multi"]["violation_rate"] == 1.0
    # min_subjects gate: perfect rate but support 1 -> rejected
    assert out["p_rare"]["suggested"] is False


def test_disambiguation_coherence_votes(spark):
    from orionbelt_ontology_builder_spark.operators import taxonomy as TX

    m = TX.gazetteer_mentions(
        TX.ambig_sentences_df(spark), gazetteer=TX.AMBIG_GAZETTEER
    )
    rel = spark.createDataFrame(TX.AMBIG_RELATED, "src string, dst string")
    out = {r["doc_id"]: r for r in TX.disambiguate_mentions(m, rel).collect()}
    PF = "http://kg.example.org/Paris_France"
    PT = "http://kg.example.org/Paris_Texas"
    # doc 0 context {EiffelTower, France} -> Paris_France with 2 votes
    assert out[0]["entity"] == PF and out[0]["votes"] == 2
    # doc 1 context {Texas, Dallas} -> Paris_Texas
    assert out[1]["entity"] == PT and out[1]["votes"] == 2
    # single-context docs still resolve
    assert out[2]["entity"] == PF and out[3]["entity"] == PT
    # unambiguous docs contribute no rows
    assert 4 not in out


def test_disambiguation_tiebreak_entity_asc(spark):
    from orionbelt_ontology_builder_spark.operators import taxonomy as TX

    sents = spark.createDataFrame(
        [(0, "paris is lovely")], "doc_id int, text string"
    )
    m = TX.gazetteer_mentions(sents, gazetteer=TX.AMBIG_GAZETTEER)
    rel = spark.createDataFrame(TX.AMBIG_RELATED, "src string, dst string")
    r = TX.disambiguate_mentions(m, rel).collect()[0]
    # zero votes, zero prior -> lexicographically first candidate
    assert r["votes"] == 0 and r["entity"].endswith("Paris_France")


def test_copula_instances_negation_and_articles(spark):
    from orionbelt_ontology_builder_spark.operators import taxonomy as TX

    got = {(r["instance"], r["class_term"]): r["support"]
           for r in TX.copula_instances(
               TX.copula_sentences_df(spark)).collect()}
    assert got[("paris", "city")] == 1 and got[("berlin", "city")] == 1
    assert ("copper", "element") in got      # "is an" article form
    assert ("whale", "mammal") in got        # generic subject kept
    # negated copulas never extract
    assert not any(i == "felix" for i, _ in got)
    assert ("dog", "cat") not in got


def test_coordination_siblings_pairs(spark):
    from orionbelt_ontology_builder_spark.operators import taxonomy as TX

    got = {(r["term_a"], r["term_b"]): r["support"]
           for r in TX.coordination_siblings(
               TX.coord_sentences_df(spark)).collect()}
    assert got[("cats", "dogs")] == 2        # two supporting lists
    assert got[("copper", "zinc")] == 1
    assert got[("dogs", "horses")] == 1 and got[("dogs", "wolves")] == 1
    # "red or green or blue" has no comma-list prefix -> no pairs
    assert not any("red" in p for p in got)
