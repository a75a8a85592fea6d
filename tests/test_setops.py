"""Mirrors the reference's set-semantics tests
(/root/reference/tests/test_merge.py, test_diff.py)."""

from __future__ import annotations

import pytest

from orionbelt_ontology_builder_spark.fixtures import (
    BASE,
    DIFF_A,
    DIFF_B,
    fixture_triples,
)
from orionbelt_ontology_builder_spark.model import RDFS
from orionbelt_ontology_builder_spark.operators import setops


@pytest.fixture(scope="module")
def diff_a(spark):
    return fixture_triples(spark, "diff_a").cache()


@pytest.fixture(scope="module")
def diff_b(spark):
    return fixture_triples(spark, "diff_b").cache()


def test_diff_self_is_empty(diff_a):
    d = setops.diff_summary(diff_a, diff_a).collect()[0]
    assert d["added"] == 0 and d["removed"] == 0
    assert d["unchanged"] == len(DIFF_A)


def test_diff_added_removed(diff_a, diff_b):
    d = setops.diff_summary(diff_a, diff_b).collect()[0]
    # B adds: label Human, Cat type, Cat subClassOf = 3
    # B removes (missing from B): label Person, Dog type, Dog subClassOf = 3
    assert d["added"] == 3
    assert d["removed"] == 3
    assert d["unchanged"] == len(DIFF_A) - 3


def test_classify_resources(diff_a, diff_b):
    c = {r["resource"]: r["change"] for r in setops.classify_resources(diff_a, diff_b).collect()}
    assert c[BASE + "Person"] == "modified"
    assert c[BASE + "Cat"] == "added"
    assert c[BASE + "Dog"] == "removed"


def test_merge_union_dedup(diff_a, diff_b):
    merged = setops.merge_graphs(diff_a, diff_a, setops.MERGE)
    assert merged.count() == len(DIFF_A)
    merged2 = setops.merge_graphs(diff_a, diff_b, setops.MERGE)
    assert merged2.count() == len(DIFF_A) + 3


def test_merge_empty_noop(spark, diff_a):
    from orionbelt_ontology_builder_spark.model import empty_triples

    merged = setops.merge_graphs(diff_a, empty_triples(spark), setops.MERGE)
    assert merged.count() == len(DIFF_A)


def test_merge_replace(diff_a, diff_b):
    assert setops.merge_graphs(diff_a, diff_b, setops.REPLACE).count() == len(DIFF_B)


def test_merge_overwrite_conflict_resolution(diff_a, diff_b):
    merged = setops.merge_graphs(diff_a, diff_b, setops.MERGE_OVERWRITE)
    labels = (
        merged.filter(
            (merged.subj == BASE + "Person") & (merged.pred == RDFS.label)
        )
        .select("obj")
        .collect()
    )
    assert [r["obj"] for r in labels] == ["Human"]  # incoming wins


def test_detect_conflicts(diff_a, diff_b):
    rows = setops.detect_conflicts(diff_a, diff_b).collect()
    assert len(rows) == 1
    assert rows[0]["subj"] == BASE + "Person"
    assert rows[0]["current_value"] == "Person"
    assert rows[0]["incoming_value"] == "Human"


def test_preview_is_pure(diff_a, diff_b):
    before = diff_a.count()
    p = setops.preview_import(diff_a, diff_b)
    p["summary"].collect()
    p["conflicts"].collect()
    assert diff_a.count() == before
