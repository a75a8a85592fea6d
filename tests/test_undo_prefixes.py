"""Undo/redo stack laws (reference tests/test_undo.py:6-102) and prefix
management (reference tests/test_prefixes.py)."""

from __future__ import annotations

import pytest

from orionbelt_ontology_builder_spark.fixtures import BASE
from orionbelt_ontology_builder_spark.operators import mutations, prefixes, views
from orionbelt_ontology_builder_spark.plans.undo import UndoManager


def _names(df):
    return sorted(r["name"] for r in views.get_classes(df).collect())


def _add(df, name):
    return mutations.add_class(df, name, BASE)


# ------------------------------------------------------------------ #
# undo/redo laws
# ------------------------------------------------------------------ #


def test_undo_basic(populated_om):
    um = UndoManager(populated_om)
    um.checkpoint(_add(um.current, "Temp"), "Added Temp")
    assert "Temp" in _names(um.current)
    um.undo()
    assert "Temp" not in _names(um.current)


def test_redo_basic(populated_om):
    um = UndoManager(populated_om)
    um.checkpoint(_add(um.current, "Temp"), "Added Temp")
    um.undo()
    assert "Temp" not in _names(um.current)
    um.redo()
    assert "Temp" in _names(um.current)


def test_undo_returns_none_at_bottom(populated_om):
    assert UndoManager(populated_om).undo() is None


def test_redo_returns_none_when_empty(populated_om):
    assert UndoManager(populated_om).redo() is None


def test_checkpoint_clears_redo_stack(populated_om):
    um = UndoManager(populated_om)
    um.checkpoint(_add(um.current, "A"), "A")
    um.undo()
    assert um.can_redo()
    um.checkpoint(_add(um.current, "B"), "B")
    assert not um.can_redo()


def test_multiple_undo_redo(populated_om):
    um = UndoManager(populated_om)
    for step in ("Step1", "Step2", "Step3"):
        um.checkpoint(_add(um.current, step), step)
    assert "Step3" in _names(um.current)
    um.undo()
    n = _names(um.current)
    assert "Step3" not in n and "Step2" in n
    um.undo()
    n = _names(um.current)
    assert "Step2" not in n and "Step1" in n
    um.redo()
    assert "Step2" in _names(um.current)


def test_max_history_enforced(populated_om):
    um = UndoManager(populated_om, max_history=5)
    for i in range(10):
        um.checkpoint(_add(um.current, f"C{i}"), f"C{i}")
    assert len(um._undo_stack) <= 5


def test_undo_labels(populated_om):
    um = UndoManager(populated_om)
    um.checkpoint(_add(um.current, "A"), "Added A")
    um.checkpoint(_add(um.current, "B"), "Added B")
    assert um.undo_labels == ["Added A", "Added B"]
    um.undo()
    assert um.undo_labels == ["Added A"]
    assert um.redo_labels == ["Added B"]


def test_undo_restores_exact_rows(populated_om):
    um = UndoManager(populated_om)
    before = sorted(map(tuple, populated_om.collect()))
    um.checkpoint(
        mutations.delete_resource(um.current, BASE + "Person"), "del Person"
    )
    um.undo()
    assert sorted(map(tuple, um.current.collect())) == before


def test_undo_label_returned(populated_om):
    um = UndoManager(populated_om)
    um.checkpoint(_add(um.current, "A"), "Added A")
    um.checkpoint(_add(um.current, "B"), "Added B")
    # undo restores the *previous* state; the reference returns the
    # label of the restored stack top
    assert um.undo() == "Added A"
    assert um.redo() == "Added B"


# ------------------------------------------------------------------ #
# prefixes (reference tests/test_prefixes.py)
# ------------------------------------------------------------------ #


@pytest.fixture()
def ptab(spark):
    return prefixes.default_prefix_table(spark, BASE)


def test_add_custom_prefix(ptab):
    out = prefixes.add_prefix(ptab, "foaf", "http://xmlns.com/foaf/0.1/")
    rows = [r for r in out.collect() if r["prefix"] == "foaf"]
    assert len(rows) == 1
    assert rows[0]["namespace"] == "http://xmlns.com/foaf/0.1/"
    assert rows[0]["source"] == "custom"


def test_add_prefix_overrides(ptab):
    out = prefixes.add_prefix(ptab, "ex", "http://a.org/")
    out = prefixes.add_prefix(out, "ex", "http://b.org/")
    rows = [r for r in out.collect() if r["prefix"] == "ex"]
    assert len(rows) == 1 and rows[0]["namespace"] == "http://b.org/"


def test_remove_custom_prefix(ptab):
    out = prefixes.add_prefix(ptab, "myapp", "http://myapp.example.org/")
    out = prefixes.remove_prefix(out, "myapp")
    assert not any(r["prefix"] == "myapp" for r in out.collect())


@pytest.mark.parametrize("std", ["owl", "rdf"])
def test_cannot_remove_standard_prefix(ptab, std):
    with pytest.raises(ValueError, match="Cannot remove standard prefix"):
        prefixes.remove_prefix(ptab, std)


def test_includes_standard_prefixes_and_sources(ptab):
    out = prefixes.add_prefix(ptab, "ex", "http://example.org/")
    rows = prefixes.get_all_prefixes(out).collect()
    by_name = {r["prefix"]: r for r in rows}
    for p in ("owl", "rdf", "rdfs", "xsd", "skos", "dc", "dcterms"):
        assert by_name[p]["source"] == "standard"
    assert by_name["ex"]["source"] == "custom"
    assert by_name["(default)"]["source"] == "default"


def test_prefixes_sorted_default_first(ptab):
    out = prefixes.add_prefix(ptab, "zzz", "http://zzz.org/")
    out = prefixes.add_prefix(out, "aaa", "http://aaa.org/")
    names = [r["prefix"] for r in prefixes.get_all_prefixes(out).collect()]
    assert names[0] == "(default)"
    assert names[1:] == sorted(names[1:])


def test_resolve_prefixes_longest_match(spark, ptab):
    out = prefixes.add_prefix(ptab, "exa", BASE)
    df = spark.createDataFrame(
        [(BASE + "Person",), ("http://unbound.org/x",)], "uri string"
    )
    got = {
        r["uri"]: r["prefix"]
        for r in prefixes.resolve_prefixes(df, out, "uri").collect()
    }
    assert got[BASE + "Person"] in ("exa", "(default)")  # both bind BASE
    assert got["http://unbound.org/x"] is None
