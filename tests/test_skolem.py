"""Skolemization laws: totality, renaming-independence, distinctness
of structurally distinct bnodes, and lean self-merge."""

from __future__ import annotations

from orionbelt_ontology_builder_spark.fixtures import fixture_triples
from orionbelt_ontology_builder_spark.model import TRIPLES_SCHEMA
from orionbelt_ontology_builder_spark.operators import skolem


def _rename(rows, mapping):
    out = []
    for s, p, o, k, lang, dt in rows:
        out.append((
            mapping.get(s, s), p,
            mapping.get(o, o) if k == "bnode" or o.startswith("_:") else o,
            k, lang, dt,
        ))
    return out


def test_skolemize_total_and_distinct(spark):
    g = fixture_triples(spark, "axioms_om")
    out = skolem.skolemize_bnodes(g).collect()
    assert all(not r["subj"].startswith("_:") for r in out)
    assert all(r["obj_kind"] != "bnode" for r in out)
    assert all(not (r["obj_kind"] == "uri" and r["obj"].startswith("_:"))
               for r in out)
    # the twin list spines (unionOf vs disjointUnionOf) stay distinct:
    # as many skolem IRIs as input bnodes
    n_bnodes = len({r["subj"] for r in g.collect()
                    if r["subj"].startswith("_:")}
                   | {r["obj"] for r in g.collect()
                      if r["obj_kind"] == "bnode"})
    skolems = {r["subj"] for r in out if "genid" in r["subj"]} | {
        r["obj"] for r in out if "genid" in r["obj"]}
    assert len(skolems) == n_bnodes == 12


def test_skolemize_invariant_under_bnode_renaming(spark):
    rows = [tuple(r) for r in fixture_triples(spark, "axioms_om").collect()]
    mapping = {f"_:{x}": f"_:zz{i}" for i, x in enumerate(
        ["r1", "r2", "u1", "u2", "d1", "d2", "c1", "c2",
         "k1", "ad1", "m1", "m2"])}
    g1 = spark.createDataFrame(rows, TRIPLES_SCHEMA)
    g2 = spark.createDataFrame(_rename(rows, mapping), TRIPLES_SCHEMA)
    out1 = sorted(map(tuple, skolem.skolemize_bnodes(g1).collect()))
    out2 = sorted(map(tuple, skolem.skolemize_bnodes(g2).collect()))
    assert out1 == out2


def test_skolemize_lean_self_merge(spark):
    """Union of the graph with a bnode-renamed copy of itself
    skolemizes to exactly the single graph's triples (identical
    structures collapse — the merge-safety property)."""
    rows = [tuple(r) for r in fixture_triples(spark, "axioms_om").collect()]
    mapping = {s: s + "_copy" for s in
               {r[0] for r in rows if r[0].startswith("_:")}
               | {r[2] for r in rows if r[3] == "bnode"}}
    both = spark.createDataFrame(rows + _rename(rows, mapping),
                                 TRIPLES_SCHEMA)
    single = spark.createDataFrame(rows, TRIPLES_SCHEMA)
    merged = sorted(map(tuple, skolem.skolemize_bnodes(both).collect()))
    alone = sorted(map(tuple, skolem.skolemize_bnodes(single).collect()))
    assert merged == alone
