"""Unit semantics for the profiling operators (json key profile,
predicate cardinality, predicate co-occurrence) on hand-built fixtures,
plus a plan-shape check that the co-occurrence self-join is an
equi-join (no cartesian stage)."""

from __future__ import annotations

from pyspark.sql import Row

from orionbelt_ontology_builder_spark.operators import align
from orionbelt_ontology_builder_spark.operators import profiling as P


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _triples(spark, rows):
    return spark.createDataFrame(
        [Row(subj=s, pred=p, obj=o, obj_kind="uri") for s, p, o in rows]
    )


def test_json_props_profile_types_and_presence(spark):
    ev = spark.createDataFrame(
        [
            Row(props='{"a": 1, "b": "x"}'),
            Row(props='{"a": 2, "b": "x", "c": 1.5}'),
            Row(props='{"a": "oops"}'),
            Row(props='{"d": true, "e": null}'),
        ]
    )
    out = {r["key"]: r for r in P.json_props_profile(ev).collect()}
    assert set(out) == {"a", "b", "c", "d", "e"}
    # a: two ints + one string -> mixed, present in 3/4 rows
    assert out["a"]["dtype"] == "mixed"
    assert out["a"]["n_present"] == 3 and out["a"]["n_int"] == 2
    assert abs(out["a"]["frac_present"] - 0.75) < 1e-12
    # b: same value twice -> 1 distinct, clean string
    assert out["b"]["dtype"] == "string" and out["b"]["n_distinct"] == 1
    assert out["c"]["dtype"] == "float"
    assert out["d"]["dtype"] == "bool"
    # e only holds null
    assert out["e"]["dtype"] == "null" and out["e"]["n_null"] == 1


def test_predicate_cardinality_flags(spark):
    # :name  — every subject exactly one value, values unique  -> 1:1
    # :type  — one value per subject, objects shared           -> N:1
    # :alias — s1 has two values, aliases unique               -> 1:N
    # :knows — multi both ways                                 -> M:N
    t = _triples(spark, [
        ("s1", ":name", "n1"), ("s2", ":name", "n2"),
        ("s1", ":type", "T"), ("s2", ":type", "T"),
        ("s1", ":alias", "a1"), ("s1", ":alias", "a2"),
        ("s1", ":knows", "s2"), ("s1", ":knows", "s3"),
        ("s2", ":knows", "s3"),
    ])
    out = {r["pred"]: r for r in P.predicate_cardinality(t).collect()}
    assert out[":name"]["cardinality"] == "1:1"
    assert out[":name"]["functional"] and out[":name"]["inverse_functional"]
    assert out[":type"]["cardinality"] == "N:1"
    assert out[":type"]["functional"] and not out[":type"]["inverse_functional"]
    assert out[":alias"]["cardinality"] == "1:N"
    assert out[":knows"]["cardinality"] == "M:N"
    assert out[":knows"]["n_triples"] == 3
    assert out[":knows"]["n_subjects"] == 2 and out[":knows"]["n_objects"] == 2
    assert out[":knows"]["max_fanout"] == 2 and out[":knows"]["max_fanin"] == 2


def test_predicate_cooccurrence_support(spark):
    # 4 subjects: a+b together on 2, a alone on 1, b+c on 1
    t = _triples(spark, [
        ("s1", "a", "x"), ("s1", "b", "x"),
        ("s2", "a", "x"), ("s2", "b", "x"),
        ("s3", "a", "x"),
        ("s4", "b", "x"), ("s4", "c", "x"),
        ("s4", "b", "y"),  # duplicate (subj,pred) must not double-count
    ])
    out = {(r["pred_a"], r["pred_b"]): r
           for r in P.predicate_cooccurrence(t).collect()}
    assert set(out) == {("a", "b"), ("b", "c")}
    assert out[("a", "b")]["n_subjects"] == 2
    assert abs(out[("a", "b")]["support"] - 0.5) < 1e-12
    assert out[("b", "c")]["n_subjects"] == 1
    assert abs(out[("b", "c")]["support"] - 0.25) < 1e-12


def test_predicate_cooccurrence_plan_no_cartesian(spark):
    t = _triples(spark, [("s1", "a", "x"), ("s1", "b", "x")])
    plan = _plan(P.predicate_cooccurrence(t))
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------------ #
# cross-graph alignment (operators/align.py)
# ------------------------------------------------------------------ #


def _graph(spark, rows):
    from orionbelt_ontology_builder_spark.model import TRIPLES_SCHEMA
    return spark.createDataFrame(rows, TRIPLES_SCHEMA)


def test_align_label_beats_tokens(spark):
    from orionbelt_ontology_builder_spark.model import OWL, RDF, RDFS
    from orionbelt_ontology_builder_spark.operators import align

    a = _graph(spark, [
        ("http://a#FullName", RDF.type, OWL.Class, "uri", None, None),
        ("http://a#FullName", RDFS.label, "full name", "literal", None, None),
        ("http://a#City", RDF.type, OWL.Class, "uri", None, None),
        ("http://a#City", RDFS.label, "city name", "literal", None, None),
    ])
    b = _graph(spark, [
        ("http://b#PersonName", RDF.type, OWL.Class, "uri", None, None),
        ("http://b#PersonName", RDFS.label, "full name", "literal",
         None, None),
    ])
    out = {(r["uri_a"], r["uri_b"]): r
           for r in align.align_entities(a, b).collect()}
    # exact label match wins with evidence 'label', score 1.0
    m = out[("http://a#FullName", "http://b#PersonName")]
    assert m["evidence"] == "label" and m["score"] == 1.0
    # City shares token 'name' only: jaccard 1/3 < 0.5 -> filtered
    assert ("http://a#City", "http://b#PersonName") not in out


def test_align_token_jaccard_and_kind_isolation(spark):
    from orionbelt_ontology_builder_spark.model import OWL, RDF, RDFS
    from orionbelt_ontology_builder_spark.operators import align

    a = _graph(spark, [
        ("http://a#P", RDF.type, OWL.Class, "uri", None, None),
        ("http://a#P", RDFS.label, "red apple tree", "literal", None, None),
        ("http://a#Q", RDF.type, OWL.ObjectProperty, "uri", None, None),
        ("http://a#Q", RDFS.label, "apple orchard", "literal", None, None),
    ])
    b = _graph(spark, [
        ("http://b#X", RDF.type, OWL.Class, "uri", None, None),
        ("http://b#X", RDFS.label, "apple tree", "literal", None, None),
    ])
    out = {(r["uri_a"], r["uri_b"]): r
           for r in align.align_entities(a, b).collect()}
    # P: {red, apple, tree} vs {apple, tree} -> 2/3 jaccard, 'tokens'
    m = out[("http://a#P", "http://b#X")]
    assert m["evidence"] == "tokens" and abs(m["score"] - 2 / 3) < 1e-12
    # Q is an ObjectProperty: kinds never cross-match
    assert ("http://a#Q", "http://b#X") not in out


# ------------------------------------------------------------------ #
# BGP matching (operators/query.py)
# ------------------------------------------------------------------ #


def test_bgp_join_on_shared_vars(spark):
    from orionbelt_ontology_builder_spark.operators import query

    t = _triples(spark, [
        ("a", "type", "C"), ("b", "type", "C"), ("c", "type", "D"),
        ("a", "knows", "b"), ("b", "knows", "c"),
    ])
    out = query.match_bgp(t, [
        ("?x", "type", "C"), ("?x", "knows", "?y"), ("?y", "type", "C"),
    ]).collect()
    assert [(r["x"], r["y"]) for r in out] == [("a", "b")]


def test_bgp_repeated_var_and_constant_filter(spark):
    from orionbelt_ontology_builder_spark.operators import query

    t = _triples(spark, [
        ("n1", "likes", "n1"), ("n1", "likes", "n2"), ("n2", "likes", "n2"),
    ])
    out = query.match_bgp(t, [("?x", "likes", "?x")]).collect()
    assert sorted(r["x"] for r in out) == ["n1", "n2"]


def test_bgp_cross_join_when_disconnected(spark):
    from orionbelt_ontology_builder_spark.operators import query

    t = _triples(spark, [("a", "p", "u"), ("b", "q", "v")])
    out = query.match_bgp(t, [("?x", "p", "u"), ("?y", "q", "v")]).collect()
    assert [(r["x"], r["y"]) for r in out] == [("a", "b")]


def test_bgp_plan_pushes_constant_filters(spark):
    from orionbelt_ontology_builder_spark.operators import query

    t = _triples(spark, [("a", "type", "C")])
    txt = _plan(query.match_bgp(t, [("?x", "type", "C")]))
    assert "CartesianProduct" not in txt


def test_eval_path_sequence_inverse_closure(spark):
    from orionbelt_ontology_builder_spark.operators import query

    t = _triples(spark, [
        ("a", "sub", "b"), ("b", "sub", "c"),          # chain a<b<c
        ("x", "type", "a"), ("y", "type", "b"),
    ])
    # type / sub+ : strict ancestors of each instance's class
    out = {(r["src"], r["dst"])
           for r in query.eval_path(t, ["type", "sub+"]).collect()}
    assert out == {("x", "b"), ("x", "c"), ("y", "c")}
    # inverse: ^type from a class reaches its instances
    inv = {(r["src"], r["dst"])
           for r in query.eval_path(t, ["^type"]).collect()}
    assert inv == {("a", "x"), ("b", "y")}


def test_eval_path_alternation_and_diamond_dedup(spark):
    from orionbelt_ontology_builder_spark.operators import query

    t = _triples(spark, [
        ("s", "p", "m1"), ("s", "q", "m2"),
        ("m1", "r", "d"), ("m2", "r", "d"),  # diamond onto d
    ])
    out = query.eval_path(t, [["p", "q"], "r"]).collect()
    # two paths s->d collapse to ONE pair (set semantics)
    assert [(r["src"], r["dst"]) for r in out] == [("s", "d")]


def test_construct_template_vars_and_constants(spark):
    from orionbelt_ontology_builder_spark.operators import query

    t = _triples(spark, [
        ("a", "type", "C"), ("b", "type", "C"),
        ("C", "sub", "S"),
    ])
    out = query.construct(
        t,
        [("?x", "type", "?c"), ("?c", "sub", "?s")],
        [("?x", "deepType", "?s", "uri"),
         ("?s", "hasMember", "?x", "uri")],
    ).collect()
    got = {(r["subj"], r["pred"], r["obj"]) for r in out}
    assert got == {
        ("a", "deepType", "S"), ("b", "deepType", "S"),
        ("S", "hasMember", "a"), ("S", "hasMember", "b"),
    }
    assert all(r["obj_kind"] == "uri" for r in out)


def test_bgp_optional_keeps_unmatched_with_nulls(spark):
    from orionbelt_ontology_builder_spark.operators import query

    t = _triples(spark, [
        ("a", "type", "T"), ("b", "type", "T"),
        ("a", "seg", "S1"),
    ])
    out = {r["x"]: r for r in query.match_bgp(
        t, [("?x", "type", "T")],
        optional=[[("?x", "seg", "?s")]],
    ).collect()}
    assert out["a"]["s"] == "S1"
    assert out["b"]["s"] is None


def test_bgp_filter_applies_after_optional(spark):
    from orionbelt_ontology_builder_spark.operators import query

    t = _triples(spark, [
        ("a", "type", "T"), ("b", "type", "T"), ("c", "type", "T"),
        ("a", "seg", "KEEP"), ("c", "seg", "DROP"),
    ])
    out = query.match_bgp(
        t, [("?x", "type", "T")],
        optional=[[("?x", "seg", "?s")]],
        filters=["s IS NULL OR s = 'KEEP'"],
    ).collect()
    assert sorted(r["x"] for r in out) == ["a", "b"]


def test_construct_delta_seminaive_law(spark):
    """construct(old + delta) == construct(old) UNION
    construct_delta(old + delta, delta)."""
    from orionbelt_ontology_builder_spark.operators import query

    old_rows = [
        ("a", "type", "C"), ("C", "sub", "S"),
        ("b", "type", "D"), ("D", "sub", "S"),
    ]
    delta_rows = [("c", "type", "C"), ("D", "sub", "S2")]
    old = _triples(spark, old_rows)
    full = _triples(spark, old_rows + delta_rows)
    delta = _triples(spark, delta_rows)
    pats = [("?x", "type", "?c"), ("?c", "sub", "?s")]
    tmpl = [("?x", "deep", "?s", "uri")]

    def rows(df):
        return {(r["subj"], r["pred"], r["obj"]) for r in df.collect()}

    got = rows(query.construct(old, pats, tmpl)) | rows(
        query.construct_delta(full, delta, pats, tmpl)
    )
    want = rows(query.construct(full, pats, tmpl))
    assert got == want
    # and the delta result alone contains the delta-anchored conclusions
    d = rows(query.construct_delta(full, delta, pats, tmpl))
    assert ("c", "deep", "S") in d          # new instance
    assert ("b", "deep", "S2") in d         # new superclass edge
    assert ("a", "deep", "S") not in d      # untouched old conclusion


def test_bgp_minus_removes_compatible_bindings(spark):
    from orionbelt_ontology_builder_spark.operators import query

    t = _triples(spark, [
        ("a", "type", "T"), ("b", "type", "T"), ("c", "type", "T"),
        ("a", "seg", "S1"), ("c", "seg", "S2"),
    ])
    out = query.match_bgp(
        t, [("?x", "type", "T")],
        minus=[[("?x", "seg", "?s")]],
    ).collect()
    # a and c have a seg edge -> removed; only b survives
    assert [r["x"] for r in out] == ["b"]
    # minus-group-only vars never surface as output columns
    assert out[0].asDict().keys() == {"x"}


def test_bgp_minus_requires_shared_var(spark):
    import pytest as _pytest

    from orionbelt_ontology_builder_spark.operators import query

    t = _triples(spark, [("a", "type", "T"), ("u", "q", "v")])
    with _pytest.raises(ValueError):
        query.match_bgp(
            t, [("?x", "type", "T")], minus=[[("?y", "q", "?z")]]
        ).collect()


def test_select_agg_group_by_and_having(spark):
    from orionbelt_ontology_builder_spark.operators import query

    t = _triples(spark, [
        ("a", "type", "C"), ("b", "type", "C"), ("c", "type", "D"),
    ])
    out = query.select_agg(
        t, [("?x", "type", "?c")],
        group_by=["c"],
        aggs={"n": "count(*)", "first_x": "min(x)"},
    ).collect()
    got = {r["c"]: (r["n"], r["first_x"]) for r in out}
    assert got == {"C": (2, "a"), "D": (1, "c")}
    # HAVING prunes the grouped result
    kept = query.select_agg(
        t, [("?x", "type", "?c")],
        group_by=["c"],
        aggs={"n": "count(*)"},
        having="n >= 2",
    ).collect()
    assert [(r["c"], r["n"]) for r in kept] == [("C", 2)]


def test_select_agg_counts_distinct_binding_set(spark):
    from orionbelt_ontology_builder_spark.operators import query

    # duplicate triples in the store must not inflate aggregates:
    # aggregation is defined over the DISTINCT binding set.
    t = _triples(spark, [
        ("a", "type", "C"), ("a", "type", "C"),
    ])
    out = query.select_agg(
        t, [("?x", "type", "?c")], group_by=["c"], aggs={"n": "count(*)"}
    ).collect()
    assert [(r["c"], r["n"]) for r in out] == [("C", 1)]


def test_bgp_values_restricts_and_limit_truncates(spark):
    from orionbelt_ontology_builder_spark.operators import query

    t = _triples(spark, [
        ("a", "type", "C"), ("b", "type", "D"), ("c", "type", "E"),
    ])
    out = query.match_bgp(
        t, [("?x", "type", "?c")],
        values=(["c"], [("C",), ("D",)]),
    ).collect()
    assert sorted((r["c"], r["x"]) for r in out) == [("C", "a"), ("D", "b")]
    # LIMIT under the total (c, x) order
    lim = query.match_bgp(
        t, [("?x", "type", "?c")], limit=2
    ).collect()
    assert [(r["c"], r["x"]) for r in lim] == [("C", "a"), ("D", "b")]


def test_bgp_values_can_introduce_new_vars(spark):
    from orionbelt_ontology_builder_spark.operators import query

    t = _triples(spark, [("a", "type", "C"), ("b", "type", "D")])
    out = query.match_bgp(
        t, [("?x", "type", "?c")],
        values=(["c", "tag"], [("C", "keep"), ("D", "drop")]),
    ).collect()
    got = {(r["c"], r["tag"]) for r in out}
    assert got == {("C", "keep"), ("D", "drop")}


def test_eval_path_star_and_opt(spark):
    from orionbelt_ontology_builder_spark.operators import query

    t = _triples(spark, [
        ("a", "sub", "b"), ("b", "sub", "c"),
        ("x", "type", "a"),
    ])
    # sub* from a class: itself + all ancestors
    star = {(r["src"], r["dst"])
            for r in query.eval_path(t, ["type", "sub*"]).collect()}
    assert star == {("x", "a"), ("x", "b"), ("x", "c")}
    # sub? : zero or one hop only
    opt = {(r["src"], r["dst"])
           for r in query.eval_path(t, ["type", "sub?"]).collect()}
    assert opt == {("x", "a"), ("x", "b")}


def test_ask_true_false_and_describe(spark):
    from orionbelt_ontology_builder_spark.operators import query

    t = _triples(spark, [
        ("a", "type", "T"), ("a", "seg", "S1"), ("b", "likes", "a"),
    ])
    assert query.ask(t, [("?x", "seg", "?s")]).collect()[0]["exists_flag"] == 1
    assert query.ask(t, [("?x", "seg", "NOPE")]).collect()[0]["exists_flag"] == 0
    d = {(r["subj"], r["pred"], r["obj"])
         for r in query.describe(t, "a").collect()}
    assert d == {("a", "type", "T"), ("a", "seg", "S1"), ("b", "likes", "a")}


def test_skew_report_hot_key_math(spark):
    """One hot key (70 rows) among 10 cold ones (3 each): share, skew
    factor and exact ceil-div salt fan-out all check out by hand."""
    from orionbelt_ontology_builder_spark.operators import profiling as P

    rows = [("hot",)] * 70 + [(f"cold{i}",) for i in range(10) for _ in range(3)]
    df = spark.createDataFrame(rows, "k string")
    out = P.skew_report(df, key="k", k=3, target_rows=25).collect()
    assert [r["key"] for r in out] == ["hot", "cold0", "cold1"]
    hot = out[0]
    assert hot["key_rows"] == 70 and hot["total_rows"] == 100
    assert hot["n_keys"] == 11
    assert abs(hot["share"] - 0.70) < 1e-12
    assert abs(hot["skew_factor"] - 70 * 11 / 100) < 1e-12
    assert hot["recommended_salt"] == 3          # ceil(70/25)
    assert out[1]["recommended_salt"] == 1       # ceil(3/25)


def test_skew_report_uniform_keys_skew_one(spark):
    from orionbelt_ontology_builder_spark.operators import profiling as P

    rows = [(f"k{i}",) for i in range(8) for _ in range(4)]
    df = spark.createDataFrame(rows, "k string")
    out = P.skew_report(df, key="k", k=8).collect()
    assert len(out) == 8
    for r in out:
        assert abs(r["skew_factor"] - 1.0) < 1e-12


def test_bgp_order_by_offset_limit_pagination(spark):
    """Pages tile the ordered solution set: DESC key honored, OFFSET
    skips, pages are disjoint and cover."""
    from orionbelt_ontology_builder_spark.operators import query

    t = _triples(spark, [(f"s{i:02d}", "p", f"o{i % 3}") for i in range(9)])
    full = query.match_bgp(t, [("?x", "p", "?y")], order_by=["-y"]).collect()
    assert [r["y"] for r in full] == sorted(
        [r["y"] for r in full], reverse=True
    )
    # within equal y the remaining var ascends (total order)
    ys = {}
    for r in full:
        ys.setdefault(r["y"], []).append(r["x"])
    for xs in ys.values():
        assert xs == sorted(xs)
    p1 = query.match_bgp(t, [("?x", "p", "?y")], order_by=["-y"],
                         limit=4).collect()
    p2 = query.match_bgp(t, [("?x", "p", "?y")], order_by=["-y"],
                         offset=4, limit=4).collect()
    p3 = query.match_bgp(t, [("?x", "p", "?y")], order_by=["-y"],
                         offset=8).collect()
    assert p1 + p2 + p3 == full


def test_path_negated_property_set(spark):
    from orionbelt_ontology_builder_spark.operators import query

    t = _triples(spark, [
        ("a", "type", "C"),
        ("a", "label", "A"),
        ("a", "rel", "b"),
        ("a", "other", "c"),
    ])
    out = {(r["src"], r["dst"])
           for r in query.eval_path(t, ["!type|label"]).collect()}
    assert out == {("a", "b"), ("a", "c")}


def test_join_size_estimate_exact_math(spark):
    """3 orders x skewed lineitems: join_rows, hottest key and
    expansion all check out by hand; unmatched keys counted."""
    from orionbelt_ontology_builder_spark.operators import profiling as P

    a = spark.createDataFrame([(1,), (2,), (3,), (4,)], "k long")
    b = spark.createDataFrame(
        [(1,)] * 5 + [(2,)] * 2 + [(9,)] * 3, "k long"
    )
    out = P.join_size_estimate(a, b, key_a="k").collect()[0]
    assert out["rows_a"] == 4 and out["rows_b"] == 10
    assert out["keys_a"] == 4 and out["keys_b"] == 3
    assert out["matching_keys"] == 2
    assert out["join_rows"] == 7           # 1*5 + 1*2
    assert out["max_key_join_rows"] == 5
    assert abs(out["expansion"] - 7 / 4) < 1e-12


def test_join_size_estimate_matches_actual_join(spark):
    from orionbelt_ontology_builder_spark.operators import profiling as P

    a = spark.createDataFrame([(i % 5, i) for i in range(37)], "k long, x long")
    b = spark.createDataFrame([(i % 7, i) for i in range(23)], "k long, y long")
    est = P.join_size_estimate(a, b, key_a="k").collect()[0]
    assert est["join_rows"] == a.join(b, "k").count()


def test_quality_expectations_counts(spark):
    from orionbelt_ontology_builder_spark.operators import profiling as P

    df = spark.createDataFrame(
        [(1, "a", 5), (2, "a", -1), (2, "zz", 0), (None, "b", 3)],
        "id long, cat string, v long",
    )
    rules = [
        {"rule": "not_null", "column": "id"},
        {"rule": "unique", "column": "id"},
        {"rule": "accepted_values", "column": "cat", "values": ["a", "b"]},
        {"rule": "non_negative", "column": "v"},
    ]
    out = {(r["rule"], r["column"]): r
           for r in P.quality_expectations(df, rules).collect()}
    assert out[("not_null", "id")]["violations"] == 1
    assert out[("unique", "id")]["violations"] == 1      # one extra '2'
    assert out[("accepted_values", "cat")]["violations"] == 1
    assert out[("non_negative", "v")]["violations"] == 1
    assert not any(r["passed"] for r in out.values())


def test_expect_fk_orphans(spark):
    from orionbelt_ontology_builder_spark.operators import profiling as P

    child = spark.createDataFrame([(1,), (2,), (9,), (None,)], "k long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "p long")
    out = P.expect_fk(child, parent, key_c="k", key_p="p").collect()[0]
    assert out["violations"] == 1 and not out["passed"]


def test_path_bounded_repetition(spark):
    """chain a->b->c->d: p{2} = 2-hop pairs; p{1,2} = union; p{0,1}
    includes the identity."""
    from orionbelt_ontology_builder_spark.operators import query

    t = _triples(spark, [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d")])
    two = {(r["src"], r["dst"]) for r in query.eval_path(t, ["p{2}"]).collect()}
    assert two == {("a", "c"), ("b", "d")}
    onetwo = {(r["src"], r["dst"])
              for r in query.eval_path(t, ["p{1,2}"]).collect()}
    assert onetwo == {("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("b", "d")}
    zeroone = {(r["src"], r["dst"])
               for r in query.eval_path(t, ["p{0,1}"]).collect()}
    assert {("a", "a"), ("b", "b"), ("c", "c"), ("d", "d")} <= zeroone
    assert ("a", "b") in zeroone and ("a", "c") not in zeroone


def test_fs_weights_hand_math(spark):
    import math

    # 2 matches, 2 non-matches; field f agrees on both matches and one
    # non-match: m = (2+1)/(2+2) = 0.75, u = (1+1)/(2+2) = 0.5
    pairs = spark.createDataFrame(
        [(1, 1, 1, 1), (2, 2, 1, 1), (1, 2, 0, 1), (2, 1, 0, 0)],
        "id_a long, id_b long, is_match int, f int",
    )
    rows = align.fs_weights(pairs, ["f"]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["field"] == "f"
    assert math.isclose(r["m_prob"], 0.75)
    assert math.isclose(r["u_prob"], 0.5)
    assert math.isclose(r["w_agree"], math.log(0.75 / 0.5), rel_tol=1e-12)
    assert math.isclose(
        r["w_disagree"], math.log(0.25 / 0.5), rel_tol=1e-12
    )


def test_fs_scores_separate_matches(spark):
    import duckdb

    # matches agree on both fields, non-matches mostly disagree: the
    # FS score must rank every match above every non-match
    data = [
        (1, 1, 1, 1, 1), (2, 2, 1, 1, 1), (3, 3, 1, 1, 0),
        (1, 2, 0, 0, 0), (1, 3, 0, 0, 1), (2, 3, 0, 0, 0),
    ]
    pairs = spark.createDataFrame(
        data, "id_a long, id_b long, is_match int, f1 int, f2 int"
    )
    got = align.fs_pair_scores(pairs, ["f1", "f2"]).collect()
    match_scores = [r["score"] for r in got if r["is_match"] == 1]
    non_scores = [r["score"] for r in got if r["is_match"] == 0]
    assert min(match_scores) > max(non_scores)

    vals = ",".join(str(t) for t in data)
    sql = align.fs_pair_scores_sql(
        f"pairs(id_a, id_b, is_match, f1, f2) AS (VALUES {vals})",
        ["f1", "f2"],
    )
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    con.close()
    assert sorted(
        (r["id_a"], r["id_b"], r["is_match"], r["n_agree"], r["score"])
        for r in got
    ) == want


def test_cohens_kappa_hand_math(spark):
    # 4 items, 3 agree; marginals a: x2/y2, b: x1/y3
    # po = .75, pe = (2*1 + 2*3)/16 = .5, kappa = .5
    preds = spark.createDataFrame(
        [(1, "x", "x"), (2, "x", "y"), (3, "y", "y"), (4, "y", "y")],
        "item long, pred_a string, pred_b string",
    )
    r = P.cohens_kappa(preds).collect()[0]
    assert (r["n_items"], r["po"], r["pe"], r["kappa"]) == (4, 0.75, 0.5, 0.5)


def test_cohens_kappa_perfect_and_chance(spark):
    perfect = spark.createDataFrame(
        [(i, "x" if i % 2 else "y", "x" if i % 2 else "y")
         for i in range(10)],
        "item long, pred_a string, pred_b string",
    )
    assert P.cohens_kappa(perfect).collect()[0]["kappa"] == 1.0


def test_score_calibration_bins_and_ece(spark):
    import math

    scored = spark.createDataFrame(
        [(0.1, 0), (0.2, 0), (0.9, 1), (0.85, 1), (0.95, 0), (1.0, 1)],
        "score double, label int",
    )
    got = {r["bin"]: r for r in
           P.score_calibration(scored, n_bins=4).collect()}
    assert set(got) == {0, 3}          # score 1.0 clamps into bin 3
    assert got[0]["n"] == 2 and got[0]["frac_pos"] == 0.0
    assert got[3]["n"] == 4 and got[3]["frac_pos"] == 0.75
    assert math.isclose(got[3]["mean_score"], 0.925)
    ece = sum(r["ece_contrib"] for r in got.values())
    assert math.isclose(ece, (2 / 6) * 0.15 + (4 / 6) * 0.175)


def test_golden_records_survivorship(spark):
    # latest non-null wins per field: old populated beats newer NULL
    recs = spark.createDataFrame(
        [
            (1, 10, 1, "alice", 100.0),
            (2, 10, 2, None, 200.0),
            (3, 10, 3, "ALICE", None),
            (4, 20, 1, "bob", None),
        ],
        "rec_id long, cluster_id long, ts long, name string, bal double",
    )
    got = {r["cluster_id"]: r for r in
           align.golden_records(recs, ["name", "bal"]).collect()}
    assert got[10]["name"] == "ALICE"      # ts=3 beats ts=1
    assert got[10]["bal"] == 200.0         # ts=2 beats ts=1; ts=3 is NULL
    assert got[10]["n_records"] == 3
    assert got[20]["name"] == "bob" and got[20]["bal"] is None

    import duckdb

    sql = align.golden_records_sql(
        """records AS (SELECT * FROM (VALUES
  (1, 10, 1, 'alice', 100.0::DOUBLE),
  (2, 10, 2, NULL, 200.0::DOUBLE),
  (3, 10, 3, 'ALICE', NULL),
  (4, 20, 1, 'bob', NULL)) t(rec_id, cluster_id, ts, name, bal))""",
        ["name", "bal"],
    )
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    con.close()
    assert sorted(
        (r["cluster_id"], r["n_records"], r["name"], r["bal"])
        for r in align.golden_records(recs, ["name", "bal"]).collect()
    ) == want


def test_join_advisor_decisions(spark):
    # tiny dim side -> broadcast_b; skewed key -> salt_hot_keys
    a = spark.createDataFrame(
        [(i % 3, i) for i in range(300)], "k long, pay long"
    )
    b_small = spark.createDataFrame([(0, "x"), (1, "y")], "k long, v string")
    r = P.join_strategy_advisor(
        a, b_small, key_a="k", broadcast_rows=10, shuffle_partitions=4
    ).collect()[0]
    assert r["decision"] == "broadcast_b" and r["salt_n"] == 1

    # one hot key dominating: 1000x vs others, tiny broadcast budget
    hot = spark.createDataFrame(
        [(0, i) for i in range(1000)] + [(j, 0) for j in range(1, 20)],
        "k long, pay long",
    )
    r2 = P.join_strategy_advisor(
        hot, hot, key_a="k", broadcast_rows=1, shuffle_partitions=8,
    ).collect()[0]
    assert r2["decision"] == "salt_hot_keys" and r2["salt_n"] > 1


def test_source_robust_quality_trims_outliers(spark):
    from orionbelt_ontology_builder_spark.datapipe import textstats as TS

    # 10 docs: 8 at 100 chars, one stub (1), one megapage (10000);
    # 10% symmetric trim drops exactly those two
    docs = spark.createDataFrame(
        [(i, "s", 100) for i in range(8)]
        + [(8, "s", 1), (9, "s", 10000)],
        "doc_id long, source string, n_chars long",
    )
    r = TS.source_robust_quality(docs, trim_frac=0.1).collect()[0]
    assert r["trimmed_mean_chars"] == 100.0
    assert r["mean_chars"] == (800 + 1 + 10000) / 10.0


# ------------------------------------------------------------------ #
# functional-dependency discovery
# ------------------------------------------------------------------ #


def test_fd_discovery_holds_violations_and_nulls(spark):
    """id is a key (id -> everything holds); b -> a is violated by the
    'x' group AND the NULL group (NULL is a regular value: two b-NULL
    rows with different a); b -> c is violated only by 'x'."""
    from orionbelt_ontology_builder_spark.operators import profiling as P

    df = spark.createDataFrame(
        [
            (1, "x", 10),
            (2, "x", 20),
            (3, "y", 10),
            (4, None, 30),
            (5, None, 30),
        ],
        "id int, b string, c int",
    )
    got = {
        (r["determinant"], r["dependent"]): r
        for r in P.fd_discovery(df, ["id", "b", "c"]).collect()
    }
    assert got[("id", "b")]["holds"] and got[("id", "c")]["holds"]
    r_ba = got[("b", "id")]
    assert not r_ba["holds"]
    assert r_ba["n_groups"] == 3  # x, y, NULL
    assert r_ba["n_violating_groups"] == 2  # x {1,2}, NULL {4,5}
    r_bc = got[("b", "c")]
    assert not r_bc["holds"] and r_bc["n_violating_groups"] == 1
    # c -> b: 10 -> {x, y} violates; 20 -> {x} ok; 30 -> {NULL} ok
    assert got[("c", "b")]["n_violating_groups"] == 1


def test_fd_discovery_matches_sql_twin(spark):
    import duckdb

    from orionbelt_ontology_builder_spark.operators import profiling as P

    rows = [(1, "x", 10), (2, "x", 20), (3, "y", 10), (4, None, 30)]
    df = spark.createDataFrame(rows, "id int, b string, c int")
    got = sorted(tuple(r) for r in P.fd_discovery(df, ["id", "b", "c"]).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INT, b VARCHAR, c INT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r) for r in con.execute(
            P.fd_discovery_sql("t", ["id", "b", "c"])
        ).fetchall()
    )
    assert got == want


# ------------------------------------------------------------------ #
# PARIS-style instance alignment + property alignment (operators/align.py)
# ------------------------------------------------------------------ #


def test_paris_unique_shared_fact_is_near_proof(spark):
    a = align.paris_fixture_df(spark, "a")
    b = align.paris_fixture_df(spark, "b")
    out = {(r["uri_a"], r["uri_b"]): r for r in align.paris_matches(a, b).collect()}
    A, B = "http://a.example.org/", "http://b.example.org/"
    # unique shared email -> noisy-or saturates to 1 (within %.6g)
    assert out[(A + "alice", B + "alice_smith")]["score"] > 0.999999
    assert out[(A + "bob", B + "robert")]["score"] > 0.999999
    # only low-functionality evidence (city+job) -> moderate score
    carol = out[(A + "carol", B + "carola")]
    assert 0.4 < carol["score"] < 0.8 and carol["shared_facts"] == 3
    # shared rdf:type alone (w = 1/25 per pair) stays under min_score
    assert (A + "dave", B + "eve") not in out


def test_paris_hot_fact_cap_drops_stopword_facts(spark):
    a = align.paris_fixture_df(spark, "a")
    b = align.paris_fixture_df(spark, "b")
    # cap of 0 licensed pairs -> every fact key dropped -> no matches
    assert align.paris_matches(a, b, max_fact_pairs=0).count() == 0


def test_property_alignment_extension_jaccard(spark):
    a = align.propalign_fixture_df(spark, "a")
    b = align.propalign_fixture_df(spark, "b")
    out = {(r["pred_a"], r["pred_b"]): r
           for r in align.property_alignment(a, b).collect()}
    EX, FOAF = "http://schema.test.org/", "http://xmlns.com/foaf/0.1/"
    assert out[(EX + "email", FOAF + "mbox")]["jaccard"] == 1.0
    town = out[(EX + "town", FOAF + "city")]
    assert abs(town["jaccard"] - 0.6) < 1e-12 and town["n_shared"] == 3
    # foaf:nick shares nothing with any A predicate
    assert not any(pb == FOAF + "nick" for _, pb in out)


# ------------------------------------------------------------------ #
# axiom mining: inverse/symmetric + datatype ranges
# ------------------------------------------------------------------ #


def test_suggest_inverse_and_symmetric(spark):
    from orionbelt_ontology_builder_spark import fixtures as FX
    from orionbelt_ontology_builder_spark.operators import profiling

    rows = profiling.suggest_inverse(
        FX.fixture_triples(spark, "invprops_om")
    ).collect()
    got = {(r["pred_a"], r["pred_b"]): r for r in rows}
    B = FX.BASE
    inv = got[(B + "hasChild", B + "hasParent")]
    assert inv["kind"] == "inverse" and inv["n_shared"] == 2
    assert abs(inv["jaccard"] - 2 / 3) < 1e-12
    sym = got[(B + "marriedTo", B + "marriedTo")]
    assert sym["kind"] == "symmetric"
    assert abs(sym["jaccard"] - 0.5) < 1e-12  # boundary: kept at >= 0.5
    # no reverse evidence at all -> absent
    assert not any(B + "likes" in k for pair in got for k in pair)


def test_suggest_ranges_shapes_and_mixed_evidence(spark):
    from orionbelt_ontology_builder_spark.model import t_lit, triples_df
    from orionbelt_ontology_builder_spark.operators import profiling

    rows = []
    for i in range(19):
        rows.append(t_lit(f"s{i}", "p_int", str(i)))
    rows.append(t_lit("s_bad", "p_int", "oops"))      # 19/20 = 0.95 share
    for i in range(4):
        rows.append(t_lit(f"s{i}", "p_mixed", str(i)))
    for i in range(4):
        rows.append(t_lit(f"t{i}", "p_mixed", f"w{i}"))  # 50/50 -> NULL
    rows.append(t_lit("d", "p_date", "2020-01-02"))
    rows.append(t_lit("d2", "p_date", "1999-12-31"))
    out = {r["pred"]: r for r in profiling.suggest_ranges(
        triples_df(spark, rows)
    ).collect()}
    X = "http://www.w3.org/2001/XMLSchema#"
    assert out["p_int"]["suggested_range"] == X + "integer"
    assert abs(out["p_int"]["top_share"] - 0.95) < 1e-12
    assert out["p_mixed"]["suggested_range"] is None
    assert out["p_date"]["suggested_range"] == X + "date"


def test_pr_curve_hand_math(spark):
    from orionbelt_ontology_builder_spark.operators import align

    scored = spark.createDataFrame(
        [
            ("a", "b", 1, 0.9),
            ("c", "d", 0, 0.8),
            ("e", "f", 1, 0.7),
            ("g", "h", 0, 0.1),
        ],
        "id_a string, id_b string, is_match int, score double",
    )
    rows = align.pr_curve(scored).collect()
    assert [r["tp"] for r in rows] == [1, 1, 2, 2]
    assert [r["fp"] for r in rows] == [0, 1, 1, 2]
    assert [r["fn"] for r in rows] == [1, 1, 0, 0]
    assert rows[0]["precision"] == 1.0 and rows[0]["recall"] == 0.5
    assert rows[2]["recall"] == 1.0
    assert abs(rows[2]["f1"] - 2 * 2 / (3 + 2)) < 1e-12


def test_dedupe_entities_within_graph(spark):
    from orionbelt_ontology_builder_spark.operators import align

    merged = align.paris_fixture_df(spark, "a").unionByName(
        align.paris_fixture_df(spark, "b")
    )
    got = {(r["uri_a"], r["uri_b"]) for r in
           align.dedupe_entities(merged).collect()}
    A, B = "http://a.example.org/", "http://b.example.org/"
    # the two unique-evidence pairs survive; ordering canonical
    assert (A + "alice", B + "alice_smith") in got
    assert (A + "bob", B + "robert") in got
    assert all(a < b for a, b in got)


def test_lr_weights_gradient_replay_and_signs(spark):
    import math

    from orionbelt_ontology_builder_spark.operators import align

    rows = [(1, 1, 0), (1, 1, 0), (0, 0, 1), (0, 0, 1), (1, 1, 1), (0, 0, 0)]
    pairs = spark.createDataFrame(rows, "is_match int, agree int, noise int")
    got = {r["param"]: r["weight"] for r in
           align.lr_weights(pairs, ["agree", "noise"], iters=5, lr=0.5).collect()}

    # independent pure-Python replay of the identical full-batch steps
    b, w = 0.0, [0.0, 0.0]
    for _ in range(5):
        gb, g = 0.0, [0.0, 0.0]
        for y, x1, x2 in rows:
            z = b + w[0] * x1 + w[1] * x2
            e = 1.0 / (1.0 + math.exp(-z)) - y
            gb += e
            g[0] += e * x1
            g[1] += e * x2
        n = len(rows)
        b -= 0.5 * gb / n
        w = [w[i] - 0.5 * g[i] / n for i in range(2)]
    assert abs(got["bias"] - b) < 1e-9
    assert abs(got["agree"] - w[0]) < 1e-9
    assert abs(got["noise"] - w[1]) < 1e-9
    # the perfectly-predictive field earns a positive weight; the
    # uninformative one stays near zero relative to it
    assert got["agree"] > 0.3 and abs(got["noise"]) < got["agree"]
