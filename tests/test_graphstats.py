"""Semantic tests for graph analytics (degree / PageRank / triangles)
on hand-built micro-graphs with known answers.  Engine parity is
separately asserted by the driver oracles (`graph_degree_stats`,
`graph_pagerank`, `graph_triangles`)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from orionbelt_ontology_builder_spark.operators import graphstats as G


@pytest.fixture(scope="module")
def star(spark):
    # hub h:0 <- c:1..c:4 (star), plus an isolated-ish chain c:4 -> x:9
    rows = [Row(src=f"c:{i}", dst="h:0") for i in range(1, 5)]
    rows.append(Row(src="c:4", dst="x:9"))
    return spark.createDataFrame(rows).cache()


@pytest.fixture(scope="module")
def triangle(spark):
    # one triangle a-b-c plus a dangling edge c-d
    rows = [Row(src="a", dst="b"), Row(src="b", dst="c"),
            Row(src="c", dst="a"), Row(src="c", dst="d"),
            # duplicate + reversed edges must not double-count
            Row(src="b", dst="a"), Row(src="a", dst="b")]
    return spark.createDataFrame(rows).cache()


def test_degree_stats_star(star):
    out = {r["node_type"]: r for r in G.degree_stats(star).collect()}
    assert out["h"]["n_nodes"] == 1 and out["h"]["max_in"] == 4
    assert out["h"]["max_out"] == 0          # pure sink counted
    assert out["c"]["n_nodes"] == 4
    assert out["c"]["max_out"] == 2          # c:4 has two out-edges
    assert out["x"]["n_nodes"] == 1 and out["x"]["max_in"] == 1


def test_pagerank_mass_conservation_and_hub(star):
    ranks = {r["node"]: r["rank"] for r in G.pagerank(star, iters=8).collect()}
    # total mass stays 1 (dangling redistributed, not lost)
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    # the hub outranks every spoke
    assert all(ranks["h:0"] > v for k, v in ranks.items() if k != "h:0")


def test_pagerank_uniform_on_cycle(spark):
    # directed 4-cycle: symmetric, so rank must stay uniform
    rows = [Row(src=f"v:{i}", dst=f"v:{(i + 1) % 4}") for i in range(4)]
    ranks = [r["rank"] for r in G.pagerank(spark.createDataFrame(rows)).collect()]
    assert max(ranks) - min(ranks) < 1e-12
    assert abs(sum(ranks) - 1.0) < 1e-9


def test_triangle_count_planted(triangle):
    row = G.triangle_count(triangle).collect()[0]
    assert row["n_triangles"] == 1
    assert row["n_edges"] == 4              # dedup + undirected canon
    assert row["n_nodes"] == 4


def test_triangle_count_none(spark):
    rows = [Row(src="a", dst="b"), Row(src="b", dst="c")]
    row = G.triangle_count(spark.createDataFrame(rows)).collect()[0]
    assert row["n_triangles"] == 0


def test_bfs_hops_semantics(spark):
    # a -> b -> c -> d  plus shortcut a -> c, cycle d -> a, island x -> y
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("d", "a"),
         ("x", "y")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["hops"] for r in G.bfs_hops(edges, seeds).collect()}
    # shortcut wins over the 2-hop path; cycle does not inflate hops
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}
    # reverse direction: who reaches a?
    rev = {r["node"]: r["hops"]
           for r in G.bfs_hops(edges, seeds, direction="reverse").collect()}
    assert rev == {"a": 0, "d": 1, "c": 2, "b": 3}
    # undirected reaches the same set here plus nothing from the island
    und = {r["node"]: r["hops"]
           for r in G.bfs_hops(edges, seeds, direction="undirected").collect()}
    assert und == {"a": 0, "b": 1, "c": 1, "d": 1}
    # max_hops truncates
    capped = {r["node"]: r["hops"]
              for r in G.bfs_hops(edges, seeds, max_hops=1).collect()}
    assert capped == {"a": 0, "b": 1, "c": 1}
    # island never appears
    assert "x" not in got and "y" not in got


def test_bfs_hops_matches_recursive_oracle_shape(spark):
    import duckdb

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",), ("d",)], "node string")
    got = sorted(
        (r["node"], r["hops"])
        for r in G.bfs_hops(edges, seeds, max_hops=3).collect()
    )
    cte = ("edges(src, dst) AS (VALUES ('a','b'),('b','c'),('c','a'),"
           "('c','d'),('d','e'))")
    sql = G.bfs_hops_sql(
        cte, "SELECT 'a' AS node UNION SELECT 'd'", max_hops=3
    )
    con = duckdb.connect()
    want = sorted((n, h) for n, h in con.sql(sql).fetchall())
    con.close()
    assert got == want


def test_label_propagation_two_cliques(spark):
    # two 3-cliques joined by one bridge edge: each clique converges to
    # its own max label; the bridge does not bleed labels across.
    clique1 = [("a1", "a2"), ("a2", "a3"), ("a1", "a3")]
    clique2 = [("b1", "b2"), ("b2", "b3"), ("b1", "b3")]
    edges = spark.createDataFrame(
        clique1 + clique2 + [("a3", "b1")], "src string, dst string"
    )
    got = {r["node"]: r["label"]
           for r in G.label_propagation(edges, iters=4).collect()}
    # converged: each clique internally consistent, and the two
    # communities carry distinct labels (the bridge edge does not
    # merge them)
    a_labels = {got["a1"], got["a2"], got["a3"]}
    b_labels = {got["b1"], got["b2"], got["b3"]}
    assert len(a_labels) == 1 and len(b_labels) == 1
    assert a_labels != b_labels


def test_label_propagation_matches_unrolled_oracle(spark):
    import duckdb

    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
            ("e", "f"), ("f", "d")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    got = sorted(
        (r["node"], r["label"])
        for r in G.label_propagation(edges, iters=3).collect()
    )
    vals = ",".join(f"('{s}','{d}')" for s, d in rows)
    sql = G.label_propagation_sql(
        f"edges(src, dst) AS (VALUES {vals})", iters=3
    )
    con = duckdb.connect()
    want = sorted((n, l) for n, l in con.sql(sql).fetchall())
    con.close()
    assert got == want


def test_random_walks_laws(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    out = G.random_walks(edges, walk_len=3, walks_per_node=2).collect()
    by_walk = {}
    for r in out:
        by_walk.setdefault(r["walk_id"], []).append((r["step"], r["node"]))
    # every node with out-edges starts walks_per_node walks
    assert {w.split("#")[0] for w in by_walk} == {"a", "b", "c", "d"}
    assert all(w.split("#")[1] in {"0", "1"} for w in by_walk)
    # steps are contiguous from 0 and every hop is a real edge
    eset = {("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "e")}
    for wid, steps in by_walk.items():
        steps.sort()
        assert [s for s, _ in steps] == list(range(len(steps)))
        assert steps[0][1] == wid.split("#")[0]
        for (s1, n1), (_, n2) in zip(steps, steps[1:]):
            assert (n1, n2) in eset
    # sink 'e' terminates walks early: any walk reaching e ends there
    for wid, steps in by_walk.items():
        nodes = [n for _, n in sorted(steps)]
        if "e" in nodes:
            assert nodes.index("e") == len(nodes) - 1
    # determinism: a rerun is bit-identical
    again = G.random_walks(edges, walk_len=3, walks_per_node=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # a different salt reroutes at least one walk
    other = G.random_walks(edges, walk_len=3, walks_per_node=2, salt="w2")
    assert sorted(map(tuple, out)) != sorted(map(tuple, other.collect()))


def test_random_walks_match_unrolled_oracle(spark):
    import duckdb

    rows = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"),
            ("d", "e"), ("e", "a"), ("b", "d")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    got = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in G.random_walks(edges, walk_len=4, walks_per_node=2).collect()
    )
    vals = ",".join(f"('{s}','{d}')" for s, d in rows)
    sql = G.random_walks_sql(
        f"edges(src, dst) AS (VALUES {vals})", walk_len=4, walks_per_node=2
    )
    con = duckdb.connect()
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    con.close()
    assert got == want


def test_neighbor_jaccard_finds_structural_twins(spark):
    # u and v link the same three neighbours (n1..n3) -> jaccard 1.0;
    # hub h is linked by everyone and must not create wedges.
    rows = (
        [("u", f"n{i}") for i in range(3)]
        + [("v", f"n{i}") for i in range(3)]
        + [("w", "n0")]
        + [(x, "h") for x in ("u", "v", "w", "n0", "n1", "n2")]
    )
    edges = spark.createDataFrame(rows, "src string, dst string")
    out = {(r["node_a"], r["node_b"]): r
           for r in G.neighbor_jaccard(edges, min_shared=1, hub_cap=5,
                                       threshold=0.0).collect()}
    # u,v share n0..n2 but NOT h: the hub is excluded as a wedge
    # center, so shared is 3 (not 4) and jaccard a clean 1.0 over the
    # hub-filtered degree 3 (not 4/4 over raw degree)
    assert out[("u", "v")]["jaccard"] == 1.0
    assert out[("u", "v")]["shared"] == 3
    assert out[("u", "v")]["deg_a"] == 3 and out[("u", "v")]["deg_b"] == 3
    # w shares only n0 with u: jaccard = 1/3 (degrees exclude the hub)
    assert out[("u", "w")]["jaccard"] == 1.0 / 3.0
    # n0,n1 share exactly their non-hub wedges u and v — the hub never
    # contributes to any pair's shared count
    assert out[("n0", "n1")]["shared"] == 2


def test_neighbor_jaccard_matches_sql_twin(spark):
    import duckdb

    rows = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"), ("c", "x"),
            ("c", "z"), ("d", "z")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    got = sorted(
        (r["node_a"], r["node_b"], r["shared"], r["deg_a"], r["deg_b"],
         round(r["jaccard"], 12))
        for r in G.neighbor_jaccard(
            edges, min_shared=1, hub_cap=50, threshold=0.0
        ).collect()
    )
    vals = ",".join(f"('{s}','{d}')" for s, d in rows)
    sql = G.neighbor_jaccard_sql(
        f"edges(src, dst) AS (VALUES {vals})",
        min_shared=1, hub_cap=50, threshold=0.0,
    )
    con = duckdb.connect()
    want = sorted(
        (a, b, s, da, db, round(j, 12))
        for a, b, s, da, db, j in con.sql(sql).fetchall()
    )
    con.close()
    assert got == want


def test_walk_skipgrams_window_law(spark):
    walks = spark.createDataFrame(
        [("w", 0, "a"), ("w", 1, "b"), ("w", 2, "c"), ("w", 3, "d"),
         ("v", 0, "a"), ("v", 1, "b")],
        "walk_id string, step int, node string",
    )
    out = {(r["center"], r["context"]): r["n_pairs"]
           for r in G.walk_skipgrams(walks, window=2).collect()}
    # symmetric: (a,b) appears in both walks -> 2; (b,a) likewise
    assert out[("a", "b")] == 2 and out[("b", "a")] == 2
    # distance 2 pairs included, distance 3 excluded
    assert out[("a", "c")] == 1
    assert ("a", "d") not in out
    # no self pairs, no cross-walk pairs
    assert all(c != x for c, x in out)


def test_walk_skipgrams_match_sql_twin(spark):
    import duckdb

    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    walks = G.random_walks(edges, walk_len=3, walks_per_node=2)
    got = sorted(
        (r["center"], r["context"], r["n_pairs"])
        for r in G.walk_skipgrams(walks, window=2).collect()
    )
    vals = ",".join(f"('{s}','{d}')" for s, d in rows)
    sql = G.walk_skipgrams_sql(
        G.random_walks_sql(
            f"edges(src, dst) AS (VALUES {vals})", walk_len=3, walks_per_node=2
        ),
        window=2,
    )
    con = duckdb.connect()
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    con.close()
    assert got == want


def test_kcore_peels_tree_keeps_clique(spark):
    # triangle a-b-c (2-core) with a pendant path c-d-e (peeled)
    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    out = {r["node"]: r["deg"] for r in G.kcore(edges, k=2, rounds=4).collect()}
    assert out == {"a": 2, "b": 2, "c": 2}
    # k above the max clique degree empties the core
    assert G.kcore(edges, k=3, rounds=4).count() == 0


def test_kcore_converges_inside_cap(spark):
    # chain of 6 peels one node per round only from the ends -> needs
    # 3 rounds to die; rounds=4 vs rounds=5 must agree (fixture
    # converges inside the cap, the unrolled-oracle precondition)
    rows = [(f"n{i}", f"n{i+1}") for i in range(6)]
    rows += [("a", "b"), ("b", "c"), ("c", "a")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    r4 = sorted(map(tuple, G.kcore(edges, k=2, rounds=4).collect()))
    r5 = sorted(map(tuple, G.kcore(edges, k=2, rounds=5).collect()))
    assert r4 == r5 == [("a", 2), ("b", 2), ("c", 2)]


def test_kcore_matches_sql_twin(spark):
    import duckdb

    # two triangles sharing node c, plus pendant noise and a
    # duplicate/reversed edge that the simple-graph canon must absorb
    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
            ("e", "c"), ("e", "f"), ("b", "a"), ("a", "b")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    got = sorted(map(tuple, G.kcore(edges, k=2, rounds=4).collect()))
    vals = ",".join(f"('{s}','{d}')" for s, d in rows)
    sql = G.kcore_sql(f"edges(src, dst) AS (VALUES {vals})", k=2, rounds=4)
    con = duckdb.connect()
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    con.close()
    assert got == want


def test_triangle_count_orientation_invariant(spark):
    # hub star + two planted triangles through the hub: degree-ordered
    # and id-ordered orientations must agree on every count
    rows = [("h", f"s{i}") for i in range(6)]
    rows += [("s0", "s1"), ("s2", "s3")]          # close 2 hub triangles
    edges = spark.createDataFrame(rows, "src string, dst string")
    a = G.triangle_count(edges, degree_ordered=True).collect()[0]
    b = G.triangle_count(edges, degree_ordered=False).collect()[0]
    assert a == b
    assert a["n_triangles"] == 2 and a["n_edges"] == 8 and a["n_nodes"] == 7


def test_hits_hub_authority_separation(spark):
    # 'a' points at everything (pure hub); 'c' is pointed at by all
    # (pure authority); scores L1-normalize to 1 on each side
    rows = [("a", "b"), ("a", "c"), ("b", "c")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    out = {r["node"]: r for r in G.hits(edges, iters=4).collect()}
    assert out["a"]["auth"] == 0.0 and out["c"]["hub"] == 0.0
    assert out["a"]["hub"] > out["b"]["hub"] > 0
    assert out["c"]["auth"] > out["b"]["auth"] > 0
    assert abs(sum(r["hub"] for r in out.values()) - 1.0) < 1e-9
    assert abs(sum(r["auth"] for r in out.values()) - 1.0) < 1e-9


def test_hits_matches_sql_twin(spark):
    import duckdb

    rows = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "a")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    got = sorted(
        (r["node"], round(r["hub"], 10), round(r["auth"], 10))
        for r in G.hits(edges, iters=3).collect()
    )
    vals = ",".join(f"('{s}','{d}')" for s, d in rows)
    con = duckdb.connect()
    want = sorted(
        (n, round(h, 10), round(a, 10))
        for n, h, a in con.sql(
            G.hits_sql(f"edges(src, dst) AS (VALUES {vals})", iters=3)
        ).fetchall()
    )
    con.close()
    assert got == want


def test_component_size_dist(spark):
    # chain of 3 + pair + self-loop singleton -> sizes {3:1, 2:1, 1:1}
    rows = [("e1", "e2"), ("e2", "e3"), ("f1", "f2"), ("g1", "g1")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    out = {r["csize"]: r["n_components"]
           for r in G.component_size_dist(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1}


def test_component_size_dist_matches_sql_twin(spark):
    import duckdb

    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "e"),
            ("f", "f"), ("g", "h"), ("h", "i"), ("j", "k")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    got = sorted(map(tuple, G.component_size_dist(edges).collect()))
    vals = ",".join(f"('{s}','{d}')" for s, d in rows)
    con = duckdb.connect()
    want = sorted(map(tuple, con.sql(
        G.component_size_dist_sql(f"edges(src, dst) AS (VALUES {vals})")
    ).fetchall()))
    con.close()
    assert got == want


# ------------------------------------------------------------------ #
# Strongly connected components (color-propagation peel)
# ------------------------------------------------------------------ #


def _scc_map(spark, rows):
    edges = spark.createDataFrame(rows, "src string, dst string")
    return {r["node"]: r["scc_id"] for r in G.scc(edges).collect()}


def test_scc_two_cycles_and_bridge(spark):
    # cycle {a,b,c}, cycle {x,y}, one-way bridge c -> x: two SCCs,
    # NOT merged (an undirected CC would glue all five).
    out = _scc_map(spark, [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("x", "y"), ("y", "x"), ("c", "x"),
    ])
    assert out == {"a": "c", "b": "c", "c": "c", "x": "y", "y": "y"}


def test_scc_dag_all_singletons(spark):
    out = _scc_map(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    assert out == {k: k for k in "abcd"}


def test_scc_self_loop_and_isolated_sink(spark):
    out = _scc_map(spark, [("s", "s"), ("s", "t")])
    assert out == {"s": "s", "t": "t"}


def test_scc_nested_defer_chain(spark):
    # big-id cycle {p,q} floods into small-id cycle {a,b} which floods
    # into {m,n}: forces multiple outer peel rounds (defer chain).
    out = _scc_map(spark, [
        ("p", "q"), ("q", "p"), ("p", "a"),
        ("a", "b"), ("b", "a"), ("b", "m"),
        ("m", "n"), ("n", "m"),
    ])
    assert out == {"p": "q", "q": "q", "a": "b", "b": "b",
                   "m": "n", "n": "n"}


def test_scc_figure_eight_shares_node(spark):
    # two cycles sharing node b are ONE SCC of size 5
    out = _scc_map(spark, [
        ("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"), ("d", "b"),
        ("d", "e"),
    ])
    assert out == {"a": "d", "b": "d", "c": "d", "d": "d", "e": "e"}


def _scc_reference(edges):
    """Exact SCC via transitive closure (python reference)."""
    nodes = sorted({x for e in edges for x in e})
    adj = {n: set() for n in nodes}
    for s, d in edges:
        adj[s].add(d)
    reach = {}
    for n in nodes:
        seen, stack = {n}, [n]
        while stack:
            for m in adj[stack.pop()]:
                if m not in seen:
                    seen.add(m)
                    stack.append(m)
        reach[n] = seen
    return {
        n: max(m for m in reach[n] if n in reach[m]) for n in nodes
    }


def test_scc_random_graphs_match_reference(spark):
    """Property check: the coloring peel equals exact closure SCC on
    random digraphs (self-loops, parallel intent, multi-SCC chains)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    nodes = [f"n{i:02d}" for i in range(8)]
    edge = st.tuples(st.sampled_from(nodes), st.sampled_from(nodes))

    @settings(max_examples=12, deadline=None)
    @given(st.lists(edge, min_size=1, max_size=18))
    def run(edges):
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: r["scc_id"] for r in G.scc(df).collect()}
        assert got == _scc_reference(edges)

    run()


def test_modularity_two_triangles(spark):
    import duckdb
    import math

    # two triangles joined by one bridge: textbook Q = 2*(3/7 - (7/14)^2)
    rows = [("a", "b"), ("b", "c"), ("a", "c"),
            ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    got = G.modularity(edges, iters=3).collect()
    assert len(got) == 2
    for r in got:
        assert r["n_nodes"] == 3
        assert r["intra_edges"] == 3
        assert r["degree_sum"] == 7
    q = sum(r["q_contrib"] for r in got)
    assert math.isclose(q, 2 * (3 / 7 - (7 / 14) ** 2), rel_tol=1e-12)

    vals = ",".join(f"('{s}','{d}')" for s, d in rows)
    sql = G.modularity_sql(f"edges(src, dst) AS (VALUES {vals})", iters=3)
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    con.close()
    assert sorted(
        (r["label"], r["n_nodes"], r["degree_sum"], r["intra_edges"],
         r["q_contrib"])
        for r in got
    ) == want


def test_modularity_single_community_near_zero(spark):
    # one clique = one community: Q = e/m - (2m/2m)^2 = 1 - 1 = 0
    rows = [("a", "b"), ("b", "c"), ("a", "c")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    got = G.modularity(edges, iters=3).collect()
    assert len(got) == 1
    assert abs(got[0]["q_contrib"]) < 1e-12


def test_harmonic_centrality_path_hand_math(spark):
    import math

    # path a-b-c-d, seeds {a, d}: hc(b) = 1/1 + 1/2 = 1.5,
    # hc(a) = hc(d) = 1/3 (the far seed), seeds exclude themselves
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",), ("d",)], "node string")
    got = {r["node"]: (r["n_sources"], r["harmonic"])
           for r in G.harmonic_centrality(edges, seeds, max_hops=3).collect()}
    assert got["b"] == (2, 1.5) and got["c"] == (2, 1.5)
    assert got["a"][0] == 1 and math.isclose(got["a"][1], 1 / 3)
    assert got["d"][0] == 1 and math.isclose(got["d"][1], 1 / 3)


def test_harmonic_centrality_matches_oracle(spark):
    import duckdb

    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("e",)], "node string")
    got = sorted(
        (r["node"], r["n_sources"], r["harmonic"])
        for r in G.harmonic_centrality(edges, seeds, max_hops=4).collect()
    )
    vals = ",".join(f"('{s}','{d}')" for s, d in rows)
    sql = G.harmonic_centrality_sql(
        f"edges(src, dst) AS (VALUES {vals})",
        "SELECT 'a' AS node UNION SELECT 'e'",
        max_hops=4,
    )
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    con.close()
    assert got == want


def test_bfs_hops_sql_undirected_regression(spark):
    # regression: the undirected recursive step used to reference the
    # recursive CTE twice (DuckDB binder error); em is doubled instead
    import duckdb

    rows = [("a", "b"), ("b", "c")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    seeds = spark.createDataFrame([("c",)], "node string")
    got = sorted(
        (r["node"], r["hops"])
        for r in G.bfs_hops(edges, seeds, max_hops=3,
                            direction="undirected").collect()
    )
    sql = G.bfs_hops_sql(
        "edges(src, dst) AS (VALUES ('a','b'),('b','c'))",
        "SELECT 'c' AS node", max_hops=3, direction="undirected",
    )
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    con.close()
    assert got == want == [("a", 2), ("b", 1), ("c", 0)]


def test_ktruss_k4_keeps_k4_drops_pendant(spark):
    # K4 + pendant: every K4 edge sits in 2 triangles (>= k-2 = 2),
    # the pendant edge sits in none
    rows = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
            ("c", "d"), ("d", "e")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    got = sorted((r["a"], r["b"], r["support"])
                 for r in G.ktruss(edges, k=4, rounds=3).collect())
    assert got == [("a", "b", 2), ("a", "c", 2), ("a", "d", 2),
                   ("b", "c", 2), ("b", "d", 2), ("c", "d", 2)]


def test_ktruss_peel_cascades_and_matches_oracle(spark):
    import duckdb

    # triangle with a tail triangle sharing one vertex: k=4 kills
    # everything (no edge reaches 2 triangles after the first peel)
    rows = [("a", "b"), ("b", "c"), ("a", "c"),
            ("c", "d"), ("d", "e"), ("c", "e")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    got4 = G.ktruss(edges, k=4, rounds=3).collect()
    assert got4 == []
    got3 = sorted((r["a"], r["b"], r["support"])
                  for r in G.ktruss(edges, k=3, rounds=3).collect())
    vals = ",".join(f"('{s}','{d}')" for s, d in rows)
    sql = G.ktruss_sql(f"edges(src, dst) AS (VALUES {vals})", k=3, rounds=3)
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    con.close()
    assert got3 == want
    assert len(got3) == 6  # both triangles survive k=3


def test_wl_colors_structural_roles(spark):
    import duckdb

    # star hub vs leaves, separate chain: leaves share a color, hub
    # differs; chain endpoints differ (one has only out, one only in)
    rows = [("h", "l1"), ("h", "l2"), ("h", "l3"), ("x", "y")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    got = {r["node"]: r["color"]
           for r in G.wl_colors(edges, iters=2).collect()}
    assert got["l1"] == got["l2"] == got["l3"] != got["h"]
    assert got["x"] != got["y"]
    vals = ",".join(f"('{s}','{d}')" for s, d in rows)
    sql = G.wl_colors_sql(f"edges(src, dst) AS (VALUES {vals})", iters=2)
    con = duckdb.connect()
    want = dict(con.sql(sql).fetchall())
    con.close()
    assert got == want


# ------------------------------------------------------------------ #
# link prediction (Adamic-Adar family)
# ------------------------------------------------------------------ #


def test_link_prediction_square_cycle(spark):
    """4-cycle a-b-c-d-a: the only >=2-common-neighbour unlinked pairs
    are the diagonals (a,c) and (b,d); every common neighbour has
    degree 2, so aa = 2/ln(2), ra = 1.0, pa = 4."""
    import math

    from orionbelt_ontology_builder_spark.operators import graphstats as G

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        "src string, dst string",
    )
    rows = {
        (r["node_a"], r["node_b"]): r
        for r in G.link_prediction(edges).collect()
    }
    assert set(rows) == {("a", "c"), ("b", "d")}
    for r in rows.values():
        assert r["common_neighbors"] == 2
        assert r["adamic_adar"] == pytest.approx(2.0 / math.log(2.0))
        assert r["resource_alloc"] == pytest.approx(1.0)
        assert r["pref_attach"] == 4


def test_link_prediction_hub_cap_silences_star(spark):
    """A pure star's wedges all pass through the hub; with hub_cap
    below the hub degree the wedge join has nothing to fan out on."""
    from orionbelt_ontology_builder_spark.operators import graphstats as G

    star = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(5)], "src string, dst string"
    )
    assert G.link_prediction(star, min_shared=1, hub_cap=3).count() == 0
    # with the cap above the hub degree the leaf pairs appear
    assert G.link_prediction(star, min_shared=1, hub_cap=10).count() > 0


def test_link_prediction_matches_sql_twin(spark):
    import duckdb

    from orionbelt_ontology_builder_spark.operators import graphstats as G

    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c"),
        ("e", "b"), ("e", "d"), ("f", "a"), ("f", "c"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = [
        (r["node_a"], r["node_b"], r["common_neighbors"],
         round(r["adamic_adar"], 9), round(r["resource_alloc"], 9),
         r["pref_attach"])
        for r in G.link_prediction(df).collect()
    ]
    vals = ", ".join(f"('{s}', '{d}')" for s, d in edges)
    cte = f"edges(src, dst) AS (VALUES {vals})"
    want = [
        (a, b, cn, round(aa, 9), round(ra, 9), pa)
        for a, b, cn, aa, ra, pa in duckdb.sql(
            G.link_prediction_sql(cte)
        ).fetchall()
    ]
    assert got == want


# ------------------------------------------------------------------ #
# node2vec second-order biased walks
# ------------------------------------------------------------------ #

_N2V_EDGES = [
    ("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "b"),
    ("b", "d"), ("d", "a"),
]


def _n2v_replay(edges, walk_len=3, p=2.0, q=0.5, salt="n2v"):
    """Independent pure-Python implementation of the node2vec spec
    (salted-md5 uniforms, inverse-CDF over (1/p, 1, 1/q) weights)."""
    import hashlib

    def h4(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)

    dedges = sorted({(s, d) for s, d in edges if s != d})
    adj = {}
    for s, d in dedges:
        adj.setdefault(s, []).append(d)
    for s in adj:
        adj[s] = sorted(adj[s])
    und = {tuple(sorted(e)) for e in dedges}
    rows = []
    for start in sorted(adj):
        rows.append((start, 0, start))
        nbrs = adj[start]
        cur = nbrs[h4(f"{salt}:1:{start}") % len(nbrs)]
        prev = start
        rows.append((start, 1, cur))
        for s in range(2, walk_len + 1):
            if cur not in adj:
                break
            cand = adj[cur]
            alphas = [
                1.0 / p if x == prev
                else 1.0 if tuple(sorted((prev, x))) in und
                else 1.0 / q
                for x in cand
            ]
            total = sum(alphas)
            u = h4(f"{salt}:{s}:{start}:{cur}:{prev}") / 65536.0
            target = u * total
            cum = 0.0
            for x, a in zip(cand, alphas):
                cum += a
                if target < cum:
                    nxt = x
                    break
            rows.append((start, s, nxt))
            prev, cur = cur, nxt
    return sorted(rows)


def test_node2vec_matches_independent_replay(spark):
    from orionbelt_ontology_builder_spark.operators import graphstats as G

    df = spark.createDataFrame(_N2V_EDGES, "src string, dst string")
    got = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in G.node2vec_walks(df).collect()
    )
    assert got == _n2v_replay(_N2V_EDGES)


def test_node2vec_matches_sql_twin(spark):
    import duckdb

    from orionbelt_ontology_builder_spark.operators import graphstats as G

    df = spark.createDataFrame(_N2V_EDGES, "src string, dst string")
    got = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in G.node2vec_walks(df).collect()
    )
    vals = ", ".join(f"('{s}', '{d}')" for s, d in _N2V_EDGES)
    cte = f"edges(src, dst) AS (VALUES {vals})"
    want = sorted(
        tuple(r) for r in duckdb.sql(G.node2vec_walks_sql(cte)).fetchall()
    )
    assert got == want


def test_node2vec_return_bias_dial(spark):
    """p -> 0 makes the return weight (1/p = 65536) dominate: every
    step-2 pick whose current node has a directed edge back to the
    start must return — and the engine agrees with the independent
    replay at the biased settings too."""
    from orionbelt_ontology_builder_spark.operators import graphstats as G

    p, q = 1.0 / 65536.0, 1.0
    df = spark.createDataFrame(_N2V_EDGES, "src string, dst string")
    rows = G.node2vec_walks(df, walk_len=2, p=p, q=q).collect()
    got = sorted((r["walk_id"], r["step"], r["node"]) for r in rows)
    assert got == _n2v_replay(_N2V_EDGES, walk_len=2, p=p, q=q)
    adj = {}
    for s, d in _N2V_EDGES:
        adj.setdefault(s, set()).add(d)
    by_walk = {}
    for r in rows:
        by_walk.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    returnable = [
        w for w, st in by_walk.items()
        if 2 in st and w in adj.get(st[1], set())
    ]
    assert returnable, "fixture must offer at least one return edge"
    for w in returnable:
        assert by_walk[w][2] == w


# ------------------------------------------------------------------ #
# weighted shortest paths (bounded Bellman-Ford)
# ------------------------------------------------------------------ #

_SSSP_EDGES = [
    ("r", "a"), ("r", "b"), ("a", "c"), ("b", "c"), ("c", "d"),
    ("a", "d"), ("d", "e"), ("b", "e"), ("x", "y"),
]


def _sssp_replay(edges, seeds, rounds=6, weight_mod=7, salt="w"):
    import hashlib

    def w(u, v):
        h = hashlib.md5(f"{salt}:{u}:{v}".encode()).hexdigest()[:2]
        return int(h, 16) % weight_mod + 1

    e = sorted({(s, d) for s, d in edges})
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        nxt = dict(dist)
        for u, v in e:
            if u in dist:
                cand = dist[u] + w(u, v)
                if v not in nxt or cand < nxt[v]:
                    nxt[v] = cand
        dist = nxt
    return sorted(dist.items())


def test_weighted_sssp_matches_replay_and_twin(spark):
    import duckdb

    from orionbelt_ontology_builder_spark.operators import graphstats as G

    df = spark.createDataFrame(_SSSP_EDGES, "src string, dst string")
    seeds = spark.createDataFrame([("r",)], "node string")
    got = sorted(
        (r["node"], r["dist"])
        for r in G.weighted_sssp(df, seeds, rounds=5).collect()
    )
    assert got == _sssp_replay(_SSSP_EDGES, ["r"], rounds=5)
    vals = ", ".join(f"('{s}', '{d}')" for s, d in _SSSP_EDGES)
    cte = f"edges(src, dst) AS (VALUES {vals})"
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            G.weighted_sssp_sql(cte, "SELECT 'r' AS node", rounds=5)
        ).fetchall()
    )
    assert got == want


def test_weighted_sssp_laws(spark):
    """dist >= hops (weights >= 1), seeds at 0, unreachable absent,
    and the fixture converges inside the round cap."""
    from orionbelt_ontology_builder_spark.operators import graphstats as G

    df = spark.createDataFrame(_SSSP_EDGES, "src string, dst string")
    seeds = spark.createDataFrame([("r",)], "node string")
    d5 = {r["node"]: r["dist"] for r in G.weighted_sssp(df, seeds, rounds=5).collect()}
    d6 = {r["node"]: r["dist"] for r in G.weighted_sssp(df, seeds, rounds=6).collect()}
    assert d5 == d6  # converged inside the cap
    hops = {
        r["node"]: r["hops"]
        for r in G.bfs_hops(df, seeds, max_hops=6).collect()
    }
    assert d5["r"] == 0
    assert "x" not in d5 and "y" not in d5
    assert set(d5) == set(hops)
    for n, dist in d5.items():
        assert dist >= hops[n]


# ------------------------------------------------------------------ #
# betweenness centrality (Brandes, sampled seeds)
# ------------------------------------------------------------------ #

_BTW_EDGES = [
    # two triangles joined by the bridge c-d: c and d are the brokers
    ("a", "b"), ("b", "c"), ("c", "a"),
    ("d", "e"), ("e", "f"), ("f", "d"),
    ("c", "d"),
]


def _brandes_replay(edges, seeds=None, max_depth=10):
    """Textbook Brandes over the undirected simple graph (pure
    Python), truncated at max_depth; returns {node: betweenness/2}."""
    from collections import deque

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    if seeds is None:
        seeds = nodes
    bc = {v: 0.0 for v in nodes}
    for s in seeds:
        dist = {s: 0}
        sigma = {s: 1}
        order = []
        dq = deque([s])
        while dq:
            v = dq.popleft()
            order.append(v)
            if dist[v] >= max_depth:
                continue
            for w in sorted(adj[v]):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0
                    dq.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for v in adj[w]:
                if v in dist and dist[v] == dist[w] - 1:
                    delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {v: b / 2.0 for v, b in bc.items() if b > 0.0}


def test_betweenness_all_seeds_exact(spark):
    """seed_mod=1 samples every node -> exact Brandes betweenness;
    the bridge endpoints c and d dominate."""
    from orionbelt_ontology_builder_spark.operators import graphstats as G

    df = spark.createDataFrame(_BTW_EDGES, "src string, dst string")
    got = {
        r["node"]: r["betweenness"]
        for r in G.betweenness_approx(df, seed_mod=1, max_depth=4).collect()
    }
    want = _brandes_replay(_BTW_EDGES, max_depth=4)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], rel=1e-12)
    assert got["c"] == got["d"] == max(got.values())


def test_betweenness_matches_sql_twin(spark):
    import duckdb

    from orionbelt_ontology_builder_spark.operators import graphstats as G

    df = spark.createDataFrame(_BTW_EDGES, "src string, dst string")
    got = sorted(
        (r["node"], round(r["betweenness"], 9))
        for r in G.betweenness_approx(df, seed_mod=2, max_depth=4).collect()
    )
    vals = ", ".join(f"('{s}', '{d}')" for s, d in _BTW_EDGES)
    cte = f"edges(src, dst) AS (VALUES {vals})"
    want = sorted(
        (n, round(b, 9))
        for n, b in duckdb.sql(
            G.betweenness_approx_sql(cte, seed_mod=2, max_depth=4)
        ).fetchall()
    )
    assert got == want and got  # non-empty sample


# ------------------------------------------------------------------ #
# graph summarization (quotient over WL roles)
# ------------------------------------------------------------------ #


def test_graph_summary_star_roles_and_twin(spark):
    """Two identical stars: both hubs share a role, all leaves share a
    role; the quotient has ONE (leafish->hub or hub->leaf) superedge
    row carrying all 6 edges; node counts are role-class sizes.  Twin
    must agree exactly."""
    import duckdb

    from orionbelt_ontology_builder_spark.operators import graphstats as G

    edges = [
        ("h1", "a"), ("h1", "b"), ("h1", "c"),
        ("h2", "x"), ("h2", "y"), ("h2", "z"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = G.graph_summary(df, iters=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_edges"] == 6
    assert r["n_src_nodes"] == 2 and r["n_dst_nodes"] == 6
    vals = ", ".join(f"('{s}', '{d}')" for s, d in edges)
    cte = f"edges(src, dst) AS (VALUES {vals})"
    want = duckdb.sql(G.graph_summary_sql(cte, iters=2)).fetchall()
    got = [
        (x["src_role"], x["dst_role"], x["n_edges"], x["n_src_nodes"],
         x["n_dst_nodes"])
        for x in rows
    ]
    assert got == [tuple(w) for w in want]


# ------------------------------------------------------------------ #
# OddBall egonet density (link-farm signature)
# ------------------------------------------------------------------ #


def test_egonet_clique_vs_star(spark):
    # 5-clique {c1..c5} plus a 5-star centered at s0
    clique = [(f"c{i}", f"c{j}") for i in range(1, 6) for j in range(i + 1, 6)]
    star = [("s0", f"l{i}") for i in range(1, 6)]
    edges = spark.createDataFrame(clique + star, "src string, dst string")
    rows = {r["node"]: r for r in G.egonet_density(edges).collect()}
    # clique member: degree 4, 6 triangles through it, density 1.0
    c1 = rows["c1"]
    assert c1["degree"] == 4 and c1["n_tri"] == 6
    assert c1["ego_density"] == 1.0 and c1["is_linkfarm"]
    # star center: no triangles, density 2/(deg+1), not flagged
    s0 = rows["s0"]
    assert s0["n_tri"] == 0 and not s0["is_linkfarm"]
    assert abs(s0["ego_density"] - 2 / 6) < 1e-12
    # leaf: degree 1 -> density 1.0 but under min_degree gate
    assert rows["l1"]["ego_density"] == 1.0 and not rows["l1"]["is_linkfarm"]
