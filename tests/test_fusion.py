"""Truth discovery (operators/fusion.py): independent replay, DuckDB
twin parity, and the reliability law that distinguishes it from
majority vote."""

from __future__ import annotations

import duckdb
import pytest

from orionbelt_ontology_builder_spark.operators import fusion

# Three items; src_good always asserts the consensus value, src_bad
# always dissents, the rest split.  Votes on i3 are 2-vs-2, so majority
# vote is a tie — trust learned from i1/i2 must break it toward the
# consistent sources' value.
_CLAIMS = [
    ("src_good", "i1", "A"), ("s2", "i1", "A"), ("s3", "i1", "A"),
    ("src_bad", "i1", "X"),
    ("src_good", "i2", "B"), ("s2", "i2", "B"), ("s4", "i2", "B"),
    ("src_bad", "i2", "Y"),
    ("src_good", "i3", "C"), ("s4", "i3", "C"),
    ("src_bad", "i3", "Z"), ("s5", "i3", "Z"),
]


def _replay(claims, iters=3):
    """Pure-Python mirror of the Sums rounds."""
    c = sorted(set(claims))
    trust = {s: 1.0 for s, _, _ in c}
    belief = {}
    for _ in range(iters):
        score, itot = {}, {}
        for s, i, v in c:
            score[(i, v)] = score.get((i, v), 0.0) + trust[s]
        for (i, v), sc in score.items():
            itot[i] = itot.get(i, 0.0) + sc
        belief = {(i, v): sc / itot[i] for (i, v), sc in score.items()}
        acc, cnt = {}, {}
        for s, i, v in c:
            acc[s] = acc.get(s, 0.0) + belief[(i, v)]
            cnt[s] = cnt.get(s, 0) + 1
        trust = {s: acc[s] / cnt[s] for s in acc}
    votes = {}
    for s, i, v in c:
        votes[(i, v)] = votes.get((i, v), 0) + 1
    return (
        sorted(
            (i, v, votes[(i, v)], belief[(i, v)])
            for (i, v) in belief
        ),
        trust,
    )


@pytest.fixture(scope="module")
def claims_df(spark):
    return spark.createDataFrame(
        _CLAIMS, "source string, item string, value string"
    )


def test_truth_discovery_matches_replay(spark, claims_df):
    got = [
        (r["item"], r["value"], r["n_sources"], r["belief"])
        for r in fusion.truth_discovery(claims_df).collect()
    ]
    want, _ = _replay(_CLAIMS)
    assert [(i, v, n) for i, v, n, _ in got] == [
        (i, v, n) for i, v, n, _ in want
    ]
    for (_, _, _, g), (_, _, _, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-12)


def test_truth_discovery_matches_sql_twin(spark, claims_df):
    got = [
        (r["item"], r["value"], r["n_sources"], round(r["belief"], 9))
        for r in fusion.truth_discovery(claims_df).collect()
    ]
    vals = ", ".join(f"('{s}', '{i}', '{v}')" for s, i, v in _CLAIMS)
    cte = f"claims(source, item, value) AS (VALUES {vals})"
    want = [
        (i, v, n, round(b, 9))
        for i, v, n, b in duckdb.sql(
            fusion.truth_discovery_sql(cte)
        ).fetchall()
    ]
    assert got == want


def test_trust_breaks_vote_ties(spark, claims_df):
    """i3 is 2-vs-2 by raw votes, but C is asserted by sources that
    agree with the i1/i2 consensus — learned trust must push C's
    belief above Z's (the property majority vote lacks)."""
    rows = {
        (r["item"], r["value"]): r
        for r in fusion.truth_discovery(claims_df).collect()
    }
    assert rows[("i3", "C")]["n_sources"] == rows[("i3", "Z")]["n_sources"]
    assert rows[("i3", "C")]["belief"] > rows[("i3", "Z")]["belief"]
    # per-item beliefs are shares: they sum to 1
    for item in ("i1", "i2", "i3"):
        tot = sum(r["belief"] for (i, _), r in rows.items() if i == item)
        assert tot == pytest.approx(1.0, rel=1e-12)
