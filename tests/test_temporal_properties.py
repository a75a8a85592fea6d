"""Property-based differential tests: temporal operators vs pure-Python
references over hypothesis-random event streams (hypothesis).  Few
examples, one Spark job per example — each example is a whole random
stream, so 10 examples cover hundreds of events including degenerate
shapes (duplicate timestamps, single-event keys, empty build sides)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from orionbelt_ontology_builder_spark.operators import temporal as T

T0 = datetime(2024, 1, 1)


def _events(max_keys=3, max_n=20):
    # (key, minute-offset) pairs; duplicates in both key and ts allowed
    return st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=max_keys - 1),
            st.integers(min_value=0, max_value=300),
        ),
        min_size=1,
        max_size=max_n,
    )


def _rows(pairs):
    return [
        (f"k{k}", T0 + timedelta(minutes=m), i)
        for i, (k, m) in enumerate(pairs)
    ]


@settings(max_examples=10, deadline=None)
@given(_events(), _events())
def test_asof_join_matches_python_reference(spark, probe_pairs, build_pairs):
    probe = spark.createDataFrame(
        _rows(probe_pairs), "key string, ts timestamp, pid int"
    )
    build = spark.createDataFrame(
        _rows(build_pairs), "key string, ts timestamp, bid int"
    )
    got = {
        r["pid"]: (r["ts_b"], r["bid_b"])
        for r in T.asof_join(
            probe, build, on="key", payload=["bid"], tiebreak="bid"
        ).collect()
    }
    # reference: per probe, latest build ts <= probe ts; tie -> max bid
    bl = _rows(build_pairs)
    for k, ts, pid in _rows(probe_pairs):
        cands = [(bts, bid) for bk, bts, bid in bl if bk == k and bts <= ts]
        want = max(cands, key=lambda c: (c[0], c[1])) if cands else (None, None)
        assert got[pid] == want, (pid, k, ts)


@settings(max_examples=10, deadline=None)
@given(_events(), st.integers(min_value=1, max_value=90))
def test_sessionize_matches_python_reference(spark, pairs, gap_min):
    ev = spark.createDataFrame(
        _rows(pairs), "key string, ts timestamp, eid int"
    )
    got = {
        r["eid"]: r["session_idx"]
        for r in T.sessionize(
            ev, on="key", gap_sec=gap_min * 60, tiebreak="eid"
        ).collect()
    }
    # reference: walk each key's (ts, eid)-sorted events
    by_key: dict[str, list[tuple[datetime, int]]] = {}
    for k, ts, eid in _rows(pairs):
        by_key.setdefault(k, []).append((ts, eid))
    for k, evs in by_key.items():
        evs.sort()
        sess, prev = 0, None
        for ts, eid in evs:
            if prev is None or (ts - prev).total_seconds() > gap_min * 60:
                sess += 1
            prev = ts
            assert got[eid] == sess, (k, eid, ts)


@settings(max_examples=10, deadline=None)
@given(_events(max_keys=1, max_n=15), st.integers(min_value=1, max_value=6))
def test_latest_snapshot_matches_python_reference(spark, pairs, n_keys):
    rows = [
        (f"k{i % n_keys}", ts, i)
        for i, (_, ts) in enumerate(
            (k, T0 + timedelta(minutes=m)) for k, m in pairs
        )
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v int")
    got = {r["key"]: (r["ts"], r["v"])
           for r in T.latest_snapshot(df, "key", tiebreak="v").collect()}
    want: dict[str, tuple[datetime, int]] = {}
    for k, ts, v in rows:
        if k not in want or (ts, v) > want[k]:
            want[k] = (ts, v)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(_events(max_keys=3, max_n=25), st.integers(min_value=2, max_value=4))
def test_scd2_matches_python_walker(spark, pairs, n_states):
    """scd2_intervals vs a pure-Python per-key run-length walker:
    version numbering, run collapse, interval chaining, open flag."""
    rows = [
        (f"k{k}", T0 + timedelta(minutes=m), f"s{(k + m) % n_states}", i)
        for i, (k, m) in enumerate(pairs)
    ]
    df = spark.createDataFrame(
        rows, "key string, ts timestamp, attr string, eid long"
    )
    got = [
        (r["key"], r["version"], r["attr"], r["valid_from"], r["valid_to"],
         r["is_current"], r["n_snapshots"])
        for r in T.scd2_intervals(
            df, on="key", ts="ts", attr="attr", tiebreak="eid"
        ).orderBy("key", "version").collect()
    ]
    # pure-Python reference
    want = []
    for key in sorted({r[0] for r in rows}):
        hist = sorted([r for r in rows if r[0] == key],
                      key=lambda r: (r[1], r[3]))
        runs = []
        for _, ts, attr, _eid in hist:
            if runs and runs[-1][0] == attr:
                runs[-1][2] += 1
            else:
                runs.append([attr, ts, 1])
        for v, (attr, start, n) in enumerate(runs, 1):
            nxt = runs[v][1] if v < len(runs) else None
            want.append((key, v, attr, start, nxt, nxt is None, n))
    assert got == want
