"""Temporal operators: as-of join, binned range join, rollup cascade,
latest snapshot — each checked against a naive/direct formulation on
in-memory fixtures, plus plan-shape guards for the scale claims."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from orionbelt_ontology_builder_spark.operators import temporal as T

T0 = datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def quotes(spark):
    # build side: (key, ts, px, seq) — includes a (k, ts) tie at m=30
    rows = [
        ("a", _ts(0), 1.0, 1),
        ("a", _ts(10), 2.0, 2),
        ("a", _ts(30), 3.0, 3),
        ("a", _ts(30), 4.0, 4),  # tie: max seq wins
        ("b", _ts(5), 10.0, 5),
    ]
    return spark.createDataFrame(rows, "key string, ts timestamp, px double, seq int")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("a", _ts(0), 100),   # equality: matches px=1.0 build row
        ("a", _ts(12), 101),  # between -> px=2.0
        ("a", _ts(31), 102),  # after tie -> px=4.0 (max seq)
        ("a", _ts(500), 103), # stale for tolerance tests
        ("b", _ts(1), 104),   # before any b quote -> null (backward)
        ("c", _ts(9), 105),   # key with no build rows -> null
    ]
    return spark.createDataFrame(rows, "key string, ts timestamp, qty int")


def test_asof_backward_semantics(quotes, trades):
    out = {
        r["qty"]: (r["px_b"], r["ts_b"])
        for r in T.asof_join(trades, quotes, on="key", tiebreak="seq").collect()
    }
    assert out[100] == (1.0, _ts(0))          # ts equality included
    assert out[101] == (2.0, _ts(10))
    assert out[102] == (4.0, _ts(30))         # tie -> max tiebreak row
    assert out[103] == (3.0, _ts(30)) or out[103] == (4.0, _ts(30))
    assert out[103][1] == _ts(30)
    assert out[104] == (None, None)           # probe before all builds
    assert out[105] == (None, None)           # unseen key


def test_asof_forward_and_tolerance(quotes, trades):
    fwd = {
        r["qty"]: r["px_b"]
        for r in T.asof_join(
            trades, quotes, on="key", direction="forward", tiebreak="seq"
        ).collect()
    }
    assert fwd[100] == 1.0                    # equality included forward too
    assert fwd[101] == 4.0                    # next at-or-after m=12 is m=30
    assert fwd[103] is None                   # nothing after m=500
    assert fwd[104] == 10.0                   # b quote at m=5 >= m=1
    tol = {
        r["qty"]: r["px_b"]
        for r in T.asof_join(
            trades, quotes, on="key", tolerance_sec=15 * 60, tiebreak="seq"
        ).collect()
    }
    assert tol[101] == 2.0                    # 2 min lag, within 15 min
    assert tol[103] is None                   # 470 min lag, nulled


def test_asof_matches_naive_join(spark, quotes, trades):
    # naive O(n*m): max-ts build row per probe via non-equi join
    q = quotes.select("key", F.col("ts").alias("bts"), "px", "seq")
    naive = (
        trades.join(q, "key", "left")
        .filter(F.col("bts") <= F.col("ts"))
        .groupBy("key", "ts", "qty")
        .agg(F.max_by("px", F.struct("bts", "seq")).alias("px_b"))
    )
    nv = {r["qty"]: r["px_b"] for r in naive.collect()}
    got = {
        r["qty"]: r["px_b"]
        for r in T.asof_join(trades, quotes, on="key", tiebreak="seq").collect()
    }
    for qty, px in nv.items():
        assert got[qty] == px
    # probes the naive inner-ish form lost are exactly the null matches
    assert {q for q, v in got.items() if v is None} == set(got) - set(nv)


def test_latest_snapshot(spark):
    rows = [
        ("u1", _ts(1), "old", 1),
        ("u1", _ts(9), "new", 2),
        ("u2", _ts(4), "tie-lo", 1),
        ("u2", _ts(4), "tie-hi", 2),
    ]
    df = spark.createDataFrame(rows, "url string, ts timestamp, body string, v int")
    out = {r["url"]: r for r in T.latest_snapshot(df, "url", tiebreak="v").collect()}
    assert out["u1"]["body"] == "new"
    assert out["u2"]["body"] == "tie-hi"      # ts tie -> max tiebreak
    assert set(out["u1"].asDict()) == {"url", "ts", "body", "v"}


@pytest.fixture(scope="module")
def intervals(spark):
    rows = [
        ("w_empty", _ts(50), _ts(50)),        # zero-width: matches nothing
        ("w_short", _ts(10), _ts(20)),
        ("w_long", _ts(0), _ts(200)),         # spans many buckets
        ("w_over", _ts(15), _ts(25)),         # overlaps w_short
    ]
    return spark.createDataFrame(
        rows, "label string, istart timestamp, iend timestamp"
    )


def test_range_join_matches_naive(spark, intervals):
    pts = spark.createDataFrame(
        [(i, _ts(i * 7)) for i in range(40)], "pid long, ts timestamp"
    )
    got = T.range_join_binned(pts, intervals, bucket_sec=600)
    naive = pts.join(
        intervals,
        (F.col("ts") >= F.col("istart")) & (F.col("ts") < F.col("iend")),
    )
    key = lambda r: (r["pid"], r["label"])
    assert sorted(map(key, got.collect())) == sorted(map(key, naive.collect()))
    labels = {r["label"] for r in got.collect()}
    assert "w_empty" not in labels and {"w_short", "w_long", "w_over"} <= labels


def test_range_join_halfopen_bounds(spark, intervals):
    pts = spark.createDataFrame(
        [(1, _ts(10)), (2, _ts(20))], "pid long, ts timestamp"
    )
    got = {(r["pid"], r["label"])
           for r in T.range_join_binned(pts, intervals, bucket_sec=60).collect()}
    assert (1, "w_short") in got              # start inclusive
    assert (2, "w_short") not in got          # end exclusive
    assert (2, "w_over") in got


def test_range_join_plan_is_equijoin(spark, intervals):
    pts = spark.createDataFrame([(1, _ts(10))], "pid long, ts timestamp")
    plan = T.range_join_binned(pts, intervals)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rollup_cascade_matches_direct(spark):
    ev = spark.createDataFrame(
        [(i, _ts(i * 37), float(i % 7)) for i in range(300)],
        "event_id long, ts timestamp, value double",
    )
    out = T.rollup_cascade(ev, resolutions=("hour", "day"))
    for res in ("hour", "day"):
        direct = ev.groupBy(F.date_trunc(res, "ts").alias("bucket")).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        got = sorted(
            out.filter(F.col("resolution") == res).drop("resolution").collect()
        )
        assert got == sorted(direct.collect()), res
    with pytest.raises(ValueError):
        T.rollup_cascade(ev, resolutions=("day", "hour"))
    with pytest.raises(ValueError):
        T.rollup_cascade(ev, resolutions=("fortnight",))
    # weeks straddle month boundaries: feeding one into a coarser level
    # would silently misassign whole weeks — rejected; terminal is fine
    with pytest.raises(ValueError):
        T.rollup_cascade(ev, resolutions=("day", "week", "month"))
    assert T.rollup_cascade(ev, resolutions=("day", "week")).count() > 0


def test_sessionize_and_stats(spark):
    rows = [
        # u1: events at 0, 10, 50, 61 min with 30-min gap
        # -> sessions {0,10}, {50,61}
        ("u1", _ts(0), 1),
        ("u1", _ts(10), 2),
        ("u1", _ts(50), 3),
        ("u1", _ts(61), 4),
        # boundary: gap EXACTLY 30 min does not split (> not >=)
        ("u2", _ts(0), 5),
        ("u2", _ts(30), 6),
        # single event
        ("u3", _ts(7), 7),
    ]
    ev = spark.createDataFrame(rows, "user_id string, ts timestamp, event_id int")
    got = {
        r["event_id"]: r["session_idx"]
        for r in T.sessionize(ev, gap_sec=1800, tiebreak="event_id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1, 6: 1, 7: 1}
    st = {
        (r["user_id"], r["session_idx"]): r
        for r in T.session_stats(ev, gap_sec=1800, tiebreak="event_id").collect()
    }
    assert st[("u1", 1)]["n_events"] == 2
    assert st[("u1", 2)]["duration_sec"] == 11 * 60.0
    assert st[("u2", 1)]["n_events"] == 2
    assert st[("u3", 1)]["duration_sec"] == 0.0


def test_us_is_session_timezone_independent_for_ntz(spark):
    """NTZ timestamps (the parquet read type) must produce identical
    gaps/buckets under ANY session timezone — the decomposition in
    temporal._us reads the NTZ fields directly, never the session tz.
    Events straddle the 2024-03-10 US DST spring-forward."""
    rows = [
        ("u", datetime(2024, 3, 10, 1, 30), 1),
        ("u", datetime(2024, 3, 10, 3, 30), 2),   # 2h wall-clock later
    ]
    ev = spark.createDataFrame(
        rows, "user_id string, ts timestamp_ntz, event_id int"
    )
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    results = {}
    try:
        for tz in ("UTC", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            # 90-min gap: the two events are 120 wall-clock minutes
            # apart, so they must SPLIT regardless of session tz (an
            # epoch cast in New York would see only 60 min and merge)
            results[tz] = sorted(
                (r["event_id"], r["session_idx"])
                for r in T.sessionize(ev, gap_sec=5400, tiebreak="event_id")
                .collect()
            )
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert results["UTC"] == results["America/New_York"] == [(1, 1), (2, 2)]


def test_event_transitions_session_boundary_dropped(spark):
    import datetime as dt
    from orionbelt_ontology_builder_spark.operators import temporal as T

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1, one session: a -> b -> a
        (1, t0, 0, "a"), (1, t0 + dt.timedelta(minutes=1), 1, "b"),
        (1, t0 + dt.timedelta(minutes=2), 2, "a"),
        # user 1, new session after a 2h gap: c (no transition from 'a')
        (1, t0 + dt.timedelta(hours=3), 3, "c"),
        # user 2: a -> b
        (2, t0, 4, "a"), (2, t0 + dt.timedelta(minutes=5), 5, "b"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {(r["from_type"], r["to_type"]): r for r in T.event_transitions(
        ev, gap_sec=3600, tiebreak="event_id").collect()}
    assert out[("a", "b")]["n"] == 2
    assert out[("b", "a")]["n"] == 1
    assert ("a", "c") not in out          # boundary transition dropped
    # per-from fractions sum to 1
    assert abs(out[("a", "b")]["frac_of_from"] - 1.0) < 1e-12
    assert abs(out[("b", "a")]["frac_of_from"] - 1.0) < 1e-12


def test_funnel_completion_strict_order(spark):
    import datetime as dt
    from orionbelt_ontology_builder_spark.operators import temporal as T

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        # session A completes the whole funnel in order
        (1, t0, 0, "view"), (1, t0 + m, 1, "click"), (1, t0 + 2 * m, 2, "purchase"),
        # session B: click BEFORE view -> stops at step 1
        (2, t0, 3, "click"), (2, t0 + m, 4, "view"),
        # session C: view only
        (3, t0, 5, "view"),
        # session D: no funnel events at all
        (4, t0, 6, "error"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {r["step_name"]: r for r in T.funnel_completion(
        ev, ["view", "click", "purchase"], gap_sec=3600, tiebreak="event_id"
    ).collect()}
    assert out["view"]["n_sessions"] == 3
    assert out["click"]["n_sessions"] == 1      # B's click precedes its view
    assert out["purchase"]["n_sessions"] == 1
    assert abs(out["view"]["frac_of_all"] - 0.75) < 1e-12
    assert abs(out["purchase"]["frac_of_prev"] - 1.0) < 1e-12


def test_event_rate_anomaly_spike_detected(spark):
    """10 steady hours at 5 events/hr with one hour at 50: the spike
    hour gets the max |z|; warm-up hours (< min_history) are absent."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(12):
        n = 50 if h == 9 else 5 + (h % 2)  # mild alternation, one spike
        for i in range(n):
            rows.append((t0 + dt.timedelta(hours=h, minutes=i % 60), eid))
            eid += 1
    ev = spark.createDataFrame(rows, "ts timestamp, event_id long")
    out = T.event_rate_anomaly(ev, ts="ts", trailing=24, min_history=6)
    got = {r["bucket"].hour: r for r in out.collect()}
    # hours 0-5 have < 6 preceding hours -> dropped
    assert min(got) >= 6
    # the spike hour is present and has the largest z
    assert 9 in got
    zmax = max(abs(r["z"]) for r in got.values())
    assert abs(got[9]["z"]) == zmax and got[9]["z"] > 3
    # baseline stats sane for a steady hour
    assert abs(got[6]["base_mean"] - 5.5) < 0.6


def test_event_rate_anomaly_constant_rate_dropped(spark):
    """A perfectly constant series has base_std = 0 everywhere ->
    every scored row is filtered (no divide-by-zero rows leak)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (t0 + dt.timedelta(hours=h, minutes=m), h * 10 + m)
        for h in range(10) for m in range(3)
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_id long")
    assert T.event_rate_anomaly(ev, ts="ts").count() == 0


def test_cohort_retention_triangle(spark):
    """A active weeks 0/1/2, B weeks 0/2, C week 1 (Mondays, so the
    week-truncation is exact): cohort w0 = {A,B} retains 1/2 at +1 and
    2/2 at +2; cohort w1 = {C} has only its offset-0 row."""
    import datetime as dt

    w = [dt.datetime(2024, 1, 1 + 7 * k, 12, 0) for k in range(3)]
    rows = [
        ("A", w[0]), ("A", w[1]), ("A", w[2]),
        ("B", w[0]), ("B", w[2]),
        ("C", w[1]),
        ("A", w[0] + dt.timedelta(days=2)),  # same-week dup collapses
    ]
    ev = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = {
        (r["cohort_week"].isoformat(), r["week_offset"]): r
        for r in T.cohort_retention(ev, on="user_id", ts="ts").collect()
    }
    assert set(out) == {
        ("2024-01-01", 0), ("2024-01-01", 1), ("2024-01-01", 2),
        ("2024-01-08", 0),
    }
    r0 = out[("2024-01-01", 0)]
    assert r0["n_active"] == 2 and r0["cohort_size"] == 2
    assert abs(out[("2024-01-01", 1)]["retention"] - 0.5) < 1e-12
    assert abs(out[("2024-01-01", 2)]["retention"] - 1.0) < 1e-12
    assert out[("2024-01-08", 0)]["cohort_size"] == 1


def test_cohort_retention_max_weeks_cap(spark):
    """Offsets past max_weeks are dropped but offset-0 sizing remains
    intact for the kept rows."""
    import datetime as dt

    rows = [("u", dt.datetime(2024, 1, 1) + dt.timedelta(days=7 * k))
            for k in (0, 1, 30)]
    ev = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = T.cohort_retention(ev, on="user_id", ts="ts", max_weeks=2)
    offsets = [r["week_offset"] for r in out.collect()]
    assert offsets == [0, 1]


# --------------------------------------------------------------------- #
# scd2_intervals
# --------------------------------------------------------------------- #


def _scd2_rows(spark, rows):
    import datetime as dt

    data = [
        (k, dt.datetime(2024, 1, 1, 0, m), v, i)
        for i, (k, m, v) in enumerate(rows)
    ]
    ev = spark.createDataFrame(
        data, "user_id string, ts timestamp, event_type string, event_id long"
    )
    return T.scd2_intervals(
        ev, on="user_id", ts="ts", attr="event_type", tiebreak="event_id"
    ).orderBy("user_id", "version").collect()


def test_scd2_collapses_runs_and_versions(spark):
    """AAB B A -> three versions; unchanged re-snapshots collapse."""
    out = _scd2_rows(
        spark,
        [("u", 0, "a"), ("u", 1, "a"), ("u", 2, "b"),
         ("u", 3, "b"), ("u", 4, "a")],
    )
    assert [(r["version"], r["event_type"], r["n_snapshots"]) for r in out] == [
        (1, "a", 2), (2, "b", 2), (3, "a", 1)
    ]
    # intervals chain: valid_to == next valid_from; only last is open
    assert [r["is_current"] for r in out] == [False, False, True]
    assert out[0]["valid_to"] == out[1]["valid_from"]
    assert out[1]["valid_to"] == out[2]["valid_from"]
    assert out[2]["valid_to"] is None


def test_scd2_single_run_is_current(spark):
    out = _scd2_rows(spark, [("u", 0, "x"), ("u", 5, "x")])
    assert len(out) == 1
    r = out[0]
    assert r["version"] == 1 and r["is_current"] and r["n_snapshots"] == 2
    assert r["valid_to"] is None


def test_scd2_keys_are_independent(spark):
    out = _scd2_rows(spark, [("u", 0, "a"), ("v", 0, "a"), ("v", 1, "b")])
    per_key = {}
    for r in out:
        per_key.setdefault(r["user_id"], []).append(r["event_type"])
    assert per_key == {"u": ["a"], "v": ["a", "b"]}


def test_scd2_tiebreak_orders_equal_timestamps(spark):
    """Two values on the SAME ts: event_id decides run order, so the
    history is (a then b), deterministically."""
    out = _scd2_rows(spark, [("u", 0, "a"), ("u", 0, "b")])
    assert [(r["version"], r["event_type"]) for r in out] == [(1, "a"), (2, "b")]


def test_merge_rollups_equals_full_rollup(spark):
    """IVM law: merge(rollup(A), rollup(B)) == rollup(A u B) for
    disjoint A/B — counts, sums, min/max and derived avg all agree."""
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1, i % 5, i % 60), (i * 7) % 100)
        for i in range(200)
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, value long")
    a = T.rollup_cascade(ev.filter(F.col("event_id") % 2 == 0),
                         resolutions=("hour",))
    b = T.rollup_cascade(ev.filter(F.col("event_id") % 2 == 1),
                         resolutions=("hour",))
    merged = {r["bucket"]: r for r in T.merge_rollups(a, b).collect()}
    full = {r["bucket"]: r for r in T.rollup_cascade(
        ev, resolutions=("hour",)).collect()}
    assert set(merged) == set(full)
    for k, f in full.items():
        m = merged[k]
        assert (m["n_events"], m["sum_value"], m["min_value"],
                m["max_value"]) == (
            f["n_events"], f["sum_value"], f["min_value"], f["max_value"])
        assert abs(m["avg_value"] - f["sum_value"] / f["n_events"]) < 1e-12


def test_merge_rollups_three_way_and_empty_part(spark):
    import datetime as dt

    rows = [(i, dt.datetime(2024, 1, 1, 0, i), i) for i in range(9)]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, value long")
    parts = [
        T.rollup_cascade(ev.filter(F.col("event_id") % 3 == k),
                         resolutions=("hour",))
        for k in range(3)
    ]
    empty = T.rollup_cascade(ev.filter(F.lit(False)), resolutions=("hour",))
    out = T.merge_rollups(*parts, empty).collect()
    assert len(out) == 1
    assert out[0]["n_events"] == 9 and out[0]["sum_value"] == 36


def test_state_durations_hand_math(spark):
    """a(0-2min) -> b(2-5min) -> a(open): closed seconds per state."""
    out = {
        (r["user_id"], r["event_type"]): r
        for r in spark.createDataFrame(
            [("u", __import__("datetime").datetime(2024, 1, 1, 0, m), v, i)
             for i, (m, v) in enumerate([(0, "a"), (2, "b"), (5, "a")])],
            "user_id string, ts timestamp, event_type string, event_id long",
        ).transform(lambda df: __import__(
            "orionbelt_ontology_builder_spark.operators.temporal",
            fromlist=["temporal"]).state_durations(
                df, tiebreak="event_id"))
        .collect()
    }
    a = out[("u", "a")]
    assert a["n_versions"] == 2 and abs(a["closed_seconds"] - 120.0) < 1e-9
    assert a["has_open"]
    b = out[("u", "b")]
    assert b["n_versions"] == 1 and abs(b["closed_seconds"] - 180.0) < 1e-9
    assert not b["has_open"]


def test_cdc_apply_semantics(spark):
    import datetime as dt

    snap = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "key long, val double"
    )
    t = dt.datetime(2024, 1, 1)
    t2 = dt.datetime(2024, 1, 2)
    chg = spark.createDataFrame(
        [
            (2, "U", t2, 1, 21.0),   # latest for key 2 (by ts)
            (2, "U", t, 2, 19.0),
            (3, "D", t, 1, 0.0),     # delete key 3
            (4, "I", t, 1, 40.0),    # insert new key 4
            (5, "I", t, 1, 50.0),    # insert then delete: seq order
            (5, "D", t, 2, 0.0),
        ],
        "key long, op string, ts timestamp, seq long, val double",
    )
    got = {r["key"]: (r["val"], r["src"], r["n_changes"])
           for r in T.cdc_apply(snap, chg).collect()}
    assert got == {
        1: (10.0, "unchanged", 0),
        2: (21.0, "updated", 2),
        4: (40.0, "inserted", 1),
    }


def test_cdc_apply_matches_oracle(spark):
    import datetime as dt
    import duckdb

    snap = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "key long, val double"
    )
    t = dt.datetime(2024, 1, 1)
    chg = spark.createDataFrame(
        [(1, "U", t, 1, 11.0), (9, "I", t, 1, 90.0)],
        "key long, op string, ts timestamp, seq long, val double",
    )
    got = sorted(
        (r["key"], r["val"], r["src"], r["n_changes"])
        for r in T.cdc_apply(snap, chg).collect()
    )
    sql = T.cdc_apply_sql(
        "snap0 AS (SELECT * FROM (VALUES (1, 10.0::DOUBLE),"
        " (2, 20.0::DOUBLE)) t(key, val))",
        "chg AS (SELECT * FROM (VALUES"
        " (1, 'U', TIMESTAMP '2024-01-01', 1, 11.0::DOUBLE),"
        " (9, 'I', TIMESTAMP '2024-01-01', 1, 90.0::DOUBLE))"
        " t(key, op, ts, seq, val))",
    )
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    con.close()
    assert got == want


def test_ewma_hand_math_and_head_renormalization(spark):
    import datetime as dt
    import math

    rows = [(i, dt.datetime(2024, 1, 1 + i), 7, "c", float(v))
            for i, v in enumerate([10.0, 20.0, 30.0], start=1)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )
    got = [r["ewma"] for r in T.ewma_events(ev).collect()]
    # head renormalizes over present terms: first row == its own value
    assert got[0] == 10.0
    assert math.isclose(got[1], (20 * 0.5 + 10 * 0.25) / 0.75)
    assert math.isclose(got[2], (30 * 0.5 + 20 * 0.25 + 10 * 0.125) / 0.875)


# ------------------------------------------------------------------ #
# Allen interval algebra + interval coalescing
# ------------------------------------------------------------------ #


def test_allen_all_thirteen_relations(spark):
    # One synthetic user per relation; span pairs (a=type 'a*', b='b*')
    # hand-placed to realize each of the 13 relations exactly once.
    # allen_relations pairs type_a < type_b, classifying from a's side.
    cases = {
        "equals": ((0, 10), (0, 10)),
        "starts": ((0, 5), (0, 10)),
        "started_by": ((0, 10), (0, 5)),
        "finishes": ((5, 10), (0, 10)),
        "finished_by": ((0, 10), (5, 10)),
        "meets": ((0, 5), (5, 10)),
        "met_by": ((5, 10), (0, 5)),
        "contains": ((0, 10), (2, 8)),
        "during": ((2, 8), (0, 10)),
        "overlaps": ((0, 6), (4, 10)),
        "overlapped_by": ((4, 10), (0, 6)),
        "before": ((0, 3), (5, 10)),
        "after": ((5, 10), (0, 3)),
    }
    rows = []
    for i, (rel, ((sa, ea), (sb, eb))) in enumerate(cases.items()):
        uid = i  # one user per case -> exactly one pair per user
        rows += [(uid, "a", _ts(sa)), (uid, "a", _ts(ea)),
                 (uid, "b", _ts(sb)), (uid, "b", _ts(eb))]
    ev = spark.createDataFrame(rows, "user_id int, event_type string, ts timestamp")
    got = {r["relation"]: r["n_pairs"]
           for r in T.allen_relations(ev).collect()}
    assert got == {rel: 1 for rel in cases}


def test_allen_drops_point_spans(spark):
    ev = spark.createDataFrame(
        [(1, "a", _ts(0)), (1, "b", _ts(0)), (1, "b", _ts(5))],
        "user_id int, event_type string, ts timestamp",
    )
    # type 'a' has a single event -> degenerate span -> no pair at all
    assert T.allen_relations(ev).count() == 0


def test_coalesce_intervals_overlap_touch_gap(spark):
    iv = spark.createDataFrame(
        [
            (1, _ts(0), _ts(10)),   # island 1
            (1, _ts(5), _ts(8)),    # nested -> merges
            (1, _ts(10), _ts(15)),  # touches end=start -> merges
            (1, _ts(16), _ts(20)),  # strict gap -> island 2
            (2, _ts(0), _ts(1)),    # other key untouched
        ],
        "user_id int, istart timestamp, iend timestamp",
    )
    got = {(r["user_id"], r["island"]): (r["istart"], r["iend"], r["n_merged"])
           for r in T.coalesce_intervals(iv).collect()}
    assert got[(1, 1)] == (_ts(0), _ts(15), 3)
    assert got[(1, 2)] == (_ts(16), _ts(20), 1)
    assert got[(2, 1)] == (_ts(0), _ts(1), 1)
    # coverage law: islands never overlap and are maximal
    assert got[(1, 1)][1] < got[(1, 2)][0]
