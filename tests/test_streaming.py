"""Structured-Streaming frontier tests (deterministic availableNow)."""

from __future__ import annotations

from orionbelt_ontology_builder_spark.pipeline import extract as X
from orionbelt_ontology_builder_spark.pipeline import pages as P
from orionbelt_ontology_builder_spark.streaming import ingest as ST


def test_incremental_extraction_drains_and_resumes(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    # land a first batch of pages
    P.synthesize_pages(spark, 200).write.mode("overwrite").parquet(pages_dir)
    ST.incremental_extraction(spark, pages_dir, out_dir)
    raw1 = spark.read.parquet(out_dir + "/raw_triples")
    n1 = raw1.count()
    batch_n = X.extract_raw_triples(
        spark.read.parquet(pages_dir)
    ).count()
    assert n1 == batch_n > 0

    # land MORE pages; re-run drains only the new files (offset resume)
    P.synthesize_pages(spark, 100).write.mode("append").parquet(pages_dir)
    ST.incremental_extraction(spark, pages_dir, out_dir)
    n2 = spark.read.parquet(out_dir + "/raw_triples").count()
    total_batch = X.extract_raw_triples(spark.read.parquet(pages_dir)).count()
    assert n2 == total_batch  # no duplicates, nothing missed


def test_windowed_counts_match_batch(spark, tmp_path):
    # file-source streams read directories: stage the events table
    events_dir = str(tmp_path / "events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(
        events_dir
    )
    got = ST.windowed_event_counts_stream(spark, events_dir)
    want = ST.windowed_event_counts_batch(spark.read.parquet(events_dir))
    g = {(r["win_start"], r["event_type"]): (r["n"], round(r["total_value"], 6))
         for r in got.collect()}
    w = {(r["win_start"], r["event_type"]): (r["n"], round(r["total_value"], 6))
         for r in want.collect()}
    assert g == w and len(g) > 10


def test_stateful_user_totals_match_batch(spark, tmp_path):
    """applyInPandasWithState running fold == batch groupBy after a
    multi-batch drain (state carries across micro-batches)."""
    events_dir = str(tmp_path / "events")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # two separate file lands -> at least two micro-batches worth of
    # files, exercising the cross-batch state carry
    ev.filter("event_id % 2 = 0").write.parquet(events_dir)
    ev.filter("event_id % 2 = 1").write.mode("append").parquet(events_dir)
    got = ST.stateful_user_totals_stream(spark, events_dir)
    want = ST.user_totals_batch(spark.read.parquet(events_dir))
    g = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6), r["last_ts"])
        for r in got.collect()
    }
    w = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6), r["last_ts"])
        for r in want.collect()
    }
    assert g == w and len(g) > 5


def test_stream_dedup_recovers_single_copy(spark, tmp_path):
    """A doubled (replayed) source drains to exactly the distinct
    events — and a TRIPLED source to the same."""
    from pyspark.sql import Row

    from orionbelt_ontology_builder_spark.streaming import ingest as ST

    import datetime as dt

    rows = [
        Row(event_id=i, ts=dt.datetime(2026, 1, 1, 0, i), user_id=i % 3,
            event_type="t", value=float(i), props="{}")
        for i in range(20)
    ]
    ev = spark.createDataFrame(rows, ST.EVENTS_SCHEMA)
    d = str(tmp_path / "dup")
    for _ in range(3):
        ev.write.mode("append").parquet(d)
    out = ST.dedup_events_stream(spark, d)
    assert out.count() == 20
    assert sorted(r["event_id"] for r in out.collect()) == list(range(20))


def test_streaming_distinct_users_hll_envelope(spark, tmp_path):
    """The drained streaming-HLL estimate lands inside the m=256 error
    envelope of the exact per-type distinct-user count."""
    import pandas as pd

    from pyspark.sql import functions as F
    from orionbelt_ontology_builder_spark.streaming import ingest as ST

    sf = "/root/testdata/sf0.001"
    staged = str(tmp_path / "ev")
    ev = spark.read.parquet(f"{sf}/events.parquet")
    ev.write.mode("overwrite").parquet(staged)
    got = {
        r["event_type"]: r["est_users"]
        for r in ST.streaming_distinct_users(spark, staged).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for t, est in got.items():
        assert abs(est / exact[t] - 1.0) < 0.20, (t, est, exact[t])


def test_sessionize_stream_matches_batch_and_boundary(spark, tmp_path):
    """session_window drain == batch twin row-for-row, and the
    half-open boundary rule holds: an event exactly `gap` after the
    previous one opens a NEW session."""
    import datetime as dt

    from pyspark.sql import Row

    events_dir = str(tmp_path / "events")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # two lands -> multi-micro-batch drain with session state merging
    ev.filter("event_id % 2 = 0").write.parquet(events_dir)
    ev.filter("event_id % 2 = 1").write.mode("append").parquet(events_dir)

    got = [
        tuple(r)
        for r in ST.sessionize_stream(spark, events_dir).collect()
    ]
    want = [
        tuple(r)
        for r in ST.sessionize_batch(spark.read.parquet(events_dir))
        .orderBy("user_id", "session_start")
        .collect()
    ]
    assert got == want and len(got) > 100

    # boundary: exactly-gap MERGES (touching windows), gap+1s breaks
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        Row(event_id=0, ts=base, user_id=1, event_type="t", value=1.0,
            props="{}"),
        Row(event_id=1, ts=base + dt.timedelta(minutes=30), user_id=1,
            event_type="t", value=1.0, props="{}"),  # touching -> merges
        Row(event_id=2, ts=base + dt.timedelta(minutes=60, seconds=1),
            user_id=1, event_type="t", value=1.0, props="{}"),  # breaks
    ]
    tiny = spark.createDataFrame(rows, ST.EVENTS_SCHEMA)
    sess = ST.sessionize_batch(tiny).orderBy("session_start").collect()
    assert [r["n_events"] for r in sess] == [2, 1]
    assert sess[0]["session_end"] == base + dt.timedelta(minutes=60)
    # and the DuckDB twin agrees on the same boundary fixture
    import duckdb

    con = duckdb.connect()
    con.register("events", tiny.toPandas())
    o = con.execute(ST.sessionize_oracle()).fetchall()
    assert [r[3] for r in o] == [2, 1]


def test_stream_cdc_apply_matches_batch(spark, tmp_path):
    """Streaming MERGE INTO == batch cdc_apply on the same changelog
    (winner agg is associative, so micro-batching can't change it)."""
    import datetime as dt

    from orionbelt_ontology_builder_spark.operators import temporal as T
    from orionbelt_ontology_builder_spark.streaming import ingest as ST

    t1, t2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
    chg_rows = [
        (1, "U", t1, 1, 11.0), (1, "U", t2, 2, 12.0),
        (2, "D", t1, 1, 0.0), (9, "I", t1, 1, 90.0),
    ]
    schema = "key long, op string, ts timestamp, seq long, val double"
    chg = spark.createDataFrame(chg_rows, schema)
    chg_dir = str(tmp_path / "chg")
    chg.write.parquet(chg_dir)
    snap = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "key long, val double"
    )
    stream = spark.readStream.schema(schema).parquet(chg_dir)
    got = sorted(tuple(r) for r in
                 ST.stream_cdc_apply(spark, stream, snap).collect())
    want = sorted(tuple(r) for r in T.cdc_apply(snap, chg).collect())
    assert got == want
    assert [g[0] for g in got] == [1, 3, 9]  # 2 deleted


def test_nt_ingest_stream_equals_batch(spark, tmp_path):
    from orionbelt_ontology_builder_spark import fixtures as FX
    from orionbelt_ontology_builder_spark.sources import ntriples as NT
    from orionbelt_ontology_builder_spark.streaming import ingest as ST

    d = str(tmp_path / "nt")
    NT.write_nt(FX.fixture_triples(spark, "populated_om"), d)
    # plant one malformed line shard: the codec gate must drop it
    (tmp_path / "nt" / "junk.txt").write_text(
        "<http://x> <http://y> .\nnot a triple at all\n"
    )
    streamed = {(r["pred"], r["obj_kind"]): r["n_triples"]
                for r in ST.nt_ingest_stream(spark, d).collect()}
    batch = {(r["pred"], r["obj_kind"]): r["n_triples"]
             for r in ST.nt_ingest_batch(spark, d).collect()}
    assert streamed == batch and len(streamed) > 0
