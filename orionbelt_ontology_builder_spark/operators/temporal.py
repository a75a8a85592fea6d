"""Temporal operators Spark's DataFrame API lacks as built-ins: as-of
join, binned range join, hypertable rollup cascade, and
latest-snapshot-per-key.

Engine additions (the reference rdflib/Streamlit app has no temporal
surface); they exist because a Common-Crawl-scale KG pipeline needs
them constantly: crawls re-fetch the same url across snapshots
(``latest_snapshot`` / ``asof_join`` on ``warc_ts``), extraction
metrics land in maintenance/incident windows (``range_join_binned``),
and event telemetry rolls up through time resolutions
(``rollup_cascade``).  Each is expressed as a composition of existing
DataFrame ops — no Pandas UDF, no per-row Python — so Catalyst keeps
whole-stage codegen end to end.

Scale shapes:

* ``asof_join`` — the union trick: tag build/probe, ONE shuffle on the
  key (plus a build-side (key, ts) pre-aggregation when ``tiebreak``
  dedup is requested), one per-key window scan with
  ``last(ignorenulls)`` forward-fill.  Plan-asserted in
  ``tests/test_scale_plans.py``.
  No range explosion, no build-side replication; cost is the same
  sort-on-key any time-series semantics needs.  Per-key history is
  scanned sequentially inside its partition — at web scale the key
  (url, user) cardinality is huge, so parallelism comes from key
  count, not intra-key splitting.
* ``range_join_binned`` — interval bucketization: intervals explode to
  the fixed-width buckets they cover, points map to one bucket, and
  the join becomes an equi-join Catalyst can hash/broadcast (never a
  BroadcastNestedLoopJoin cartesian).  Replication factor =
  interval_length / bucket_width: pick the width near the median
  interval length so each interval lands in O(1) buckets.
* ``rollup_cascade`` — each coarser resolution re-aggregates the
  previous rollup, not the raw table: the day pass reads ~1/24th of
  the hour output, the month pass ~1/30th of that, so a 100 TB event
  table pays ONE full scan total.  All four summary aggregates
  (count/sum/min/max) are re-associable, which is what makes the
  cascade exact.
* ``latest_snapshot`` — one ``max_by(struct(row), struct(ts, tie))``
  aggregation: single shuffle, no sort, map-side partials (the
  window/row_number formulation pays shuffle + per-key sort instead).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "cube_summary",
    "pivot_event_counts",
    "latest_snapshot",
    "range_join_binned",
    "rollup_cascade",
    "scd2_intervals",
    "scd2_intervals_sql",
    "cohort_retention",
    "cohort_retention_sql",
    "session_stats",
    "sessionize",
]


def _keys(on: str | Sequence[str]) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def _us(c) -> F.Column:
    """Wall-clock microseconds since epoch, computed by component
    decomposition (days + time-of-day) rather than an epoch cast.

    Why not ``unix_micros(c.cast("timestamp"))``: parquet reads yield
    TIMESTAMP_NTZ in Spark 4 (which unix_micros rejects), and the cast
    detours through the SESSION timezone — in a DST zone the shift is
    not uniform, so gaps/lags/buckets would be wrong across a
    transition and diverge from the DuckDB oracle (whose ``epoch_us``
    on NTZ applies no shift).  Decomposition reads the NTZ value's own
    fields, so NTZ inputs are exact in ANY session timezone —
    identical to DuckDB's epoch_us.  For tz-aware TIMESTAMP inputs the
    fields are rendered in the session zone (wall-clock); in a UTC
    session that equals epoch micros."""
    day = F.unix_date(F.to_date(c)).cast("long") * F.lit(86_400_000_000)
    hm = (F.hour(c).cast("long") * 3600 + F.minute(c).cast("long") * 60) * F.lit(
        1_000_000
    )
    # extract(SECOND) is DECIMAL(8,6) incl. the microsecond fraction
    frac = (F.extract(F.lit("SECOND"), c) * 1_000_000).cast("long")
    return day + hm + frac


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str | Sequence[str],
    ts: str = "ts",
    payload: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_sec: float | None = None,
    suffix: str = "_b",
    tiebreak: str | None = None,
) -> DataFrame:
    """For every probe row, attach the nearest build row per key:
    ``backward`` = greatest build ``ts`` <= probe ``ts`` (the
    latest-snapshot-at-event-time join), ``forward`` = least build
    ``ts`` >= probe ``ts``.  Left semantics: unmatched probes keep
    null payload, as do matches farther than ``tolerance_sec``.

    Output = probe columns + ``{ts}{suffix}`` (matched build time) +
    each payload column as ``{col}{suffix}``.

    ``tiebreak``: build rows sharing (key, ts) are first collapsed to
    the max-``tiebreak`` row so the match is well-defined; without it,
    (key, ts) must already be unique on the build side.

    Differential oracle: DuckDB ``ASOF LEFT JOIN`` (native), which
    pins the semantics independently of this implementation.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = _keys(on)
    payload = list(
        payload
        if payload is not None
        else [c for c in build.columns if c not in (*keys, ts)]
    )
    if tiebreak is not None:
        picked = F.max_by(
            F.struct(*[F.col(c) for c in payload]), F.col(tiebreak)
        ).alias("__p")
        build = build.groupBy(*keys, ts).agg(picked).select(
            *keys, ts, *[F.col(f"__p.{c}").alias(c) for c in payload]
        )
    pay = F.struct(
        F.col(ts).alias(f"{ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
    )
    b = build.select(
        *keys,
        F.col(ts).alias("__ats"),
        F.lit(0).alias("__side"),
        pay.alias("__pay"),
    )
    p = probe.select(
        "*", F.col(ts).alias("__ats"), F.lit(1).alias("__side")
    ).withColumn("__pay", F.lit(None).cast(b.schema["__pay"].dataType))
    u = p.unionByName(b, allowMissingColumns=True)
    # at equal __ats the build row (__side 0) sorts before the probe,
    # so equality matches in both directions
    order = (
        [F.col("__ats").asc(), F.col("__side").asc()]
        if direction == "backward"
        else [F.col("__ats").desc(), F.col("__side").asc()]
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = F.last("__pay", ignorenulls=True).over(w)
    if tolerance_sec is not None:
        mts = matched[f"{ts}{suffix}"]
        lag = (_us(F.col(ts)) - _us(mts)) / F.lit(1e6)
        if direction == "forward":
            lag = -lag
        matched = F.when(lag <= F.lit(float(tolerance_sec)), matched)
    return (
        u.withColumn("__m", matched)
        .filter(F.col("__side") == 1)
        .select(*probe.columns, F.col("__m.*"))
    )


def latest_snapshot(
    df: DataFrame,
    on: str | Sequence[str],
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """One row per key: the full row with the greatest ``ts`` (ties
    broken by max ``tiebreak``) — keep-the-latest-crawl-per-url.  One
    aggregation: ``max_by(struct(row), struct(ts[, tiebreak]))`` —
    single shuffle with map-side partials, no per-key sort."""
    keys = _keys(on)
    rest = [c for c in df.columns if c not in keys]
    order = F.struct(
        F.col(ts), *([F.col(tiebreak)] if tiebreak is not None else [])
    )
    return (
        df.groupBy(*keys)
        .agg(F.max_by(F.struct(*[F.col(c) for c in rest]), order).alias("__r"))
        .select(*keys, "__r.*")
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "istart",
    end: str = "iend",
    bucket_sec: int = 3600,
) -> DataFrame:
    """Inner point-in-interval join (half-open ``[start, end)``) as an
    EQUI-join: intervals explode to every ``bucket_sec``-wide bucket
    they cover, points map to their one bucket, then hash-join on the
    bucket and re-check the exact bounds.  Catalyst turns the naive
    formulation (``ts >= start AND ts < end``) into a
    BroadcastNestedLoopJoin — a cartesian that dies when neither side
    is tiny; this shape shuffles on the bucket key instead.

    Output = point columns + interval columns.  Column names must be
    disjoint across the two inputs.
    """
    w_us = int(bucket_sec) * 1_000_000
    ib = (
        intervals.filter(F.col(end) > F.col(start))  # empty ⇒ no match
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(_us(F.col(start)) / w_us),
                    # end is exclusive: last covered instant is end-1µs
                    F.floor((_us(F.col(end)) - 1) / w_us),
                )
            ),
        )
    )
    pb = points.withColumn(
        "__bucket", F.floor(_us(F.col(ts)) / w_us)
    )
    return (
        pb.join(ib, "__bucket")
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("__bucket")
    )


#: resolution name -> coarseness rank; re-aggregation is exact because
#: count/sum/min/max are associative over disjoint finer buckets —
#: PROVIDED each level's buckets nest inside the next.  ``week`` nests
#: in nothing coarser (ISO weeks straddle month/quarter/year
#: boundaries), so it is only valid as the LAST resolution.
_RES_ORDER = ["minute", "hour", "day", "week", "month", "quarter", "year"]


def rollup_cascade(
    events: DataFrame,
    ts: str = "ts",
    value: str = "value",
    resolutions: Sequence[str] = ("hour", "day", "month"),
) -> DataFrame:
    """Multi-resolution rollup (hypertable continuous-aggregate shape):
    ``(resolution, bucket, n_events, sum_value, min_value, max_value)``.
    The finest resolution aggregates the raw table; every coarser one
    re-aggregates the PREVIOUS rollup, so the raw table is scanned
    exactly once regardless of how many resolutions are asked for."""
    res = list(resolutions)
    if [r for r in res if r not in _RES_ORDER]:
        raise ValueError(f"unknown resolution in {res}")
    if res != sorted(res, key=_RES_ORDER.index):
        raise ValueError("resolutions must be ordered fine -> coarse")
    if "week" in res[:-1]:
        # week buckets straddle month/quarter/year boundaries: a
        # Monday-anchored week's counts would be assigned wholesale to
        # the month containing its START, silently double-counting —
        # weeks may terminate a cascade but never feed one.
        raise ValueError("'week' does not nest in coarser resolutions")
    cur = events.groupBy(
        F.date_trunc(res[0], F.col(ts)).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value).alias("sum_value"),
        F.min(value).alias("min_value"),
        F.max(value).alias("max_value"),
    )
    out = cur.select(F.lit(res[0]).alias("resolution"), "*")
    for r in res[1:]:
        cur = cur.groupBy(F.date_trunc(r, F.col("bucket")).alias("bucket")).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        out = out.unionByName(cur.select(F.lit(r).alias("resolution"), "*"))
    return out


def sessionize(
    events: DataFrame,
    on: str | Sequence[str] = "user_id",
    ts: str = "ts",
    gap_sec: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based session assignment: events of a key belong to the
    same session while consecutive gaps stay under ``gap_sec``; a
    bigger gap opens a new one.  Appends ``session_idx`` (1-based per
    key, in time order).

    The classic can't-say-it-in-one-SQL-clause operator: two stacked
    windows over ONE partitioning — ``lag(ts)`` marks session starts,
    a running sum of start flags numbers them — so Spark plans a
    single shuffle + per-key sort shared by both window functions.
    Deterministic given a ``tiebreak`` column ordering equal
    timestamps (pass the event id)."""
    keys = _keys(on)
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak is not None else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    gap_us = int(gap_sec) * 1_000_000
    new_sess = (
        F.when(F.lag(ts).over(w).isNull(), 1)
        .when(_us(F.col(ts)) - _us(F.lag(ts).over(w)) > gap_us, 1)
        .otherwise(0)
    )
    return events.withColumn(
        "session_idx",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    events: DataFrame,
    on: str | Sequence[str] = "user_id",
    ts: str = "ts",
    gap_sec: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """One row per (key, session_idx): event count, span start/end,
    and duration in seconds — the rollup a funnel/engagement pipeline
    reads.  Sessionize's window shuffle is reused by the aggregation
    (same key prefix), so the whole thing is one exchange."""
    keys = _keys(on)
    s = sessionize(events, on=on, ts=ts, gap_sec=gap_sec, tiebreak=tiebreak)
    return s.groupBy(*keys, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (
            (F.max(_us(F.col(ts))) - F.min(_us(F.col(ts)))) / F.lit(1e6)
        ).alias("duration_sec"),
    )


def event_transitions(
    events: DataFrame,
    on: str | Sequence[str] = "user_id",
    ts: str = "ts",
    typ: str = "event_type",
    gap_sec: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """(from_type, to_type, n, frac_of_from) — within-session Markov
    transition counts over the event stream, with each row's share of
    its from-type total.  The behavioural complement to
    ``session_stats``: funnels, loop detection, and anomalous-flow
    monitoring all read this matrix.

    ``lag(type)`` rides the SAME (key)-partitioned, ts-ordered window
    shuffle that sessionization uses; transitions crossing a session
    boundary are dropped (the lagged session_idx must match).  The
    final aggregation keys on the tiny (from, to) type space, so
    nothing ever buffers an unbounded group."""
    keys = _keys(on)
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak is not None else [])
    s = sessionize(events, on=on, ts=ts, gap_sec=gap_sec, tiebreak=tiebreak)
    w = Window.partitionBy(*keys).orderBy(*order)
    pairs = (
        s.withColumn("from_type", F.lag(typ).over(w))
        .withColumn("prev_sess", F.lag("session_idx").over(w))
        .filter(
            F.col("from_type").isNotNull()
            & (F.col("prev_sess") == F.col("session_idx"))
        )
        .select("from_type", F.col(typ).alias("to_type"))
    )
    cm = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    ).persist()
    tot = cm.groupBy("from_type").agg(F.sum("n").alias("from_total"))
    return (
        cm.join(F.broadcast(tot), "from_type")
        .select(
            "from_type", "to_type", "n",
            (F.col("n") / F.col("from_total")).alias("frac_of_from"),
        )
        .orderBy("from_type", "to_type")
    )


def event_transitions_sql(
    table: str = "events",
    on: str = "user_id",
    ts: str = "ts",
    typ: str = "event_type",
    gap_sec: int = 1800,
    tiebreak: str = "event_id",
) -> str:
    """DuckDB twin: identical two-window sessionization, lagged type,
    boundary filter, and the two aggregations."""
    gap_us = int(gap_sec) * 1_000_000
    return f"""
WITH flags AS (
  SELECT {on}, {ts}, {typ}, {tiebreak},
    CASE WHEN lag({ts}) OVER w IS NULL THEN 1
         WHEN epoch_us({ts}) - epoch_us(lag({ts}) OVER w) > {gap_us} THEN 1
         ELSE 0 END AS new_sess
  FROM {table}
  WINDOW w AS (PARTITION BY {on} ORDER BY {ts}, {tiebreak})),
sess AS (
  SELECT *, sum(new_sess) OVER
    (PARTITION BY {on} ORDER BY {ts}, {tiebreak}
     ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flags),
pairs AS (
  SELECT lag({typ}) OVER w AS from_type,
         lag(session_idx) OVER w AS prev_sess,
         session_idx, {typ} AS to_type
  FROM sess
  WINDOW w AS (PARTITION BY {on} ORDER BY {ts}, {tiebreak})),
cm AS MATERIALIZED (
  SELECT from_type, to_type, count(*)::BIGINT AS n
  FROM pairs
  WHERE from_type IS NOT NULL AND prev_sess = session_idx
  GROUP BY from_type, to_type),
tot AS (SELECT from_type, sum(n)::BIGINT AS from_total FROM cm GROUP BY from_type)
SELECT cm.from_type, cm.to_type, cm.n,
  cm.n / tot.from_total::DOUBLE AS frac_of_from
FROM cm JOIN tot ON cm.from_type = tot.from_type
ORDER BY cm.from_type, cm.to_type
"""


def funnel_completion(
    events: DataFrame,
    steps: Sequence[str],
    on: str | Sequence[str] = "user_id",
    ts: str = "ts",
    typ: str = "event_type",
    gap_sec: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """(step, step_name, n_sessions, frac_of_all, frac_of_prev) —
    strictly-ordered funnel completion per session: a session counts
    for step i when it contains ``steps[i]`` at a timestamp strictly
    after its earliest completion of step i-1.  The classic
    conversion-funnel query (view -> click -> purchase) that plain SQL
    needs k self-joins for — here each stage is one key-partitioned
    semi-ish join + min-aggregation on the (key, session) grain, and
    the final fraction table is k rows (the only window runs over
    those k rows, not over data)."""
    sk = [*_keys(on), "session_idx"]
    s = sessionize(
        events, on=on, ts=ts, gap_sec=gap_sec, tiebreak=tiebreak
    ).persist()
    total = s.select(*sk).distinct().count()
    reached = None
    rows = []
    for i, name in enumerate(steps):
        cand = s.filter(F.col(typ) == name)
        if reached is None:
            stage = cand.groupBy(*sk).agg(F.min(ts).alias("t"))
        else:
            stage = (
                cand.join(reached.withColumnRenamed("t", "prev_t"), sk)
                .filter(F.col(ts) > F.col("prev_t"))
                .groupBy(*sk)
                .agg(F.min(ts).alias("t"))
            )
        reached = stage.localCheckpoint(eager=True)
        rows.append((i + 1, name, reached.count()))
    spark = events.sparkSession
    out = spark.createDataFrame(
        rows, "step int, step_name string, n_sessions long"
    )
    prev = F.lag("n_sessions").over(
        Window.orderBy("step")  # k rows total — not a data-scale window
    )
    return out.select(
        "step", "step_name", "n_sessions",
        (F.col("n_sessions") / F.lit(float(total))).alias("frac_of_all"),
        (F.col("n_sessions") / F.coalesce(prev, F.lit(float(total))))
        .alias("frac_of_prev"),
    ).orderBy("step")


def funnel_completion_sql(
    steps: Sequence[str],
    table: str = "events",
    on: str = "user_id",
    ts: str = "ts",
    typ: str = "event_type",
    gap_sec: int = 1800,
    tiebreak: str = "event_id",
) -> str:
    """DuckDB twin: sessionize, then one chained min-after-previous CTE
    per step, then the k-row fraction table."""
    gap_us = int(gap_sec) * 1_000_000
    parts = [f"""flags AS (
  SELECT {on}, {ts}, {typ}, {tiebreak},
    CASE WHEN lag({ts}) OVER w IS NULL THEN 1
         WHEN epoch_us({ts}) - epoch_us(lag({ts}) OVER w) > {gap_us} THEN 1
         ELSE 0 END AS new_sess
  FROM {table}
  WINDOW w AS (PARTITION BY {on} ORDER BY {ts}, {tiebreak}))""",
        f"""sess AS MATERIALIZED (
  SELECT *, sum(new_sess) OVER
    (PARTITION BY {on} ORDER BY {ts}, {tiebreak}
     ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flags)""",
        f"""tot AS (SELECT count(*)::DOUBLE AS n FROM
  (SELECT DISTINCT {on}, session_idx FROM sess))""",
    ]
    for i, name in enumerate(steps, start=1):
        if i == 1:
            parts.append(f"""r1 AS MATERIALIZED (
  SELECT {on}, session_idx, min({ts}) AS t FROM sess
  WHERE {typ} = '{name}' GROUP BY {on}, session_idx)""")
        else:
            parts.append(f"""r{i} AS MATERIALIZED (
  SELECT s.{on}, s.session_idx, min(s.{ts}) AS t
  FROM sess s JOIN r{i - 1} p
    ON s.{on} = p.{on} AND s.session_idx = p.session_idx
  WHERE s.{typ} = '{name}' AND s.{ts} > p.t
  GROUP BY s.{on}, s.session_idx)""")
    unions = "\n  UNION ALL ".join(
        f"SELECT {i} AS step, '{name}' AS step_name,"
        f" (SELECT count(*) FROM r{i})::BIGINT AS n_sessions"
        for i, name in enumerate(steps, start=1)
    )
    parts.append(f"counts AS ({unions})")
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT step, step_name, n_sessions,
  n_sessions / tot.n AS frac_of_all,
  n_sessions / coalesce(lag(n_sessions::DOUBLE) OVER (ORDER BY step), tot.n)
    AS frac_of_prev
FROM counts CROSS JOIN tot ORDER BY step
"""
    )


def event_rate_anomaly(
    events: DataFrame,
    ts: str = "ts",
    trailing: int = 24,
    min_history: int = 6,
) -> DataFrame:
    """(bucket, n_events, base_mean, base_std, z) — hourly event counts
    scored against their trailing ``trailing``-hour mean/std (sample
    std; rows with fewer than ``min_history`` preceding hours are
    dropped — no z-score without a baseline).  The stream-health
    monitor: ingestion gaps, crawler storms, and clock bugs all
    surface as |z| spikes.

    The only window runs over the HOURLY bucket series — bounded by
    the time dimension (8,760 rows/year), not by data volume, so the
    unpartitioned ordering is safe at any corpus size; the data-scale
    work is one map-side-combinable groupBy(hour)."""
    hourly = (
        events.select(F.date_trunc("hour", F.col(ts)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = (
        Window.orderBy("bucket")
        .rowsBetween(-trailing, -1)
    )
    scored = hourly.select(
        "bucket",
        "n_events",
        F.avg("n_events").over(w).alias("base_mean"),
        F.stddev_samp("n_events").over(w).alias("base_std"),
        F.count(F.lit(1)).over(w).alias("n_hist"),
    )
    return (
        scored.filter(
            (F.col("n_hist") >= min_history) & (F.col("base_std") > 0)
        )
        .select(
            "bucket", "n_events", "base_mean", "base_std",
            ((F.col("n_events") - F.col("base_mean")) / F.col("base_std"))
            .alias("z"),
        )
        .orderBy("bucket")
    )


def event_rate_anomaly_sql(
    table: str = "events",
    ts: str = "ts",
    trailing: int = 24,
    min_history: int = 6,
) -> str:
    """DuckDB twin: identical hourly rollup + trailing window (DuckDB
    ``stddev`` is the sample form, matching Spark ``stddev_samp``)."""
    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', {ts}) AS bucket, count(*)::BIGINT AS n_events
  FROM {table} GROUP BY 1),
scored AS (
  SELECT bucket, n_events,
    avg(n_events) OVER w AS base_mean,
    stddev(n_events) OVER w AS base_std,
    count(*) OVER w AS n_hist
  FROM hourly
  WINDOW w AS (ORDER BY bucket
               ROWS BETWEEN {trailing} PRECEDING AND 1 PRECEDING))
SELECT bucket, n_events, base_mean, base_std,
  (n_events - base_mean) / base_std AS z
FROM scored
WHERE n_hist >= {min_history} AND base_std > 0
ORDER BY bucket
"""


def cohort_retention(
    events: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    max_weeks: int | None = 12,
) -> DataFrame:
    """(cohort_week, week_offset, n_active, cohort_size, retention) —
    classic weekly cohort-retention triangle: users are assigned to the
    week of their FIRST event; ``retention`` is the fraction of that
    cohort active again ``week_offset`` weeks later.

    The crawl-freshness twin of the product-analytics op: with
    url-as-user and fetch-as-event it answers "of the urls first seen
    in week W, what share were re-crawled k weeks on" — the coverage
    decay curve a Common-Crawl-scale pipeline tracks per source.

    Scale shape: ONE shuffle on the entity key.  Per-(user, week)
    activity is a distinct-style aggregation keyed by ``on``; the
    per-user cohort week is a second aggregation of THAT output on the
    same key (AQE reuses the partitioning — no new exchange), and the
    activity⋈cohort join is co-partitioned for free.  The final
    groupBy lands on (cohort_week, week_offset) — bounded by the time
    dimension squared, a few thousand rows for years of data — so the
    window fetching offset-0 cohort sizes runs on a tiny series, never
    on data-scale rows.  ``cohort_size`` needs no extra pass: every
    user is active in their own cohort week by construction, so the
    offset-0 row IS the cohort size."""
    # DATE (not timestamp) to match DuckDB's date_trunc('week') type.
    week = F.to_date(F.date_trunc("week", F.col(ts))).alias("week")
    activity = events.select(F.col(on).alias("uid"), week).distinct()
    cohort = activity.groupBy("uid").agg(F.min("week").alias("cohort_week"))
    joined = activity.join(cohort, "uid")
    offs = (F.datediff("week", "cohort_week") / 7).cast("int")
    counts = (
        joined.select("cohort_week", offs.alias("week_offset"), "uid")
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    if max_weeks is not None:
        counts = counts.filter(F.col("week_offset") <= max_weeks)
    w0 = Window.partitionBy("cohort_week")
    sized = counts.withColumn(
        "cohort_size",
        F.max(
            F.when(F.col("week_offset") == 0, F.col("n_active"))
        ).over(w0),
    )
    return sized.select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active") / F.col("cohort_size")).alias("retention"),
    ).orderBy("cohort_week", "week_offset")


def cohort_retention_sql(
    table: str = "events",
    on: str = "user_id",
    ts: str = "ts",
    max_weeks: int | None = 12,
) -> str:
    """DuckDB twin: identical distinct-activity → min-week cohort →
    offset counts → offset-0 window size."""
    cap = (
        f"WHERE week_offset <= {max_weeks}" if max_weeks is not None else ""
    )
    return f"""
WITH activity AS (
  SELECT DISTINCT {on} AS uid, date_trunc('week', {ts})::DATE AS week
  FROM {table}),
cohort AS (
  SELECT uid, min(week) AS cohort_week FROM activity GROUP BY uid),
counts AS (
  SELECT cohort_week,
    (date_diff('day', cohort_week::DATE, week::DATE) / 7)::INT
      AS week_offset,
    count(*)::BIGINT AS n_active
  FROM activity JOIN cohort USING (uid)
  GROUP BY 1, 2),
capped AS (SELECT * FROM counts {cap})
SELECT cohort_week, week_offset, n_active,
  max(CASE WHEN week_offset = 0 THEN n_active END)
    OVER (PARTITION BY cohort_week) AS cohort_size,
  n_active::DOUBLE
    / max(CASE WHEN week_offset = 0 THEN n_active END)
        OVER (PARTITION BY cohort_week) AS retention
FROM capped
ORDER BY cohort_week, week_offset
"""


# ------------------------------------------------------------------ #
# Multi-dimensional aggregates (CUBE / fixed-list pivot)
# ------------------------------------------------------------------ #

#: The events fixture's closed event-type vocabulary.  A FIXED pivot
#: value list matters at scale: ``pivot(col)`` without values runs an
#: eager distinct-scan job over the whole corpus just to learn the
#: column set; with the list the pivot is a pure one-pass conditional
#: aggregation (map-side partials, one shuffle).
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def cube_summary(events: DataFrame) -> DataFrame:
    """CUBE (event_type, hour-of-day) -> (n, total_value, gid): all
    four grouping sets computed in ONE pass — Spark's Expand operator
    replicates each input row per grouping set map-side, then a single
    hash aggregation (with partial combine) covers base cells,
    both one-dimensional margins and the grand total; no union of four
    separate GROUP BYs, no second shuffle.  ``grouping_id`` is the
    standard bitmask (first cube column = MSB), bit-identical to
    DuckDB's ``GROUPING(event_type, hr)``, and distinguishes a real
    NULL dimension value from a rolled-up one.

    Values aggregate as integer cents (events.value is exactly
    2-decimal): the grand-total cell sums the whole table, where
    double association order under partial aggregation straddles the
    %.6g boundary — integer sums are bit-stable (same trick as the
    hypertable rollup)."""
    e = events.select(
        "event_type",
        F.hour("ts").alias("hr"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return (
        e.cube("event_type", "hr")
        .agg(
            F.count("*").alias("n"),
            F.sum("cents").alias("total_cents"),
            F.grouping_id().alias("gid"),
        )
        .orderBy(
            "gid",
            F.col("event_type").asc_nulls_last(),
            F.col("hr").asc_nulls_last(),
        )
    )


def cube_summary_sql(table: str = "events") -> str:
    """DuckDB twin: GROUP BY CUBE with the same GROUPING bitmask."""
    return f"""
WITH ev AS (
  SELECT event_type, hour(ts) AS hr, round(value * 100)::BIGINT AS cents
  FROM {table})
SELECT event_type, hr, count(*) AS n, sum(cents)::BIGINT AS total_cents,
       GROUPING(event_type, hr) AS gid
FROM ev
GROUP BY CUBE(event_type, hr)
ORDER BY gid, event_type NULLS LAST, hr NULLS LAST
"""


def pivot_event_counts(events: DataFrame) -> DataFrame:
    """Per-user wide event-type profile over the FIXED
    :data:`EVENT_TYPES` vocabulary, compiled as a direct conditional
    aggregation — ``count(when(type = t))`` per column — NOT
    ``DataFrame.pivot``: even with an explicit value list, ``pivot``
    lowers to a two-level plan (pre-aggregate on (key, pivot col),
    shuffle, then PivotFirst on the key — two hash exchanges; plan
    test pins this one at a single exchange).  The fixed list also
    elides pivot's eager distinct-discovery job.  Absent combinations
    are 0, not NULL, so the wide row is directly usable as a feature
    vector."""
    return (
        events.groupBy("user_id")
        .agg(
            *[
                F.count(F.when(F.col("event_type") == t, 1)).alias(t)
                for t in EVENT_TYPES
            ]
        )
        .orderBy("user_id")
    )


def pivot_event_counts_sql(table: str = "events") -> str:
    """DuckDB twin: explicit conditional aggregation (the same plan
    Spark lowers the fixed-list pivot to)."""
    cols = ",\n       ".join(
        f"count(*) FILTER (WHERE event_type = '{t}') AS {t}"
        for t in EVENT_TYPES
    )
    return f"""
SELECT user_id,
       {cols}
FROM {table}
GROUP BY user_id
ORDER BY user_id
"""


def scd2_intervals(
    snapshots: DataFrame,
    on: str | Sequence[str] = "user_id",
    ts: str = "ts",
    attr: str = "event_type",
    tiebreak: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a snapshot/event
    stream: per key, collapse consecutive runs of the same ``attr``
    value into validity intervals ``[valid_from, valid_to)`` with a
    1-based ``version`` and an ``is_current`` flag on the open run.

    The crawl-versioning op (engine addition; the reference app keeps
    only the latest graph): re-fetches of a url across WARC snapshots
    become content *versions* — unchanged re-crawls collapse into one
    interval, and the result is the dimension table an as-of join
    (``asof_join``) probes.

    Scale shape: gaps-and-islands on ONE key partitioning —
    ``lag(attr)`` marks change points, a running sum numbers runs
    (both on the same window => one shuffle + one per-key sort), a
    key-local aggregation collapses runs (rides the same exchange,
    AQE-coalesced), and ``lead`` over the ~versions-sized result
    closes intervals.  No self-join, no range join; per-key history
    scans sequentially inside its partition, parallelism = key count
    (url cardinality at web scale).  Ties on ``ts`` are ordered by
    ``tiebreak`` (pass the event id) so runs are deterministic."""
    keys = _keys(on)
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak is not None else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = (
        F.when(F.lag(attr).over(w).isNull(), 1)
        .when(F.lag(attr).over(w) != F.col(attr), 1)
        .otherwise(0)
    )
    runs = snapshots.withColumn(
        "version",
        F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    # attr is constant within a run (a run IS a maximal equal-attr
    # streak), so min() is exact — no ordered first/min_by needed.
    iv = runs.groupBy(*keys, "version").agg(
        F.min(attr).alias(attr),
        F.min(ts).alias("valid_from"),
        F.count(F.lit(1)).alias("n_snapshots"),
    )
    w2 = Window.partitionBy(*keys).orderBy("version")
    return iv.select(
        *keys,
        "version",
        attr,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
        "n_snapshots",
    )


def scd2_intervals_sql(
    table: str = "events",
    on: str = "user_id",
    ts: str = "ts",
    attr: str = "event_type",
    tiebreak: str = "event_id",
) -> str:
    """DuckDB twin: identical lag/run-sum/collapse/lead cascade."""
    return f"""
WITH flagged AS (
  SELECT {on}, {ts}, {tiebreak}, {attr},
         CASE WHEN lag({attr}) OVER w IS NULL
                OR lag({attr}) OVER w <> {attr} THEN 1 ELSE 0 END AS chg
  FROM {table}
  WINDOW w AS (PARTITION BY {on} ORDER BY {ts}, {tiebreak})
),
runs AS (
  SELECT *, (sum(chg) OVER (PARTITION BY {on} ORDER BY {ts}, {tiebreak}
                            ROWS UNBOUNDED PRECEDING))::BIGINT AS version
  FROM flagged
),
iv AS (
  SELECT {on}, version,
         min({attr}) AS {attr},
         min({ts}) AS valid_from,
         count(*)::BIGINT AS n_snapshots
  FROM runs GROUP BY {on}, version
)
SELECT {on}, version, {attr}, valid_from,
       lead(valid_from) OVER w2 AS valid_to,
       lead(valid_from) OVER w2 IS NULL AS is_current,
       n_snapshots
FROM iv
WINDOW w2 AS (PARTITION BY {on} ORDER BY version)
ORDER BY {on}, version
"""


def merge_rollups(*rollups: DataFrame) -> DataFrame:
    """Incremental-view maintenance for :func:`rollup_cascade` output:
    merge any number of partial rollups (yesterday's materialized
    aggregate + today's delta rollup, per-shard rollups, per-region
    rollups) into the combined rollup WITHOUT rescanning raw data.

    All four summary aggregates are re-associable (count/sum re-sum,
    min/max re-min/max), which is exactly what makes the merge exact:
    ``merge_rollups(rollup(A), rollup(B)) == rollup(A UNION B)`` for
    disjoint A/B (law-tested).  ``avg_value`` is derived at read time
    from the merged sums — one double division; averages themselves
    are NOT mergeable and are never stored.

    Scale shape: inputs are already bucket-grained (days of hourly
    buckets, not raw events), so this is one union + one hash agg over
    ~thousands of rows per partition — the O(delta) nightly refresh, vs
    the O(corpus) rescan it replaces."""
    u = rollups[0]
    for r in rollups[1:]:
        u = u.unionByName(r)
    return (
        u.groupBy("resolution", "bucket")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .withColumn(
            "avg_value",
            F.col("sum_value") / F.col("n_events").cast("double"),
        )
    )


def merge_rollups_sql(table: str = "events", resolution: str = "hour") -> str:
    """DuckDB twin of the ``merge_rollups`` registry query: rollup the
    even/odd ``event_id`` halves independently (the 'materialized' and
    'delta' partials), then merge — proving the merged result without
    ever aggregating the union directly."""
    half = """
  SELECT date_trunc('{res}', ts) AS bucket, count(*)::BIGINT AS n_events,
         sum(round(value * 100)::BIGINT)::BIGINT AS sum_value,
         min(round(value * 100)::BIGINT) AS min_value,
         max(round(value * 100)::BIGINT) AS max_value
  FROM {table} WHERE event_id % 2 = {par}
  GROUP BY 1"""
    a = half.format(res=resolution, table=table, par=0)
    b = half.format(res=resolution, table=table, par=1)
    return f"""
WITH part_a AS ({a}),
part_b AS ({b}),
u AS (
  SELECT 'hour' AS resolution, * FROM part_a
  UNION ALL
  SELECT 'hour', * FROM part_b)
SELECT resolution, bucket,
       sum(n_events)::BIGINT AS n_events,
       sum(sum_value)::BIGINT AS sum_value,
       min(min_value) AS min_value,
       max(max_value) AS max_value,
       sum(sum_value) / CAST(sum(n_events) AS DOUBLE) AS avg_value
FROM u GROUP BY 1, 2
ORDER BY resolution, bucket
"""


def state_durations(
    snapshots: DataFrame,
    on: str | Sequence[str] = "user_id",
    ts: str = "ts",
    attr: str = "event_type",
    tiebreak: str | None = None,
) -> DataFrame:
    """Per (key, state): total seconds spent in each ``attr`` value
    across CLOSED SCD2 intervals, plus version/snapshot counts and an
    open-interval flag — the time-in-state rollup read off a crawl's
    content-version history (how long did this url serve that
    content?) or a user's lifecycle states.

    Composes :func:`scd2_intervals` (one key shuffle) with one more
    key-local aggregation that rides the same partitioning.  Durations
    sum as exact integer microseconds; ONE double division per output
    row converts to seconds — engine-portable."""
    iv = scd2_intervals(snapshots, on=on, ts=ts, attr=attr, tiebreak=tiebreak)
    keys = _keys(on)
    dur_us = F.when(
        F.col("valid_to").isNotNull(),
        _us(F.col("valid_to")) - _us(F.col("valid_from")),
    ).otherwise(F.lit(0))
    return (
        iv.groupBy(*keys, attr)
        .agg(
            F.count(F.lit(1)).alias("n_versions"),
            F.sum("n_snapshots").alias("n_snapshots"),
            F.sum(dur_us).alias("_us_total"),
            F.max(F.col("is_current").cast("int")).alias("has_open"),
        )
        .select(
            *keys,
            attr,
            "n_versions",
            "n_snapshots",
            (F.col("_us_total") / F.lit(1e6)).alias("closed_seconds"),
            F.col("has_open").cast("boolean").alias("has_open"),
        )
    )


def state_durations_sql(
    table: str = "events",
    on: str = "user_id",
    ts: str = "ts",
    attr: str = "event_type",
    tiebreak: str = "event_id",
) -> str:
    """DuckDB twin: the scd2 cascade as a subquery + the same agg."""
    inner = scd2_intervals_sql(table, on, ts, attr, tiebreak)
    return f"""
SELECT {on}, {attr},
       count(*)::BIGINT AS n_versions,
       sum(n_snapshots)::BIGINT AS n_snapshots,
       sum(CASE WHEN valid_to IS NOT NULL
                THEN epoch_us(valid_to) - epoch_us(valid_from)
                ELSE 0 END) / 1e6 AS closed_seconds,
       max(CASE WHEN is_current THEN 1 ELSE 0 END) = 1 AS has_open
FROM ({inner})
GROUP BY {on}, {attr}
ORDER BY {on}, {attr}
"""


def cdc_apply(snapshot: DataFrame, changelog: DataFrame) -> DataFrame:
    """(key, val, src, n_changes) — apply a CDC changelog to a
    materialized snapshot, the Iceberg/Delta ``MERGE INTO`` semantics
    as a pure DataFrame op: per key the changelog's latest entry by
    (ts, seq) wins — op 'D' deletes the key, 'I'/'U' upsert ``val`` —
    and untouched snapshot keys pass through.  ``src`` records what
    happened ('unchanged' | 'inserted' | 'updated'); ``n_changes``
    counts how contested the key was this batch.

    Inputs: ``snapshot(key, val)``, ``changelog(key, op, ts, seq,
    val)`` with (ts, seq) a total order per key (seq breaks same-ts
    ties — the log offset of a real CDC feed).

    Scale shape: the nightly-refresh workhorse — ONE aggregation keyed
    on the changelog key (struct-max rides the same shuffle as the
    count, map-side partials) + ONE full-outer equi-join against the
    snapshot.  No window, no driver materialization; with the snapshot
    bucketed by key (plans/bucketing.py) only the delta shuffles, so
    the refresh is O(changelog), not O(table) — the same law
    merge_rollups applies to aggregates."""
    latest = changelog.groupBy("key").agg(
        F.max(F.struct("ts", "seq", "op", "val")).alias("w"),
        F.count(F.lit(1)).alias("n_changes"),
    )
    return cdc_merge(snapshot, latest)


def cdc_merge(snapshot: DataFrame, latest: DataFrame) -> DataFrame:
    """The snapshot-merge half of :func:`cdc_apply`: ``latest`` is the
    per-key winner table (key, w struct(ts, seq, op, val), n_changes) —
    already aggregated, e.g. by a streaming struct-max state (the
    winner agg is associative, so partial winners merge exactly)."""
    snap = snapshot.select("key", F.col("val").alias("snap_val")).withColumn(
        "in_snap", F.lit(1)
    )
    return (
        snap.join(latest, "key", "full_outer")
        .filter(F.col("w").isNull() | (F.col("w.op") != F.lit("D")))
        .select(
            "key",
            F.coalesce(F.col("w.val"), F.col("snap_val")).alias("val"),
            F.when(F.col("w").isNull(), F.lit("unchanged"))
            .when(F.col("in_snap").isNull(), F.lit("inserted"))
            .otherwise(F.lit("updated"))
            .alias("src"),
            F.coalesce(F.col("n_changes"), F.lit(0)).alias("n_changes"),
        )
        .orderBy("key")
    )


def cdc_apply_sql(snapshot_cte: str, changelog_cte: str) -> str:
    """DuckDB twin: ``snapshot_cte`` defines ``snap0(key, val)``,
    ``changelog_cte`` defines ``chg(key, op, ts, seq, val)``; same
    struct-max winner + full-outer coalesce cascade."""
    return f"""
WITH {snapshot_cte.strip()},
{changelog_cte.strip()},
latest AS (
  SELECT key,
    max(struct_pack(ts := ts, seq := seq, op := op, val := val)) AS w,
    count(*)::BIGINT AS n_changes
  FROM chg GROUP BY key),
snap AS (SELECT key, val AS snap_val, 1 AS in_snap FROM snap0)
SELECT coalesce(s.key, l.key) AS key,
  coalesce((l.w).val, s.snap_val) AS val,
  CASE WHEN l.w IS NULL THEN 'unchanged'
       WHEN s.in_snap IS NULL THEN 'inserted'
       ELSE 'updated' END AS src,
  coalesce(l.n_changes, 0)::BIGINT AS n_changes
FROM snap s FULL OUTER JOIN latest l ON s.key = l.key
WHERE l.w IS NULL OR (l.w).op <> 'D'
ORDER BY key
"""


def ewma_events(
    events: DataFrame,
    alpha: float = 0.5,
    n_lags: int = 8,
    key: str = "user_id",
    ts: str = "ts",
    val: str = "value",
    tiebreak: str = "event_id",
) -> DataFrame:
    """(tiebreak, key, ts, value, ewma) — bounded-window exponentially
    weighted moving average per key: the current value and its
    ``n_lags - 1`` predecessors combine with weights alpha*(1-alpha)^j,
    renormalized over the terms actually present (so the series head
    is an average of what exists, not biased toward 0).  The standard
    time-decayed per-entity feature (activity level, crawl rate,
    engagement) that a recursive EWMA cannot express in parallel SQL —
    truncating at n_lags makes it a FIXED expression tree, identical
    in both engines (the (1-alpha)^n_lags tail is provably <= 0.4% of
    the mass at the defaults).

    Scale shape: ONE key-partitioned window sort feeds all n_lags
    lag() calls (Spark collapses same-window functions into a single
    Window operator) — one shuffle, no self-joins, no recursion."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    num = None
    den = None
    for j in range(n_lags):
        wt = alpha * (1.0 - alpha) ** j
        x = F.col(val) if j == 0 else F.lag(val, j).over(w)
        term = F.coalesce(x * F.lit(wt), F.lit(0.0))
        gate = F.when(x.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = gate if den is None else den + gate
    return events.select(
        tiebreak,
        key,
        ts,
        F.col(val).alias("value"),
        (num / den).alias("ewma"),
    ).orderBy(key, ts, tiebreak)


def ewma_events_sql(
    table: str = "events",
    alpha: float = 0.5,
    n_lags: int = 8,
    key: str = "user_id",
    ts: str = "ts",
    val: str = "value",
    tiebreak: str = "event_id",
) -> str:
    """DuckDB twin: identical lag ladder and left-to-right addition
    order (weights as full-precision repr literals — both parsers bind
    the same doubles)."""
    nums, dens = [], []
    for j in range(n_lags):
        wt = repr(alpha * (1.0 - alpha) ** j)
        x = val if j == 0 else f"lag({val}, {j}) OVER w"
        nums.append(f"coalesce(({x}) * {wt}, 0.0)")
        dens.append(f"CASE WHEN ({x}) IS NOT NULL THEN {wt} ELSE 0.0 END")
    return f"""
SELECT {tiebreak}, {key}, {ts}, {val} AS value,
  ({" + ".join(nums)})
  / ({" + ".join(dens)}) AS ewma
FROM {table}
WINDOW w AS (PARTITION BY {key} ORDER BY {ts}, {tiebreak})
ORDER BY {key}, {ts}, {tiebreak}
"""


# ---------------------------------------------------------------------------
# Allen interval algebra (Allen, CACM 1983, public literature): the 13
# qualitative relations between proper intervals.  Temporal-KG
# construction needs them constantly — event spans extracted from
# crawls must be ordered/nested ("term-of-office during war",
# "acquisition meets rebrand") before they can become temporal edges.
# ---------------------------------------------------------------------------

ALLEN_RELATIONS = (
    "equals", "starts", "started_by", "finishes", "finished_by",
    "meets", "met_by", "contains", "during", "overlaps",
    "overlapped_by", "before", "after",
)

#: Shared CASE body over (sa, ea, sb, eb); equality cases first so the
#: boundary-coincidence relations win over the strict-order ones.
#: Exhaustive for proper intervals (sa<ea, sb<eb) — Spark SQL and
#: DuckDB evaluate the identical text.
_ALLEN_CASE = """CASE
  WHEN sa = sb AND ea = eb THEN 'equals'
  WHEN sa = sb AND ea < eb THEN 'starts'
  WHEN sa = sb THEN 'started_by'
  WHEN ea = eb AND sa > sb THEN 'finishes'
  WHEN ea = eb THEN 'finished_by'
  WHEN ea = sb THEN 'meets'
  WHEN eb = sa THEN 'met_by'
  WHEN sa < sb AND ea > eb THEN 'contains'
  WHEN sa > sb AND ea < eb THEN 'during'
  WHEN sa < sb AND sb < ea THEN 'overlaps'
  WHEN sb < sa AND sa < eb THEN 'overlapped_by'
  WHEN ea < sb THEN 'before'
  ELSE 'after'
END"""


def allen_relations(
    events: DataFrame,
    key: str = "user_id",
    attr: str = "event_type",
    ts: str = "ts",
) -> DataFrame:
    """(type_a, type_b, relation, n_pairs) — Allen-classify every pair
    of per-``key`` activity spans and count relation frequencies.

    A span is [min ts, max ts] of one ``attr`` value within one
    ``key``; degenerate point spans (single event) are dropped — Allen
    algebra is defined on proper intervals.  Pairs are formed WITHIN a
    key only (type_a < type_b lexicographically, each unordered pair
    classified once, from a's perspective).

    Scale shape: one (key, attr) aggregation builds the span table,
    then ONE self-equi-join on ``key`` — never a global interval join.
    Per-key span count is bounded by the attr vocabulary (event types,
    relation kinds), so the join fan-out is O(|attrs|²) per key — flat
    map-side work; the final count is a tiny keyed agg with map-side
    partials.  This is the partition-local pattern a 100 TB event
    table needs: pair formation never crosses the natural key."""
    spans = (
        events.groupBy(key, attr)
        .agg(F.min(ts).alias("istart"), F.max(ts).alias("iend"))
        .filter(F.col("iend") > F.col("istart"))
    )
    a = spans.select(
        F.col(key).alias("k"),
        F.col(attr).alias("type_a"),
        F.col("istart").alias("sa"),
        F.col("iend").alias("ea"),
    )
    b = spans.select(
        F.col(key).alias("k"),
        F.col(attr).alias("type_b"),
        F.col("istart").alias("sb"),
        F.col("iend").alias("eb"),
    )
    pairs = a.join(b, "k").filter(F.col("type_a") < F.col("type_b"))
    return (
        pairs.withColumn("relation", F.expr(_ALLEN_CASE))
        .groupBy("type_a", "type_b", "relation")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("type_a", "type_b", "relation")
    )


def allen_relations_sql(
    table: str = "events",
    key: str = "user_id",
    attr: str = "event_type",
    ts: str = "ts",
) -> str:
    """DuckDB twin — identical CASE text, identical span construction."""
    return f"""
WITH spans AS (
  SELECT {key} AS k, {attr} AS a,
         min({ts}) AS istart, max({ts}) AS iend
  FROM {table}
  GROUP BY 1, 2
  HAVING max({ts}) > min({ts}))
SELECT x.a AS type_a, y.a AS type_b,
  {_ALLEN_CASE.replace("sa", "x.istart").replace("ea", "x.iend")
              .replace("sb", "y.istart").replace("eb", "y.iend")} AS relation,
  count(*)::BIGINT AS n_pairs
FROM spans x JOIN spans y ON x.k = y.k AND x.a < y.a
GROUP BY 1, 2, 3
ORDER BY type_a, type_b, relation
"""


def coalesce_intervals(
    intervals: DataFrame,
    key: str = "user_id",
    start: str = "istart",
    end: str = "iend",
) -> DataFrame:
    """(key, island, istart, iend, n_merged) — union of overlapping or
    touching intervals per key (interval coalescing).

    The INTERVAL counterpart of point-event ``sessionize``: inputs
    carry durations and may nest or overlap arbitrarily (page validity
    windows, entity type spans), so gap-vs-threshold logic doesn't
    apply — an interval starts a new island iff it starts strictly
    after the running max end of everything before it.

    Scale shape: ONE shuffle on ``key``, then two window scans inside
    the partition (running max(end), then running sum of the new-island
    flag) — the gaps-and-islands idiom, same cost as scd2_intervals.
    Parallelism comes from key cardinality."""
    w = Window.partitionBy(key).orderBy(start, end)
    prev_max = F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = intervals.withColumn(
        "__new",
        F.when(prev_max.isNull() | (F.col(start) > prev_max), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy(key, "island")
        .agg(
            F.min(start).alias("istart"),
            F.max(end).alias("iend"),
            F.count("*").alias("n_merged"),
        )
        .orderBy(key, "island")
    )


def coalesce_intervals_sql(
    intervals_cte: str,
    key: str = "user_id",
    start: str = "istart",
    end: str = "iend",
) -> str:
    """DuckDB twin; ``intervals_cte`` defines ``intervals(...)``."""
    return f"""
WITH {intervals_cte.strip()},
flagged AS (
  SELECT *,
    CASE WHEN max({end}) OVER (PARTITION BY {key} ORDER BY {start}, {end}
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         OR {start} > max({end}) OVER (PARTITION BY {key}
         ORDER BY {start}, {end}
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS __new
  FROM intervals),
islands AS (
  SELECT *, sum(__new) OVER (PARTITION BY {key} ORDER BY {start}, {end}
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged)
SELECT {key}, island::BIGINT AS island,
  min({start}) AS istart, max({end}) AS iend,
  count(*)::BIGINT AS n_merged
FROM islands
GROUP BY 1, 2
ORDER BY {key}, island
"""


# ---------------------------------------------------------------------------
# Rolling-origin temporal evaluation folds
# ---------------------------------------------------------------------------


def temporal_folds(events: DataFrame, n_folds: int = 4) -> DataFrame:
    """(fold, split, n_rows, n_users, min_ts, max_ts) — rolling-origin
    evaluation folds (the forecasting-eval standard; Tashman 2000,
    public literature): the time axis is cut into ``n_folds + 1``
    equal-POPULATION segments by exact rank; fold i trains on segments
    [0..i] and tests on segment i+1 — every test row is strictly later
    than all of its train rows, the leakage rule hash-bucket splits
    cannot give time-series data.

    Exactness: segment of a row = ``(rank - 1) * (n_folds + 1) / n``
    over ``row_number() ORDER BY ts, event_id`` — pure integer
    arithmetic, no timestamp quantile interpolation, so both engines
    cut identically even with heavily tied timestamps.  One window
    sort + a fold fan-out bounded by n_folds + one keyed agg."""
    from pyspark.sql import Window

    n = events.count()
    # floor division explicitly: DuckDB CAST(double AS INT) ROUNDS
    # while Spark truncates — '//'-style floor on both sides instead
    seg = F.floor(
        (F.row_number().over(Window.orderBy("ts", "event_id")) - 1)
        * (n_folds + 1)
        / F.lit(n)
    ).cast("int")
    segged = events.select("event_id", "ts", "user_id").withColumn(
        "seg", seg
    )
    folds = segged.sparkSession.range(n_folds).select(
        (F.col("id") + 1).cast("int").alias("fold")
    )
    assigned = (
        segged.crossJoin(F.broadcast(folds))
        .filter(F.col("seg") <= F.col("fold"))
        .withColumn(
            "split",
            F.when(F.col("seg") == F.col("fold"), "test").otherwise("train"),
        )
    )
    return (
        assigned.groupBy("fold", "split")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("user_id").alias("n_users"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
        .orderBy("fold", "split")
    )


def temporal_folds_sql(events_src: str = "events", n_folds: int = 4) -> str:
    """DuckDB twin: identical rank-segment arithmetic and fold
    fan-out."""
    return f"""
n_cte AS (SELECT count(*)::BIGINT AS n FROM {events_src}),
segged AS (
  SELECT event_id, ts, user_id,
    CAST((row_number() OVER (ORDER BY ts, event_id) - 1)
         * {n_folds + 1} // (SELECT n FROM n_cte) AS INT) AS seg
  FROM {events_src}),
folds AS (SELECT unnest(range(1, {n_folds + 1}))::INT AS fold),
assigned AS (
  SELECT s.*, f.fold,
    CASE WHEN s.seg = f.fold THEN 'test' ELSE 'train' END AS split
  FROM segged s CROSS JOIN folds f
  WHERE s.seg <= f.fold)
SELECT fold, split, count(*)::BIGINT AS n_rows,
       count(DISTINCT user_id)::BIGINT AS n_users,
       min(ts) AS min_ts, max(ts) AS max_ts
FROM assigned
GROUP BY fold, split
ORDER BY fold, split"""
