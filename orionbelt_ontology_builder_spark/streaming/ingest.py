"""Structured-Streaming frontier for the KG pipeline + windowed event
aggregation (SURVEY.md §2.11: the reference has no streaming surface, so
this is the engine's *incremental-ingest* addition, not a parity item).

Two shapes:

* ``incremental_extraction`` — file-source stream over a pages
  directory; each micro-batch runs the SAME batch extraction
  (`pipeline.extract.extract_raw_triples`) via ``foreachBatch`` and
  appends raw triples partitioned by batch.  ``Trigger.AvailableNow``
  drains whatever is present and stops — deterministic for tests, and
  on a cluster the identical query runs continuously against a landing
  bucket.  Re-running picks up only NEW files (checkpointed source
  offsets) — this composes with the batch checkpoint manifest
  (`pipeline.materialize`) for exactly-once edge production.
* ``windowed_event_counts`` — watermarked tumbling-window aggregation
  over an event stream (the late-data-tolerant rollup shape);
  ``availableNow`` + memory sink makes it assertable against the
  equivalent batch GROUP BY (same results by the replay-determinism
  property of watermarked aggs on a finite drained stream).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import PAGES_SCHEMA

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)

#: shuffle width for STATEFUL drains.  A streaming aggregation opens
#: one state-store instance per shuffle partition and pays its
#: open/commit on every micro-batch; unlike batch shuffles this width
#: is also FROZEN into the checkpoint, so production streams size it
#: deliberately rather than inheriting the batch session default
#: (measured here: 64 -> 8 partitions cuts a one-batch availableNow
#: drain ~40% with state of a few thousand keys).
STATE_PARTITIONS = 8


class _state_width:
    """Temporarily pin spark.sql.shuffle.partitions while a stateful
    streaming query STARTS (the width is captured at start time);
    restores the session value afterwards."""

    def __init__(self, spark: SparkSession, n: int = STATE_PARTITIONS):
        self.spark, self.n = spark, n

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)
        return False


def incremental_extraction(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
) -> int:
    """Drain all currently-available page files into raw-triple parquet;
    returns number of micro-batches processed.  Restart-safe: source
    offsets live in the stream checkpoint."""
    from ..pipeline.extract import extract_raw_triples

    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_stream_ckpt")
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .parquet(pages_dir)
    )
    n_batches = {"n": 0}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        raw = extract_raw_triples(batch_df)
        raw.write.mode("append").parquet(os.path.join(out_dir, "raw_triples"))
        n_batches["n"] += 1

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


def windowed_event_counts_stream(
    spark: SparkSession,
    events_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Drain an event directory through a watermarked tumbling-window
    aggregation; returns the completed result as a DataFrame
    (win_start, event_type, n, total_value)."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "total_value")
    )
    name = "win_counts_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def windowed_event_counts_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """The batch twin of the streaming agg (same plan minus watermark) —
    used as the differential oracle for the drained stream."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "total_value")
    )


# ------------------------------------------------------------------ #
# custom stateful operator: applyInPandasWithState
# ------------------------------------------------------------------ #

USER_TOTALS_OUT = (
    "user_id bigint, n_events bigint, total_value double, last_ts timestamp"
)
USER_TOTALS_STATE = "n bigint, total double, last_ts timestamp"


def stateful_user_totals_stream(
    spark: SparkSession, events_dir: str
) -> DataFrame:
    """Running per-user event totals as a CUSTOM stateful streaming
    operator (``applyInPandasWithState``) — the engine's example of the
    shape Spark's built-in streaming aggs can't express (arbitrary
    per-key state transition logic; here a simple fold so the batch twin
    below stays an exact oracle).

    State: (n, total, last_ts) per ``user_id``; each micro-batch emits
    the updated running totals for every key it touched (update mode).
    Draining a finite directory with ``availableNow`` and keeping the
    LAST emission per key equals the batch ``groupBy`` — the
    differential test in ``tests/test_streaming.py``.

    Scale: state lives in the state store partitioned by key (RocksDB
    on a cluster); a micro-batch shuffles only its own events by
    ``user_id`` — no growing shuffle, state size O(distinct keys)."""
    import pandas as pd  # noqa: F401 (Arrow batches)
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    def update(key, pdfs, state: GroupState):
        n, total, last = (
            state.get if state.exists else (0, 0.0, None)
        )
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = pdf["ts"].max()
            last = mx if last is None or mx > last else last
        state.update((n, total, last))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [last],
            }
        )

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    out = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=USER_TOTALS_OUT,
            stateStructType=USER_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = "user_totals_sink"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode sink appends one row per (key, batch); the running
    # total is monotone in n_events, so max_by keeps the final state
    sink = spark.table(name)
    return (
        sink.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
            F.max_by("last_ts", "n_events").alias("last_ts"),
        )
        .orderBy("user_id")
    )


def user_totals_batch(events: DataFrame) -> DataFrame:
    """Batch twin of the stateful fold — the differential oracle."""
    return (
        events.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("user_id")
    )


# ------------------------------------------------------------------ #
# streaming dedup: exactly-once recovery of a replayed source
# ------------------------------------------------------------------ #


def dedup_events_stream(
    spark: SparkSession, events_dir: str, watermark: str = "24 hours"
) -> DataFrame:
    """Drain ``events_dir`` — which may contain the same records many
    times (replayed WARC dumps, at-least-once upstream delivery) —
    through streaming ``dropDuplicates`` on the event key, returning
    each event exactly once.

    Uses ``dropDuplicatesWithinWatermark`` (not plain
    ``dropDuplicates``): Spark only evicts streaming-dedup state by
    watermark when the API is the within-watermark variant (or the
    event-time column is part of the dedup keys), so the plain form
    would grow state with stream length and also *filter* late input
    rows — an event whose every copy lands in a later micro-batch
    with an old ``ts`` would be silently lost.  Within-watermark
    semantics instead guarantee exactly-once for duplicates arriving
    inside the ``watermark`` window, never drop a first-seen record,
    and keep state bounded by the duplication window, not the stream
    length — the property that makes this the ingest-side twin of
    ``datapipe.dedup.exact_dedup_groups`` at unbounded-corpus scale.
    Deterministic output: duplicate rows are bit-identical per key,
    so WHICH copy survives is unobservable and the drained result
    equals the distinct source (the differential oracle reads the
    single-copy table)."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    dd = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    name = "dedup_events_sink"
    q = (
        dd.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# ------------------------------------------------------------------ #
# streaming sketch: per-type distinct-user HLL registers
# ------------------------------------------------------------------ #


def streaming_distinct_users(
    spark: SparkSession, events_dir: str
) -> DataFrame:
    """(event_type, est_users) — per-event-type distinct-user estimate
    where the STREAMING STATE is the HLL register table: groupBy
    (event_type, bucket) max(rho) is a bounded-state streaming
    aggregation (256 rows per type, forever), which is the entire
    point of sketches in a stream — exact distinct state grows with
    users, register state does not.  Drained with availableNow into a
    memory sink; the estimator (identical integer harmonic sum +
    linear-counting branch as ``sketches.hll_distinct``) runs batch-
    side over the drained registers.

    The paired oracle recomputes registers + estimator from the events
    view in DuckDB (deterministic integers), and the batch exact count
    is asserted against the estimate in pytest within the HLL error
    envelope."""
    from ..datapipe.sketches import hll_estimate, hll_register_parts

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    bucket, rho = hll_register_parts(F.col("user_id"))
    regs = (
        stream.select("event_type", bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    name = "hll_regs_sink"
    q = (
        regs.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        hll_estimate(spark.table(name), ["event_type"])
        .select("event_type", F.col("est").alias("est_users"))
        .orderBy("event_type")
    )


def streaming_distinct_users_oracle() -> str:
    m = 256
    alpha = 0.7213 / (1.0 + 1.079 / m)
    alpha_c = repr(alpha * m * m * (1 << 25))
    h = "md5(user_id::VARCHAR)"
    w = f"('0x' || substr({h}, 3, 6))::BIGINT"
    return f"""
WITH regs AS (
  SELECT event_type, ('0x' || substr({h}, 1, 2))::BIGINT AS bucket,
    max(CASE WHEN {w} = 0 THEN 25 ELSE 25 - len(bin({w})) END) AS r
  FROM events GROUP BY event_type, bucket),
summed AS (
  SELECT event_type,
    (sum((2::BIGINT ^ (25 - r))::BIGINT)::BIGINT
      + ({m} - count(*)) * {1 << 25})::BIGINT AS int_sum,
    ({m} - count(*))::BIGINT AS v_zero
  FROM regs GROUP BY event_type)
SELECT event_type,
  CASE WHEN ({alpha_c} / int_sum) <= {2.5 * m} AND v_zero > 0
       THEN {float(m)} * ln({float(m)} / v_zero)
       ELSE {alpha_c} / int_sum END AS est_users
FROM summed ORDER BY event_type
"""


# ------------------------------------------------------------------ #
# stream-static enrichment join
# ------------------------------------------------------------------ #


def stream_static_enrich(
    spark: SparkSession, events_dir: str, dim: DataFrame
) -> DataFrame:
    """(segment, event_type, n, total_value) — the stream-static join
    shape: a streaming event source LEFT-joined to a small static
    dimension (user -> market segment), then aggregated.  The static
    side is broadcast, so every micro-batch enriches map-side — no
    stream-side shuffle before the aggregation, and the dimension can
    be refreshed between restarts without touching the stream state.
    This is the canonical 100 TB enrichment plan: a trillion-event
    stream never shuffles against a million-row dimension.

    Events whose user has no dimension row keep flowing with segment
    ``UNKNOWN`` (left join + coalesce) — an inner join would silently
    drop them, the classic enrichment-loss bug.  Drained with
    ``availableNow`` into a memory sink; the batch twin (identical
    join + GROUP BY over the parquet) is the differential oracle."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    d = F.broadcast(
        dim.select(
            F.col("c_custkey").alias("dim_key"),
            F.col("c_mktsegment").alias("dim_segment"),
        )
    )
    joined = stream.join(d, stream.user_id == d.dim_key, "left")
    agg = (
        joined.groupBy(
            F.coalesce("dim_segment", F.lit("UNKNOWN")).alias("segment"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )
    name = "enrich_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("segment", "event_type")


def stream_static_enrich_oracle() -> str:
    return """
SELECT coalesce(c_mktsegment, 'UNKNOWN') AS segment, event_type,
       count(*) AS n, sum(value) AS total_value
FROM events LEFT JOIN customer ON user_id = c_custkey
GROUP BY 1, 2 ORDER BY segment, event_type
"""


# ------------------------------------------------------------------ #
# stream-stream interval join
# ------------------------------------------------------------------ #


def stream_stream_pairs(
    spark: SparkSession,
    events_dir: str,
    first_type: str = "click",
    then_type: str = "purchase",
    within: str = "1 hour",
    watermark: str = "90 days",
) -> DataFrame:
    """(user_id, first_id, then_id) — watermarked stream-stream inner
    join: every ``then_type`` event joined to each same-user
    ``first_type`` event it follows within ``within`` (attribution /
    conversion pairing).  Both sides carry event-time watermarks and
    the join predicate is a bounded time range, which is what lets
    Spark expire join state: a side's buffered rows are dropped once
    the other side's watermark passes their latest possible match —
    state stays O(events within the watermark horizon), not O(stream).

    The test/oracle configuration sets the watermark far beyond the
    fixture's time span so the drained result is exactly the batch
    self-join (no row can ever be late); a production deployment
    tightens it to hours and accepts the documented late-drop
    semantics.  ``availableNow`` + append sink; the batch twin is the
    same self-join as one SQL statement."""
    src = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    first = (
        src.filter(F.col("event_type") == first_type)
        .select(
            F.col("event_id").alias("first_id"),
            F.col("user_id"),
            F.col("ts").alias("first_ts"),
        )
        .withWatermark("first_ts", watermark)
    )
    then = (
        src.filter(F.col("event_type") == then_type)
        .select(
            F.col("event_id").alias("then_id"),
            F.col("user_id").alias("then_user"),
            F.col("ts").alias("then_ts"),
        )
        .withWatermark("then_ts", watermark)
    )
    pairs = first.join(
        then,
        (F.col("user_id") == F.col("then_user"))
        & (F.col("then_ts") >= F.col("first_ts"))
        & (F.col("then_ts") <= F.expr(f"first_ts + INTERVAL {within}")),
    ).select("user_id", "first_id", "then_id")
    name = "pairs_sink"
    q = (
        pairs.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("user_id", "first_id", "then_id")


def sessionize_batch(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """(user_id, session_start, session_end, n_events, total_value) —
    per-user sessionization with ``F.session_window``: consecutive
    events of one user belong to the same session while each starts
    at or before the previous session's end (= last event + gap); an
    event exactly ``gap`` after the previous one still MERGES (Spark
    treats touching windows as overlapping — verified by the boundary
    test in tests/test_streaming.py), so the break rule is strictly
    ``ts > prev_ts + gap``.  ``session_end`` is ``max(ts) + gap``,
    Spark's own window end.  One shuffle on ``user_id`` and the merge happens inside the
    aggregation operator — no self-join, no window-function sort pass
    over the whole corpus, which is what makes this the 100 TB
    clickstream plan.  The DuckDB twin is the classic gaps-and-islands
    construction (lag -> break flag -> running sum -> group)."""
    return (
        events.groupBy(
            F.session_window("ts", gap).alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(
    spark: SparkSession, events_dir: str, gap: str = "30 minutes"
) -> DataFrame:
    """The streaming form of :func:`sessionize_batch`: the same
    ``session_window`` aggregation over a file-source stream, drained
    with ``availableNow`` into a memory sink in *complete* mode.
    Complete mode keeps all session state resident, which is exactly
    right for a finite drain (the differential test asserts it equals
    the batch twin row-for-row); a continuous deployment switches to
    append mode + ``withWatermark`` so closed sessions emit once and
    their state is dropped when the watermark passes ``session_end``."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    agg = (
        stream.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    name = "session_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("user_id", "session_start")


def sessionize_oracle(gap_minutes: int = 30) -> str:
    """Gaps-and-islands twin: a session breaks only where the gap to
    the previous same-user event is STRICTLY greater than gap
    (session_window merges touching windows — an event at exactly
    prev+gap stays in the session); session_end = last + gap."""
    return f"""
WITH brk AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL {gap_minutes} MINUTE
              THEN 1 ELSE 0 END AS is_break
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
), isl AS (
  SELECT *, sum(is_break) OVER (PARTITION BY user_id ORDER BY ts, value
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM brk
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL {gap_minutes} MINUTE AS session_end,
       count(*) AS n_events, sum(value) AS total_value
FROM isl GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


def stream_stream_pairs_oracle(
    first_type: str = "click",
    then_type: str = "purchase",
    within: str = "1 hour",
) -> str:
    return f"""
SELECT a.user_id, a.event_id AS first_id, b.event_id AS then_id
FROM events a JOIN events b
  ON b.user_id = a.user_id
 AND a.event_type = '{first_type}' AND b.event_type = '{then_type}'
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL {within}
ORDER BY 1, 2, 3
"""


# ------------------------------------------------------------------ #
# streaming CDC state maintenance (MERGE INTO over a stream)
# ------------------------------------------------------------------ #

ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def stream_cdc_apply(
    spark: SparkSession, changelog_stream: DataFrame, snapshot: DataFrame
) -> DataFrame:
    """(key, val, src, n_changes) — the streaming twin of
    ``temporal.cdc_apply``: a CDC changelog arrives as a STREAM, the
    per-key winner (struct-max on (ts, seq)) is maintained as
    streaming aggregation state, and the drained state merges into the
    snapshot.  Law: identical output to batch ``cdc_apply`` over the
    same changelog — the winner agg is ASSOCIATIVE, so micro-batch
    boundaries can never change the result (the property that makes
    streaming MERGE INTO safe at all).

    ``changelog_stream`` must carry (key, op, ts, seq, val).

    Scale shape: state is one row per touched key (not per event);
    complete-mode drain here because the memory sink is the harness —
    a real deployment emits the same winners via foreachBatch MERGE
    into Iceberg, state bounded by watermark eviction."""
    latest = changelog_stream.groupBy("key").agg(
        F.max(F.struct("ts", "seq", "op", "val")).alias("w"),
        F.count(F.lit(1)).alias("n_changes"),
    )
    name = "cdc_state_sink"
    q = (
        latest.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from ..operators import temporal

    return temporal.cdc_merge(snapshot, spark.table(name))


def nt_ingest_stream(spark: SparkSession, nt_dir: str) -> DataFrame:
    """Streaming N-Triples ingestion: drain a directory of .nt shards
    through the SAME pure-projection codec batch ingestion uses
    (``sources.ntriples.parse_nt`` — stateless column expressions, so
    it applies to a ``readStream.text`` source unchanged), aggregated
    to per-(pred, obj_kind) triple counts.

    The crawl-follower shape: a fetcher keeps dropping NT shards into
    the landing directory; the stream picks up each file exactly once
    (source offsets in the checkpoint), malformed lines are dropped by
    the codec's full-line gate, and the running counts feed ingestion
    monitoring.  Returns the drained result (availableNow trigger) —
    equality with the batch twin over the same directory is the law
    the tests pin."""
    from ..sources.ntriples import parse_nt

    stream = spark.readStream.text(nt_dir)
    parsed = parse_nt(stream, column="value")
    agg = parsed.groupBy("pred", "obj_kind").agg(
        F.count(F.lit(1)).alias("n_triples")
    )
    name = "nt_ingest_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("pred", "obj_kind")


def nt_ingest_batch(spark: SparkSession, nt_dir: str) -> DataFrame:
    """Batch twin of :func:`nt_ingest_stream` — same codec, same agg."""
    from ..sources.ntriples import parse_nt

    parsed = parse_nt(spark.read.text(nt_dir), column="value")
    return (
        parsed.groupBy("pred", "obj_kind")
        .agg(F.count(F.lit(1)).alias("n_triples"))
        .orderBy("pred", "obj_kind")
    )


# ------------------------------------------------------------------ #
# streaming MinHash near-dup candidate detection
# ------------------------------------------------------------------ #

DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def stream_near_dedup(spark: SparkSession, docs_dir: str) -> DataFrame:
    """(doc_id, n_shadowed, all_bands) — documents that share at least
    one MinHash-LSH band bucket with a lower-id document: MinHash
    signatures computed AT INGEST with streaming state, banding and
    bucket-winner reduction on the drained signature table.

    This is near-dup detection as an *ingest-time* concern: the exact-
    dup twin is ``dedup_events_stream``; colliding docs are near-dup
    CANDIDATES (``n_shadowed`` buckets collide; ``all_bands`` = every
    band collides — the high-precision tier the batch verify would
    score first).

    Stream plan (r3 rework): shingles are EXPLODED statelessly, the
    n_seeds md5 hashes are plain whole-stage-codegen projections, and
    ONE stateful aggregation folds the per-doc signature minima
    (min is associative/commutative/idempotent, so the drain is
    order- and replay-insensitive — the law tests assert both).  The
    previous shape computed signatures as per-row higher-order-function
    projections: CodegenFallback, and CollapseProject re-inlined the
    per-seed md5 transform into every signature — a measured 4x
    interpreted-md5 blowup (~10 s/drain at sf0.1 vs ~2 s for this
    plan).  Only one stateful operator exists either way (the
    global-watermark multi-agg restriction).  State here is the
    per-doc signature row — exactly the table this stage exists to
    materialize (like ``stream_dedup``'s seen-set); a production
    endless stream emits it append-mode to the signature store and
    ages it with the store's retention, while the bounded bucket-winner
    state lives in the read-side reduction below.

    Read side after the drain: band hashes (BANDS md5s over the 12
    signature columns), bucket winners via min(doc_id), and the shadow
    join — the same read-side reduction the HLL register drain does
    for its estimator.  Values are bit-identical to batch
    ``minhash_signatures`` (min over duplicated shingles == min over
    the distinct set), so the DuckDB twin is unchanged."""
    from ..datapipe.dedup import BANDS, MINHASH_K, ROWS, SHINGLE, SLICES
    from ..datapipe.textstats import norm_col

    n_seeds = (MINHASH_K + SLICES - 1) // SLICES
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(docs_dir)
    # fan the (small) doc rows out BEFORE the explode+md5 stage — the
    # same stateless repartition batch minhash_signatures does: a
    # single landing file otherwise serializes the whole digest
    # computation through one task
    par = spark.sparkContext.defaultParallelism
    sh = (
        stream.repartition(par)
        .withColumn("norm", norm_col())
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(1,"
                    f" length(norm)-{SHINGLE - 1})),"
                    f" i -> substring(norm, i, {SHINGLE}))"
                )
            ).alias("s"),
        )
    )
    for m in range(n_seeds):
        sh = sh.withColumn(
            f"h{m}", F.md5(F.concat(F.lit(f"{m}:"), F.col("s")))
        )
    sigs = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.substring(
                    F.col(f"h{i // SLICES}"), 1 + 8 * (i % SLICES), 8
                )
            ).alias(f"sig_{i}")
            for i in range(MINHASH_K)
        ]
    )
    name = "near_dedup_sigs_sink"
    with _state_width(spark):
        q = (
            sigs.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    stbl = spark.table(name)

    bl = stbl.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat(
                            *[
                                F.col(f"sig_{b * ROWS + r}")
                                for r in range(ROWS)
                            ]
                        )
                    )
                    for b in range(BANDS)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    winners = bl.groupBy("band_idx", "band_hash").agg(
        F.min("doc_id").alias("winner")
    )
    return (
        bl.join(winners, ["band_idx", "band_hash"])
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("winner") < F.col("doc_id"), 1).otherwise(0)
            ).alias("n_shadowed")
        )
        .filter(F.col("n_shadowed") > 0)
        .withColumn("all_bands", F.col("n_shadowed") == BANDS)
        .orderBy("doc_id")
    )


def stream_near_dedup_oracle() -> str:
    """DuckDB twin over the ``documents`` view: identical signature /
    band / winner / shadow cascade (batch == drained stream because the
    winner agg is associative)."""
    from ..datapipe.dedup import BANDS, _sig_cte_sql

    legs = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, band_{b} AS band_hash FROM b2"
        for b in range(BANDS)
    )
    # b2 pins the signature computation once: DuckDB re-inlines a plain
    # CTE at every reference site, and the four band legs would each
    # recompute the md5 signature cascade otherwise (the engineering notes trap).
    return f"""
WITH {_sig_cte_sql().strip().rstrip()},
b2 AS MATERIALIZED (SELECT * FROM banded),
bl AS MATERIALIZED ({legs}),
winners AS (
  SELECT band_idx, band_hash, min(doc_id) AS winner
  FROM bl GROUP BY 1, 2)
SELECT bl.doc_id,
       sum(CASE WHEN w.winner < bl.doc_id THEN 1 ELSE 0 END)::BIGINT
         AS n_shadowed,
       sum(CASE WHEN w.winner < bl.doc_id THEN 1 ELSE 0 END) = {BANDS}
         AS all_bands
FROM bl JOIN winners w USING (band_idx, band_hash)
GROUP BY bl.doc_id
HAVING sum(CASE WHEN w.winner < bl.doc_id THEN 1 ELSE 0 END) > 0
ORDER BY doc_id"""
