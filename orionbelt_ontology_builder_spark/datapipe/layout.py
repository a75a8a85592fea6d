"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

At 100 TB the dominant query cost is scan I/O, and the lever is
file-level data skipping: parquet/Iceberg/Delta keep per-file min/max
stats per column, and a scan prunes every file whose stat range misses
the predicate.  Sorting by ONE column gives perfect skipping on that
column and none on any other; interleaving the bits of two (or more)
bucketed key columns into a single Z-value and range-partitioning by it
gives each file a small rectangle in the multi-dimensional key space —
both dimensions skip well (the same trick Delta's OPTIMIZE ZORDER and
Iceberg's z-ordering rewrite apply; public literature: Morton curves).

Engine shape: the Z-value is a pure projection (two global min/max
scalars broadcast into the scan, bit arithmetic per row — all
whole-stage-codegen), so at scale the layout job is
``df.repartitionByRange(n_files, zvalue).sortWithinPartitions(zvalue)
.write...`` — one range shuffle, no skew (the curve spreads uniformly
when the scaled dims do).  :func:`zorder_extents` is the audit query:
it buckets rows by Z-prefix exactly as the range writer would cut
files and reports each bucket's per-dimension extents — tight
rectangles = working layout, full-range extents = no skipping.

Everything is integer/IEEE-double arithmetic computed identically by
Spark and DuckDB, so the audit is oracle-paired bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zvalue_sql",
    "zorder_extents",
    "zorder_extents_oracle",
    "prune_estimate",
    "prune_estimate_oracle",
    "compaction_plan",
    "compaction_plan_sql",
]

BITS = 8          # per-dimension resolution (2^8 cells per axis)
BUCKET_BITS = 4   # file buckets = 2^4 (the range-writer cut points)


def zvalue_sql(d1: str, d2: str, bits: int, shl, shr) -> str:
    """Bit-interleave expression: ``bits`` low bits of the (already
    bucketed, non-negative) integer expressions ``d1``/``d2`` into a
    ``2*bits``-bit Morton code.  ``shl(x, n)`` / ``shr(x, n)`` emit the
    engine's shift syntax (Spark ``shiftleft``/``shiftright`` functions,
    DuckDB ``<<``/``>>`` operators); ``&`` and ``+`` are shared."""
    terms = []
    for i in range(bits):
        terms.append(shl(f"({shr(d1, i)} & 1)", 2 * i + 1))
        terms.append(shl(f"({shr(d2, i)} & 1)", 2 * i))
    return " + ".join(terms)


def _spark_shl(x: str, n: int) -> str:
    return f"shiftleft({x}, {n})"


def _spark_shr(x: str, n: int) -> str:
    return f"shiftright({x}, {n})"


def _duck_shl(x: str, n: int) -> str:
    return f"(({x}) << {n})"


def _duck_shr(x: str, n: int) -> str:
    return f"(({x}) >> {n})"


def _scale_sql(x: str, mn: str, mx: str, bits: int) -> str:
    """Scale ``x`` into 0..2^bits-1 given min/max columns — explicit
    DOUBLE casts so both engines run the identical IEEE expression;
    degenerate (constant) dimensions coalesce to cell 0."""
    top = (1 << bits) - 1
    return (
        f"coalesce(CAST(floor((CAST({x} AS DOUBLE) - CAST({mn} AS DOUBLE))"
        f" * {top} / nullif(CAST({mx} AS DOUBLE) - CAST({mn} AS DOUBLE),"
        f" CAST(0 AS DOUBLE))) AS BIGINT), 0)"
    )


def zorder_extents(
    events: DataFrame, bits: int = BITS, bucket_bits: int = BUCKET_BITS
) -> DataFrame:
    """(bucket, n_rows, d1_min, d1_max, d2_min, d2_max) — the layout
    audit over the events table with dims (user_id, event time).

    Each row's dims are scaled to 0..2^bits-1, bit-interleaved into a
    Z-value, and grouped by the Z-value's top ``bucket_bits`` bits —
    exactly the cut a ``repartitionByRange(2^bucket_bits, z)`` writer
    produces on uniformly spread keys.  The reported per-bucket extents
    are what parquet min/max stats would hold per file: the audit
    *is* the skipping story.

    Plan: one tiny global agg (4 scalars) broadcast into a scan
    projection, then one hash aggregation on the bucket id — two
    shuffles total, both trivially small; survives any scale-up."""
    # NTZ-safe wall-clock micros (temporal._us: parquet ts reads as
    # TIMESTAMP_NTZ in Spark 4; component decomposition matches
    # DuckDB's epoch_us in any session timezone).
    from ..operators.temporal import _us

    base = events.select("user_id", _us(F.col("ts")).alias("t_us"))
    ext = base.agg(
        F.min("user_id").alias("u_mn"),
        F.max("user_id").alias("u_mx"),
        F.min("t_us").alias("t_mn"),
        F.max("t_us").alias("t_mx"),
    )
    d1 = _scale_sql("user_id", "u_mn", "u_mx", bits)
    d2 = _scale_sql("t_us", "t_mn", "t_mx", bits)
    z = zvalue_sql("d1", "d2", bits, _spark_shl, _spark_shr)
    return (
        base.crossJoin(F.broadcast(ext))
        .select(F.expr(d1).alias("d1"), F.expr(d2).alias("d2"))
        .select(
            "d1",
            "d2",
            F.expr(
                _spark_shr(f"({z})", 2 * bits - bucket_bits)
            ).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("d1").alias("d1_min"),
            F.max("d1").alias("d1_max"),
            F.min("d2").alias("d2_min"),
            F.max("d2").alias("d2_max"),
        )
        .orderBy("bucket")
    )


def zorder_extents_oracle(
    bits: int = BITS, bucket_bits: int = BUCKET_BITS
) -> str:
    """DuckDB twin of :func:`zorder_extents` (identical arithmetic)."""
    d1 = _scale_sql("user_id", "u_mn", "u_mx", bits)
    d2 = _scale_sql("epoch_us(ts)", "t_mn", "t_mx", bits)
    z = zvalue_sql("d1", "d2", bits, _duck_shl, _duck_shr)
    return f"""
WITH ext AS (
  SELECT min(user_id) AS u_mn, max(user_id) AS u_mx,
         min(epoch_us(ts)) AS t_mn, max(epoch_us(ts)) AS t_mx
  FROM events),
d AS (
  SELECT {d1} AS d1, {d2} AS d2
  FROM events CROSS JOIN ext),
zb AS (
  SELECT d1, d2, (({z}) >> {2 * bits - bucket_bits}) AS bucket FROM d)
SELECT bucket, count(*) AS n_rows,
       min(d1) AS d1_min, max(d1) AS d1_max,
       min(d2) AS d2_min, max(d2) AS d2_max
FROM zb GROUP BY bucket ORDER BY bucket
"""


# ------------------------------------------------------------------ #
# Predicate-pruning estimator: which layout skips what
# ------------------------------------------------------------------ #

#: default audit predicate box in cell space (0..2^BITS-1 per axis):
#: a quarter of each axis — the selective 2-dim range query layouts
#: are judged on.
Q1 = (32, 95)
Q2 = (64, 127)


def prune_estimate(
    events: DataFrame,
    bits: int = BITS,
    bucket_bits: int = BUCKET_BITS,
    q1: tuple[int, int] = Q1,
    q2: tuple[int, int] = Q2,
) -> DataFrame:
    """(layout, n_buckets, buckets_scanned, rows_scanned, rows_total,
    scan_fraction): how much a min/max-stats scan must read under three
    physical layouts for the same 2-dimensional predicate box —
    ``zorder`` (Morton buckets), ``sort_d1`` / ``sort_d2`` (single-column
    sorts, equal-width cuts).  A bucket is *skipped* iff its per-file
    extent rectangle misses the box — exactly the parquet/Iceberg/Delta
    row-group pruning rule, so this IS the I/O estimate that justifies
    (or rejects) a re-layout before anyone rewrites 100 TB.

    Plan: the zorder_extents scan projection computed ONCE, each row
    exploded to its three (layout, bucket) assignments, one hash agg on
    the (layout, bucket) key, and a layout-level re-agg of the ~48-row
    result.  Scan fraction = integer row counts in one double division
    — engine-portable."""
    from ..operators.temporal import _us

    base = events.select("user_id", _us(F.col("ts")).alias("t_us"))
    ext = base.agg(
        F.min("user_id").alias("u_mn"),
        F.max("user_id").alias("u_mx"),
        F.min("t_us").alias("t_mn"),
        F.max("t_us").alias("t_mx"),
    )
    d1 = _scale_sql("user_id", "u_mn", "u_mx", bits)
    d2 = _scale_sql("t_us", "t_mn", "t_mx", bits)
    z = zvalue_sql("d1", "d2", bits, _spark_shl, _spark_shr)
    zb = _spark_shr(f"({z})", 2 * bits - bucket_bits)
    sb1 = _spark_shr("d1", bits - bucket_bits)
    sb2 = _spark_shr("d2", bits - bucket_bits)
    assigned = (
        base.crossJoin(F.broadcast(ext))
        .select(F.expr(d1).alias("d1"), F.expr(d2).alias("d2"))
        .select(
            "d1",
            "d2",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("zorder").alias("layout"),
                        F.expr(zb).alias("bucket"),
                    ),
                    F.struct(
                        F.lit("sort_d1").alias("layout"),
                        F.expr(sb1).alias("bucket"),
                    ),
                    F.struct(
                        F.lit("sort_d2").alias("layout"),
                        F.expr(sb2).alias("bucket"),
                    ),
                )
            ).alias("a"),
        )
        .select("d1", "d2", F.col("a.layout").alias("layout"),
                F.col("a.bucket").alias("bucket"))
    )
    per_bucket = assigned.groupBy("layout", "bucket").agg(
        F.count("*").alias("n_rows"),
        F.min("d1").alias("d1_min"),
        F.max("d1").alias("d1_max"),
        F.min("d2").alias("d2_min"),
        F.max("d2").alias("d2_max"),
    )
    scanned = (
        (F.col("d1_max") >= q1[0]) & (F.col("d1_min") <= q1[1])
        & (F.col("d2_max") >= q2[0]) & (F.col("d2_min") <= q2[1])
    ).cast("int")
    return (
        per_bucket.withColumn("scanned", scanned)
        .groupBy("layout")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("scanned").alias("buckets_scanned"),
            F.sum(F.col("scanned") * F.col("n_rows")).alias("rows_scanned"),
            F.sum("n_rows").alias("rows_total"),
            (
                F.sum(F.col("scanned") * F.col("n_rows"))
                / F.sum("n_rows").cast("double")
            ).alias("scan_fraction"),
        )
        .orderBy("layout")
    )


def prune_estimate_oracle(
    bits: int = BITS,
    bucket_bits: int = BUCKET_BITS,
    q1: tuple[int, int] = Q1,
    q2: tuple[int, int] = Q2,
) -> str:
    """DuckDB twin of :func:`prune_estimate` (identical arithmetic)."""
    d1 = _scale_sql("user_id", "u_mn", "u_mx", bits)
    d2 = _scale_sql("epoch_us(ts)", "t_mn", "t_mx", bits)
    z = zvalue_sql("d1", "d2", bits, _duck_shl, _duck_shr)
    return f"""
WITH ext AS (
  SELECT min(user_id) AS u_mn, max(user_id) AS u_mx,
         min(epoch_us(ts)) AS t_mn, max(epoch_us(ts)) AS t_mx
  FROM events),
d AS (
  SELECT {d1} AS d1, {d2} AS d2
  FROM events CROSS JOIN ext),
assigned AS (
  SELECT d1, d2, 'zorder' AS layout,
         (({z}) >> {2 * bits - bucket_bits}) AS bucket FROM d
  UNION ALL
  SELECT d1, d2, 'sort_d1', (d1 >> {bits - bucket_bits}) FROM d
  UNION ALL
  SELECT d1, d2, 'sort_d2', (d2 >> {bits - bucket_bits}) FROM d),
per_bucket AS (
  SELECT layout, bucket, count(*)::BIGINT AS n_rows,
         min(d1) AS d1_min, max(d1) AS d1_max,
         min(d2) AS d2_min, max(d2) AS d2_max
  FROM assigned GROUP BY 1, 2),
flagged AS (
  SELECT *, CASE WHEN d1_max >= {q1[0]} AND d1_min <= {q1[1]}
                  AND d2_max >= {q2[0]} AND d2_min <= {q2[1]}
            THEN 1 ELSE 0 END AS scanned
  FROM per_bucket)
SELECT layout, count(*)::BIGINT AS n_buckets,
       sum(scanned)::BIGINT AS buckets_scanned,
       sum(scanned * n_rows)::BIGINT AS rows_scanned,
       sum(n_rows)::BIGINT AS rows_total,
       sum(scanned * n_rows) / CAST(sum(n_rows) AS DOUBLE) AS scan_fraction
FROM flagged GROUP BY layout ORDER BY layout
"""


def compaction_plan(
    docs: DataFrame,
    key: str = "source",
    target_bytes: int = 64 * 1024,
) -> DataFrame:
    """Per-partition-key writer sizing: (key, n_docs, est_bytes,
    recommended_files, rows_per_file, avg_doc_bytes) — the
    small-files-problem math for a partitioned write (Iceberg/Delta
    compaction targets, ``repartitionByRange`` file counts).

    A 100 TB write that lets every task flush its own fragment per
    partition produces millions of KB-files (metadata death); one that
    writes a single file per partition serializes the biggest key.
    ``recommended_files = ceil(est_bytes / target_bytes)`` — exact
    integer ceil-div — is the fan-out that hits the target file size
    on both ends.

    Plan: one per-key aggregation over a byte-length projection —
    map-side partials, key-cardinality output.  ``est_bytes`` is the
    text payload (octet_length); on real parquet multiply by your
    measured compression ratio (``textstats.compression_ratio``) —
    composition documented, estimate stays engine-exact."""
    per = docs.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.octet_length("text")).alias("est_bytes"),
    )
    return per.select(
        "key",
        "n_docs",
        "est_bytes",
        F.expr(
            f"CAST(greatest(1, (est_bytes + {target_bytes} - 1)"
            f" DIV {target_bytes}) AS BIGINT)"
        ).alias("recommended_files"),
        F.expr(
            f"CAST((n_docs + greatest(1, (est_bytes + {target_bytes} - 1)"
            f" DIV {target_bytes}) - 1)"
            f" DIV greatest(1, (est_bytes + {target_bytes} - 1)"
            f" DIV {target_bytes}) AS BIGINT)"
        ).alias("rows_per_file"),
        F.expr("est_bytes / CAST(n_docs AS DOUBLE)").alias("avg_doc_bytes"),
    ).orderBy("key")


def compaction_plan_sql(
    table: str = "documents", key: str = "source",
    target_bytes: int = 64 * 1024,
) -> str:
    """DuckDB twin of :func:`compaction_plan`."""
    files = f"greatest(1, (est_bytes + {target_bytes} - 1) // {target_bytes})"
    return f"""
WITH per AS (
  SELECT {key} AS key, count(*)::BIGINT AS n_docs,
         sum(strlen(text))::BIGINT AS est_bytes  -- byte length (Spark octet_length)
  FROM {table} GROUP BY 1)
SELECT key, n_docs, est_bytes,
       ({files})::BIGINT AS recommended_files,
       ((n_docs + {files} - 1) // {files})::BIGINT AS rows_per_file,
       est_bytes / CAST(n_docs AS DOUBLE) AS avg_doc_bytes
FROM per ORDER BY key
"""
