"""Bucketed co-located joins — the shuffle-elimination layout the
engine's materialized edge tables use on a cluster.

``pipeline/materialize.py`` partitions edges by subject-hash bucket;
this module is the query-side counterpart: write both sides of a
recurring join bucketed BY THE JOIN KEY into the session catalog and
Catalyst plans the join with no Exchange on either side (SortMergeJoin
directly over the bucketed scans).  At 100 TB this converts the
biggest recurring cost of a KG workload — re-shuffling the edge table
for every entity-attribute join — into a one-time layout decision.

Pure catalog/layout utility: no new operator semantics, so it is
verified by plan-shape tests (tests/test_scale_plans.py asserts the
bucketed join plan contains no Exchange) rather than a value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
) -> None:
    """Persist ``df`` as a bucketed+sorted session-catalog table keyed
    for a recurring equi-join: ``bucketBy(key)`` fixes the hash layout,
    ``sortBy(key)`` lets SortMergeJoin skip its per-task sort."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join of two same-bucketing tables; with both sides bucketed
    on ``key`` with equal bucket counts Catalyst emits a shuffle-free
    SortMergeJoin (the plan test pins this)."""
    return spark.table(left_table).join(spark.table(right_table), key)


# ---------------------------------------------------------------------------
# Partition-quality analysis — the numbers behind the layout choices
# ---------------------------------------------------------------------------


def partition_quality(edges, k: int = 8, hot_degree: int = 0):
    """One row per layout strategy ``(strategy, n_edges, cut_edges,
    cut_frac, max_load, avg_load, skew)`` for a ``k``-way partitioning
    of the KG edge table — the measured justification for
    ``materialize.py``'s subject-hash buckets and hot-entity salting:

    * ``subject_hash`` — node partition = md5(node) mod k, each edge
      stored at its source's partition.  ``cut_frac`` = edges whose
      endpoints land in different partitions (the CC/traversal
      communication cost); ``skew`` = max/avg partition edge load (the
      straggler factor — hubs pile their whole out-edge set on one
      partition).
    * ``salted_subject`` — sources with out-degree > ``hot_degree``
      (default: the 99th-percentile degree, computed from the data)
      spread their edges by md5(src,dst) mod k instead.  Salting trades
      cut (hub edges now always cut) for balance — exactly the
      trade-off the hot-entity salting in the pipeline makes, here
      quantified so the threshold is chosen by evidence.

    Plan: one degree agg + one md5 projection per strategy + one
    k-group count — three scans of the edge list, no joins besides the
    broadcast degree probe."""
    from pyspark.sql import DataFrame, functions as F

    def part(col, salt=""):
        h = F.md5(F.concat(F.lit(salt), col))
        return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % k).cast("int")

    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    if hot_degree <= 0:
        hot_degree = int(
            deg.agg(
                F.expr("approx_percentile(out_deg, 0.99)").alias("p")
            ).collect()[0]["p"]
        )
    e = edges.join(F.broadcast(deg), "src").select(
        "src", "dst",
        part(F.col("src")).alias("ps"),
        part(F.col("dst")).alias("pd"),
        part(F.concat_ws("|", "src", "dst")).alias("pe"),
        (F.col("out_deg") > hot_degree).alias("hot"),
    )

    def summarize(assign_col, cut_col, name) -> DataFrame:
        loads = e.groupBy(assign_col.alias("p")).agg(
            F.count(F.lit(1)).alias("load"),
            F.sum(F.when(cut_col, 1).otherwise(0)).alias("cut"),
        )
        return loads.agg(
            F.sum("load").alias("n_edges"),
            F.sum("cut").alias("cut_edges"),
            (F.sum("cut").cast("double") / F.sum("load")).alias("cut_frac"),
            F.max("load").alias("max_load"),
            (F.sum("load").cast("double") / F.count(F.lit(1))).alias("avg_load"),
            (
                F.max("load").cast("double")
                / (F.sum("load").cast("double") / F.count(F.lit(1)))
            ).alias("skew"),
        ).select(
            F.lit(name).alias("strategy"),
            "n_edges", "cut_edges", "cut_frac", "max_load", "avg_load", "skew",
        )

    subj = summarize(F.col("ps"), F.col("ps") != F.col("pd"), "subject_hash")
    salted_assign = F.when(F.col("hot"), F.col("pe")).otherwise(F.col("ps"))
    salted = summarize(
        salted_assign, salted_assign != F.col("pd"), "salted_subject"
    )
    return subj.unionByName(salted).orderBy("strategy")


def partition_quality_sql(
    edges_cte: str = "edges", k: int = 8, hot_degree: int = 0, p99_lit: str = ""
) -> str:
    """DuckDB twin; pass ``p99_lit`` as an SQL scalar subquery or
    literal for the hot threshold when ``hot_degree`` <= 0 (DuckDB's
    quantile_disc over integer degrees equals Spark's
    approx_percentile at these scales — the registration pins the
    integer to make the comparison airtight)."""
    hd = str(hot_degree) if hot_degree > 0 else p99_lit
    part = lambda expr: f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT % {k})::INT"  # noqa: E731
    return f"""
deg AS (SELECT src, count(*)::BIGINT AS out_deg FROM {edges_cte} GROUP BY src),
e AS (
  SELECT a.src, a.dst,
         {part('a.src')} AS ps,
         {part('a.dst')} AS pd,
         {part("a.src || '|' || a.dst")} AS pe,
         d.out_deg > ({hd}) AS hot
  FROM {edges_cte} a JOIN deg d ON a.src = d.src),
s1 AS (
  SELECT ps AS p, count(*)::BIGINT AS load,
         sum(CASE WHEN ps <> pd THEN 1 ELSE 0 END)::BIGINT AS cut
  FROM e GROUP BY ps),
s2 AS (
  SELECT (CASE WHEN hot THEN pe ELSE ps END) AS p, count(*)::BIGINT AS load,
         sum(CASE WHEN (CASE WHEN hot THEN pe ELSE ps END) <> pd
             THEN 1 ELSE 0 END)::BIGINT AS cut
  FROM e GROUP BY 1),
r1 AS (
  SELECT 'subject_hash' AS strategy, sum(load)::BIGINT AS n_edges,
         sum(cut)::BIGINT AS cut_edges,
         sum(cut)::DOUBLE / sum(load) AS cut_frac,
         max(load)::BIGINT AS max_load,
         sum(load)::DOUBLE / count(*) AS avg_load,
         max(load)::DOUBLE / (sum(load)::DOUBLE / count(*)) AS skew
  FROM s1),
r2 AS (
  SELECT 'salted_subject', sum(load)::BIGINT, sum(cut)::BIGINT,
         sum(cut)::DOUBLE / sum(load), max(load)::BIGINT,
         sum(load)::DOUBLE / count(*),
         max(load)::DOUBLE / (sum(load)::DOUBLE / count(*))
  FROM s2)
SELECT * FROM r1 UNION ALL SELECT * FROM r2 ORDER BY strategy"""
