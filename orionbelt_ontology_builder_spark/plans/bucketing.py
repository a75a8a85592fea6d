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
