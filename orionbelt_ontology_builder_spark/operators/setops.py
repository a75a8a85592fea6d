"""Set operations: diff / merge / conflict detection (SURVEY.md §2.7).

The reference implements these with Python ``set`` algebra over fully
materialized graphs (``ontology_manager.py:2423-2424``, ``:2467``); here
they are ``exceptAll`` / ``intersect`` / ``unionByName().distinct()`` over
the 6-column term encoding, so equality includes lang/datatype exactly as
rdflib does.  All distributed — Spark's hash-based set ops do partial
aggregation map-side and spill; no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import CONFLICT_PREDICATES, TRIPLE_COLS

# Merge strategies (reference ontology_manager.py:2112-2172)
REPLACE = "replace"
MERGE = "merge"
MERGE_OVERWRITE = "merge_overwrite"


def merge_graphs(
    current: DataFrame, incoming: DataFrame, strategy: str = MERGE
) -> DataFrame:
    """Merge ``incoming`` into ``current``.

    * REPLACE: discard current (reference ``:2125-2133``).
    * MERGE: set union — duplicate triples collapse (``:2134-2137``,
      test ``tests/test_merge.py:70``).
    * MERGE_OVERWRITE: union, but for conflict predicates
      {label, domain, range, comment, versionIRI, creator} the incoming
      value replaces current when the (subj, pred) key exists in both
      (``:2139-2163``) — expressed as an anti-join of current's conflict
      rows against incoming's (subj, pred) keys.
    """
    if strategy == REPLACE:
        return incoming.dropDuplicates(TRIPLE_COLS)
    if strategy == MERGE:
        return current.unionByName(incoming).dropDuplicates(TRIPLE_COLS)
    if strategy == MERGE_OVERWRITE:
        is_conflict = F.col("pred").isin(*CONFLICT_PREDICATES)
        cur_conf = current.filter(is_conflict)
        cur_rest = current.filter(~is_conflict)
        incoming_keys = incoming.filter(is_conflict).select("subj", "pred").distinct()
        # keep current conflict rows only where incoming has no value for
        # that (subj, pred) — incoming wins on collision
        cur_conf_kept = cur_conf.join(incoming_keys, ["subj", "pred"], "left_anti")
        return (
            cur_rest.unionByName(cur_conf_kept)
            .unionByName(incoming)
            .dropDuplicates(TRIPLE_COLS)
        )
    raise ValueError(f"unknown merge strategy: {strategy}")


def detect_conflicts(current: DataFrame, incoming: DataFrame) -> DataFrame:
    """(subj, pred) present in both graphs with differing objects, conflict
    predicates only, dedup by (subj, pred) (reference ``:2068-2110``)."""
    is_conflict = F.col("pred").isin(*CONFLICT_PREDICATES)
    cur = current.filter(is_conflict).select(
        "subj", "pred", F.col("obj").alias("current_value")
    )
    inc = incoming.filter(is_conflict).select(
        "subj", "pred", F.col("obj").alias("incoming_value")
    )
    return (
        cur.join(inc, ["subj", "pred"])
        .filter(F.col("current_value") != F.col("incoming_value"))
        .groupBy("subj", "pred")
        .agg(
            F.min("current_value").alias("current_value"),
            F.min("incoming_value").alias("incoming_value"),
        )
        .orderBy("subj", "pred")
    )


def diff_graphs(current: DataFrame, other: DataFrame) -> dict[str, DataFrame]:
    """Set diff (reference ``compare_graphs``, ``:2412-2486``):
    ``added = other - current``, ``removed = current - other``,
    ``unchanged = intersection``; bnode-subject triples split out
    (counted, not surfaced — ``:2427-2430``, test ``test_diff.py:74``).
    """
    added = other.exceptAll(current)
    removed = current.exceptAll(other)
    unchanged = current.intersect(other)
    is_b = F.col("subj").startswith("_:") | (F.col("obj_kind") == "bnode")
    return {
        "added": added.filter(~is_b),
        "removed": removed.filter(~is_b),
        "added_bnode": added.filter(is_b),
        "removed_bnode": removed.filter(is_b),
        "unchanged": unchanged,
    }


def diff_summary(current: DataFrame, other: DataFrame) -> DataFrame:
    """One-row diff stats (reference ``:2467-2482``): added/removed/
    unchanged counts with the bnode split.

    ONE null-safe full-outer join + conditional aggregate — not three
    separate set-ops (exceptAll x2 + intersect would shuffle both
    inputs three times for counts we can take in a single pass).
    Equivalent because triples are kept set-distinct engine-wide.
    """
    from ..model import TRIPLE_COLS

    cur = current.alias("c").withColumn("in_c", F.lit(1))
    oth = other.alias("o").withColumn("in_o", F.lit(1))
    # null-safe equality: obj_lang / obj_dt are nullable and NULL must
    # match NULL (plain join-on-columns would misclassify those rows)
    cond = None
    for col in TRIPLE_COLS:
        piece = F.col(f"c.{col}").eqNullSafe(F.col(f"o.{col}"))
        cond = piece if cond is None else cond & piece
    j = cur.join(oth, cond, "full_outer")
    subj = F.coalesce(F.col("c.subj"), F.col("o.subj"))
    okind = F.coalesce(F.col("c.obj_kind"), F.col("o.obj_kind"))
    is_b = subj.startswith("_:") | (okind == "bnode")
    added = F.col("in_o").isNotNull() & F.col("in_c").isNull()
    removed = F.col("in_c").isNotNull() & F.col("in_o").isNull()
    both = F.col("in_c").isNotNull() & F.col("in_o").isNotNull()
    return j.agg(
        F.count(F.when(added & ~is_b, 1)).alias("added"),
        F.count(F.when(removed & ~is_b, 1)).alias("removed"),
        F.count(F.when(added & is_b, 1)).alias("added_bnode"),
        F.count(F.when(removed & is_b, 1)).alias("removed_bnode"),
        F.count(F.when(both, 1)).alias("unchanged"),
    )


def classify_resources(current: DataFrame, other: DataFrame) -> DataFrame:
    """Per-subject change classification added/removed/modified
    (reference ``:2494-2520``): full-outer join of the added/removed
    subject sets."""
    d = diff_graphs(current, other)
    a = d["added"].select("subj").distinct().withColumn("has_added", F.lit(True))
    r = d["removed"].select("subj").distinct().withColumn("has_removed", F.lit(True))
    return (
        a.join(r, "subj", "full_outer")
        .select(
            F.col("subj").alias("resource"),
            F.when(
                F.col("has_added").isNotNull() & F.col("has_removed").isNotNull(),
                "modified",
            )
            .when(F.col("has_added").isNotNull(), "added")
            .otherwise("removed")
            .alias("change"),
        )
        .orderBy("resource")
    )


def detect_prefix_conflicts(cur_prefixes: DataFrame, inc_prefixes: DataFrame) -> DataFrame:
    """Same prefix bound to different namespaces (reference ``:2181-2193``)."""
    cur = cur_prefixes.select("prefix", F.col("namespace").alias("current_ns"))
    inc = inc_prefixes.select("prefix", F.col("namespace").alias("incoming_ns"))
    return (
        cur.join(inc, "prefix")
        .filter(F.col("current_ns") != F.col("incoming_ns"))
        .orderBy("prefix")
    )


def preview_import(
    current: DataFrame, incoming: DataFrame
) -> dict[str, DataFrame]:
    """Stage + analyze without mutating (reference ``preview_import``,
    ``:2026-2066``; purity test ``test_merge.py:131-139``).  Pure by
    construction — nothing is written."""
    d = diff_graphs(current, incoming)
    return {
        **d,
        "conflicts": detect_conflicts(current, incoming),
        "summary": diff_summary(current, incoming),
        "classification": classify_resources(current, incoming),
    }
