"""Multi-source truth discovery (data fusion) over conflicting claims.

KG construction merges facts extracted from many sources; when sources
disagree about an item's value (two hosts claim different populations
for the same city, two corpora label the same word with different
languages), a KG pipeline needs a principled resolver rather than
majority vote — unreliable sources should count less, and a source's
reliability is itself inferred from how often its claims win.  That
mutual-reinforcement fixpoint is the classic truth-discovery recipe
(Yin, Han & Yu "TruthFinder" KDD'07; Pasternack & Roth "Sums/Hubs"
COLING'10 — public literature); the reference's conflict surface stops
at *detecting* disagreements (``detect_conflicts``,
ontology_manager.py's merge-conflict scan) — this operator is the
engine's constructive extension that *resolves* them.

Algorithm (Sums-style, synchronous, fixed ``iters`` rounds):

    t_0(s)        = 1.0                          for every source s
    score_i(v)    = sum_{s asserts v} t_i(s)     per (item, value)
    belief_i(v)   = score_i(v) / sum_{v' of item} score_i(v')
    t_{i+1}(s)    = avg over s's claims of belief_i

``belief`` is scale-invariant in the trust vector (ratios per item), so
no normalization stage is needed for convergence bookkeeping, and trust
stays naturally bounded in [0, 1] (an average of per-item shares).
Fixed iteration count + identical float expression trees on both
engines keep the rounds replayable (the ``pagerank``/``hits``
convention; the driver's %.6g normalization absorbs last-ulp sum-order
noise).

Distributed shape, per round: one claims⋈trust equi-join on ``source``,
one (item, value) grouped sum, one ``item`` grouped sum, one belief
join, one ``source`` grouped avg — every stage a key-partitioned
map-side-combinable aggregation or equi-join; no window over an
unbounded group, no driver materialization.  At corpus scale claims are
written partitioned by ``source`` hash, so the trust join and the
trust update reuse one exchange; the (item, value) aggregations shuffle
the claim table's natural key.  ``localCheckpoint`` cuts each round's
lineage.  The plan survives a 100x claim-count scale-up unchanged:
state is O(sources) + O(distinct claims), never O(pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TD_ITERS = 3


def truth_discovery(claims: DataFrame, iters: int = TD_ITERS) -> DataFrame:
    """(item, value, n_sources, belief) for every distinct claimed
    (item, value) after ``iters`` Sums-style trust/belief rounds over
    ``claims(source, item, value)``.  ``n_sources`` is the exact
    integer vote count; ``belief`` the trust-weighted per-item share
    (sums to 1 within each item).  Resolution = take the per-item
    max-belief row downstream; beliefs are returned unresolved so the
    caller can apply its own acceptance threshold."""
    c = claims.select("source", "item", "value").distinct().localCheckpoint(
        eager=True
    )
    trust = c.select("source").distinct().select(
        "source", F.lit(1.0).alias("t")
    )
    belief = None
    for _ in range(iters):
        score = (
            c.join(trust, "source")
            .groupBy("item", "value")
            .agg(F.sum("t").alias("score"))
        )
        itot = score.groupBy("item").agg(F.sum("score").alias("itot"))
        belief = score.join(itot, "item").select(
            "item", "value", (F.col("score") / F.col("itot")).alias("belief")
        )
        trust = (
            c.join(belief, ["item", "value"])
            .groupBy("source")
            .agg(F.avg("belief").alias("t"))
            .localCheckpoint(eager=True)
        )
    votes = c.groupBy("item", "value").agg(
        F.count(F.lit(1)).alias("n_sources")
    )
    return (
        votes.join(belief, ["item", "value"])
        .select("item", "value", "n_sources", "belief")
        .orderBy("item", "value")
    )


def truth_discovery_sql(claims_cte: str, iters: int = TD_ITERS) -> str:
    """DuckDB twin: the identical rounds unrolled as chained CTEs.
    ``claims_cte`` must define ``claims(source, item, value)``; it is
    re-wrapped distinct + MATERIALIZED (DuckDB re-inlines a CTE at
    every reference site — see the engineering notes)."""
    parts = [
        claims_cte.strip(),
        "c AS MATERIALIZED (SELECT DISTINCT source, item, value FROM claims)",
        "t0 AS MATERIALIZED (SELECT DISTINCT source, 1.0 AS t FROM c)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""s{i} AS MATERIALIZED (
  SELECT c.item, c.value, sum(t.t) AS score
  FROM c JOIN t{i - 1} t ON c.source = t.source
  GROUP BY c.item, c.value)"""
        )
        parts.append(
            f"""b{i} AS MATERIALIZED (
  SELECT s.item, s.value, s.score / i.itot AS belief
  FROM s{i} s JOIN (
    SELECT item, sum(score) AS itot FROM s{i} GROUP BY item) i
  ON s.item = i.item)"""
        )
        parts.append(
            f"""t{i} AS MATERIALIZED (
  SELECT c.source, avg(b.belief) AS t
  FROM c JOIN b{i} b ON c.item = b.item AND c.value = b.value
  GROUP BY c.source)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT v.item, v.value, v.n_sources, b.belief
FROM (SELECT item, value, count(*)::BIGINT AS n_sources
      FROM c GROUP BY item, value) v
JOIN b{iters} b ON v.item = b.item AND v.value = b.value
ORDER BY v.item, v.value"""
    )
