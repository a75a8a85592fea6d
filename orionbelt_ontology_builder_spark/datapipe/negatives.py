"""Deterministic negative sampling for KG-embedding training.

TransE-family training (public literature) needs, for every positive
(h, r, t), k corrupted tails drawn uniformly from the entity set —
reproducibly, so a resumed job regenerates the same batch.  The
classic distributed obstacle is the *global dense entity index*: a
naive ``row_number() OVER (ORDER BY ...)`` is a single-partition
window.  We build it scalably with the two-phase rank: hash-prefix
buckets give a 256-row offset table (tiny window), intra-bucket
row_number runs partition-parallel, and ``global_idx = bucket_offset +
intra_rank`` equals the single-node global rank exactly because the
bucket is a prefix of the ordering key.

Corruption is then pure hashing: tail index = int(md5(h|r|t|i)[:8])
mod n — no RNG state, no driver round-trip, reproducible across
retries and cluster sizes.  False negatives (corrupt == true tail)
are flagged, not dropped, so row counts stay deterministic and the
caller chooses the filtering policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["entity_index", "kg_negative_samples", "kg_negative_samples_sql"]


def entity_index(edges: DataFrame) -> DataFrame:
    """(entity, idx) — dense 0-based index over the distinct entities
    of an (h, r, t) edge table, ordered by (md5(entity), entity).
    Scalable two-phase ranking (see module docstring)."""
    ents = (
        edges.select(F.col("h").alias("e"))
        .unionByName(edges.select(F.col("t").alias("e")))
        .distinct()
        .withColumn("hash", F.md5("e"))
        .withColumn("bucket", F.substring("hash", 1, 2))
    )
    counts = ents.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    offsets = counts.withColumn(
        "offset",
        F.coalesce(
            F.sum("c").over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("bucket", "offset")
    intra = F.row_number().over(
        Window.partitionBy("bucket").orderBy("hash", "e")
    )
    return (
        ents.withColumn("intra", intra)
        .join(F.broadcast(offsets), "bucket")
        .select(
            F.col("e").alias("entity"),
            (F.col("offset") + F.col("intra") - 1).alias("idx"),
        )
    )


def kg_negative_samples(edges: DataFrame, k: int = 2) -> DataFrame:
    """(h, r, t, neg_i, neg_tail, is_false_negative) — k hash-derived
    corrupted tails per positive edge.

    Scale shape: the entity index is built once (two shuffles, both
    partition-parallel); probes are a map-side explode of the edge
    scan; the resolve join is an equi-join on the dense index (uniform
    by construction — md5 output has no skew).  The entity count rides
    a 1-row broadcast."""
    idx = entity_index(edges)
    n = idx.agg(F.count(F.lit(1)).alias("n_entities"))
    probes = edges.select(
        "h",
        "r",
        "t",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("neg_i"),
    )
    probe_val = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", "h", "r", "t", F.col("neg_i"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    resolved = (
        probes.crossJoin(F.broadcast(n))
        .withColumn("idx", probe_val % F.col("n_entities"))
        .join(idx, "idx")
        .select(
            "h",
            "r",
            "t",
            "neg_i",
            F.col("entity").alias("neg_tail"),
            (F.col("entity") == F.col("t")).alias("is_false_negative"),
        )
        .orderBy("h", "r", "t", "neg_i")
    )
    return resolved


def kg_negative_samples_sql(edges_cte: str, k: int = 2) -> str:
    """DuckDB twin — the oracle may use the naive global row_number
    (single-node); parity proves the two-phase rank IS the global
    rank."""
    return f"""{edges_cte},
ents AS (
  SELECT DISTINCT e FROM (
    SELECT h AS e FROM edges UNION SELECT t FROM edges)),
idx AS MATERIALIZED (
  SELECT e AS entity,
         row_number() OVER (ORDER BY md5(e), e) - 1 AS idx
  FROM ents),
n AS (SELECT count(*)::BIGINT AS n_entities FROM idx),
probes AS (
  SELECT h, r, t, i.i AS neg_i,
    ('0x' || substr(md5(h || '|' || r || '|' || t || '|' || i.i), 1, 8))
      ::BIGINT AS pv
  FROM edges, unnest(range(0, {k})) AS i(i))
SELECT p.h, p.r, p.t, p.neg_i, x.entity AS neg_tail,
  x.entity = p.t AS is_false_negative
FROM probes p CROSS JOIN n
JOIN idx x ON x.idx = p.pv % n.n_entities
ORDER BY h, r, t, neg_i
"""
