"""Canonicalization: sameAs components -> canonical ids -> rewritten edges.

Connected components (operators.fixpoint) merge alias surface forms; the
canonical id of a component is its min member (deterministic).  Edge
rewrite is two joins of the big edge table against the (small) mention ->
canonical map — broadcast when it fits, shuffle-hash otherwise; AQE picks
at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.fixpoint import connected_components


def canonical_map(same_as: DataFrame) -> DataFrame:
    """(mention, canonical) from verified sameAs pairs; the canonical
    representative is the lexicographically smallest member."""
    # verified_same_as emits distinct pairs with m1 < m2 strictly
    # (lsh_candidate_pairs contract) — CC can skip its dedup shuffle.
    return connected_components(
        same_as.select(F.col("m1").alias("src"), F.col("m2").alias("dst")),
        assume_clean_pairs=True,
    ).select(F.col("node").alias("mention"), F.col("component").alias("canonical"))


def rewrite_edges(raw_triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite subj/obj surfaces through the canonical map (identity for
    unmapped mentions), keeping lineage columns.

    Identity rows (a representative mapping to itself — 1/k of every
    k-member component, plus any caller-supplied no-ops) are filtered
    before the join: a hit that coalesces to the same value is
    indistinguishable from a miss, so they only inflate the join build
    side and its output width. At web scale the map keys on distinct
    surface forms (uniform hash — no skew), and the big side shuffles
    once per role; AQE picks broadcast when the filtered map fits."""
    remap = mapping.filter(F.col("mention") != F.col("canonical"))
    m_subj = remap.select(
        F.col("mention").alias("subj_surface"), F.col("canonical").alias("subj_canon")
    )
    m_obj = remap.select(
        F.col("mention").alias("obj_surface"), F.col("canonical").alias("obj_canon")
    )
    return (
        raw_triples.join(m_subj, "subj_surface", "left")
        .join(m_obj, "obj_surface", "left")
        .select(
            F.coalesce("subj_canon", "subj_surface").alias("subj"),
            "pred",
            F.coalesce("obj_canon", "obj_surface").alias("obj"),
            "source_url",
            "warc_ts",
        )
    )
