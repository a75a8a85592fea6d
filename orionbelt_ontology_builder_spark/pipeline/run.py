"""End-to-end KG-construction pipeline (BASELINE.json north_star):

    pages --(Arrow UDF html->text + pattern extraction)--> raw triples
          --(MinHash-LSH blocking + Jaccard verify)-------> sameAs edges
          --(connected components)------------------------> canonical map
          --(rewrite + materialize)-----------------------> edges,
                                                             class_hierarchy

Every stage is a DataFrame transform; the only Python is Arrow-batched
extraction.  ``build_kg`` is pure (returns DataFrames); ``run_pipeline``
adds partitioned writes + checkpoint manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .canonicalize import canonical_map, rewrite_edges
from .extract import extract_raw_triples
from .linking import verified_same_as


def build_kg(
    pages: DataFrame,
    jaccard_threshold: float = 0.9,
    use_text_column: bool = False,
) -> dict[str, DataFrame]:
    # raw feeds two consumers (mention extraction + final edge rewrite):
    # persist so the Arrow extraction stage runs once, not per-branch
    raw = extract_raw_triples(pages, use_text_column=use_text_column).persist()
    # linking operates on distinct surface forms (small next to the edge
    # set); exclude none — class names link to themselves only
    mentions = (
        raw.select(F.col("subj_surface").alias("mention"))
        .unionByName(raw.select(F.col("obj_surface").alias("mention")))
        .distinct()
    )
    # persist: canonical_map consumes same_as twice (edge symmetrization
    # + node set) before checkpointing — without this the LSH-verify
    # lineage executes twice
    same_as = verified_same_as(
        mentions, jaccard_threshold=jaccard_threshold
    ).persist()
    mapping = canonical_map(same_as)
    edges = rewrite_edges(raw, mapping)
    return {
        "raw_triples": raw,  # persisted above; shared by mentions + rewrite
        "mentions": mentions,
        "same_as": same_as,
        "canonical_map": mapping,
        "edges": edges,
        "class_hierarchy": (
            edges.filter(F.col("pred") == "subClassOf")
            .select(F.col("subj").alias("child"), F.col("obj").alias("parent"))
            .distinct()
        ),
    }


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_slices: int = 8,
    jaccard_threshold: float = 0.9,
) -> dict[str, DataFrame]:
    """Checkpointed variant: extraction runs per-slice with manifest
    resume, then linking/canonicalization over the accumulated raw
    triples, then partitioned writes."""
    from .materialize import (
        run_extraction_with_checkpoints,
        write_class_hierarchy,
        write_edges,
    )

    raw = run_extraction_with_checkpoints(spark, pages, out_dir, n_slices)
    mentions = (
        raw.select(F.col("subj_surface").alias("mention"))
        .unionByName(raw.select(F.col("obj_surface").alias("mention")))
        .distinct()
    )
    same_as = verified_same_as(mentions, jaccard_threshold=jaccard_threshold)
    mapping = canonical_map(same_as)
    edges = rewrite_edges(raw, mapping)
    write_edges(edges, out_dir)
    write_class_hierarchy(edges, out_dir)
    return {"edges": edges, "canonical_map": mapping, "same_as": same_as}


# --------------------------------------------------------------------------
# P/R scoring vs ground truth (the BASELINE gate at small scale)
# --------------------------------------------------------------------------


def precision_recall(
    edges: DataFrame, truth
) -> dict[str, float]:
    """Normalized-triple precision/recall vs the synthesizer's ground
    truth.

    ``truth`` is a (s, p, o) DataFrame (``pages.ground_truth_df`` — the
    scale path) or a Python set (the small-scale test convenience, which
    is parallelized first).  Counters come from ONE full-outer join +
    conditional aggregate — only three numbers ever reach the driver, so
    the gate holds at 2M pages (6.3M distinct truth triples) without a
    driver-side materialization.
    """
    norm = edges.select(
        F.lower(F.regexp_replace("subj", "[- ]", "")).alias("s"),
        F.col("pred").alias("p"),
        F.lower(F.regexp_replace("obj", "[- ]", "")).alias("o"),
    ).distinct()
    if isinstance(truth, set):
        truth = edges.sparkSession.createDataFrame(
            list(truth), "s string, p string, o string"
        )
    truth = truth.distinct()
    j = norm.withColumn("g", F.lit(1)).join(
        truth.withColumn("t", F.lit(1)), ["s", "p", "o"], "full_outer"
    )
    row = j.agg(
        F.count("g").alias("extracted"),
        F.count("t").alias("expected"),
        F.count(F.when(F.col("g").isNotNull() & F.col("t").isNotNull(), 1)).alias("tp"),
    ).collect()[0]
    tp, extracted, expected = row["tp"], row["extracted"], row["expected"]
    return {
        "precision": tp / extracted if extracted else 0.0,
        "recall": tp / expected if expected else 0.0,
        "tp": tp,
        "extracted": extracted,
        "expected": expected,
    }
