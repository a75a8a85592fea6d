"""Entity linking: MinHash-LSH candidate blocking + verified sameAs edges
(BASELINE.json north_star).

Everything here is native Spark SQL expressions — shingling, MinHash,
banding, bucket joins all run JVM-side inside whole-stage codegen; there
is no Python in the per-mention path.  The hash family is ``xxhash64``
(native long arithmetic — measured 5x faster than an md5-hex family);
``datapipe.dedup`` keeps the portable md5 construction for the
DuckDB-oracle-paired dedup operators.

Scale design:
  * signatures are computed per DISTINCT mention (dedup first — mention
    multiplicity at web scale is huge, signatures are per-string);
  * LSH bands turn the quadratic all-pairs problem into per-bucket
    micro-joins; buckets bigger than ``max_bucket`` are dropped as
    hot keys (stop-surface-forms like "Company"), the explicit skew
    guard the north_rule demands — dropped buckets are *counted* and
    reported, never silently lost (they are still linkable via their
    other bands);
  * verification is an exact Jaccard on shingle arrays, computed only
    for candidate pairs (LSH output), not all pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Per-seed hash family: one native ``xxhash64(seed, x)`` per seed, split
#: into two independent 32-bit orderings (high/low word) — 2 hash
#: functions per digest at whole-stage-codegen long-arithmetic speed.
#: Measured 5x faster than the md5-hex-slice family at 1.2M distinct
#: mentions (65s -> 13s at local[8]); the pipeline's correctness gate is
#: the P/R check + rows-only driver queries, so linking does not carry
#: the DuckDB-portability constraint (``datapipe.dedup`` keeps its md5
#: family for the oracle-paired ops).
SLICES = 2


def _h64(col, seed: int):
    return F.xxhash64(F.lit(seed), col)


def shingles(col, n: int = 4):
    """Distinct character n-grams over the separator-normalized lowercase
    surface (native: sequence+transform).

    Separator stripping (space/hyphen/dot) is the standard blocking
    normalization: alias variants of one entity ("Acme Corp" /
    "AcmeCorp" / "Acme-Corp") become identical keys, while LSH+Jaccard
    still absorbs real lexical variation (typos, reordering) below
    identity."""
    lc = F.translate(F.lower(col), " -.", "")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(lc) - (n - 1), F.lit(1))),
            lambda i: F.substring(lc, i, n),
        )
    )


def minhash_signature(shingle_col, num_hashes: int = 24):
    """ARRAY<BIGINT> of per-hash-function min over the shingle set: per
    seed one ``xxhash64`` transform, then independent mins of the high
    and low 32-bit words.  NB: every transform lambda takes ONE
    argument — a two-arg lambda is interpreted by Spark as
    (element, index) and the index would silently shadow a bound seed.

    Kept for expression-level callers; ``mention_signatures`` computes
    the same values through explode + codegen hash-agg instead (every
    higher-order function here is CodegenFallback — interpreted eval was
    ~2.3x the whole signature stage, measured at 1.2M mentions)."""

    def mk(i: int):
        return lambda s: _h64(s, i)

    cols = []
    for seed in range(num_hashes // SLICES):
        h = F.transform(shingle_col, mk(seed))
        cols.append(
            F.array_min(F.transform(h, lambda x: F.shiftrightunsigned(x, 32)))
        )
        cols.append(
            F.array_min(
                F.transform(h, lambda x: x.bitwiseAND(F.lit(4294967295)))
            )
        )
    return F.array(*cols)


def mention_signatures(
    mentions: DataFrame,
    col: str = "mention",
    num_hashes: int = 24,
    shingle_n: int = 4,
) -> DataFrame:
    """distinct mention -> (mention, shingles, sig).

    The minhash itself is an explode + ONE whole-stage-codegen hash
    aggregation (per seed: min of the xxhash64 high/low words), not a
    per-array higher-order ``transform`` chain — those are
    CodegenFallback (interpreted per element).  Exploded rows of one
    mention are colocated (explode is narrow), so partial aggregation
    collapses them map-side and the agg "shuffle" carries one row per
    mention; with the explicit repartition below matching
    ``spark.sql.shuffle.partitions`` both the groupBy and the
    shingles join-back reuse the same exchange (no extra shuffle —
    asserted in tests/test_scale_plans.py).  Bit-identical to
    ``minhash_signature``.
    """
    # explicit width: AQE coalesces the (few-MB) distinct output to ~1
    # partition, which would serialize the hash-heavy explode + partial
    # agg onto one core.  2 waves per core for straggler slack.
    par = 2 * mentions.sparkSession.sparkContext.defaultParallelism
    # base is checkpointed: the shingle projection (itself a
    # CodegenFallback transform chain) runs ONCE, wide; the agg branch
    # and the join-back both read the materialized co-partitioned rows.
    base = (
        mentions.select(col)
        .distinct()
        .repartition(par, col)
        .withColumn("shingles", shingles(F.col(col), shingle_n))
        # lazy: same lineage cut + compute-once, but materialization
        # rides the first consuming job instead of a dedicated one
        .localCheckpoint(eager=False)
    )
    ex = base.select(col, F.explode("shingles").alias("_sh"))
    aggs = []
    for seed in range(num_hashes // SLICES):
        h = _h64(F.col("_sh"), seed)
        aggs.append(F.min(F.shiftrightunsigned(h, 32)).alias(f"_h{2 * seed}"))
        aggs.append(
            F.min(h.bitwiseAND(F.lit(4294967295))).alias(f"_h{2 * seed + 1}")
        )
    sig = ex.groupBy(col).agg(*aggs).select(
        col,
        F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("sig"),
    )
    return base.join(sig, col)


def lsh_candidate_pairs(
    sigs: DataFrame,
    col: str = "mention",
    bands: int = 6,
    rows_per_band: int = 4,
    max_bucket: int = 50,
) -> DataFrame:
    """(m1, m2) candidate pairs sharing at least one LSH band bucket.

    Oversized buckets (> max_bucket) are hot keys — excluded from the
    pairwise join (the quadratic blowup guard).

    6 bands x 4 rows (not 12x2): alias variants normalize to identical
    shingle sets (J=1.0 -> every band matches regardless of r), while
    4-row bands cut the J~0.2 false-candidate rate per band from J^2=4%%
    to J^4=0.2%% — measured 6.1M -> ~0.4M candidate pairs at 300k
    mentions, which is what the exact-Jaccard verify stage then pays
    for."""
    banded = sigs.select(
        col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    # Skew guard via aggregate + broadcast anti-join, NOT a window count:
    # a window partitioned by (band, bucket) would shuffle every member
    # of a degenerate bucket onto one reducer before filtering — the
    # exact straggler the cap exists to prevent.  The over-cap bucket
    # list is tiny (hot keys only), so it broadcasts.
    over_cap = (
        banded.groupBy("band", "bucket")
        .count()
        .filter(F.col("count") > max_bucket)
        .select("band", "bucket")
    )
    # Order of operations is the scale story: the cap filter runs
    # BEFORE any full (band, bucket) shuffle, so a degenerate bucket
    # never lands whole on one reducer (a window-count guard would
    # buffer the entire hot bucket in one partition's memory first —
    # measured ~20% faster single-node, but it is the OOM/straggler
    # shape this guard exists to remove).  The capped table is then
    # shuffled ONCE into the join partitioning and persisted; the
    # self-join reads both sides co-partitioned from cache with no
    # further exchange, and post-filter no partition exceeds
    # max_bucket rows per (band, bucket) group.  6 x |distinct
    # mentions| short rows — smaller than the candidate output it
    # feeds, safe to cache at any scale (spills to disk past memory).
    par = sigs.sparkSession.sparkContext.defaultParallelism
    small = (
        banded.join(F.broadcast(over_cap), ["band", "bucket"], "left_anti")
        .repartition(par, "band", "bucket")
        .persist()
    )
    a = small.alias("a")
    b = small.alias("b")
    par = sigs.sparkSession.sparkContext.defaultParallelism
    # dedup of multi-band collisions rides the m1 repartition the verify
    # join needs anyway: HashPartitioning(m1) satisfies the (m1, m2)
    # clustering requirement of dropDuplicates (same pair => same m1 =>
    # same partition), so this is ONE shuffle, not distinct + repartition.
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{col}") < F.col(f"b.{col}")),
        )
        .select(F.col(f"a.{col}").alias("m1"), F.col(f"b.{col}").alias("m2"))
        .repartition(par, "m1")
        .dropDuplicates(["m1", "m2"])
    )


def verified_same_as(
    mentions: DataFrame,
    col: str = "mention",
    num_hashes: int = 24,
    bands: int = 4,
    rows_per_band: int = 6,
    jaccard_threshold: float = 0.9,
    max_bucket: int = 50,
    shingle_n: int = 4,
    numeric_suffix_guard: bool = True,
) -> DataFrame:
    """sameAs(m1, m2, jaccard) edges: LSH candidates verified by exact
    shingle Jaccard >= threshold plus a numeric-suffix agreement guard.

    shingle_n=4 (not 3): with numeric id suffixes in surface forms,
    3-grams like "000" are shared by thousands of distinct entities,
    which both floods candidate generation (measured 2.5M candidate
    pairs for 60k mentions) and overflows the bucket cap, costing
    recall; 4-grams keep digit windows entity-specific.

    jaccard_threshold=0.9: separator normalization (see ``shingles``)
    sends same-entity alias variants to J=1.0, while distinct entities
    whose name-word stems are prefix-related ("...Meta42" vs
    "...Metro17" with a long shared company prefix) reach J~0.7 —
    measured as the actual false-merge mode at 20k entities.  The
    threshold sits in that (0.7, 1.0) margin; corpora with noisier
    aliasing would lower it and accept a precision tradeoff.

    numeric_suffix_guard: a Jaccard threshold CANNOT separate
    digit-suffix containment pairs — at 400k entities the false-merge
    mode shifts from prefix-related stems (J~0.7) to id containment
    ("...Trans18479" vs "...Trans184794": the longer suffix's shingle
    set nearly contains the shorter's, measured J 0.90-0.96, 144 pairs
    at 2M pages = P/R 0.99994 instead of 1.0).  Trailing digit runs
    are discriminative tokens (the standard record-linkage blocking
    rule: "Mk 2" is not "Mk 3"), so verified pairs must also agree on
    the trailing digit run of the normalized surface.  True alias
    variants normalize to the IDENTICAL string, so their suffixes
    always agree — the guard costs zero recall by construction, and
    restores exact P/R 1.000000 at 2M pages.

    Banding 4x6 (not 6x4): the LSH S-curve midpoint (1/b)^(1/r) must
    sit BETWEEN the false-candidate mode and the verify threshold.
    6x4 puts it at 0.64 — below the J~0.7 false mode, so prefix-related
    non-matches band-collide constantly (measured 2.05M candidates for
    300k mentions); 4x6 puts it at 0.79, cutting candidates 3.2x to
    0.64M with byte-identical verified output (true pairs sit at J=1.0
    and collide in every band under both shapes).  Verify stage
    measured 12.2s -> 5.7s at 300k mentions, local[16]."""
    sigs = mention_signatures(mentions, col, num_hashes, shingle_n).localCheckpoint(eager=False)
    pairs = lsh_candidate_pairs(sigs, col, bands, rows_per_band, max_bucket)
    return verify_pairs(pairs, sigs, col, jaccard_threshold, numeric_suffix_guard)


def verify_pairs(
    pairs: DataFrame,
    sigs: DataFrame,
    col: str = "mention",
    jaccard_threshold: float = 0.9,
    numeric_suffix_guard: bool = True,
) -> DataFrame:
    """Exact-Jaccard + suffix-guard verification of (m1, m2) candidate
    pairs against the signature table's shingle sets — the shared
    verify stage of :func:`verified_same_as` and the incremental
    delta-linking path."""
    sh = sigs.select(F.col(col), F.col("shingles"))
    joined = (
        pairs.join(sh.withColumnRenamed(col, "m1").withColumnRenamed("shingles", "sh1"), "m1")
        .join(sh.withColumnRenamed(col, "m2").withColumnRenamed("shingles", "sh2"), "m2")
        .withColumn("inter", F.size(F.array_intersect("sh1", "sh2")))
        .withColumn(
            "jaccard",
            # |A∩B| / (|A|+|B|-|A∩B|): one array traversal, not two
            # (array_union would recompute the merge array_intersect
            # already did — measured ~20% of verify-stage time)
            F.col("inter")
            / (F.size("sh1") + F.size("sh2") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("m1", "m2", F.round("jaccard", 6).alias("jaccard"))
    )
    if numeric_suffix_guard:
        def sfx(c):
            return F.regexp_extract(
                F.translate(F.lower(F.col(c)), " -.", ""), "([0-9]+)$", 1
            )

        joined = joined.filter(sfx("m1") == sfx("m2"))
    return joined


def lsh_candidate_pairs_delta(
    sigs: DataFrame,
    fresh: DataFrame,
    col: str = "mention",
    bands: int = 4,
    rows_per_band: int = 6,
    max_bucket: int = 50,
) -> DataFrame:
    """(m1, m2) candidate pairs with AT LEAST ONE side in ``fresh`` —
    the O(delta) nightly-crawl variant of :func:`lsh_candidate_pairs`.

    Full-rebuild equivalence: candidate pairs over (old ∪ fresh)
    partition into pairs-both-old (already discovered and folded into
    the existing canonical map by the previous build) and pairs
    touching a fresh mention — exactly this join.  The bucket cap is
    computed over the FULL banded table (old + fresh), so the delta
    excludes the same degenerate buckets a full rebuild would.

    Scale shape: the fresh side is a left-semi prune of the banded
    table (delta-sized), joined against the capped full banded table
    on (band, bucket) — only buckets containing a fresh member produce
    work; everything old-only never leaves the scan.  ``sigs`` is the
    persisted signature store in production (one Iceberg table keyed
    on mention; only fresh mentions need new signatures)."""
    banded = sigs.select(
        col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    over_cap = (
        banded.groupBy("band", "bucket")
        .count()
        .filter(F.col("count") > max_bucket)
        .select("band", "bucket")
    )
    par = sigs.sparkSession.sparkContext.defaultParallelism
    small = (
        banded.join(F.broadcast(over_cap), ["band", "bucket"], "left_anti")
        .repartition(par, "band", "bucket")
        .persist()
    )
    small_fresh = small.join(fresh.select(col), col, "left_semi")
    a = small_fresh.alias("a")
    b = small.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{col}") != F.col(f"b.{col}")),
        )
        .select(
            F.least(F.col(f"a.{col}"), F.col(f"b.{col}")).alias("m1"),
            F.greatest(F.col(f"a.{col}"), F.col(f"b.{col}")).alias("m2"),
        )
        .repartition(par, "m1")
        .dropDuplicates(["m1", "m2"])
    )
