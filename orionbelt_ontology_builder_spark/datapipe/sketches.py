"""Probabilistic sketches over the document corpus — HyperLogLog
distinct-count, Count-Min heavy-hitter frequencies, and Bloom-filter
membership stats (the seen-URL / vocabulary / frequency primitives every
web-scale crawl-and-curate loop carries; public literature: Flajolet et
al. 2007, Cormode & Muthukrishnan 2005, Bloom 1970).

Verification stance: each op computes the sketch AND the exact answer
from the same stream, so the oracle proves both the register arithmetic
(bit-identical: every hash is the engine's portable md5-hex idiom, every
register an integer — no float until the final estimator division) and
the estimator quality (rel-err / overestimate-invariant columns the
tests assert on).

Scale stance: a sketch is precisely the thing that DOES survive 100 TB —
registers are a fixed-size groupBy (256 / 4x256 / 4096 cells) with
map-side partial aggregation, so the shuffle is O(cells), not O(rows);
the exact twin columns are the sf-scale test harness, which a production
run would simply drop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import norm_col, norm_sql, tokens_col, tokens_sql

#: HLL: m = 2^8 = 256 buckets (2 hex chars), 24-bit rho window.
HLL_M = 256
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
#: CMS: depth 4 salted rows x width 256 (2 hex chars).
CMS_DEPTH = 4
CMS_WIDTH = 256
#: Bloom: k = 4 salted probes into m = 4096 bits (3 hex chars).
BLOOM_K = 4
BLOOM_M = 4096


def _hex_int(col: Column, start: int, n: int) -> Column:
    """Integer value of ``n`` hex chars of an md5-hex column (1-based
    ``start``) — the portable Spark<->DuckDB hash slice."""
    return F.conv(F.substring(col, start, n), 16, 10).cast("long")


def _hex_int_sql(expr: str, start: int, n: int) -> str:
    return f"('0x' || substr({expr}, {start}, {n}))::BIGINT"


def hll_register_parts(col: Column) -> tuple[Column, Column]:
    """(bucket, rho) integer HLL register parts for m=256 from the
    portable md5 idiom — THE single construction every HLL-family op
    (batch, merge, streaming; ``graphstats.hyperball_reach`` carries
    the m=16 variant) derives from, so the Spark and DuckDB twins can
    only drift together."""
    h = F.md5(col.cast("string"))
    w = _hex_int(h, 3, 6)
    rho = F.when(w == 0, F.lit(25)).otherwise(
        25 - F.length(F.conv(F.substring(h, 3, 6), 16, 2))
    )
    return _hex_int(h, 1, 2), rho


def hll_estimate(regs: DataFrame, group_cols: list, m: int = HLL_M,
                 alpha: float | None = None) -> DataFrame:
    """Estimator over a (group..., bucket, r) register frame: integer
    harmonic sum (absent buckets contribute 2^25) + Flajolet
    linear-counting small-range branch; returns group cols +
    (int_sum, v_zero, est)."""
    if alpha is None:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    summed = regs.groupBy(*group_cols).agg(
        (
            F.sum(F.pow(F.lit(2.0), 25 - F.col("r")).cast("long"))
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << 25)
        ).alias("int_sum"),
        (F.lit(m) - F.count(F.lit(1))).alias("v_zero"),
    )
    e_raw = F.lit(alpha * m * m * (1 << 25)) / F.col("int_sum")
    est = F.when(
        (e_raw <= 2.5 * m) & (F.col("v_zero") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_zero")),
    ).otherwise(e_raw)
    return summed.select(*group_cols, "int_sum", "v_zero", est.alias("est"))


def hll_distinct(docs: DataFrame) -> DataFrame:
    """(lang, n_exact, hll_est, rel_err) — per-language vocabulary size,
    exact vs a 256-register HyperLogLog built from the same token
    stream.

    Register pipeline (all integer, so both engines agree bitwise):
    bucket = md5[1:2] hex, w = md5[3:8] hex (24 bits), rho = 25 -
    bit_length(w) (w = 0 -> 25, the all-zero window).  Per (lang,
    bucket) keep max rho; the harmonic sum is computed as the INTEGER
    sum(2^(25 - rho)) with absent buckets contributing 2^25, so no
    float enters until the single estimator division.  Small-range
    correction: linear counting m*ln(m/V) when E <= 2.5m and V > 0
    (Flajolet's rule), branch decided on the same deterministic
    integers both sides.

    Scale: one token-stream pass -> 256-cell agg per lang (map-side
    combinable); the n_exact column is the sf-scale truth harness."""
    toks = (
        docs.withColumn("norm", norm_col())
        .filter(F.col("norm") != "")
        .select("lang", F.explode(tokens_col()).alias("term"))
    )
    bucket, rho = hll_register_parts(F.col("term"))
    regs = (
        toks.select("lang", bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("lang", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    estd = hll_estimate(regs, ["lang"])
    exact = toks.groupBy("lang").agg(
        F.countDistinct("term").alias("n_exact")
    )
    return (
        exact.join(estd, "lang")
        .select(
            "lang",
            "n_exact",
            F.col("est").alias("hll_est"),
            (F.col("est") / F.col("n_exact") - 1.0).alias("rel_err"),
        )
        .orderBy("lang")
    )


def hll_distinct_oracle() -> str:
    m = HLL_M
    h = "md5(term)"
    w = _hex_int_sql(h, 3, 6)
    return f"""
WITH toks AS (
  SELECT lang, unnest({tokens_sql(norm_sql())}) AS term
  FROM documents WHERE {norm_sql()} <> ''),
regs AS (
  SELECT lang, {_hex_int_sql(h, 1, 2)} AS bucket,
    max(CASE WHEN {w} = 0 THEN 25 ELSE 25 - len(bin({w})) END) AS r
  FROM toks GROUP BY lang, bucket),
summed AS (
  SELECT lang,
    (sum((2::BIGINT ^ (25 - r))::BIGINT)::BIGINT
      + ({m} - count(*)) * {1 << 25})::BIGINT AS int_sum,
    ({m} - count(*))::BIGINT AS v_zero
  FROM regs GROUP BY lang),
exact AS (
  SELECT lang, count(DISTINCT term)::BIGINT AS n_exact
  FROM toks GROUP BY lang),
est AS (
  SELECT s.lang, e.n_exact,
    CASE WHEN ({HLL_ALPHA * m * m * (1 << 25)!r} / s.int_sum) <= {2.5 * m}
              AND s.v_zero > 0
         THEN {float(m)} * ln({float(m)} / s.v_zero)
         ELSE {HLL_ALPHA * m * m * (1 << 25)!r} / s.int_sum END AS hll_est
  FROM summed s JOIN exact e USING (lang))
SELECT lang, n_exact, hll_est, hll_est / n_exact - 1.0 AS rel_err
FROM est ORDER BY lang
"""


def countmin_topk(docs: DataFrame, k: int = 20) -> DataFrame:
    """(term, c_exact, c_cms) — the ``k`` highest-frequency tokens with
    exact corpus count and the Count-Min sketch estimate from a 4x256
    depth-by-width counter grid (salted md5 column choice per row).

    CMS law the tests pin: c_cms >= c_exact always (collisions only
    ever ADD), with equality for terms whose 4 cells saw no collision.
    All counters are integers -> bit-identical both engines.

    Scale: the grid is built from the (term, count) aggregate (same
    totals as streaming raw occurrences, one shuffle cheaper); the grid
    agg itself is 1024 cells regardless of corpus size."""
    counts = (
        docs.withColumn("norm", norm_col())
        .filter(F.col("norm") != "")
        .select(F.explode(tokens_col()).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    probes = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                _hex_int(
                    F.md5(F.concat(F.lit(f"{r}:"), F.col("term"))), 1, 2
                ).alias("col"),
            )
            for r in range(CMS_DEPTH)
        ]
    )
    cells = (
        counts.select(F.explode(probes).alias("p"), "c")
        .select(
            F.col("p.r").alias("r"), F.col("p.col").alias("col"), "c"
        )
        .groupBy("r", "col")
        .agg(F.sum("c").alias("cell"))
    )
    topk = counts.orderBy(F.desc("c"), "term").limit(k)
    return (
        topk.select("term", "c", F.explode(probes).alias("p"))
        .select(
            "term", "c",
            F.col("p.r").alias("r"), F.col("p.col").alias("col"),
        )
        .join(F.broadcast(cells), ["r", "col"])
        .groupBy("term", "c")
        .agg(F.min("cell").alias("c_cms"))
        .select("term", F.col("c").alias("c_exact"), "c_cms")
        .orderBy(F.desc("c_exact"), "term")
    )


def countmin_topk_oracle(k: int = 20) -> str:
    probe = lambda r: _hex_int_sql(f"md5('{r}:' || term)", 1, 2)  # noqa: E731
    probes = "\nUNION ALL\n".join(
        f"SELECT term, c, {r} AS r, {probe(r)} AS col FROM counts"
        for r in range(CMS_DEPTH)
    )
    return f"""
WITH counts AS MATERIALIZED (
  SELECT term, count(*)::BIGINT AS c
  FROM (SELECT unnest({tokens_sql(norm_sql())}) AS term
        FROM documents WHERE {norm_sql()} <> '')
  GROUP BY term),
probes AS MATERIALIZED ({probes}),
cells AS MATERIALIZED (
  SELECT r, col, sum(c)::BIGINT AS cell FROM probes GROUP BY r, col),
topk AS (SELECT term, c FROM counts ORDER BY c DESC, term LIMIT {k})
SELECT t.term AS term, t.c AS c_exact, min(cl.cell)::BIGINT AS c_cms
FROM topk t
JOIN probes p ON p.term = t.term
JOIN cells cl ON cl.r = p.r AND cl.col = p.col
GROUP BY t.term, t.c ORDER BY c_exact DESC, t.term
"""


def bloom_stats(docs: DataFrame) -> DataFrame:
    """One row (n_items, n_bits_set, fill_ratio, est_fp_rate,
    expected_fill) — the seen-URL Bloom filter health check: insert
    every document key (``source:doc_id``, the engine's URL stand-in)
    with k=4 salted probes into an m=4096-bit array, report the exact
    occupancy (distinct bit positions — integers, bit-identical both
    engines), the implied false-positive rate fill^k, and the
    analytical expected fill 1-(1-1/m)^(k*n) the tests compare it to.

    Scale: the 'bit array' never materializes as state — occupancy is
    count(distinct position) over a stream of k*n small integers, a
    two-phase agg bounded by m; at crawl scale m grows with the
    frontier but the plan shape is unchanged."""
    keys = docs.select(
        F.concat(F.col("source"), F.lit(":"), F.col("doc_id")).alias("key")
    )
    pos = keys.select(
        "key",
        F.explode(
            F.array(
                *[
                    _hex_int(
                        F.md5(F.concat(F.lit(f"{r}:"), F.col("key"))), 1, 3
                    )
                    for r in range(BLOOM_K)
                ]
            )
        ).alias("pos"),
    )
    m, k = BLOOM_M, BLOOM_K
    return pos.agg(
        F.countDistinct("key").alias("n_items"),
        F.countDistinct("pos").alias("n_bits_set"),
    ).select(
        "n_items",
        "n_bits_set",
        (F.col("n_bits_set") / F.lit(float(m))).alias("fill_ratio"),
        F.pow(F.col("n_bits_set") / F.lit(float(m)), k).alias(
            "est_fp_rate"
        ),
        (
            1.0
            - F.pow(F.lit(1.0 - 1.0 / m), F.col("n_items") * F.lit(k))
        ).alias("expected_fill"),
    )


def bloom_stats_oracle() -> str:
    m, k = BLOOM_M, BLOOM_K
    parts = []
    for r in range(BLOOM_K):
        slice_ = _hex_int_sql(f"md5('{r}:' || key)", 1, 3)
        parts.append(f"SELECT key, {slice_} AS pos FROM keys")
    probes = "\nUNION ALL\n".join(parts)
    return f"""
WITH keys AS (
  SELECT source || ':' || doc_id AS key FROM documents),
pos AS ({probes}),
agg AS (
  SELECT count(DISTINCT key)::BIGINT AS n_items,
         count(DISTINCT pos)::BIGINT AS n_bits_set
  FROM pos)
SELECT n_items, n_bits_set,
  n_bits_set / {float(m)} AS fill_ratio,
  (n_bits_set / {float(m)}) ^ {k} AS est_fp_rate,
  1.0 - (1.0 - 1.0 / {m}) ^ (n_items * {k}) AS expected_fill
FROM agg
"""


#: Quantile sketch: bottom-k priority sample size.
KMV_K = 256
QUANTS = (0.1, 0.5, 0.9, 0.99)


def quantile_sketch(docs: DataFrame, k: int = KMV_K) -> DataFrame:
    """(quantile, est_tokens, exact_tokens, rel_err) — token-length
    quantiles estimated from a bottom-``k`` PRIORITY SAMPLE (rank all
    docs by the portable md5 of their id, keep the k smallest hashes —
    the KMV-style uniform coordinated sample) against the exact
    corpus quantiles computed from the full stream.

    Why this shape at 100 TB: the bottom-k sample is a global top-k
    (per-partition heaps, no corpus shuffle, no sort), is COORDINATED
    across runs and engines (hash order, not RNG), and 256 points pin
    every decile of a unimodal length distribution well inside the
    corpus-noise band — the cheap stand-in for a full KLL/t-digest
    register merge, with the exact twin as the sf-scale truth
    harness.  Exact-side percentile is Spark's linear-interpolation
    `percentile`, bit-matched by DuckDB's `quantile_cont` (the
    engine's established pairing)."""
    lens = docs.select(
        "doc_id",
        F.when(norm_col() == "", 0)
        .otherwise(F.size(F.split(norm_col(), " ")))
        .alias("n_tokens"),
        F.md5(F.concat(F.lit("kmv:"), F.col("doc_id").cast("string"))).alias(
            "pri"
        ),
    )
    sample = lens.orderBy("pri", "doc_id").limit(k)
    qs = list(QUANTS)
    qarr = ", ".join(str(q) for q in qs)
    s_est = sample.agg(
        F.expr(f"percentile(n_tokens, array({qarr}))").alias("est")
    )
    s_exact = lens.agg(
        F.expr(f"percentile(n_tokens, array({qarr}))").alias("exact")
    )
    zipped = s_est.crossJoin(s_exact).select(
        F.posexplode(F.arrays_zip("est", "exact")).alias("i", "z")
    )
    qlit = F.array(*[F.lit(q) for q in qs])
    return zipped.select(
        F.element_at(qlit, F.col("i") + 1).alias("quantile"),
        F.col("z.est").alias("est_tokens"),
        F.col("z.exact").alias("exact_tokens"),
        (F.col("z.est") / F.col("z.exact") - 1.0).alias("rel_err"),
    ).orderBy("quantile")


def quantile_sketch_oracle(k: int = KMV_K) -> str:
    qs = list(QUANTS)
    qarr = ", ".join(str(q) for q in qs)
    return f"""
WITH lens AS (
  SELECT doc_id,
    CASE WHEN {norm_sql()} = '' THEN 0
         ELSE len({tokens_sql(norm_sql())}) END AS n_tokens,
    md5('kmv:' || doc_id) AS pri
  FROM documents),
sample AS (SELECT * FROM lens ORDER BY pri, doc_id LIMIT {k}),
est AS (SELECT quantile_cont(n_tokens, [{qarr}]) AS e FROM sample),
exact AS (SELECT quantile_cont(n_tokens, [{qarr}]) AS x FROM lens),
q AS (SELECT unnest([{qarr}]) AS quantile,
             unnest(generate_series(1, {len(qs)})) AS i)
SELECT q.quantile::DOUBLE AS quantile,
  est.e[q.i]::DOUBLE AS est_tokens,
  exact.x[q.i]::DOUBLE AS exact_tokens,
  est.e[q.i] / exact.x[q.i] - 1.0 AS rel_err
FROM q CROSS JOIN est CROSS JOIN exact
ORDER BY q.quantile
"""


def hll_merge(docs: DataFrame) -> DataFrame:
    """One row (n_sources, sum_source_exact, exact_union, merged_est,
    rel_err) — the MERGEABILITY demonstration that makes sketches the
    distributed primitive: per-source HLL register vectors (computed as
    if each source were its own shard) are combined by bucket-wise max
    into the union sketch, whose estimate is compared against the true
    cross-source distinct-token count.  ``sum_source_exact`` (the sum
    of per-shard exact counts) is carried to show what naive addition
    would claim — cross-shard overlap makes it a large overcount, which
    the merged sketch removes WITHOUT re-reading any token stream.

    Register construction is identical to :func:`hll_distinct` (integer
    path, portable md5); the merge is one max-agg over (bucket) — at
    cluster scale per-shard registers are 256-row side outputs and the
    union costs O(shards x 256), not a second corpus pass."""
    toks = (
        docs.withColumn("norm", norm_col())
        .filter(F.col("norm") != "")
        .select("source", F.explode(tokens_col()).alias("term"))
    )
    bucket, rho = hll_register_parts(F.col("term"))
    per_source = (
        toks.select("source", bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    merged = per_source.groupBy("bucket").agg(F.max("r").alias("r"))
    estd = hll_estimate(merged.withColumn("g", F.lit(1)), ["g"])
    est = F.col("est")
    exacts = toks.agg(
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("term").alias("exact_union"),
    )
    per_exact = (
        toks.groupBy("source")
        .agg(F.countDistinct("term").alias("c"))
        .agg(F.sum("c").alias("sum_source_exact"))
    )
    return (
        exacts.crossJoin(per_exact)
        .crossJoin(estd.drop("g"))
        .select(
            "n_sources",
            "sum_source_exact",
            "exact_union",
            est.alias("merged_est"),
            (est / F.col("exact_union") - 1.0).alias("rel_err"),
        )
    )


def hll_merge_oracle() -> str:
    m = HLL_M
    h = "md5(term)"
    w = _hex_int_sql(h, 3, 6)
    alpha_c = repr(HLL_ALPHA * m * m * (1 << 25))
    return f"""
WITH toks AS (
  SELECT source, unnest({tokens_sql(norm_sql())}) AS term
  FROM documents WHERE {norm_sql()} <> ''),
per_source AS (
  SELECT source, {_hex_int_sql(h, 1, 2)} AS bucket,
    max(CASE WHEN {w} = 0 THEN 25 ELSE 25 - len(bin({w})) END) AS r
  FROM toks GROUP BY source, bucket),
merged AS (SELECT bucket, max(r) AS r FROM per_source GROUP BY bucket),
summed AS (
  SELECT (sum((2::BIGINT ^ (25 - r))::BIGINT)::BIGINT
           + ({m} - count(*)) * {1 << 25})::BIGINT AS int_sum,
         ({m} - count(*))::BIGINT AS v_zero
  FROM merged),
exacts AS (
  SELECT count(DISTINCT source)::BIGINT AS n_sources,
         count(DISTINCT term)::BIGINT AS exact_union
  FROM toks),
per_exact AS (
  SELECT sum(c)::BIGINT AS sum_source_exact FROM (
    SELECT count(DISTINCT term)::BIGINT AS c FROM toks GROUP BY source)),
est AS (
  SELECT CASE WHEN ({alpha_c} / int_sum) <= {2.5 * m} AND v_zero > 0
              THEN {float(m)} * ln({float(m)} / v_zero)
              ELSE {alpha_c} / int_sum END AS merged_est
  FROM summed)
SELECT x.n_sources, p.sum_source_exact, x.exact_union, e.merged_est,
  e.merged_est / x.exact_union - 1.0 AS rel_err
FROM exacts x CROSS JOIN per_exact p CROSS JOIN est e
"""


#: Bloom join prefilter: k = 3 probes into m = 65536 bits (4 hex).
BJOIN_K = 3
BJOIN_M = 65536


def bloom_join_reduction(
    big: DataFrame,
    dim: DataFrame,
    big_key: str,
    dim_key: str,
) -> DataFrame:
    """One row (n_total, n_bloom_pass, n_exact, n_false_pass) — the
    Bloom-prefiltered semi-join: build a Bloom filter over the dim
    side's keys, pre-filter the big side BEFORE any shuffle, and
    compare against the exact semi-join.  The classic shuffle-reduction
    move for selective dim filters (runtime filter / sideways
    information passing — what Spark's own AQE bloom pushdown does
    under the hood, here made explicit and measurable): only
    ``n_bloom_pass`` rows (exact matches + the measured false-pass
    tail) ever reach the join exchange, and correctness is unchanged
    because the exact join still runs after the prefilter.

    Bloom bits are the portable md5 positions (k=3 x 65536), carried
    as a broadcast distinct-position table — the DataFrame rendering of
    a broadcast bitmap; all counters integer-deterministic."""
    positions = F.array(
        *[
            _hex_int(
                F.md5(F.concat(F.lit(f"{r}:"), F.col("k").cast("string"))),
                1,
                4,
            )
            for r in range(BJOIN_K)
        ]
    )
    bits = (
        dim.select(F.col(dim_key).alias("k"))
        .distinct()
        .select(F.explode(positions).alias("pos"))
        .distinct()
    )
    # per DISTINCT big key (the probe is key-functional), weighted by
    # the key's row count — one agg, no per-row explode of the big side
    keys = (
        big.select(F.col(big_key).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .persist()
    )
    passing = (
        keys.select("k", "n_rows", F.posexplode(positions).alias("i", "pos"))
        .join(F.broadcast(bits), "pos", "left_semi")
        .groupBy("k", "n_rows")
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") == BJOIN_K)
    )
    n_bloom = passing.agg(
        F.coalesce(F.sum("n_rows"), F.lit(0)).alias("n_bloom_pass")
    )
    n_total = keys.agg(F.sum("n_rows").alias("n_total"))
    n_exact = keys.join(
        F.broadcast(dim.select(F.col(dim_key).alias("k")).distinct()),
        "k",
        "left_semi",
    ).agg(F.coalesce(F.sum("n_rows"), F.lit(0)).alias("n_exact"))
    return (
        n_total.crossJoin(n_bloom)
        .crossJoin(n_exact)
        .select(
            "n_total",
            "n_bloom_pass",
            "n_exact",
            (F.col("n_bloom_pass") - F.col("n_exact")).alias("n_false_pass"),
        )
    )


def bloom_join_reduction_oracle(price_threshold: float) -> str:
    """DuckDB twin over lineitem x (orders filtered by o_totalprice):
    identical md5 positions, identical counters."""
    pos = lambda r, key: (  # noqa: E731
        f"('0x' || substr(md5('{r}:' || {key}::VARCHAR), 1, 4))::BIGINT"
    )
    dim_pos = "\nUNION\n".join(
        f"SELECT DISTINCT {pos(r, 'o_orderkey')} AS pos FROM dim"
        for r in range(BJOIN_K)
    )
    hit = " AND ".join(
        f"{pos(r, 'k')} IN (SELECT pos FROM bits)" for r in range(BJOIN_K)
    )
    return f"""
WITH dim AS MATERIALIZED (
  SELECT o_orderkey FROM orders WHERE o_totalprice > {price_threshold}),
bits AS MATERIALIZED ({dim_pos}),
keys AS MATERIALIZED (
  SELECT l_orderkey AS k, count(*)::BIGINT AS n_rows
  FROM lineitem GROUP BY l_orderkey),
n_total AS (SELECT sum(n_rows)::BIGINT AS n_total FROM keys),
n_bloom AS (
  SELECT coalesce(sum(n_rows), 0)::BIGINT AS n_bloom_pass
  FROM keys WHERE {hit}),
n_exact AS (
  SELECT coalesce(sum(n_rows), 0)::BIGINT AS n_exact
  FROM keys WHERE k IN (SELECT o_orderkey FROM dim))
SELECT t.n_total, b.n_bloom_pass, e.n_exact,
  (b.n_bloom_pass - e.n_exact)::BIGINT AS n_false_pass
FROM n_total t CROSS JOIN n_bloom b CROSS JOIN n_exact e
"""
