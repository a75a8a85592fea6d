"""Corpus-curation operators for large-scale training-data pipelines:
benchmark decontamination, sequence packing, and a quality-filter funnel.

These are the three standard curation steps between "raw deduped corpus"
and "tokenizer-ready shards" that the dedup/textstats modules don't
cover:

* **Decontamination** — drop (or flag) documents whose token n-grams
  overlap a benchmark/eval set, the GPT-3/Llama-style 13-gram rule
  (here ``n`` is a parameter; the test corpus uses 8).  Spark shape:
  the benchmark side collapses to a DISTINCT gram table that is tiny
  relative to the corpus (benchmarks are MBs, corpora are TBs), so the
  probe is explode -> **broadcast** hash join -> per-doc count with
  map-side partial aggregation.  No shuffle of corpus grams ever
  happens: the only exchange is the per-doc count rollup keyed by
  doc_id, whose partial combine reduces each task's output to at most
  one row per in-flight doc.
* **Sequence packing** — the concat-and-chunk layout every pre-training
  loader uses: documents are concatenated in a deterministic order and
  split into fixed ``capacity``-token chunks; each doc learns its
  stream offset and which chunks it spans.  Spark shape: documents are
  hashed into ``shards`` independent streams (embarrassingly parallel —
  at cluster scale each shard is one writer task; here shard =
  ``doc_id % shards`` so the DuckDB twin is bit-identical), and the
  running offset is one window cumsum per shard.  One shuffle (by
  shard), one sort — the minimum any deterministic packing needs.
* **Quality funnel** — Gopher/C4-style sequential filter rules with
  per-rule drop accounting (docs dropped by rule i = passed rules
  1..i-1, failed i).  One narrow codegen projection computes every
  rule flag, ONE aggregation produces the whole funnel — at 100 TB
  this is a single pass with map-side partials, no per-rule jobs.

Reference parity note: the reference engine (rdflib/Streamlit ontology
builder) has no corpus-curation surface; these are engine additions
mandated by the training-data brief, built on the same
``documents(doc_id, text, lang, source, n_chars)`` table and DuckDB
differential-oracle contract as ``textstats``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import (
    norm_col,
    norm_sql,
    quality_metric_cols,
    quality_metric_sql_cols,
    tokens_sql,
)

# ------------------------------------------------------------------ #
# Token n-grams (decontamination unit)
# ------------------------------------------------------------------ #

#: default decontamination gram width (token count).  13 is the
#: published GPT-3 rule; the synthetic test corpus uses shorter docs,
#: so the driver query passes 8.
DECON_N = 8


def _grams_expr(n: int, toks: str = "toks") -> str:
    """Distinct token ``n``-gram array (space-joined) as a Spark SQL
    lambda — no explode; docs shorter than ``n`` tokens contribute no
    grams (matches the published rule: short docs can't contain a full
    overlap window)."""
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size({toks})-{n}+1),"
        f" i -> array_join(slice({toks}, i, {n}), ' '))) "
        f"ELSE array() END"
    )


def _grams_sql(n: int, toks: str = "toks") -> str:
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_distinct(list_transform(generate_series(1, len({toks})-{n}+1),"
        f" i -> array_to_string({toks}[i:i+{n}-1], ' '))) "
        f"ELSE []::VARCHAR[] END"
    )


def _doc_grams(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, grams) — one narrow projection."""
    return (
        docs.withColumn("norm", norm_col())
        .withColumn("toks", F.split(F.col("norm"), " "))
        .select("doc_id", F.expr(_grams_expr(n)).alias("grams"))
    )


def decontaminate(docs: DataFrame, bench: DataFrame, n: int = DECON_N) -> DataFrame:
    """(doc_id, n_grams, n_contaminated_grams, contaminated) — flag
    every corpus document sharing at least one token ``n``-gram with
    the benchmark set ``bench`` (same ``doc_id/text`` shape).

    Plan: benchmark grams -> DISTINCT -> **broadcast**; corpus grams
    explode_outer -> broadcast LEFT hash join marking hits (map-side,
    no corpus shuffle) -> ONE per-doc aggregation computing gram count
    and hit count together.  The only corpus-side exchange is keyed by
    doc_id and carries at most one row per (task, doc) after partial
    aggregation — there is no join-back stage (a second corpus-wide
    join on doc_id would sort-merge-shuffle the whole corpus again).
    ``explode_outer`` keeps sub-``n``-token docs as a null-gram row so
    every input doc gets an output row.
    """
    bench_grams = (
        _doc_grams(bench, n)
        .select(F.explode("grams").alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        _doc_grams(docs, n)
        .select("doc_id", F.explode_outer("grams").alias("gram"))
        .join(F.broadcast(bench_grams), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("gram").alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0))
            .cast("long")
            .alias("n_contaminated_grams"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_contaminated_grams",
            (F.col("n_contaminated_grams") > 0).cast("int").alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def decontaminate_oracle(n: int = DECON_N, bench_pred: str = "doc_id % 13 = 0") -> str:
    """DuckDB twin; the benchmark set is ``documents WHERE bench_pred``
    (the driver query derives its benchmark the same way — self-
    contained, no external data)."""
    return f"""
WITH tok AS (
  SELECT doc_id, {tokens_sql(norm_sql())} AS toks FROM documents),
g AS MATERIALIZED (SELECT doc_id, {_grams_sql(n)} AS grams FROM tok),
bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE {bench_pred}),
eg AS (SELECT doc_id, unnest(grams) AS gram FROM g),
hits AS (
  SELECT eg.doc_id, count(*) AS c FROM eg JOIN bg USING (gram)
  GROUP BY eg.doc_id)
SELECT g.doc_id,
  len(g.grams) AS n_grams,
  coalesce(hits.c, 0)::BIGINT AS n_contaminated_grams,
  CASE WHEN coalesce(hits.c, 0) > 0 THEN 1 ELSE 0 END AS contaminated
FROM g LEFT JOIN hits ON g.doc_id = hits.doc_id
ORDER BY g.doc_id
"""


# ------------------------------------------------------------------ #
# Sequence packing (concat-and-chunk offsets)
# ------------------------------------------------------------------ #

PACK_CAPACITY = 256  # tokens per training chunk (test-corpus scale)
PACK_SHARDS = 8      # independent packing streams


def pack_sequences(
    docs: DataFrame,
    capacity: int = PACK_CAPACITY,
    shards: int = PACK_SHARDS,
) -> DataFrame:
    """(doc_id, shard, n_tokens, start_offset, first_chunk, last_chunk,
    n_chunks) — deterministic concat-and-chunk packing layout.

    Each document is assigned to stream ``shard = doc_id % shards``;
    within a stream documents concatenate in doc_id order and the
    stream splits into ``capacity``-token chunks.  ``start_offset`` is
    the doc's first token position in its stream; a doc spans chunks
    ``first_chunk..last_chunk`` (integer division on non-negative
    offsets — identical in Spark and DuckDB).

    Scale: shards are independent streams, so the only exchange is the
    shuffle-by-shard feeding one window cumsum per stream.  At cluster
    scale ``shards`` is chosen ~= writer parallelism (each stream is
    one output file sequence); skew is impossible by construction
    because the hash domain is uniform doc_ids, not content.
    """
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    norm = norm_col()
    base = docs.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(shards)).cast("long").alias("shard"),
        F.when(norm == "", F.lit(0))
        .otherwise(F.size(F.split(norm, " ")))
        .cast("long")
        .alias("n_tokens"),
    )
    cum = base.withColumn("cum", F.sum("n_tokens").over(w))
    start = F.col("cum") - F.col("n_tokens")
    return cum.select(
        "doc_id",
        "shard",
        "n_tokens",
        start.cast("long").alias("start_offset"),
        F.expr(f"(cum - n_tokens) DIV {capacity}").alias("first_chunk"),
        F.when(
            F.col("n_tokens") > 0, F.expr(f"(cum - 1) DIV {capacity}")
        )
        .otherwise(F.expr(f"(cum - n_tokens) DIV {capacity}"))
        .alias("last_chunk"),
    ).withColumn(
        "n_chunks", (F.col("last_chunk") - F.col("first_chunk") + 1).cast("long")
    ).orderBy("doc_id")


def pack_sequences_oracle(
    capacity: int = PACK_CAPACITY, shards: int = PACK_SHARDS
) -> str:
    return f"""
WITH base AS (
  SELECT doc_id,
    doc_id % {shards} AS shard,
    CASE WHEN {norm_sql()} = '' THEN 0
         ELSE len({tokens_sql(norm_sql())}) END::BIGINT AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, shard, n_tokens,
    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM base)
SELECT doc_id, shard, n_tokens,
  (cum - n_tokens)::BIGINT AS start_offset,
  ((cum - n_tokens) // {capacity})::BIGINT AS first_chunk,
  (CASE WHEN n_tokens > 0 THEN (cum - 1) // {capacity}
        ELSE (cum - n_tokens) // {capacity} END)::BIGINT AS last_chunk,
  (CASE WHEN n_tokens > 0 THEN (cum - 1) // {capacity}
        ELSE (cum - n_tokens) // {capacity} END
   - (cum - n_tokens) // {capacity} + 1)::BIGINT AS n_chunks
FROM c ORDER BY doc_id
"""


# ------------------------------------------------------------------ #
# Quality-filter funnel (Gopher/C4-style sequential rules)
# ------------------------------------------------------------------ #

#: (rule name, threshold predicate) — the SINGLE source of the funnel
#: thresholds: each predicate string is valid verbatim in BOTH Spark
#: SQL (``F.expr``) and DuckDB over the shared metric columns from
#: ``textstats.quality_metric_cols`` / ``quality_metric_sql_cols``.
#: Tuned so the synthetic corpus produces a non-degenerate funnel
#: (every interior stage drops someone; the digit rule intentionally
#: drops zero on the digit-free corpus and documents that a zero-drop
#: stage renders correctly).
FUNNEL_RULES = [
    ("min_tokens", "n_tokens >= 20"),
    ("avg_token_len", "avg_token_len BETWEEN 3.8 AND 5.2"),
    ("alpha_ratio", "alpha_ratio >= 0.81"),
    ("stopword_ratio", "stopword_ratio >= 0.06"),
    ("digit_ratio", "digit_ratio <= 0.2"),
]


def _funnel_flag_cols() -> list[tuple[str, Column]]:
    return [(name, F.expr(rule)) for name, rule in FUNNEL_RULES]


def quality_funnel(docs: DataFrame) -> DataFrame:
    """(stage, rule, n_dropped, n_survivors) — one row per sequential
    filter rule: ``n_dropped`` docs passed every earlier rule but
    failed this one; ``n_survivors`` passed rules 1..stage.

    ONE projection computes every flag, ONE aggregation the funnel —
    a single pass with map-side partials regardless of corpus size.
    """
    base = _quality_metrics(docs)
    flags = _funnel_flag_cols()
    aggs = []
    passed_so_far = F.lit(True)
    for i, (name, flag) in enumerate(flags, start=1):
        aggs.append(
            F.sum((passed_so_far & ~flag).cast("long")).alias(f"d{i}")
        )
        passed_so_far = passed_so_far & flag
        aggs.append(F.sum(passed_so_far.cast("long")).alias(f"s{i}"))
    row = base.agg(*aggs)
    stack_args = ", ".join(
        f"{i}, '{name}', d{i}, s{i}"
        for i, (name, _) in enumerate(FUNNEL_RULES, start=1)
    )
    return row.select(
        F.expr(
            f"stack({len(FUNNEL_RULES)}, {stack_args})"
            " as (stage, rule, n_dropped, n_survivors)"
        )
    ).orderBy("stage")


def quality_funnel_oracle() -> str:
    sums, passed = [], "TRUE"
    for i, (name, f) in enumerate(FUNNEL_RULES, start=1):
        sums.append(
            f"sum(CASE WHEN ({passed}) AND NOT ({f}) THEN 1 ELSE 0 END)::BIGINT AS d{i}"
        )
        passed = f"({passed}) AND ({f})"
        sums.append(f"sum(CASE WHEN {passed} THEN 1 ELSE 0 END)::BIGINT AS s{i}")
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS stage, '{name}' AS rule, d{i} AS n_dropped,"
        f" s{i} AS n_survivors FROM agg"
        for i, (name, _) in enumerate(FUNNEL_RULES, start=1)
    )
    return f"""
WITH base AS (
  SELECT doc_id, text, {tokens_sql(norm_sql())} AS toks FROM documents),
m AS (
  SELECT doc_id, toks, {quality_metric_sql_cols()}
  FROM base),
agg AS (SELECT {", ".join(sums)} FROM m)
{unions}
ORDER BY stage
"""


# ------------------------------------------------------------------ #
# End-to-end curation pipeline (composition + stage funnel)
# ------------------------------------------------------------------ #


def quality_pass(docs: DataFrame) -> DataFrame:
    """Documents passing ALL funnel rules, original columns preserved.
    Same flag expressions as ``quality_funnel`` — one narrow projection
    + filter, no joins."""
    base = _quality_metrics(docs)
    cond = F.lit(True)
    for _, flag in _funnel_flag_cols():
        cond = cond & flag
    return base.filter(cond).select(*docs.columns)


def _quality_metrics(docs: DataFrame) -> DataFrame:
    """Shared metric projection feeding the funnel flags — one
    definition in ``textstats`` serves both modules."""
    return quality_metric_cols(docs)


def curate_corpus(
    docs: DataFrame,
    bench: DataFrame,
    n: int = DECON_N,
    jaccard_threshold: float = 0.5,
    capacity: int = PACK_CAPACITY,
    shards: int = PACK_SHARDS,
) -> dict:
    """The full training-data curation pipeline, composed from the
    individual operators: exact dedup -> near-dup cluster removal ->
    quality filter -> benchmark decontamination -> sequence packing.

    Returns ``{"metrics": DataFrame, "packed": DataFrame, "survivors":
    DataFrame, "release": callable}``; ``metrics`` is the per-stage
    funnel ``(stage, name, docs_in, docs_out, aux)`` (aux: dup groups
    collapsed / clusters found / 0 / contaminated grams / total packed
    chunks).  Each survivor frame is persisted once and reused by the
    next stage AND its count row — no stage recomputes an earlier one.

    Cache lifetime is explicit: the funnel counts are materialized
    eagerly (5 rows), after which the intermediate stage frames are
    unpersisted here; only the final survivor set stays cached (it
    backs both returned frames) until the caller invokes ``release()``
    — repeated invocations therefore don't accumulate pinned storage.

    Scale: this is a linear chain of the already-scale-shaped
    operators; the stage counts are single-row aggregates crossJoined
    into the funnel, so the metrics DataFrame adds five tiny jobs, not
    five corpus passes beyond the stages themselves.
    """
    from .dedup import dedup_clusters, exact_dedup_groups

    # -- stage 1: exact dedup (keep min doc_id per normalized hash) ---
    groups = exact_dedup_groups(docs)
    keepers = groups.select(F.col("keeper_doc_id").alias("doc_id"))
    s1 = docs.join(keepers, "doc_id", "left_semi").persist()
    aux1 = groups.filter(F.col("n_docs") > 1).agg(
        F.count(F.lit(1)).alias("aux")
    )

    # -- stage 2: near-dup cluster removal (keep cluster keeper) ------
    clusters = dedup_clusters(s1, jaccard_threshold, ordered=False).persist()
    losers = clusters.filter(F.col("doc_id") != F.col("keeper_doc_id")).select(
        "doc_id"
    )
    s2 = s1.join(losers, "doc_id", "left_anti").persist()
    aux2 = clusters.agg(F.countDistinct("keeper_doc_id").alias("aux"))

    # -- stage 3: quality filter --------------------------------------
    s3 = quality_pass(s2).persist()
    aux3 = s3.sparkSession.range(1).select(F.lit(0).cast("long").alias("aux"))

    # -- stage 4: decontamination -------------------------------------
    decon = decontaminate(s3, bench, n)
    s4 = (
        s3.join(
            decon.filter(F.col("contaminated") == 1).select("doc_id"),
            "doc_id",
            "left_anti",
        )
    ).persist()
    aux4 = decon.agg(
        F.coalesce(F.sum("n_contaminated_grams"), F.lit(0))
        .cast("long")
        .alias("aux")
    )

    # -- stage 5: packing ---------------------------------------------
    packed = pack_sequences(s4, capacity, shards)
    aux5 = (
        packed.groupBy("shard")
        .agg(F.max("last_chunk").alias("mx"))
        .agg(F.coalesce(F.sum(F.col("mx") + 1), F.lit(0)).cast("long").alias("aux"))
    )

    def cnt(df, alias):
        return df.agg(F.count(F.lit(1)).cast("long").alias(alias))

    # ONE count aggregate per frame (stage n's docs_out IS stage n+1's
    # docs_in — the naive per-stage pair recomputes every interior
    # count twice), crossJoined with the five aux aggregates into a
    # single 1-row frame.  Eager checkpoint: the row is consumed by
    # five projection branches below, and an unpersisted multi-consumer
    # aggregate would re-run its whole subtree per branch (the
    # CTE-reuse trap in the engineering notes).
    wide = (
        cnt(docs, "c0")
        .crossJoin(cnt(s1, "c1"))
        .crossJoin(cnt(s2, "c2"))
        .crossJoin(cnt(s3, "c3"))
        .crossJoin(cnt(s4, "c4"))
        .crossJoin(aux1.select(F.col("aux").cast("long").alias("a1")))
        .crossJoin(aux2.select(F.col("aux").cast("long").alias("a2")))
        .crossJoin(aux3.select(F.col("aux").cast("long").alias("a3")))
        .crossJoin(aux4.select(F.col("aux").cast("long").alias("a4")))
        .crossJoin(aux5.select(F.col("aux").cast("long").alias("a5")))
        .localCheckpoint(eager=True)
    )

    def srow(i, name, din, dout, aux):
        return wide.select(
            F.lit(i).alias("stage"),
            F.lit(name).alias("name"),
            F.col(din).alias("docs_in"),
            F.col(dout).alias("docs_out"),
            F.col(aux).alias("aux"),
        )

    metrics = (
        srow(1, "exact_dedup", "c0", "c1", "a1")
        .unionByName(srow(2, "near_dup", "c1", "c2", "a2"))
        .unionByName(srow(3, "quality", "c2", "c3", "a3"))
        .unionByName(srow(4, "decontaminate", "c3", "c4", "a4"))
        .unionByName(srow(5, "pack", "c4", "c4", "a5"))
        .orderBy("stage")
    )
    for df in (s1, clusters, s2, s3):
        df.unpersist()
    return {
        "metrics": metrics,
        "packed": packed,
        "survivors": s4,
        "release": lambda: s4.unpersist(),
    }


def curate_corpus_oracle(
    n: int = DECON_N,
    jaccard_threshold: float = 0.5,
    capacity: int = PACK_CAPACITY,
    shards: int = PACK_SHARDS,
    bench_pred: str = "doc_id % 13 = 0",
) -> str:
    """DuckDB twin of the whole pipeline funnel.  The stage-1 survivor
    set SHADOWS the ``documents`` name as a CTE (inner stages reuse the
    per-op CTE fragments verbatim — they read ``documents`` and so see
    the survivors; the raw corpus stays reachable as
    ``main.documents``)."""
    from .dedup import MAX_BUCKET, _pairs_cte_sql

    # pass = every funnel rule, straight from the single FUNNEL_RULES
    # source (same strings the Spark flags and funnel oracle compile).
    pass_pred = " AND ".join(f"({rule})" for _, rule in FUNNEL_RULES)
    return f"""
WITH RECURSIVE
keep1 AS (
  SELECT min(doc_id) AS doc_id FROM main.documents
  GROUP BY md5({norm_sql()})),
documents AS MATERIALIZED (
  SELECT d.* FROM main.documents d JOIN keep1 USING (doc_id)),
{_pairs_cte_sql(MAX_BUCKET)},
cpairs AS (
  SELECT doc_a, doc_b FROM verified WHERE jaccard >= {jaccard_threshold}),
csym AS (
  SELECT doc_a AS u, doc_b AS v FROM cpairs
  UNION SELECT doc_b, doc_a FROM cpairs),
cnodes AS (SELECT DISTINCT u AS nd FROM csym),
creach(nd, m) AS (
  SELECT nd, nd FROM cnodes
  UNION
  SELECT r.nd, s.v FROM creach r JOIN csym s ON r.m = s.u),
ccl AS MATERIALIZED (SELECT nd AS doc_id, min(m) AS keeper FROM creach GROUP BY nd),
s2 AS MATERIALIZED (
  SELECT d.* FROM documents d
  WHERE d.doc_id NOT IN
    (SELECT doc_id FROM ccl WHERE doc_id <> keeper)),
qm AS (
  SELECT doc_id, text, {tokens_sql(norm_sql())} AS toks FROM s2),
qx AS (
  SELECT doc_id, toks, {quality_metric_sql_cols()}
  FROM qm),
s3 AS MATERIALIZED (
  SELECT s2.* FROM s2 JOIN qx USING (doc_id) WHERE {pass_pred}),
dtok AS (SELECT doc_id, {tokens_sql(norm_sql())} AS toks FROM s3),
dgr AS (SELECT doc_id, {_grams_sql(n)} AS grams FROM dtok),
btok AS (
  SELECT doc_id, {tokens_sql(norm_sql())} AS toks
  FROM main.documents WHERE {bench_pred}),
bgr AS (
  SELECT DISTINCT unnest({_grams_sql(n)}) AS gram FROM btok),
degr AS (SELECT doc_id, unnest(grams) AS gram FROM dgr),
dhits AS MATERIALIZED (
  SELECT degr.doc_id, count(*) AS c FROM degr JOIN bgr USING (gram)
  GROUP BY degr.doc_id),
s4 AS MATERIALIZED (
  SELECT s3.* FROM s3 LEFT JOIN dhits USING (doc_id)
  WHERE coalesce(dhits.c, 0) = 0),
pb AS (
  SELECT doc_id, doc_id % {shards} AS shard,
    CASE WHEN {norm_sql()} = '' THEN 0
         ELSE len({tokens_sql(norm_sql())}) END::BIGINT AS n_tokens
  FROM s4),
pcum AS (
  SELECT shard, n_tokens,
    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM pb),
pchunks AS (
  SELECT coalesce(sum(mx + 1), 0)::BIGINT AS aux FROM (
    SELECT shard,
      max(CASE WHEN n_tokens > 0 THEN (cum - 1) // {capacity}
               ELSE (cum - n_tokens) // {capacity} END) AS mx
    FROM pcum GROUP BY shard))
SELECT 1 AS stage, 'exact_dedup' AS name,
  (SELECT count(*) FROM main.documents)::BIGINT AS docs_in,
  (SELECT count(*) FROM documents)::BIGINT AS docs_out,
  (SELECT count(*) FROM (
     SELECT md5({norm_sql()}) AS h FROM main.documents
     GROUP BY 1 HAVING count(*) > 1))::BIGINT AS aux
UNION ALL
SELECT 2, 'near_dup',
  (SELECT count(*) FROM documents),
  (SELECT count(*) FROM s2),
  (SELECT count(DISTINCT keeper) FROM ccl)
UNION ALL
SELECT 3, 'quality',
  (SELECT count(*) FROM s2),
  (SELECT count(*) FROM s3),
  0
UNION ALL
SELECT 4, 'decontaminate',
  (SELECT count(*) FROM s3),
  (SELECT count(*) FROM s4),
  (SELECT coalesce(sum(c), 0) FROM dhits)::BIGINT
UNION ALL
SELECT 5, 'pack',
  (SELECT count(*) FROM s4),
  (SELECT count(*) FROM s4),
  (SELECT aux FROM pchunks)
ORDER BY stage
"""


# ------------------------------------------------------------------ #
# Deterministic train/val/test split (hash-bucket assignment)
# ------------------------------------------------------------------ #

SPLIT_SALT = "split-v1"


def split_corpus(
    docs: DataFrame,
    val_pct: int = 5,
    test_pct: int = 5,
    salt: str = SPLIT_SALT,
) -> DataFrame:
    """(doc_id, source, bucket, split) — deterministic hash-bucket
    corpus split: ``bucket = int(md5(salt || doc_id)[:4hex]) % 100``,
    buckets [0, test) -> test, [test, test+val) -> val, rest train.

    Content-independent (id-hashed) so re-runs and incremental loads
    land identically; salted so a new split version re-rolls every
    assignment; a pure narrow projection — at 100 TB this is a filter
    pushed into every downstream reader, never a materialized shuffle.
    The md5-hex primitive is the engine's portable hash (identical in
    DuckDB), so the assignment itself is oracle-checked."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    return docs.select(
        "doc_id",
        "source",
        bucket.alias("bucket"),
        F.when(bucket < test_pct, F.lit("test"))
        .when(bucket < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    ).orderBy("doc_id")


def split_corpus_oracle(
    val_pct: int = 5, test_pct: int = 5, salt: str = SPLIT_SALT
) -> str:
    return f"""
WITH b AS (
  SELECT doc_id, source,
    ('0x' || substr(md5('{salt}' || doc_id), 1, 4))::BIGINT % 100 AS bucket
  FROM documents)
SELECT doc_id, source, bucket,
  CASE WHEN bucket < {test_pct} THEN 'test'
       WHEN bucket < {test_pct} + {val_pct} THEN 'val'
       ELSE 'train' END AS split
FROM b ORDER BY doc_id
"""


def quota_sample(
    docs: DataFrame,
    group: str = "source",
    n_per_group: int = 100,
    salt: str = SPLIT_SALT,
) -> DataFrame:
    """Deterministic per-group quota sampling: exactly
    ``min(n_per_group, |group|)`` documents per ``group``, chosen by
    ranking the group's docs on ``md5(salt || doc_id)`` — the domain-
    balancing step that stops a handful of huge hosts from dominating
    a web corpus.

    Properties a pipeline needs and `df.sample()` can't give:
    *exact* quotas (sample() is Bernoulli — only expected counts),
    rerun-stability (hash order, no RNG state), incremental stability
    (a doc's rank only improves as new docs arrive, never re-rolls),
    and salt-versioned re-draws.

    One shuffle on the group key; the per-group sort is bounded by the
    group's size, and at web scale group count (domains) provides the
    parallelism.  Hot groups cost their own size once — the same cost
    any exact top-k-per-key has."""
    h = F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string")))
    w = Window.partitionBy(group).orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_group)
        .orderBy(group, "sample_rank")
    )


def quota_sample_oracle(
    group: str = "source",
    n_per_group: int = 100,
    salt: str = SPLIT_SALT,
    columns: str = "*",
) -> str:
    return f"""
WITH r AS (
  SELECT *, row_number() OVER (
    PARTITION BY {group}
    ORDER BY md5('{salt}' || doc_id) ASC, doc_id ASC) AS sample_rank
  FROM documents)
SELECT {columns} FROM r WHERE sample_rank <= {n_per_group}
ORDER BY {group}, sample_rank
"""


def chunk_text(
    docs: DataFrame, chunk_tokens: int = 128, overlap: int = 16
) -> DataFrame:
    """(doc_id, chunk_idx, n_chunk_tokens, chunk_text) — sliding-window
    document splitting (the RAG/pretraining chunker): windows of
    ``chunk_tokens`` tokens advancing by ``chunk_tokens - overlap``,
    last window truncated at the document end.  A doc with
    ``n <= chunk_tokens`` tokens yields exactly one chunk; empty docs
    yield none.  ``n_chunks = 1 + ceil((n - size) / step)`` — integer
    math, identical in both engines.

    One narrow projection builds every chunk as an array slice inside
    codegen (no join, no window); ``posexplode`` fans out to chunk
    rows.  At 100 TB the fan-out factor is ~n/step per doc and the op
    stays embarrassingly parallel — chunks never cross documents, so
    no shuffle at all (contrast ``pack_sequences``, which by design
    concatenates across docs and needs the per-shard cumsum)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toked = (
        docs.withColumn("norm", norm_col())
        .withColumn(
            "toks",
            F.when(F.col("norm") == "", F.expr("array()")).otherwise(
                F.split(F.col("norm"), " ")
            ),
        )
        .withColumn("n", F.size("toks"))
        .withColumn(
            "n_chunks",
            F.when(F.col("n") == 0, 0)
            .when(F.col("n") <= chunk_tokens, 1)
            .otherwise(
                F.lit(1)
                + F.ceil((F.col("n") - chunk_tokens) / F.lit(float(step))).cast(
                    "int"
                )
            ),
        )
    )
    chunks = F.expr(
        f"transform(sequence(0, n_chunks - 1),"
        f" i -> slice(toks, i * {step} + 1, {chunk_tokens}))"
    )
    return (
        toked.filter(F.col("n_chunks") > 0)
        .select("doc_id", F.posexplode(chunks).alias("chunk_idx", "ctoks"))
        .select(
            "doc_id",
            "chunk_idx",
            F.size("ctoks").alias("n_chunk_tokens"),
            F.array_join("ctoks", " ").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


def chunk_text_oracle(chunk_tokens: int = 128, overlap: int = 16) -> str:
    step = chunk_tokens - overlap
    return f"""
WITH t AS (
  SELECT doc_id,
    CASE WHEN {norm_sql()} = '' THEN []::VARCHAR[]
         ELSE {tokens_sql(norm_sql())} END AS toks
  FROM documents),
n AS (
  SELECT doc_id, toks, len(toks) AS n,
    CASE WHEN len(toks) = 0 THEN 0
         WHEN len(toks) <= {chunk_tokens} THEN 1
         ELSE 1 + ceil((len(toks) - {chunk_tokens}) / {step}.0)::INT
    END AS n_chunks
  FROM t),
ex AS (
  SELECT doc_id, i - 1 AS chunk_idx,
    toks[(i - 1) * {step} + 1 : (i - 1) * {step} + {chunk_tokens}] AS ctoks
  FROM n, unnest(generate_series(1, n_chunks)) AS u(i)
  WHERE n_chunks > 0)
SELECT doc_id, chunk_idx::INT AS chunk_idx,
  len(ctoks)::INT AS n_chunk_tokens,
  array_to_string(ctoks, ' ') AS chunk_text
FROM ex ORDER BY doc_id, chunk_idx
"""


def budget_sample(
    docs: DataFrame,
    token_budget: int,
    group: str = "source",
    overrides: dict[str, int] | None = None,
    salt: str = SPLIT_SALT,
) -> DataFrame:
    """(group, doc_id, n_tokens, cum_tokens) — the data-mixture
    sampler: walk each group's documents in salted-hash order and keep
    whole docs while the group's token budget lasts (a doc is kept iff
    the running total BEFORE it is under the budget — greedy prefix,
    so the last kept doc may overshoot; budgets are honored to ±1 doc,
    which is how real mixture recipes specify them).  ``overrides``
    maps specific groups to their own budget (pretraining mixtures
    weight sources differently); everything else gets ``token_budget``.

    Same determinism contract as ``quota_sample``/``split_corpus``:
    hash order means rerun- and increment-stable draws, salt-versioned
    re-rolls, integer-only math (bit-identical in DuckDB).  One window
    cumsum per group — a single shuffle."""
    h = F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string")))
    w = (
        Window.partitionBy(group)
        .orderBy(h.asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    budget = F.lit(token_budget)
    for g, b in (overrides or {}).items():
        budget = F.when(F.col(group) == g, F.lit(b)).otherwise(budget)
    norm = norm_col()
    return (
        docs.withColumn(
            "n_tokens",
            F.when(norm == "", 0).otherwise(F.size(F.split(norm, " "))),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") - F.col("n_tokens") < budget)
        .select(group, "doc_id", "n_tokens", "cum_tokens")
        .orderBy(group, "cum_tokens")
    )


def budget_sample_oracle(
    token_budget: int,
    group: str = "source",
    overrides: dict[str, int] | None = None,
    salt: str = SPLIT_SALT,
) -> str:
    budget = str(token_budget)
    if overrides:
        whens = " ".join(
            f"WHEN {group} = '{g}' THEN {b}" for g, b in overrides.items()
        )
        budget = f"(CASE {whens} ELSE {token_budget} END)"
    return f"""
WITH t AS (
  SELECT {group}, doc_id,
    CASE WHEN {norm_sql()} = '' THEN 0
         ELSE len({tokens_sql(norm_sql())}) END AS n_tokens
  FROM documents),
c AS (
  SELECT {group}, doc_id, n_tokens,
    sum(n_tokens) OVER (PARTITION BY {group}
      ORDER BY md5('{salt}' || doc_id) ASC, doc_id ASC
      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
  FROM t)
SELECT {group}, doc_id, n_tokens, cum_tokens
FROM c WHERE cum_tokens - n_tokens < {budget}
ORDER BY {group}, cum_tokens
"""


def domain_quality(
    docs: DataFrame, min_docs: int = 5, block_threshold: float = 0.4
) -> DataFrame:
    """(source, n_docs, mean_quality, min_quality, frac_low, blocked)
    — per-domain quality roll-up and blocklist proposal: the way web
    curation actually operates (C4/RefinedWeb drop whole hosts, not
    single pages — public literature).  ``blocked`` proposes domains
    with >= ``min_docs`` pages whose mean quality falls below
    ``block_threshold``.

    Scale shape: the per-doc quality metrics are one narrow map-side
    projection; the roll-up is ONE (source)-keyed two-phase agg.
    Domain count is host-vocabulary-sized — no window, no join."""
    from .textstats import quality_scores

    q = quality_scores(docs).select("doc_id", "quality")
    src = docs.select("doc_id", "source")
    per = src.join(q, "doc_id").groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("quality").alias("mean_quality"),
        F.min("quality").alias("min_quality"),
        F.avg(
            F.when(F.col("quality") < block_threshold, 1.0).otherwise(0.0)
        ).alias("frac_low"),
    )
    return per.select(
        "source",
        "n_docs",
        "mean_quality",
        "min_quality",
        "frac_low",
        (
            (F.col("n_docs") >= min_docs)
            & (F.col("mean_quality") < block_threshold)
        ).alias("blocked"),
    ).orderBy("source")


def domain_quality_oracle(
    min_docs: int = 5, block_threshold: float = 0.4
) -> str:
    from .textstats import quality_scores_oracle

    inner = quality_scores_oracle().strip().rstrip()
    # reuse the per-doc quality oracle verbatim as a subquery
    return f"""
WITH q AS ({inner.replace("ORDER BY doc_id", "")}),
per AS (
  SELECT d.source, count(*)::BIGINT AS n_docs,
    avg(q.quality) AS mean_quality,
    min(q.quality) AS min_quality,
    avg(CASE WHEN q.quality < {block_threshold} THEN 1.0 ELSE 0.0 END)
      AS frac_low
  FROM documents d JOIN q ON d.doc_id = q.doc_id
  GROUP BY d.source)
SELECT source, n_docs, mean_quality, min_quality, frac_low,
  n_docs >= {min_docs} AND mean_quality < {block_threshold} AS blocked
FROM per ORDER BY source
"""


def cluster_representatives(
    docs: DataFrame, jaccard_threshold: float = 0.5
) -> DataFrame:
    """(keeper_doc_id, rep_doc_id, cluster_size, rep_quality) — pick
    the highest-quality member of every near-dup cluster as its
    representative (quality-aware keep policy, vs dedup_clusters'
    min-id keeper).  The dedup decision a curation pipeline actually
    wants: keep the best copy, not the first-crawled one.

    Composition: dedup_clusters (LSH -> verify -> CC) x quality_scores
    — the representative is the (quality, -doc_id) struct max per
    cluster, one two-phase agg over the cluster-involved docs only."""
    from .dedup import dedup_clusters
    from .textstats import quality_scores

    clusters = dedup_clusters(docs, jaccard_threshold)
    q = quality_scores(docs).select("doc_id", "quality")
    joined = clusters.join(q, "doc_id")
    best = (
        joined.groupBy("keeper_doc_id")
        .agg(
            F.max(
                F.struct(F.col("quality"), (-F.col("doc_id")).alias("nid"))
            ).alias("w"),
            F.max("cluster_size").alias("cluster_size"),
        )
        .select(
            "keeper_doc_id",
            (-F.col("w.nid")).cast("long").alias("rep_doc_id"),
            "cluster_size",
            F.col("w.quality").alias("rep_quality"),
        )
        .orderBy("keeper_doc_id")
    )
    return best


def cluster_representatives_oracle(jaccard_threshold: float = 0.5) -> str:
    from .dedup import dedup_clusters_oracle
    from .textstats import quality_scores_oracle

    clusters = dedup_clusters_oracle(jaccard_threshold).strip()
    clusters = clusters[: clusters.rindex("ORDER BY")]
    quality = quality_scores_oracle().strip()
    quality = quality[: quality.rindex("ORDER BY")]
    return f"""
WITH clusters AS ({clusters}),
q AS ({quality}),
j AS (
  SELECT c.keeper_doc_id, c.doc_id, c.cluster_size, q.quality
  FROM clusters c JOIN q ON c.doc_id = q.doc_id)
SELECT keeper_doc_id,
  CAST(-((max({{'quality': quality, 'nid': -doc_id}})).nid) AS BIGINT)
    AS rep_doc_id,
  max(cluster_size)::BIGINT AS cluster_size,
  (max({{'quality': quality, 'nid': -doc_id}})).quality AS rep_quality
FROM j
GROUP BY keeper_doc_id
ORDER BY keeper_doc_id
"""


# ------------------------------------------------------------------ #
# Unequal-probability sampling + leakage-safe grouped split
# ------------------------------------------------------------------ #


def weighted_sample(
    docs: DataFrame, k: int = 32, salt: str = SPLIT_SALT
) -> DataFrame:
    """(doc_id, source, weight, key) — a deterministic weighted random
    sample WITHOUT replacement of ``k`` documents with inclusion
    probability proportional to length (weight = n_chars): the
    Efraimidis–Spirakis A-ES reservoir scheme (public literature),
    which is THE one-pass distributed recipe — each row gets key =
    ln(u) / w for u ~ U(0,1) and the global top-k keys are the sample
    (ln(u)/w is the monotone, well-conditioned form of u^(1/w)).

    Determinism: u is the portable md5 slice (12 hex = 48 bits, +1 so
    u > 0; numerator and denominator both exactly representable), so
    the sample is reproducible across runs, engines, and partitionings
    — the property df.sample() cannot give and a training-mixture
    recipe must have.

    Scale: narrow projection + global top-k (TakeOrdered — partial
    per-partition heaps, no full sort, no shuffle of the corpus)."""
    u = (
        _hex48(F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))))
        + 1.0
    ) / float((1 << 48) + 1)
    key = F.log(u) / F.col("n_chars")
    return (
        docs.select(
            "doc_id",
            "source",
            F.col("n_chars").alias("weight"),
            key.alias("key"),
        )
        .orderBy(F.desc("key"), "doc_id")
        .limit(k)
    )


def _hex48(h):
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("long").cast("double")


def weighted_sample_oracle(k: int = 32, salt: str = SPLIT_SALT) -> str:
    return f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars AS weight,
    ln((('0x' || substr(md5('{salt}' || doc_id), 1, 12))::BIGINT + 1.0)
       / {float((1 << 48) + 1)!r}) / n_chars AS key
  FROM documents)
SELECT doc_id, source, weight, key
FROM keyed ORDER BY key DESC, doc_id LIMIT {k}
"""


def grouped_split(
    docs: DataFrame,
    val_pct: int = 10,
    test_pct: int = 10,
    group: str = "source",
    salt: str = SPLIT_SALT,
) -> DataFrame:
    """(split, n_groups, n_docs) — the leakage-safe corpus split:
    hash-bucket WHOLE groups (hosts/sources), not documents, so near-
    duplicate pages from one site can never straddle train/val — the
    GroupShuffleSplit discipline that doc-level splitting (see
    ``split_corpus``) violates on a web corpus where intra-host
    near-dups are the norm.

    Assignment is one md5 of the group key (content-independent,
    incremental-load stable); the rollup is a two-level agg.  At scale
    the assignment is a broadcast-joinable group->split table, and the
    audit rollup here is its health check."""
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), F.col(group))), 1, 4),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = (
        F.when(bucket < test_pct, F.lit("test"))
        .when(bucket < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return (
        docs.select(F.col(group).alias("grp"), split.alias("split"))
        .groupBy("split")
        .agg(
            F.countDistinct("grp").alias("n_groups"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("split")
    )


def grouped_split_oracle(
    val_pct: int = 10,
    test_pct: int = 10,
    group: str = "source",
    salt: str = SPLIT_SALT,
) -> str:
    return f"""
WITH b AS (
  SELECT {group} AS grp,
    ('0x' || substr(md5('{salt}' || {group}), 1, 4))::BIGINT % 100 AS bucket
  FROM documents),
s AS (
  SELECT grp,
    CASE WHEN bucket < {test_pct} THEN 'test'
         WHEN bucket < {test_pct} + {val_pct} THEN 'val'
         ELSE 'train' END AS split
  FROM b)
SELECT split, count(DISTINCT grp)::BIGINT AS n_groups,
       count(*)::BIGINT AS n_docs
FROM s GROUP BY split ORDER BY split
"""


def mixture_weights(
    docs: DataFrame, alpha: float = 0.3, token_budget: int = 100_000
) -> DataFrame:
    """(source, n_tokens, weight, expected_tokens, epochs) — the
    temperature-based mixture recipe (mC4 / multilingual-LM sampling,
    public literature): source i is drawn with weight n_i^alpha /
    sum_j n_j^alpha, flattening the natural-size distribution so giant
    sources stop drowning small ones (alpha = 1 is proportional,
    alpha = 0 uniform).  ``expected_tokens`` = weight x budget;
    ``epochs`` = expected_tokens / n_i is the over-sampling factor the
    recipe implies for each small source — the number a data engineer
    actually checks before a run (epochs >> 1 on a tiny source means
    memorization risk).

    One token-count aggregation per source + a broadcast total; the
    weight math is a projection.  Complements ``budget_sample`` (which
    EXECUTES a draw given explicit budgets) by COMPUTING the budgets."""
    from .textstats import norm_col, tokens_col

    n = (
        docs.withColumn("norm", norm_col())
        .select(
            "source",
            F.when(F.col("norm") == "", 0)
            .otherwise(F.size(tokens_col()))
            .alias("t"),
        )
        .groupBy("source")
        .agg(F.sum("t").alias("n_tokens"))
        .persist()  # consumed by the normalizer agg AND the projection
    )
    tot = n.agg(
        F.sum(F.pow(F.col("n_tokens").cast("double"), alpha)).alias("z")
    )
    w = F.pow(F.col("n_tokens").cast("double"), alpha) / F.col("z")
    return (
        n.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            w.alias("weight"),
            (w * token_budget).alias("expected_tokens"),
            (w * token_budget / F.col("n_tokens")).alias("epochs"),
        )
        .orderBy("source")
    )


def mixture_weights_oracle(
    alpha: float = 0.3, token_budget: int = 100_000
) -> str:
    from .textstats import norm_sql, tokens_sql

    return f"""
WITH n AS (
  SELECT source,
    sum(CASE WHEN {norm_sql()} = '' THEN 0
             ELSE len({tokens_sql(norm_sql())}) END)::BIGINT AS n_tokens
  FROM documents GROUP BY source),
tot AS (SELECT sum(n_tokens ^ {alpha}) AS z FROM n)
SELECT source, n_tokens,
  (n_tokens ^ {alpha}) / tot.z AS weight,
  (n_tokens ^ {alpha}) / tot.z * {token_budget} AS expected_tokens,
  (n_tokens ^ {alpha}) / tot.z * {token_budget} / n_tokens AS epochs
FROM n CROSS JOIN tot ORDER BY source
"""


# ------------------------------------------------------------------ #
# DSIR-style importance resampling (target-domain selection)
# ------------------------------------------------------------------ #


def dsir_select(
    docs: DataFrame,
    target_lang: str = "en",
    alpha: float = 0.5,
    k: int = 40,
) -> DataFrame:
    """(doc_id, lang, source, n_tokens, avg_log_ratio) — the ``k``
    non-target documents whose token distribution is closest to the
    target domain, by Data Selection via Importance Resampling (DSIR,
    public literature): per-token importance weight ``ln p_target(w) -
    ln p_raw(w)`` under two Lidstone-smoothed unigram LMs (target =
    ``lang == target_lang`` docs; raw = the whole corpus), averaged
    per document, top-k selected.

    Scale shape: both LMs come from ONE token-explode pass (the raw
    vocabulary agg subsumes the target one via a conditional count);
    the per-token log-ratio table is vocabulary-sized — broadcast-or-
    shuffle joined back to the token stream (AQE decides); the doc
    rollup is a hash agg keyed by doc_id and the top-k is
    ``TakeOrdered`` (per-partition heaps + driver merge of k rows),
    never a global sort.  The same one-pass shape holds when "target"
    is a hashed n-gram feature space instead of whole tokens."""
    toks = (
        docs.withColumn("norm", norm_col())
        .filter(F.col("norm") != "")
        .select(
            "doc_id",
            "lang",
            "source",
            F.explode(F.split(F.col("norm"), " ")).alias("term"),
        )
    )
    is_tgt = F.col("lang") == target_lang
    vocab = (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("c_raw"),
            F.sum(F.when(is_tgt, 1).otherwise(0)).alias("c_tgt"),
        )
        .persist()
    )
    consts = vocab.agg(
        F.sum("c_raw").alias("n_raw"),
        F.sum("c_tgt").alias("n_tgt"),
        F.count(F.lit(1)).alias("v_raw"),
        F.sum(F.when(F.col("c_tgt") > 0, 1).otherwise(0)).alias("v_tgt"),
    )
    ratio = vocab.crossJoin(F.broadcast(consts)).select(
        "term",
        (
            F.log(
                (F.col("c_tgt") + F.lit(alpha))
                / (F.col("n_tgt") + F.lit(alpha) * (F.col("v_tgt") + 1))
            )
            - F.log(
                (F.col("c_raw") + F.lit(alpha))
                / (F.col("n_raw") + F.lit(alpha) * (F.col("v_raw") + 1))
            )
        ).alias("log_ratio"),
    )
    return (
        toks.filter(~is_tgt)
        .join(ratio, "term")
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("log_ratio").alias("avg_log_ratio"),
        )
        .orderBy(F.col("avg_log_ratio").desc(), "doc_id")
        .limit(k)
    )


def dsir_select_oracle(
    target_lang: str = "en", alpha: float = 0.5, k: int = 40
) -> str:
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, lang, source,
         unnest({tokens_sql(norm_sql())}) AS term
  FROM documents WHERE {norm_sql()} <> ''),
vocab AS MATERIALIZED (
  SELECT term, count(*)::BIGINT AS c_raw,
    sum(CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END)::BIGINT
      AS c_tgt
  FROM toks GROUP BY term),
consts AS (
  SELECT sum(c_raw)::BIGINT AS n_raw, sum(c_tgt)::BIGINT AS n_tgt,
    count(*)::BIGINT AS v_raw,
    sum(CASE WHEN c_tgt > 0 THEN 1 ELSE 0 END)::BIGINT AS v_tgt
  FROM vocab),
ratio AS (
  SELECT term,
    ln((c_tgt + {alpha}) / (n_tgt + {alpha} * (v_tgt + 1)))
      - ln((c_raw + {alpha}) / (n_raw + {alpha} * (v_raw + 1)))
      AS log_ratio
  FROM vocab CROSS JOIN consts)
SELECT t.doc_id, t.lang, t.source, count(*)::BIGINT AS n_tokens,
  avg(r.log_ratio) AS avg_log_ratio
FROM toks t JOIN ratio r USING (term)
WHERE t.lang <> '{target_lang}'
GROUP BY t.doc_id, t.lang, t.source
ORDER BY avg_log_ratio DESC, t.doc_id LIMIT {k}
"""


# ------------------------------------------------------------------ #
# leakage-safe (dedup-aware) corpus splitting
# ------------------------------------------------------------------ #


def leakage_safe_split(
    docs: DataFrame,
    val_pct: int = 5,
    test_pct: int = 5,
    jaccard_threshold: float = 0.5,
    salt: str = SPLIT_SALT,
) -> DataFrame:
    """(doc_id, source, split_key, bucket, split) — the dedup-aware
    upgrade of :func:`split_corpus`: hash-bucket assignment keyed on
    the NEAR-DUP CLUSTER representative instead of the doc id, so every
    member of a near-duplicate cluster lands in the same split.  Plain
    id-hash splitting leaks: a doc and its near-copy straddle
    train/test and the eval measures memorization (the
    train-test-contamination failure mode dedup exists to prevent —
    Lee et al. 2022, public literature).

    Plan: the canonical map (``dedup_clusters`` — LSH candidates,
    exact verify, O(log n) connected components) is O(dup-involved
    docs); a LEFT join attaches it to the corpus (absent -> the doc is
    its own key), then the split is the same salted-md5 narrow
    projection as split_corpus.  Singleton docs get bit-identical
    assignments to split_corpus at the same salt."""
    from .dedup import dedup_clusters

    cl = dedup_clusters(docs, jaccard_threshold).select(
        "doc_id", "keeper_doc_id"
    )
    keyed = docs.join(cl, "doc_id", "left").select(
        "doc_id",
        "source",
        F.coalesce(F.col("keeper_doc_id"), F.col("doc_id")).alias(
            "split_key"
        ),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(salt), F.col("split_key").cast("string"))
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    return keyed.select(
        "doc_id",
        "source",
        "split_key",
        bucket.alias("bucket"),
        F.when(bucket < test_pct, F.lit("test"))
        .when(bucket < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    ).orderBy("doc_id")


def leakage_safe_split_oracle(
    val_pct: int = 5,
    test_pct: int = 5,
    jaccard_threshold: float = 0.5,
    salt: str = SPLIT_SALT,
) -> str:
    from .dedup import clusters_ctes_sql

    return f"""
WITH RECURSIVE {clusters_ctes_sql(jaccard_threshold)},
keyed AS (
  SELECT d.doc_id, d.source,
         coalesce(cc.keeper_doc_id, d.doc_id) AS split_key
  FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id),
b AS (
  SELECT *,
    ('0x' || substr(md5('{salt}' || split_key), 1, 4))::BIGINT % 100
      AS bucket
  FROM keyed)
SELECT doc_id, source, split_key, bucket,
  CASE WHEN bucket < {test_pct} THEN 'test'
       WHEN bucket < {test_pct} + {val_pct} THEN 'val'
       ELSE 'train' END AS split
FROM b ORDER BY doc_id
"""
