"""Unigram-style tokenizer vocabulary learning (the SentencePiece
unigram-LM family, Kudo 2018, public literature) as DataFrame algebra
— the second tokenizer trainer next to :mod:`tokenizer`'s BPE: BPE
*grows* a vocabulary bottom-up by merges; the unigram family *prunes*
a rich seed vocabulary top-down by how much each piece is actually
used in the corpus-optimal segmentation.

Integer-exact variant: true unigram training runs probabilistic EM
with float log-likelihoods, whose per-word argmax is not portable
across engines at the last ulp.  This implementation keeps the same
loop structure — seed, (re-)segment, count usage, prune — but scores a
segmentation by the exact total order

    (fewest pieces, then highest summed piece score, then first in
     deterministic enumeration order)

with BIGINT piece scores (seed = substring corpus frequency, later
rounds = prior-round usage), so the Viterbi argmax is bit-identical in
Spark and DuckDB and the whole trainer is differentially testable.
Fewest-pieces is the MDL surrogate for the unigram likelihood; the
float-EM upgrade changes only the score column, not the plan.

Plan shape (the part that scales):

1. corpus -> word-frequency table: ONE token explode + groupBy; every
   later step works on the Heaps-law-bounded *vocabulary*, never the
   corpus (same stance as the BPE trainer).  Words are length-capped
   at ``maxlen`` (the rare ultra-long tail is dropped, documented).
2. candidate segmentations are a PRECOMPUTED composition table: all
   ways to split a length-n word into pieces of length <= ``maxpiece``
   (<= 108 compositions at n = 8, tribonacci-bounded), embedded
   identically in both engines and equi-joined on word length — the
   bounded-DP-as-data trick; no recursion, no UDF, one window per
   round picks each word's best valid segmentation.
3. per prune round: segment (join compositions x broadcast vocab),
   argmax by the total order above, count piece usage weighted by word
   frequency, keep the top-k multi-char pieces (+ all single chars,
   which guarantee every word stays segmentable), shrinking k per
   round.

At 100 TB: step 1 is the only corpus-sized job; rounds cost
O(|vocab| * compositions) — millions of rows, broadcast-joined,
independent of corpus size.  A huge *piece* vocabulary would swap the
composition table for the classic Viterbi DP as ``maxlen`` chained
joins; the composition table wins while compositions-per-word (<= 108)
stays below DP's plan-depth cost, which holds for any ``maxlen`` a
subword tokenizer uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import _exploded_terms, norm_sql, tokens_sql

__all__ = ["unigram_vocab", "unigram_vocab_oracle"]

MAXLEN = 8
MAXPIECE = 4


def _compositions(n: int, maxpiece: int) -> list[list[int]]:
    """All part-length sequences summing to ``n`` with parts
    <= ``maxpiece``, in deterministic (first-part-ascending, then
    recursive) order — the enumeration order IS the final tie-break."""
    if n == 0:
        return [[]]
    out = []
    for first in range(1, min(maxpiece, n) + 1):
        out.extend([first] + rest for rest in _compositions(n - first, maxpiece))
    return out


def _comps_flat(maxlen: int, maxpiece: int) -> list[tuple[int, int, int, int, int]]:
    """(wlen, seg_id, part_idx, start, plen) — 1-based start offsets."""
    rows = []
    for wlen in range(1, maxlen + 1):
        for seg_id, parts in enumerate(_compositions(wlen, maxpiece)):
            start = 1
            for part_idx, plen in enumerate(parts):
                rows.append((wlen, seg_id, part_idx, start, plen))
                start += plen
    return rows


def _subs_flat(maxlen: int, maxpiece: int) -> list[tuple[int, int, int]]:
    """(wlen, start, plen) — every substring window for seeding."""
    return [
        (wlen, start, plen)
        for wlen in range(1, maxlen + 1)
        for plen in range(1, min(maxpiece, wlen) + 1)
        for start in range(1, wlen - plen + 2)
    ]


def _words(docs: DataFrame, maxlen: int) -> DataFrame:
    return (
        _exploded_terms(docs)
        .groupBy("term")
        .agg(F.count("*").alias("wcount"))
        .filter(F.length("term") <= maxlen)
        .withColumn("wlen", F.length("term").cast("int"))
    )


def unigram_vocab(
    docs: DataFrame,
    keep_k: tuple[int, ...] = (60, 30),
    out_k: int = 30,
    maxlen: int = MAXLEN,
    maxpiece: int = MAXPIECE,
) -> DataFrame:
    """(rank, piece, usage) — the pruned tokenizer vocabulary after
    ``len(keep_k)`` segment-count-prune rounds, ranked by final usage
    (ties: piece ascending), top ``out_k`` rows."""
    spark = docs.sparkSession
    words = _words(docs, maxlen).persist()
    subs = spark.createDataFrame(
        _subs_flat(maxlen, maxpiece), "wlen int, start int, plen int"
    )
    comps = spark.createDataFrame(
        _comps_flat(maxlen, maxpiece),
        "wlen int, seg_id int, part_idx int, start int, plen int",
    ).persist()

    seed = (
        words.join(F.broadcast(subs), "wlen")
        .select(
            F.expr("substring(term, start, plen)").alias("piece"),
            "wcount",
        )
        .groupBy("piece")
        .agg(F.sum("wcount").alias("score"))
        .persist()
    )
    chars = seed.filter(F.length("piece") == 1)

    vocab = None
    usage = None
    for k in keep_k:
        if vocab is None:
            top_multi = (
                seed.filter(F.length("piece") > 1)
                .orderBy(F.desc("score"), "piece")
                .limit(k)
            )
        else:
            top_multi = (
                vocab.filter(F.length("piece") > 1)
                .orderBy(F.desc("score"), "piece")
                .limit(k)
            )
        cur = top_multi.unionByName(
            chars.select("piece", "score") if vocab is None
            else vocab.filter(F.length("piece") == 1)
        ).persist()

        pieces = words.join(F.broadcast(comps), "wlen").select(
            "term", "wcount", "wlen", "seg_id", "part_idx",
            F.expr("substring(term, start, plen)").alias("piece"),
        )
        segs = (
            pieces.join(F.broadcast(cur), "piece", "left")
            .groupBy("term", "wcount", "wlen", "seg_id")
            .agg(
                F.count("*").alias("n_parts"),
                F.sum(F.when(F.col("score").isNull(), 1).otherwise(0)).alias("misses"),
                F.sum(F.coalesce(F.col("score"), F.lit(0))).alias("fs"),
            )
            .filter(F.col("misses") == 0)
        )
        w = Window.partitionBy("term").orderBy(
            "n_parts", F.desc("fs"), "seg_id"
        )
        best = (
            segs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("term", "wcount", "wlen", "seg_id")
        )
        used = (
            best.join(F.broadcast(comps), ["wlen", "seg_id"])
            .select(
                F.expr("substring(term, start, plen)").alias("piece"),
                "wcount",
            )
            .groupBy("piece")
            .agg(F.sum("wcount").alias("score"))
        )
        # chars ride along even at zero usage: they are the totality
        # guarantee that every word remains segmentable next round.
        vocab = (
            used.unionByName(
                chars.select(
                    "piece", F.lit(0).cast("long").alias("score")
                ).join(used.select("piece"), "piece", "left_anti")
            )
        ).persist()
        usage = vocab

    w_rank = Window.orderBy(F.desc("usage"), "piece")
    return (
        usage.select("piece", F.col("score").alias("usage"))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= out_k)
        .select("rank", "piece", "usage")
        .orderBy("rank")
    )


def _values(rows: list[tuple], name: str, cols: str) -> str:
    body = ", ".join("(" + ", ".join(str(v) for v in r) + ")" for r in rows)
    return f"{name}({cols}) AS MATERIALIZED (SELECT * FROM (VALUES {body}))"


def unigram_vocab_oracle(
    keep_k: tuple[int, ...] = (60, 30),
    out_k: int = 30,
    maxlen: int = MAXLEN,
    maxpiece: int = MAXPIECE,
) -> str:
    """DuckDB twin over the ``documents`` view: identical word table,
    identical embedded composition/substring tables, identical
    (n_parts, -score_sum, seg_id) argmax and per-round prune —
    unrolled as a CTE chain.  Reused CTEs are MATERIALIZED (DuckDB
    re-inlines plain CTEs at every reference site)."""
    ctes = [
        f"""exd AS (
  SELECT unnest({tokens_sql(norm_sql())}) AS term FROM documents)""",
        f"""words AS MATERIALIZED (
  SELECT term, count(*)::BIGINT AS wcount, length(term)::INT AS wlen
  FROM exd WHERE term <> '' AND length(term) <= {maxlen}
  GROUP BY term)""",
        _values(_subs_flat(maxlen, maxpiece), "subs", "wlen, start, plen"),
        _values(
            _comps_flat(maxlen, maxpiece),
            "comps",
            "wlen, seg_id, part_idx, start, plen",
        ),
        """seed AS MATERIALIZED (
  SELECT substring(term, start, plen) AS piece,
         sum(wcount)::BIGINT AS score
  FROM words JOIN subs USING (wlen)
  GROUP BY 1)""",
        """chars AS MATERIALIZED (
  SELECT piece, score FROM seed WHERE length(piece) = 1)""",
    ]
    prev = "seed"
    for r, k in enumerate(keep_k):
        ctes.append(
            f"""v{r} AS MATERIALIZED (
  SELECT piece, score FROM (
    SELECT piece, score FROM {prev} WHERE length(piece) > 1
    ORDER BY score DESC, piece LIMIT {k})
  UNION ALL
  SELECT piece, score FROM {"chars" if r == 0 else prev}
  WHERE length(piece) = 1)"""
        )
        ctes.append(
            f"""seg{r} AS (
  SELECT w.term, w.wcount, w.wlen, c.seg_id,
         count(*) AS n_parts,
         sum(CASE WHEN v.piece IS NULL THEN 1 ELSE 0 END) AS misses,
         sum(coalesce(v.score, 0))::BIGINT AS fs
  FROM words w
  JOIN comps c USING (wlen)
  LEFT JOIN v{r} v ON substring(w.term, c.start, c.plen) = v.piece
  GROUP BY 1, 2, 3, 4)"""
        )
        ctes.append(
            f"""best{r} AS MATERIALIZED (
  SELECT term, wcount, wlen, seg_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY term ORDER BY n_parts, fs DESC, seg_id) AS rn
    FROM seg{r} WHERE misses = 0) WHERE rn = 1)"""
        )
        ctes.append(
            f"""u{r} AS MATERIALIZED (
  SELECT substring(b.term, c.start, c.plen) AS piece,
         sum(b.wcount)::BIGINT AS score
  FROM best{r} b JOIN comps c USING (wlen, seg_id)
  GROUP BY 1)"""
        )
        ctes.append(
            f"""vocab{r} AS MATERIALIZED (
  SELECT piece, score FROM u{r}
  UNION ALL
  SELECT c.piece, 0::BIGINT AS score FROM chars c
  WHERE c.piece NOT IN (SELECT piece FROM u{r}))"""
        )
        prev = f"vocab{r}"
    last = len(keep_k) - 1
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT rank, piece, usage FROM (
  SELECT row_number() OVER (ORDER BY score DESC, piece)::INT AS rank,
         piece, score AS usage
  FROM vocab{last})
WHERE rank <= {out_k}
ORDER BY rank"""
    )
