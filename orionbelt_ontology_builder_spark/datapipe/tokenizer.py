"""Distributed BPE tokenizer training + application — the merge-rule
learning loop of Sennrich et al. 2016 ("Neural Machine Translation of
Rare Words with Subword Units", public literature) as Spark
aggregations, and the fertility statistics of applying the learned
rules back to the corpus.

Every LLM training-data pipeline ends at a tokenizer; fitting one IS a
corpus-scale counting job, and it is exactly the shape Spark is good at:

1. word-frequency table — one token explode + groupBy (the corpus is
   touched ONCE; every later round works on the *vocabulary*, whose size
   is Heaps-law bounded, not corpus-sized);
2. per round: adjacent-symbol-pair counts weighted by word frequency
   (map-side combinable agg over the vocab table), pick the global top
   pair (ONE collected row — the only driver traffic per round), apply
   the merge as a literal string `replace` projection.

Symbol encoding: each word becomes pipe-wrapped space-joined symbols
(``chat`` -> ``|c| |h| |a| |t|``) so a merge is a plain non-overlapping
left-to-right string replace (``|c| |h|`` -> ``|ch|``) with no
false suffix matches (a symbol ``xa`` renders ``|xa|``, which can never
contain the pattern ``|a|``) — identical semantics in Spark's
``replace`` and DuckDB's ``replace``, so the oracle is exact.

Scale: at 100 TB the word-frequency table is ~10^8 rows (Heaps), each
round is one vocab-sized shuffle with partial aggregation and a 1-row
collect; ``rounds`` is the vocab-size budget (real trainers run ~30k
rounds over exactly this loop shape — per-round cost is independent of
corpus size after pass 1).  Applying the tokenizer is a vocab-sized
projection + one broadcast join against the token stream — the corpus
is never re-symbolized row by row.

Reference surface: the reference engine has no tokenizer; this is one
of the engine-addition LLM-data operators (SURVEY.md §2 datapipe
family, same stance as dedup/quality ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .textstats import _exploded_terms, norm_sql, tokens_sql

__all__ = [
    "bpe_merges",
    "bpe_merges_oracle",
    "bpe_encode_stats",
    "bpe_encode_stats_oracle",
]

#: pairs of adjacent symbols of the space-joined symbol string ``s``;
#: NULL (skipped by explode) for fully-merged single-symbol words.
_PAIRS_EXPR = (
    "CASE WHEN size(split(s, ' ')) >= 2 THEN "
    "transform(sequence(1, size(split(s, ' ')) - 1), "
    "i -> struct(element_at(split(s, ' '), i) AS l, "
    "element_at(split(s, ' '), i + 1) AS r)) END"
)

_SCHEMA = T.StructType(
    [
        T.StructField("merge_round", T.IntegerType(), False),
        T.StructField("lhs", T.StringType(), False),
        T.StructField("rhs", T.StringType(), False),
        T.StructField("merged", T.StringType(), False),
        T.StructField("freq", T.LongType(), False),
    ]
)


def _train(
    docs: DataFrame, rounds: int
) -> tuple[list[tuple], DataFrame]:
    """Shared learning loop: returns (merge records, final symbolized
    vocabulary ``(term, s, wcount)``).  See module docstring for the
    plan shape."""
    words = (
        _exploded_terms(docs)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )
    # chars are [a-z0-9] after norm_col, so '|' is a safe wrapper
    cur = words.select(
        "term",
        F.trim(F.regexp_replace("term", "(.)", "|$1| ")).alias("s"),
        "wcount",
    ).persist()  # consumers: every round's pair agg re-reads the vocab
    out: list[tuple] = []
    for r in range(1, rounds + 1):
        top = (
            cur.select("wcount", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("wcount").alias("freq"))
            .orderBy(
                F.desc("freq"),
                F.translate("l", "|", ""),
                F.translate("r", "|", ""),
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, rr, freq = top[0]["l"], top[0]["r"], int(top[0]["freq"])
        merged = l[:-1] + rr[1:]  # '|a|' + '|b|' -> '|ab|'
        out.append(
            (
                r,
                l.replace("|", ""),
                rr.replace("|", ""),
                merged.replace("|", ""),
                freq,
            )
        )
        cur = cur.select(
            "term",
            F.replace(F.col("s"), F.lit(f"{l} {rr}"), F.lit(merged)).alias(
                "s"
            ),
            "wcount",
        )
    return out, cur


def bpe_merges(docs: DataFrame, rounds: int = 3) -> DataFrame:
    """(merge_round, lhs, rhs, merged, freq) — the first ``rounds``
    byte-pair-encoding merge rules learned from the corpus, in learning
    order.  ``freq`` is the corpus-weighted adjacent-pair count the rule
    won with; ties break on (lhs, rhs) ascending so the rule sequence is
    deterministic across engines.

    The returned table is inherently driver-sized (one row per learned
    rule); the distributed work is the word-frequency pass and the
    per-round pair aggregations documented in the module docstring.
    """
    out, _cur = _train(docs, rounds)
    return docs.sparkSession.createDataFrame(out, _SCHEMA).orderBy(
        "merge_round"
    )


def bpe_encode_stats(docs: DataFrame, rounds: int = 3) -> DataFrame:
    """(doc_id, n_words, n_subwords, fertility) — the learned tokenizer
    applied back to the corpus: per document, how many subword tokens
    the ``rounds``-merge BPE vocabulary produces, and the fertility
    ratio ``n_subwords / n_words`` (the standard tokenizer-quality
    metric — lower is better compression; 1.0 means every word became a
    single token).

    Plan: merge application happened on the VOCABULARY during training
    (``_train``), so encoding is just ``size(split(s, ' '))`` per vocab
    word — a Heaps-bounded projection — broadcast-joined to the token
    stream and summed per doc.  The corpus text is never re-symbolized.
    """
    _out, cur = _train(docs, rounds)
    wordmap = cur.select(
        "term", F.size(F.split("s", " ")).alias("n_sub")
    )
    return (
        _exploded_terms(docs)
        .join(F.broadcast(wordmap), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").alias("n_subwords"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_subwords",
            (
                F.col("n_subwords").cast("double")
                / F.col("n_words").cast("double")
            ).alias("fertility"),
        )
        .orderBy("doc_id")
    )


def _oracle_ctes(rounds: int) -> tuple[list[str], list[str]]:
    """Shared DuckDB CTE chain: (ctes, per-round final SELECTs).  The
    symbol chain ``s0..s{rounds}`` carries the word ``w`` so the encode
    oracle can map words back to subword counts."""
    ctes = [
        f"""exd AS (
  SELECT doc_id, unnest({tokens_sql(norm_sql())}) AS term
  FROM documents),
words AS MATERIALIZED (
  SELECT term AS w, count(*)::BIGINT AS wcount FROM exd
  WHERE term <> '' GROUP BY term),
s0 AS MATERIALIZED (
  SELECT w, trim(regexp_replace(w, '(.)', '|\\1| ', 'g')) AS s, wcount
  FROM words)"""
    ]
    finals = []
    for r in range(1, rounds + 1):
        ctes.append(
            f"""tk{r} AS (
  SELECT string_split(s, ' ') AS toks, wcount FROM s{r - 1}),
p{r} AS (
  SELECT toks[i] AS l, toks[i + 1] AS r, sum(wcount)::BIGINT AS freq
  FROM tk{r}, unnest(generate_series(1, len(toks) - 1)) AS u(i)
  WHERE len(toks) >= 2
  GROUP BY 1, 2),
t{r} AS MATERIALIZED (
  SELECT l, r, freq FROM p{r}
  ORDER BY freq DESC, replace(l, '|', ''), replace(r, '|', '')
  LIMIT 1),
s{r} AS MATERIALIZED (
  SELECT w, replace(s, (SELECT l || ' ' || r FROM t{r}),
                 (SELECT rtrim(l, '|') || ltrim(r, '|') FROM t{r})) AS s,
         wcount
  FROM s{r - 1})"""
        )
        finals.append(
            f"""SELECT {r} AS merge_round,
  replace(l, '|', '') AS lhs, replace(r, '|', '') AS rhs,
  replace(l, '|', '') || replace(r, '|', '') AS merged, freq
FROM t{r}"""
        )
    return ctes, finals


def bpe_merges_oracle(rounds: int = 3) -> str:
    """DuckDB twin: identical vocab pass, per-round pair agg (correlated
    lateral ``unnest(generate_series(...))``), identical tie-break and
    wrapped-symbol ``replace`` application, rounds unrolled as CTEs."""
    ctes, finals = _oracle_ctes(rounds)
    body = "\nUNION ALL\n".join(finals)
    return (
        "WITH " + ",\n".join(ctes) + "\n" + body + "\nORDER BY merge_round"
    )


def bpe_encode_stats_oracle(rounds: int = 3) -> str:
    """DuckDB twin of the encode path: subword counts from the final
    symbol chain, joined back to the per-doc token stream."""
    ctes, _finals = _oracle_ctes(rounds)
    ctes.append(
        f"""wm AS (
  SELECT w, len(string_split(s, ' '))::BIGINT AS n_sub FROM s{rounds})"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT e.doc_id, count(*)::BIGINT AS n_words,
  sum(m.n_sub)::BIGINT AS n_subwords,
  sum(m.n_sub)::DOUBLE / count(*)::DOUBLE AS fertility
FROM exd e JOIN wm m ON e.term = m.w
WHERE e.term <> ''
GROUP BY e.doc_id
ORDER BY e.doc_id"""
    )
