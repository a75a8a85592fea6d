"""Text-analysis operators for large-scale training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring, token counting and
document fingerprinting over a ``documents(doc_id, text, lang, source,
n_chars)`` table.  Everything is array-native Spark SQL (``transform`` /
``filter`` / ``aggregate`` lambda expressions inside whole-stage codegen)
— no Python UDFs, no explode/shuffle in the per-document path, so each
operator is a single narrow projection that scales linearly with input
splits at 100 TB.

Every operator has a DuckDB twin built from the *same* Python constants
(stopword lists, hash seeds) so the driver's differential oracle checks
value-level parity; the portable hash primitive is ``md5`` (identical
output in Spark and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Stopword lists — shared by the Spark expressions and the DuckDB oracle
# SQL (single source of truth; interpolated into both).
STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "was", "that", "for",
           "on", "are", "with", "as", "at", "by", "a", "an"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein",
           "auf", "von", "zu", "den", "im", "war", "sich"],
    "fr": ["le", "la", "et", "les", "des", "en", "un", "une", "du",
           "que", "est", "pour", "qui", "dans", "sur"],
    "es": ["el", "y", "de", "que", "en", "los", "del", "se", "las",
           "por", "con", "una", "para", "no", "lo"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic argmax tie-break


def _sql_list(words: list[str]) -> str:
    return ", ".join("'" + w + "'" for w in words)


# ------------------------------------------------------------------ #
# Normalization + tokens (Spark columns and DuckDB fragments)
# ------------------------------------------------------------------ #


def norm_col(text: str = "text") -> Column:
    """lower, non-alnum runs -> single space, trim."""
    return F.trim(F.regexp_replace(F.lower(F.col(text)), "[^a-z0-9]+", " "))


def norm_sql(text: str = "text") -> str:
    return f"trim(regexp_replace(lower({text}), '[^a-z0-9]+', ' ', 'g'))"


def tokens_col(norm: str = "norm") -> Column:
    return F.split(F.col(norm), " ")


def tokens_sql(norm: str = "norm") -> str:
    return f"string_split({norm}, ' ')"


# ------------------------------------------------------------------ #
# Token counting
# ------------------------------------------------------------------ #


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, n_chars_norm).

    Whitespace tokens over the normalized text; one narrow projection.
    """
    return (
        docs.withColumn("norm", norm_col())
        .withColumn("toks", tokens_col())
        .select(
            "doc_id",
            F.when(F.col("norm") == "", 0)
            .otherwise(F.size("toks"))
            .alias("n_tokens"),
            F.when(F.col("norm") == "", 0)
            .otherwise(F.size(F.array_distinct("toks")))
            .alias("n_distinct_tokens"),
            F.length("norm").alias("n_chars_norm"),
        )
        .orderBy("doc_id")
    )


def token_counts_oracle() -> str:
    return f"""
WITH n AS (SELECT doc_id, {norm_sql()} AS norm FROM documents),
t AS (SELECT doc_id, norm, {tokens_sql()} AS toks FROM n)
SELECT doc_id,
  CASE WHEN norm='' THEN 0 ELSE len(toks) END AS n_tokens,
  CASE WHEN norm='' THEN 0 ELSE len(list_distinct(toks)) END AS n_distinct_tokens,
  len(norm) AS n_chars_norm
FROM t ORDER BY doc_id
"""


# BPE-ish tokenizer regex (GPT-2 shape, ASCII-portable subset: Java
# regex and RE2 agree on leftmost-first alternation and these classes).
# Alternatives: contraction suffix | space?+letter-run | space?+digit-run
# | space?+punct-run; inter-token whitespace is skipped by the scanner,
# so counting matches counts tokens.
BPE_RX = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"


def bpe_token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bpe_tokens, n_ws_tokens) — subword-style token count
    over the RAW text (BPE-ish regex above) next to the whitespace count,
    the pair a pre-training cost model needs (regex-token counts track
    real BPE vocab counts within a few percent on web text).  One narrow
    codegen projection."""
    norm = norm_col()
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(BPE_RX)).alias("n_bpe_tokens"),
        F.when(norm == "", 0)
        .otherwise(F.size(F.split(norm, " ")))
        .alias("n_ws_tokens"),
    ).orderBy("doc_id")


def bpe_token_counts_oracle() -> str:
    rx = BPE_RX.replace("'", "''")
    return f"""
SELECT doc_id,
  len(regexp_extract_all(text, '{rx}')) AS n_bpe_tokens,
  CASE WHEN {norm_sql()} = '' THEN 0
       ELSE len({tokens_sql(norm_sql())}) END AS n_ws_tokens
FROM documents ORDER BY doc_id
"""


# ------------------------------------------------------------------ #
# Quality scoring
# ------------------------------------------------------------------ #


def quality_metric_cols(docs: DataFrame) -> DataFrame:
    """Shared metric projection: norm / toks / n_tokens / alpha_ratio /
    digit_ratio / stopword_ratio / avg_token_len appended to ``docs``.

    The SINGLE definition of these expressions — ``quality_scores``
    selects from it and ``curation``'s funnel/filter build flags over
    it, so a regex or arithmetic tweak can't leave two modules
    disagreeing on same-named metrics."""
    en = _sql_list(STOPWORDS["en"])
    # No round(): both engines run identical IEEE-double arithmetic in
    # identical order, and the driver compares floats at %.6g — round()
    # itself is the only cross-engine divergence (half-boundary rule).
    return (
        docs.withColumn("norm", norm_col())
        .withColumn("toks", tokens_col())
        .withColumn("n_tokens", F.size("toks"))
        .withColumn(
            "alpha_ratio",
            F.regexp_count(F.col("text"), F.lit("[a-zA-Z]"))
            / F.length("text").cast("double"),
        )
        .withColumn(
            "digit_ratio",
            F.regexp_count(F.col("text"), F.lit("[0-9]"))
            / F.length("text").cast("double"),
        )
        .withColumn(
            "stopword_ratio",
            F.expr(f"size(filter(toks, t -> t IN ({en})))")
            / F.col("n_tokens").cast("double"),
        )
        .withColumn(
            "avg_token_len",
            F.expr("aggregate(toks, 0, (a, t) -> a + length(t))")
            / F.col("n_tokens").cast("double"),
        )
    )


def quality_metric_sql_cols() -> str:
    """DuckDB twin of ``quality_metric_cols``'s derived columns, to be
    selected from a relation providing (doc_id, text, toks)."""
    en = _sql_list(STOPWORDS["en"])
    return f"""
    len(toks) AS n_tokens,
    len(regexp_extract_all(text, '[a-zA-Z]')) / len(text)::DOUBLE AS alpha_ratio,
    len(regexp_extract_all(text, '[0-9]')) / len(text)::DOUBLE AS digit_ratio,
    len(list_filter(toks, t -> t IN ({en}))) / len(toks)::DOUBLE AS stopword_ratio,
    list_sum(list_transform(toks, t -> len(t))) / len(toks)::DOUBLE AS avg_token_len"""


def quality_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, alpha_ratio, digit_ratio, stopword_ratio,
    avg_token_len, quality) — length/character-class/stopword heuristics,
    the standard pre-training corpus filters (C4/Gopher-style)."""
    d = quality_metric_cols(docs)
    return d.select(
        "doc_id",
        "n_tokens",
        "alpha_ratio",
        "digit_ratio",
        "stopword_ratio",
        "avg_token_len",
        (
            F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.5
            + F.col("stopword_ratio") * 0.3
            + F.col("alpha_ratio") * 0.2
        ).alias("quality"),
    ).orderBy("doc_id")


def quality_scores_oracle() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, text, {norm_sql()} AS norm,
         {tokens_sql(norm_sql())} AS toks
  FROM documents),
m AS (
  SELECT doc_id, {quality_metric_sql_cols()}
  FROM t)
SELECT doc_id, n_tokens, alpha_ratio, digit_ratio, stopword_ratio, avg_token_len,
  least(n_tokens / 100.0, 1.0) * 0.5 + stopword_ratio * 0.3
        + alpha_ratio * 0.2 AS quality
FROM m ORDER BY doc_id
"""


# ------------------------------------------------------------------ #
# Language identification (n-gram/stopword heuristic)
# ------------------------------------------------------------------ #


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, predicted_lang, s_en, s_de, s_fr, s_es).

    Stopword-hit scoring per language; CJK-codepoint presence short-
    circuits to 'zh'.  Argmax with the fixed LANG_ORDER tie-break, so
    the prediction is deterministic and engine-portable.
    """
    d = docs.withColumn("norm", norm_col()).withColumn("toks", tokens_col())
    for lg in LANG_ORDER:
        d = d.withColumn(
            f"s_{lg}",
            F.expr(f"size(filter(toks, t -> t IN ({_sql_list(STOPWORDS[lg])})))"),
        )
    pred = F.when(F.col("text").rlike("[\\u4e00-\\u9fff]"), F.lit("zh"))
    cond = None
    for lg in LANG_ORDER:
        ge_all = None
        for other in LANG_ORDER:
            if other == lg:
                continue
            c = F.col(f"s_{lg}") >= F.col(f"s_{other}")
            ge_all = c if ge_all is None else (ge_all & c)
        cond = pred.when(ge_all, F.lit(lg)) if lg == "en" else cond.when(ge_all, F.lit(lg))
        pred = cond
    return d.select(
        "doc_id", "lang", pred.alias("predicted_lang"),
        "s_en", "s_de", "s_fr", "s_es",
    ).orderBy("doc_id")


def lang_id_oracle() -> str:
    score_cols = ",\n    ".join(
        f"len(list_filter(toks, t -> t IN ({_sql_list(STOPWORDS[lg])}))) AS s_{lg}"
        for lg in LANG_ORDER
    )
    branches = "\n    ".join(
        "WHEN "
        + " AND ".join(f"s_{lg} >= s_{o}" for o in LANG_ORDER if o != lg)
        + f" THEN '{lg}'"
        for lg in LANG_ORDER
    )
    return f"""
WITH t AS (
  SELECT doc_id, text, lang, {tokens_sql(norm_sql())} AS toks FROM documents),
s AS (
  SELECT doc_id, text, lang,
    {score_cols}
  FROM t)
SELECT doc_id, lang,
  CASE WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
    {branches}
  END AS predicted_lang,
  s_en, s_de, s_fr, s_es
FROM s ORDER BY doc_id
"""



def lang_confusion(docs: DataFrame) -> DataFrame:
    """(lang, predicted_lang, n_docs, frac_of_lang) — the lang_id
    confusion matrix against the corpus's golden ``lang`` column, with
    each row's share of its true-language total.  The eval half of the
    language-ID op: a production pipeline reads this before trusting
    the classifier to route documents (the "measure, don't guess"
    counterpart to ``lang_id`` itself).  One aggregation over the
    lang_id projection plus a broadcast join of the per-language
    totals; scales as a groupBy on a tiny key space."""
    pred = lang_id(docs).select("lang", "predicted_lang")
    cm = pred.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    ).persist()
    tot = cm.groupBy("lang").agg(F.sum("n_docs").alias("lang_total"))
    return (
        cm.join(F.broadcast(tot), "lang")
        .select(
            "lang", "predicted_lang", "n_docs",
            (F.col("n_docs") / F.col("lang_total")).alias("frac_of_lang"),
        )
        .orderBy("lang", "predicted_lang")
    )


def lang_confusion_oracle() -> str:
    return f"""
WITH li AS MATERIALIZED ({lang_id_oracle().strip()}),
cm AS MATERIALIZED (
  SELECT lang, predicted_lang, count(*)::BIGINT AS n_docs
  FROM li GROUP BY lang, predicted_lang),
tot AS (SELECT lang, sum(n_docs)::BIGINT AS lang_total FROM cm GROUP BY lang)
SELECT cm.lang, cm.predicted_lang, cm.n_docs,
  cm.n_docs / tot.lang_total::DOUBLE AS frac_of_lang
FROM cm JOIN tot ON cm.lang = tot.lang
ORDER BY cm.lang, cm.predicted_lang
"""



def length_histogram(docs: DataFrame) -> DataFrame:
    """(bucket, lo_tokens, n_docs, frac) — doc counts per power-of-two
    token-length bucket (bucket b holds docs with 2^b <= n_tokens <
    2^(b+1); empty docs land in bucket -1).  The curation statistic
    that calibrates chunk sizes, spots truncation cliffs, and feeds
    the packing planner.  One narrow projection + a tiny-key
    aggregation; ``floor(log2())`` on integer token counts is exact in
    both engines (doubles represent ints < 2^53 exactly, log2 of a
    power of two is exact), so bucket boundaries are engine-portable.
    """
    n_tok = (
        F.when(norm_col() == "", 0)
        .otherwise(F.size(tokens_col("norm")))
    )
    d = docs.withColumn("norm", norm_col()).select(
        F.when(n_tok == 0, F.lit(-1))
        .otherwise(F.floor(F.log2(n_tok.cast("double"))))
        .cast("int")
        .alias("bucket")
    )
    cm = d.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_docs")).persist()
    tot = cm.agg(F.sum("n_docs").alias("total"))
    return (
        cm.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.when(F.col("bucket") < 0, F.lit(0))
            .otherwise(F.pow(F.lit(2.0), F.col("bucket")).cast("long"))
            .alias("lo_tokens"),
            "n_docs",
            (F.col("n_docs") / F.col("total")).alias("frac"),
        )
        .orderBy("bucket")
    )


def length_histogram_oracle() -> str:
    return f"""
WITH n AS (SELECT doc_id, {norm_sql()} AS norm FROM documents),
t AS (
  SELECT CASE WHEN norm = '' THEN 0
              ELSE len({tokens_sql()}) END AS n_tokens
  FROM n),
b AS (
  SELECT CASE WHEN n_tokens = 0 THEN -1
              ELSE floor(log2(n_tokens::DOUBLE)) END::INT AS bucket
  FROM t),
cm AS MATERIALIZED (
  SELECT bucket, count(*)::BIGINT AS n_docs FROM b GROUP BY bucket),
tot AS (SELECT sum(n_docs)::BIGINT AS total FROM cm)
SELECT bucket,
  CASE WHEN bucket < 0 THEN 0
       ELSE pow(2.0, bucket)::BIGINT END AS lo_tokens,
  n_docs, n_docs / total::DOUBLE AS frac
FROM cm CROSS JOIN tot ORDER BY bucket
"""


# ------------------------------------------------------------------ #
# Document fingerprinting (rolling word-gram hash, winnowing-lite)
# ------------------------------------------------------------------ #

GRAM = 5  # words per fingerprint window


def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, full_hash, min_gram_hash).

    ``full_hash`` = md5 of the normalized text (exact-dup key);
    ``min_gram_hash`` = min md5 over sliding {GRAM}-word windows — the
    1-fingerprint winnowing selection, a shift-robust near-dup key.
    Array-native: no explode, no shuffle.
    """
    g = GRAM
    return (
        docs.withColumn("norm", norm_col())
        .withColumn("toks", tokens_col())
        .select(
            "doc_id",
            F.md5(F.col("norm")).alias("full_hash"),
            F.expr(
                f"array_min(transform(sequence(1, greatest(1, size(toks)-{g - 1})),"
                f" i -> md5(array_join(slice(toks, i, {g}), ' '))))"
            ).alias("min_gram_hash"),
        )
        .orderBy("doc_id")
    )


def fingerprints_oracle() -> str:
    g = GRAM
    return f"""
WITH t AS (SELECT doc_id, {norm_sql()} AS norm,
                  {tokens_sql(norm_sql())} AS toks FROM documents)
SELECT doc_id, md5(norm) AS full_hash,
  list_aggregate(list_transform(generate_series(1, greatest(1, len(toks)-{g - 1})),
    i -> md5(array_to_string(toks[i:i+{g - 1}], ' '))), 'min') AS min_gram_hash
FROM t ORDER BY doc_id
"""


# ------------------------------------------------------------------ #
# Repetition statistics (Gopher-style quality filters)
# ------------------------------------------------------------------ #


def repetition_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, distinct_token_ratio, dup_2gram_ratio,
    top_2gram_ratio) — the Gopher repetition-removal signals: documents
    whose text is dominated by a repeated n-gram or has a low distinct-
    token fraction are boilerplate/spam and get filtered before
    pre-training.

    Everything is doc-local array algebra (no explode, no shuffle): the
    2-gram list is built with 1-based ``element_at`` (portable to
    DuckDB's 1-based list indexing), dup ratio = 1 - distinct/total, and
    the top-2-gram token fraction scans the distinct grams against the
    gram list — O(d·n) per document on bounded web-page token counts,
    embarrassingly parallel at corpus scale.
    """
    g2 = (
        "transform(sequence(1, size(toks) - 1),"
        " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
    )
    return (
        docs.withColumn("norm", norm_col())
        .withColumn("toks", tokens_col())
        .withColumn(
            "n_tokens",
            F.when(F.col("norm") == "", 0).otherwise(F.size("toks")),
        )
        .withColumn(
            "g2", F.expr(f"CASE WHEN size(toks) >= 2 THEN {g2} END")
        )
        .select(
            "doc_id",
            "n_tokens",
            F.when(F.col("n_tokens") == 0, F.lit(0.0))
            .otherwise(
                F.size(F.array_distinct("toks"))
                / F.col("n_tokens").cast("double")
            )
            .alias("distinct_token_ratio"),
            F.when(F.col("g2").isNull(), F.lit(0.0))
            .otherwise(
                1.0
                - F.size(F.array_distinct("g2"))
                / F.size("g2").cast("double")
            )
            .alias("dup_2gram_ratio"),
            F.when(F.col("g2").isNull(), F.lit(0.0))
            .otherwise(
                F.expr(
                    "array_max(transform(array_distinct(g2),"
                    " g -> size(filter(g2, x -> x = g))))"
                )
                * 2
                / F.col("n_tokens").cast("double")
            )
            .alias("top_2gram_ratio"),
        )
        .orderBy("doc_id")
    )


def repetition_stats_oracle() -> str:
    return f"""
WITH n AS (SELECT doc_id, {norm_sql()} AS norm FROM documents),
t AS (SELECT doc_id, norm, {tokens_sql()} AS toks FROM n),
g AS (SELECT doc_id, norm, toks,
  CASE WHEN len(toks) >= 2 THEN
    list_transform(generate_series(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i + 1])
  END AS g2,
  CASE WHEN norm = '' THEN 0 ELSE len(toks) END AS n_tokens
  FROM t)
SELECT doc_id, n_tokens,
  CASE WHEN n_tokens = 0 THEN 0.0
       ELSE len(list_distinct(toks)) / n_tokens::DOUBLE
  END AS distinct_token_ratio,
  CASE WHEN g2 IS NULL THEN 0.0
       ELSE 1.0 - len(list_distinct(g2)) / len(g2)::DOUBLE
  END AS dup_2gram_ratio,
  CASE WHEN g2 IS NULL THEN 0.0
       ELSE list_max(list_transform(list_distinct(g2),
              g -> len(list_filter(g2, x -> x = g)))) * 2 / n_tokens::DOUBLE
  END AS top_2gram_ratio
FROM g ORDER BY doc_id
"""


# ------------------------------------------------------------------ #
# PII detection + scrubbing
# ------------------------------------------------------------------ #

# Portable across Java regex (Spark) and RE2 (DuckDB): no lookarounds,
# ASCII classes only.  Counts are per-pattern over the ORIGINAL text;
# scrubbing applies sequentially email -> ipv4 -> phone.
EMAIL_RX = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RX = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PHONE_RX = "\\+?[0-9][0-9 ()\\-]{6,}[0-9]"

# Deterministic PII corpus — single source of truth for the Spark query
# AND the DuckDB VALUES CTE (the sf documents tables are synthetic word
# salad with no PII, so the oracle runs on this embedded fixture).
PII_FIXTURE: list[tuple[int, str]] = [
    (0, "Contact alice@example.com or call +1 (555) 123-4567 today."),
    (1, "Server at 192.168.0.1 emailed bob.smith+tag@mail.co twice."),
    (2, "No personal data in this sentence at all."),
    (3, "Fax 020 7946 0958; backup host 10.0.0.254; a@b.io c@d.org."),
    (4, "Version 1.2.3.4 of the lib phoned home to 8.8.8.8."),
    (5, "reach me: j.doe@sub.domain.example under +49 30 901820."),
]


def pii_fixture_df(spark) -> DataFrame:
    return spark.createDataFrame(PII_FIXTURE, "doc_id long, text string")


def pii_fixture_cte(alias: str = "pii_docs") -> str:
    rows = ", ".join(
        "(" + str(i) + ", '" + t.replace("'", "''") + "')"
        for i, t in PII_FIXTURE
    )
    return f"{alias}(doc_id, text) AS (VALUES {rows})"


def pii_scrub(docs: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_ipv4, n_phones, scrubbed, scrub_hash).

    Detection + redaction of the three highest-volume PII shapes in web
    text.  Pure native regexp expressions — one narrow codegen
    projection, linear at corpus scale; the md5 of the scrubbed text is
    the idempotency/audit key a removal pipeline logs per document."""
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), EMAIL_RX, "<EMAIL>"),
            IPV4_RX,
            "<IP>",
        ),
        PHONE_RX,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(EMAIL_RX)).alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(IPV4_RX)).alias("n_ipv4"),
        F.regexp_count(F.col("text"), F.lit(PHONE_RX)).alias("n_phones"),
        scrubbed.alias("scrubbed"),
        F.md5(scrubbed).alias("scrub_hash"),
    ).orderBy("doc_id")


def pii_scrub_oracle(table: str = "pii_docs") -> str:
    def esc(rx: str) -> str:
        # DuckDB '…' literals are raw (no backslash processing) — only
        # quotes need doubling; doubling backslashes would corrupt \b/\.
        return rx.replace("'", "''")

    e, i, p = esc(EMAIL_RX), esc(IPV4_RX), esc(PHONE_RX)
    return f"""
WITH {pii_fixture_cte()},
s AS (SELECT doc_id, text,
  regexp_replace(regexp_replace(regexp_replace(text,
    '{e}', '<EMAIL>', 'g'), '{i}', '<IP>', 'g'), '{p}', '<PHONE>', 'g')
  AS scrubbed FROM {table})
SELECT doc_id,
  len(regexp_extract_all(text, '{e}')) AS n_emails,
  len(regexp_extract_all(text, '{i}')) AS n_ipv4,
  len(regexp_extract_all(text, '{p}')) AS n_phones,
  scrubbed, md5(scrubbed) AS scrub_hash
FROM s ORDER BY doc_id
"""


# ------------------------------------------------------------------ #
# Term salience (TF-IDF) and corpus vocabulary statistics
# ------------------------------------------------------------------ #


def _exploded_terms(docs: DataFrame) -> DataFrame:
    """(doc_id, term) — one row per token occurrence; empty docs
    vanish (split of '' yields [''], filtered here)."""
    return (
        docs.withColumn("norm", norm_col())
        .select("doc_id", F.explode(tokens_col()).alias("term"))
        .filter(F.col("term") != "")
    )


def tfidf_topk(docs: DataFrame, k: int = 5) -> DataFrame:
    """(doc_id, rank, term, tf_raw, df, score) — top-``k`` salient
    terms per document by TF-IDF with LINEAR inverse document
    frequency: ``score = (tf_raw / doc_len) * (N / df)``.

    Linear (not log) idf is deliberate: the score then uses only
    IEEE-correctly-rounded operations (integer counts, * and /), so
    Spark and DuckDB produce bit-identical doubles and the ranking is
    cross-engine deterministic — ``ln`` is not correctly rounded and
    can flip near-tied ranks between libm implementations.  Ties break
    on term ascending.

    Plan: explode -> two aggregations (per-doc-term counts feed both
    the doc-length and the document-frequency rollups) -> joins back
    on their own grouping keys -> per-doc top-k window.  Every stage
    has map-side partials; nothing is driver-side (N is a 1-row agg
    crossJoined in, broadcast)."""
    # tc feeds THREE branches (doc lengths, document frequencies, and
    # the score join base): persist so the explode + (doc_id, term)
    # shuffle run once, not three times
    tc = _exploded_terms(docs).groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf_raw")
    ).persist()
    dlen = tc.groupBy("doc_id").agg(F.sum("tf_raw").alias("doc_len"))
    dfreq = tc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ndocs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        tc.join(dlen, "doc_id")
        .join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "score",
            (F.col("tf_raw") / F.col("doc_len"))
            * (F.col("n_docs") / F.col("df")),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf_raw", "df", "score")
        .orderBy("doc_id", "rank")
    )


def tfidf_topk_oracle(k: int = 5) -> str:
    return f"""
WITH ex AS (
  SELECT doc_id, unnest({tokens_sql(norm_sql())}) AS term FROM documents),
tc AS MATERIALIZED (
  SELECT doc_id, term, count(*)::BIGINT AS tf_raw FROM ex
  WHERE term <> '' GROUP BY doc_id, term),
dlen AS (SELECT doc_id, sum(tf_raw)::BIGINT AS doc_len FROM tc GROUP BY doc_id),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tc GROUP BY term),
nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
scored AS (
  SELECT tc.doc_id, tc.term, tc.tf_raw, dfreq.df,
    (tf_raw / doc_len::DOUBLE) * (n_docs / df::DOUBLE) AS score,
    row_number() OVER (PARTITION BY tc.doc_id
                       ORDER BY (tf_raw / doc_len::DOUBLE)
                               * (n_docs / df::DOUBLE) DESC,
                               tc.term ASC) AS rank
  FROM tc JOIN dlen USING (doc_id) JOIN dfreq USING (term) CROSS JOIN nd)
SELECT doc_id, rank::BIGINT AS rank, term, tf_raw, df, score
FROM scored WHERE rank <= {k} ORDER BY doc_id, rank
"""


def zipf_topk(docs: DataFrame, k: int = 20) -> DataFrame:
    """(rank, term, cnt, freq) — the corpus's ``k`` most frequent
    tokens with their relative frequency, ranked count-desc then term
    asc.  The tokenizer/vocab-design statistic.

    Top-k via ``orderBy().limit(k)`` — Spark plans that as
    TakeOrderedAndProject (each partition keeps its own k, the driver
    merges k·P candidates), NOT as a global sort; a ``row_number``
    window would instead drag the whole vocabulary through one
    partition.  Ranks are then numbered over the k survivors only."""
    from pyspark.sql import Window

    # counts feeds both the total and the top-k: persist so the token
    # explode + term shuffle run once (same fix as vocab_drift)
    counts = _exploded_terms(docs).groupBy("term").agg(
        F.count(F.lit(1)).alias("cnt")
    ).persist()
    tot = counts.agg(F.sum("cnt").alias("total"))
    topk = counts.orderBy(F.col("cnt").desc(), F.col("term").asc()).limit(k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    return (
        topk.withColumn("rank", F.row_number().over(w))  # k rows only
        .crossJoin(F.broadcast(tot))
        .select(
            "rank",
            "term",
            "cnt",
            (F.col("cnt") / F.col("total")).alias("freq"),
        )
        .orderBy("rank")
    )


def zipf_topk_oracle(k: int = 20) -> str:
    return f"""
WITH ex AS (
  SELECT doc_id, unnest({tokens_sql(norm_sql())}) AS term FROM documents),
counts AS MATERIALIZED (
  SELECT term, count(*)::BIGINT AS cnt FROM ex
  WHERE term <> '' GROUP BY term),
tot AS (SELECT sum(cnt)::BIGINT AS total FROM counts),
ranked AS (
  SELECT term, cnt, row_number() OVER (ORDER BY cnt DESC, term ASC) AS rank
  FROM counts)
SELECT rank::BIGINT AS rank, term, cnt, cnt / total::DOUBLE AS freq
FROM ranked CROSS JOIN tot WHERE rank <= {k} ORDER BY rank
"""


def vocab_summary(docs: DataFrame) -> DataFrame:
    """One row: total token occurrences, vocabulary size, hapax count
    (terms occurring exactly once corpus-wide), and type/token ratio —
    the corpus-health numbers a tokenizer-training run reads first.
    Two aggregations, no window."""
    counts = _exploded_terms(docs).groupBy("term").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return counts.agg(
        F.sum("cnt").alias("n_token_occurrences"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum((F.col("cnt") == 1).cast("long")).alias("n_hapax"),
        (F.count(F.lit(1)) / F.sum("cnt")).alias("type_token_ratio"),
    )


def vocab_summary_oracle() -> str:
    return f"""
WITH ex AS (
  SELECT unnest({tokens_sql(norm_sql())}) AS term FROM documents),
counts AS (
  SELECT term, count(*)::BIGINT AS cnt FROM ex
  WHERE term <> '' GROUP BY term)
SELECT sum(cnt)::BIGINT AS n_token_occurrences,
  count(*)::BIGINT AS vocab_size,
  sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
  count(*) / sum(cnt)::DOUBLE AS type_token_ratio
FROM counts
"""



def vocab_drift(docs: DataFrame, k: int = 20, alpha: float = 0.5) -> DataFrame:
    """(term, cnt_old, cnt_new, freq_old, freq_new, log_ratio, drift) —
    the ``k`` terms whose smoothed relative frequency moved most between
    two corpus slices (here: even vs odd ``doc_id``, the deterministic
    stand-in for "previous crawl" vs "incremental crawl").  The corpus
    drift monitor a recurring-crawl pipeline reads before retraining:
    a topic burst, a boilerplate regression, or a language-mix shift all
    surface as extreme ``log_ratio`` terms.

    Laplace smoothing (``alpha`` per term over the SHARED vocabulary)
    keeps slice-exclusive terms finite and makes both engines compute
    identical doubles.  Plan: one token-explode -> one groupBy(term)
    with conditional partial aggregates (both slice counts in a single
    shuffle), broadcast 1-row totals, top-k via orderBy().limit(k) --
    TakeOrderedAndProject, never a global-sort window.  Scales as the
    vocabulary groupBy: uniformly-hashed keys, map-side combine.
    """
    terms = _exploded_terms(docs).withColumn(
        "is_new", (F.col("doc_id") % 2 == 1).cast("int")
    )
    # counts feeds BOTH the per-term scores and the 1-row totals:
    # persist so the token explode + term shuffle run once, not twice
    counts = terms.groupBy("term").agg(
        F.sum(1 - F.col("is_new")).alias("cnt_old"),
        F.sum("is_new").alias("cnt_new"),
    ).persist()
    tot = counts.agg(
        F.sum("cnt_old").alias("tot_old"),
        F.sum("cnt_new").alias("tot_new"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    scored = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn(
            "freq_old",
            (F.col("cnt_old") + F.lit(alpha))
            / (F.col("tot_old") + F.lit(alpha) * F.col("v")),
        )
        .withColumn(
            "freq_new",
            (F.col("cnt_new") + F.lit(alpha))
            / (F.col("tot_new") + F.lit(alpha) * F.col("v")),
        )
        .withColumn("log_ratio", F.log(F.col("freq_new") / F.col("freq_old")))
        .withColumn("drift", F.abs(F.col("log_ratio")))
    )
    return (
        scored.orderBy(F.col("drift").desc(), F.col("term").asc())
        .limit(k)
        .select(
            "term", "cnt_old", "cnt_new",
            "freq_old", "freq_new", "log_ratio", "drift",
        )
        .orderBy(F.col("drift").desc(), F.col("term").asc())
    )


def vocab_drift_oracle(k: int = 20, alpha: float = 0.5) -> str:
    return f"""
WITH ex AS (
  SELECT doc_id, unnest({tokens_sql(norm_sql())}) AS term FROM documents),
counts AS (
  SELECT term,
    sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS cnt_old,
    sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS cnt_new
  FROM ex WHERE term <> '' GROUP BY term),
tot AS (
  SELECT sum(cnt_old)::BIGINT AS tot_old, sum(cnt_new)::BIGINT AS tot_new,
         count(*)::DOUBLE AS v
  FROM counts),
scored AS (
  SELECT term, cnt_old, cnt_new,
    (cnt_old + {alpha}) / (tot_old + {alpha} * v) AS freq_old,
    (cnt_new + {alpha}) / (tot_new + {alpha} * v) AS freq_new
  FROM counts CROSS JOIN tot)
SELECT term, cnt_old, cnt_new, freq_old, freq_new,
  ln(freq_new / freq_old) AS log_ratio,
  abs(ln(freq_new / freq_old)) AS drift
FROM scored
ORDER BY drift DESC, term ASC LIMIT {k}
"""


# ------------------------------------------------------------------ #
# Term co-occurrence (PMI) — collocation mining for KG relation cues
# ------------------------------------------------------------------ #

COOC_MAX_TERMS = 64   # per-doc distinct-term cap (bounds pair fan-out)
COOC_MIN_PAIR = 2     # noise floor: pair must co-occur in >= this many docs


def term_pmi_pairs(
    docs: DataFrame,
    k: int = 25,
    max_terms: int = COOC_MAX_TERMS,
    min_pair: int = COOC_MIN_PAIR,
) -> DataFrame:
    """(ta, tb, pair_docs, df_a, df_b, pmi_ratio) — the ``k`` most
    associated unordered term pairs across the corpus, scored by the
    pointwise-mutual-information RATIO ``N * P(a,b) / (P(a) * P(b))``
    = ``n_docs * pair_docs / (df_a * df_b)`` (document-level events).
    The log is monotone, so ranking by the ratio IS ranking by PMI —
    and the ratio uses only exact integer products and one double
    division, making the ordering bit-identical across engines (the
    same trick as ``tfidf_topk``'s linear idf).  Collocation mining is
    the classic distributional cue for KG relation discovery ("which
    entity pairs co-mention far above chance").

    Plan: per-doc distinct terms are sorted and capped at
    ``max_terms`` inside one codegen projection; unordered pairs are
    generated SHUFFLE-FREE by a nested ``transform`` over the sorted
    array (i < j positions, so ta < tb by construction) and exploded.
    Then two grouped counts (pair key, term key) — both map-side
    combinable — and a broadcast join of the tiny unigram table back
    onto the pair counts.  Per-doc fan-out is bounded by
    ``max_terms**2/2``; at 100 TB feed the cap from ``tfidf_topk``
    instead of the alphabetical slice so the budget goes to salient
    terms."""
    toked = (
        docs.withColumn("norm", norm_col())
        .select(
            "doc_id",
            F.slice(
                F.array_sort(
                    F.array_distinct(
                        F.filter(tokens_col(), lambda t: t != "")
                    )
                ),
                1,
                max_terms,
            ).alias("toks"),
        )
    )
    # unordered pairs (i < j over the sorted array => ta < tb), built
    # inside the projection -- no self-join, no shuffle to make pairs.
    # NB the 2-arg transform lambda receives (element, index).
    pairs = toked.select(
        "doc_id",
        F.explode(
            F.flatten(
                F.expr(
                    "transform(toks, (t, i) -> transform("
                    "slice(toks, i + 2, size(toks)), "
                    "u -> named_struct('ta', t, 'tb', u)))"
                )
            )
        ).alias("p"),
    ).select("doc_id", "p.ta", "p.tb")
    # uni broadcasts into the scored join TWICE (df_a and df_b sides):
    # persist so its explode + shuffle run once
    uni = (
        toked.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .persist()
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    pc = (
        pairs.groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("pair_docs"))
        .filter(F.col("pair_docs") >= min_pair)
    )
    scored = (
        pc.join(F.broadcast(uni.withColumnRenamed("tok", "ta")
                .withColumnRenamed("df", "df_a")), "ta")
        .join(F.broadcast(uni.withColumnRenamed("tok", "tb")
              .withColumnRenamed("df", "df_b")), "tb")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "ta", "tb", "pair_docs", "df_a", "df_b",
            (
                (F.col("n_docs") * F.col("pair_docs")).cast("double")
                / (F.col("df_a") * F.col("df_b")).cast("double")
            ).alias("pmi_ratio"),
        )
    )
    return scored.orderBy(
        F.col("pmi_ratio").desc(), "ta", "tb"
    ).limit(k)


def term_pmi_pairs_oracle(
    k: int = 25,
    max_terms: int = COOC_MAX_TERMS,
    min_pair: int = COOC_MIN_PAIR,
) -> str:
    return f"""
WITH t AS (
  SELECT doc_id,
    list_sort(list_distinct(list_filter(
      {tokens_sql(norm_sql())}, x -> x <> '')))[1:{max_terms}] AS toks
  FROM documents),
u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
uni AS (SELECT tok, count(*) AS df FROM u GROUP BY tok),
nd AS (SELECT count(*) AS n_docs FROM documents),
pairs AS (
  SELECT a.tok AS ta, b.tok AS tb
  FROM u a JOIN u b ON a.doc_id = b.doc_id AND a.tok < b.tok),
pc AS (
  SELECT ta, tb, count(*) AS pair_docs FROM pairs GROUP BY ta, tb
  HAVING count(*) >= {min_pair})
SELECT pc.ta, pc.tb, pc.pair_docs, ua.df AS df_a, ub.df AS df_b,
  (nd.n_docs * pc.pair_docs)::DOUBLE / (ua.df * ub.df)::DOUBLE
    AS pmi_ratio
FROM pc
JOIN uni ua ON pc.ta = ua.tok
JOIN uni ub ON pc.tb = ub.tok
CROSS JOIN nd
ORDER BY pmi_ratio DESC, pc.ta, pc.tb
LIMIT {k}
"""


# ------------------------------------------------------------------ #
# n-gram LM count tables (KenLM-prep / CCNet perplexity-filter stats)
# ------------------------------------------------------------------ #

NGRAM_N = 2
BOS = "<s>"   # begin-of-doc left context (KN-style)


def ngram_lm_counts(docs: DataFrame, n: int = NGRAM_N, k: int = 30) -> DataFrame:
    """(gram, count, n_docs, n_left_contexts) — the top-``k`` word
    ``n``-grams by corpus frequency, with document frequency and the
    Kneser-Ney continuation statistic N1+(·g) = number of DISTINCT
    tokens observed immediately left of the gram (begin-of-doc counts
    as the ``<s>`` context).  These three tables are exactly what a
    KenLM-style LM needs per order — the CCNet recipe scores web docs
    by LM perplexity and filters on it, and at 100 TB the count
    tables ARE the training step.

    One codegen projection builds the (left, gram) pair array per doc
    (indexed transform over the token array — no self-join), one
    explode, one grouped aggregation with map-side partials; distinct
    counts shuffle (gram, doc_id/left) key pairs that are uniform by
    construction.  Top-k by (count desc, gram asc) — total order."""
    pairs = (
        docs.withColumn("norm", norm_col())
        .withColumn(
            "toks",
            F.when(F.col("norm") == "", F.expr("array()")).otherwise(
                F.split(F.col("norm"), " ")
            ),
        )
        .filter(F.size("toks") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {n - 1}), i -> "
                    f"named_struct("
                    f"'left', if(i = 1, '{BOS}', toks[i - 2]), "
                    f"'gram', array_join(slice(toks, i, {n}), ' ')))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.left", "p.gram")
    )
    return (
        pairs.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.countDistinct("left").alias("n_left_contexts"),
        )
        .orderBy(F.col("count").desc(), "gram")
        .limit(k)
    )


def ngram_lm_counts_oracle(n: int = NGRAM_N, k: int = 30) -> str:
    return f"""
WITH t AS (
  SELECT doc_id,
    CASE WHEN {norm_sql()} = '' THEN []::VARCHAR[]
         ELSE {tokens_sql(norm_sql())} END AS toks
  FROM documents),
p AS (
  SELECT doc_id,
    CASE WHEN i = 1 THEN '{BOS}' ELSE toks[i - 1] END AS lft,
    array_to_string(toks[i:i+{n - 1}], ' ') AS gram
  FROM t, unnest(generate_series(1, len(toks) - {n - 1})) AS u(i)
  WHERE len(toks) >= {n})
SELECT gram, count(*) AS count, count(DISTINCT doc_id) AS n_docs,
  count(DISTINCT lft) AS n_left_contexts
FROM p GROUP BY gram
ORDER BY count DESC, gram
LIMIT {k}
"""


# ------------------------------------------------------------------ #
# BPE merge-pair statistics (tokenizer-training iteration 1)
# ------------------------------------------------------------------ #


def bpe_merge_pairs(docs: DataFrame, k: int = 30) -> DataFrame:
    """(sym_a, sym_b, weight) — the ``k`` most frequent adjacent
    character pairs across the corpus, weighted by word frequency:
    iteration 1 of byte-pair-encoding vocabulary learning (Sennrich et
    al., public literature), distributed.

    Scale shape: the ONLY corpus-scale pass is the word-count agg
    (explode + two-phase groupBy with map-side combine).  Pair
    generation then runs over the *distinct-word vocabulary* — Zipf
    bounds it at a tiny fraction of corpus size — as an in-array
    projection (sequence + transform, no shuffle), and the final pair
    agg is alphabet²-sized.  A full BPE trainer repeats this with the
    winning pair merged; each iteration is this same vocab-scale job,
    which is why distributed BPE trainers checkpoint the vocab table,
    not the corpus."""
    words = (
        docs.withColumn("norm", norm_col())
        .filter(F.col("norm") != "")
        .select(F.explode(tokens_col()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = words.filter(F.length("word") >= 2).select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> struct(substring(word, i, 1) AS sym_a,"
                "             substring(word, i + 1, 1) AS sym_b))"
            )
        ).alias("pair"),
    )
    return (
        pairs.select("freq", "pair.sym_a", "pair.sym_b")
        .groupBy("sym_a", "sym_b")
        .agg(F.sum("freq").alias("weight"))
        .orderBy(F.col("weight").desc(), "sym_a", "sym_b")
        .limit(k)
    )


def bpe_merge_pairs_oracle(k: int = 30) -> str:
    return f"""
WITH words AS (
  SELECT word, count(*)::BIGINT AS freq
  FROM (SELECT unnest({tokens_sql(norm_sql())}) AS word
        FROM documents
        WHERE {norm_sql()} <> '')
  GROUP BY word),
pairs AS (
  SELECT substring(word, i, 1) AS sym_a,
         substring(word, i + 1, 1) AS sym_b, freq
  FROM words, unnest(range(1, len(word))) AS u(i)
  WHERE len(word) >= 2)
SELECT sym_a, sym_b, sum(freq)::BIGINT AS weight
FROM pairs GROUP BY 1, 2
ORDER BY weight DESC, sym_a, sym_b
LIMIT {k}
"""


# ------------------------------------------------------------------ #
# Unigram-LM log-probability scoring (CCNet-style perplexity filter)
# ------------------------------------------------------------------ #


def unigram_logprob(docs: DataFrame, alpha: float = 0.5) -> DataFrame:
    """(doc_id, n_tokens, mean_logprob) — mean per-token natural-log
    probability of each document under the corpus's own
    Lidstone-smoothed unigram LM: p(w) = (c_w + alpha) /
    (N + alpha * (V + 1)), unseen mass included via the +1.  The
    cheap stand-in for the KenLM-perplexity quality filter of
    CCNet/RefinedWeb (public literature): documents far below the
    corpus-typical mean logprob are boilerplate/gibberish; far above
    are degenerate repetition.

    Scale shape: two corpus passes sharing one token explode shape —
    the vocabulary agg (two-phase, Zipf-bounded output) and the
    per-doc score agg keyed by doc_id; the vocab joins the token
    stream by term (broadcast when it fits, shuffle-hash otherwise —
    AQE decides).  The LM constants N and V ride a 1-row broadcast."""
    toks = (
        docs.withColumn("norm", norm_col())
        .filter(F.col("norm") != "")
        .select("doc_id", F.explode(tokens_col()).alias("term"))
    )
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c")).persist()
    consts = vocab.agg(
        F.sum("c").alias("n_total"),
        F.count(F.lit(1)).alias("v_size"),
    )
    scored = (
        toks.join(vocab, "term")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            (
                F.log(
                    (F.col("c") + F.lit(alpha))
                    / (
                        F.col("n_total")
                        + F.lit(alpha) * (F.col("v_size") + 1)
                    )
                )
            ).alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("lp").alias("mean_logprob"),
        )
        .orderBy("doc_id")
    )


def unigram_logprob_oracle(alpha: float = 0.5) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({tokens_sql(norm_sql())}) AS term
  FROM documents WHERE {norm_sql()} <> ''),
vocab AS (SELECT term, count(*)::BIGINT AS c FROM toks GROUP BY term),
consts AS (
  SELECT sum(c)::BIGINT AS n_total, count(*)::BIGINT AS v_size
  FROM vocab),
scored AS (
  SELECT t.doc_id,
    ln((v.c + {alpha}) / (co.n_total + {alpha} * (co.v_size + 1))) AS lp
  FROM toks t JOIN vocab v USING (term) CROSS JOIN consts co)
SELECT doc_id, count(*)::BIGINT AS n_tokens, avg(lp) AS mean_logprob
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


# ------------------------------------------------------------------ #
# Mention-context extraction (entity-linker / NER training windows)
# ------------------------------------------------------------------ #


def mention_contexts(
    docs: DataFrame, terms: list[str], window: int = 3
) -> DataFrame:
    """(doc_id, term, pos, context) — a ±``window``-token span around
    every occurrence of every term (0-based token position): the
    context-window extraction that feeds entity-linking / NER
    training sets from a raw corpus.

    Scale shape: ONE posexplode pass over the normalized token stream;
    the term list is a broadcast semi-join filter applied before any
    shuffle (at web scale the mention dictionary is the alias table —
    still broadcastable, or bucket-joined when it isn't).  The window
    slice re-reads the in-row token array — no self-join, no window
    function; output is mention-scale, not token-scale."""
    t = (
        docs.withColumn("norm", norm_col())
        .filter(F.col("norm") != "")
        .withColumn("toks", tokens_col())
        .select(
            "doc_id",
            "toks",
            F.posexplode("toks").alias("pos", "term"),
        )
    )
    term_df = F.broadcast(
        t.sparkSession.createDataFrame(
            [(x,) for x in terms], "term string"
        )
    )
    hits = t.join(term_df, "term", "left_semi")
    start = F.greatest(F.lit(1), F.col("pos") + 1 - window)  # 1-based
    length = F.col("pos") + 1 + window - start + 1
    return hits.select(
        "doc_id",
        "term",
        "pos",
        F.array_join(F.slice("toks", start, length), " ").alias("context"),
    ).orderBy("doc_id", "pos", "term")


def mention_contexts_oracle(terms: list[str], window: int = 3) -> str:
    tlist = ", ".join(f"('{x}')" for x in terms)
    return f"""
WITH terms(term) AS (VALUES {tlist}),
t AS (
  SELECT doc_id, {tokens_sql(norm_sql())} AS toks
  FROM documents WHERE {norm_sql()} <> ''),
hits AS (
  SELECT t.doc_id, t.toks, i.i - 1 AS pos, t.toks[i.i] AS term
  FROM t, unnest(range(1, len(t.toks) + 1)) AS i(i)
  WHERE t.toks[i.i] IN (SELECT term FROM terms))
SELECT doc_id, term, pos,
  array_to_string(
    toks[greatest(1, pos + 1 - {window}):pos + 1 + {window}], ' ')
    AS context
FROM hits
ORDER BY doc_id, pos, term
"""


# ------------------------------------------------------------------ #
# Per-language length percentiles (truncation-policy calibration)
# ------------------------------------------------------------------ #


def length_percentiles(docs: DataFrame) -> DataFrame:
    """(lang, n_docs, mean_tokens, p10, p50, p90, p99) — exact
    token-length percentiles per language: the statistic that sets
    per-language context/truncation budgets (uniform caps over-trim
    CJK-like dense languages, under-trim verbose ones).

    Scale shape: the token count is a narrow map-side projection; the
    percentile aggregation is keyed by the language vocabulary (tens
    of keys), so Spark's exact ``percentile`` — which gathers each
    group's values — is safe ONLY because group count is tiny and
    per-group data is a numeric column, not rows; for data-scale keys
    you'd switch to approx_percentile (documented trade)."""
    n = (
        docs.withColumn("norm", norm_col())
        .select(
            "lang",
            F.when(F.col("norm") == "", 0)
            .otherwise(F.size(tokens_col()))
            .alias("n_tokens"),
        )
    )
    return (
        n.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("n_tokens").alias("mean_tokens"),
            F.expr("percentile(n_tokens, 0.10)").alias("p10"),
            F.expr("percentile(n_tokens, 0.50)").alias("p50"),
            F.expr("percentile(n_tokens, 0.90)").alias("p90"),
            F.expr("percentile(n_tokens, 0.99)").alias("p99"),
        )
        .orderBy("lang")
    )


def length_percentiles_oracle() -> str:
    """DuckDB twin — quantile_cont matches Spark's exact linear-
    interpolation percentile bit-for-bit under %.6g."""
    return f"""
WITH n AS (
  SELECT lang,
    CASE WHEN {norm_sql()} = '' THEN 0
         ELSE len({tokens_sql(norm_sql())}) END AS n_tokens
  FROM documents)
SELECT lang, count(*)::BIGINT AS n_docs,
  avg(n_tokens) AS mean_tokens,
  quantile_cont(n_tokens, 0.10)::DOUBLE AS p10,
  quantile_cont(n_tokens, 0.50)::DOUBLE AS p50,
  quantile_cont(n_tokens, 0.90)::DOUBLE AS p90,
  quantile_cont(n_tokens, 0.99)::DOUBLE AS p99
FROM n GROUP BY lang ORDER BY lang
"""


# ------------------------------------------------------------------ #
# Bigram-LM document scoring (the CCNet/KenLM filter, one order up)
# ------------------------------------------------------------------ #


def bigram_logprob(docs: DataFrame, alpha: float = 0.5) -> DataFrame:
    """(doc_id, n_bigrams, mean_logprob) — mean natural-log conditional
    probability of each document's token bigrams under the corpus's own
    Lidstone-smoothed bigram LM:

        p(w2 | w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * (V + 1))

    One order up from :func:`unigram_logprob` — the closer stand-in for
    the KenLM-perplexity quality filter of CCNet/RefinedWeb (public
    literature): word-order-scrambled or template-stuffed documents
    score near the unigram model, while fluent text gains from the
    conditional.  Docs with fewer than two tokens emit no bigrams and
    drop out (consistent with the oracle).

    Scale shape: bigram construction is IN-ROW (``zip_with`` over two
    ``slice`` views of the token array — no window function, no
    positional self-join, no array duplication per token), then a single
    explode.  Three aggregations share that stream: the unigram vocab
    (two-phase, Zipf-bounded), the bigram table (two-phase, bounded by
    distinct-pair count), and the per-doc score agg.  The scoring joins
    are by term key — broadcast when the vocab fits, shuffle-hash
    otherwise (AQE decides)."""
    toks = (
        docs.withColumn("norm", norm_col())
        .filter(F.col("norm") != "")
        .select("doc_id", tokens_col().alias("t"))
    )
    n1 = F.greatest(F.size("t") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("t", 1, n1),
        F.slice("t", 2, n1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    big = toks.select(
        "doc_id", F.explode(pairs).alias("p")
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    uni = (
        toks.select(F.explode("t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c1"))
        .persist()
    )
    consts = uni.agg(F.count(F.lit(1)).alias("v_size"))
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    scored = (
        big.join(bc, ["w1", "w2"])
        .join(uni.withColumnRenamed("term", "w1"), "w1")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            F.log(
                (F.col("c12") + F.lit(alpha))
                / (F.col("c1") + F.lit(alpha) * (F.col("v_size") + 1))
            ).alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg("lp").alias("mean_logprob"),
        )
        .orderBy("doc_id")
    )


def bigram_logprob_oracle(alpha: float = 0.5) -> str:
    """DuckDB twin — bigrams via a lateral ``generate_series`` index
    walk over the same token list (1-based ``t[i]``/``t[i+1]``)."""
    return f"""
WITH toks AS (
  SELECT doc_id, {tokens_sql(norm_sql())} AS t
  FROM documents WHERE {norm_sql()} <> ''),
uni AS MATERIALIZED (
  SELECT term, count(*)::BIGINT AS c1
  FROM (SELECT unnest(t) AS term FROM toks) GROUP BY term),
consts AS (SELECT count(*)::BIGINT AS v_size FROM uni),
big AS MATERIALIZED (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)),
bc AS MATERIALIZED (
  SELECT w1, w2, count(*)::BIGINT AS c12 FROM big GROUP BY w1, w2),
scored AS (
  SELECT b.doc_id,
    ln((bc.c12 + {alpha}) / (u.c1 + {alpha} * (co.v_size + 1))) AS lp
  FROM big b
  JOIN bc USING (w1, w2)
  JOIN uni u ON b.w1 = u.term
  CROSS JOIN consts co)
SELECT doc_id, count(*)::BIGINT AS n_bigrams, avg(lp) AS mean_logprob
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


def compression_ratio(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, n_compressed, ratio) — zlib(level 6)
    compressibility per document: THE cheap model-free gibberish/
    boilerplate detector (highly repetitive boilerplate compresses far
    below natural prose; random gibberish barely compresses at all —
    both tails get filtered in C4/Gopher-era pipelines, public
    literature).

    This is deliberately on the Arrow path (``mapInPandas``): real
    byte-level compression is CPU-bound per-doc work no SQL builtin
    expresses, exactly the case the engine reserves Python for — one
    Arrow batch in/out, no shuffle, runs on the table's existing
    partitioning.  zlib output is deterministic for a fixed level, so
    the pytest twin checks EXACT equality against a plain-Python
    reference; the driver check is rows-only (DuckDB has no zlib)."""
    import zlib

    from typing import Iterator

    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raw = pdf["text"].fillna("").map(lambda t: t.encode("utf-8"))
            comp = raw.map(lambda b: len(zlib.compress(b, 6)))
            n = raw.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("int64"),
                    "n_compressed": comp.astype("int64"),
                    "ratio": (
                        comp / n.where(n > 0, 1)
                    ).astype("float64"),
                }
            )

    return (
        docs.select("doc_id", "text")
        .mapInPandas(
            batches,
            "doc_id long, n_bytes long, n_compressed long, ratio double",
        )
        .orderBy("doc_id")
    )


def compression_ratio_oracle(sf_dirs: list[str]) -> str | None:
    """DuckDB twin of :func:`compression_ratio`.  DuckDB has no zlib
    scalar, so the deterministic per-doc compressed length is computed
    HERE, at oracle-build time, by plain Python over the same parquet
    the driver's ``documents`` view reads (an independent single-node
    implementation of the contract vs the Arrow/mapInPandas path), and
    embedded as a VALUES table keyed by ``md5(text)`` — content-keyed,
    so ONE oracle string serves every scale whose texts were sampled
    (the driver's sf0.01 gate and the sf0.001 parity tests).
    ``oracle_sql()`` runs fresh inside every driver round, so the
    embedded lengths always describe the same file content the view
    serves.  Returns None (rows-only fallback) when no parquet is
    readable."""
    import hashlib
    import zlib

    pairs: dict[str, int] = {}
    for sf_dir in sf_dirs:
        try:
            import duckdb

            rows = duckdb.connect().execute(
                "SELECT coalesce(text, '') FROM "
                f"'{sf_dir}/documents.parquet'"
            ).fetchall()
        except Exception:
            continue
        for (t,) in rows:
            b = t.encode("utf-8")
            pairs[hashlib.md5(b).hexdigest()] = len(zlib.compress(b, 6))
    if not pairs:
        return None
    vals = ", ".join(f"('{h}', {n})" for h, n in sorted(pairs.items()))
    return f"""
WITH z(h, n_compressed) AS (VALUES {vals})
SELECT d.doc_id,
  octet_length(encode(coalesce(d.text, ''))) ::BIGINT AS n_bytes,
  z.n_compressed::BIGINT AS n_compressed,
  z.n_compressed / greatest(
    octet_length(encode(coalesce(d.text, ''))), 1)::DOUBLE AS ratio
FROM documents d JOIN z ON md5(coalesce(d.text, '')) = z.h
ORDER BY doc_id"""


def ccnet_buckets(docs: DataFrame) -> DataFrame:
    """(source, bucket, n_docs, mean_logprob) — the CCNet partition:
    every document scored by its mean unigram logprob (the engine's
    KenLM stand-in, :func:`unigram_logprob`), then cut at the corpus
    tercile thresholds into head / middle / tail quality buckets, and
    rolled up per source.  This is the report a CCNet-style pipeline
    ships with every crawl: which sources produce head-quality text
    and which mostly feed the discard tail (CCNet, public literature;
    head≈highest logprob / lowest perplexity).

    Scale shape: the per-doc score agg as in unigram_logprob; the two
    tercile thresholds are ONE corpus percentile aggregation broadcast
    back (two doubles), and the bucketing is a projection — no second
    corpus shuffle beyond the final (source, bucket) rollup."""
    scored = unigram_logprob(docs)  # (doc_id, n_tokens, mean_logprob)
    src = docs.select("doc_id", "source")
    cuts = scored.agg(
        F.expr(
            "percentile(mean_logprob, array(0.3333333333333333,"
            " 0.6666666666666666))"
        ).alias("qs")
    ).select(
        F.element_at("qs", 1).alias("q1"), F.element_at("qs", 2).alias("q2")
    )
    bucket = (
        F.when(F.col("mean_logprob") >= F.col("q2"), "head")
        .when(F.col("mean_logprob") >= F.col("q1"), "middle")
        .otherwise("tail")
    )
    return (
        scored.join(src, "doc_id")
        .crossJoin(F.broadcast(cuts))
        .groupBy("source", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("mean_logprob").alias("mean_logprob"),
        )
        .orderBy("source", "bucket")
    )


def ccnet_buckets_oracle(alpha: float = 0.5) -> str:
    return f"""
WITH scored AS MATERIALIZED ({unigram_logprob_oracle(alpha)}),
cuts AS (
  SELECT quantile_cont(mean_logprob, 0.3333333333333333) AS q1,
         quantile_cont(mean_logprob, 0.6666666666666666) AS q2
  FROM scored),
b AS (
  SELECT d.source,
    CASE WHEN s.mean_logprob >= c.q2 THEN 'head'
         WHEN s.mean_logprob >= c.q1 THEN 'middle'
         ELSE 'tail' END AS bucket,
    s.mean_logprob
  FROM scored s JOIN documents d USING (doc_id) CROSS JOIN cuts c)
SELECT source, bucket, count(*)::BIGINT AS n_docs,
       avg(mean_logprob) AS mean_logprob
FROM b GROUP BY source, bucket ORDER BY source, bucket
"""


def vocab_typo_pairs(docs: DataFrame, min_count: int = 1) -> DataFrame:
    """(w1, w2, dist, c1, c2) — vocabulary term pairs at Levenshtein
    distance exactly 1: the spell-variant / OCR-noise candidate miner
    that feeds typo normalization before dedup (a near-dup that
    differs only by a typo'd token should still collide).

    Blocking is EXACT for distance 1, not approximate: a single edit
    changes at most one position, so any ed-1 pair still agrees on the
    first character OR the last character — two cheap equi-join blocks
    whose union has full recall (words of length <= 2, where one edit
    can touch both ends, go to a third all-pairs block that is
    alphabet-bounded).  Within a block only a length-difference <= 1
    band is verified with the built-in ``levenshtein`` (JVM-side;
    DuckDB's levenshtein agrees on plain ASCII tokens).

    Scale shape: vocab-sized, not corpus-sized — the blocks join the
    (term, count) aggregate against itself keyed by block char; block
    fan-out is bounded by per-letter vocabulary, the classic
    initial-letter partitioning."""
    vocab = (
        docs.withColumn("norm", norm_col())
        .filter(F.col("norm") != "")
        .select(F.explode(tokens_col()).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .persist()
    )
    long_v = vocab.filter(F.length("w") > 2)
    blocks = long_v.select(
        "w", "c", F.explode(
            F.array_distinct(
                F.array(
                    F.concat(F.lit("f:"), F.substring("w", 1, 1)),
                    F.concat(F.lit("l:"), F.expr("substring(w, -1, 1)")),
                )
            )
        ).alias("blk"),
    ).unionByName(
        vocab.filter(F.length("w") <= 2).select(
            "w", "c", F.lit("short").alias("blk")
        )
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.w") < F.col("b.w"))
            & (
                F.abs(F.length(F.col("a.w")) - F.length(F.col("b.w"))) <= 1
            ),
        )
        .select(
            F.col("a.w").alias("w1"),
            F.col("b.w").alias("w2"),
            F.col("a.c").alias("c1"),
            F.col("b.c").alias("c2"),
        )
        .distinct()
        .withColumn("dist", F.levenshtein("w1", "w2"))
        .filter(F.col("dist") == 1)
    )
    return pairs.select("w1", "w2", "dist", "c1", "c2").orderBy("w1", "w2")


def vocab_typo_pairs_oracle(min_count: int = 1) -> str:
    return f"""
WITH vocab AS MATERIALIZED (
  SELECT w, count(*)::BIGINT AS c FROM (
    SELECT unnest({tokens_sql(norm_sql())}) AS w
    FROM documents WHERE {norm_sql()} <> '')
  GROUP BY w HAVING count(*) >= {min_count}),
blocks AS MATERIALIZED (
  SELECT w, c, blk FROM (
    SELECT w, c, unnest(list_distinct([
      'f:' || substr(w, 1, 1), 'l:' || substr(w, -1, 1)])) AS blk
    FROM vocab WHERE len(w) > 2)
  UNION ALL
  SELECT w, c, 'short' AS blk FROM vocab WHERE len(w) <= 2),
pairs AS (
  SELECT DISTINCT a.w AS w1, b.w AS w2, a.c AS c1, b.c AS c2
  FROM blocks a JOIN blocks b
    ON a.blk = b.blk AND a.w < b.w
   AND abs(len(a.w) - len(b.w)) <= 1)
SELECT w1, w2, 1::BIGINT AS dist, c1, c2
FROM pairs WHERE levenshtein(w1, w2) = 1
ORDER BY w1, w2
"""


# ------------------------------------------------------------------ #
# Trained Naive-Bayes language classifier (fastText-classifier
# stand-in: the supervised counterpart of the stopword-heuristic
# lang_id)
# ------------------------------------------------------------------ #


def nb_lang_confusion(docs: DataFrame, alpha: float = 0.5) -> DataFrame:
    """(true_lang, pred_lang, n_docs, avg_margin) — confusion matrix of
    a multinomial Naive-Bayes language classifier trained on the even
    doc_ids and scored on the odd ones (a deterministic 50/50 split).

    This is the *trained-classifier* quality/routing gate of the public
    data-pipeline literature (the fastText language/quality classifier
    of CCNet / fastText.zip) reduced to its Spark-shaped core:

    - train: one token-explode pass -> per-(class, term) counts and
      per-class totals (hash aggs with map-side partials); vocabulary
      size and class priors ride 1-row / L-row broadcasts.
    - score: the test-token stream is expanded L ways (L = #classes, a
      small constant), left-joined against the class-conditional
      likelihood table (broadcast when it fits, shuffle-hash at 100 TB
      -- AQE decides), Lidstone-smoothed, and summed per (doc, class).
    - argmax + runner-up margin: an L-row-per-doc window (bounded
      partitions), never a global sort.

    The margin (best minus second-best log-posterior) is the
    abstain/route signal: low-margin documents are the ones a real
    pipeline sends to the expensive model."""
    split = F.col("doc_id") % 2
    toks = (
        docs.withColumn("norm", norm_col())
        .filter(F.col("norm") != "")
        .select("doc_id", "lang", split.alias("split"),
                F.explode(tokens_col()).alias("term"))
    )
    tr = toks.filter(F.col("split") == 0)
    cls_tok = tr.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("c"))
    cls_tot = tr.groupBy("lang").agg(F.count(F.lit(1)).alias("n_c"))
    vocab = tr.agg(F.countDistinct("term").alias("v_size"))
    # class priors from train doc counts
    tr_docs = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs_c"))
    )
    tr_total = tr_docs.agg(F.sum("n_docs_c").alias("n_docs_tot"))
    langs = cls_tot.select(F.col("lang").alias("cand_lang"))

    te = toks.filter(F.col("split") == 1).select(
        "doc_id", F.col("lang").alias("true_lang"), "term"
    )
    scored = (
        te.crossJoin(F.broadcast(langs))
        .join(
            F.broadcast(
                cls_tok.select(
                    F.col("lang").alias("cand_lang"), "term", "c"
                )
            ),
            ["cand_lang", "term"],
            "left",
        )
        .join(
            F.broadcast(cls_tot.select(F.col("lang").alias("cand_lang"), "n_c")),
            "cand_lang",
        )
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "true_lang",
            "cand_lang",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha))
                / (F.col("n_c") + F.lit(alpha) * (F.col("v_size") + 1))
            ).alias("lp"),
        )
    )
    prior = (
        tr_docs.crossJoin(F.broadcast(tr_total))
        .select(
            F.col("lang").alias("cand_lang"),
            F.log(F.col("n_docs_c") / F.col("n_docs_tot")).alias("log_prior"),
        )
    )
    per_cand = (
        scored.groupBy("doc_id", "true_lang", "cand_lang")
        .agg(F.sum("lp").alias("ll"))
        .join(F.broadcast(prior), "cand_lang")
        .withColumn("score", F.col("ll") + F.col("log_prior"))
    )
    from pyspark.sql import Window as _W

    w = _W.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cand_lang")
    )
    ranked = per_cand.select(
        "doc_id",
        "true_lang",
        "cand_lang",
        "score",
        F.row_number().over(w).alias("rn"),
        (F.col("score") - F.lead("score", 1).over(w)).alias("margin"),
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .groupBy("true_lang", F.col("cand_lang").alias("pred_lang"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("margin").alias("avg_margin"),
        )
        .orderBy("true_lang", "pred_lang")
    )


def nb_lang_confusion_oracle(alpha: float = 0.5) -> str:
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, lang, doc_id % 2 AS split,
         unnest({tokens_sql(norm_sql())}) AS term
  FROM documents WHERE {norm_sql()} <> ''),
tr AS (SELECT * FROM toks WHERE split = 0),
cls_tok AS MATERIALIZED (
  SELECT lang, term, count(*)::BIGINT AS c FROM tr GROUP BY lang, term),
cls_tot AS MATERIALIZED (
  SELECT lang, count(*)::BIGINT AS n_c FROM tr GROUP BY lang),
vocab AS (SELECT count(DISTINCT term)::BIGINT AS v_size FROM tr),
tr_docs AS MATERIALIZED (
  SELECT lang, count(*)::BIGINT AS n_docs_c FROM documents
  WHERE doc_id % 2 = 0 GROUP BY lang),
tr_total AS (SELECT sum(n_docs_c)::BIGINT AS n_docs_tot FROM tr_docs),
te AS (
  SELECT doc_id, lang AS true_lang, term FROM toks WHERE split = 1),
scored AS (
  SELECT te.doc_id, te.true_lang, l.lang AS cand_lang,
    ln((coalesce(ct.c, 0) + {alpha})
       / (tot.n_c + {alpha} * (v.v_size + 1))) AS lp
  FROM te
  CROSS JOIN cls_tot l
  LEFT JOIN cls_tok ct ON ct.lang = l.lang AND ct.term = te.term
  JOIN cls_tot tot ON tot.lang = l.lang
  CROSS JOIN vocab v),
prior AS (
  SELECT d.lang AS cand_lang, ln(d.n_docs_c * 1.0 / t.n_docs_tot)
    AS log_prior
  FROM tr_docs d CROSS JOIN tr_total t),
per_cand AS (
  SELECT s.doc_id, s.true_lang, s.cand_lang,
    sum(s.lp) + any_value(p.log_prior) AS score
  FROM scored s JOIN prior p ON p.cand_lang = s.cand_lang
  GROUP BY s.doc_id, s.true_lang, s.cand_lang),
ranked AS (
  SELECT doc_id, true_lang, cand_lang, score,
    row_number() OVER (PARTITION BY doc_id
                       ORDER BY score DESC, cand_lang) AS rn,
    score - lead(score, 1) OVER (PARTITION BY doc_id
                       ORDER BY score DESC, cand_lang) AS margin
  FROM per_cand)
SELECT true_lang, cand_lang AS pred_lang, count(*)::BIGINT AS n_docs,
  avg(margin) AS avg_margin
FROM ranked WHERE rn = 1
GROUP BY true_lang, cand_lang ORDER BY true_lang, pred_lang
"""


def source_robust_quality(
    docs: DataFrame, trim_frac: float = 0.1
) -> DataFrame:
    """(source, n_docs, mean_chars, trimmed_mean_chars) — per-source
    doc-length profile with a symmetric trimmed mean: drop the lowest
    and highest ``floor(n * trim_frac)`` docs (ranked by (n_chars,
    doc_id) — a total order, so the trim set is deterministic) and
    average the rest.  The robust per-host quality signal: one mirror
    dumping megabyte boilerplate pages, or a feed of empty stubs,
    shifts the plain mean but not the trimmed one — crawl-budget
    decisions should read the latter.

    Scale shape: ONE source-keyed window (rank + group count share the
    exchange) + one source-keyed conditional agg riding the same key;
    integer char sums are exact under any partitioning, one double
    division each at output.  No collected lists — the trim predicate
    is a per-row flag, so group state stays O(1)."""
    part = Window.partitionBy("source")
    w = part.orderBy("n_chars", "doc_id")
    ranked = docs.select("source", "doc_id", "n_chars").select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(part).alias("n"),
    )
    k = F.floor(F.col("n") * trim_frac)
    kept = (F.col("rk") > k) & (F.col("rk") <= F.col("n") - k)
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_all"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias(
                "sum_kept"
            ),
            F.sum(kept.cast("long")).alias("n_kept"),
        )
        .select(
            "source",
            "n_docs",
            (F.col("sum_all") / F.col("n_docs").cast("double")).alias(
                "mean_chars"
            ),
            (F.col("sum_kept") / F.col("n_kept").cast("double")).alias(
                "trimmed_mean_chars"
            ),
        )
        .orderBy("source")
    )


def source_robust_quality_oracle(trim_frac: float = 0.1) -> str:
    """DuckDB twin: identical rank/count window + conditional agg."""
    return f"""
WITH ranked AS (
  SELECT source, n_chars,
    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id)
      AS rk,
    count(*) OVER (PARTITION BY source) AS n
  FROM documents)
SELECT source, count(*)::BIGINT AS n_docs,
  sum(n_chars) / count(*)::DOUBLE AS mean_chars,
  sum(CASE WHEN rk > floor(n * {trim_frac})
            AND rk <= n - floor(n * {trim_frac})
           THEN n_chars ELSE 0 END)
    / sum(CASE WHEN rk > floor(n * {trim_frac})
                AND rk <= n - floor(n * {trim_frac})
               THEN 1 ELSE 0 END)::DOUBLE AS trimmed_mean_chars
FROM ranked
GROUP BY source
ORDER BY source
"""


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, n_hit_terms, score) — Okapi BM25 (Robertson et al.,
    public literature) for a bag-of-words query over the corpus:
    ``score = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``
    with ``idf = ln((N - df + 0.5)/(df + 0.5) + 1)``.  The retrieval
    baseline every RAG / search-index evaluation starts from.  No rank
    column on purpose: near-tied scores may differ in the last ulp
    across engines, and a rank would freeze that noise into an integer
    (order by score at read time instead).

    Plan: the (doc, term) count table feeds doc lengths and the
    query-term postings; corpus stats (N, avgdl) are ONE broadcast
    row; only postings of the |query| terms are scored — the inverted-
    index access pattern, never a corpus scan per term."""
    tc = (
        _exploded_terms(docs)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()  # consumers: doc lengths + query postings
    )
    dlen = tc.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dlen.groupBy().agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    hits = tc.filter(F.col("term").isin(list(query_terms)))
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * (F.col("tf") * F.lit(k1 + 1.0)) / (F.col("tf") + norm)
    return (
        hits.join(F.broadcast(dfreq), "term")
        .join(dlen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", contrib.alias("contrib"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.sum("contrib").alias("score"),
        )
        .orderBy("doc_id")
    )


def bm25_search_oracle(
    query_terms: list[str], k1: float = 1.2, b: float = 0.75
) -> str:
    """DuckDB twin: identical postings/stats/contribution cascade."""
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH ex AS (
  SELECT doc_id, unnest({tokens_sql(norm_sql())}) AS term FROM documents),
tc AS MATERIALIZED (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM ex
  WHERE term <> '' GROUP BY doc_id, term),
dlen AS MATERIALIZED (
  SELECT doc_id, sum(tf)::BIGINT AS dl FROM tc GROUP BY doc_id),
stats AS (
  SELECT count(*)::BIGINT AS n_docs,
         sum(dl) / count(*) AS avgdl
  FROM dlen),
hits AS (SELECT * FROM tc WHERE term IN ({terms})),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM hits GROUP BY term)
SELECT h.doc_id, count(*)::BIGINT AS n_hit_terms,
  sum(
    ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
    * (h.tf * {k1 + 1.0}) / (h.tf + {k1} * ({1.0 - b} + {b} * d.dl / s.avgdl))
  ) AS score
FROM hits h
JOIN dfreq f ON h.term = f.term
JOIN dlen d ON h.doc_id = d.doc_id
CROSS JOIN stats s
GROUP BY h.doc_id
ORDER BY h.doc_id
"""


# ------------------------------------------------------------------ #
# Character-trigram language-model scoring (CCNet-style quality)
# ------------------------------------------------------------------ #

#: doc-local char trigram list over the normalized text (space is a
#: real symbol: it carries word-boundary signal exactly as in char-LM
#: literature); NULL for docs shorter than 3 chars.
_TRI_EXPR = (
    "CASE WHEN length(norm) >= 3 THEN "
    "transform(sequence(1, length(norm) - 2), "
    "i -> substring(norm, i, 3)) END"
)


def char_trigram_logprob(docs: DataFrame, alpha: float = 0.5) -> DataFrame:
    """(doc_id, n_trigrams, mean_logprob) — mean natural-log probability
    of each document's character trigrams under the corpus's own
    Lidstone-smoothed conditional model::

        p(c | ab) = (c3(abc) + alpha) / (c2(ab) + alpha * (V + 1))

    with ``V`` = corpus character-vocabulary size and the ``+1``
    reserving unseen mass.  This is the *context-conditional* upgrade of
    ``unigram_logprob`` — the actual shape of the CCNet/RefinedWeb
    LM-perplexity quality filter (Wenzek et al. 2020, public
    literature): gibberish scores far below the corpus mean, degenerate
    repetition far above.

    Scale shape: ONE corpus trigram explode feeds (a) the trigram count
    table and (b) per-doc distinct-trigram weights; both model tables
    are char-vocab-bounded (<= V^3 rows regardless of corpus size), so
    the scoring joins broadcast.  The bigram-context table derives from
    the trigram table by prefix aggregation — no second corpus pass.
    Model constants (V) ride a 1-row broadcast.
    """
    tri = (
        docs.withColumn("norm", norm_col())
        .select("doc_id", F.explode(F.expr(_TRI_EXPR)).alias("tri"))
    )
    # per-doc trigram multiplicities: scoring joins run on distinct
    # (doc, tri) pairs, not every occurrence
    dtri = tri.groupBy("doc_id", "tri").agg(
        F.count(F.lit(1)).alias("n")
    )
    c3 = dtri.groupBy("tri").agg(F.sum("n").alias("c3")).persist()
    c2 = (
        c3.groupBy(F.substring("tri", 1, 2).alias("big"))
        .agg(F.sum("c3").alias("c2"))
    )
    vsize = (
        c3.select(F.explode(F.split("tri", "")).alias("ch"))
        .filter(F.col("ch") != "")
        .agg(F.countDistinct("ch").alias("v"))
    )
    logp = F.log(
        (F.col("c3") + F.lit(alpha))
        / (F.col("c2") + F.lit(alpha) * (F.col("v") + F.lit(1.0)))
    )
    return (
        dtri.join(F.broadcast(c3), "tri")
        .join(
            F.broadcast(c2),
            F.substring("tri", 1, 2) == F.col("big"),
        )
        .crossJoin(F.broadcast(vsize))
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_trigrams"),
            (F.sum(F.col("n") * logp) / F.sum("n")).alias("mean_logprob"),
        )
        .orderBy("doc_id")
    )


def char_trigram_logprob_oracle(alpha: float = 0.5) -> str:
    """DuckDB twin: same explode (correlated lateral generate_series),
    same count tables, same smoothing arithmetic."""
    return f"""
WITH nrm AS (SELECT doc_id, {norm_sql()} AS norm FROM documents),
tri AS MATERIALIZED (
  SELECT doc_id, substring(norm, i, 3) AS tri
  FROM nrm, unnest(generate_series(1, len(norm) - 2)) AS u(i)
  WHERE len(norm) >= 3),
dtri AS MATERIALIZED (
  SELECT doc_id, tri, count(*)::BIGINT AS n FROM tri
  GROUP BY doc_id, tri),
c3 AS MATERIALIZED (
  SELECT tri, sum(n)::BIGINT AS c3 FROM dtri GROUP BY tri),
c2 AS MATERIALIZED (
  SELECT substring(tri, 1, 2) AS big, sum(c3)::BIGINT AS c2
  FROM c3 GROUP BY 1),
vs AS (
  SELECT count(DISTINCT ch)::BIGINT AS v
  FROM (SELECT unnest(string_split_regex(tri, '')) AS ch FROM c3)
  WHERE ch <> '')
SELECT d.doc_id, sum(d.n)::BIGINT AS n_trigrams,
  sum(d.n * ln((c3.c3 + {alpha}) / (c2.c2 + {alpha} * (vs.v + 1.0))))
    / sum(d.n) AS mean_logprob
FROM dtri d
JOIN c3 ON d.tri = c3.tri
JOIN c2 ON substring(d.tri, 1, 2) = c2.big
CROSS JOIN vs
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


# ------------------------------------------------------------------ #
# TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004, public
# literature): PageRank over the word co-occurrence graph.  The
# corpus-level term-salience complement of tfidf_topk — TF-IDF scores
# terms per document; TextRank finds the corpus's structurally central
# vocabulary, the candidate ENTITY/CONCEPT labels a KG bootstrap
# promotes to classes before Hearst-pattern wiring.
# ------------------------------------------------------------------ #


def textrank_keywords(
    docs: DataFrame,
    window: int = 3,
    iters: int = 4,
    k: int = 40,
    min_len: int = 4,
) -> DataFrame:
    """(term, score) — top-``k`` corpus keywords by PageRank over the
    word co-occurrence graph.

    Candidate words are tokens of length >= ``min_len`` (the content-
    word proxy standing in for the original's POS filter — no tagger
    ships in this container); two candidates co-occur when they sit
    within ``window`` positions on the FILTERED token sequence.  The
    graph is undirected and unweighted (distinct pairs, both
    directions), ranked by ``operators.graphstats.pagerank``.

    Scale shape: co-occurrence needs NO self-join — ``lead(term, d)``
    over one per-doc window sort emits all within-window pairs in a
    single scan; the edge set is then vocabulary-bounded (distinct
    pairs), so the PageRank rounds run on a graph that is tiny next to
    the corpus regardless of corpus size.  Ranking arithmetic is
    +,*,/ only (correctly-rounded IEEE), so the top-k boundary is
    cross-engine deterministic with the (score desc, term) tiebreak."""
    from pyspark.sql import Window

    from ..operators.graphstats import pagerank

    toks = (
        docs.withColumn("norm", norm_col())
        .select("doc_id", F.posexplode(tokens_col()).alias("pos", "term"))
        .filter(F.length("term") >= min_len)
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    seq = toks.select(
        "term",
        *[F.lead("term", d).over(w).alias(f"n{d}") for d in range(1, window)],
    )
    directed = None
    for d in range(1, window):
        leg = seq.select(
            F.col("term").alias("src"), F.col(f"n{d}").alias("dst")
        ).filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        directed = leg if directed is None else directed.unionByName(leg)
    edges = (
        directed.select("src", "dst")
        .union(directed.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    ranks = pagerank(edges, iters=iters)
    return (
        ranks.select(F.col("node").alias("term"), F.col("rank").alias("score"))
        .orderBy(F.col("score").desc(), F.col("term"))
        .limit(k)
    )


def textrank_keywords_oracle(
    window: int = 3,
    iters: int = 4,
    k: int = 40,
    min_len: int = 4,
    table: str = "documents",
) -> str:
    """DuckDB twin: parallel-unnest positions, the same lead ladder on
    the filtered sequence, distinct symmetric edges, then the shared
    unrolled-CTE PageRank (graphstats.pagerank_sql)."""
    from ..operators.graphstats import pagerank_sql

    lead_cols = ", ".join(
        f"lead(term, {d}) OVER (PARTITION BY doc_id ORDER BY pos) AS n{d}"
        for d in range(1, window)
    )
    legs = " UNION ALL ".join(
        f"SELECT term AS src, n{d} AS dst FROM seq "
        f"WHERE n{d} IS NOT NULL AND term <> n{d}"
        for d in range(1, window)
    )
    edges_cte = f"""ex AS (
  SELECT doc_id,
    unnest({tokens_sql(norm_sql())}) AS term,
    unnest(range(len({tokens_sql(norm_sql())}))) AS pos
  FROM {table}),
cand AS (SELECT doc_id, term, pos FROM ex WHERE length(term) >= {min_len}),
seq AS (SELECT term, {lead_cols} FROM cand),
dir AS ({legs}),
edges AS (
  SELECT DISTINCT src, dst FROM
    (SELECT src, dst FROM dir UNION ALL SELECT dst, src FROM dir))"""
    pr = pagerank_sql(edges_cte, iters=iters)
    return f"""
SELECT node AS term, rank AS score FROM ({pr.strip()})
ORDER BY score DESC, term
LIMIT {k}
"""


# ------------------------------------------------------------------ #
# Reciprocal-rank fusion
# ------------------------------------------------------------------ #


def rrf_retrieval(
    docs: DataFrame, query_terms: list[str], kconst: int = 60, top: int = 20
) -> DataFrame:
    """(doc_id, rank_overlap, rank_tf, rrf_score) — two exact query
    rankings fused by Reciprocal Rank Fusion (Cormack et al. 2009,
    public literature): ``rrf = 1/(k+rank_a) + 1/(k+rank_b)``.

    The two base rankings are deliberately INTEGER-exact so ranks are
    bit-stable across engines (the BM25 float sum is not, see
    ``bm25_search``): (a) coordination level — distinct query terms
    hit; (b) total query-term frequency.  They order genuinely
    differently (a short doc hitting all terms once beats a long doc
    repeating one term under (a), loses under (b)) — exactly the
    disagreement RRF exists to reconcile.  The rrf division itself is
    row-wise IEEE arithmetic on small integers — portable.

    Plan (r3, VERDICT #8): NO global window anywhere.  Each base list
    is pre-capped with a distributed TakeOrdered at M = kconst +
    2*top, which is provably lossless: a doc below rank M in BOTH
    lists has rrf < 2/(kconst+M+1) = 1/(kconst+top), while every doc
    in a list's top-`top` scores above 1/(kconst+top) — so at least
    `top` docs beat it.  Survivors' EXACT global ranks are then
    recovered by rank-by-counting: one broadcast of the <=2M candidate
    rows against the hit set, rank = 1 + count(strictly better) under
    the same total order (tie-broken by doc_id) — identical values to
    row_number, computed with map-side partials instead of a
    single-partition sort."""
    hits = (
        _exploded_terms(docs)
        .filter(F.col("term").isin(list(query_terms)))
        .groupBy("doc_id")
        .agg(
            F.count_distinct("term").alias("n_hit"),
            F.count(F.lit(1)).alias("tf_sum"),
        )
        .persist()  # 3 consumers: two caps + the rank-count join
    )
    m_cap = kconst + 2 * top
    cap_a = hits.orderBy(F.desc("n_hit"), "doc_id").limit(m_cap)
    cap_b = hits.orderBy(F.desc("tf_sum"), "doc_id").limit(m_cap)
    cand = (
        cap_a.select("doc_id")
        .unionByName(cap_b.select("doc_id"))
        .distinct()
        .join(hits, "doc_id")
        .select(
            F.col("doc_id").alias("c_id"),
            F.col("n_hit").alias("c_nh"),
            F.col("tf_sum").alias("c_tf"),
        )
    )
    better_a = (F.col("n_hit") > F.col("c_nh")) | (
        (F.col("n_hit") == F.col("c_nh")) & (F.col("doc_id") < F.col("c_id"))
    )
    better_b = (F.col("tf_sum") > F.col("c_tf")) | (
        (F.col("tf_sum") == F.col("c_tf")) & (F.col("doc_id") < F.col("c_id"))
    )
    ranked = (
        hits.crossJoin(F.broadcast(cand))
        .groupBy("c_id")
        .agg(
            (F.sum(better_a.cast("int")) + 1).cast("int").alias("rank_overlap"),
            (F.sum(better_b.cast("int")) + 1).cast("int").alias("rank_tf"),
        )
        .select(F.col("c_id").alias("doc_id"), "rank_overlap", "rank_tf")
    )
    rrf = 1.0 / (F.lit(kconst) + F.col("rank_overlap")) + 1.0 / (
        F.lit(kconst) + F.col("rank_tf")
    )
    return (
        ranked.select("doc_id", "rank_overlap", "rank_tf", rrf.alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(top)
    )


def rrf_retrieval_oracle(
    query_terms: list[str], kconst: int = 60, top: int = 20
) -> str:
    """DuckDB twin: identical hit agg, window ranks, fusion."""
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH ex AS (
  SELECT doc_id, unnest({tokens_sql(norm_sql())}) AS term FROM documents),
hits AS (
  SELECT doc_id, count(DISTINCT term)::BIGINT AS n_hit,
         count(*)::BIGINT AS tf_sum
  FROM ex WHERE term IN ({terms}) GROUP BY doc_id),
ranked AS (
  SELECT doc_id,
    row_number() OVER (ORDER BY n_hit DESC, doc_id) AS rank_overlap,
    row_number() OVER (ORDER BY tf_sum DESC, doc_id) AS rank_tf
  FROM hits)
SELECT doc_id, rank_overlap, rank_tf,
       1.0::DOUBLE / ({kconst} + rank_overlap)
         + 1.0::DOUBLE / ({kconst} + rank_tf) AS rrf_score
FROM ranked
ORDER BY rrf_score DESC, doc_id
LIMIT {top}"""


# ------------------------------------------------------------------ #
# Keyness (corpus-comparison distinctive terms)
# ------------------------------------------------------------------ #


def keyness_terms(
    docs_a: DataFrame, docs_b: DataFrame, min_count: int = 5
) -> DataFrame:
    """(term, n_a, n_b, e_a, e_b, g2, direction) — Dunning
    log-likelihood keyness (Dunning 1993, public literature) of every
    term between two corpora: which vocabulary is DISTINCTIVE of A
    versus B (domain jargon, register shift, topical drift) — the
    corpus-linguistics complement of the engine's cross-crawl
    vocab-drift monitor.

    ``g2 = 2 * (a*ln(a/e_a) + b*ln(b/e_b))`` with expected counts from
    the pooled rate; zero observed counts contribute 0 (the lim x->0
    of x ln x).  Counts and the ``min_count`` gate are integers; the
    ln arithmetic is row-wise on identical doubles, driver-normalized
    at %.6g.  Plan: one token count agg per side, one full-outer
    term join, row-wise math — two corpus scans total."""
    ta = (
        _exploded_terms(docs_a).groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    tb = (
        _exploded_terms(docs_b).groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    j = (
        ta.join(tb, "term", "full_outer")
        .select(
            "term",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
        .persist()  # consumers: the totals agg and the scored output
    )
    tot = j.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    )
    out = j.crossJoin(F.broadcast(tot))
    e_a = (F.col("n_a") + F.col("n_b")) * F.col("ta") / (F.col("ta") + F.col("tb"))
    e_b = (F.col("n_a") + F.col("n_b")) * F.col("tb") / (F.col("ta") + F.col("tb"))
    term_a = F.when(
        F.col("n_a") > 0, F.col("n_a") * F.log(F.col("n_a") / e_a)
    ).otherwise(F.lit(0.0))
    term_b = F.when(
        F.col("n_b") > 0, F.col("n_b") * F.log(F.col("n_b") / e_b)
    ).otherwise(F.lit(0.0))
    return (
        out.filter(F.col("n_a") + F.col("n_b") >= min_count)
        .select(
            "term", "n_a", "n_b",
            e_a.alias("e_a"), e_b.alias("e_b"),
            (2.0 * (term_a + term_b)).alias("g2"),
            F.when(F.col("n_a") / F.col("ta") >= F.col("n_b") / F.col("tb"), "a")
            .otherwise("b")
            .alias("direction"),
        )
        .orderBy("term")
    )


def keyness_terms_sql(cte_a: str, cte_b: str, min_count: int = 5) -> str:
    """DuckDB twin; ``cte_a``/``cte_b`` must define ``da``/``db`` with
    (doc_id, text)."""
    ex = lambda src: (  # noqa: E731
        f"SELECT unnest({tokens_sql(norm_sql())}) AS term FROM {src}"
    )
    return f"""
WITH {cte_a},
{cte_b},
ca AS (SELECT term, count(*)::BIGINT AS n_a FROM ({ex('da')})
       WHERE term <> '' GROUP BY term),
cb AS (SELECT term, count(*)::BIGINT AS n_b FROM ({ex('db')})
       WHERE term <> '' GROUP BY term),
j AS MATERIALIZED (
  SELECT coalesce(ca.term, cb.term) AS term,
         coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
  FROM ca FULL OUTER JOIN cb ON ca.term = cb.term),
tot AS (SELECT sum(n_a)::BIGINT AS ta, sum(n_b)::BIGINT AS tb FROM j)
SELECT term, n_a, n_b,
  (n_a + n_b) * ta / (ta + tb) AS e_a,
  (n_a + n_b) * tb / (ta + tb) AS e_b,
  2.0::DOUBLE * (
    (CASE WHEN n_a > 0
          THEN n_a * ln(n_a / ((n_a + n_b) * ta / (ta + tb)))
          ELSE 0.0::DOUBLE END)
    + (CASE WHEN n_b > 0
            THEN n_b * ln(n_b / ((n_a + n_b) * tb / (ta + tb)))
            ELSE 0.0::DOUBLE END)) AS g2,
  CASE WHEN n_a / ta >= n_b / tb THEN 'a' ELSE 'b' END AS direction
FROM j, tot
WHERE n_a + n_b >= {min_count}
ORDER BY term"""
