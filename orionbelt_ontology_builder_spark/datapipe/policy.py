"""Content-policy filtering — the corpus-governance stages every
published pre-training pipeline runs (C4's blocklist filter, the
license-aware corpora of the open-data literature):

* :func:`license_detect` — rule-based license classification from
  boilerplate cues ("creative commons", "all rights reserved", "mit
  license", ...), first-match by a fixed precedence so a page quoting
  several licenses classifies deterministically; the license label is
  the standard *filter key* for redistribution-safe corpus cuts.
* :func:`blocklist_stats` — blocklisted-term hit counts and rate per
  document plus the keep/drop verdict at a hit-rate threshold — the
  C4-style wordlist filter as data (the verdict is auditable, not a
  silent drop).  The shipped list is a neutral placeholder (the
  engine's fixtures are clean-room synthetic); production swaps in the
  real list through the same parameter.

Both are pure projection + broadcast-probe plans: the cue/blocklist
tables are dozens of rows, the corpus is touched once, hit counting is
a token-explode + broadcast semi-probe + keyed count (map-side
combinable) — the same shape at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import _exploded_terms

__all__ = [
    "LICENSE_CUES",
    "license_detect",
    "license_detect_sql",
    "blocklist_stats",
    "blocklist_stats_sql",
    "policy_docs_df",
    "policy_docs_values",
]

#: (precedence, license label, lowercase cue substring) — first match
#: in precedence order wins.
LICENSE_CUES: list[tuple[int, str, str]] = [
    (1, "cc0", "cc0"),
    (2, "cc-by-sa", "creative commons attribution-sharealike"),
    (3, "cc-by", "creative commons attribution"),
    (4, "cc", "creative commons"),
    (5, "mit", "mit license"),
    (6, "apache-2.0", "apache license"),
    (7, "gpl", "general public license"),
    (8, "all-rights-reserved", "all rights reserved"),
]

#: neutral placeholder blocklist (synthetic fixtures are clean-room);
#: production passes its own list.
DEFAULT_BLOCKLIST: list[str] = ["grumble", "bork", "zonk"]

POLICY_DOCS: list[tuple[int, str]] = [
    (0, "this work is released under cc0 into the public domain"),
    (1, "licensed under the creative commons attribution-sharealike terms"),
    (2, "shared under a creative commons attribution license for reuse"),
    (3, "distributed under the mit license without warranty"),
    (4, "copyright 2020 example corp all rights reserved"),
    (5, "plain text with no licensing boilerplate at all"),
    (6, "covered by the apache license version two of the foundation"),
    (7, "the grumble report made the board bork twice and zonk once"),
    (8, "a single grumble appeared in an otherwise long clean text body"),
]


def policy_docs_df(spark) -> DataFrame:
    return spark.createDataFrame(POLICY_DOCS, "doc_id long, text string")


def policy_docs_values() -> str:
    rows = ",\n    ".join(f"({i}, '{t}')" for i, t in POLICY_DOCS)
    return f"d(doc_id, text) AS (VALUES\n    {rows})"


def license_detect(docs: DataFrame) -> DataFrame:
    """(doc_id, license) — first-match license cue by precedence;
    cue-less documents label ``unknown`` (kept visible: "no license
    found" is itself a filter decision)."""
    lower = F.lower(F.col("text"))
    label = F.lit(None).cast("string")
    for _, lic, cue in sorted(LICENSE_CUES, reverse=True):
        label = F.when(lower.contains(cue), F.lit(lic)).otherwise(label)
    return docs.select(
        "doc_id", F.coalesce(label, F.lit("unknown")).alias("license")
    ).orderBy("doc_id")


def license_detect_sql(docs_cte: str) -> str:
    """DuckDB twin; ``docs_cte`` must define ``d(doc_id, text)``."""
    whens = "\n    ".join(
        f"WHEN contains(lower(text), '{cue}') THEN '{lic}'"
        for _, lic, cue in sorted(LICENSE_CUES)
    )
    return f"""
WITH {docs_cte.strip()}
SELECT doc_id,
  CASE
    {whens}
    ELSE 'unknown'
  END AS license
FROM d
ORDER BY doc_id"""


def blocklist_stats(
    docs: DataFrame,
    blocklist: list[str] | None = None,
    max_rate: float = 0.1,
) -> DataFrame:
    """(doc_id, n_tokens, n_hits, hit_rate, keep) — blocklisted-token
    counts over the normalized token stream; ``keep`` is false when
    the hit RATE exceeds ``max_rate`` (rate, not count: long documents
    must not die to one stray term — the C4 filter's known
    false-positive mode)."""
    bl = blocklist if blocklist is not None else DEFAULT_BLOCKLIST
    toks = _exploded_terms(docs)
    counts = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("term").isin(bl), 1).otherwise(0)).alias("n_hits"),
    )
    rate = F.col("n_hits").cast("double") / F.col("n_tokens")
    return (
        counts.withColumn("hit_rate", rate)
        .withColumn("keep", rate <= F.lit(max_rate))
        .orderBy("doc_id")
    )


def blocklist_stats_sql(
    docs_cte: str,
    blocklist: list[str] | None = None,
    max_rate: float = 0.1,
) -> str:
    from .textstats import norm_sql, tokens_sql

    bl = blocklist if blocklist is not None else DEFAULT_BLOCKLIST
    inlist = ", ".join(f"'{t}'" for t in bl)
    return f"""
WITH {docs_cte.strip()},
ex AS (
  SELECT doc_id, unnest({tokens_sql(norm_sql())}) AS term FROM d),
counts AS (
  SELECT doc_id, count(*)::BIGINT AS n_tokens,
         sum(CASE WHEN term IN ({inlist}) THEN 1 ELSE 0 END)::BIGINT
           AS n_hits
  FROM ex WHERE term <> '' GROUP BY doc_id)
SELECT doc_id, n_tokens, n_hits,
       n_hits::DOUBLE / n_tokens AS hit_rate,
       n_hits::DOUBLE / n_tokens <= {max_rate!r} AS keep
FROM counts
ORDER BY doc_id"""


# --------------------------------------------------------------------- #
# k-anonymity reporting
# --------------------------------------------------------------------- #


def k_anonymity_report(events: DataFrame, k: int = 5) -> DataFrame:
    """(event_type, day, n_users, n_rows, at_risk) — k-anonymity audit
    (Sweeney 2002, public literature) over the release-shaped
    quasi-identifier (event_type, event day): a QI group backed by
    fewer than ``k`` distinct users re-identifies its members by
    intersection with any outside knowledge of the attribute pair —
    the standard pre-release gate for event/log corpora.  Reported,
    not silently suppressed (the release decision needs the list).

    One keyed agg with map-side partials; the distinct-user count
    shuffles (QI, user) once — at corpus scale swap in the HLL
    register path (``sketches.hll_register_parts``) exactly as
    void_summary_hll does for entity counts."""
    day = F.to_date("ts").cast("string")
    return (
        events.groupBy(F.col("event_type"), day.alias("day"))
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .withColumn("at_risk", F.col("n_users") < k)
        .orderBy("event_type", "day")
    )


def k_anonymity_report_sql(events_src: str = "events", k: int = 5) -> str:
    return f"""
SELECT event_type, CAST(ts AS DATE)::VARCHAR AS day,
       count(DISTINCT user_id)::BIGINT AS n_users,
       count(*)::BIGINT AS n_rows,
       count(DISTINCT user_id) < {k} AS at_risk
FROM {events_src}
GROUP BY event_type, CAST(ts AS DATE)
ORDER BY event_type, day"""
