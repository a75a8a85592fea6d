"""Typed-literal mining: measurement quantities and temporal scopes
from web text — the step that turns extracted surface strings into the
*typed* literals an ontology wants (``xsd:double`` in an SI base unit,
``xsd:gYear`` validity intervals), per the QUDT / OWL-Time modelling
practice (public vocabularies).

Two miners, both pure regex->arithmetic projection chains (the corpus
is touched once, no shuffle before the final sort):

* :func:`quantity_mentions` — ``<number> <unit>`` mentions normalized
  to an SI base via a broadcast unit-conversion dimension table
  ("5 km" and "5000 m" become the SAME typed literal, so downstream
  ``detect_conflicts`` / ``truth_discovery`` see agreement, not two
  claims).  Decimal parse and one multiply are IEEE-correctly-rounded,
  hence bit-identical across Spark and DuckDB — no trig, no rounding.
* :func:`temporal_scopes` — year-interval cues ("from 1998 to 2004",
  "since 2010", "in 1969") resolved by a fixed precedence cascade into
  ``[start_year, end_year]`` (open ends NULL); integers throughout.
  The valid-time input for ``kg_triple_history`` / SCD2 versioning:
  facts stop being timeless the moment the text says so.

Scale shape: both are narrow whole-stage-codegen projections over the
sentence table plus (for quantities) one broadcast join against a
~dozens-row unit dimension — the same plan at any corpus size.  The
fixtures embed single-cue sentences (first-match contract of
``regexp_extract`` on both engines, same stance as
``taxonomy.acronym_pairs``); multi-match extraction is the documented
``regexp_extract_all`` + parallel-unnest variant of the same algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "UNIT_TABLE",
    "quantity_sentences_df",
    "quantity_sentences_values",
    "quantity_mentions",
    "quantity_mentions_sql",
    "temporal_sentences_df",
    "temporal_sentences_values",
    "temporal_scopes",
    "temporal_scopes_sql",
]

# --------------------------------------------------------------------- #
# quantity mentions -> SI-normalized typed literals
# --------------------------------------------------------------------- #

#: (unit, multiplier, si_unit) — broadcast dimension table.  Data
#: units use decimal multipliers (the storage-vendor convention),
#: documented rather than configurable.
UNIT_TABLE: list[tuple[str, float, str]] = [
    ("km", 1000.0, "m"), ("m", 1.0, "m"), ("cm", 0.01, "m"),
    ("mm", 0.001, "m"),
    ("kg", 1.0, "kg"), ("g", 0.001, "kg"), ("mg", 1e-06, "kg"),
    ("ghz", 1e9, "hz"), ("mhz", 1e6, "hz"), ("khz", 1000.0, "hz"),
    ("hz", 1.0, "hz"),
    ("tb", 1e12, "b"), ("gb", 1e9, "b"), ("mb", 1e6, "b"),
    ("kb", 1000.0, "b"),
    ("h", 3600.0, "s"), ("min", 60.0, "s"), ("s", 1.0, "s"),
]

#: number + unit cue; longest-alternative-first so "mhz" never lexes
#: as "m" + trailing junk ("hz" alone is behind "khz"/"mhz"/"ghz").
_QTY_RX = (
    r"([0-9]+(?:\.[0-9]+)?) ?"
    r"(km|cm|mm|kg|mg|ghz|mhz|khz|hz|tb|gb|mb|kb|min|m|g|h|s)\b"
)

QUANTITY_SENTENCES: list[str] = [
    "the alpha bridge spans 2.5 km across the north bay",
    "each crate weighs 340 g when packed for transport",
    "the beta chip is clocked at 3.2 ghz under load",
    "the archive grew by 1.5 tb last quarter",
    "a standard pallet holds 250 kg of cargo",
    "the survey line runs 4000 m along the ridge",
    "the sensor samples every 20 min during daylight",
    "no numeric cue appears in this control sentence",
    "the relay waits 45 s before retrying the fetch",
]


def quantity_sentences_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(QUANTITY_SENTENCES)],
        "sent_id int, text string",
    )


def quantity_sentences_values() -> str:
    rows = ",\n    ".join(
        f"({i}, '{s}')" for i, s in enumerate(QUANTITY_SENTENCES)
    )
    return f"s(sent_id, text) AS (VALUES\n    {rows})"


def quantity_mentions(sents: DataFrame) -> DataFrame:
    """(sent_id, raw_value, unit, si_value, si_unit) — first
    ``<number> <unit>`` cue per sentence, normalized to the SI base
    unit by the broadcast :data:`UNIT_TABLE` join."""
    spark = sents.sparkSession
    units = spark.createDataFrame(
        UNIT_TABLE, "unit string, mult double, si_unit string"
    )
    m = sents.select(
        "sent_id",
        F.regexp_extract("text", _QTY_RX, 1).alias("raw_value"),
        F.regexp_extract("text", _QTY_RX, 2).alias("unit"),
    ).filter(F.col("raw_value") != "")
    return (
        m.join(F.broadcast(units), "unit")
        .select(
            "sent_id",
            "raw_value",
            "unit",
            (F.col("raw_value").cast("double") * F.col("mult")).alias("si_value"),
            "si_unit",
        )
        .orderBy("sent_id")
    )


def quantity_mentions_sql(sents_cte: str) -> str:
    """DuckDB twin; ``sents_cte`` must define ``s(sent_id, text)``."""
    unit_rows = ", ".join(
        f"('{u}', {m!r}, '{si}')" for u, m, si in UNIT_TABLE
    )
    return f"""
WITH {sents_cte.strip()},
units(unit, mult, si_unit) AS (VALUES {unit_rows}),
m AS (
  SELECT sent_id,
    regexp_extract(text, '{_QTY_RX}', 1) AS raw_value,
    regexp_extract(text, '{_QTY_RX}', 2) AS unit
  FROM s)
SELECT sent_id, raw_value, m.unit,
       raw_value::DOUBLE * mult AS si_value, si_unit
FROM m JOIN units ON m.unit = units.unit
WHERE raw_value <> ''
ORDER BY sent_id
"""


# --------------------------------------------------------------------- #
# temporal scopes -> xsd:gYear validity intervals
# --------------------------------------------------------------------- #

_RANGE_RX = r"(?:from|between) ([0-9]{4}) (?:to|and) ([0-9]{4})"
_SINCE_RX = r"since ([0-9]{4})"
_UNTIL_RX = r"until ([0-9]{4})"
_POINT_RX = r"in ([0-9]{4})"

TEMPORAL_SENTENCES: list[str] = [
    "alice worked for acme from 1998 to 2004 in the metro office",
    "the harbor mill operated between 1907 and 1963 continuously",
    "the lagoon institute has run the survey since 2010",
    "the old charter stays in force until 2030 by decree",
    "the observatory was founded in 1969 on the summit",
    "this control sentence carries no year cue at all",
    "the delta works expanded twice in 1984 after the flood",
]


def temporal_sentences_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(TEMPORAL_SENTENCES)],
        "sent_id int, text string",
    )


def temporal_sentences_values() -> str:
    rows = ",\n    ".join(
        f"({i}, '{s}')" for i, s in enumerate(TEMPORAL_SENTENCES)
    )
    return f"s(sent_id, text) AS (VALUES\n    {rows})"


def temporal_scopes(sents: DataFrame) -> DataFrame:
    """(sent_id, start_year, end_year, cue) — year-interval cue per
    sentence, precedence range > since > until > point; open interval
    ends are NULL; sentences with no cue are dropped."""
    rng_a = F.regexp_extract("text", _RANGE_RX, 1)
    rng_b = F.regexp_extract("text", _RANGE_RX, 2)
    since = F.regexp_extract("text", _SINCE_RX, 1)
    until = F.regexp_extract("text", _UNTIL_RX, 1)
    point = F.regexp_extract("text", _POINT_RX, 1)
    cue = (
        F.when(rng_a != "", F.lit("range"))
        .when(since != "", F.lit("since"))
        .when(until != "", F.lit("until"))
        .when(point != "", F.lit("point"))
    )
    start = (
        F.when(rng_a != "", rng_a)
        .when(since != "", since)
        .when(point != "", point)
        .cast("int")
    )
    end = (
        F.when(rng_b != "", rng_b)
        .when(until != "", until)
        .when((rng_a == "") & (since == "") & (until == "") & (point != ""), point)
        .cast("int")
    )
    return (
        sents.select(
            "sent_id",
            start.alias("start_year"),
            end.alias("end_year"),
            cue.alias("cue"),
        )
        .filter(F.col("cue").isNotNull())
        .orderBy("sent_id")
    )


def temporal_scopes_sql(sents_cte: str) -> str:
    """DuckDB twin; ``sents_cte`` must define ``s(sent_id, text)``."""
    return f"""
WITH {sents_cte.strip()},
m AS (
  SELECT sent_id,
    regexp_extract(text, '{_RANGE_RX}', 1) AS rng_a,
    regexp_extract(text, '{_RANGE_RX}', 2) AS rng_b,
    regexp_extract(text, '{_SINCE_RX}', 1) AS since_y,
    regexp_extract(text, '{_UNTIL_RX}', 1) AS until_y,
    regexp_extract(text, '{_POINT_RX}', 1) AS point_y
  FROM s)
SELECT sent_id,
  (CASE WHEN rng_a <> '' THEN rng_a
        WHEN since_y <> '' THEN since_y
        WHEN point_y <> '' THEN point_y END)::INT AS start_year,
  (CASE WHEN rng_b <> '' THEN rng_b
        WHEN until_y <> '' THEN until_y
        WHEN rng_a = '' AND since_y = '' AND until_y = ''
             AND point_y <> '' THEN point_y END)::INT AS end_year,
  CASE WHEN rng_a <> '' THEN 'range'
       WHEN since_y <> '' THEN 'since'
       WHEN until_y <> '' THEN 'until'
       WHEN point_y <> '' THEN 'point' END AS cue
FROM m
WHERE rng_a <> '' OR since_y <> '' OR until_y <> '' OR point_y <> ''
ORDER BY sent_id
"""
