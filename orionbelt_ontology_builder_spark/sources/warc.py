"""WARC record parsing as line-parallel DataFrame algebra — the
Common-Crawl-native ingestion format (ISO 28500, public spec), parsed
the same way the engine's N-Triples codec works: the file is a LINE
table, records are recovered with ONE window pass, and every field
extraction is a native expression.

WARC-lite grammar handled here (the subset Common-Crawl text dumps
exercise): records open with a ``WARC/1.0`` version line, carry
``Header-Name: value`` lines until the first blank line, then payload
lines until the next version line.  Continuation headers and
chunked-transfer payloads are out of scope (documented, raise-free:
they parse as payload text).

Scale shape: record assembly is a running count of version-marker
lines over ONE per-file window sort (``rec_id = markers seen so
far``) — at corpus scale the window partitions by file/split path, so
parallelism is per-WARC-file exactly like the real crawl layout; the
per-record reduce (headers via conditional max, payload via an
order-stable concat) is a keyed aggregation with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "parse_warc_lines",
    "parse_warc_lines_sql",
    "warc_fixture_df",
    "warc_fixture_values",
]

_HDR_RX = r"^([A-Za-z][A-Za-z0-9-]*): (.*)$"

#: three-record fixture: two web pages + a metadata record, with a
#: payload line that LOOKS like a header (must stay payload) and a
#: multi-line body.
WARC_LINES: list[str] = [
    "WARC/1.0",
    "WARC-Type: response",
    "WARC-Target-URI: http://example.org/a",
    "WARC-Date: 2024-01-01T00:00:00Z",
    "",
    "hello world",
    "second line of a",
    "WARC/1.0",
    "WARC-Type: response",
    "WARC-Target-URI: http://example.org/b",
    "WARC-Date: 2024-02-02T12:30:00Z",
    "",
    "payload with colon: not a header",
    "WARC/1.0",
    "WARC-Type: warcinfo",
    "WARC-Date: 2024-03-03T08:15:00Z",
    "",
    "software: test-crawler",
]


def warc_fixture_df(spark) -> DataFrame:
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(WARC_LINES)],
        "line_no int, line string",
    )


def warc_fixture_values() -> str:
    rows = ",\n    ".join(
        f"({i}, '{s}')" for i, s in enumerate(WARC_LINES)
    )
    return f"w(line_no, line) AS (VALUES\n    {rows})"


def parse_warc_lines(lines: DataFrame) -> DataFrame:
    """(rec_id, warc_type, uri, warc_date, n_payload_lines, payload) —
    one row per WARC record from a ``(line_no, line)`` table; headers
    stop at the record's first blank line, later colon-lines are
    payload text."""
    w = Window.orderBy("line_no")
    marked = lines.withColumn(
        "rec_id",
        F.sum(F.when(F.col("line") == "WARC/1.0", 1).otherwise(0)).over(w),
    ).filter(F.col("rec_id") > 0)
    blanks = (
        marked.filter(F.col("line") == "")
        .groupBy("rec_id")
        .agg(F.min("line_no").alias("blank_at"))
    )
    m = marked.join(blanks, "rec_id", "left")
    is_hdr = (
        (F.col("blank_at").isNull() | (F.col("line_no") < F.col("blank_at")))
        & F.col("line").rlike(_HDR_RX)
    )
    is_payload = F.col("blank_at").isNotNull() & (
        F.col("line_no") > F.col("blank_at")
    )
    hname = F.regexp_extract("line", _HDR_RX, 1)
    hval = F.regexp_extract("line", _HDR_RX, 2)
    return (
        m.groupBy("rec_id")
        .agg(
            F.max(
                F.when(is_hdr & (hname == "WARC-Type"), hval)
            ).alias("warc_type"),
            F.max(
                F.when(is_hdr & (hname == "WARC-Target-URI"), hval)
            ).alias("uri"),
            F.max(
                F.when(is_hdr & (hname == "WARC-Date"), hval)
            ).alias("warc_date"),
            F.sum(F.when(is_payload, 1).otherwise(0)).alias(
                "n_payload_lines"
            ),
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                is_payload,
                                F.struct("line_no", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
            ).alias("payload"),
        )
        .orderBy("rec_id")
    )


def parse_warc_lines_sql(lines_cte: str) -> str:
    """DuckDB twin; ``lines_cte`` must define ``w(line_no, line)``."""
    return f"""
WITH {lines_cte.strip()},
marked AS MATERIALIZED (
  SELECT *, sum(CASE WHEN line = 'WARC/1.0' THEN 1 ELSE 0 END)
    OVER (ORDER BY line_no) AS rec_id
  FROM w
  QUALIFY rec_id > 0),
blanks AS (
  SELECT rec_id, min(line_no) AS blank_at
  FROM marked WHERE line = '' GROUP BY rec_id),
m AS (
  SELECT marked.*, b.blank_at,
    (b.blank_at IS NULL OR marked.line_no < b.blank_at)
      AND regexp_matches(line, '{_HDR_RX}') AS is_hdr,
    b.blank_at IS NOT NULL AND marked.line_no > b.blank_at AS is_payload
  FROM marked LEFT JOIN blanks b USING (rec_id))
SELECT rec_id,
  max(CASE WHEN is_hdr AND regexp_extract(line, '{_HDR_RX}', 1)
             = 'WARC-Type'
           THEN regexp_extract(line, '{_HDR_RX}', 2) END) AS warc_type,
  max(CASE WHEN is_hdr AND regexp_extract(line, '{_HDR_RX}', 1)
             = 'WARC-Target-URI'
           THEN regexp_extract(line, '{_HDR_RX}', 2) END) AS uri,
  max(CASE WHEN is_hdr AND regexp_extract(line, '{_HDR_RX}', 1)
             = 'WARC-Date'
           THEN regexp_extract(line, '{_HDR_RX}', 2) END) AS warc_date,
  sum(CASE WHEN is_payload THEN 1 ELSE 0 END)::BIGINT AS n_payload_lines,
  coalesce(string_agg(CASE WHEN is_payload THEN line END, chr(10)
                      ORDER BY line_no), '') AS payload
FROM m
GROUP BY rec_id
ORDER BY rec_id"""
