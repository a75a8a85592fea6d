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
lines over a PER-FILE window sort (``Window.partitionBy("path")``,
``rec_id = markers seen so far within that file``) — at corpus scale
parallelism is per-WARC-file exactly like the real crawl layout; no
global single-partition sort exists anywhere in the plan.  The
per-record reduce (headers via conditional max, payload via an
order-stable concat) is a keyed aggregation with map-side partials.

Output is NULL-free by contract: absent headers (e.g. the warcinfo
record's missing ``WARC-Target-URI``) surface as ``''`` on BOTH
engines so no NULL-representation choice can differ between Spark
and the DuckDB oracle, and ``n_payload_lines`` is pinned to BIGINT
on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "parse_warc_lines",
    "parse_warc_lines_sql",
    "warc_fixture_df",
    "warc_fixture_values",
    "warc_multifile_fixture_df",
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

_FIXTURE_PATH = "crawl-00000.warc"


def warc_fixture_df(spark) -> DataFrame:
    return spark.createDataFrame(
        [(_FIXTURE_PATH, i, s) for i, s in enumerate(WARC_LINES)],
        "path string, line_no int, line string",
    )


def warc_multifile_fixture_df(spark) -> DataFrame:
    """Same 18 lines split across TWO files at the second record
    boundary — proves record ids restart per file and no record leaks
    across a file edge."""
    rows = [("crawl-00000.warc", i, s) for i, s in enumerate(WARC_LINES[:7])]
    rows += [
        ("crawl-00001.warc", i, s) for i, s in enumerate(WARC_LINES[7:])
    ]
    return spark.createDataFrame(
        rows, "path string, line_no int, line string"
    )


def warc_fixture_values() -> str:
    rows = ",\n    ".join(
        f"('{_FIXTURE_PATH}', {i}, '{s}')"
        for i, s in enumerate(WARC_LINES)
    )
    return f"w(path, line_no, line) AS (VALUES\n    {rows})"


def parse_warc_lines(lines: DataFrame) -> DataFrame:
    """(path, rec_id, warc_type, uri, warc_date, n_payload_lines,
    payload) — one row per WARC record from a ``(path, line_no,
    line)`` table (a missing ``path`` column defaults to ``''``);
    record ids restart at 1 per file, headers stop at the record's
    first blank line, later colon-lines are payload text, and absent
    headers come back as ``''`` (never NULL)."""
    if "path" not in lines.columns:
        lines = lines.withColumn("path", F.lit(""))
    w = Window.partitionBy("path").orderBy("line_no")
    marked = lines.withColumn(
        "rec_id",
        F.sum(F.when(F.col("line") == "WARC/1.0", 1).otherwise(0)).over(w),
    ).filter(F.col("rec_id") > 0)
    blanks = (
        marked.filter(F.col("line") == "")
        .groupBy("path", "rec_id")
        .agg(F.min("line_no").alias("blank_at"))
    )
    m = marked.join(blanks, ["path", "rec_id"], "left")
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
        m.groupBy("path", "rec_id")
        .agg(
            F.coalesce(
                F.max(F.when(is_hdr & (hname == "WARC-Type"), hval)),
                F.lit(""),
            ).alias("warc_type"),
            F.coalesce(
                F.max(
                    F.when(is_hdr & (hname == "WARC-Target-URI"), hval)
                ),
                F.lit(""),
            ).alias("uri"),
            F.coalesce(
                F.max(F.when(is_hdr & (hname == "WARC-Date"), hval)),
                F.lit(""),
            ).alias("warc_date"),
            F.sum(F.when(is_payload, 1).otherwise(0))
            .cast("bigint")
            .alias("n_payload_lines"),
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
        .orderBy("path", "rec_id")
    )


def parse_warc_lines_sql(lines_cte: str) -> str:
    """DuckDB twin; ``lines_cte`` must define ``w(path, line_no,
    line)``."""
    return f"""
WITH {lines_cte.strip()},
marked AS MATERIALIZED (
  SELECT *, (sum(CASE WHEN line = 'WARC/1.0' THEN 1 ELSE 0 END)
    OVER (PARTITION BY path ORDER BY line_no))::BIGINT AS rec_id
  FROM w
  QUALIFY rec_id > 0),
blanks AS (
  SELECT path, rec_id, min(line_no) AS blank_at
  FROM marked WHERE line = '' GROUP BY path, rec_id),
m AS (
  SELECT marked.*, b.blank_at,
    (b.blank_at IS NULL OR marked.line_no < b.blank_at)
      AND regexp_matches(line, '{_HDR_RX}') AS is_hdr,
    b.blank_at IS NOT NULL AND marked.line_no > b.blank_at AS is_payload
  FROM marked LEFT JOIN blanks b USING (path, rec_id))
SELECT path, rec_id,
  coalesce(max(CASE WHEN is_hdr AND regexp_extract(line, '{_HDR_RX}', 1)
             = 'WARC-Type'
           THEN regexp_extract(line, '{_HDR_RX}', 2) END), '') AS warc_type,
  coalesce(max(CASE WHEN is_hdr AND regexp_extract(line, '{_HDR_RX}', 1)
             = 'WARC-Target-URI'
           THEN regexp_extract(line, '{_HDR_RX}', 2) END), '') AS uri,
  coalesce(max(CASE WHEN is_hdr AND regexp_extract(line, '{_HDR_RX}', 1)
             = 'WARC-Date'
           THEN regexp_extract(line, '{_HDR_RX}', 2) END), '') AS warc_date,
  sum(CASE WHEN is_payload THEN 1 ELSE 0 END)::BIGINT AS n_payload_lines,
  coalesce(string_agg(CASE WHEN is_payload THEN line END, chr(10)
                      ORDER BY line_no), '') AS payload
FROM m
GROUP BY path, rec_id
ORDER BY path, rec_id"""
