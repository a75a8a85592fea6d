"""Law: every oracle's output schema is driver-hash safe.

The grading driver's value hasher is TYPE-sensitive: DuckDB HUGEINT
(INT128 — what ``sum(INTEGER)`` and window sums silently return) and
DECIMAL columns hash differently from Spark's BIGINT/DOUBLE even when
the values are numerically identical (r2/r3 ``warc_records`` /
``robots_rules`` reds, 100% separated by this one variable).  This test
binds every ``oracle_sql()`` statement through DuckDB's planner
(``DESCRIBE`` — no execution, so the full 368-oracle scan is seconds)
and fails on any HUGEINT/UHUGEINT/DECIMAL output column, keeping the
whole class of red extinct.
"""
from __future__ import annotations

import os

import duckdb
import pytest

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_no_hugeint_or_decimal_oracle_columns():
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )

    bad: list[tuple[str, str, str]] = []
    broken: list[tuple[str, str]] = []
    for name, sql in E.oracle_sql().items():
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except duckdb.Error as exc:  # pragma: no cover - diagnosed below
            broken.append((name, str(exc).splitlines()[0]))
            continue
        for row in desc:
            col, typ = row[0], row[1]
            if any(f in typ for f in FORBIDDEN):
                bad.append((name, col, typ))

    assert not broken, f"oracles failed to bind: {broken}"
    assert not bad, (
        "driver-hash-unsafe oracle columns (cast to ::BIGINT/::DOUBLE): "
        f"{bad}"
    )
