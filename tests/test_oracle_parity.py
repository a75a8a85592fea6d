"""Local mirror of the driver's differential check: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same inputs, compare row counts + order-insensitive values.

Runs at sf0.001 for speed (the driver uses sf0.01 — same data generator).
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return ""
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert len(srows) >= 0  # rows-only check
        return
    res = ddb.execute(oracles[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column sets differ"
    s_cols, s_canon = _canon(scols, [tuple(r) for r in srows])
    d_cols, d_canon = _canon(dcols, drows)
    assert len(s_canon) == len(d_canon), (
        f"{name}: row counts {len(s_canon)} vs {len(d_canon)}"
    )
    assert s_canon == d_canon, f"{name}: values differ\nspark={s_canon[:5]}\nduck={d_canon[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) > 0
