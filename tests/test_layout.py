"""Z-order layout + product-quantization laws (beyond oracle parity).

Parity (values vs DuckDB) runs in test_oracle_parity; these pin the
*mathematical* contracts: Morton bit-interleaving correctness against a
pure-Python reference, bucket-partition completeness, extent tightness
vs a single-column layout, PQ argmin optimality (codebook source
vectors reconstruct exactly), and code-range bounds.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from orionbelt_ontology_builder_spark.datapipe import layout, similarity

SF_DIR = "/root/testdata/sf0.001"


def _py_morton(d1: int, d2: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((d1 >> i) & 1) << (2 * i + 1)
        z |= ((d2 >> i) & 1) << (2 * i)
    return z


@pytest.mark.parametrize("d1,d2", [(0, 0), (255, 255), (1, 2), (170, 85), (200, 13)])
def test_zvalue_sql_matches_python_reference(d1, d2):
    # evaluate the generated expression (both engine dialects) on a
    # 1-row table and compare to the bit-twiddling reference
    expect = _py_morton(d1, d2, 8)
    duck = layout.zvalue_sql("d1", "d2", 8, layout._duck_shl, layout._duck_shr)
    got = duckdb.sql(
        f"SELECT {duck} AS z FROM (SELECT {d1} AS d1, {d2} AS d2)"
    ).fetchone()[0]
    assert got == expect


def test_zvalue_spark_dialect_matches(spark):
    rows = [(0, 0), (255, 255), (1, 2), (170, 85), (200, 13)]
    sdf = spark.createDataFrame(rows, "d1 long, d2 long")
    expr = layout.zvalue_sql("d1", "d2", 8, layout._spark_shl, layout._spark_shr)
    got = {
        (r["d1"], r["d2"]): r["z"]
        for r in sdf.select("d1", "d2", F.expr(expr).alias("z")).collect()
    }
    for d1, d2 in rows:
        assert got[(d1, d2)] == _py_morton(d1, d2, 8)


def test_zorder_buckets_partition_rows_and_bound_extents(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ext = layout.zorder_extents(events).collect()
    assert sum(r["n_rows"] for r in ext) == events.count()
    for r in ext:
        assert 0 <= r["bucket"] < 2**layout.BUCKET_BITS
        assert 0 <= r["d1_min"] <= r["d1_max"] <= 2**layout.BITS - 1
        assert 0 <= r["d2_min"] <= r["d2_max"] <= 2**layout.BITS - 1
    # Z-prefix buckets constrain BOTH dims: with bucket_bits=4 the top
    # 2 bits of each dim are fixed per bucket, so every bucket's extent
    # covers at most a quarter of each axis — the two-dimensional
    # skipping property a single-column sort cannot give.
    for r in ext:
        assert r["d1_max"] - r["d1_min"] <= 2**layout.BITS // 4
        assert r["d2_max"] - r["d2_min"] <= 2**layout.BITS // 4


def test_pq_codebook_vectors_reconstruct_exactly(spark):
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = embs.count()
    stride = max(1, n // similarity.PQ_K)
    out = similarity.pq_codes(embs).collect()
    assert len(out) == n
    src_ids = {
        j * stride for j in range(similarity.PQ_K) if j * stride < n
    }
    for r in out:
        for i in range(similarity.PQ_M):
            assert 0 <= r[f"code_{i}"] < similarity.PQ_K
        # argmin residual can round to a hair below zero in FP
        assert r["mse"] > -1e-12
        if r["vec_id"] in src_ids:
            # a codebook source vector is its own centroid in every
            # subspace -> exact reconstruction
            assert abs(r["mse"]) < 1e-9
