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


def test_prune_estimate_zorder_beats_worst_single_sort(spark):
    """On a uniform 2-dim key space with a box predicate on BOTH dims,
    the Morton layout's scan fraction is <= the worse single-column
    sort (which cannot skip on its unsorted dimension at all)."""
    import datetime as dt

    from orionbelt_ontology_builder_spark.datapipe import layout as L

    rows = [
        (u, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=17 * i + u))
        for u in range(64)
        for i in range(16)
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["layout"]: r for r in L.prune_estimate(ev).collect()}
    assert set(out) == {"zorder", "sort_d1", "sort_d2"}
    for r in out.values():
        assert r["rows_total"] == len(rows)
        assert 0 <= r["buckets_scanned"] <= r["n_buckets"]
        assert abs(r["scan_fraction"] - r["rows_scanned"] / r["rows_total"]) < 1e-12
    worst_single = max(out["sort_d1"]["scan_fraction"],
                       out["sort_d2"]["scan_fraction"])
    assert out["zorder"]["scan_fraction"] <= worst_single


def test_prune_estimate_full_box_scans_everything(spark):
    import datetime as dt

    from orionbelt_ontology_builder_spark.datapipe import layout as L

    rows = [
        (u, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=u))
        for u in range(32)
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = L.prune_estimate(ev, q1=(0, 255), q2=(0, 255)).collect()
    for r in out:
        assert r["buckets_scanned"] == r["n_buckets"]
        assert abs(r["scan_fraction"] - 1.0) < 1e-12


def test_compaction_plan_ceil_division(spark):
    from orionbelt_ontology_builder_spark.datapipe import layout as L

    rows = [(0, "a" * 100, "s1"), (1, "b" * 100, "s1"), (2, "c" * 10, "s2")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["key"]: r for r in L.compaction_plan(
        df, target_bytes=150).collect()}
    s1 = out["s1"]
    assert s1["est_bytes"] == 200 and s1["recommended_files"] == 2
    assert s1["rows_per_file"] == 1
    s2 = out["s2"]
    # below-target partition still gets (at least) one file
    assert s2["recommended_files"] == 1 and s2["rows_per_file"] == 1
    assert abs(s1["avg_doc_bytes"] - 100.0) < 1e-12


# ------------------------------------------------------------------ #
# dictionary encoding (plans/dictionary.py)
# ------------------------------------------------------------------ #


def test_dictionary_encoding_roundtrip_and_masks(spark):
    from orionbelt_ontology_builder_spark import fixtures as FX
    from orionbelt_ontology_builder_spark.plans import dictionary as D

    t = FX.fixture_triples(spark, "populated_om")
    d = D.dictionary(t)
    enc = D.encode_triples(t)
    audit = D.encoding_audit(t).collect()[0]
    assert audit["n_collisions"] == 0
    assert audit["n_terms"] == d.count()
    assert audit["n_triples"] == t.count()
    # decode law: joining encoded subjects back through the dictionary
    # reproduces the original subject multiset
    dec = (
        enc.join(d.select(F.col("id").alias("s_id"),
                          F.col("term").alias("subj2")), "s_id")
    )
    assert dec.count() == t.count()
    orig = sorted(r["subj"] for r in t.select("subj").collect())
    back = sorted(r["subj2"] for r in dec.select("subj2").collect())
    assert orig == back
    # role masks: a term used as subj and obj carries 1|4
    masks = {r["term"]: r["role_mask"] for r in d.collect()}
    person = FX.BASE + "Person"
    assert masks[person] & 4  # object of rdf:type / subClassOf rows
    assert any(m & 2 for m in masks.values())  # predicates present
