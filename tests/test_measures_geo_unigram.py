"""Unit tests for the session-16 operators: grid proximity join,
quantity/temporal literal mining, unigram-style vocab pruning.

(The Spark-vs-DuckDB differential runs automatically through
``test_oracle_parity.py`` — these tests pin the semantics on crafted
inputs where the sf0.001 tables are too sparse, e.g. the geo join
finds zero pairs at 150 points.)
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from orionbelt_ontology_builder_spark.datapipe import geo, unigram
from orionbelt_ontology_builder_spark.operators import measures


# --------------------------------------------------------------------- #
# geo
# --------------------------------------------------------------------- #


def _pairs_brute(pts, radius):
    out = []
    for i, (ia, xa, ya) in enumerate(pts):
        for ib, xb, yb in pts[i + 1:]:
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= radius * radius:
                a, b = sorted((ia, ib))
                out.append((a, b))
    return sorted(out)


@pytest.fixture(scope="module")
def dense_points(spark):
    # a crafted cluster plus isolated points, spanning cell borders
    rows = [
        (1, 10.1, 10.1), (2, 10.4, 10.3), (3, 10.95, 10.05),
        (4, 11.05, 10.1),          # across the cell border from 3
        (5, 50.0, 50.0),           # isolated
        (6, 10.1, 11.05),          # near 1 across the y cell border
        (7, 200.0, 100.0), (8, 200.7, 100.7),  # diagonal, dist ~0.99
    ]
    return spark.createDataFrame(rows, "id long, x double, y double")


def test_grid_pairs_match_brute_force(spark, dense_points):
    got = sorted(
        (r.id_a, r.id_b)
        for r in geo.grid_proximity_pairs(dense_points, radius=1.0).collect()
    )
    rows = [(r.id, r.x, r.y) for r in dense_points.collect()]
    assert got == _pairs_brute(rows, 1.0)
    assert (7, 8) in got  # diagonal pair just inside the radius
    assert all(5 not in p for p in got)


def test_grid_pairs_cross_cell_border(spark, dense_points):
    got = {(r.id_a, r.id_b) for r in
           geo.grid_proximity_pairs(dense_points, radius=1.0).collect()}
    assert (3, 4) in got  # adjacent cells, distance 0.1
    assert (1, 6) in got  # adjacent cells on the y axis


def test_grid_pairs_emitted_once(spark, dense_points):
    df = geo.grid_proximity_pairs(dense_points, radius=1.0)
    rows = [(r.id_a, r.id_b) for r in df.collect()]
    assert len(rows) == len(set(rows))


def test_synth_points_deterministic_and_in_box(spark):
    cust = spark.range(1, 50).select(F.col("id").alias("c_custkey"))
    a = {(r.id, r.x, r.y) for r in geo.synth_points(cust).collect()}
    b = {(r.id, r.x, r.y) for r in geo.synth_points(cust).collect()}
    assert a == b
    assert all(0 <= x < geo.X_SPAN and 0 <= y < geo.Y_SPAN for _, x, y in a)


# --------------------------------------------------------------------- #
# measures
# --------------------------------------------------------------------- #


def test_quantity_normalization(spark):
    sents = spark.createDataFrame(
        [(0, "the span is 2.5 km long"), (1, "weighs 340 g exactly"),
         (2, "nothing numeric here"), (3, "clocked at 3.2 ghz")],
        "sent_id int, text string",
    )
    rows = {r.sent_id: r for r in measures.quantity_mentions(sents).collect()}
    assert rows[0].si_value == 2500.0 and rows[0].si_unit == "m"
    assert math.isclose(rows[1].si_value, 0.34) and rows[1].si_unit == "kg"
    assert rows[3].si_value == 3.2e9 and rows[3].si_unit == "hz"
    assert 2 not in rows


def test_quantity_longest_unit_wins(spark):
    # "mhz" must not lex as bare "m"
    sents = spark.createDataFrame(
        [(0, "runs at 800 mhz sustained")], "sent_id int, text string"
    )
    r = measures.quantity_mentions(sents).collect()[0]
    assert r.unit == "mhz" and r.si_value == 8e8


def test_temporal_precedence_and_open_ends(spark):
    sents = spark.createDataFrame(
        [
            (0, "ran from 1998 to 2004 and again in 2010"),  # range wins
            (1, "operating since 2015 without pause"),
            (2, "valid until 2030 only"),
            (3, "built in 1969"),
            (4, "no cue"),
        ],
        "sent_id int, text string",
    )
    rows = {r.sent_id: r for r in measures.temporal_scopes(sents).collect()}
    assert (rows[0].start_year, rows[0].end_year, rows[0].cue) == (1998, 2004, "range")
    assert (rows[1].start_year, rows[1].end_year) == (2015, None)
    assert (rows[2].start_year, rows[2].end_year) == (None, 2030)
    assert (rows[3].start_year, rows[3].end_year) == (1969, 1969)
    assert 4 not in rows


# --------------------------------------------------------------------- #
# unigram
# --------------------------------------------------------------------- #


def test_compositions_bounded_and_exact():
    # tribonacci-family counts for parts <= 4
    want = [1, 2, 4, 8, 15, 29, 56, 108]
    got = [len(unigram._compositions(n, 4)) for n in range(1, 9)]
    assert got == want
    for parts in unigram._compositions(6, 4):
        assert sum(parts) == 6 and all(1 <= p <= 4 for p in parts)


def test_unigram_vocab_properties(spark):
    docs = spark.createDataFrame(
        [(i, "the cat chased the cat and the dog") for i in range(3)]
        + [(9, "catalog catalog catalog")],
        "doc_id long, text string",
    )
    out = unigram.unigram_vocab(docs, keep_k=(20, 10), out_k=40)
    rows = out.collect()
    pieces = {r.piece for r in rows}
    # ranks are 1..n without gaps, ordered by (usage desc, piece)
    ranks = [r.rank for r in rows]
    assert ranks == list(range(1, len(rows) + 1))
    usages = [(-r.usage, r.piece) for r in rows]
    assert usages == sorted(usages)
    # frequent words survive as whole pieces or large chunks
    assert any(len(p) >= 3 for p in pieces)
    # the totality guarantee: vocabulary contains single chars
    assert any(len(p) == 1 for p in pieces)


def test_unigram_prefers_fewer_pieces(spark):
    # "abcd" appears often; with maxpiece=4 the whole word must be one
    # piece in its own segmentation (1 part beats any split).
    docs = spark.createDataFrame(
        [(i, "abcd abcd abcd xyz") for i in range(5)],
        "doc_id long, text string",
    )
    out = unigram.unigram_vocab(docs, keep_k=(10, 6), out_k=20).collect()
    by_piece = {r.piece: r.usage for r in out}
    # 'abcd' used once per occurrence (15 occurrences)
    assert by_piece.get("abcd") == 15
