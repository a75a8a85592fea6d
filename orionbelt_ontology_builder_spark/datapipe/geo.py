"""Geospatial proximity join via grid-cell blocking — the geohash/S2
"encode-then-equi-join" pattern every geo entity-resolution pipeline
uses (e.g. linking business listings or place mentions whose
coordinates differ by GPS noise), expressed as pure DataFrame algebra.

The engine-addition geo family: the reference has no geospatial
surface, but a web-scale KG constructor meets coordinates constantly
(schema.org geo microdata, infobox lat/long), and "same place" is a
*distance* predicate — a theta-join Spark can only do as a cartesian
BroadcastNestedLoopJoin unless it is rewritten as blocking + verify:

1. quantize each point to an integer grid cell of side = ``radius``
   (cell ids are plain ``floor`` arithmetic — the planar equivalent of
   a geohash prefix / S2 cell at fixed level);
2. explode ONE side to its 3x3 cell neighborhood (a 9x fan-out of the
   smaller relation, not a shuffle multiplier: any pair within
   ``radius`` must land in adjacent cells, so the equi-join on
   ``(cell_x, cell_y)`` is a complete candidate generator — same
   pigeonhole shape as ``simhash_pairs``);
3. verify the exact squared distance per candidate only.

Scale shape: the shuffle key is the cell id, so the join is
corpus-size-linear with fan-out bounded by cell population; dense
cities (skew) are visible as hot cells — the ``skew_report`` /
salting machinery applies to the cell key unchanged.  At 100 TB the
cell table is the Iceberg partition key (points written
cell-clustered, the join becomes storage-partitioned).

Bit-stability: distance is kept in DEGREE-SPACE squared form —
``(dx*dx + dy*dy)`` of md5-derived doubles — multiplication/addition
are IEEE-correctly-rounded, so Spark and DuckDB produce the *same
double*, the threshold compare is exact, and no trig appears (a
haversine verify is the one-line drop-in noted in
:func:`grid_proximity_pairs`; it would only move the boundary set).

Synthetic coordinates: the test tables carry no geo columns, so
:func:`synth_points` derives (x, y) deterministically from the
customer key via the portable md5-hex idiom — both engines compute
identical doubles from identical keys (no external data, per the
BASELINE.json rules).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "synth_points",
    "grid_proximity_pairs",
    "grid_proximity_pairs_oracle",
]

#: Planar world box the synthetic points are scattered over.
X_SPAN = 360.0
Y_SPAN = 180.0
#: 2^32 — the md5 32-bit window is scaled by this to land in [0, 1).
_SCALE = float(1 << 32)


def _unit(col: Column, salt: str) -> Column:
    """Deterministic uniform double in [0, 1) from a key column."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_SCALE)


def _unit_sql(expr: str, salt: str) -> str:
    return (
        f"('0x' || substr(md5('{salt}' || {expr}::VARCHAR), 1, 8))::BIGINT"
        f" / {_SCALE!r}::DOUBLE"
    )


def synth_points(customers: DataFrame) -> DataFrame:
    """(id, x, y) — one deterministic planar point per customer."""
    return customers.select(
        F.col("c_custkey").cast("long").alias("id"),
        (_unit(F.col("c_custkey"), "geo-x-") * X_SPAN).alias("x"),
        (_unit(F.col("c_custkey"), "geo-y-") * Y_SPAN).alias("y"),
    )


def _synth_sql() -> str:
    return f"""
pts AS (
  SELECT c_custkey::BIGINT AS id,
         {_unit_sql('c_custkey', 'geo-x-')} * {X_SPAN!r}::DOUBLE AS x,
         {_unit_sql('c_custkey', 'geo-y-')} * {Y_SPAN!r}::DOUBLE AS y
  FROM customer)"""


def grid_proximity_pairs(points: DataFrame, radius: float = 1.0) -> DataFrame:
    """(id_a, id_b, dist2) — all point pairs within ``radius`` (planar
    L2), via 3x3 grid-cell blocking; ``dist2`` is the exact squared
    distance (sqrt adds nothing to the predicate and one more rounding
    step).  Haversine drop-in: replace the verify expression with the
    great-circle formula and size cells by the max latitude scale.

    Each qualifying pair is emitted exactly once: cells partition the
    plane, so ``(a, b)`` with ``id_a < id_b`` matches through the single
    offset equal to their cell-coordinate difference."""
    cell = points.select(
        "id", "x", "y",
        F.floor(F.col("x") / radius).alias("cx"),
        F.floor(F.col("y") / radius).alias("cy"),
    )
    probe = cell.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(
            F.expr(
                "flatten(transform(sequence(-1, 1), dx -> "
                "transform(sequence(-1, 1), dy -> "
                "struct(cx + dx AS cx, cy + dy AS cy))))"
            )
        ).alias("nb"),
    ).select("id_a", "xa", "ya", F.col("nb.cx").alias("cx"), F.col("nb.cy").alias("cy"))
    build = cell.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        "cx", "cy",
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    d2 = dx * dx + dy * dy
    return (
        probe.join(build, ["cx", "cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", d2.alias("dist2"))
        .filter(F.col("dist2") <= F.lit(radius) * F.lit(radius))
        .orderBy("id_a", "id_b")
    )


def grid_proximity_pairs_oracle(radius: float = 1.0) -> str:
    """DuckDB twin over the pre-registered ``customer`` view; the
    all-pairs formulation IS the recall oracle for the blocking —
    identical output proves the 3x3 neighborhood loses no pair."""
    return f"""
WITH {_synth_sql().strip()}
SELECT a.id AS id_a, b.id AS id_b,
       (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
FROM pts a JOIN pts b ON a.id < b.id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= ({radius!r}::DOUBLE * {radius!r}::DOUBLE)
ORDER BY id_a, id_b
"""
