"""Spatial queries: grid-bucketed radius join over planar points.

The point set is derived deterministically from customer keys (a
linear-congruential scatter into a 100 km x 100 km plane) so both
engines compute identical coordinates from the shared fixture — the
operator under test is the join, not a geocoder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.spatial import radius_pairs
from ..registry import register

#: meters; also the grid cell side in the operator.
_RADIUS = 2000.0

_PTS_SQL = """
SELECT c_custkey AS id,
       CAST((c_custkey * 48271) % 100000 AS DOUBLE) AS x,
       CAST((c_custkey * 16807 + 12345) % 100000 AS DOUBLE) AS y
FROM customer
"""


@register("spatial_radius_join", oracle=f"""
WITH pts AS ({_PTS_SQL})
SELECT a.id AS id_a, b.id AS id_b,
       ROUND(SQRT((a.x - b.x) * (a.x - b.x)
                  + (a.y - b.y) * (a.y - b.y)), 3) AS dist_m
FROM pts a JOIN pts b ON a.id < b.id
WHERE (a.x - b.x) * (a.x - b.x)
      + (a.y - b.y) * (a.y - b.y) <= {_RADIUS} * {_RADIUS}
""", tags=("spatial", "join"))
def spatial_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All point pairs within 2 km on a derived 100 km planar scatter
    of the customers — the proximity-join primitive (store catchments,
    dedup of near-identical locations, contact tracing).

    The operator (operators/spatial.py radius_pairs) buckets points
    into radius-sized grid cells and equality-joins each point's cell
    against the 3x3 neighborhood of the other side: candidate volume
    tracks real neighbor density (9x fan-out on one side, cells as two
    longs), never all-pairs — same candidate-generation discipline as
    the LSH/shingle dedup joins. The oracle IS the all-pairs
    quadratic join, which is exactly the point: both produce the
    identical pair set, only one survives 10^9 points. Distances stay
    trig-free (planar meters; sqrt is IEEE-exact on both engines) and
    round to mm."""
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 48271) % 100000).cast("double").alias("x"),
        ((F.col("c_custkey") * 16807 + 12345) % 100000)
        .cast("double").alias("y"))
    return (radius_pairs(pts, "id", "x", "y", _RADIUS)
            .select(F.col("id_a"), F.col("id_b"),
                    F.round("dist", 3).alias("dist_m")))
