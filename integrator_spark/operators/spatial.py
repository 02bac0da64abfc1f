"""Spatial radius join via grid-cell bucketing (SURVEY.md §2.3
adjacency — the spatial sibling of the interval/as-of joins).

The scale-defining trick: a pair scan over n points is never all-pairs.
Bucket each point into a square cell whose side equals the search
radius; any pair within the radius must then lie in the same cell or
in one of the 8 neighbors, so candidate generation is an equality join
on cell id with a 9x fan-out on ONE side — shuffle volume 9n, match
cost proportional to real neighbor density, residual filter exact.
This is the planar analog of the banded-LSH / shingle-equality
candidate joins in operators/dedup.py.

Coordinates are planar (x, y in meters). Geographic inputs should be
projected first; keeping the operator trig-free also keeps it
bit-deterministic across engines (sqrt is IEEE-correctly-rounded;
sin/cos are not guaranteed identical between libm implementations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def radius_pairs(points: DataFrame, id_col: str, x_col: str, y_col: str,
                 radius: float) -> DataFrame:
    """All unordered pairs (a < b by id) within Euclidean distance
    <= radius → (id_a, id_b, dist).

    One side keeps its home cell; the other explodes to its 3x3 cell
    neighborhood. Every candidate pair meets exactly once (the home
    cell of b is unique, and a's 9 exploded cells contain it at most
    once), so no post-dedup is needed. Cells shuffle as two longs;
    skewed dense cells split under AQE. Distance is exact:
    sqrt((dx)^2 + (dy)^2) on the original coordinates, not the cell
    grid.
    """
    cell = lambda c: F.floor(F.col(c) / F.lit(float(radius)))  # noqa: E731
    base = points.select(
        F.col(id_col).alias("_id"), F.col(x_col).alias("_x"),
        F.col(y_col).alias("_y"),
        cell(x_col).alias("_cx"), cell(y_col).alias("_cy"))
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    a = (base.withColumn("_o", F.explode(offsets))
         .select(F.col("_id").alias("id_a"), F.col("_x").alias("xa"),
                 F.col("_y").alias("ya"),
                 (F.col("_cx") + F.col("_o.dx")).alias("jx"),
                 (F.col("_cy") + F.col("_o.dy")).alias("jy")))
    b = base.select(F.col("_id").alias("id_b"), F.col("_x").alias("xb"),
                    F.col("_y").alias("yb"), F.col("_cx").alias("jx"),
                    F.col("_cy").alias("jy"))
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    return (a.join(b, ["jx", "jy"])
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(dx * dx + dy * dy <= F.lit(float(radius) ** 2))
            .select("id_a", "id_b",
                    F.sqrt(dx * dx + dy * dy).alias("dist")))
