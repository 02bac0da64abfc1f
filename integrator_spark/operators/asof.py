"""As-of (backward) join — no native Spark primitive (SURVEY.md §2.3).

Semantics: for each left row, attach the payload of the latest right
row in the same key group whose timestamp is <= the left timestamp
(DuckDB ``ASOF LEFT JOIN`` semantics, which the oracle uses).

Spark-first implementation: union the two sides, run one window pass
per key group ordered by (ts, side) carrying the right payload forward
with ``last(..., ignorenulls=True)``, keep the left rows. Cost: one
shuffle of each side on the join keys + a linear window scan — no
range explosion, no driver collect; scales to arbitrarily large sides
(vs. ``merge_asof`` in pandas which would need a single partition).

Caveat (documented, acceptable for deduplicated right sides): payload
columns are carried forward *per column*, so a NULL inside a matched
right row is filled from an older right row. Pre-aggregate the right
side to non-null payloads (as the registered query does) for exact
ASOF semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(left: DataFrame, right: DataFrame, on: list[str],
                       left_ts: str, right_ts: str,
                       right_payload: list[str]) -> DataFrame:
    """Left as-of join: latest right row with right_ts <= left_ts per key."""
    left_cols = [c for c in left.columns if c not in on and c != left_ts]
    l_tag = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in right_payload],
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols],
        *[F.col(c) for c in right_payload],
    )
    unioned = l_tag.unionByName(r_tag)
    # Right rows sort before left rows at equal ts => inclusive (<=) match.
    w = (Window.partitionBy(*on)
         .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = unioned.select(
        *on, "_ts", "_is_left", *left_cols,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_payload],
    )
    return (filled.filter(F.col("_is_left") == 1)
            .drop("_is_left")
            .withColumnRenamed("_ts", left_ts))
