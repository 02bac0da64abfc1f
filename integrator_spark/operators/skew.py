"""Skew-mitigation helpers (SURVEY.md §4 item 3).

AQE's skew-join splitting covers joins; for *aggregations* over a few
pathologically hot keys, two-phase salted aggregation keeps every
reducer bounded: shuffle once on (key, salt) — fan-out controlled by
``buckets`` — then once more on the tiny (key) domain. Any exactly
associative aggregate (counts, decimal sums, min/max) re-aggregates
losslessly, so results are bit-identical to the unsalted plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(df: DataFrame, keys: list[str], salt_on: str,
                     aggs: dict[str, tuple[Column, Column]],
                     buckets: int = 8) -> DataFrame:
    """Two-phase aggregation with a deterministic salt.

    ``aggs`` maps output name -> (phase1 aggregate over raw rows,
    phase2 re-aggregate over the per-salt partials, referring to the
    phase-1 output column by name).
    ``salt_on`` must be a high-cardinality column (the salt is a hash
    of it, so reruns are deterministic — no rand()).
    """
    salt = F.pmod(F.hash(F.col(salt_on)), F.lit(buckets)).alias("_salt")
    partial = (df.groupBy(*keys, salt)
               .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()]))
    return (partial.groupBy(*keys)
            .agg(*[re_expr.alias(name) for name, (_, re_expr) in aggs.items()]))
