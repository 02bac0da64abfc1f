"""Numeric expression helpers shared by query programs.

The core trick: cross-engine float determinism. A plain ``SUM(double)``
is order-dependent (Spark's partial aggregation order differs from
DuckDB's vectorized scan order), so two correct engines produce sums
differing in the last bits — enough to break a value-hash comparison.
Summing an exact DECIMAL rendering of each input instead is associative
and therefore bit-identical across engines; casting the final total
back to double keeps the output schema friendly. The per-row
double→DECIMAL(38,6) conversion itself is deterministic because both
engines see identical input doubles and round to the nearest 6-decimal
value (ties have measure zero on this data).

At 100 TB scale this costs nothing extra: decimal sums use the same
partial+final hash aggregation, just with 128-bit accumulators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str) -> Column:
    """Exact, engine-order-independent sum of a double column (as double)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Average built from the exact decimal sum: double/double division of
    bit-identical operands — deterministic across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1))


# DuckDB-side SQL fragments mirroring the helpers above (keep in sync).
def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)"
