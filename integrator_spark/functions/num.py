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

Precision choice (measured at sf0.1, q1-shaped agg, median of 5):
decimal(38,6) sums cost ~3.1x a double sum, decimal(18,6) ~2.8x —
the per-row cast is long-backed (compact) at <=18 digits. The Spark
side therefore uses DECIMAL(18,6): per-row values must fit 1e12, and
the sum accumulator is DECIMAL(28,6) (capacity ~1e22 — a 100 TB table
of 1e12 rows x 1e7-magnitude values totals ~1e19, comfortably inside).
The DuckDB oracle side keeps DECIMAL(38,6); both render the same
6-decimal values, so totals are bit-identical. A fixed-point LONG
accumulator would be ~1.8x faster still but overflows at ~9e12 in
micro-units — unacceptable at scale, so it is deliberately not used.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


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
