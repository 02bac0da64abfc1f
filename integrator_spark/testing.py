"""Reusable verification utilities — the driver-mirror comparison as a
library, so external harnesses (and future rounds) don't re-implement
the canonicalization rules.

``compare_with_oracle`` reproduces the t2 gate: run a registered query
and its DuckDB oracle over the same parquet directory, canonicalize
(columns sorted by name, rows sorted by stringified values — the
order-insensitive shape a value-hash sees), and report exact equality.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from .io import TABLES
from .registry import all_specs


def canonical_strings(pdf) -> list[str]:
    """Order-insensitive canonical form of a pandas result frame."""
    if len(pdf) == 0:
        return []
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return sorted(pdf.astype(str).apply("|".join, axis=1).tolist())


@dataclass
class CompareResult:
    name: str
    spark_rows: int
    oracle_rows: int
    exact: bool
    rows_only: bool

    @property
    def ok(self) -> bool:
        return self.rows_only or (self.exact
                                  and self.spark_rows == self.oracle_rows)


def duckdb_connection(sf_dir: str):
    """A DuckDB connection with the fixture views registered exactly as
    the driver registers them."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def compare_with_oracle(spark: SparkSession, sf_dir: str, name: str,
                        con=None) -> CompareResult:
    spec = all_specs()[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        return CompareResult(name, len(spark_pdf), -1, True, rows_only=True)
    own_con = con is None
    if own_con:
        con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(spec.oracle).fetchdf()
    finally:
        if own_con:
            con.close()
    return CompareResult(
        name, len(spark_pdf), len(oracle_pdf),
        canonical_strings(spark_pdf) == canonical_strings(oracle_pdf),
        rows_only=False)
