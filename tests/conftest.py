"""Shared fixtures: one SparkSession per test run + a DuckDB oracle
connection with the fixture views registered (mirroring the driver)."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from integrator_spark.io import TABLES  # noqa: E402
from integrator_spark.session import build_session  # noqa: E402

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = build_session("integrator-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{TEST_SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by stringified values — the same
    order-insensitive shape the driver hashes."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        key = df.astype(str).agg("\x00".join, axis=1)
        df = df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True)
    return df


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
                        name: str = "", float_rtol: float = 0.0) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs "
        f"{sorted(oracle_pdf.columns)}")
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}")
    a, b = canonical(spark_pdf), canonical(oracle_pdf)
    for col in a.columns:
        av, bv = a[col], b[col]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float).to_numpy()
            bv = bv.astype(float).to_numpy()
            both_nan = np.isnan(av) & np.isnan(bv)
            exact = np.array_equal(av, bv) or bool(both_nan.all() and
                                                   np.array_equal(av[~both_nan], bv[~both_nan]))
            if not exact:
                # Not bit-identical — report how far off (determinism audit).
                diff = np.nanmax(np.abs(av - bv))
                assert np.allclose(av, bv, rtol=max(float_rtol, 1e-9),
                                   atol=1e-12, equal_nan=True), (
                    f"{name}.{col}: float mismatch, max abs diff {diff}")
                print(f"WARN {name}.{col}: floats match only within "
                      f"tolerance (max abs diff {diff}) — hash-fragile")
        else:
            assert av.astype(str).tolist() == bv.astype(str).tolist(), (
                f"{name}.{col}: value mismatch\nspark: {av.head(20)}\n"
                f"oracle: {bv.head(20)}")
