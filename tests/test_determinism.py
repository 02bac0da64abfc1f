"""Run-to-run determinism for the rows-only queries.

Oracle-backed queries get cross-engine exactness checks; the rows-only
set (sketches, ANN, iterative FP, streaming state) has no oracle, so
its weakest point is silent nondeterminism — a seeded sketch that
isn't, an ANN bucket order leaking into output, an iteration whose
result depends on task scheduling. This gate runs every rows-only
query TWICE in the same session and requires byte-identical canonical
results.
"""

from __future__ import annotations

import pytest

from integrator_spark.registry import all_specs

from .conftest import TEST_SF_DIR, canonical

ROWS_ONLY = sorted(n for n, s in all_specs().items() if s.oracle is None)


@pytest.mark.parametrize("name", ROWS_ONLY, ids=ROWS_ONLY)
def test_rows_only_query_is_run_to_run_deterministic(name, spark):
    fn = all_specs()[name].fn
    a = canonical(fn(spark, TEST_SF_DIR).toPandas())
    b = canonical(fn(spark, TEST_SF_DIR).toPandas())
    assert a.columns.tolist() == b.columns.tolist()
    assert a.astype(str).equals(b.astype(str)), \
        f"{name} differs between two runs in one session"
