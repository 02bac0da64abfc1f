"""The in-repo mirror of the driver's t2 gate: every registered query
with an oracle runs in both engines on the same parquet and must match
on columns, row count, and (order-insensitive) values.

Queries without an oracle (rows-only in the driver) still run and must
return a well-formed DataFrame.
"""

from __future__ import annotations

import pytest

from integrator_spark.registry import all_specs

from .conftest import TEST_SF_DIR, assert_frames_match

SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS), ids=sorted(SPECS))
def test_query_matches_oracle(name, spark, duck):
    spec = SPECS[name]
    sdf = spec.fn(spark, TEST_SF_DIR)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        # rows-only: schema is stable and the query executes.
        assert spark_pdf.shape[1] > 0
        return
    oracle_pdf = duck.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, name=name)
