"""Schema parity gate: for every oracle-backed query, the Spark result
schema must map 1:1 onto the DuckDB oracle's result schema — the
driver compares schemas, and an INT-vs-BIGINT drift would fail its
gate even when every value matches as a string.
"""

from __future__ import annotations

import pytest

from integrator_spark.registry import all_specs

from .conftest import TEST_SF_DIR

#: Spark simple dtype -> equivalent DuckDB type names.
TYPE_MAP = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP_NS"},
    "date": {"DATE"},
}

SPECS = {n: s for n, s in all_specs().items() if s.oracle is not None}


@pytest.mark.parametrize("name", sorted(SPECS), ids=sorted(SPECS))
def test_schema_types_match_oracle(name, spark, duck):
    spec = SPECS[name]
    sdf = spec.fn(spark, TEST_SF_DIR)
    spark_types = dict(sdf.dtypes)
    duck_types = {row[0]: row[1] for row in
                  duck.execute(f"DESCRIBE {spec.oracle}").fetchall()}
    assert set(spark_types) == set(duck_types), (
        f"{name}: columns {sorted(spark_types)} vs {sorted(duck_types)}")
    mismatches = {}
    for col, stype in spark_types.items():
        allowed = TYPE_MAP.get(stype)
        if allowed is None:
            mismatches[col] = (stype, duck_types[col], "unmapped spark type")
        elif duck_types[col] not in allowed:
            mismatches[col] = (stype, duck_types[col])
    assert not mismatches, f"{name}: type mismatches {mismatches}"
