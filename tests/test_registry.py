"""Registry hygiene: the driver contract surface is well-formed."""

from __future__ import annotations

from integrator_spark.registry import all_specs


def test_every_oracle_key_has_a_query():
    specs = all_specs()
    assert len(specs) >= 80
    for name, spec in specs.items():
        assert spec.fn is not None
        assert spec.doc, f"{name} has no docstring"
        if spec.oracle is not None:
            assert "SELECT" in spec.oracle.upper(), name


def test_every_registered_query_analyzes(spark):
    """Fast zero-execution gate: BUILD every registered query at sf0.001
    and force Catalyst analysis via .schema. Catches NameError /
    missing-import / AnalysisException registration bugs in seconds —
    both round-3 driver failures (dedup_paragraph NameError, the
    unix_micros-on-NTZ analysis error) would have died here. This is
    the pre-snapshot gate: it must stay cheap enough to run before
    EVERY commit that touches a registration.

    Streaming queries are excluded: building them requires starting a
    run (they materialize through a memory sink), which is execution,
    not analysis — tests/test_streaming.py and the oracle gate cover
    them."""
    from integrator_spark.registry import get_queries

    from .conftest import TEST_SF_DIR

    failures = {}
    for name, fn in sorted(get_queries().items()):
        if name.startswith("stream_"):
            continue
        try:
            df = fn(spark, TEST_SF_DIR)
            assert df.schema.fields, f"{name}: empty schema"
        except Exception as e:  # noqa: BLE001 — collect all, report once
            failures[name] = f"{type(e).__name__}: {str(e)[:160]}"
    assert not failures, f"{len(failures)} queries fail analysis: {failures}"


def test_entry_module_exports_match_registry():
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as ent
    specs = all_specs()
    assert set(ent.queries()) == set(specs)
    assert set(ent.oracle_sql()) == {n for n, s in specs.items()
                                     if s.oracle is not None}
