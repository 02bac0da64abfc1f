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


def test_entry_module_exports_match_registry():
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as ent
    specs = all_specs()
    assert set(ent.queries()) == set(specs)
    assert set(ent.oracle_sql()) == {n for n, s in specs.items()
                                     if s.oracle is not None}
