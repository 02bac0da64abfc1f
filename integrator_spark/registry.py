"""Query registry — the single source of truth behind ``__spark_entry__``.

Every operator from SURVEY.md §2 registers here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are ANSI-SQL-expressible) a DuckDB oracle SQL string. The
driver's t2 gate walks exactly this mapping.

Determinism discipline (SURVEY.md §5.2):
- alias every computed column identically in Spark and oracle SQL;
- large float sums go through exact DECIMAL accumulation cast back to
  double (bit-identical across engines regardless of partial-agg
  order); small-magnitude ratios/stats are rounded;
- any ordering that feeds a value (collect_list, top-k ties) gets an
  explicit deterministic tie-break.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered views; None => rows-only
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query under ``name`` with optional oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query id: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle,
                                    tags=tags, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    # Import side effect: loading the queries package fills the registry.
    from . import queries  # noqa: F401
    return dict(_REGISTRY)


def get_queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in all_specs().items()}


def get_oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}
