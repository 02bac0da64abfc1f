"""CLI runner: the engine as a user-facing tool.

    python -m integrator_spark list                 # catalog
    python -m integrator_spark run q1_pricing_summary [--sf-dir DIR] [--explain]
    python -m integrator_spark oracle q1_pricing_summary
"""

from __future__ import annotations

import argparse
import sys

from .io import DEFAULT_SF_DIR
from .registry import all_specs
from .session import build_session


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="integrator_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    run = sub.add_parser("run", help="run a query and print the result")
    run.add_argument("query")
    run.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    run.add_argument("--explain", action="store_true",
                     help="print the formatted physical plan instead of rows")
    run.add_argument("--limit", type=int, default=50)

    orc = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    orc.add_argument("query")

    args = ap.parse_args(argv)
    specs = all_specs()

    if args.cmd == "list":
        width = max(len(n) for n in specs)
        for name, s in sorted(specs.items()):
            kind = "oracle   " if s.oracle else "rows-only"
            print(f"{name:{width}s}  {kind}  [{', '.join(s.tags)}]")
        return 0

    if args.query not in specs:
        print(f"unknown query {args.query!r}; try: python -m integrator_spark list",
              file=sys.stderr)
        return 2

    if args.cmd == "oracle":
        sql = specs[args.query].oracle
        print(sql.strip() if sql else f"-- {args.query} is rows-only (no oracle)")
        return 0

    spark = build_session(f"integrator-cli-{args.query}")
    try:
        df = specs[args.query].fn(spark, args.sf_dir)
        if args.explain:
            df.explain(mode="formatted")
        else:
            df.show(args.limit, truncate=False)
            print(f"({df.count()} rows total)")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
