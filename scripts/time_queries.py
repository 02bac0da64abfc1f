#!/usr/bin/env python
"""Isolated per-query medians in ONE warmed session — the round-12
measurement helper for optimization passes: bench.py's sweep mode runs
every query once in a fixed order (so a heavy predecessor's JVM/shuffle
wake can inflate a cheap successor — documented in OPTIMIZATION_r12.md),
while this script times ONLY the queries under study, N runs each, in a
session warmed by q1, and prints per-query run lists + medians as one
JSON line. Same timed action as bench.py (fresh plan build + collect).

Usage: python scripts/time_queries.py <query> [<query> ...] [--runs N]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from integrator_spark.registry import get_queries  # noqa: E402
from integrator_spark.session import build_session  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1]) if "=" in a else runs
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("time-queries")
    qs = get_queries()
    spark.sparkContext.setJobDescription("warm: q1_pricing_summary")
    qs["q1_pricing_summary"](spark, sf_dir).collect()

    out = {}
    for name in args:
        walls = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            walls.append(round(time.perf_counter() - t0, 3))
        out[name] = {"runs": walls, "median": round(statistics.median(walls), 3)}
        print(f"## {name}: median {out[name]['median']} runs {walls}",
              flush=True)
    spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
