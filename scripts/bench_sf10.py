#!/usr/bin/env python
"""Measured ~sf10 run (round-6 verdict item 3): the first scale on this
box where shuffle/spill genuinely beats fixed session costs — ~60 M
lineitem rows, ~6 M orders, ~1 M events/documents per the fixture
ratios.

Fixtures: _derived/sf10 = 10 FK-consistent copies of _derived/sf1
(itself 10 copies of sf0.1) via bench_sf1.generate_scaled — the same
key-offset scheme, so per-key join fan-outs match real TPC-H scaling.

Measures, all in ONE session (median of 3 fresh builds after a warm-up):
  - the 10 headline queries at sf1 and sf10 -> scaling exponent
    log10(t_sf10 / t_sf1): 1.0 = linear, <1 = sublinear, >1 = the red
    flag this run exists to catch.
  - their naive twins (scripts/baseline_naive.py) at sf10, warmed
    single run, for the <=2x-of-naive gate at sf10. naive vec_knn is an
    O(n^2) crossJoin: at n=200k it extrapolates to ~10,000x the 84.9 s
    measured at n=2k (~10 DAYS), so it is reported as that
    extrapolation, not executed.
  - the five highest-sf1-exponent pack queries (events_outliers_mad,
    graph_assortativity, agg_weighted_median, graph_triangles,
    join_bloom) at sf1 and sf10 -> exponents.

Usage: python scripts/bench_sf10.py   (markdown table + one JSON line)
"""

from __future__ import annotations

import importlib.util
import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from integrator_spark.registry import get_queries  # noqa: E402
from integrator_spark.session import build_session  # noqa: E402

HEADLINE = [
    "q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
    "agg_distinct", "window_topn", "rollup_revenue", "events_tumbling",
    "events_json", "docs_wordcount", "vec_knn",
]
#: graph_triangles is measured separately (sf1 only): its wedge set is
#: 1.48 B at sf1 / 14.8 B at sf10 — the sf10 shuffle (~230 GB spill)
#: exceeds this box's free disk; see SCALING.md round-6 notes.
PACK = [
    "events_outliers_mad", "graph_assortativity", "agg_weighted_median",
    "join_bloom",
]


def _load(name: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def median3(fn) -> float:
    fn().collect()  # warm: JIT, broadcast, file listing
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn().collect()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 3)


def main() -> int:
    bench_sf1 = _load("bench_sf1")
    spark = build_session("bench-sf10")
    # Scale-tier shuffle sizing: with the fixture default of 32 shuffle
    # partitions, sf10's biggest shuffles sort ~60 M rows per task
    # (spill + GC stalls; graph_triangles killed the session's
    # heartbeat). AQE's designed answer: start coalescing from a high
    # initial count — big shuffles keep the parallelism, small ones
    # coalesce back. Measured overhead at sf0.1 is ~7%, which is why
    # this is set here (and in the other *_at_scale scripts), not in
    # the fixture-scale session default.
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
    sf1_dir = bench_sf1.generate(spark)
    sf10_dir = bench_sf1.generate_scaled(spark, sf1_dir, "sf10", 10)
    queries = get_queries()

    bn = _load("baseline_naive")
    bn.spark = spark
    naive = bn.QUERIES

    queries["q1_pricing_summary"](spark, sf1_dir).collect()  # warm-up

    rows = []
    for name in HEADLINE + PACK:
        t1 = median3(lambda: queries[name](spark, sf1_dir))
        t10 = median3(lambda: queries[name](spark, sf10_dir))
        exp = round(math.log10(t10 / t1), 2) if t1 > 0 else None
        row = {"query": name, "sf1_s": t1, "sf10_s": t10, "exponent": exp}
        if name in HEADLINE:
            if name == "vec_knn":
                n01 = median3(lambda: naive[name]("/root/testdata/sf0.1"))
                row["naive_sf10_s"] = round(n01 * 10_000, 1)
                row["naive_note"] = "extrap"
            else:
                naive[name](sf10_dir).collect()   # warm
                t0 = time.perf_counter()
                naive[name](sf10_dir).collect()
                row["naive_sf10_s"] = round(time.perf_counter() - t0, 3)
                row["naive_note"] = "measured"
            row["ratio_vs_naive"] = round(t10 / row["naive_sf10_s"], 3)
        rows.append(row)
        print(f"{name}: sf1={t1}s sf10={t10}s exp={exp}"
              + (f" naive_sf10={row['naive_sf10_s']}s ({row['naive_note']})"
                 f" ratio={row['ratio_vs_naive']}" if name in HEADLINE else ""),
              flush=True)

    print("\n| query | sf1 s | sf10 s | exponent | naive sf10 s | engine/naive |")
    print("| ----- | ----- | ------ | -------- | ------------ | ------------ |")
    for r in rows:
        nv = (f"{r['naive_sf10_s']}" + (" (extrap)" if r.get("naive_note") == "extrap" else "")
              if "naive_sf10_s" in r else "—")
        rat = r.get("ratio_vs_naive", "—")
        print(f"| {r['query']} | {r['sf1_s']} | {r['sf10_s']} | "
              f"{r['exponent']} | {nv} | {rat} |")
    t1_tot = round(sum(r["sf1_s"] for r in rows), 2)
    t10_tot = round(sum(r["sf10_s"] for r in rows), 2)
    print(f"\ntotals: sf1={t1_tot}s sf10={t10_tot}s "
          f"(x{round(t10_tot / t1_tot, 2)} wall for x10 data)")
    print(json.dumps({"metric": "sf10_suite", "rows": rows,
                      "total_sf1": t1_tot, "total_sf10": t10_tot}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
