#!/usr/bin/env python
"""Measured ~sf1 run of the headline suite (round-4 verdict item 3:
"no measured run above sf0.1" was the last evidence gap — every scale
claim beyond 600k rows rested on plan shape).

Generates a derived ~10x fixture set under _derived/sf1/ by
deterministic replication of the sf0.1 tables with FK-consistent key
offsets (copy i shifts each key domain by i * (max_key + 1), so join
fan-outs per key match the original — the same shape real TPC-H
scaling has: 10x keys, constant per-key cardinality; nation/region
stay fixed and get 10x the children). Then measures, all in ONE
session:

  - engine headline queries at sf0.1 and at sf1 (median of 3 fresh
    builds each, after a warm-up) -> per-query scaling exponent
    log10(t_sf1 / t_sf0.1): 1.0 = linear, <1 = fixed costs still
    dominate, >1 = superlinear (the red flag the run exists to catch).
  - the naive twins (scripts/baseline_naive.py) at sf1, warmed single
    run, for the <=2x-of-naive gate at sf1. Exception: naive vec_knn is
    an O(n^2) crossJoin that measured 84.9s at n=2000 — at n=20000 that
    extrapolates to ~2.4 HOURS, so it is reported as that extrapolation
    (x100 the measured sf0.1 run) rather than executed; the engine's
    routed plan runs it for real.

Usage: python scripts/bench_sf1.py   (prints markdown + one JSON line)
"""

from __future__ import annotations

import importlib.util
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from integrator_spark.io import derived_dir, load_table  # noqa: E402
from integrator_spark.registry import get_queries  # noqa: E402
from integrator_spark.session import build_session  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = 10

#: table -> columns shifted by copy_index * (max(primary domain) + 1);
#: every column in a group shares its domain's offset so FKs stay valid.
OFFSETS = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {"l_orderkey": "o_orderkey", "l_partkey": "p_partkey",
                 "l_suppkey": "s_suppkey"},
    "events": {"event_id": "event_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
COPY_AS_IS = ["region", "nation"]

HEADLINE = [
    "q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
    "agg_distinct", "window_topn", "rollup_revenue", "events_tumbling",
    "events_json", "docs_wordcount", "vec_knn",
]


def generate_scaled(spark, src: str, out_name: str, copies: int) -> str:
    """FK-consistent deterministic replication of ``src`` into
    ``_derived/<out_name>`` (see module docstring for the offset
    scheme). Composable: sf1 is 10 copies of sf0.1; sf10 is 10 copies
    of sf1 (scripts/bench_sf10.py)."""
    out_root = derived_dir(src, "..", out_name)
    marker = os.path.join(out_root, "_GENERATED")
    if os.path.exists(marker):
        return out_root
    os.makedirs(out_root, exist_ok=True)

    # One shared offset per key DOMAIN (e.g. o_orderkey's domain is used
    # by both orders and lineitem), computed from the owning table.
    domain_owner = {"c_custkey": "customer", "s_suppkey": "supplier",
                    "p_partkey": "part", "o_orderkey": "orders",
                    "event_id": "events", "doc_id": "documents",
                    "vec_id": "embeddings"}
    span = {}
    for dom, tbl in domain_owner.items():
        mx = load_table(spark, src, tbl).agg(F.max(dom)).first()[0]
        span[dom] = int(mx) + 1

    for name in COPY_AS_IS:
        (load_table(spark, src, name).write.mode("overwrite")
         .parquet(os.path.join(out_root, f"{name}.parquet")))

    for name, cols in OFFSETS.items():
        base = load_table(spark, src, name)
        parts = []
        for i in range(copies):
            df = base
            for col, dom in cols.items():
                df = df.withColumn(col, F.col(col) + F.lit(i * span[dom]))
            parts.append(df)
        full = parts[0]
        for p in parts[1:]:
            full = full.unionByName(p)
        (full.write.mode("overwrite")
         .parquet(os.path.join(out_root, f"{name}.parquet")))
        print(f"generated {name}: x{copies}", flush=True)

    with open(marker, "w") as fh:
        fh.write(f"copies={copies} from={src}\n")
    return out_root


def generate(spark) -> str:
    return generate_scaled(spark, SRC, "sf1", COPIES)


def median3(fn) -> float:
    fn().collect()  # warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn().collect()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 3)


def main() -> int:
    spark = build_session("bench-sf1")
    sf1_dir = generate(spark)
    queries = get_queries()

    spec = importlib.util.spec_from_file_location(
        "baseline_naive",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "baseline_naive.py"))
    bn = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bn)
    bn.spark = spark
    naive = bn.QUERIES

    queries["q1_pricing_summary"](spark, SRC).collect()  # session warm-up

    rows = []
    for name in HEADLINE:
        t01 = median3(lambda: queries[name](spark, SRC))
        t1 = median3(lambda: queries[name](spark, sf1_dir))
        if name == "vec_knn":
            n01 = median3(lambda: naive[name](SRC))
            n1 = round(n01 * 100, 1)     # extrapolated O(n^2), see header
            n_note = "extrap"
        else:
            naive[name](sf1_dir).collect()   # warm
            t0 = time.perf_counter()
            naive[name](sf1_dir).collect()
            n1 = round(time.perf_counter() - t0, 3)
            n_note = "measured"
        import math
        exp = round(math.log10(t1 / t01), 2) if t01 > 0 else None
        rows.append({"query": name, "sf0.1_s": t01, "sf1_s": t1,
                     "exponent": exp, "naive_sf1_s": n1,
                     "naive_note": n_note,
                     "ratio_vs_naive": round(t1 / n1, 3)})
        print(f"{name}: sf0.1={t01}s sf1={t1}s exp={exp} "
              f"naive_sf1={n1}s ({n_note})", flush=True)

    print("\n| query | sf0.1 s | sf1 s | exponent | naive sf1 s | engine/naive |")
    print("| ----- | ------- | ----- | -------- | ----------- | ------------ |")
    for r in rows:
        nv = f"{r['naive_sf1_s']}" + (" (extrap)" if r["naive_note"] == "extrap" else "")
        print(f"| {r['query']} | {r['sf0.1_s']} | {r['sf1_s']} | "
              f"{r['exponent']} | {nv} | {r['ratio_vs_naive']} |")
    total01 = round(sum(r["sf0.1_s"] for r in rows), 2)
    total1 = round(sum(r["sf1_s"] for r in rows), 2)
    print(f"\ntotals: sf0.1={total01}s sf1={total1}s "
          f"(x{round(total1 / total01, 2)} wall for x10 data)")
    print(json.dumps({"metric": "sf1_headline", "rows": rows,
                      "total_sf01": total01, "total_sf1": total1}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
