#!/usr/bin/env python
"""Interleaved A/B for the q1 paired-ratio creep (round-8 verdict
item 2: 1.28x r3 -> 1.35x r7 -> 1.49x r8 in bench.py's
sequential protocol).

Protocol: ONE session, engine q1 and naive q1 executed strictly
alternating (E N E N ...) x N_PAIRS, each execution a fresh plan build
+ collect (no shuffle reuse). Alternation means any slow drift in
ambient host load hits both columns equally INSIDE the measurement,
where bench.py's sequential per-query blocks let load shift between
the engine block and the naive block — which is exactly the wobble the
round-over-round ratio showed. Prints one JSON line with both run
vectors, medians, and the interleaved ratio.

Usage: python scripts/q1_interleaved_ab.py [n_pairs]
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
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("q1-interleaved-ab")

    engine = get_queries()["q1_pricing_summary"]

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "baseline_naive",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "baseline_naive.py"))
    bn = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bn)
    bn.spark = spark
    naive = bn.QUERIES["q1_pricing_summary"]

    # Warm both plans once (JIT + IO cache), then interleave.
    engine(spark, sf_dir).collect()
    naive(sf_dir).collect()

    e_runs, n_runs = [], []
    for _ in range(n_pairs):
        t0 = time.perf_counter()
        engine(spark, sf_dir).collect()
        e_runs.append(round(time.perf_counter() - t0, 4))
        t0 = time.perf_counter()
        naive(sf_dir).collect()
        n_runs.append(round(time.perf_counter() - t0, 4))
    spark.stop()

    e_med, n_med = statistics.median(e_runs), statistics.median(n_runs)
    print(json.dumps({
        "metric": "q1_interleaved_ratio",
        "value": round(e_med / n_med, 4),
        "engine_median_sec": e_med,
        "naive_median_sec": n_med,
        "engine_runs": e_runs,
        "naive_runs": n_runs,
        "pairwise_ratios": [round(e / n, 3)
                            for e, n in zip(e_runs, n_runs)],
        "n_pairs": n_pairs,
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
