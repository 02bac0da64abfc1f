#!/usr/bin/env python
"""Interleaved A/B for ANY registered query against a stable anchor —
the generalization of scripts/q1_interleaved_ab.py the round-9 verdict
asked for (watch item: dedup_minhash_det 1.35 s r8 -> 1.71 s r9 in
bench.py's sequential protocol, the one headline entry moving the
wrong way two rounds running).

bench.py times queries in sequential blocks, so ambient host load can
shift between one round's block and the next round's — a
round-over-round wall comparison confounds the query with the host.
This protocol removes the confound: ONE session, the target query and
an anchor query executed strictly alternating (T A T A ...) x N_PAIRS,
each execution a fresh plan build + collect. Ambient drift hits both
columns equally inside the measurement, so the TARGET/ANCHOR ratio is
the round-stable constant to compare across sessions (the anchor
defaults to q1_pricing_summary, whose own engine/naive constant is
pinned at 1.20x in BASELINE.md).

Usage: python scripts/query_interleaved_ab.py <query> [anchor] [n_pairs]
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
    target_name = sys.argv[1] if len(sys.argv) > 1 else "dedup_minhash_det"
    anchor_name = sys.argv[2] if len(sys.argv) > 2 else "q1_pricing_summary"
    n_pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("query-interleaved-ab")

    qs = get_queries()
    target, anchor = qs[target_name], qs[anchor_name]

    # Warm both plans once (JIT + IO cache), then interleave.
    target(spark, sf_dir).collect()
    anchor(spark, sf_dir).collect()

    t_runs, a_runs = [], []
    for _ in range(n_pairs):
        t0 = time.perf_counter()
        target(spark, sf_dir).collect()
        t_runs.append(round(time.perf_counter() - t0, 4))
        t0 = time.perf_counter()
        anchor(spark, sf_dir).collect()
        a_runs.append(round(time.perf_counter() - t0, 4))
    spark.stop()

    t_med, a_med = statistics.median(t_runs), statistics.median(a_runs)
    print(json.dumps({
        "metric": f"{target_name}_vs_{anchor_name}_interleaved",
        "value": round(t_med / a_med, 4),
        "target_median_sec": t_med,
        "anchor_median_sec": a_med,
        "target_runs": t_runs,
        "anchor_runs": a_runs,
        "pairwise_ratios": [round(t / a, 3)
                            for t, a in zip(t_runs, a_runs)],
        "n_pairs": n_pairs,
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
