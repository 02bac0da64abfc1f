#!/usr/bin/env python
"""Exercise the exact-kNN/cosine two-sided routing at REAL routing scale.

The 64M-cell broadcast budget (operators/knn.py::MAX_BROADCAST_CELLS)
was designed for ~1e6 x dim-64 candidate matrices, but until round 5 it
had only ever tripped on synthetic small-budget tests. This script:

1. Generates a deterministic 1.1M x dim-64 embedding table (70.4M cells
   — crosses the real budget) under _derived/bigknn/ via a vectorized
   splitmix64 mix of (vec_id, dim_index). No RNG state, no timestamps:
   same bytes every run.
2. Routes cosine_pairs_exact / knn_exact over it WITHOUT est_cells, so
   the router measures the data itself, and asserts the selected
   physical plan is the cogrouped two-sided one (FlatMapCoGroupsInPandas
   in the executed plan) with the parallelism-aware block count.
3. Runs the job(s) to completion and prints a markdown row for
   SCALING.md (wall seconds, effective GFLOP/s, output rows).

Usage:
    OPENBLAS_NUM_THREADS=1 python scripts/knn_at_scale.py [--knn] [--n N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from integrator_spark.io import derived_dir  # noqa: E402
from integrator_spark.operators.knn import (  # noqa: E402
    MAX_BROADCAST_CELLS,
    cosine_pairs_exact,
    knn_exact,
    route_exact_plan,
)
from integrator_spark.functions.synth import splitmix_vectors  # noqa: E402
from integrator_spark.session import build_session  # noqa: E402


def generate(spark, n: int, dim: int) -> str:
    path = derived_dir("/root/testdata/sf0.1", "bigknn", f"emb_{n}x{dim}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            mat = splitmix_vectors(ids, dim)
            yield pd.DataFrame({"vec_id": ids,
                                "embedding": list(mat)})

    (spark.range(n).repartition(32)
     .mapInPandas(gen, "vec_id long, embedding array<float>")
     .write.mode("overwrite").parquet(path))
    return path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_100_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--threshold", type=float, default=0.88)
    ap.add_argument("--knn", action="store_true",
                    help="also run knn_exact k=1 (doubles the matmul work)")
    args = ap.parse_args()

    spark = build_session("knn-at-scale")
    par = spark.sparkContext.defaultParallelism
    path = generate(spark, args.n, args.dim)
    emb = spark.read.parquet(path)

    cells = args.n * args.dim
    plan, nb = route_exact_plan(args.n, args.dim, min_tasks=par)
    print(f"n={args.n} dim={args.dim} cells={cells / 1e6:.1f}M "
          f"(budget {MAX_BROADCAST_CELLS / 1e6:.0f}M) -> plan={plan} "
          f"n_blocks={nb} (defaultParallelism={par})")
    assert plan == "twosided", "expected the budget to trip at this size"

    rows = []

    df = cosine_pairs_exact(emb, threshold=args.threshold)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in phys, \
        "router did not select the two-sided cogrouped plan"
    print("cosine_pairs_exact: two-sided cogrouped plan CONFIRMED")
    t0 = time.perf_counter()
    n_pairs = df.count()
    wall = time.perf_counter() - t0
    flops = 2.0 * args.n * args.n * args.dim / 2  # unordered: half the matmuls
    rows.append(("cosine_pairs_exact", wall, flops / wall / 1e9, n_pairs))

    if args.knn:
        df = knn_exact(emb, k=1)
        phys = df._jdf.queryExecution().executedPlan().toString()
        assert "FlatMapCoGroupsInPandas" in phys
        print("knn_exact: two-sided cogrouped plan CONFIRMED")
        t0 = time.perf_counter()
        n_out = df.count()
        wall = time.perf_counter() - t0
        flops = 2.0 * args.n * args.n * args.dim
        rows.append(("knn_exact k=1", wall, flops / wall / 1e9, n_out))

    print("\n| operator | n | dim | n_blocks | wall s | eff GFLOP/s | out rows |")
    print("| -------- | - | --- | -------- | ------ | ----------- | -------- |")
    for name, wall, gflops, out in rows:
        print(f"| {name} | {args.n} | {args.dim} | {nb} | {wall:.1f} "
              f"| {gflops:.0f} | {out} |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
