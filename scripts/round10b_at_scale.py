#!/usr/bin/env python
"""Measured sf0.1 -> sf1 scaling of the round-10 third-wave additions
(the Hamming ANN family, the one-pass closed-form ML pair, and the
deterministic NN-Descent twin).

Same protocol as round9_at_scale.py: median of 3 after a warm-up,
per-query scaling exponent log10(t_sf1 / t_sf0.1); 1.0 = linear,
> 1 superlinear. Fixtures via bench_sf1.generate() (FK-consistent 10x
replicas: 2k -> 20k embeddings, 500k -> 5M lineitem).

Expectations going in (the point of the run is to check them):
- vec_hamming_topk is the brute face — pairs grow 100x for 10x rows,
  so exponent ~2 is the HONEST number (same posture as
  vec_knn_bruteforce); the popcount scan's constant is what makes it
  usable far past where the float crossJoin dies.
- vec_hamming_mih is the indexed face — candidates track chunk-bucket
  collisions. At 20k rows the fixture-pinned 4-bit chunks saturate
  (16-key space), so the measurement ALSO runs a width-scaled variant
  (6-bit chunks, 8 of them, radius 7) to show the production dial —
  the same pinned-vs-adaptive split as vec_ann_lsh / _adaptive.
- ml_ridge / ml_tree_stump are single aggregation passes — exponent
  well under 1 (fixed Spark overheads dominate at these sizes).
- vec_ann_graph_det candidate volume is n*k^2 per round — linear in
  n at fixed k, so exponent ~1 with a JVM-dot constant.

Usage: python scripts/round10b_at_scale.py [query ...]
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

QUERIES = [
    "ml_ridge",
    "ml_tree_stump",
    "vec_hamming_topk",
    "vec_hamming_mih",
    "vec_ann_graph_det",
]

SF01 = "/root/testdata/sf0.1"


def hamming_mih_scaled(spark, sf_dir):
    """vec_hamming_mih at the production width dial: 8 chunks x 6
    bits (radius-7 guarantee) instead of the fixture-pinned 12 x 4 —
    chunk width tracks log2(n) so the per-chunk keyspace (64) stays
    selective as the corpus grows. Same operator composition; the
    registered query pins narrow chunks only so the static oracle
    reaches the fixture's tightest pairs (Hamming 6-11)."""
    from pyspark.sql import functions as F

    from integrator_spark.io import load_table
    from integrator_spark.operators.dedup import (_cosine_residual,
                                                  hamming_signatures)

    n_chunks, chunk_bits, radius = 8, 6, 7
    e = load_table(spark, sf_dir, "embeddings")
    sig = hamming_signatures(e, dim=64, n_bits=n_chunks * chunk_bits)
    idx = sig.select(
        "vec_id",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("c"),
                     (F.shiftright("sig", chunk_bits * c)
                      .bitwiseAND(F.lit(2 ** chunk_bits - 1)))
                     .alias("chunk_val"))
            for c in range(n_chunks)])).alias("ch"))
    idx = idx.select("vec_id", F.col("ch.c").alias("c"),
                     F.col("ch.chunk_val").alias("chunk_val"))
    probe = idx.select(F.col("vec_id").alias("neighbor_id"), "c",
                       "chunk_val")
    cand = (idx.join(probe, ["c", "chunk_val"])
            .filter(F.col("vec_id") < F.col("neighbor_id"))
            .select("vec_id", "neighbor_id").distinct())
    sa = sig.select("vec_id", F.col("sig").alias("_sa"))
    sb = sig.select(F.col("vec_id").alias("neighbor_id"),
                    F.col("sig").alias("_sb"))
    within = (cand.join(F.broadcast(sa), "vec_id")
              .join(F.broadcast(sb), "neighbor_id")
              .withColumn("hamming",
                          F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
                          .cast("int"))
              .filter(F.col("hamming") <= radius)
              .select("vec_id", "neighbor_id", "hamming"))
    scored = _cosine_residual(
        within.select("vec_id", "neighbor_id"), e, e, -2.0,
        "vec_id", "neighbor_id", "vec_id", "embedding")
    return (within.join(scored, ["vec_id", "neighbor_id"])
            .select("vec_id", "neighbor_id", "hamming",
                    F.col("cos_sim").alias("pair_cos")))


def median3(fn) -> float:
    fn().collect()  # warm: JIT, broadcast, file listing
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn().collect()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 3)


def main() -> int:
    spec = importlib.util.spec_from_file_location(
        "bench_sf1",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_sf1.py"))
    bench_sf1 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_sf1)

    spark = build_session("round10b-at-scale")
    sf1_dir = bench_sf1.generate(spark)
    queries = get_queries()

    rows = []
    names = sys.argv[1:] or None
    if names:
        entries = [(n, queries[n]) for n in names]
    else:
        entries = ([(n, queries[n]) for n in QUERIES]
                   + [("vec_hamming_mih(8x6-bit chunks)",
                       hamming_mih_scaled)])
    for name, q in entries:
        t01 = median3(lambda: q(spark, SF01))
        t1 = median3(lambda: q(spark, sf1_dir))
        exp = round(math.log10(t1 / t01), 2) if t01 > 0 else None
        rows.append((name, t01, t1, exp))
        print(f"{name}: sf0.1 {t01}s  sf1 {t1}s  exponent {exp}",
              flush=True)

    print("\n| query | sf0.1 s | sf1 s | scaling exponent |")
    print("| --- | ---: | ---: | ---: |")
    for name, t01, t1, exp in rows:
        print(f"| {name} | {t01} | {t1} | {exp} |")
    total01 = round(sum(r[1] for r in rows), 2)
    total1 = round(sum(r[2] for r in rows), 2)
    print(f"| **total** | **{total01}** | **{total1}** | "
          f"**{round(math.log10(total1 / total01), 2)}** |")
    print(json.dumps({
        "metric": "round10b_pack_sf1_total_sec", "value": total1,
        "unit": "sec", "sf01_total": total01,
        "queries": {r[0]: {"sf0.1": r[1], "sf1": r[2], "exp": r[3]}
                    for r in rows}}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
