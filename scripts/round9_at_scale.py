#!/usr/bin/env python
"""Measured sf0.1 -> sf1 scaling of the round-9 additions/graduations
(text_bpe_tokenize, vec_ann_lsh deterministic route, ml_logreg GD,
retrieval_rrf).

Same protocol as round8_at_scale.py: median of 3 after a warm-up,
per-query scaling exponent log10(t_sf1 / t_sf0.1); 1.0 = linear,
> 1 superlinear (the red flag). Fixtures via bench_sf1.generate()
(FK-consistent 10x replicas). text_bpe_tokenize is the one BPE-family
query EXPECTED near-linear (its output is per-token; train/encode are
vocabulary-bounded and measured flat in round 8).

Usage: python scripts/round9_at_scale.py
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

#: Default pack; override with `python round9_at_scale.py name [...]`
#: (e.g. the second-wave round-9 entries: graph_kcore_converged
#: ml_impute — NOT vec_ann_lsh_recall, which composes the registered
#: pinned-dial LSH and hits the 3-bit keyspace cliff past ~8k rows).
QUERIES = [
    "text_bpe_tokenize",
    "ml_logreg",
    "retrieval_rrf",
]

SF01 = "/root/testdata/sf0.1"


def ann_signlsh_adaptive(spark, sf_dir):
    """The vec_ann_lsh pipeline at its PRODUCTION dial: band bits from
    signlsh_adaptive_bits(n) instead of the registered query's pinned
    bits=3 (pinned so the static DuckDB oracle can regenerate the
    planes — the family posture since round 8). The pinned 3-bit
    keyspace saturates past ~8k vectors (SCALING.md round-7 inflation
    curve: the bucket join goes quadratic), so the SCALE measurement
    must use the adaptive rule — this is the same operator composition
    as the registered query, bits=None."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from integrator_spark.io import load_table
    from integrator_spark.operators.dedup import (_cosine_residual,
                                                  signlsh_buckets)

    e = load_table(spark, sf_dir, "embeddings")
    buckets = signlsh_buckets(e, dim=64, bits_per_band=None, n_bands=12)
    q = buckets.select("vec_id", "band", "bucket")
    nb = buckets.select(F.col("vec_id").alias("neighbor_id"),
                        "band", "bucket")
    cand = (q.join(nb, ["band", "bucket"])
            .filter(F.col("vec_id") != F.col("neighbor_id"))
            .select("vec_id", "neighbor_id").distinct())
    scored = _cosine_residual(cand, e, e, -1.0, "vec_id", "neighbor_id",
                              "vec_id", "embedding")
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(),
                                             "neighbor_id")
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("vec_id", "neighbor_id",
                    F.col("cos_sim").alias("approx_cos")))


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

    spark = build_session("round9-at-scale")
    sf1_dir = bench_sf1.generate(spark)
    queries = get_queries()

    rows = []
    names = sys.argv[1:] or None
    if names:
        entries = [(n, queries[n]) for n in names]
    else:
        entries = ([(n, queries[n]) for n in QUERIES]
                   + [("vec_ann_lsh(adaptive bits)",
                       ann_signlsh_adaptive)])
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
        "metric": "round9_pack_sf1_total_sec", "value": total1,
        "unit": "sec", "sf01_total": total01,
        "queries": {r[0]: {"sf0.1": r[1], "sf1": r[2], "exp": r[3]}
                    for r in rows}}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
