#!/usr/bin/env python
"""Hamming family past sf1 (round-10 verdict item 5): measure the
ladder's ACTUAL crossovers at 2k / 20k / 200k vectors instead of
arguing them.

The ladder (operators/dedup.py, queries/vectors2.py):
  1. fused broadcast popcount kernel (hamming_topk_scan) — exhaustive
     top-k; per-query cost LINEAR in n, so the all-pairs face is
     quadratic: the rung you ride while n_queries x n stays a scan.
  2. relational word-join shortlist — same exhaustive contract past
     the driver-payload budget (already measured 46.6 s at 20k/48-bit
     in SCALING.md round 10 — strictly dominated, kept as fallback).
  3. multi-index Hamming (vec_hamming_mih_adaptive) — the INDEXED
     rung: radius search whose candidate volume tracks chunk-bucket
     collisions (~n_chunks * n^2 / 2^w; the adaptive dial holds
     2^w >= n/32, so ~32 * n_chunks * n), the only rung whose
     all-pairs cost stays ~linear.

Corpora: the REAL sf0.1 embeddings (2k), _derived/sf1 (20k, the
FK-offset x10 — comparable to the existing SCALING sf1 rows), and a
200k DISTINCT clustered corpus from the ann_at_scale splitmix recipe
(the r7 1.1M-vector protocol; offset replication would hand every
vector 99 exact clones and turn the radius search degenerate).

Measured per corpus:
  - fused kernel, all-pairs face (192-bit x top-64): FULL wall at 2k
    and 20k; at 200k the all-pairs face is ~100x the 20k wall by
    shape, so it is measured as a 2,000-query SERVING batch (the
    honest production shape — `queries=` arg) and the all-pairs wall
    reported as that per-query cost x n (extrapolation, labeled).
  - MIH adaptive, FULL all-pairs radius search: wall + candidate-pair
    count + the dial it chose.
  - the saturated int64 dial's candidate count at 200k (computed from
    bucket occupancies, not run) — the number that motivated wide
    codes.

Usage: python scripts/hamming_at_scale.py [--skip-200k]
Emits markdown rows for SCALING.md + one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

os.environ.setdefault(
    "PYSPARK_SUBMIT_ARGS",
    "--conf spark.ui.showConsoleProgress=false pyspark-shell")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from integrator_spark.io import derived_dir, load_table  # noqa: E402
from integrator_spark.operators.dedup import (hamming_topk_scan,  # noqa: E402
                                              mih_adaptive_dial)
from integrator_spark.queries.vectors2 import (_TOP_M, _TOPK_BITS,  # noqa: E402
                                               _WORD_BITS,
                                               _mih_radius_pairs)
from integrator_spark.session import build_session  # noqa: E402

SF01 = "/root/testdata/sf0.1"


def gen_embeddings(spark, copies: int, out_name: str) -> str:
    """vec_id-offset replication of the sf0.1 embeddings (the
    bench_sf1.generate_scaled scheme, embeddings only)."""
    out_root = derived_dir(SF01, "..", out_name)
    path = os.path.join(out_root, "embeddings.parquet")
    marker = os.path.join(out_root, "_GENERATED_EMB")
    if os.path.exists(marker):
        return out_root
    os.makedirs(out_root, exist_ok=True)
    base = load_table(spark, SF01, "embeddings")
    span = int(base.agg(F.max("vec_id")).first()[0]) + 1
    full = None
    for i in range(copies):
        part = base.withColumn("vec_id", F.col("vec_id") + F.lit(i * span))
        full = part if full is None else full.unionByName(part)
    full.repartition(32).write.mode("overwrite").parquet(path)
    open(marker, "w").write(f"copies={copies}\n")
    return out_root


def gen_clustered(spark, n: int, out_name: str) -> str:
    """DISTINCT clustered synthetic corpus, the ann_at_scale recipe
    (splitmix latent clusters + per-id noise, unit-normalized)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ann_at_scale",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "ann_at_scale.py"))
    ann = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ann)
    import numpy as np
    import pandas as pd

    out_root = derived_dir(SF01, "..", out_name)
    path = os.path.join(out_root, "embeddings.parquet")
    marker = os.path.join(out_root, "_GENERATED_EMB")
    if os.path.exists(marker):
        return out_root
    os.makedirs(out_root, exist_ok=True)
    lat = ann.splitmix_vectors(np.arange(ann.LATENT) + 7_000_000,
                               ann.DIM).astype(np.float64)
    lat /= np.linalg.norm(lat, axis=1, keepdims=True)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            noise = ann.splitmix_vectors(ids, ann.DIM).astype(np.float64)
            mat = ann.ALPHA * lat[ids % ann.LATENT] + noise
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            yield pd.DataFrame({"vec_id": ids,
                                "embedding": list(mat)})

    (spark.range(n).repartition(32)
     .mapInPandas(gen, "vec_id long, embedding array<double>")
     .write.mode("overwrite").parquet(path))
    open(marker, "w").write(f"n={n} clustered\n")
    return out_root


def median3(fn) -> float:
    fn()
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    return round(statistics.median(walls), 3)


def main() -> int:
    skip_200k = "--skip-200k" in sys.argv
    spark = build_session("hamming-at-scale")
    rows = []
    out: dict = {"metric": "hamming_at_scale", "corpora": {}}

    corpora = [("2k", SF01)]
    corpora.append(("20k", gen_embeddings(spark, 10, "sf1")))
    if not skip_200k:
        corpora.append(("200k", gen_clustered(spark, 200_000,
                                              "sf10_embeddings")))

    for label, sf_dir in corpora:
        e = spark.read.parquet(
            os.path.join(sf_dir, "embeddings.parquet"))
        n = e.count()
        rec: dict = {"n": n}

        # --- rung 1: fused exhaustive top-k ---------------------------
        if n <= 25_000:
            w = median3(lambda: hamming_topk_scan(
                e, n_bits=_TOPK_BITS, word_bits=_WORD_BITS,
                m=_TOP_M).count())
            rec["fused_allpairs_sec"] = w
            rows.append((f"hamming fused all-pairs ({label})", w, ""))
        else:
            q_batch = e.filter(F.col("vec_id") % (n // 2000) == 0)
            nq = q_batch.count()
            w = median3(lambda: hamming_topk_scan(
                e, n_bits=_TOPK_BITS, word_bits=_WORD_BITS, m=_TOP_M,
                queries=q_batch).count())
            rec["fused_serving_batch_sec"] = w
            rec["fused_serving_batch_queries"] = nq
            rec["fused_allpairs_extrapolated_sec"] = round(w * n / nq, 1)
            rows.append((f"hamming fused {nq}-query batch ({label})",
                         w, f"all-pairs extrapolates to "
                            f"~{rec['fused_allpairs_extrapolated_sec']} s"))

        # --- rung 3: MIH adaptive, full radius search ------------------
        n_chunks, width = mih_adaptive_dial(n, radius=7)
        rec["mih_dial"] = [n_chunks, width]
        pairs = _mih_radius_pairs(e, n_chunks=n_chunks,
                                  chunk_bits=width, radius=7)
        w = median3(pairs.count)
        rec["mih_allpairs_sec"] = w
        rec["mih_pairs_found"] = pairs.count()
        # candidate volume: chunk-bucket collisions (the quantity the
        # dial bounds) — sum over (chunk, value) buckets of nb*(nb-1)/2
        from integrator_spark.operators.dedup import (
            hamming_signatures, hamming_signatures_wide)
        if n_chunks * width <= 62:
            sig = hamming_signatures(e, dim=64, n_bits=n_chunks * width)
            idx = sig.select(*[
                (F.shiftright("sig", width * c)
                 .bitwiseAND(F.lit(2 ** width - 1))).alias(f"c{c}")
                for c in range(n_chunks)])
            parts = [idx.groupBy(F.lit(c).alias("c"),
                                 F.col(f"c{c}").alias("v"))
                     .agg(F.count(F.lit(1)).alias("nb"))
                     for c in range(n_chunks)]
        else:
            sigw = hamming_signatures_wide(e, dim=64,
                                           n_bits=n_chunks * width,
                                           word_bits=width)
            parts = [sigw.select(F.posexplode("sigs").alias("c", "v"))
                     .groupBy("c", "v").agg(F.count(F.lit(1)).alias("nb"))]
        cand = 0
        for p in parts:
            cand += int(p.agg(F.sum(F.expr("nb * (nb - 1) / 2")))
                        .first()[0] or 0)
        rec["mih_candidate_pairs"] = cand
        rows.append((f"MIH adaptive {n_chunks}x{width}-bit ({label})", w,
                     f"{rec['mih_pairs_found']} pairs, "
                     f"{cand:,} candidates"))

        # the saturated int64 dial's candidate count (not run)
        if n >= 100_000:
            sig7 = hamming_signatures(e, dim=64, n_bits=56)
            idx7 = sig7.select(*[
                (F.shiftright("sig", 7 * c).bitwiseAND(F.lit(127)))
                .alias(f"c{c}") for c in range(8)])
            cand7 = 0
            for c in range(8):
                cand7 += int(idx7.groupBy(F.col(f"c{c}"))
                             .agg(F.count(F.lit(1)).alias("nb"))
                             .agg(F.sum(F.expr("nb * (nb - 1) / 2")))
                             .first()[0] or 0)
            rec["mih_int64cap_candidate_pairs"] = cand7
            rows.append((f"MIH saturated 8x7-bit dial ({label})", None,
                         f"{cand7:,} candidates (why wide codes exist)"))

        out["corpora"][label] = rec

    print("\n| measurement | wall s | note |")
    print("| --- | ---: | --- |")
    for name, w, note in rows:
        print(f"| {name} | {'' if w is None else w} | {note} |")
    print()
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
