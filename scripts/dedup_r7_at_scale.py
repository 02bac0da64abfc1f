#!/usr/bin/env python
"""Scale curve for the round-7 dedup operators (deterministic MinHash,
containment, incremental MinHash) — same k× inflation protocol as
scripts/scale_curve.py (union with id offsets, which multiplies the
duplicate population too, the realistic load). Sub-quadratic walls are
the pass bar: every one of these is a collide-only candidate join plus
a map-side-combinable signature aggregation, so cost must track tokens
and colliding pairs, not n².

Usage: python scripts/dedup_r7_at_scale.py  (prints a markdown table)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from integrator_spark.io import load_table  # noqa: E402
from integrator_spark.operators.dedup import (  # noqa: E402
    containment_pairs,
    minhash_bands,
    minhash_det_pairs,
    minhash_signatures,
)
from integrator_spark.session import build_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def inflate(df, k: int, n_base: int):
    parts = [df.withColumn("doc_id", F.col("doc_id") + F.lit(i * n_base))
             for i in range(k)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    spark = build_session("dedup-r7-scale")
    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()

    rows = []
    for k in (1, 2, 4):
        d = inflate(docs, k, n_docs)
        t = {}
        out = {}

        t0 = time.perf_counter()
        out["mh_det"] = minhash_det_pairs(d, max_band_freq=50).count()
        t["mh_det"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        out["containment"] = containment_pairs(
            d, threshold=0.9, max_doc_freq=25).count()
        t["containment"] = time.perf_counter() - t0

        # incremental: batch bands vs corpus bands on the 80/20 split
        t0 = time.perf_counter()
        sig = minhash_signatures(d)
        bands = minhash_bands(sig, max_band_freq=50)
        out["mh_incr"] = (
            bands.filter(F.col("doc_id") % 10 >= 8).alias("n")
            .join(bands.filter(F.col("doc_id") % 10 < 8).alias("c"),
                  [F.col("n.band") == F.col("c.band"),
                   F.col("n.val") == F.col("c.val")])
            .select(F.col("n.doc_id"), F.col("c.doc_id"))
            .distinct().count())
        t["mh_incr"] = time.perf_counter() - t0

        rows.append((k, k * n_docs, t, out))
        print(f"k={k} docs={k * n_docs} "
              + " ".join(f"{n}={t[n]:.1f}s/{out[n]}p" for n in t),
              flush=True)

    print("\n| k | docs | minhash_det s | pairs | containment s | pairs "
          "| minhash_incr s | pairs |")
    print("| - | ---- | ------------- | ----- | ------------- | ----- "
          "| -------------- | ----- |")
    for k, nd, t, out in rows:
        print(f"| {k} | {nd} | {t['mh_det']:.1f} | {out['mh_det']} | "
              f"{t['containment']:.1f} | {out['containment']} | "
              f"{t['mh_incr']:.1f} | {out['mh_incr']} |")
    spark.stop()


if __name__ == "__main__":
    main()
