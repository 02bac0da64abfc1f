#!/usr/bin/env python
"""Sign-LSH inflation curve, fixed vs ADAPTIVE band bits (round 8).

Round 7 measured the failure mode: with the fixture dial (3-bit bands,
8 buckets/band) the bucket-equality join saturates once the corpus
passes a few thousand rows and the wall turns quadratic (7.7 s → 39.2 s
over k=1→4 inflation) while the IVF path stays flat. Round 8 makes the
rule CODE (``signlsh_adaptive_bits``: bits = clamp(ceil(log2(n/64)),
3, 20), the default when ``bits_per_band`` is omitted); this script
re-runs the identical k× inflation protocol (sf0.1 embeddings, union
with id offsets — duplicates multiply too) with three columns:

- fixed 3-bit (the measured r7 cliff, kept for comparison),
- AUTO bits (the new default — the wall must flatten),
- semantic_pairs_ivf (the flat reference).

Pairs found differ between dials by design: wider bands collide less
on MID-similarity pairs (the 0.45-threshold tail), while exact
replicas (cos = 1, every plane agrees) always collide — so the auto
dial trades tail recall for the non-quadratic wall, exactly the dial
semantics SCALING.md documents. The replica-recall column checks the
planted duplicates are still all found.

Usage: python scripts/signlsh_inflation.py  (prints a markdown table;
paste into SCALING.md round-8 section)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from integrator_spark.io import load_table  # noqa: E402
from integrator_spark.operators.dedup import (  # noqa: E402
    semantic_pairs_ivf,
    signlsh_adaptive_bits,
    signlsh_pairs,
)
from integrator_spark.session import build_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def inflate(df, k: int, n_base: int):
    parts = [df.withColumn("vec_id", F.col("vec_id") + F.lit(i * n_base))
             for i in range(k)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    spark = build_session("signlsh-inflation")
    emb = load_table(spark, SF_DIR, "embeddings")
    n_emb = emb.count()

    rows = []
    for k in (1, 2, 4, 8):
        e = inflate(emb, k, n_emb).localCheckpoint(eager=True)
        n = k * n_emb
        auto_bits = signlsh_adaptive_bits(n)

        t0 = time.perf_counter()
        p_fixed = signlsh_pairs(e, threshold=0.45, dim=64,
                                bits_per_band=3, n_bands=12).count()
        t_fixed = time.perf_counter() - t0

        t0 = time.perf_counter()
        pairs_auto = signlsh_pairs(e, threshold=0.45, dim=64,
                                   n_bands=12).localCheckpoint(eager=True)
        p_auto = pairs_auto.count()
        t_auto = time.perf_counter() - t0

        # Replica recall: every cross-copy pair of the SAME base vector
        # (id_b = id_a + j*n_emb) has cosine 1 and must always collide.
        planted = (k - 1) * k // 2 * n_emb
        found_rep = (pairs_auto
                     .filter((F.col("id_b") - F.col("id_a")) % n_emb == 0)
                     .count()) if k > 1 else 0

        t0 = time.perf_counter()
        p_ivf = semantic_pairs_ivf(e, threshold=0.45).count()
        t_ivf = time.perf_counter() - t0

        rows.append((k, n, t_fixed, p_fixed, auto_bits, t_auto, p_auto,
                     planted, found_rep, t_ivf, p_ivf))
        print(f"k={k} n={n} fixed3: {t_fixed:.1f}s/{p_fixed}p  "
              f"auto({auto_bits}b): {t_auto:.1f}s/{p_auto}p "
              f"replicas {found_rep}/{planted}  "
              f"ivf: {t_ivf:.1f}s/{p_ivf}p", flush=True)

    print()
    print("| k | rows | signlsh 3bit fixed | pairs | auto bits | "
          "signlsh auto | pairs | replica recall | semantic_ivf | pairs |")
    print("| - | ---- | ---: | ---: | ---: | ---: | ---: | ---: "
          "| ---: | ---: |")
    for (k, n, tf, pf, ab, ta, pa, pl, fr, ti, pi) in rows:
        rec = "n/a" if pl == 0 else f"{fr}/{pl}"
        print(f"| {k} | {n} | {tf:.1f} s | {pf:,} | {ab} | {ta:.1f} s "
              f"| {pa:,} | {rec} | {ti:.1f} s | {pi:,} |")
    spark.stop()


if __name__ == "__main__":
    main()
