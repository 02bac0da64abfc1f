"""Scale measurement for the round-12 image near-dup family.

Two measurements:

1. The REGISTERED 56-bit pipeline (paint -> decode -> dHash -> 8-bit
   chunk MIH) at sf0.01 and sf0.1 — honest about its fixture-dial
   limit: the 37-group fixture makes output pairs grow ~n^2/37 and
   8-bit chunks saturate past ~100k images, which is exactly why the
   wide face exists.

2. The PRODUCTION dial (mih_radius_pairs_codes_wide: 256-bit codes as
   8 x 32-bit word-chunks, radius 7) over synthetic corpora with
   PLANTED bounded duplicates (every 10th id is a 1-bit-flipped copy
   of its predecessor — dup clusters of size 2, the realistic shape
   where near-dup populations track corpus size, not group count).
   Codes are generated JVM-side (xxhash64 words), so the measurement
   isolates the dedup operator. Pass bar: sub-quadratic wall
   (exponent ~1 in n), found pairs ~= n/10.

Usage: python scripts/image_dedup_at_scale.py [n ...]
       (default 250_000 1_000_000 4_000_000)
"""
from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from integrator_spark.operators.dedup import \
    mih_radius_pairs_codes_wide  # noqa: E402
from integrator_spark.registry import get_queries  # noqa: E402
from integrator_spark.session import build_session  # noqa: E402

WORD_BITS, N_WORDS, RADIUS = 32, 8, 7
MASK = (1 << WORD_BITS) - 1


def planted_codes(spark, n: int):
    """(doc_id, words): xxhash64-derived 8 x 32-bit words; ids with
    id % 10 == 9 copy id-1's code with ONE bit (id % 256) flipped."""
    base = (F.col("id") - F.when(F.col("id") % 10 == 9, 1).otherwise(0))
    flip_bit = F.col("id") % (N_WORDS * WORD_BITS)
    # 2^(bit%32) via pow: exact as a double up to 2^31, so the cast
    # back to long is lossless (shiftleft needs a literal shift count)
    flip_mask = F.pow(F.lit(2.0), (flip_bit % WORD_BITS)
                      .cast("double")).cast("long")
    cols = []
    for w in range(N_WORDS):
        v = F.xxhash64(base, F.lit(w)).bitwiseAND(F.lit(MASK))
        v = F.when((F.col("id") % 10 == 9)
                   & (F.floor(flip_bit / WORD_BITS) == w),
                   v.bitwiseXOR(flip_mask)).otherwise(v)
        cols.append(v)
    return (spark.range(n)
            .select(F.col("id").alias("doc_id"),
                    F.array(*cols).alias("words")))


def main() -> None:
    ns = [int(float(a)) for a in sys.argv[1:]] or [250_000, 1_000_000,
                                                   4_000_000]
    spark = build_session("image-dedup-scale")
    results: dict = {"registered_56bit": {}, "wide_planted": {}}

    q = get_queries()["multimodal_image_dedup"]
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        q(spark, sf_dir).count()   # warm
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            n_pairs = q(spark, sf_dir).count()
            walls.append(time.perf_counter() - t0)
        results["registered_56bit"][os.path.basename(sf_dir)] = {
            "wall_sec": round(statistics.median(walls), 3),
            "pairs": n_pairs}
        print(json.dumps({"face": "56bit", "sf": sf_dir,
                          **results["registered_56bit"][
                              os.path.basename(sf_dir)]}), flush=True)

    prev = None
    for n in ns:
        codes = planted_codes(spark, n).localCheckpoint(eager=True)
        mih_radius_pairs_codes_wide(codes, radius=RADIUS).count()  # warm
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            n_pairs = mih_radius_pairs_codes_wide(codes,
                                                  radius=RADIUS).count()
            walls.append(time.perf_counter() - t0)
        wall = statistics.median(walls)
        exp = (round(math.log(wall / prev[1]) / math.log(n / prev[0]), 3)
               if prev else None)
        results["wide_planted"][n] = {"wall_sec": round(wall, 3),
                                      "pairs": n_pairs,
                                      "exponent_vs_prev": exp}
        print(json.dumps({"face": "wide", "n": n,
                          **results["wide_planted"][n]}), flush=True)
        prev = (n, wall)
        codes.unpersist()

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "_derived",
        "image_dedup_scale.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
