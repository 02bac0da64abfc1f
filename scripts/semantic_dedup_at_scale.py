#!/usr/bin/env python
"""Embedding near-dup at routing scale: the round-7 semantic dedup paths
on a 1.155M x dim-64 corpus — the clustered base from
scripts/ann_at_scale.py (512 latent clusters, intra-cluster cosine
~0.79) plus a planted 5% near-copy population at cosine ~0.93, dedup
threshold 0.90 (the planted copies are the ONLY pairs above it; the
intra-cluster mass sits ~3 sigma below — verified in-run).

What this measures, and why both paths:

1. ``semantic_pairs_ivf`` end to end (train + assign + within-cell
   scan): wall, recall vs the planted truth set, and the candidate
   volume sum(C(cell_size, 2)).
2. ``signlsh_buckets`` CANDIDATE VOLUME at the full corpus — on a
   clustered corpus the sign buckets collapse onto the clusters (all
   members of a latent cluster share most projection signs), so the
   bucket-equality join degenerates toward sum over clusters of
   |cluster|^2. We count sum(C(bucket_size, 2)) from the bucket
   histogram WITHOUT materializing the join (the honest way to show a
   candidate blow-up without running it), with and without the
   hot-bucket guard — the guard caps the volume but drops exactly the
   buckets that contain the duplicates, which is the measured argument
   for routing clustered corpora to the IVF path.
3. ``signlsh_pairs`` end to end at an 11.5k subsample (every 100th
   vector, same planted density) where the volume is tractable: wall +
   recall, confirming the kernel itself is correct at high thresholds.

Usage: python scripts/semantic_dedup_at_scale.py   (prints a markdown
table; paste into SCALING.md round-7 section)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from integrator_spark.functions.synth import splitmix_vectors  # noqa: E402
from integrator_spark.io import derived_dir  # noqa: E402
from integrator_spark.operators.dedup import (  # noqa: E402
    semantic_pairs_ivf,
    signlsh_buckets,
    signlsh_pairs,
)
from integrator_spark.session import build_session  # noqa: E402

N, DIM, LATENT, ALPHA = 1_100_000, 64, 512, 9.0
PLANT_EVERY = 20                  # 5% near-copies -> 55_000 planted pairs
DELTA = 0.0855                    # perturbation -> cosine ~0.93 to source
THRESHOLD = 0.90
N_CLUSTERS, N_ASSIGN = 1024, 2
LSH_BITS, LSH_BANDS = 16, 8


def generate(spark) -> str:
    """Clustered base (identical construction to ann_at_scale) plus
    planted copies with ids N + i: copy i perturbs source id
    (i * PLANT_EVERY) % N."""
    path = derived_dir("/root/testdata/sf0.1", "bigdedup",
                       f"emb_planted_{N}x{DIM}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    lat = splitmix_vectors(np.arange(LATENT) + 7_000_000, DIM).astype(np.float64)
    lat /= np.linalg.norm(lat, axis=1, keepdims=True)
    n_plant = N // PLANT_EVERY

    def base_vec(ids: np.ndarray) -> np.ndarray:
        noise = splitmix_vectors(ids, DIM).astype(np.float64)
        mat = ALPHA * lat[ids % LATENT] + noise
        return mat / np.linalg.norm(mat, axis=1, keepdims=True)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            is_copy = ids >= N
            src = np.where(is_copy, ((ids - N) * PLANT_EVERY) % N, ids)
            mat = base_vec(src)
            if is_copy.any():
                pert = splitmix_vectors(ids[is_copy] + 3_000_000_000, DIM
                                        ).astype(np.float64)
                mat[is_copy] = mat[is_copy] + DELTA * pert
                mat[is_copy] /= np.linalg.norm(mat[is_copy], axis=1,
                                               keepdims=True)
            yield pd.DataFrame({"vec_id": ids,
                                "embedding": list(mat.astype(np.float32))})

    (spark.range(N + n_plant).repartition(32)
     .mapInPandas(gen, "vec_id long, embedding array<float>")
     .write.mode("overwrite").parquet(path))
    return path


def truth_pairs(emb):
    """Planted (src, copy) pairs whose exact cosine clears THRESHOLD —
    one bounded join of the copy rows back to their sources."""
    copies = emb.filter(F.col("vec_id") >= N).select(
        F.col("vec_id").alias("id_b"),
        (((F.col("vec_id") - N) * PLANT_EVERY) % N).alias("id_a"),
        F.col("embedding").alias("_vb"))
    srcs = emb.select(F.col("vec_id").alias("id_a"),
                      F.col("embedding").alias("_va"))

    @F.pandas_udf("double")
    def cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        if not len(va):
            return pd.Series([], dtype="float64")
        x = np.array(va.tolist(), dtype=np.float64)
        y = np.array(vb.tolist(), dtype=np.float64)
        return pd.Series((x * y).sum(axis=1)
                         / (np.linalg.norm(x, axis=1)
                            * np.linalg.norm(y, axis=1)))

    return (copies.join(srcs, "id_a")
            .withColumn("_c", cos("_va", "_vb"))
            .filter(F.col("_c") >= THRESHOLD)
            .select("id_a", "id_b"))


def pair_volume(buckets, key_cols):
    sizes = buckets.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    row = sizes.agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("v"),
                    F.max("n").alias("mx"),
                    F.count(F.lit(1)).alias("nb")).first()
    return int(row["v"] or 0), int(row["mx"] or 0), int(row["nb"] or 0)


def main() -> int:
    spark = build_session("semantic-dedup-scale")
    emb = spark.read.parquet(generate(spark))
    n_total = emb.count()
    truth = truth_pairs(emb).cache()
    n_truth = truth.count()
    print(f"corpus={n_total} planted_pairs>= {THRESHOLD}: {n_truth}")

    # -- IVF path, full corpus ------------------------------------------
    t0 = time.perf_counter()
    found = semantic_pairs_ivf(emb, threshold=THRESHOLD,
                               n_clusters=N_CLUSTERS, n_assign=N_ASSIGN
                               ).select("id_a", "id_b").cache()
    n_found = found.count()
    t_ivf = time.perf_counter() - t0
    n_hit = truth.join(found, ["id_a", "id_b"], "left_semi").count()
    print(f"ivf: wall={t_ivf:.1f}s found={n_found} "
          f"recall={n_hit / max(n_truth, 1):.4f}")

    # candidate volume of the ivf cells (for the comparison row)
    from integrator_spark.operators.ivf import ivf_assign, train_centroids
    cent = train_centroids(emb, n_clusters=N_CLUSTERS)
    assigned = ivf_assign(emb, cent, n_assign=N_ASSIGN)
    v_ivf, mx_ivf, nb_ivf = pair_volume(assigned, ["bucket"])
    print(f"ivf cells: volume={v_ivf:,} max_cell={mx_ivf} cells={nb_ivf}")

    # -- sign-LSH candidate volume, full corpus (histogram only) --------
    t0 = time.perf_counter()
    b = signlsh_buckets(emb, DIM, LSH_BITS, LSH_BANDS)
    v_all, mx_all, nb_all = pair_volume(b, ["band", "bucket"])
    t_hist = time.perf_counter() - t0
    print(f"signlsh {LSH_BITS}x{LSH_BANDS}: volume={v_all:,} "
          f"max_bucket={mx_all} buckets={nb_all} (hist {t_hist:.1f}s)")
    # guarded: drop buckets > 100 — what survives, and does the truth?
    sizes = (b.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("n")))
    small = sizes.filter(F.col("n") <= 100)
    row = small.agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("v")
                    ).first()
    kept = b.join(small.select("band", "bucket"), ["band", "bucket"],
                  "left_semi")
    # do planted pairs still share a surviving bucket?
    ka = kept.select(F.col("vec_id").alias("id_a"), "band", "bucket")
    kb = kept.select(F.col("vec_id").alias("id_b"), "band", "bucket")
    guarded_hits = (truth.join(ka, "id_a").join(kb, ["id_b", "band",
                                                     "bucket"])
                    .select("id_a", "id_b").distinct().count())
    print(f"signlsh guarded<=100: volume={int(row['v'] or 0):,} "
          f"truth pairs still colliding={guarded_hits}/{n_truth}")

    # -- sign-LSH end-to-end at the 11.5k subsample ---------------------
    sub = emb.filter((F.col("vec_id") % 100 == 0)
                     | ((F.col("vec_id") >= N)
                        & ((F.col("vec_id") - N) % 5 == 0))).cache()
    n_sub = sub.count()
    # subsample truth: both endpoints must be present
    ids = sub.select(F.col("vec_id").alias("id_a"))
    sub_t = (truth.join(ids, "id_a", "left_semi")
             .join(sub.select(F.col("vec_id").alias("id_b")), "id_b",
                   "left_semi"))
    n_sub_t = sub_t.count()
    t0 = time.perf_counter()
    sfound = signlsh_pairs(sub, threshold=THRESHOLD, dim=DIM,
                           bits_per_band=LSH_BITS, n_bands=LSH_BANDS
                           ).select("id_a", "id_b").cache()
    n_sf = sfound.count()
    t_lsh = time.perf_counter() - t0
    sh = sub_t.join(sfound, ["id_a", "id_b"], "left_semi").count()
    print(f"signlsh@{n_sub}: wall={t_lsh:.1f}s found={n_sf} "
          f"truth={n_sub_t} recall={sh / max(n_sub_t, 1):.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
