#!/usr/bin/env python
"""Streaming semantic-dedup band-index growth + compaction (round 8).

stream_semantic_dedup's per-trigger claim is O(|batch| + collisions)
against an append-only persisted (vec_id, band, bucket) band index —
the seen corpus is never re-hashed. Round 7 measured the rewrite's win
on the 5-batch fixture drain; this script proves the claim HOLDS AS
THE SEEN-STORE GROWS and demonstrates the index-maintenance story:

1. 24-batch drain (2,000 new vectors per trigger, 48k total; 5%
   planted near-copies of earlier batches so the cross-batch probe has
   genuine work) driving the exact foreachBatch body
   (`_semdedup_process_batch`), recording per-trigger wall vs
   seen-store size. Flat-ish wall = the claim; a slope tracking the
   seen-store = re-hash/rescan leakage. Band width uses the round-8
   adaptive rule sized to the FINAL corpus (log2(48k/64) = 10 bits) —
   sizing the keyspace to the stream's expected total is exactly the
   dial the rule exists for.
2. The small-files ledger: per-batch overwrite partitions accumulate
   tasks x batches files (the partitionBy cliff SCALING.md round 7
   measured applies to this index layout too).
3. Compaction (maint_compact-style): batches 0..N-1 of both stores
   collapse into ONE coalesced partition each (`batch=<N-1>` keeps the
   strictly-below probe protocol valid for every future batch id
   >= N), then batch N is processed against original vs compacted
   state — survivors must be byte-identical, file count and probe
   wall drop.

Usage: python scripts/stream_semdedup_growth.py  (markdown table ->
SCALING.md round-8 section)
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from collections.abc import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from integrator_spark.functions.synth import splitmix_vectors  # noqa: E402
from integrator_spark.operators.dedup import (  # noqa: E402
    signlsh_adaptive_bits,
)
from integrator_spark.session import build_session  # noqa: E402
from integrator_spark.streaming.jobs import (  # noqa: E402
    _semdedup_process_batch,
)

BATCHES, BATCH_ROWS, DIM = 24, 2_000, 64
DUP_EVERY = 20            # 5% of each batch copies an earlier vector
WORK = "/tmp/semdedup_growth"


def gen_batch(spark, b: int):
    """Batch b: ids [b*R, (b+1)*R); every DUP_EVERY-th row is a near-
    copy (cosine ~0.999) of a deterministic earlier-batch vector, so
    cross-batch collisions exist at every trigger."""
    lo = b * BATCH_ROWS

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            v = splitmix_vectors(ids, DIM).astype(np.float64)
            if lo > 0:
                dup = ids % DUP_EVERY == 0
                src = (ids[dup] * 2_654_435_761) % lo   # earlier id
                v[dup] = (splitmix_vectors(src, DIM).astype(np.float64)
                          + 0.01 * v[dup])
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            yield pd.DataFrame({
                "vec_id": ids,
                "label": (ids % 7).astype(np.int32),
                "embedding": list(v.astype(np.float32))})

    return (spark.range(lo, lo + BATCH_ROWS).select(F.col("id"))
            .repartition(8)
            .mapInPandas(gen, "vec_id long, label int, "
                              "embedding array<float>"))


def count_files(d: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(d):
        total += sum(1 for f in files if f.endswith(".parquet"))
    return total


def drain(spark, work: str, n_batches: int, bits: int,
          compact_every: int | None) -> tuple[list, list, list]:
    """One full drain of ``n_batches`` generated triggers through the
    exact foreachBatch body. Returns (per-trigger walls, per-trigger
    state-store file counts, sorted survivor ids over ALL batches)."""
    seen, bands, out = (os.path.join(work, d)
                        for d in ("seen", "bands", "out"))
    walls, files_trail = [], []
    for b in range(n_batches):
        batch = gen_batch(spark, b)
        t0 = time.perf_counter()
        _semdedup_process_batch(batch, b, seen, bands, out,
                                threshold=0.9, dim=DIM, bits=bits,
                                n_bands=12, compact_every=compact_every)
        walls.append(time.perf_counter() - t0)
        files_trail.append(count_files(bands) + count_files(seen))
    survivors = sorted(
        r.vec_id for r in
        spark.read.parquet(os.path.join(out, "batch=*"))
        .select("vec_id").collect())
    return walls, files_trail, survivors


def main() -> None:
    """Round-9 protocol (verdict item 7): a 52-batch drain with
    IN-STREAM auto-compaction (compact_every=8) against a
    no-compaction control — survivors must be byte-identical across
    the whole run, the auto-compacted wall must stay flat, and the
    state-store file count must stay bounded where the control's
    grows linearly."""
    spark = build_session("semdedup-growth")
    n_batches = 52
    bits = signlsh_adaptive_bits(n_batches * BATCH_ROWS)
    print(f"adaptive bits for {n_batches * BATCH_ROWS} rows: {bits}")

    shutil.rmtree(WORK, ignore_errors=True)
    w_ctl, f_ctl, s_ctl = drain(spark, os.path.join(WORK, "control"),
                                n_batches, bits, compact_every=None)
    print(f"control drain done: {sum(w_ctl):.1f}s total, "
          f"final files={f_ctl[-1]}", flush=True)
    w_ac, f_ac, s_ac = drain(spark, os.path.join(WORK, "autocompact"),
                             n_batches, bits, compact_every=8)
    print(f"auto-compact drain done: {sum(w_ac):.1f}s total, "
          f"final files={f_ac[-1]}", flush=True)

    assert s_ctl == s_ac, (
        f"auto-compaction changed survivors! control={len(s_ctl)} "
        f"auto={len(s_ac)}")
    print(f"survivors identical across 52 batches: {len(s_ctl)} rows")

    print("\n| batch | seen rows | control wall | auto wall | "
          "control files | auto files |")
    print("| ----- | --------- | -----------: | --------: | "
          "------------: | ---------: |")
    for b in (0, 7, 15, 23, 31, 39, 47, 51):
        print(f"| {b} | {b * BATCH_ROWS:,} | {w_ctl[b]:.2f} s | "
              f"{w_ac[b]:.2f} s | {f_ctl[b]} | {f_ac[b]} |")
    print(f"\nmean wall batches 1-8: control "
          f"{sum(w_ctl[1:9]) / 8:.2f}s auto {sum(w_ac[1:9]) / 8:.2f}s; "
          f"batches 44-51: control {sum(w_ctl[44:52]) / 8:.2f}s "
          f"auto {sum(w_ac[44:52]) / 8:.2f}s")
    print(f"max files over drain: control {max(f_ctl)} "
          f"auto {max(f_ac)}")
    spark.stop()


def main_r8() -> None:
    spark = build_session("semdedup-growth")
    shutil.rmtree(WORK, ignore_errors=True)
    seen, bands, out = (os.path.join(WORK, d)
                        for d in ("seen", "bands", "out"))
    bits = signlsh_adaptive_bits(BATCHES * BATCH_ROWS)
    print(f"adaptive bits for {BATCHES * BATCH_ROWS} rows: {bits}")

    walls = []
    for b in range(BATCHES):
        batch = gen_batch(spark, b)
        t0 = time.perf_counter()
        _semdedup_process_batch(batch, b, seen, bands, out,
                                threshold=0.9, dim=DIM, bits=bits,
                                n_bands=12)
        walls.append(time.perf_counter() - t0)
        if b % 4 == 3 or b == 0:
            print(f"batch={b} seen={b * BATCH_ROWS} wall={walls[-1]:.2f}s",
                  flush=True)

    n_files_before = count_files(bands) + count_files(seen)
    survivors_before = (spark.read.parquet(os.path.join(out, "batch=*"))
                        .count())

    # --- probe batch N against the UNCOMPACTED state -------------------
    probe_id = BATCHES
    probe = gen_batch(spark, probe_id).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    _semdedup_process_batch(probe, probe_id, seen, bands, out,
                            threshold=0.9, dim=DIM, bits=bits, n_bands=12)
    t_probe_raw = time.perf_counter() - t0
    surv_raw = sorted(r.vec_id for r in spark.read.parquet(
        os.path.join(out, f"batch={probe_id}")).collect())

    # --- compact batches 0..N-1 into one partition each ----------------
    from integrator_spark.streaming.jobs import semdedup_compact_stores

    t0 = time.perf_counter()
    n_files_after = semdedup_compact_stores(spark, seen, bands, probe_id)
    t_compact = time.perf_counter() - t0

    # --- replay the probe batch against the COMPACTED state ------------
    shutil.rmtree(os.path.join(out, f"batch={probe_id}"))
    t0 = time.perf_counter()
    _semdedup_process_batch(probe, probe_id, seen, bands, out,
                            threshold=0.9, dim=DIM, bits=bits, n_bands=12)
    t_probe_compact = time.perf_counter() - t0
    surv_compact = sorted(r.vec_id for r in spark.read.parquet(
        os.path.join(out, f"batch={probe_id}")).collect())

    ident = surv_raw == surv_compact
    print(f"\nsurvivors through batch {BATCHES - 1}: {survivors_before}")
    print(f"index files before/after compaction: "
          f"{n_files_before} -> {n_files_after} "
          f"(compaction wall {t_compact:.1f}s)")
    print(f"probe batch wall raw={t_probe_raw:.2f}s "
          f"compacted={t_probe_compact:.2f}s "
          f"survivors identical={ident} ({len(surv_raw)} rows)")
    assert ident, "compaction changed survivors!"

    print("\n| batch | seen rows | trigger wall |")
    print("| ----- | --------- | -----------: |")
    for b in (0, 3, 7, 11, 15, 19, 23):
        print(f"| {b} | {b * BATCH_ROWS:,} | {walls[b]:.2f} s |")
    print(f"\nmean wall batches 1-8: "
          f"{sum(walls[1:9]) / 8:.2f} s; batches 16-23: "
          f"{sum(walls[16:24]) / 8:.2f} s")
    spark.stop()


if __name__ == "__main__":
    main_r8() if "--r8" in sys.argv else main()
