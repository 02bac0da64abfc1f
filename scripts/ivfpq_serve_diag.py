"""Round-11 diagnostic: root-cause the vec_ann_ivfpq serve_median
drift (r9 5.14 s -> r10 8.9-18.1 s across sessions while q1 / kcore /
minhash hold their pins — VERDICT r10 weak item 1).

Reproduces bench.py's exact serve protocol (build once + persist,
serve_runs fresh search plans) interleaved with the q1 anchor (the
repo's A/B discipline applied to the serve stage), and logs per-run:
  - stage/task counts via statusTracker job groups (hypothesis B:
    stage-count growth / fixed small-stage overheads), and
  - the set of live pyspark worker PIDs (hypothesis A: Python worker
    spin-up — if reuse works the PID set is stable across runs).
"""
import json
import os
import statistics
import subprocess
import sys
import time

os.environ.setdefault(
    "PYSPARK_SUBMIT_ARGS",
    "--conf spark.ui.showConsoleProgress=false pyspark-shell")

sys.path.insert(0, "/root/repo")
from integrator_spark.session import build_session  # noqa: E402
from integrator_spark.io import load_table  # noqa: E402
from integrator_spark.registry import all_specs  # noqa: E402
from integrator_spark.operators.ivf import train_centroids  # noqa: E402
from integrator_spark.operators.pq import (ivfpq_encode,  # noqa: E402
                                           ivfpq_search, ivfpq_train)

SF_DIR = "/root/testdata/sf0.1"
spark = build_session("ivfpq-serve-diag")
sc = spark.sparkContext
tracker = sc.statusTracker()
q1 = all_specs()["q1_pricing_summary"].fn

def worker_pids() -> set[int]:
    out = subprocess.run(["ps", "-eo", "pid,args"], capture_output=True,
                         text=True).stdout
    return {int(l.split(None, 1)[0]) for l in out.splitlines()
            if "pyspark.daemon" in l or "pyspark.worker" in l}

def run_grouped(group: str, fn):
    sc.setJobGroup(group, group)
    t0 = time.perf_counter()
    fn()
    wall = time.perf_counter() - t0
    sc.setJobGroup(None, None)
    jobs = tracker.getJobIdsForGroup(group)
    stages, tasks = 0, 0
    for jid in jobs:
        ji = tracker.getJobInfo(jid)
        if ji is None:
            continue
        for sid in ji.stageIds:
            si = tracker.getStageInfo(sid)
            if si is not None:
                stages += 1
                tasks += si.numCompletedTasks
    return wall, len(jobs), stages, tasks

q1(spark, SF_DIR).collect()  # warm exactly like bench.py

e = load_table(spark, SF_DIR, "embeddings")
cent = train_centroids(e, n_clusters=16, sample_rows=2000, iters=10)
cb = ivfpq_train(e, cent, m=8, ksub=64, sample_rows=2000, iters=10)
codes = ivfpq_encode(e, cent, cb, n_assign=3).persist()
codes.count()

runs = []
for i in range(7):
    qw, _, _, _ = run_grouped(f"q1-{i}", lambda: q1(spark, SF_DIR).collect())
    pids_before = worker_pids()
    sw, jobs, stages, tasks = run_grouped(
        f"serve-{i}",
        lambda: (ivfpq_search(codes, e, e, cent, cb, n_probe=8, k=1,
                              shortlist=64, exclude_self=True)
                 .orderBy("query_id").collect()))
    pids_after = worker_pids()
    runs.append({"i": i, "q1": round(qw, 3), "serve": round(sw, 3),
                 "jobs": jobs, "stages": stages, "tasks": tasks,
                 "workers": len(pids_after),
                 "new_workers": len(pids_after - pids_before)})
    print(json.dumps(runs[-1]), flush=True)

serves = [r["serve"] for r in runs[1:]]
q1s = [r["q1"] for r in runs[1:]]
print(json.dumps({
    "serve_median": round(statistics.median(serves), 3),
    "serve_min": min(serves), "serve_max": max(serves),
    "q1_median": round(statistics.median(q1s), 3),
    "ratio_serve_over_q1": round(statistics.median(serves)
                                 / statistics.median(q1s), 2)}))
codes.unpersist()
spark.stop()
