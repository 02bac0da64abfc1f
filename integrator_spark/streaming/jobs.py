"""Structured Streaming jobs (SURVEY.md §2.9): file-source replay of the
events table through readStream with watermarks, windowed aggregation,
stateful dedup, and checkpointed sinks.

The registered queries run the stream with ``Trigger.AvailableNow``
into a memory sink and return the materialized result as a batch
DataFrame — on bounded input the event-time semantics coincide with
the batch analogs, so the tumbling/dedup results are DuckDB-oracle
checkable (the driver's strongest gate), while the code path exercised
is the genuine streaming one: unresolved streaming source → watermark
→ stateful aggregation → checkpointed incremental sink.

At production scale the same plans run against a file/Kafka source
with a real trigger; only the source/sink lines change.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.num import dsum, sql_dsum
from ..queries.events import PATTERN_MATCH_ORACLE as _PATTERN_MATCH_ORACLE
from ..io import derived_dir, load_table, normalize_events_ts
from ..registry import register
from ..session import ensure_runtime_confs

def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded view of the events table via the file streaming source.

    The file source wants a *directory* it can watch for arriving files
    (that's the replay model: drop parquet files in, the stream picks
    them up). The fixture is a single file, so stage a copy into a
    derived source directory once.

    readStream requires an explicit schema, and the fixture's ``ts``
    physical type has changed across driver generations (raw nanos-long
    in rounds 1-2, timestamp[us]/NTZ from round 3) — so instead of
    hardcoding it, read the staged file's footer with a zero-job batch
    ``spark.read`` and reuse that schema, then route through the same
    ``normalize_events_ts`` the batch loader uses."""
    ensure_runtime_confs(spark)
    src_dir = derived_dir(sf_dir, "events_stream_src")
    src = os.path.join(sf_dir, "events.parquet")
    dst = os.path.join(src_dir, "events.parquet")
    import glob as _glob
    import shutil
    staged = (os.path.isfile(dst)   # a DIRECTORY at dst is a bad stage
              or _glob.glob(os.path.join(src_dir, "events_part*.parquet")))
    if not staged or not _fingerprint_ok(src_dir, src):
        if os.path.isdir(src_dir):
            shutil.rmtree(src_dir)   # drop any stale stage wholesale
        os.makedirs(src_dir, exist_ok=True)
        if os.path.isdir(src):
            # Multi-file tables (e.g. the derived sf1 replicas write a
            # parquet DIRECTORY): stage the part files FLAT — the file
            # source doesn't recurse into nested directories, and the
            # replay model is unchanged, there are just more files.
            parts = sorted(f for f in os.listdir(src)
                           if f.endswith(".parquet"))
            for i, f in enumerate(parts):
                shutil.copyfile(os.path.join(src, f),
                                os.path.join(src_dir,
                                             f"events_part{i:04d}.parquet"))
        else:
            shutil.copyfile(src, dst)
        _write_fingerprint(src_dir, src)
    raw_schema = spark.read.parquet(src_dir).schema   # footer-only, no job
    raw = (spark.readStream
           .schema(raw_schema)
           .parquet(src_dir))
    return normalize_events_ts(raw)


def _src_fingerprint(src: str) -> str:
    st = os.stat(src)
    return f"{st.st_size}:{st.st_mtime_ns}"


def _write_fingerprint(stage_dir: str, src: str) -> None:
    with open(os.path.join(stage_dir, "_SRC_FINGERPRINT"), "w") as fh:
        fh.write(_src_fingerprint(src))


def _fingerprint_ok(stage_dir: str, src: str) -> bool:
    """True iff the stage was built from the CURRENT fixture file. The
    driver has regenerated fixtures mid-build before (the round-3
    nanos→micros ts change) — size+mtime fingerprinting makes every
    staged copy self-invalidating instead of silently stale."""
    try:
        with open(os.path.join(stage_dir, "_SRC_FINGERPRINT")) as fh:
            return fh.read().strip() == _src_fingerprint(src)
    except OSError:
        return False


#: Staged-file schema: ts is already a proper TIMESTAMP (the staging
#: write goes through load_table's normalization first).
EVENTS_STAGED_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

#: Late-row selection for the multi-batch replay: every ``LATE_MOD``-th
#: event older than ``LATE_HOURS`` before the corpus max timestamp is
#: withheld into the final staged file, so it arrives AFTER the
#: watermark has passed its window. Mirrored in stream_late_data's
#: oracle.
LATE_MOD = 7
LATE_HOURS = 2


def stage_events_late_replay(spark: SparkSession, sf_dir: str) -> str:
    """Stage the events fixture as THREE parquet files — the bulk of the
    on-time rows, the max-timestamp on-time rows, then late rows with
    older event times — with mtimes forcing the file source to deliver
    them in that order. With ``maxFilesPerTrigger=1`` the stream sees
    three genuine micro-batches, which is the MINIMUM that makes the
    watermark actually drop rows: Spark filters batch N's input against
    the watermark computed after batch N-1 (``watermarkForLateEvents``
    lags eviction by one batch — verified empirically on 4.1.2: with
    only two files the late rows sail through because batch 1 filters
    against batch 0's initial 1970 watermark). Here batch 1 re-confirms
    the max event time, so batch 2's late rows meet a watermark of
    (max ts - delay) and are dropped from state — cross-batch late-data
    semantics a single-file replay can never exercise. Staging is
    deterministic per sf_dir and cached behind an atomic marker file."""
    import shutil

    from ..io import load_table

    stage = derived_dir(sf_dir, "events_late_src")
    src = os.path.join(sf_dir, "events.parquet")
    done = os.path.join(stage, "_STAGED_3FILE")            # "_" files are
    if os.path.exists(done) and _fingerprint_ok(stage, src):   # invisible to
        return stage                                           # the source
    e = load_table(spark, sf_dir, "events")
    mx = e.agg(F.max("ts")).collect()[0][0]
    is_late = ((F.col("event_id") % LATE_MOD == 0)
               & (F.col("ts") < F.lit(mx) - F.expr(f"INTERVAL {LATE_HOURS} HOURS")))
    is_tip = F.col("ts") == F.lit(mx)                # watermark re-confirmer
    os.makedirs(stage, exist_ok=True)
    for idx, (name, part_df) in enumerate(
            (("00_ontime", e.filter(~is_late & ~is_tip)),
             ("01_tip", e.filter(~is_late & is_tip)),
             ("02_late", e.filter(is_late)))):
        tmp = os.path.join(stage, f"_tmp_{name}_{os.getpid()}")
        part_df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        final = os.path.join(stage, f"{name}.parquet")
        os.replace(os.path.join(tmp, part), final)
        shutil.rmtree(tmp, ignore_errors=True)
        # deterministic mtimes: the source lists oldest-first
        os.utime(final, (1_000_000_000 + idx * 100,) * 2)
    _write_fingerprint(stage, src)
    with open(done, "w") as fh:
        fh.write("ok")
    return stage


def events_stream_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded events view that replays in 3 micro-batches (on-time
    bulk, watermark tip, late file) — see stage_events_late_replay."""
    ensure_runtime_confs(spark)
    stage = stage_events_late_replay(spark, sf_dir)
    return (spark.readStream
            .schema(EVENTS_STAGED_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage))


def _reap_stale_checkpoints(ckpt_root: str, name: str) -> None:
    """Remove checkpoint dirs left by dead processes (same query name,
    different pid) so repeated verification rounds don't grow unbounded."""
    import shutil

    prefix = f"{name}_pid"
    try:
        entries = os.listdir(ckpt_root)
    except OSError:
        return
    for entry in entries:
        if not entry.startswith(prefix):
            continue
        try:
            pid = int(entry[len(prefix):])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)          # alive -> leave its checkpoint alone
        except ProcessLookupError:
            # Only a definitively-dead pid is reaped: PermissionError
            # means a live process owned by another user — leave it.
            shutil.rmtree(os.path.join(ckpt_root, entry), ignore_errors=True)
        except OSError:
            pass


def run_available_now(stream_df: DataFrame, sf_dir: str, name: str,
                      output_mode: str = "append") -> DataFrame:
    """Drain a streaming DataFrame into a memory sink with a fresh
    checkpoint and return the materialized batch result.

    Output-mode semantics matter: append withholds windows the
    watermark hasn't closed (so the final open window never emits on a
    bounded replay); complete emits the full aggregation state.

    The checkpoint dir is derived from the ``sf_dir`` the query was
    invoked with (NOT an env var — two runs against different sf dirs
    must not share state) plus the process id (two concurrent runs of
    the same query must not clobber each other's live checkpoint), and
    wiped before each run: a replay demo must reprocess from scratch —
    a reused checkpoint would report "no new data". Stale dirs from
    dead pids are reaped so the tree stays bounded. The memory-sink
    table name still gets a unique suffix — memory tables can't be
    re-registered while a same-named query object lingers in the
    session.
    """
    import shutil

    query_name = f"{name}_{uuid.uuid4().hex[:8]}"
    ckpt_root = derived_dir(sf_dir, "checkpoints")
    _reap_stale_checkpoints(ckpt_root, name)
    checkpoint = os.path.join(ckpt_root, f"{name}_pid{os.getpid()}")
    shutil.rmtree(checkpoint, ignore_errors=True)
    q = (stream_df.writeStream
         .format("memory")
         .queryName(query_name)
         .outputMode(output_mode)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    global LAST_RUN_PROGRESS
    LAST_RUN_PROGRESS = list(q.recentProgress)
    try:
        plan = q._jsq.explainInternal(True)
    except Exception:
        plan = ""          # e.g. Spark Connect: no py4j handle
    LAST_STREAM_AUDITS[name] = {"plan": plan,
                                "progress": LAST_RUN_PROGRESS}
    return stream_df.sparkSession.table(query_name)


#: Progress snapshots of the most recent run_available_now drain —
#: lets tests assert micro-batch structure (batch count, watermark
#: drops) without threading the query handle through the registry API.
LAST_RUN_PROGRESS: list = []

#: Per-job audit artifacts of the most recent run_available_now drain:
#: the last execution's physical plan text (explainInternal) and the
#: progress list — the streaming face of the batch plan audit
#: (plans/audit.py stream_violations walks these; round-9 verdict
#: item 5). Keyed by job name so one test run can drain many jobs and
#: audit them all.
LAST_STREAM_AUDITS: dict[str, dict] = {}


@register("stream_tumbling", oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY 1, 2
""", tags=("streaming",))
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation executed through the real streaming
    path: readStream → 10-min watermark → window agg → checkpointed
    availableNow drain. On bounded replay nothing is late, so the
    result equals the batch analog and the oracle checks it exactly.
    Complete output mode is required: append would withhold the final
    hour (the watermark never closes the last open window)."""
    s = events_stream(spark, sf_dir)
    agg = (s.withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
           .agg(F.count(F.lit(1)).alias("n_events"),
                dsum("value").alias("total_value"))
           .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("bucket_start"),
                   "event_type", "n_events", "total_value"))
    return run_available_now(agg, sf_dir, "stream_tumbling", output_mode="complete")


@register("stream_dedup", oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_users
FROM events
GROUP BY event_type
""", tags=("streaming", "dedup"))
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup: dropDuplicatesWithinWatermark on
    (user_id, event_type), then a per-type count. Which physical row
    survives is engine-internal, so the query projects to the
    deterministic quantity — the distinct-key count — which the oracle
    verifies exactly."""
    s = events_stream(spark, sf_dir)
    deduped = (s.withWatermark("ts", "1 hour")
               .dropDuplicatesWithinWatermark(["user_id", "event_type"])
               .select("user_id", "event_type", "ts"))
    drained = run_available_now(deduped, sf_dir, "stream_dedup")
    return (drained.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n_distinct_users")))


_SESSION_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
isl AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM gaps
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       COUNT(*) AS n_events
FROM isl GROUP BY user_id, sid
-- append-mode emission: a session is final only when the watermark
-- (max event time - 1 h) has passed its window END (last ts + gap);
-- sessions still open at end-of-replay are withheld by the sink.
HAVING MAX(ts) + INTERVAL '30 minutes'
         <= (SELECT MAX(ts) FROM events) - INTERVAL '1 hour'
"""


def _session_drain(spark: SparkSession, sf_dir: str,
                   name: str) -> DataFrame:
    """Shared session-window drain for stream_session and its
    state-store-provider twin: watermark + merging session state,
    availableNow replay into a memory sink."""
    s = events_stream(spark, sf_dir)
    agg = (s.withWatermark("ts", "1 hour")
           .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
           .agg(F.count(F.lit(1)).alias("n_events"))
           .select("user_id",
                   F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                    .alias("session_start"),
                   "n_events"))
    drained = run_available_now(agg, sf_dir, name)
    return drained.orderBy("user_id", "session_start")


@register("stream_session", oracle=_SESSION_ORACLE,
          tags=("streaming", "session"))
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows under streaming execution (merging session state
    + watermark). Oracle-backed as of round 7: on the bounded
    availableNow replay the merging-session-state result coincides
    with the batch islands construction (lag-gap >= 30 min starts a
    session — the same boundary rule session_window applies), so
    DuckDB reproduces (user, session_start, n_events) exactly; the
    code path exercised is still the genuine streaming one
    (watermark + session-merging state store)."""
    return _session_drain(spark, sf_dir, "stream_session")


#: Stock-Spark RocksDB state-store provider (no extra jars — bundled
#: with spark-sql since 3.2); the production posture for large
#: streaming state, where the default HDFS-backed provider keeps every
#: key in executor heap.
ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider")


@register("stream_session_rocksdb", oracle=_SESSION_ORACLE,
          tags=("streaming", "session", "statestore"))
def stream_session_rocksdb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stream_session with the state store swapped to ROCKSDB — the
    provider a 100-TB streaming deployment runs (state off-heap +
    changelog checkpointing capable), proven conf-only under the
    driver's strongest gate: SAME oracle as stream_session, so every
    sweep asserts the provider swap changes no output row (round-9
    verdict item 4). The session-window aggregation is the heaviest
    state-store user in the registry (merging session state per key).

    Note the scope: this covers queries whose state lives in SPARK's
    state store (session/tumbling windows, dropDuplicates,
    applyInPandasWithState). stream_semantic_dedup's seen/band stores
    are its OWN batch-partitioned parquet LSM (foreachBatch), which no
    providerClass touches — its growth/compaction posture is proven
    separately (scripts/stream_semdedup_growth.py).

    Round 12: CHANGELOG CHECKPOINTING is on — the conf that decides
    whether RocksDB ever wins (verdict r11 item 4). Without it every
    commit uploads full SSTs (the r11 bench's 3.2x-slower number);
    with it the commit uploads the per-batch changelog and
    snapshotting moves to background maintenance. Measured crossover
    (scripts/rocksdb_crossover.py, SCALING.md): at 16M resident keys
    rocksdb+changelog drains 1.65x FASTER than the HDFS map store,
    whose on-heap state hits 5 GB of an 8 GB heap — and the RocksDB
    store holds ~0.3 GB native. Recommendation recorded in
    SCALING.md: providerClass=RocksDB + changelogCheckpointing=true
    for any production stream whose state exceeds ~1 GB/executor."""
    confs = {
        "spark.sql.streaming.stateStore.providerClass":
            ROCKSDB_PROVIDER,
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled": "true",
    }
    old: dict[str, str | None] = {}
    for key, val in confs.items():
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, val)
    try:
        # run_available_now drains eagerly (awaitTermination inside),
        # so the whole stateful execution happens under this conf; the
        # returned frame only reads the memory sink.
        return _session_drain(spark, sf_dir, "stream_session_rocksdb")
    finally:
        for key, val in old.items():
            if val is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, val)


@register("stream_stateful", oracle="""
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(new_session) AS BIGINT) AS n_sessions
FROM gaps GROUP BY user_id
""", tags=("streaming", "stateful"))
def stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary per-key state machine via applyInPandasWithState
    (SURVEY.md §2.9 'arbitrary state'): each user carries
    (event_count, session_count, last_ts) state across micro-batches;
    sessions open on a >= 30-minute gap. On bounded replay every key's
    history arrives before the final emit, so the emitted state equals
    the batch islands computation — which the oracle checks exactly."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ns = 30 * 60 * 1_000_000_000  # pandas datetime64 -> int64 is NANOS

    def track_user(key, pdf_iter, state: GroupState):
        n_events, n_sessions, last_ns = (
            state.get if state.exists else (0, 0, None))
        # Accumulate EVERY Arrow chunk for the key, then sort once —
        # per-chunk sorting would make the gap fold depend on chunk
        # boundaries. Across micro-batches the fold is still
        # arrival-order (inherent to incremental state); on bounded
        # availableNow replay all rows land in one batch, so the result
        # equals the ORDER BY ts oracle.
        import numpy as np
        chunks = [pdf["ts"].astype("int64").to_numpy() for pdf in pdf_iter]
        ts_all = np.sort(np.concatenate(chunks)) if chunks else \
            np.empty(0, dtype=np.int64)
        for t in ts_all:
            if last_ns is None or t - last_ns >= gap_ns:
                n_sessions += 1
            n_events += 1
            last_ns = int(t)
        state.update((n_events, n_sessions, last_ns))
        yield pd.DataFrame({"user_id": [key[0]],
                            "n_events": [n_events],
                            "n_sessions": [n_sessions]})

    s = events_stream(spark, sf_dir)
    tracked = (s.select("user_id", "ts")
               .withWatermark("ts", "1 hour")
               .groupBy("user_id")
               .applyInPandasWithState(
                   track_user,
                   outputStructType="user_id long, n_events long, n_sessions long",
                   stateStructType="n_events long, n_sessions long, last_ns long",
                   outputMode="append",
                   timeoutConf=GroupStateTimeout.NoTimeout))
    return run_available_now(tracked, sf_dir, "stream_stateful")


def pattern_fold(st: tuple, chars) -> tuple:
    """Pure per-key transition fold of the pattern state machine —
    module-level so tests can drive it directly and prove BATCH-SPLIT
    INVARIANCE: folding a character sequence in any number of ordered
    splits yields the same state as one pass (the property that makes
    the streaming face equal the batch face across micro-batches).
    State: (n_events, n_vcp, err_run, max_err, tail<=2 chars, stage)."""
    n_events, n_vcp, err_run, max_err, tail, stage = st
    for c in chars:
        n_events += 1
        if tail == "vc" and c == "p":
            n_vcp += 1
            tail = ""              # greedy non-overlap == replace()
        else:
            tail = (tail + c)[-2:]
        if c == "e":
            err_run += 1
            max_err = max(max_err, err_run)
        else:
            err_run = 0
        if stage == 0 and c == "v":
            stage = 1
        elif stage == 1 and c == "c":
            stage = 2
        elif stage == 2 and c == "p":
            stage = 3
    return (n_events, n_vcp, err_run, max_err, tail, stage)


@register("stream_pattern_match", oracle=_PATTERN_MATCH_ORACLE,
          tags=("streaming", "stateful", "pattern"))
def stream_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_pattern_match through the streaming state-machine path —
    and the reason the pattern stats were DESIGNED incremental: per
    user the state is O(1) (an at-most-2-char match tail, an error-run
    counter, a 3-value funnel stage), so the MATCH_RECOGNIZE-style
    matcher runs as applyInPandasWithState with constant memory per
    key, unlike the batch face's collected sequence. Non-overlapping
    'vcp' counting via the greedy tail reset is exactly the batch
    replace-length identity; the oracle is shared
    (queries/events.py::PATTERN_MATCH_ORACLE): on the bounded
    availableNow replay every key's history lands before the final
    emit and each batch folds in (ts, event_id) order, so the emitted
    state equals the batch computation exactly — the stream_stateful
    posture. tests/test_streaming.py additionally pins stream == batch
    row-for-row and the state machine's batch-split invariance.

    Scale: state per key is ~5 scalars + 2 chars; no sequence is ever
    materialized. The same skew note as stream_stateful applies."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def track(key, pdf_iter, state: GroupState):
        import numpy as np
        st = state.get if state.exists else (0, 0, 0, 0, "", 0)
        chunks = list(pdf_iter)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            order = np.lexsort((pdf["event_id"].to_numpy(),
                                pdf["ts"].astype("int64").to_numpy()))
            st = pattern_fold(st, pdf["ch"].to_numpy()[order])
        n_events, n_vcp, err_run, max_err, tail, stage = st
        state.update((n_events, n_vcp, err_run, max_err, tail, stage))
        yield pd.DataFrame({"user_id": [key[0]],
                            "n_events": [n_events],
                            "n_vcp": [n_vcp],
                            "max_err_run": [max_err],
                            "converted": [stage == 3]})

    s = events_stream(spark, sf_dir)
    ev = s.select("user_id", "ts", "event_id",
                  F.substring("event_type", 1, 1).alias("ch"))
    tracked = (ev.withWatermark("ts", "1 hour")
               .groupBy("user_id")
               .applyInPandasWithState(
                   track,
                   outputStructType=("user_id long, n_events long, "
                                     "n_vcp long, max_err_run long, "
                                     "converted boolean"),
                   stateStructType=("n_events long, n_vcp long, "
                                    "err_run long, max_err long, "
                                    "tail string, stage long"),
                   outputMode="append",
                   timeoutConf=GroupStateTimeout.NoTimeout))
    return (run_available_now(tracked, sf_dir, "stream_pattern_match")
            .orderBy("user_id"))


def tws_available() -> bool:
    """Whether transformWithStateInPandas can run in this environment.

    Spark 4's TWS spins up a dedicated 'driver worker' Python process
    that talks to the JVM over protobuf; this container has NO
    google.protobuf at all (round 5 observed a namespace stub that
    failed at ``from google.protobuf import descriptor``; as of round 6
    even ``import google`` raises ModuleNotFoundError — re-checked
    2026-08-14 on pyspark 4.1.2), so the worker dies at import
    (StreamingPythonRunnerInitializationException, exit -2). Package
    installs are prohibited in this environment and vendoring the
    multi-thousand-line protobuf runtime would be wholesale third-party
    code copying, so this is environment-blocked the same way as the
    absent JDBC/Kafka jars; the implementation below is complete and
    activates wherever protobuf is installed."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def stream_stateful_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stream_stateful ported to transformWithStateInPandas (Spark 4's
    successor to applyInPandasWithState — SURVEY.md §2.9 stretch
    surface): the same per-user (n_events, n_sessions, last_ns) session
    machine, with state held in a typed ValueState handle instead of a
    raw tuple. The newer API adds event-time timers (TimerValues) that
    would fix the cross-batch arrival-order caveat of stream_stateful —
    buffer rows in state, register a timer at watermark + gap, fold in
    event-time order when it fires; on bounded availableNow replay the
    direct fold below is already oracle-exact, matching
    stream_stateful's semantics.

    Environment-gated: raises NotImplementedError where the TWS
    protobuf worker cannot start (see tws_available); the gate is
    unit-tested both ways in tests/test_streaming.py."""
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs a working google.protobuf "
            "for its driver worker; not available in this container "
            "(see tws_available)")
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor

    gap_ns = 30 * 60 * 1_000_000_000

    class SessionProc(StatefulProcessor):
        def init(self, handle) -> None:
            self.state = handle.getValueState(
                "sess", "n_events BIGINT, n_sessions BIGINT, last_ns BIGINT")

        def handleInputRows(self, key, rows, timer_values):
            if self.state.exists():
                n_events, n_sessions, last_ns = self.state.get()
            else:
                n_events, n_sessions, last_ns = 0, 0, None
            chunks = [pdf["ts"].astype("int64").to_numpy() for pdf in rows]
            ts_all = (np.sort(np.concatenate(chunks)) if chunks
                      else np.empty(0, dtype=np.int64))
            for t in ts_all:
                if last_ns is None or t - last_ns >= gap_ns:
                    n_sessions += 1
                n_events += 1
                last_ns = int(t)
            self.state.update((n_events, n_sessions, last_ns))
            yield pd.DataFrame({"user_id": [key[0]],
                                "n_events": [n_events],
                                "n_sessions": [n_sessions]})

        def close(self) -> None:
            pass

    s = events_stream(spark, sf_dir)
    tracked = (s.select("user_id", "ts")
               .withWatermark("ts", "1 hour")
               .groupBy("user_id")
               .transformWithStateInPandas(
                   SessionProc(),
                   "user_id long, n_events long, n_sessions long",
                   "Update", "NoTime"))
    return run_available_now(tracked, sf_dir, "stream_stateful_tws",
                             output_mode="update")


@register("stream_foreach_batch", oracle="""
SELECT event_type,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
""", tags=("streaming", "sink"))
def stream_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch sink — the exactly-once escape hatch: each
    micro-batch arrives as a *batch* DataFrame with a monotonically
    increasing batch_id, written idempotently (overwrite-by-batch-id
    partition) so replays after failure cannot double-count. The
    re-read aggregate must equal the source aggregate (oracle)."""
    import shutil
    target = os.path.join(derived_dir(sf_dir, "foreach_batch_out"), "run")
    shutil.rmtree(target, ignore_errors=True)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Idempotent: a retried batch overwrites its own partition.
        (batch_df.withColumn("_batch", F.lit(batch_id))
         .write.mode("overwrite")
         .parquet(os.path.join(target, f"batch={batch_id}")))

    s = events_stream(spark, sf_dir).select("event_id", "event_type")
    q = (s.writeStream
         .foreachBatch(write_batch)
         .option("checkpointLocation", os.path.join(target, "_ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    written = spark.read.parquet(os.path.join(target, "batch=*"))
    return (written.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events")))


@register("stream_update_counts", oracle="""
SELECT event_type, COUNT(*) AS n_events
FROM events
GROUP BY event_type
""", tags=("streaming", "outputmode"))
def stream_update_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Update output mode: an unwindowed running aggregation emits only
    the groups that changed in each micro-batch (vs append's
    finalized-only and complete's full-state). On a single-batch replay
    every group changes once, so the sink holds the final counts —
    which the oracle verifies."""
    s = events_stream(spark, sf_dir)
    agg = (s.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n_events")))
    return run_available_now(agg, sf_dir, "stream_update_counts", output_mode="update")


@register("stream_join", oracle="""
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id
FROM events c
JOIN events p
  ON p.user_id = c.user_id
 AND c.event_type = 'click'
 AND p.event_type = 'purchase'
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 1 HOUR
""", tags=("streaming", "join"))
def stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: clicks joined to purchases by the same
    user within the following hour, both sides genuinely streaming.

    The event-time range condition plus per-side watermarks is what
    bounds the join state at scale — without them Spark must buffer
    both streams forever. Inner-join matches emit eagerly (no watermark
    wait), so a bounded replay produces exactly the batch join and the
    oracle checks it row-for-row. At 100 TB-rate streams the state
    store holds only ~1 h of clicks + purchases per key."""
    clicks = (events_stream(spark, sf_dir)
              .filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("c_ts"))
              .withWatermark("c_ts", "1 hour"))
    purchases = (events_stream(spark, sf_dir)
                 .filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("p_ts"))
                 .withWatermark("p_ts", "1 hour"))
    joined = (clicks.join(
        purchases,
        F.expr("p_user = c_user AND "
               "p_ts >= c_ts AND p_ts <= c_ts + interval 1 hour"),
        "inner")
        .select(F.col("c_user").alias("user_id"), "click_id", "purchase_id"))
    # r13 (guide §1.2): an INNER stream-stream join emits every match
    # eagerly in the data batches — the trailing zero-row watermark
    # batch only evicts state (measured: 5.7 s of the 16.2 s wall,
    # pure state-store commit churn across 32 partitions × 4 stores)
    # and this bounded replay wipes its checkpoint on every run anyway.
    # Skip it for THIS query only: output is row-identical
    # (oracle-checked). stream_join_outer MUST keep the no-data batch —
    # it is what emits the null-extended rows once the watermark
    # proves no match can arrive.
    conf = spark.conf
    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    old = conf.get(key, "true")
    conf.set(key, "false")
    try:
        return run_available_now(joined, sf_dir, "stream_join")
    finally:
        conf.set(key, old)


@register("stream_static_join", oracle="""
WITH dim AS (
  SELECT user_id, strftime(date_trunc('day', MIN(ts)), '%Y-%m-%d')
           AS cohort_day
  FROM events GROUP BY user_id
)
SELECT e.event_type, d.cohort_day, COUNT(*) AS n_events
FROM events e JOIN dim d ON d.user_id = e.user_id
GROUP BY e.event_type, d.cohort_day
""", tags=("streaming", "join"))
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the streaming event feed enriched against a
    STATIC dimension frame (per-user cohort day, computed batch-side) —
    the broadcast-per-microbatch enrichment every streaming pipeline
    does for user/device/geo lookups. No watermark needed on the static
    side (it has no event time); the stream side aggregates after the
    join, so complete output mode emits the final counts on bounded
    replay, which the oracle verifies exactly."""
    from ..io import load_table

    dim = (load_table(spark, sf_dir, "events")
           .groupBy("user_id")
           .agg(F.date_format(F.date_trunc("day", F.min("ts")),
                              "yyyy-MM-dd").alias("cohort_day")))
    s = events_stream(spark, sf_dir)
    agg = (s.join(F.broadcast(dim), "user_id")
           .groupBy("event_type", "cohort_day")
           .agg(F.count(F.lit(1)).alias("n_events")))
    return run_available_now(agg, sf_dir, "stream_static_join",
                             output_mode="complete")


@register("stream_state_inspect", oracle="""
SELECT event_type, COUNT(*) AS n_events
FROM events
GROUP BY event_type
""", tags=("streaming", "statestore"))
def stream_state_inspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-store introspection (Spark 4 `statestore` read format): run
    a streaming aggregation to a checkpoint, then read the aggregation
    STATE itself back as a DataFrame — the debugging/ops path for
    inspecting what a live 100 TB streaming job holds in state without
    touching the job. On a bounded replay the final state is exactly
    the batch aggregate, which the oracle verifies."""
    import shutil

    ckpt_root = derived_dir(sf_dir, "checkpoints")
    _reap_stale_checkpoints(ckpt_root, "state_inspect")
    ckpt = os.path.join(ckpt_root, f"state_inspect_pid{os.getpid()}")
    shutil.rmtree(ckpt, ignore_errors=True)
    s = events_stream(spark, sf_dir)
    agg = s.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    q = (agg.writeStream.format("memory")
         .queryName(f"state_inspect_{uuid.uuid4().hex[:8]}")
         .outputMode("complete")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    state = spark.read.format("statestore").load(ckpt)
    # the state value struct names fields after the PHYSICAL aggregate
    # (count(1)), not the output alias — introspect positionally.
    val_field = state.schema["value"].dataType.names[0]
    return state.select(F.col("key.event_type").alias("event_type"),
                        F.col(f"value.`{val_field}`").alias("n_events"))


@register("stream_sliding", oracle=f"""
WITH spans AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts)
           - INTERVAL 30 MINUTE * CAST(n AS INT) AS win_start,
         value
  FROM events, unnest([0, 1]) t(n)
)
SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM spans
GROUP BY win_start
""", tags=("streaming", "sliding"))
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows through the real streaming path: 1-hour windows
    every 30 minutes (each event lands in 2 windows), watermarked,
    complete-mode drain. The oracle rebuilds the same overlapping
    window assignment relationally: every event belongs to exactly two
    slide-aligned windows (its 30-min bucket and the one before), so
    it explodes each row into both. Batch analog: events_sliding."""
    s = events_stream(spark, sf_dir)
    agg = (s.withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
           .agg(F.count(F.lit(1)).alias("n_events"),
                dsum("value").alias("total_value"))
           .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("win_start"),
                   "n_events", "total_value"))
    return run_available_now(agg, sf_dir, "stream_sliding",
                             output_mode="complete")


@register("stream_join_outer", oracle="""
WITH c AS (SELECT user_id cu, event_id cid, ts cts FROM events
           WHERE event_type = 'click'),
p AS (SELECT user_id pu, event_id pid, ts pts FROM events
      WHERE event_type = 'purchase'),
wm AS (SELECT least((SELECT MAX(cts) FROM c), (SELECT MAX(pts) FROM p))
              - INTERVAL 1 HOUR AS w),
matched AS (
  SELECT cu, cid, pid FROM c JOIN p
    ON pu = cu AND pts >= cts AND pts <= cts + INTERVAL 1 HOUR
)
SELECT cu AS user_id, cid AS click_id, CAST(pid AS BIGINT) AS purchase_id
FROM matched
UNION ALL
SELECT cu, cid, CAST(NULL AS BIGINT)
FROM c, wm
WHERE cid NOT IN (SELECT cid FROM matched)
  AND cts + INTERVAL 1 HOUR < w
""", tags=("streaming", "join", "outer"))
def stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join: matched pairs emit eagerly (as in
    stream_join); an UNMATCHED click emits with a null purchase only
    once the watermark proves no future purchase can match it
    (wm > c_ts + 1h) — clicks newer than the horizon stay in state and
    are withheld, which is correct, not lossy: on a live stream they
    resolve later. The oracle encodes exactly that semantics: the
    final watermark is min(max click ts, max purchase ts) - 1h delay,
    and the null-extended rows are the unmatched clicks older than
    wm - 1h. This is the part of outer streaming joins every
    first-time user trips over, verified here row-for-row."""
    clicks = (events_stream(spark, sf_dir)
              .filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("c_ts"))
              .withWatermark("c_ts", "1 hour"))
    purchases = (events_stream(spark, sf_dir)
                 .filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("p_ts"))
                 .withWatermark("p_ts", "1 hour"))
    joined = (clicks.join(
        purchases,
        F.expr("p_user = c_user AND "
               "p_ts >= c_ts AND p_ts <= c_ts + interval 1 hour"),
        "left_outer")
        .select(F.col("c_user").alias("user_id"), "click_id", "purchase_id"))
    return run_available_now(joined, sf_dir, "stream_join_outer")


@register("stream_late_data", oracle=f"""
WITH b AS (SELECT MAX(ts) AS mx FROM events),
ontime AS (
  SELECT e.* FROM events e, b
  WHERE NOT (e.event_id % {LATE_MOD} = 0
             AND e.ts < b.mx - INTERVAL {LATE_HOURS} HOUR)
)
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
         AS bucket_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM ontime, b
WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= b.mx - INTERVAL 10 MINUTE
GROUP BY 1, 2
""", tags=("streaming", "watermark", "latedata"))
def stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch late-data drop, actually exercised: the events
    fixture replays as two micro-batches (maxFilesPerTrigger=1 over a
    staged on-time file + a staged late file). Batch 0 advances the
    watermark to max(ts) - 10 min, batch 1 re-confirms it (Spark's
    late-event filter lags one batch behind eviction), and batch 2 then
    delivers only rows >= 2 h older than that watermark, so the
    stateful aggregation must drop ALL of them — the behavior a
    single-batch availableNow replay never exercises (the round-2
    VERDICT's item 4). The oracle recomputes the surviving content in
    closed-form: on-time rows only, closed windows only. A companion
    test additionally asserts the dropped-row count from the state
    operator's numRowsDroppedByWatermark metric equals the staged late
    count and that >= 2 non-empty micro-batches ran."""
    s = events_stream_late(spark, sf_dir)
    agg = (s.withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
           .agg(F.count(F.lit(1)).alias("n_events"),
                dsum("value").alias("total_value"))
           .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("bucket_start"),
                   "event_type", "n_events", "total_value"))
    return run_available_now(agg, sf_dir, "stream_late_data",
                             output_mode="append")


@register("stream_tumbling_append", oracle=f"""
WITH wm AS (SELECT MAX(ts) - INTERVAL 10 MINUTE AS w FROM events)
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
         AS bucket_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events, wm
WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= w
GROUP BY 1, 2
""", tags=("streaming", "outputmode"))
def stream_tumbling_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode windowed aggregation: ONLY windows the watermark has
    closed (window end <= final watermark) ever emit — the still-open
    tail windows are withheld, which is append mode working as
    designed, not data loss (complete-mode variant: stream_tumbling).
    The oracle reproduces the exact emission rule: final watermark =
    max event time - 10 min delay, windows ending after it excluded.
    Together with stream_join_outer this pins down both of the
    watermark-gated emission behaviors users hit first."""
    s = events_stream(spark, sf_dir)
    agg = (s.withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
           .agg(F.count(F.lit(1)).alias("n_events"),
                dsum("value").alias("total_value"))
           .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("bucket_start"),
                   "event_type", "n_events", "total_value"))
    return run_available_now(agg, sf_dir, "stream_tumbling_append",
                             output_mode="append")


@register("stream_session_dynamic", oracle="""
WITH gapped AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'click' THEN INTERVAL '10 minutes'
              WHEN event_type = 'purchase' THEN INTERVAL '60 minutes'
              ELSE INTERVAL '30 minutes' END AS gap
  FROM events
), marked AS (
  SELECT user_id, ts, event_id, gap,
         CASE WHEN MAX(ts + gap) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR ts >= MAX(ts + gap) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_session
  FROM gapped
), sessions AS (
  -- ORDER BY must be the SAME total order as marked's window
  -- (ts, event_id): a ts-only ROWS frame leaves same-ts tie order
  -- unspecified, so session membership could flip nondeterministically.
  SELECT user_id, ts, gap,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
-- append-mode emission (same rule as stream_session's oracle): a
-- session is final only when the watermark (max event time - 1h) has
-- passed its window end MAX(ts + gap).
HAVING MAX(ts + gap)
         <= (SELECT MAX(ts) FROM events) - INTERVAL '1 hour'
""", tags=("streaming", "session"))
def stream_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap session windows under streaming execution — the
    stateful merge now has to unify sessions whose extents depend on
    each event's type (batch analog: events_session_dynamic).
    Oracle-backed as of round 7, like stream_session: the running
    MAX(ts + gap) islands construction plus the append-mode emission
    rule (watermark must pass the window end) reproduces the drained
    result exactly on the bounded replay."""
    s = events_stream(spark, sf_dir)
    gap = (F.when(F.col("event_type") == "click", "10 minutes")
           .when(F.col("event_type") == "purchase", "60 minutes")
           .otherwise("30 minutes"))
    agg = (s.withWatermark("ts", "1 hour")
           .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
           .agg(F.count(F.lit(1)).alias("n_events"))
           .select("user_id",
                   F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                    .alias("session_start"),
                   "n_events"))
    drained = run_available_now(agg, sf_dir, "stream_session_dynamic")
    return drained.orderBy("user_id", "session_start")


@register("stream_soak", oracle=None, tags=("streaming", "recovery", "soak"))
def stream_soak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-source soak with a mid-run checkpoint restart — the
    exactly-once recovery demo that needs no external jars: phase 1
    runs the built-in rate source (monotonic ``value`` column) through
    an idempotent foreachBatch parquet sink (one dir per batchId,
    overwrite on replay), is stopped mid-stream, and phase 2 RESUMES
    from the same checkpoint. The rate source's offsets live in the
    WAL, so the uncommitted in-flight batch replays with the same
    batchId and offset range, the overwrite makes the replay idempotent,
    and the union of both phases must be exactly {0..max} — no gaps
    (nothing lost at the crash point), no dupes (nothing double-written
    by the replay).

    The output is the run's INVARIANTS, not its wall-clock-dependent
    counts, so the rows-only determinism gate holds: contiguity, dupe
    count, resume evidence, and target-reached flags are all constants
    for any successful soak regardless of how many batches each phase
    happened to commit.
    """
    import shutil
    import time as _time

    ckpt_root = derived_dir(sf_dir, "checkpoints")
    _reap_stale_checkpoints(ckpt_root, "stream_soak")
    ckpt = os.path.join(ckpt_root, f"stream_soak_pid{os.getpid()}")
    out = os.path.join(derived_dir(sf_dir, "soak_sink"), f"pid{os.getpid()}")
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    def write_batch(bdf: DataFrame, bid: int) -> None:
        # Idempotent sink: a replayed batch id overwrites its own dir.
        (bdf.select("value").write.mode("overwrite")
         .parquet(os.path.join(out, f"batch={bid}")))

    def start_query():
        src = (spark.readStream.format("rate")
               .option("rowsPerSecond", 2000)
               .option("numPartitions", 2).load())
        return (src.writeStream.foreachBatch(write_batch)
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="250 milliseconds")
                .start())

    def drain_until(q, min_rows: int, timeout_s: float = 60.0) -> list:
        t0 = _time.monotonic()
        while _time.monotonic() - t0 < timeout_s:
            prog = list(q.recentProgress)
            if sum(p["numInputRows"] for p in prog) >= min_rows:
                break
            _time.sleep(0.2)
        prog = list(q.recentProgress)
        q.stop()                       # mid-run stop: in-flight batch aborts
        q.awaitTermination()
        return prog

    p1 = drain_until(start_query(), min_rows=1500)
    p2 = drain_until(start_query(), min_rows=3000)

    # Exactly-once read side: only COMMITTED batches count (the final
    # stop can abort one in-flight batch whose dir is partial and will
    # never be replayed — a transactional consumer filters on the commit
    # log, so the soak's reader does the same).
    try:
        committed = {int(f) for f in os.listdir(os.path.join(ckpt, "commits"))
                     if f.isdigit()}
    except OSError:
        committed = set()
    for entry in os.listdir(out):
        if entry.startswith("batch=") and \
                int(entry.split("=", 1)[1]) not in committed:
            shutil.rmtree(os.path.join(out, entry), ignore_errors=True)

    p1_ids = [p["batchId"] for p in p1] or [-1]
    p2_ids = [p["batchId"] for p in p2] or [-1]
    # Resume evidence: phase 2's batch ids strictly continue phase 1's
    # numbering (a fresh checkpoint would restart at 0). Phase 1 only
    # needs >= 1 committed batch — the rate source backfills startup
    # time into batch 0, so a slow start can satisfy min_rows with
    # batch 0 alone and that is still a healthy run.
    resumed = min(p2_ids) > max(p1_ids) >= 0

    if not committed:
        # Nothing ever committed (stalled run): report the failed
        # invariants instead of crashing on an empty read.
        return spark.createDataFrame(
            [(0, 0, 0, 0)],
            "contiguous int, n_dupes long, resumed_from_checkpoint int, "
            "target_reached int")

    vals = spark.read.parquet(out).select("value")
    stats = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("value").alias("nd"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx")).first()
    n, nd = int(stats["n"]), int(stats["nd"])
    mn = -1 if stats["mn"] is None else int(stats["mn"])
    mx = -1 if stats["mx"] is None else int(stats["mx"])
    return spark.createDataFrame(
        [(
            int(mn == 0 and nd == mx + 1 and n == nd),   # exactly {0..max}
            n - nd,                                      # dupes from replay
            int(resumed),
            int(n >= 4500),
        )],
        "contiguous int, n_dupes long, resumed_from_checkpoint int, "
        "target_reached int")


@register("stream_ohlc", oracle=f"""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       arg_min(value, printf('%020d-%012d', epoch_us(ts), event_id)) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       arg_max(value, printf('%020d-%012d', epoch_us(ts), event_id)) AS close,
       COUNT(*) AS n_ticks,
       {sql_dsum('value')} AS volume
FROM events
WHERE value IS NOT NULL
GROUP BY 1, 2
""", tags=("streaming", "timeseries", "ohlc"))
def stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candle bars built on the streaming path — the
    continuously-maintained version of the batch `events_ohlc`
    downsampler: readStream → watermark → day/type aggregation with
    min_by/max_by carrying the (key, value) extrema in streaming state
    (a few scalars per open bar, not the ticks). On the bounded
    availableNow replay nothing is late, so the drained table equals
    the batch bars and the oracle checks it exactly. Complete mode:
    the last open day never crosses the watermark. Open/close order on
    a zero-padded '(epoch_us)-(event_id)' string key: (type, ts) is
    measured unique in today's fixtures, but fixtures have been
    regenerated between rounds before, and with a bare ts key a single
    introduced tie would make open/close partition-order-dependent —
    the event_id suffix pins the winner on both engines (DuckDB's
    arg_min cannot order on a struct, hence the string). Positive
    epochs only — fine for the 2024 fixture domain."""
    s = events_stream(spark, sf_dir)
    key = F.format_string("%020d-%012d", F.unix_micros("ts"),
                          F.col("event_id"))
    agg = (s.filter(F.col("value").isNotNull())
           .withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
           .agg(F.min_by("value", key).alias("open"),
                F.max("value").alias("high"),
                F.min("value").alias("low"),
                F.max_by("value", key).alias("close"),
                F.count(F.lit(1)).alias("n_ticks"),
                dsum("value").alias("volume"))
           .select(F.date_format("w.start", "yyyy-MM-dd").alias("day"),
                   "event_type", "open", "high", "low", "close",
                   "n_ticks", "volume"))
    return run_available_now(agg, sf_dir, "stream_ohlc",
                             output_mode="complete")


_DRIFT_CUTOFF = "2024-01-11"  # first 10 fixture days form the reference


@register("stream_drift", oracle=f"""
WITH counts AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         least(CAST(floor(value / 50) AS BIGINT), 9) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY day, bucket
), ref AS (
  SELECT bucket, CAST(SUM(n) AS BIGINT) AS n_ref
  FROM counts WHERE day < '{_DRIFT_CUTOFF}' GROUP BY bucket
), days AS (
  SELECT DISTINCT day FROM counts WHERE day >= '{_DRIFT_CUTOFF}'
), domain AS (
  SELECT unnest(range(10)) AS bucket
), grid AS (
  SELECT d.day, b.bucket, COALESCE(r.n_ref, 0) AS n_ref,
         COALESCE(c.n, 0) AS n_cur
  FROM days d CROSS JOIN domain b
  LEFT JOIN ref r ON r.bucket = b.bucket
  LEFT JOIN counts c ON c.day = d.day AND c.bucket = b.bucket
), props AS (
  SELECT day, n_cur,
         (CAST(n_ref AS DOUBLE) + 0.5)
           / (CAST(SUM(n_ref) OVER (PARTITION BY day) AS DOUBLE) + 5.0)
           AS p_ref,
         (CAST(n_cur AS DOUBLE) + 0.5)
           / (CAST(SUM(n_cur) OVER (PARTITION BY day) AS DOUBLE) + 5.0)
           AS p_cur
  FROM grid
)
SELECT day,
       CAST(SUM(n_cur) AS BIGINT) AS n_events,
       ROUND(SUM(ROUND((p_cur - p_ref) * LN(p_cur / p_ref), 6)), 6) AS psi
FROM props GROUP BY day
""", tags=("streaming", "drift"))
def stream_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming drift monitor: the PSI gate of stats_psi run
    continuously — per-day micro-batched value-histogram counts
    (readStream → watermark → day+bucket agg → checkpointed drain),
    then each monitored day's distribution is scored against the
    frozen reference window (the first 10 fixture days) with the same
    Laplace-smoothed PSI. This is how a production ingest watches for
    upstream shifts: the heavy streaming state is just 10 counters per
    open day; the PSI math runs on the drained micro-frame.

    The grid is monitored days x the FIXED bucket domain 0..9 (a
    bounded cross join), not days x buckets-seen-in-reference: a value
    range the reference never produced is the loudest drift signal
    there is, and it must contribute its smoothed term rather than be
    silently dropped (n_ref = 0 is priced by the Laplace smoothing).
    Identical construction in the oracle. PSI sums pre-rounded terms
    per day (order-free at the 6-dp grid). On bounded replay the
    drained counts equal the batch counts exactly, so the whole monitor
    is oracle-checked end to end."""
    s = events_stream(spark, sf_dir)
    agg = (s.withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "1 day").alias("w"),
                    F.least(F.floor(F.col("value") / 50), F.lit(9))
                     .cast("long").alias("bucket"))
           .agg(F.count(F.lit(1)).alias("n"))
           .select(F.date_format("w.start", "yyyy-MM-dd").alias("day"),
                   "bucket", "n"))
    counts = run_available_now(agg, sf_dir, "stream_drift",
                               output_mode="complete")
    ref = (counts.where(F.col("day") < _DRIFT_CUTOFF)
           .groupBy("bucket").agg(F.sum("n").alias("n_ref_raw")))
    days = (counts.where(F.col("day") >= _DRIFT_CUTOFF)
            .select("day").distinct())
    domain = spark.range(10).select(F.col("id").alias("bucket"))
    cur = (counts.where(F.col("day") >= _DRIFT_CUTOFF)
           .select(F.col("day").alias("day_c"),
                   F.col("bucket").alias("bucket_c"),
                   F.col("n").alias("n_cur_raw")))
    grid = (days.crossJoin(F.broadcast(domain))
            .join(F.broadcast(ref), "bucket", "left")
            .join(cur, (F.col("day") == F.col("day_c"))
                  & (F.col("bucket") == F.col("bucket_c")), "left")
            .select("day", "bucket",
                    F.coalesce(F.col("n_ref_raw"), F.lit(0)).alias("n_ref"),
                    F.coalesce(F.col("n_cur_raw"), F.lit(0)).alias("n_cur")))
    from pyspark.sql import Window

    from ..functions.num import laplace_share, psi_term
    w_day = Window.partitionBy("day")
    p_ref = laplace_share("n_ref", F.sum("n_ref").over(w_day), cells=10)
    p_cur = laplace_share("n_cur", F.sum("n_cur").over(w_day), cells=10)
    terms = grid.select("day", "n_cur",
                        psi_term(p_cur, p_ref).alias("term"))
    return (terms.groupBy("day")
            .agg(F.sum("n_cur").alias("n_events"),
                 F.round(F.sum("term"), 6).alias("psi")))


@register("stream_topk", oracle="""
WITH c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
), r AS (
  SELECT user_id, n_events,
         ROW_NUMBER() OVER (ORDER BY n_events DESC, user_id) AS rank
  FROM c
)
SELECT rank, user_id, n_events FROM r WHERE rank <= 10
""", tags=("streaming", "topk"))
def stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming leaderboard: per-user event counts maintained in
    streaming state (one counter per user — the canonical
    update-in-place aggregation), drained complete, then ranked to the
    deterministic top-10 (count desc, user_id tiebreak — same explicit
    tie policy as agg_argmax). On bounded replay the drained counts
    equal the batch counts exactly, so the leaderboard is
    oracle-checked end to end.

    At scale the state is |active users| counters sharded by the
    groupBy key across the state store; the rank runs on the drained
    micro-frame, not in the stream — a production variant would
    foreachBatch the top-k into a serving table each trigger."""
    from pyspark.sql import Window

    s = events_stream(spark, sf_dir)
    counts = s.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    drained = run_available_now(counts, sf_dir, "stream_topk",
                                output_mode="complete")
    w = Window.orderBy(F.desc("n_events"), "user_id")
    return (drained.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= 10)
            .select("rank", "user_id", "n_events"))


def _semdedup_prior_batches(d: str, batch_id: int) -> list[str]:
    """Partition dirs ``batch=N`` with N < batch_id — the probe-read
    set for one trigger. Excluding the CURRENT batch id is what makes
    crash replay idempotent: a replayed batch's own (already-written)
    seen/band partitions must not be probed, or every vector in the
    batch would pair with itself (cos = 1), be classed a loser, and
    the replayed output partition would be overwritten as empty."""
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.startswith("batch="):
            try:
                n = int(f.split("=", 1)[1])
            except ValueError:
                continue
            if n < batch_id:
                out.append(os.path.join(d, f))
    return sorted(out)


def _semdedup_process_batch(batch_df: DataFrame, batch_id: int,
                            seen_dir: str, bands_dir: str,
                            out_dir: str, threshold: float = 0.45,
                            dim: int = 64, bits: int = 3,
                            n_bands: int = 12,
                            compact_every: int | None = None) -> None:
    """One stream_semantic_dedup trigger, exactly-once under replay.

    Buckets are computed ONCE per batch and persisted — each trigger
    pays |batch| hashing plus the band-index join; the accumulated
    corpus is touched only through the index and the id-keyed vector
    fetch for the residual, never re-hashed. All three stores (output,
    seen, band index) are batch-partitioned and OVERWRITTEN, and probe
    reads see only batch ids STRICTLY BELOW this one
    (:func:`_semdedup_prior_batches`), so a crash-replayed batch reads
    the same prior state as the original attempt and rewrites
    byte-identical partitions (pinned by
    test_semdedup_batch_replay_is_idempotent). Module-level so the
    replay contract is testable outside a running stream.

    ``compact_every=N`` (opt-in, round-8 verdict item 7) folds store
    maintenance into the stream itself: every N batches,
    :func:`semdedup_compact_stores` collapses all PRIOR partitions of
    both state stores before this batch probes them, bounding the
    small-file count at O(N x trigger-tasks) instead of growing one
    partition dir per batch forever. It runs at the START of the body
    with ``upto_batch=batch_id`` — only batches strictly below the
    current id are touched, so the strictly-below probe protocol and
    crash-replay idempotence are preserved exactly: a replayed batch
    re-compacts (a no-op on already-compacted stores) and probes the
    identical prior row SET, which is all survivor semantics depend
    on (byte-identical survivors asserted over a 52-batch drain in
    scripts/stream_semdedup_growth.py)."""
    from ..operators.dedup import _cosine_residual, signlsh_buckets

    spark = batch_df.sparkSession
    # Crash recovery BEFORE any probe: a crash inside a previous
    # compaction may have left a staged segment as the only complete
    # copy of deleted raw partitions — promote/discard it per the
    # manifest protocol so this batch's probes see the full prior set
    # even when compaction isn't due this trigger.
    _semdedup_recover_staged(seen_dir)
    _semdedup_recover_staged(bands_dir)
    if compact_every and batch_id > 0 and batch_id % compact_every == 0:
        # Tiered (LSM-style): merge only the newest tier's raw
        # partitions — O(tier) per call, amortized O(1) per batch.
        semdedup_compact_stores(spark, seen_dir, bands_dir,
                                upto_batch=batch_id,
                                since_batch=batch_id - compact_every)
        # Backstop: when accumulated segments exceed 8, one full
        # merge re-levels the store (amortized O(corpus / (8 *
        # compact_every)) per batch).
        if len(_semdedup_prior_batches(seen_dir, batch_id)) > 8:
            semdedup_compact_stores(spark, seen_dir, bands_dir,
                                    upto_batch=batch_id)
    batch = batch_df.localCheckpoint(eager=True)
    bands = signlsh_buckets(batch, dim, bits, n_bands).localCheckpoint(
        eager=True)
    wa = bands.select(F.col("vec_id").alias("id_a"), "band", "bucket")
    wb = bands.select(F.col("vec_id").alias("id_b"), "band", "bucket")
    within = (wa.join(wb, ["band", "bucket"])
              .filter(F.col("id_a") < F.col("id_b"))
              .select("id_a", "id_b").distinct())
    losers = (_cosine_residual(within, batch, batch, threshold,
                               "id_a", "id_b", "vec_id", "embedding")
              .select(F.col("id_b").alias("vec_id")))
    prior_bands = _semdedup_prior_batches(bands_dir, batch_id)
    prior_seen = _semdedup_prior_batches(seen_dir, batch_id)
    if prior_bands and prior_seen:
        idx = spark.read.parquet(*prior_bands)
        cand = (bands.select(F.col("vec_id").alias("new_id"),
                             "band", "bucket")
                .join(idx.select(F.col("vec_id").alias("corpus_id"),
                                 "band", "bucket"),
                      ["band", "bucket"])
                .select("new_id", "corpus_id").distinct())
        seen = spark.read.parquet(*prior_seen)
        cross = (_cosine_residual(cand, batch, seen, threshold,
                                  "new_id", "corpus_id",
                                  "vec_id", "embedding")
                 .select(F.col("new_id").alias("vec_id")))
        losers = losers.unionByName(cross)
    survivors = batch.join(losers.distinct(), "vec_id", "left_anti")
    # Idempotent per-batch output: a replayed batch overwrites its
    # own partition instead of double-appending.
    (survivors.select("vec_id", "label")
     .write.mode("overwrite")
     .parquet(os.path.join(out_dir, f"batch={batch_id}")))
    # State stores are batch-partitioned and overwritten, not
    # appended: a crash-replayed batch rewrites its own partition,
    # so the seen-store and band index stay exactly-once too.
    batch.write.mode("overwrite").parquet(
        os.path.join(seen_dir, f"batch={batch_id}"))
    bands.write.mode("overwrite").parquet(
        os.path.join(bands_dir, f"batch={batch_id}"))


def semdedup_compact_stores(spark: SparkSession, seen_dir: str,
                            bands_dir: str, upto_batch: int,
                            n_files: int = 4,
                            since_batch: int = 0) -> int:
    """Compact the semantic-dedup state stores: collapse every
    ``batch=N`` partition with since_batch <= N < upto_batch of BOTH
    stores into ONE coalesced partition each, named
    ``batch={upto_batch - 1}`` so the strictly-below probe protocol
    (:func:`_semdedup_prior_batches`) stays valid for every future
    batch id >= upto_batch. Survivor semantics are untouched — probes
    depend only on the SET of prior index rows, which compaction
    preserves (byte-identical next-batch survivors asserted in tests,
    and across a whole 52-batch auto-compacted drain in
    scripts/stream_semdedup_growth.py).

    ``since_batch=0`` (default) is FULL compaction — O(corpus)
    rewrite, the round-8 maintenance call. A nonzero ``since_batch``
    is one TIER of LSM-style tiered compaction: only the raw
    partitions of the newest tier merge into a segment, so the
    per-call cost is O(tier rows) regardless of corpus size — the
    shape a 100 TB always-on stream needs (the in-stream trigger in
    :func:`_semdedup_process_batch` uses this, with an occasional
    full merge bounding segment count). Any contiguous tail range is
    protocol-safe: batch ids only grow, so no future probe
    distinguishes the merged layout from the raw one.

    Run it between triggers (the stores are only read/written inside
    foreachBatch); the segment is staged under a ``_compacting``
    prefix that the probe-listing ignores. Crash-safety covers EVERY
    window, not just the write itself: after the staged segment is
    complete a ``_COVERED.json`` manifest (the list of source
    partition names) is written into it, and only then are the raw
    partitions deleted and the segment renamed into place. On entry,
    :func:`_semdedup_recover_staged` adjudicates any leftover staged
    dir — promoted when it is the only complete copy (some covered
    raw already deleted), discarded only when every covered raw still
    exists (raws authoritative). A crash mid-delete therefore never
    loses state-store rows. Returns the number of parquet files after
    compaction."""
    import shutil

    total = 0
    for store in (seen_dir, bands_dir):
        _semdedup_recover_staged(store)
        prior = [p for p in _semdedup_prior_batches(store, upto_batch)
                 if int(os.path.basename(p).split("=", 1)[1])
                 >= since_batch]
        if len(prior) <= 1:
            continue
        df = spark.read.parquet(*prior).coalesce(n_files)
        seg = os.path.join(store, f"batch={upto_batch - 1}")
        tmp = os.path.join(store, f"_compacting_{upto_batch - 1}")
        shutil.rmtree(tmp, ignore_errors=True)
        df.write.mode("overwrite").parquet(tmp)
        # Manifest LAST: its presence certifies the staged segment is
        # a complete copy of exactly these source partitions. Written
        # atomically (tmp file + rename) so a torn manifest can never
        # certify a torn segment.
        man_tmp = os.path.join(tmp, "_COVERED.json.tmp")
        with open(man_tmp, "w") as fh:
            json.dump(sorted(os.path.basename(p) for p in prior), fh)
        os.rename(man_tmp, os.path.join(tmp, "_COVERED.json"))
        for p in prior:
            if os.path.abspath(p) != os.path.abspath(seg):
                shutil.rmtree(p)
        # The segment name batch={upto-1} may itself be a covered raw
        # partition — remove it immediately before the rename so the
        # only-copy window is a single syscall wide (and recovery
        # covers even that).
        if os.path.isdir(seg):
            shutil.rmtree(seg)
        os.rename(tmp, seg)
    for store in (seen_dir, bands_dir):
        for root, _dirs, files in os.walk(store):
            total += sum(1 for f in files if f.endswith(".parquet"))
    return total


def _semdedup_recover_staged(store: str) -> None:
    """Adjudicate leftover ``_compacting_*`` staged segments from a
    crashed :func:`semdedup_compact_stores` run (see its docstring).

    - No ``_COVERED.json`` manifest → the stage itself crashed
      mid-write; the raw partitions are authoritative → discard.
    - Manifest present and EVERY covered raw partition still exists →
      the crash hit before any delete; raws authoritative → discard
      (compaction simply re-runs later).
    - Manifest present and ANY covered raw partition is missing → the
      staged segment is the only complete copy → PROMOTE: delete the
      surviving covered raws (strict subsets of the segment) and
      rename the stage to its ``batch=N`` segment name. Probes see
      the identical row set before and after.
    """
    import shutil

    if not os.path.isdir(store):
        return
    for f in sorted(os.listdir(store)):
        if not f.startswith("_compacting_"):
            continue
        tmp = os.path.join(store, f)
        if not os.path.isdir(tmp):
            continue
        man = os.path.join(tmp, "_COVERED.json")
        covered: list[str] = []
        if os.path.isfile(man):
            try:
                with open(man) as fh:
                    covered = json.load(fh)
            except (ValueError, OSError):
                covered = []
        if covered:
            missing = [c for c in covered
                       if not os.path.isdir(os.path.join(store, c))]
            if missing:
                seg = os.path.join(
                    store, "batch=" + f.split("_compacting_", 1)[1])
                for c in covered:
                    p = os.path.join(store, c)
                    if os.path.isdir(p):
                        shutil.rmtree(p)
                if os.path.isdir(seg):
                    shutil.rmtree(seg)
                os.rename(tmp, seg)
                continue
        shutil.rmtree(tmp, ignore_errors=True)


@register("stream_semantic_dedup", oracle="""
WITH qv AS (SELECT vec_id,
              list_transform(CAST(embedding AS DOUBLE[]),
                             x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS q
       FROM embeddings),
comp AS (SELECT vec_id, j, q[j + 1] AS val
         FROM qv, unnest(range(0, 64)) t(j)),
planes AS (SELECT p, j,
                  CASE WHEN CAST('0x' || substr(md5(CAST(p AS VARCHAR)
                                 || ':' || CAST(j AS VARCHAR)), 1, 2)
                            AS UBIGINT) % 2 = 0
                       THEN 1 ELSE -1 END AS c
           FROM range(0, 36) tp(p) CROSS JOIN range(0, 64) tj(j)),
proj AS (SELECT comp.vec_id, planes.p,
                SUM(comp.val * planes.c) AS s
         FROM comp JOIN planes ON comp.j = planes.j
         GROUP BY 1, 2),
buck AS (SELECT vec_id, CAST(p // 3 AS INT) AS band,
                SUM(CASE WHEN s >= 0
                         THEN (1 << CAST(p % 3 AS INT)) ELSE 0 END) AS bucket
         FROM proj GROUP BY 1, 2),
cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         FROM buck a JOIN buck b
           ON a.band = b.band AND a.bucket = b.bucket
              AND a.vec_id < b.vec_id),
losers AS (SELECT DISTINCT c.id_b
           FROM cand c
           JOIN embeddings ea ON ea.vec_id = c.id_a
           JOIN embeddings eb ON eb.vec_id = c.id_b
           WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                        CAST(eb.embedding AS DOUBLE[]))
                 >= 0.45)
SELECT e.vec_id, e.label
FROM embeddings e
WHERE e.vec_id NOT IN (SELECT id_b FROM losers)
""", tags=("streaming", "dedup", "embedding"))
def stream_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING semantic dedup — the sign-LSH keep-first pipeline run
    as a genuine incremental stream: the embedding corpus arrives as 5
    id-ordered micro-batches (file source, maxFilesPerTrigger=1, file
    mtimes force arrival order), and each batch's vectors are checked
    against (a) lower-id vectors of the SAME batch and (b) the
    accumulated seen-set from every earlier batch, via the same
    md5-plane LSH buckets + exact-cosine residual as
    dedup_embedding_lsh. Survivors append to the output sink;
    the WHOLE batch (survivors and losers) appends to the seen-store,
    which is what makes the contract exactly keep-first ("drop v iff
    some lower-id vector anywhere pairs with it") — id-ordered arrival
    then guarantees the streamed survivor set equals the BATCH oracle
    (dedup_embedding_lsh_keep's rule), so an incremental stateful
    pipeline lands under the driver's strongest gate.

    Scale shape — the production one: each trigger hashes ONLY its
    batch (buckets computed once, persisted), probes the accumulated
    (vec_id, band, bucket) BAND INDEX with an equality join, and
    fetches corpus vectors by id solely for the exact-cosine residual
    on collisions — the seen corpus is never re-hashed and never
    scanned outside the index join. Exactly-once comes from the
    checkpointed file source + idempotent per-batch output overwrite,
    same posture as stream_foreach_batch."""
    import shutil
    import time as _time

    ensure_runtime_confs(spark)
    fixture = os.path.join(sf_dir, "embeddings.parquet")
    src_dir = derived_dir(sf_dir, "semdedup_stream_src")
    if not _fingerprint_ok(src_dir, fixture):
        shutil.rmtree(src_dir, ignore_errors=True)
        os.makedirs(src_dir, exist_ok=True)
        e = spark.read.parquet(fixture)
        hi = e.agg(F.max("vec_id")).first()[0]
        n_files = 5
        step = ((int(hi) + 1) + n_files - 1) // n_files if hi is not None else 1
        base = _time.time() - 600
        for i in range(n_files):
            part = e.filter((F.col("vec_id") >= i * step)
                            & (F.col("vec_id") < (i + 1) * step))
            tmp = os.path.join(src_dir, f"_tmp_{i}")
            part.coalesce(1).write.mode("overwrite").parquet(tmp)
            src_file = next(f for f in os.listdir(tmp)
                            if f.endswith(".parquet"))
            dst = os.path.join(src_dir, f"{i:02d}.parquet")
            shutil.move(os.path.join(tmp, src_file), dst)
            shutil.rmtree(tmp, ignore_errors=True)
            # Strictly increasing mtimes: the file source orders files
            # by timestamp, which pins micro-batch order to id order.
            os.utime(dst, (base + 60 * i, base + 60 * i))
        _write_fingerprint(src_dir, fixture)

    state_root = derived_dir(sf_dir, "semdedup_stream_state")
    _reap_stale_checkpoints(state_root, "run")
    work = os.path.join(state_root, f"run_pid{os.getpid()}")
    shutil.rmtree(work, ignore_errors=True)
    seen_dir = os.path.join(work, "seen")
    bands_dir = os.path.join(work, "bands")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "_ckpt")

    schema = spark.read.parquet(src_dir).schema
    raw = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", "1")
           .parquet(src_dir))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # compact_every=3: the 5-batch fixture drain exercises one
        # in-stream compaction (at batch 3) under the oracle gate —
        # survivor semantics are probe-set-preserving by construction.
        _semdedup_process_batch(batch_df, batch_id,
                                seen_dir, bands_dir, out_dir,
                                compact_every=3)

    q = (raw.writeStream
         .foreachBatch(process)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        return spark.createDataFrame([], "vec_id long, label int")
    return (spark.read.parquet(os.path.join(out_dir, "batch=*"))
            .select("vec_id", F.col("label").cast("int").alias("label"))
            .orderBy("vec_id"))


@register("stream_custom_source", oracle=f"""
SELECT CAST(user_id % 8 AS BIGINT) AS bucket,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY user_id % 8
""", tags=("streaming", "source", "custom"))
def stream_custom_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python STREAMING data source end-to-end (Spark 4
    ``DataSourceStreamReader``): events staged as binrec shards, then
    read back through ``spark.readStream.format("binrec")`` — shard
    count IS the offset, each micro-batch a contiguous shard range
    (sources/binrec.py BinRecStreamReader) — into a complete-mode
    running aggregation drained by availableNow. The oracle computes
    the same per-bucket aggregate from the original table, so one
    dropped/duplicated record across the offset math fails the gate.
    This is the no-JVM-connector path for streaming a proprietary
    wire format: the same offset/partitions/read/commit contract a
    Kafka source implements, minus the jar.

    ``shardsPerTrigger=2`` rate-limits each latestOffset call, so the
    6-shard stage drains over ≥3 genuine micro-batches (asserted via
    LAST_RUN_PROGRESS in tests/test_streaming.py) — exercising
    offset-range planning and cross-batch state, not a one-shot read.
    availableNow cannot drive a rate-limited Python source (it reads
    ONE latestOffset and stops — measured: 2 of 6 shards), so the
    drain is a processingTime loop that polls the complete-mode sink
    until the running total equals the staged row count, then stops —
    the stream_soak drain pattern."""
    import shutil
    import time as _time

    from ..sources import binrec

    e = load_table(spark, sf_dir, "events")
    total = e.count()    # bounded scalar: the drain's stop condition
    if total == 0:       # nothing to stage: no shards for the reader
        return spark.createDataFrame(
            [], "bucket long, n_events long, total_value double")
    # pid-suffixed like the checkpoint below: stage_binrec deletes
    # existing .bin files first, so a shared dir would let two
    # concurrent runs clobber each other's shards mid-stream.
    out = derived_dir(sf_dir, "binrec_events_stream", f"pid{os.getpid()}")
    binrec.stage_binrec(e.repartition(6), out)
    binrec.register(spark)
    # Durable rate-limit base (sources/binrec.py): a RESTARTED reader
    # caps from the committed floor instead of 0. Lifecycle matches
    # the checkpoint exactly — this run wipes its checkpoint below, so
    # the progress file resets with it (a leftover floor from a prior
    # run would defeat rate-limiting for a fresh query).
    progress = os.path.join(out, "_progress")
    if os.path.exists(progress):
        os.remove(progress)
    raw = (spark.readStream.format("binrec")
           .option("path", out)
           .option("shardsPerTrigger", "2")
           .option("progressFile", progress)
           .load())
    agg = (raw.groupBy((F.col("user_id") % 8).cast("long").alias("bucket"))
           .agg(F.count(F.lit(1)).alias("n_events"),
                dsum("value").alias("total_value")))
    name = "stream_custom_source"
    query_name = f"{name}_{uuid.uuid4().hex[:8]}"
    ckpt_root = derived_dir(sf_dir, "checkpoints")
    _reap_stale_checkpoints(ckpt_root, name)
    ckpt = os.path.join(ckpt_root, f"{name}_pid{os.getpid()}")
    shutil.rmtree(ckpt, ignore_errors=True)
    q = (agg.writeStream.format("memory").queryName(query_name)
         .outputMode("complete")
         .option("checkpointLocation", ckpt)
         .trigger(processingTime="0 seconds")
         .start())
    t0 = _time.monotonic()
    done = None
    while _time.monotonic() - t0 < 120.0:
        done = spark.table(query_name).agg(
            F.sum("n_events").alias("n")).first()["n"]
        if done is not None and int(done) == total:
            break
        _time.sleep(0.3)
    q.stop()
    q.awaitTermination()
    global LAST_RUN_PROGRESS
    LAST_RUN_PROGRESS = list(q.recentProgress)
    if done is None or int(done) != total:
        # Fail loudly at the timeout, not later as a confusing oracle
        # mismatch on a silently-partial complete-mode table.
        raise TimeoutError(
            f"stream_custom_source drain timed out: observed "
            f"n_events={done} of staged {total} after 120s")
    return spark.table(query_name)


# --------------------------------------------------------------------------
# Streaming IMAGE dedup (round 12): the dHash/MIH keep-first pipeline
# as a genuine incremental stream — the image companion of
# stream_semantic_dedup, same store discipline (batch-partitioned
# overwrite, strictly-below probes, id-ordered arrival makes the
# streamed survivor set EQUAL the batch keep-first oracle).

def _stage_id_ordered_doc_files(spark: SparkSession, sf_dir: str,
                                dirname: str, n_files: int = 5) -> str:
    """Stage the documents fixture as ``n_files`` id-ordered,
    mtime-pinned parquet files (one per micro-batch under
    maxFilesPerTrigger=1) — shared by stream_image_dedup and
    stream_url_dedup. Fingerprinted against the fixture so re-runs
    reuse the staging."""
    import shutil
    import time as _time

    fixture = os.path.join(sf_dir, "documents.parquet")
    src_dir = derived_dir(sf_dir, dirname)
    if not _fingerprint_ok(src_dir, fixture):
        shutil.rmtree(src_dir, ignore_errors=True)
        os.makedirs(src_dir, exist_ok=True)
        d = spark.read.parquet(fixture).select("doc_id")
        hi = d.agg(F.max("doc_id")).first()[0]
        step = ((int(hi) + 1) + n_files - 1) // n_files if hi is not None else 1
        base = _time.time() - 600
        for i in range(n_files):
            part = d.filter((F.col("doc_id") >= i * step)
                            & (F.col("doc_id") < (i + 1) * step))
            tmp = os.path.join(src_dir, f"_tmp_{i}")
            part.coalesce(1).write.mode("overwrite").parquet(tmp)
            src_file = next(f for f in os.listdir(tmp)
                            if f.endswith(".parquet"))
            dst = os.path.join(src_dir, f"{i:02d}.parquet")
            shutil.move(os.path.join(tmp, src_file), dst)
            shutil.rmtree(tmp, ignore_errors=True)
            os.utime(dst, (base + 60 * i, base + 60 * i))
        _write_fingerprint(src_dir, fixture)
    return src_dir


def _imgdedup_process_batch(batch_df: DataFrame, batch_id: int,
                            codes_dir: str, chunks_dir: str,
                            out_dir: str, radius: int = 6) -> None:
    """One stream_image_dedup trigger, exactly-once under replay.

    Each trigger paints + dHashes ONLY its batch (two Arrow stages),
    derives the batch's (doc_id, c, chunk_val) MIH chunk rows once,
    finds same-batch losers via the chunk self-join, probes the
    accumulated PRIOR chunk index for cross-batch collisions (exact
    popcount on the code fetch — the corpus is never re-hashed), and
    writes survivors + its own codes/chunks partitions with
    overwrite. Probes read batch ids STRICTLY BELOW this one
    (_semdedup_prior_batches, shared protocol), so crash replay is
    idempotent — pinned by test_imgdedup_batch_replay_is_idempotent."""
    from ..queries.multimodal2 import (_CHUNK_BITS, _N_CHUNKS,
                                       _dhash_images, _synth_images)

    spark = batch_df.sparkSession
    batch = batch_df.localCheckpoint(eager=True)
    bmps = batch.select("doc_id").mapInPandas(
        _synth_images, "doc_id long, payload binary")
    codes = bmps.mapInPandas(
        _dhash_images, "doc_id long, code long").localCheckpoint(
        eager=True)
    mask = (1 << _CHUNK_BITS) - 1
    chunks = codes.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("c"),
                     (F.shiftright("code", _CHUNK_BITS * c)
                      .bitwiseAND(F.lit(mask))).alias("chunk_val"))
            for c in range(_N_CHUNKS)])).alias("ch"))
    chunks = chunks.select("doc_id", F.col("ch.c").alias("c"),
                           F.col("ch.chunk_val").alias("chunk_val")) \
        .localCheckpoint(eager=True)
    ham = F.bit_count(F.col("_ca").bitwiseXOR(F.col("_cb"))).cast("int")
    ca = codes.select(F.col("doc_id").alias("id_a"),
                      F.col("code").alias("_ca"))
    cb = codes.select(F.col("doc_id").alias("id_b"),
                      F.col("code").alias("_cb"))
    wa = chunks.select(F.col("doc_id").alias("id_a"), "c", "chunk_val")
    wb = chunks.select(F.col("doc_id").alias("id_b"), "c", "chunk_val")
    losers = (wa.join(wb, ["c", "chunk_val"])
              .filter(F.col("id_a") < F.col("id_b"))
              .select("id_a", "id_b").distinct()
              .join(ca, "id_a").join(cb, "id_b")
              .filter(ham <= radius)
              .select(F.col("id_b").alias("doc_id")))
    prior_chunks = _semdedup_prior_batches(chunks_dir, batch_id)
    prior_codes = _semdedup_prior_batches(codes_dir, batch_id)
    if prior_chunks and prior_codes:
        idx = spark.read.parquet(*prior_chunks)
        seen = spark.read.parquet(*prior_codes)
        cross = (chunks.select(F.col("doc_id").alias("id_a"),
                               "c", "chunk_val")
                 .join(idx.select(F.col("doc_id").alias("id_b"),
                                  "c", "chunk_val"),
                       ["c", "chunk_val"])
                 .select("id_a", "id_b").distinct()
                 .join(ca, "id_a")
                 .join(seen.select(F.col("doc_id").alias("id_b"),
                                   F.col("code").alias("_cb")), "id_b")
                 .filter(ham <= radius)
                 .select(F.col("id_a").alias("doc_id")))
        losers = losers.unionByName(cross)
    survivors = codes.join(losers.distinct(), "doc_id", "left_anti")
    (survivors.select("doc_id")
     .write.mode("overwrite")
     .parquet(os.path.join(out_dir, f"batch={batch_id}")))
    codes.write.mode("overwrite").parquet(
        os.path.join(codes_dir, f"batch={batch_id}"))
    chunks.write.mode("overwrite").parquet(
        os.path.join(chunks_dir, f"batch={batch_id}"))


def _imgdedup_oracle() -> str:
    """Keep-first over the closed-form dHash codes: a doc survives iff
    no lower-id doc is within Hamming radius 6 — the batch rule the
    id-ordered stream provably equals (same argument as
    stream_semantic_dedup: the radius relation is symmetric, and
    same-batch + prior-batch probes cover exactly the lower ids)."""
    from ..queries.multimodal2 import _CODES_CTE
    return f"""
WITH {_CODES_CTE},
losers AS (SELECT DISTINCT b.doc_id
           FROM codes a JOIN codes b ON a.doc_id < b.doc_id
           WHERE bit_count(xor(a.code, b.code)) <= 6)
SELECT d.doc_id
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
ORDER BY d.doc_id
"""


@register("stream_image_dedup", oracle=_imgdedup_oracle(),
          tags=("streaming", "dedup", "multimodal", "image"))
def stream_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING image dedup — dHash + MIH keep-first as an
    incremental stream: documents arrive in 5 id-ordered micro-batches
    (file source, maxFilesPerTrigger=1, mtime-pinned order); each
    batch's images are painted + hashed ONCE, checked against
    lower-id images of the same batch and the accumulated chunk index
    of every earlier batch, survivors appended, the WHOLE batch
    appended to the code/chunk stores (keep-first: drop doc iff some
    lower-id doc anywhere is within Hamming radius 6 — id-ordered
    arrival makes the streamed survivor set equal the batch rule).

    Oracle-backed end to end (DuckDB replays the closed-form codes
    and the keep-first rule brute-force), and replay idempotence is
    pinned by test_imgdedup_batch_replay_is_idempotent. Scale shape:
    per trigger, |batch| hashing + chunk-index equality join; the
    corpus is touched only through the index and the id-keyed code
    fetch."""
    import shutil
    import time as _time

    ensure_runtime_confs(spark)
    src_dir = _stage_id_ordered_doc_files(spark, sf_dir,
                                          "imgdedup_stream_src")

    state_root = derived_dir(sf_dir, "imgdedup_stream_state")
    _reap_stale_checkpoints(state_root, "run")
    work = os.path.join(state_root, f"run_pid{os.getpid()}")
    shutil.rmtree(work, ignore_errors=True)
    codes_dir = os.path.join(work, "codes")
    chunks_dir = os.path.join(work, "chunks")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "_ckpt")

    raw = (spark.readStream.schema("doc_id long")
           .option("maxFilesPerTrigger", "1")
           .parquet(src_dir))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        _imgdedup_process_batch(batch_df, batch_id,
                                codes_dir, chunks_dir, out_dir)

    q = (raw.writeStream
         .foreachBatch(process)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        return spark.createDataFrame([], "doc_id long")
    return (spark.read.parquet(os.path.join(out_dir, "batch=*"))
            .select("doc_id").orderBy("doc_id"))


# --------------------------------------------------------------------------
# Streaming CRAWL FRONTIER (round 12, continuation session): canonical-
# URL dedup as an incremental stream — the cheapest dedup tier of a
# crawl pipeline (web_url_dedup's rule) under the stream_image_dedup /
# stream_semantic_dedup store discipline.

def _urldedup_process_batch(batch_df: DataFrame, batch_id: int,
                            frontier_dir: str, out_dir: str) -> None:
    """One stream_url_dedup trigger, exactly-once under replay: derive
    the batch's canonical URLs (pure column work — no fetch, no
    Python), drop same-batch docs whose canonical URL appears at a
    lower id, anti-join the accumulated FRONTIER store (canonical
    URLs of every prior batch), then write survivors + the batch's
    own frontier partition with overwrite. Prior-batch probes read
    STRICTLY BELOW this batch id, so a crash-replayed trigger never
    probes its own half-written partition."""
    from pyspark.sql import Window

    from ..queries.web import _canon_col, _raw_url_col

    w = Window.partitionBy("canon_url")
    batch = (batch_df
             .select("doc_id", _canon_col(_raw_url_col())
                     .alias("canon_url"))
             .localCheckpoint(eager=True))
    firsts = (batch.withColumn("_k", F.min("doc_id").over(w))
              .filter(F.col("doc_id") == F.col("_k"))
              .select("doc_id", "canon_url"))
    prior = _semdedup_prior_batches(frontier_dir, batch_id)
    if prior:
        seen = batch_df.sparkSession.read.parquet(*prior)
        firsts = firsts.join(seen.select("canon_url"),
                             "canon_url", "left_anti")
    (firsts.select("doc_id")
     .write.mode("overwrite")
     .parquet(os.path.join(out_dir, f"batch={batch_id}")))
    (batch.select("canon_url").distinct()
     .write.mode("overwrite")
     .parquet(os.path.join(frontier_dir, f"batch={batch_id}")))


@register("stream_url_dedup", oracle="""
WITH raw AS (SELECT doc_id,
  'https://'
  || CASE WHEN doc_id % 2 = 1
          THEN upper('cdn.src' || CAST(doc_id % 5 AS VARCHAR)
                     || '.example.com')
          ELSE 'cdn.src' || CAST(doc_id % 5 AS VARCHAR)
               || '.example.com' END
  || CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END
  || '/doc/' || CAST(doc_id % 40 AS VARCHAR)
  || '?utm_source=feed&id=' || CAST(doc_id % 40 AS VARCHAR)
  || '&UTM_campaign=c' || CAST(doc_id % 3 AS VARCHAR)
  || '&utm_content=' || CAST(doc_id AS VARCHAR)
  || CASE WHEN doc_id % 4 = 2 THEN '#sec2' ELSE '' END AS raw_url
  FROM documents),
sp AS (SELECT doc_id, raw_url,
              lower(COALESCE(regexp_extract(raw_url,
                  '^https://([^/?#]+)', 1), '')) AS hostport,
              COALESCE(regexp_extract(raw_url,
                  '^https://[^/?#]+([^?#]*)', 1), '') AS path,
              COALESCE(regexp_extract(raw_url, '\\?([^#]*)', 1), '')
                AS query
       FROM raw),
canon AS (
  SELECT doc_id,
         'https://' || regexp_replace(hostport, ':443$', '') || path ||
         CASE WHEN kept = '' THEN '' ELSE '?' || kept END AS canon_url
  FROM (SELECT doc_id, hostport, path,
               array_to_string(list_filter(string_split(query, '&'),
                   x -> x <> '' AND NOT starts_with(lower(x), 'utm_')),
                   '&') AS kept
        FROM sp))
SELECT doc_id FROM (
  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY canon_url) AS k
  FROM canon)
WHERE doc_id = k
ORDER BY doc_id
""", tags=("streaming", "dedup", "web", "url"))
def stream_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING canonical-URL dedup — the crawl FRONTIER as an
    incremental stream: documents arrive in 5 id-ordered
    micro-batches; each trigger canonicalizes ONLY its batch's URLs,
    keeps same-batch firsts, anti-joins the accumulated frontier
    store (canonical URLs of all prior batches), and appends both the
    survivors and its own frontier partition. Id-ordered arrival
    makes the streamed survivor set EQUAL the batch keep-first rule
    (web_url_dedup's min-doc_id-per-canon), which the oracle replays
    in one window. Scale shape per trigger: |batch| string work + one
    hash-keyed anti-join against the frontier — the frontier is only
    ever probed by equality, never scanned pairwise, and the store
    grows by |batch distinct| canonical strings per trigger. Replay
    idempotence pinned by test_urldedup_batch_replay_is_idempotent."""
    import shutil

    ensure_runtime_confs(spark)
    src_dir = _stage_id_ordered_doc_files(spark, sf_dir,
                                          "urldedup_stream_src")
    state_root = derived_dir(sf_dir, "urldedup_stream_state")
    _reap_stale_checkpoints(state_root, "run")
    work = os.path.join(state_root, f"run_pid{os.getpid()}")
    shutil.rmtree(work, ignore_errors=True)
    frontier_dir = os.path.join(work, "frontier")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "_ckpt")

    raw = (spark.readStream.schema("doc_id long")
           .option("maxFilesPerTrigger", "1")
           .parquet(src_dir))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        _urldedup_process_batch(batch_df, batch_id, frontier_dir, out_dir)

    q = (raw.writeStream
         .foreachBatch(process)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        return spark.createDataFrame([], "doc_id long")
    return (spark.read.parquet(os.path.join(out_dir, "batch=*"))
            .select("doc_id").orderBy("doc_id"))
