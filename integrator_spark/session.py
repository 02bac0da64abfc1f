"""SparkSession construction and runtime configuration.

Two paths:
- ``build_session()`` — used by tests/bench when we own the session.
- ``ensure_runtime_confs(spark)`` — used inside every query entry point
  because the verification driver owns the session; all confs we need
  are runtime-settable SQL confs (verified on pyspark 4.1.2).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: SQL confs that are safe (and required) to set at runtime on a
#: driver-owned session.
RUNTIME_CONFS: dict[str, str] = {
    # /root/testdata/*/events.parquet stores TIMESTAMP(NANOS), which the
    # vectorized reader rejects; read as long and convert in the loader
    # (FIXTURES.md "nanosecond-timestamp gotcha").
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic rendering of timestamps regardless of machine TZ so
    # the DuckDB oracle (naive timestamps) and Spark agree.
    "spark.sql.session.timeZone": "UTC",
    # Runtime re-planning: shuffle-partition coalescing + skew-join
    # splitting — the first line of defense at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas_udf / mapInPandas / applyInPandas boundary,
    # and for UDTF evaluation (BatchEvalPythonUDTF -> ArrowEvalPythonUDTF).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.pythonUDTF.arrow.enabled": "true",
    # Size shuffles for the local fixture scale (AQE coalesces batch
    # shuffles anyway, but streaming state partitioning is fixed at the
    # first checkpoint and does not go through AQE). On a cluster this
    # would be 2-3x total cores instead.
    "spark.sql.shuffle.partitions": "32",
}


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via addPyFile.

    Pandas-UDF closures reference module-level kernels, which pickle by
    *reference* — so every worker must be able to import
    ``integrator_spark``. On a real cluster this zip ride-along is the
    standard deployment; in local mode it also covers driver processes
    whose CWD isn't the repo root (e.g. the verification driver).
    """
    sc = spark.sparkContext
    if getattr(sc, "_integrator_spark_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(tempfile.gettempdir(),
                            f"integrator_spark_pkg_{os.getpid()}.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    arc = os.path.join("integrator_spark",
                                       os.path.relpath(full, pkg_dir))
                    zf.write(full, arc)
    sc.addPyFile(zip_path)
    sc._integrator_spark_shipped = True


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing (driver-owned) session.

    Memoized per session object: every query entry point calls this
    (often several times via load_table), and the ~10 py4j conf.set
    round trips cost 20-100 ms per *query build* — pure overhead once
    the session is configured."""
    if getattr(spark, "_integrator_confs_applied", False):
        return spark
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf not recognized/settable on this build — non-fatal.
            pass
    try:
        _ship_package(spark)
    except Exception:
        # Local-mode sessions launched from the repo root still work via CWD.
        pass
    try:
        spark._integrator_confs_applied = True
    except Exception:
        pass
    return spark


def build_session(app_name: str = "integrator-spark",
                  cpus: int | None = None,
                  shuffle_partitions: int | None = None) -> SparkSession:
    """Build a local session sized for the fixture scale factors.

    On a real cluster the same code runs unchanged; only master/memory
    sizing differs. ``spark.sql.shuffle.partitions`` defaults to the
    local core count — at cluster scale you would leave AQE to coalesce
    from a larger initial number (or set 2-3x total cores).
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    shuffle_partitions = shuffle_partitions or cpus
    # Before the JVM (and its Python-worker daemons) launch: see
    # integrator_spark.__init__._disable_numpy_thp_madvise — workers
    # inherit this env, so numpy in every worker skips the THP
    # madvise that is ~450x slower to fault on this kernel.
    os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Cluster posture for the same THP guard (inert in local mode,
        # where workers inherit the driver env set above).
        .config("spark.executorEnv.NUMPY_MADVISE_HUGEPAGE",
                os.environ.get("NUMPY_MADVISE_HUGEPAGE", "0"))
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def build_durable_session(warehouse_dir: str,
                          app_name: str = "integrator-spark-durable",
                          cpus: int | None = None,
                          shuffle_partitions: int | None = None) -> SparkSession:
    """Like :func:`build_session`, but with a PERSISTENT catalog: table
    metadata (including bucketing specs) lives in an embedded Derby
    metastore under ``warehouse_dir``, so a ``saveAsTable(bucketBy)``
    layout written in one job is visible — still bucketed, still
    zero-Exchange joinable — in every later session that points at the
    same warehouse. This is the durable-layout strategy for repeated
    fact-fact joins at 100 TB: pay the bucketing shuffle once at ingest,
    reuse it across jobs (in-memory catalogs forget the bucketing spec
    on session exit, silently reintroducing the shuffle).

    Uses the Hive metastore jars pyspark already ships (hive-metastore
    2.3 + Derby); no external service. On a real cluster you'd point
    ``ConnectionURL`` at a shared metastore DB (or use a lakehouse
    catalog) instead of embedded Derby — everything else is identical.
    Cross-session behavior is proven in tests/test_bucketing.py
    (two separate driver processes, zero-Exchange assert in the second).
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    shuffle_partitions = shuffle_partitions or cpus
    wh = os.path.abspath(warehouse_dir)
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.warehouse.dir", wh)
        # Embedded Derby db colocated with the warehouse: the metastore
        # travels with the data directory, nothing global is touched.
        .config("javax.jdo.option.ConnectionURL",
                f"jdbc:derby:;databaseName={wh}/metastore_db;create=true")
        .enableHiveSupport()
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
