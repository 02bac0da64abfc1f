"""Plan-audit gate: scale invariants over every registered query
(SURVEY.md M5). Streaming queries are excluded (their call drains a
stream; their plans are covered by execution tests).
"""

from __future__ import annotations

import pytest

from integrator_spark.plans.audit import audit_plan, violations
from integrator_spark.registry import all_specs

from .conftest import TEST_SF_DIR

SPECS = {n: s for n, s in all_specs().items() if not n.startswith("stream_")}


@pytest.mark.parametrize("name", sorted(SPECS), ids=sorted(SPECS))
def test_plan_has_no_scale_violations(name, spark):
    df = SPECS[name].fn(spark, TEST_SF_DIR)
    findings = audit_plan(name, df)
    bad = violations(findings)
    assert not bad, f"{name}: {bad}\n{findings.plan[:4000]}"


STREAM_AUDITED = sorted(
    __import__("integrator_spark.plans.audit",
               fromlist=["STREAM_STATE_EXPECTED"]).STREAM_STATE_EXPECTED)


@pytest.mark.parametrize("name", STREAM_AUDITED, ids=STREAM_AUDITED)
def test_stream_plan_has_no_scale_violations(name, spark):
    """Round-10 verdict item 5: the streaming face of the batch gate
    above. Each stateful stream_* job is drained once (availableNow at
    the test fixture), then its captured last-execution plan and
    progress are audited with the same allowlist discipline: no
    cartesian, no row-Python, the EXPECTED state-store operator
    actually executed, a watermark present unless the job's state is
    the product by design, and state operators report shuffle
    partitioning. Jobs with custom sinks (foreachBatch /
    crash-restart / custom source) are covered by their own dedicated
    execution tests and are out of this parametrization by
    construction (they do not route through run_available_now)."""
    from integrator_spark.plans.audit import stream_violations
    from integrator_spark.registry import all_specs
    from integrator_spark.streaming.jobs import LAST_STREAM_AUDITS

    all_specs()[name].fn(spark, TEST_SF_DIR).collect()
    audit = LAST_STREAM_AUDITS.get(name)
    assert audit is not None, f"{name}: no drain captured"
    assert audit["plan"], f"{name}: empty plan capture"
    bad = stream_violations(name, audit["plan"], audit["progress"])
    assert not bad, f"{name}: {bad}\n{audit['plan'][:4000]}"


def test_q1_scan_prunes_and_pushes(spark):
    """The flagship scan must push the shipdate filter into Parquet and
    read only the referenced columns."""
    df = SPECS["q1_pricing_summary"].fn(spark, TEST_SF_DIR)
    f = audit_plan("q1_pricing_summary", df)
    assert any("l_shipdate" in p for p in f.pushed_filters), f.plan[:2000]
    assert "l_comment" not in f.plan  # no such column, sanity
    # Column pruning: partkey/suppkey are never referenced by q1.
    assert "l_partkey" not in f.plan.split("ReadSchema")[-1]


def test_q5_broadcasts_dimensions(spark):
    df = SPECS["q5_nation_revenue"].fn(spark, TEST_SF_DIR)
    f = audit_plan("q5_nation_revenue", df)
    assert "BroadcastHashJoin" in f.plan


def test_partitioned_scan_prunes_partitions(spark):
    """The partition-key filter must become a PartitionFilter (directory
    pruning), not a row-level post-filter."""
    import re
    from integrator_spark.plans.audit import plan_string
    df = SPECS["scan_partition_pruned"].fn(spark, TEST_SF_DIR)
    plan = plan_string(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_orderstatus" in m.group(1), plan[:2000]


def test_q3_uses_takeordered_topk(spark):
    """Top-k must fuse into TakeOrderedAndProject — no global sort
    materialization before the limit."""
    from integrator_spark.plans.audit import plan_string
    df = SPECS["q3_top_orders"].fn(spark, TEST_SF_DIR)
    assert "TakeOrderedAndProject" in plan_string(df)


def test_vec_knn_blocked_plan_has_no_shuffle(spark):
    """The broadcast blocked-matmul kNN claims zero shuffle: the plan
    must contain no Exchange at all (scan -> ArrowEvalPython path)."""
    from integrator_spark.plans.audit import plan_string
    df = SPECS["vec_knn"].fn(spark, TEST_SF_DIR)
    plan = plan_string(df)
    assert "Exchange" not in plan, plan[:2000]


def test_etl_harmonize_broadcasts_rules(spark):
    from integrator_spark.plans.audit import plan_string
    df = SPECS["etl_harmonize"].fn(spark, TEST_SF_DIR)
    assert "BroadcastHashJoin" in plan_string(df)


def test_join_hinted_uses_shuffled_hash(spark):
    from integrator_spark.plans.audit import plan_string
    df = SPECS["join_hinted"].fn(spark, TEST_SF_DIR)
    assert "ShuffledHashJoin" in plan_string(df)


def test_q6_pushes_all_predicates(spark):
    """Q6 is the scan-efficiency probe: the date range, discount band,
    and quantity cap must ALL reach the parquet reader."""
    df = SPECS["q6_forecast_revenue"].fn(spark, TEST_SF_DIR)
    f = audit_plan("q6_forecast_revenue", df)
    pushed = " ".join(f.pushed_filters)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, (col, f.pushed_filters)
    # and only the 4 referenced columns are read
    schema = f.plan.split("ReadSchema")[-1]
    assert "l_orderkey" not in schema and "l_comment" not in schema


def test_sessionize_reuses_one_exchange(spark):
    """Both window passes partition on user_id — the plan must contain
    exactly one shuffle exchange, not two."""
    import re
    from integrator_spark.plans.audit import plan_string
    df = SPECS["events_sessionize"].fn(spark, TEST_SF_DIR)
    plan = plan_string(df)
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, plan[:3000]


def test_sql_recursive_hierarchy_native_union_loop(spark):
    """The recursive-CTE query must execute through Spark 4's native
    UnionLoop recursion, not an unrolled approximation."""
    from integrator_spark.registry import all_specs

    df = all_specs()["sql_recursive_hierarchy"].fn(
        spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "UnionLoop" in plan
    rows = {r.depth: (r.n_customers, r.n_roots) for r in df.collect()}
    # Forest structure at sf0.001 (custkeys 0..1499... fixture has 150):
    # depth 0 = the custkey<10 roots themselves; every deeper level's
    # customers trace to a root<10 via repeated DIV 10.
    assert rows[0][0] == 10 and rows[0][1] == 10
    assert all(n > 0 for n, _ in rows.values())


def test_udf_arrow_scalar_uses_arrow_eval(spark):
    """useArrow=True must plan as ArrowEvalPython (Arrow transport),
    not BatchEvalPython (pickle rows) — otherwise it IS the slow path
    the audit exists to catch."""
    from integrator_spark.registry import all_specs

    df = all_specs()["udf_arrow_scalar"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_global_window_detector(spark):
    """count_global_windows: a Window.orderBy with no partitionBy is
    flagged in BOTH plan text flavors (formatted mode and the tree
    mode explainInternal emits for streaming); partitioned and
    partition-only windows are not."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from integrator_spark.plans.audit import (count_global_windows,
                                              plan_string)

    df = spark.range(100).withColumn("g", F.col("id") % 5)
    gw = df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    pw = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("id")))
    po = df.withColumn(
        "s", F.sum("id").over(Window.partitionBy("g")))
    assert count_global_windows(plan_string(gw)) == 1
    assert count_global_windows(plan_string(pw)) == 0
    assert count_global_windows(plan_string(po)) == 0
    # tree mode (what the streaming audit captures)
    assert count_global_windows(plan_string(gw, mode="extended")) >= 1
    assert count_global_windows(plan_string(pw, mode="extended")) == 0


def test_global_window_allowlist_is_exact(spark):
    """Every GLOBAL_WINDOW_ALLOWED entry must name a registered query
    (no dead allowlist rows shielding future regressions)."""
    from integrator_spark.plans.audit import GLOBAL_WINDOW_ALLOWED
    from integrator_spark.registry import all_specs

    unknown = set(GLOBAL_WINDOW_ALLOWED) - set(all_specs())
    assert not unknown, f"allowlist names unregistered queries: {unknown}"


#: Anti-rot bounds for GLOBAL_WINDOW_ALLOWED (round-12 verdict item
#: 6): every allowlist entry documents the row set its global window
#: may see; this pins the MEASURED count (shuffleRecordsWritten on
#: the Exchange SinglePartition, read off the executed plan) under
#: that claim at sf0.01 — where every fact table is >= 15k rows, so
#: a "bucket-grain" window silently fed the fact blows straight past
#: its pin and fails CI instead of rotting into documentation.
#: Grains: constant bucket-offset frames pin at 64 (measured 32),
#: calendar/day grains at 4000 (orders span ~2400 days), bounded
#: grids at ~2-4x their measured size.
GLOBAL_WINDOW_BOUNDS = {
    "corpus_pack_manifest": 64,     # n/PACK_BUCKET phase-2 rows (8)
    "corpus_pack_sequences": 64,    # same two-phase offsets (8)
    "corpus_shuffle": 256,          # 2-hex-char range buckets, <= 256
    "events_cusum": 4000,           # |days| aggregate (30)
    "events_decompose": 4000,       # |days| frame (30)
    "events_rfm": 64,               # constant bucket offsets (32)
    "ml_auc": 64,                   # constant bucket offsets (32)
    "ml_average_precision": 64,     # constant bucket offsets (32)
    "ml_lift": 64,                  # bucket offsets + 10-row deciles
    "ml_tree_stump": 1024,          # bounded bin histogram (250)
    "retrieval_ndcg": 64,           # constant bucket offsets (32 x4)
    "retrieval_rrf": 64,            # constant bucket offsets (32)
    "scan_range": 1000,             # literal range source, fixed
    "stats_gini": 64,               # constant bucket offsets (32)
    "stats_ks": 64,                 # constant bucket offsets (32)
    "stats_mannwhitney": 64,        # constant bucket offsets (32)
    "stats_rank_corr": 4000,        # day-grain ranks (2399)
    "stats_survival": 1024,         # |distinct lifetimes| (22)
    "stats_theilsen": 10000,        # |days|^2 pair grid (435)
    "text_bpe_tokenize": 4096,      # vocabulary-bounded output (33)
    "window_regression": 4000,      # |days| aggregate (30)
    # sort_nulls is handled in the test body: THE global-sort
    # contract row — its bound IS its (10%-of-customer) input.
}


@pytest.mark.parametrize("name", sorted(GLOBAL_WINDOW_BOUNDS) + ["sort_nulls"],
                         ids=sorted(GLOBAL_WINDOW_BOUNDS) + ["sort_nulls"])
def test_global_window_allowlist_bounds_hold(name, spark):
    """Execute each GLOBAL_WINDOW_ALLOWED query at sf0.01 and assert
    the rows that actually funneled through each single-partition
    window exchange stay under the entry's documented bound."""
    from integrator_spark.io import load_table
    from integrator_spark.plans.audit import (GLOBAL_WINDOW_ALLOWED,
                                              global_window_input_rows)

    sf_dir = "/root/testdata/sf0.01"
    assert name in GLOBAL_WINDOW_ALLOWED, (
        f"{name} pinned here but no longer allowlisted — drop it")
    if name == "sort_nulls":
        bound = load_table(spark, sf_dir, "customer").count() // 10 + 1
    else:
        bound = GLOBAL_WINDOW_BOUNDS[name]
    df = all_specs()[name].fn(spark, sf_dir)
    df.collect()
    counts = global_window_input_rows(df)
    assert counts, f"{name}: allowlisted but no global window executed"
    assert all(0 <= c <= bound for c in counts), (
        f"{name}: global-window input rows {counts} exceed the "
        f"documented bound {bound} — the allowlist claim rotted")


def test_global_window_allowlist_fully_pinned():
    """Every allowlist entry must carry an anti-rot bound here (new
    allowlist additions without a measured pin fail CI)."""
    from integrator_spark.plans.audit import GLOBAL_WINDOW_ALLOWED
    assert (set(GLOBAL_WINDOW_ALLOWED)
            == set(GLOBAL_WINDOW_BOUNDS) | {"sort_nulls"})
