"""Plan audit — machine-checkable scale invariants (SURVEY.md M5).

The 100 TB posture is enforced here, not just asserted in docstrings:
every registered query's physical plan is inspected for the failure
modes that are invisible at fixture scale but fatal at cluster scale:

- an unintended CartesianProduct / BroadcastNestedLoopJoin (only
  queries that *declare* a cross product may contain one);
- row-at-a-time Python evaluation (BatchEvalPython) sneaking into a
  query that should be JVM-only or Arrow-vectorized;
- a filtering scan that doesn't push predicates into the Parquet
  reader.

tests/test_plans.py runs this over the whole registry.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

#: Queries allowed to contain a nested-loop/cartesian join: explicit
#: Cartesian demos and the O(n²) reference kNN kept for comparison.
CROSS_JOIN_ALLOWED = {
    "join_cross",          # explicit Cartesian demo on bounded dims
    "vec_knn_bruteforce",  # O(n²) reference plan kept for comparison
    "vec_hamming_topk",    # intended popcount scan over broadcast 8-byte sigs
    "dedup_embedding",     # broadcast-matmul pair scan
    "vec_ann_ivf",         # bounded k=16 centroid-probe broadcast
    "vec_ann_ivf_det",     # same bounded k=16 centroid broadcast (det twin)
    "vec_ann_ivf_deletes",  # same bounded k=16 centroid broadcast (tombstone face)
    "vec_ann_pq_det",      # bounded per-subspace codebook broadcast
    "dedup_semantic_ivf_det",  # same bounded k=8 centroid broadcast
    "ml_silhouette",       # same bounded k=8 centroid broadcast (evaluation)
    "vec_ann_ivfpq_det",   # bounded coarse-cell + codebook broadcasts
    "vec_ann_recall",      # composes vec_ann_ivf (same bounded probe)
    "vec_knn_twosided",    # bounded n_blocks² block-id pairing (not rows)
    "events_resample",     # bounded grid × event-type expansion
    "events_interpolate",  # bounded grid × event-type expansion
    "etl_fuzzy_match",     # bounded |variants| × |code list| scoring
    "ml_quantile_bins",    # 1-row min/max bounds frame broadcast to fact
    "ml_tree_stump",       # 1-row class-totals frame broadcast to bin hist
    "text_bm25",           # 1-row corpus-stats frame broadcast to tf matrix
    "vec_ann_graph_search",  # bounded 16-row entry-point set × queries
    "vec_ann_graph_serve_deletes",  # same bounded entry set × live queries
    "q22_global_sales_opportunity",  # 1-row global-avg frame broadcast
    "q11_important_parts",  # 1-row global-cutoff frame broadcast to agg
    "mix_weighted",        # 1-row corpus-total frame joined to source counts
    "ml_average_precision",  # 1-row n_pos-total frame broadcast to tie groups
    "ml_lift",             # 1-row grand-total frame broadcast to tie groups
    "stats_mannwhitney",   # 1-row tie-correction frame joined to rank sums
    "stats_ks",            # 1-row arm-totals frame broadcast to ECDF rows
    "skew_profile",        # two 1-row summary frames joined
    "stats_chi2",          # 1-row grand-total frame broadcast to cells
    "stats_histogram",     # 1-row min/max bounds frame broadcast to fact
    "join_size_estimate",  # 1-row actual-size frame joined to summary
    "corpus_quality_filter",   # 1-row p75-threshold frame broadcast to scan
    "agg_hll_det",         # exact-count and register-sum 1-row frames joined
    "dedup_candidate_recall",  # two 1-row count frames crossJoined per method
    "dedup_embedding_lsh_recall",  # three 1-row count frames crossJoined
    "dedup_semantic_recall",   # three 1-row count frames crossJoined
    "graph_triangles",     # three 1-row census frames crossJoined
    "basket_rules",        # 1-row basket-total frame broadcast to rules
    "stats_bootstrap",     # bounded B-replicate explode + 1-row estimate
    "stats_survival",      # 1-row observation-horizon frame broadcast
    "text_pmi",            # 1-row corpus-size frame broadcast to PMI pairs
    "text_perplexity_filter",  # 1-row NLL-cutoff frame broadcast to docs
    "text_collocation_llr",  # same 1-row corpus frame as text_pmi
    "events_rfm",          # 1-row horizon frame broadcast to per-user RFM
    "events_active_users",   # bounded |days| x 7 trailing-week grid
    "ml_standardize",      # 1-row sufficient-stats frame broadcast to scan
    "stats_power",         # 1-row rates frame x 4-row literal MDE grid
    "ml_naive_bayes",      # bounded n_classes-row grid broadcast to tf/docs
    "stats_theilsen",      # bounded |days|² day-pair grid + 1-row count frame
    "stats_rank_corr",     # bounded |days|² concordance pairs + two 1-row frames
    "retrieval_rrf",       # 1-row query-vector frame broadcast to corpus
    "retrieval_ndcg",      # same 1-row query-vector + 1-row idcg frames
}

#: Queries allowed to contain row-at-a-time Python eval (the surface
#: exists; everything else must be JVM or Arrow).
ROW_PYTHON_ALLOWED = {"udf_python_scalar"}

#: Queries allowed to contain a GLOBAL window (Window.orderBy with no
#: partitionBy → one Exchange SinglePartition, one task does the whole
#: frame). The 100-TB rule is that a global window may only ever see a
#: BOUNDED row set (k rows, a day/bucket grain, a det-twin replay) —
#: each entry documents that bound. Populated by the round-11 audit of
#: every existing use; additions need the same one-line justification.
GLOBAL_WINDOW_ALLOWED: dict[str, str] = {
    "corpus_pack_manifest": "phase-2 prefix sum over bucket-grain rows "
        "(n/PACK_BUCKET), the design that avoids the doc-grain funnel",
    "corpus_pack_sequences": "same two-phase prefix sum: global window "
        "sees one row per PACK_BUCKET, never the corpus",
    "corpus_shuffle": "bucket-grain phase-2 offsets (n/SHUFFLE_BUCKET "
        "rows); doc-grain rank is bucket-partitioned",
    "events_cusum": "cumulative window over the |days| aggregate "
        "(calendar-bounded), never the events fact",
    "events_decompose": "trend/seasonal windows over the |days| frame; "
        "7-row bounded frames",
    "events_rfm": "round 11: three range-partitioned two-phase "
        "prefix counts + SQL-standard NTILE arithmetic; only the "
        "constant bucket-offset windows remain",
    "ml_auc": "round 11: range-partitioned two-phase prefix sum "
        "(operators/prefix.py); the one remaining global window is "
        "the CONSTANT 32-row bucket-offset frame",
    "ml_average_precision": "same two-phase shape as ml_auc "
        "(constant bucket-offset frame only)",
    "ml_lift": "round 11: |distinct scores| cumulative via the "
        "two-phase prefix sum; remaining windows are the constant "
        "bucket-offset frame and the 10-row decile rollup",
    "ml_tree_stump": "threshold argmin over the bounded bin histogram "
        "(~300 rows), not the fact",
    "retrieval_ndcg": "round 11: all four rank windows via the "
        "two-phase prefix count; only constant bucket-offset frames "
        "remain (production semantic leg is the ANN top-k)",
    "retrieval_rrf": "round 11: same two-phase ranks as "
        "retrieval_ndcg",
    "scan_range": "row_number demo over a literal range source "
        "(size fixed by the query text)",
    "sort_nulls": "THE global-sort contract row — a demo of total "
        "ordering semantics; output is the sort",
    "stats_gini": "round 11: rank via the range-partitioned "
        "two-phase prefix count; only the constant 32-row "
        "bucket-offset window remains",
    "stats_ks": "round 11: ECDF cumulatives via the two-phase "
        "prefix sum; only the constant bucket-offset window remains",
    "stats_mannwhitney": "round 11: rank via the two-phase prefix "
        "count (per-x AVG rank invariant to intra-tie order); only "
        "the constant bucket-offset window remains",
    "stats_rank_corr": "rank windows on the day-grain aggregate "
        "(calendar-bounded ~2.4k rows)",
    "stats_survival": "cumulative at-risk/survival over |distinct "
        "lifetimes| rows regardless of fact size",
    "stats_theilsen": "median-of-slopes over the bounded |days|^2 "
        "pair grid",
    "text_bpe_tokenize": "final positions window over vocabulary-"
        "bounded merge output (train/encode measured flat)",
    "window_regression": "regression frames over the |days| aggregate "
        "(map-side-combined first)",
}


def _top_level_groups(s: str) -> list[str]:
    """Split an explain-formatted Arguments payload into its top-level
    ``[...]`` groups (bracket-depth parse; nested brackets stay inside
    their group)."""
    groups: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def count_global_windows(plan: str) -> int:
    """Count Window nodes executing WITHOUT a partition spec in a
    formatted physical plan. A partitioned Window prints
    ``Arguments: [funcs], [partSpec], [orderSpec]`` (3 top-level
    groups); a global one prints ``[funcs], [orderSpec]`` (2 groups,
    the second an ordering). Partition-only windows (2 groups, second
    group carries no ASC/DESC) are NOT global."""
    n = 0
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        stripped = line.strip()
        if re.match(r"^\(\d+\) Window\s*$", stripped):
            # formatted mode: node header, Arguments on a later line
            for j in range(i + 1, min(i + 10, len(lines))):
                if lines[j].startswith("Arguments:"):
                    groups = _top_level_groups(
                        lines[j][len("Arguments:"):])
                    if len(groups) == 2 and re.search(
                            r"\b(ASC|DESC)\b", groups[1]):
                        n += 1
                    break
        else:
            # tree mode (simple/extended/explainInternal): specs
            # inline, e.g. "+- Window [funcs], [part], [order]"
            m = re.match(r"^[\s+:*\-()0-9]*Window (\[.*)$", stripped)
            if m:
                groups = _top_level_groups(m.group(1))
                if len(groups) == 2 and re.search(
                        r"\b(ASC|DESC)\b", groups[1]):
                    n += 1
    return n


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def global_window_input_rows(df: DataFrame) -> list[int]:
    """Runtime counterpart of :func:`count_global_windows` — the
    anti-rot measurement behind GLOBAL_WINDOW_ALLOWED (round-12
    verdict item 6): after an action has run, walk the EXECUTED plan
    and, for every WindowExec with an empty partitionSpec, read
    ``shuffleRecordsWritten`` off the nearest Exchange
    SinglePartition below it — the actual number of rows that funneled
    through the one task. Each allowlist entry documents a bound;
    tests/test_plan_audit.py pins the measurement under it, so a bound
    claim that rots (a 'bucket-grain' window silently fed the fact
    table) fails CI instead of surviving as documentation.

    Call AFTER ``df.collect()``/action — metrics are zero until the
    stages ran. Consecutive global windows share one exchange; each
    reports that exchange's count. A global window whose input needed
    no shuffle (already single-partition) reports -1 (unmeasurable,
    caller decides)."""
    def _unwrap(node):
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            return _unwrap(node.executedPlan())
        if cls.endswith("QueryStageExec"):
            return _unwrap(node.plan())
        if cls == "ReusedExchangeExec":
            return _unwrap(node.child())
        return node

    def _children(node):
        it = node.children().iterator()
        while it.hasNext():
            yield _unwrap(it.next())

    def _metric(node, key):
        m = node.metrics()
        it = m.iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == key:
                return int(kv._2().value())
        return None

    def _nearest_single_partition_exchange(node):
        cls = node.getClass().getSimpleName()
        if "ShuffleExchange" in cls and _metric(node,
                                                "numPartitions") == 1:
            return _metric(node, "shuffleRecordsWritten")
        for ch in _children(node):
            got = _nearest_single_partition_exchange(ch)
            if got is not None:
                return got
        return None

    counts: list[int] = []

    def _walk(node):
        cls = node.getClass().getSimpleName()
        if cls == "WindowExec" and node.partitionSpec().isEmpty():
            got = _nearest_single_partition_exchange(node)
            counts.append(-1 if got is None else got)
        for ch in _children(node):
            _walk(ch)

    _walk(_unwrap(df._jdf.queryExecution().executedPlan()))
    return counts


@dataclass
class PlanFindings:
    name: str
    has_cartesian: bool
    has_row_python: bool
    n_global_windows: int
    n_exchanges: int
    pushed_filters: list[str]
    plan: str


def audit_plan(name: str, df: DataFrame) -> PlanFindings:
    plan = plan_string(df)
    return PlanFindings(
        name=name,
        has_cartesian=bool(re.search(
            r"CartesianProduct|BroadcastNestedLoopJoin", plan)),
        has_row_python=("BatchEvalPython" in plan),
        n_global_windows=count_global_windows(plan),
        n_exchanges=len(re.findall(r"\bExchange\b", plan)),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        plan=plan,
    )


def violations(f: PlanFindings) -> list[str]:
    out = []
    if f.has_cartesian and f.name not in CROSS_JOIN_ALLOWED:
        out.append("unintended CartesianProduct/BroadcastNestedLoopJoin")
    if f.has_row_python and f.name not in ROW_PYTHON_ALLOWED:
        out.append("row-at-a-time Python eval in the plan")
    if f.n_global_windows and f.name not in GLOBAL_WINDOW_ALLOWED:
        out.append(f"{f.n_global_windows} global (partition-less) "
                   f"Window node(s) — single-task at scale; add to "
                   f"GLOBAL_WINDOW_ALLOWED with the bound that makes "
                   f"it safe, or partition the frame")
    return out


# ---------------------------------------------------------------------------
# Streaming plan audit (round-10): the batch gate above walks every
# registered query's batch plan; stream_* jobs execute through
# MicroBatchExecution, whose plan and state posture only exist after a
# drain. streaming/jobs.py::run_available_now captures both per job
# (LAST_STREAM_AUDITS: the last execution's physical plan text and the
# progress list); stream_violations applies the same allowlist
# discipline to those artifacts.

#: Expected state-store operator(s) per stateful streaming job — the
#: machine check that the STREAMING code path (state store + watermark
#: semantics) is actually what executed, not a silent fallback to a
#: stateless plan. Values are operatorName strings from
#: StateOperatorProgress.
STREAM_STATE_EXPECTED: dict[str, set[str]] = {
    "stream_tumbling": {"stateStoreSave"},
    "stream_dedup": {"dedupeWithinWatermark"},
    "stream_session": {"sessionWindowStateStoreSaveExec"},
    "stream_session_rocksdb": {"sessionWindowStateStoreSaveExec"},
    "stream_stateful": {"applyInPandasWithState"},
    "stream_pattern_match": {"applyInPandasWithState"},
    "stream_update_counts": {"stateStoreSave"},
    "stream_join": {"symmetricHashJoin"},
    "stream_static_join": {"stateStoreSave"},
    "stream_sliding": {"stateStoreSave"},
    "stream_join_outer": {"symmetricHashJoin"},
    "stream_late_data": {"stateStoreSave"},
    "stream_tumbling_append": {"stateStoreSave"},
    "stream_session_dynamic": {"sessionWindowStateStoreSaveExec"},
    "stream_ohlc": {"stateStoreSave"},
    "stream_drift": {"stateStoreSave"},
    "stream_topk": {"stateStoreSave"},
}

#: Stateful jobs allowed to run WITHOUT an event-time watermark: their
#: state is the product (update/complete output modes over bounded key
#: domains), so nothing is ever evicted by design. Everything else
#: stateful must carry a watermark or its state grows without bound at
#: 100 TB.
STREAM_NO_WATERMARK_ALLOWED = {
    "stream_update_counts",  # update-mode running counts per bounded key set
    "stream_static_join",    # complete-mode agg, bounded nation key domain
    "stream_topk",           # complete-mode global top-k, bounded k state
}


def stream_violations(name: str, plan: str, progress: list) -> list[str]:
    """Allowlist-disciplined audit of one drained streaming job (see
    module comment). ``progress`` is the StreamingQueryProgress list
    run_available_now captured."""
    out = []
    if re.search(r"CartesianProduct|BroadcastNestedLoopJoin", plan) \
            and name not in CROSS_JOIN_ALLOWED:
        out.append("unintended CartesianProduct/BroadcastNestedLoopJoin")
    if "BatchEvalPython" in plan and name not in ROW_PYTHON_ALLOWED:
        out.append("row-at-a-time Python eval in the streaming plan")
    if count_global_windows(plan) and name not in GLOBAL_WINDOW_ALLOWED:
        out.append("global (partition-less) Window in the streaming "
                   "plan — single-task state at scale")
    ops: set[str] = set()
    parts_ok = True
    has_wm = False
    for p in progress:
        for so in (p["stateOperators"] or []):
            ops.add(so["operatorName"])
            if so.get("numShufflePartitions", 1) < 1:
                parts_ok = False
        if (p["eventTime"] or {}).get("watermark"):
            has_wm = True
    want = STREAM_STATE_EXPECTED.get(name)
    if want is not None:
        if not want <= ops:
            out.append(f"expected state operator(s) {sorted(want - ops)} "
                       f"absent (saw {sorted(ops)})")
        if not has_wm and name not in STREAM_NO_WATERMARK_ALLOWED:
            out.append("stateful job ran without an event-time watermark")
        if not parts_ok:
            out.append("state operator reports no shuffle partitioning")
    return out
