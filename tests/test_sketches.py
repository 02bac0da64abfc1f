"""Tolerance tests for the approximate-sketch operators (VERDICT r01
item 6): every rows-only sketch gets a measured error bound against its
exact counterpart, so "no cross-engine oracle" never means "unchecked".

Bounds asserted here:
- HyperLogLog++ (agg_approx_distinct, rsd=0.02): relative error within
  4 standard deviations of the configured rsd.
- percentile_approx (agg_approx_percentile, accuracy=10000): GK sketch
  guarantees rank error <= n/accuracy; we assert the returned value's
  rank is within that bound of the true median rank.
- MinHash-LSH (dedup_minhash): recall >= 0.9 of the exact >=0.8-Jaccard
  pairs from dedup_ngram, and every reported pair must be a true
  >=0.5-Jaccard pair (precision of the candidate threshold).
- SimHash (dedup_simhash): recall >= 0.8 of the exact near-dup pairs
  (64-bit sketch, Hamming<=6 is a coarser net than banded MinHash).
- Count-min (text_topk_sketch): never underestimates, overestimate
  bounded by 4N/w against the exact counts carried in the output.
"""

from __future__ import annotations

import math

from integrator_spark.registry import get_queries

from .conftest import TEST_SF_DIR


def _rows(spark, name):
    return get_queries()[name](spark, TEST_SF_DIR).collect()


def test_hll_within_rsd_bound(spark):
    # rsd=0.02 in the query; 4 sigma => 8% relative error ceiling.
    for r in _rows(spark, "agg_approx_distinct"):
        rel = abs(r.approx_orders - r.exact_orders) / r.exact_orders
        assert rel <= 4 * 0.02, (r.l_returnflag, rel)


def test_percentile_approx_within_rank_bound(spark):
    from integrator_spark.io import load_table

    approx = {r.o_orderpriority: r.p50_approx
              for r in _rows(spark, "agg_approx_percentile")}
    groups = (load_table(spark, TEST_SF_DIR, "orders")
              .select("o_orderpriority", "o_totalprice").collect())
    by_prio: dict[str, list[float]] = {}
    for r in groups:
        by_prio.setdefault(r.o_orderpriority, []).append(r.o_totalprice)
    for prio, vals in by_prio.items():
        vals.sort()
        n = len(vals)
        # GK guarantee: the returned value's rank is within n/accuracy
        # of the target rank (+1 slack for the discrete midpoint).
        target = math.ceil(0.5 * n)
        tol = max(1, math.ceil(n / 10000)) + 1
        # rank range of the approx value among the sorted exact values
        lo = next(i for i, v in enumerate(vals, 1) if v >= approx[prio])
        hi = sum(1 for v in vals if v <= approx[prio])
        assert lo - tol <= target <= hi + tol, (prio, lo, hi, target)


def _pair_set(rows):
    return {(r.d1, r.d2) for r in rows}


def test_minhash_recall_and_candidate_precision(spark, duck):
    exact = _pair_set(_rows(spark, "dedup_ngram"))       # jaccard >= 0.8
    approx = _pair_set(_rows(spark, "dedup_minhash"))    # jaccard >= 0.5 est.
    assert exact, "fixture must contain planted near-dups"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"MinHash recall {recall:.2f} < 0.9"
    # candidate precision: every reported pair is a genuine >=0.35-Jaccard
    # pair (0.5 threshold minus LSH estimation noise on short docs).
    true_pairs = _true_jaccard_pairs(duck, floor=0.35)
    bogus = approx - true_pairs
    assert not bogus, f"MinHash reported non-similar pairs: {sorted(bogus)[:5]}"


def test_simhash_recall_vs_exact(spark):
    exact = _pair_set(_rows(spark, "dedup_ngram"))
    approx = _pair_set(_rows(spark, "dedup_simhash"))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"SimHash recall {recall:.2f} < 0.8"


def _true_jaccard_pairs(duck, floor: float):
    rows = duck.execute(f"""
        WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
                       FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      w[i] || '|' || w[i+1] || '|' || w[i+2] AS shingle
               FROM words, unnest(range(1, len(w) - 1)) t(i)),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS ni
                  FROM sh a JOIN sh b
                    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT d1, d2 FROM pairs
        JOIN cnt ca ON ca.doc_id = d1
        JOIN cnt cb ON cb.doc_id = d2
        WHERE ni * 1.0 / (ca.n + cb.n - ni) >= {floor}
    """).fetchall()
    return set(rows)


def test_countmin_guarantee(spark):
    # CM sketch never underestimates; overestimate <= 4*N/w with the
    # 4-row min (each row's expected collision mass is N/w; the min of
    # 4 independent rows exceeding 4x that is vanishingly unlikely).
    from integrator_spark.io import load_table
    from integrator_spark.operators.sketch import CMS_WIDTH
    from pyspark.sql import functions as F
    from integrator_spark.functions.text import tokens

    rows = _rows(spark, "text_topk_sketch")
    assert len(rows) == 20
    n_tokens = (load_table(spark, TEST_SF_DIR, "documents")
                .select(F.explode(tokens("text")).alias("w")).count())
    slack = 4 * n_tokens / CMS_WIDTH
    for r in rows:
        assert r.est_n >= r.exact_n, (r.word, "underestimate!")
        assert r.est_n - r.exact_n <= slack, (r.word, r.est_n, r.exact_n)


def test_hll_sketch_union_bound(spark):
    # Datasketches HLL: per-group estimates AND the union-merged global
    # estimate must sit within 5% of the exact distinct counts.
    from integrator_spark.io import load_table
    from pyspark.sql import functions as F

    rows = {r.event_type: r for r in _rows(spark, "agg_hll_sketch")}
    e = load_table(spark, TEST_SF_DIR, "events")
    exact_global = e.agg(F.countDistinct("user_id")).collect()[0][0]
    for et, r in rows.items():
        if et == "__all__":
            rel = abs(r.approx_users - exact_global) / exact_global
            assert rel <= 0.05, ("union", r.approx_users, exact_global)
        else:
            rel = abs(r.approx_users - r.exact_users_merged) \
                / max(r.exact_users_merged, 1)
            assert rel <= 0.05, (et, r.approx_users, r.exact_users_merged)


def test_hll_det_error_band_and_mergeability(spark):
    """agg_hll_det: (a) the raw Flajolet estimate lands within ~3
    standard errors of the published 1.04/sqrt(64) RSD (the oracle
    proves Spark==DuckDB; this pins that both compute the RIGHT
    estimator); (b) registers are MERGEABLE — per-priority register
    sets MAX-merged equal the global registers, the property that
    makes HLL the distributed distinct-count answer (partial aggs on
    executors merge exactly this way)."""
    from pyspark.sql import functions as F

    from integrator_spark.io import load_table
    from integrator_spark.queries.aggregates import (_HLL_WBITS,
                                                     _hll_rho_case)

    row = get_queries()["agg_hll_det"](spark, TEST_SF_DIR).collect()[0]
    rsd = 1.04 / math.sqrt(64)
    assert abs(row["err"]) <= 3 * rsd, row
    assert row["n_exact"] > 0

    o = load_table(spark, TEST_SF_DIR, "orders")
    parts = o.select(
        "o_orderpriority",
        F.expr("CAST(conv(substr(md5(CAST(o_custkey AS STRING)), 1, 12), "
               "16, 10) AS BIGINT)").alias("h")).select(
        "o_orderpriority",
        F.expr(f"shiftright(h, {_HLL_WBITS})").alias("bucket"),
        F.expr(f"h & {(1 << _HLL_WBITS) - 1}").alias("w"))
    rho = F.expr(_hll_rho_case("w"))
    per_group = (parts.groupBy("o_orderpriority", "bucket")
                 .agg(F.max(rho).alias("m_reg")))
    merged = {(r["bucket"]): r["m"] for r in
              per_group.groupBy("bucket")
              .agg(F.max("m_reg").alias("m")).collect()}
    global_regs = {(r["bucket"]): r["m"] for r in
                   parts.groupBy("bucket")
                   .agg(F.max(rho).alias("m")).collect()}
    assert merged == global_regs and len(global_regs) > 0


def test_cm_det_guarantee_and_mergeability(spark):
    """text_topk_cm_det: the Count-Min invariants on the DETERMINISTIC
    twin — (a) never underestimates (est >= exact for every reported
    word); (b) the overestimate respects the e*N/w row bound (min over
    d rows is only tighter); (c) counters are MERGEABLE: per-source
    counter grids summed element-wise equal the global grid — the
    property that makes CM a distributed partial aggregate."""
    from pyspark.sql import functions as F

    from integrator_spark.io import load_table

    rows = get_queries()["text_topk_cm_det"](spark, TEST_SF_DIR).collect()
    assert len(rows) == 20
    assert all(r["est_n"] >= r["exact_n"] for r in rows)
    d = load_table(spark, TEST_SF_DIR, "documents")
    tok = d.select("source", F.explode(F.split("text", " ")).alias("word"))
    n_tokens = tok.count()
    bound = math.e * n_tokens / 256
    assert all(r["overcount"] <= bound for r in rows), (bound, rows)

    hashes = tok.select(
        "source", "word",
        F.explode(F.array(*[F.lit(r) for r in range(4)])).alias("r")
    ).select(
        "source", "r",
        (F.conv(F.substring(F.md5(F.concat_ws(
            ":", "word", F.col("r").cast("string"))), 1, 8), 16, 10)
         .cast("long") % 256).alias("bucket"))
    per_source = (hashes.groupBy("source", "r", "bucket")
                  .agg(F.count(F.lit(1)).alias("c")))
    merged = {(r["r"], r["bucket"]): r["c"] for r in
              per_source.groupBy("r", "bucket")
              .agg(F.sum("c").alias("c")).collect()}
    global_grid = {(r["r"], r["bucket"]): r["c"] for r in
                   hashes.groupBy("r", "bucket")
                   .agg(F.count(F.lit(1)).alias("c")).collect()}
    assert merged == global_grid and len(global_grid) > 0
