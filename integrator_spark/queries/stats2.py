"""Third stats/ML-prep batch: user-lifecycle survival analysis,
distribution-drift scoring, supervised encodings, and consistent
sampling — the model-facing analytics a training-data pipeline runs on
top of the relational core.

Determinism notes (same rules as the rest of the repo):
- integer ratios are evaluated as ``CAST(int AS DOUBLE) / int`` on both
  engines — a single IEEE division of identical operands is
  bit-identical;
- anything that passes through libm (``ln``/``exp``) is rounded to 6
  decimals on both engines before comparison (last-ulp differences
  between java.lang.Math and glibc are ~1e-15 relative, far below the
  rounding grid);
- sums of doubles are either exact-decimal (`dsum` pattern) or sums of
  already-6-dp-rounded terms over a handful of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

# --------------------------------------------------------------------------
# Kaplan-Meier survival over user lifetimes
# --------------------------------------------------------------------------

_SURVIVAL_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         date_trunc('day', MIN(ts)) AS first_day,
         date_trunc('day', MAX(ts)) AS last_day
  FROM events GROUP BY user_id
), pu AS (
  SELECT datediff('day', first_day, last_day) AS t,
         CASE WHEN datediff('day', last_day, MAX(last_day) OVER ()) >= 3
              THEN 1 ELSE 0 END AS died
  FROM per_user
), by_t AS (
  SELECT t,
         CAST(SUM(died) AS BIGINT) AS d,
         CAST(COUNT(*) - SUM(died) AS BIGINT) AS c
  FROM pu GROUP BY t
), km AS (
  SELECT t, d, c,
         CAST(SUM(d + c) OVER () AS BIGINT)
           - CAST(SUM(d + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           + d + c AS n_at_risk
  FROM by_t
), f AS (
  SELECT t, d, n_at_risk,
         ROUND(CAST(n_at_risk - d AS DOUBLE) / n_at_risk, 6) AS km_factor,
         ROUND(EXP(SUM(LN(CAST(n_at_risk - d AS DOUBLE) / n_at_risk))
                   OVER (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
               6) AS survival
  FROM km
)
SELECT t, n_at_risk, d, km_factor, survival
FROM f WHERE d > 0
"""


@register("stats_survival", oracle=_SURVIVAL_ORACLE, tags=("stats", "survival"))
def stats_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimate of user lifetime (days between a
    user's first and last event). A user whose last activity is >= 3
    days before the observation horizon is an observed churn ("death");
    later last-activity is right-censored. Classic product-limit
    estimator: S(t) = prod_{t' <= t} (1 - d_t'/n_t') over event times,
    with n_t = at-risk count (not yet churned or censored before t).

    Shape: one shuffle to per-user extents (|users| rows), one shuffle
    to per-lifetime counts (|distinct lifetimes| rows — tens), then
    ordered windows over that tiny frame. The observation horizon is
    derived as a window max over the per-user frame here so the fixture
    is self-contained; a production snapshot would pass it as a literal
    (removing even that window). The cumulative at-risk / survival
    windows run over |distinct lifetimes| rows regardless of fact size,
    so the plan is fixture-to-100 TB invariant.

    Censored-only lifetimes participate in the at-risk accounting (the
    windows run before the d > 0 filter) but emit no output row,
    matching the standard KM event-time table."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_day"),
        F.date_trunc("day", F.max("ts")).alias("last_day"))
    w_all = Window.partitionBy()
    pu = per_user.select(
        F.datediff("last_day", "first_day").alias("t"),
        F.when(F.datediff(F.max("last_day").over(w_all),
                          F.col("last_day")) >= 3, 1)
         .otherwise(0).alias("died"))
    by_t = pu.groupBy("t").agg(
        F.sum("died").alias("d"),
        (F.count(F.lit(1)) - F.sum("died")).alias("c"))
    w_cum = (Window.orderBy("t")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    km = by_t.select(
        "t", "d", "c",
        (F.sum(F.col("d") + F.col("c")).over(w_all)
         - F.sum(F.col("d") + F.col("c")).over(w_cum)
         + F.col("d") + F.col("c")).alias("n_at_risk"))
    factor = (F.col("n_at_risk") - F.col("d")).cast("double") / F.col("n_at_risk")
    f = km.select(
        "t", "d", "n_at_risk",
        F.round(factor, 6).alias("km_factor"),
        F.round(F.exp(F.sum(F.log(factor)).over(w_cum)), 6).alias("survival"))
    return (f.where(F.col("d") > 0)
            .select("t", "n_at_risk", "d", "km_factor", "survival"))


# --------------------------------------------------------------------------
# Population stability index (feature-drift score)
# --------------------------------------------------------------------------

_PSI_ORACLE = """
WITH binned AS (
  SELECT least(CAST(floor(n_chars / 50) AS BIGINT), 9) AS bin,
         doc_id % 2 AS side
  FROM documents
), counts AS (
  SELECT bin,
         CAST(COUNT(*) FILTER (WHERE side = 0) AS BIGINT) AS n_ref,
         CAST(COUNT(*) FILTER (WHERE side = 1) AS BIGINT) AS n_cur
  FROM binned GROUP BY bin
), props AS (
  SELECT bin, n_ref, n_cur,
         (CAST(n_ref AS DOUBLE) + 0.5)
           / (CAST(SUM(n_ref) OVER () AS DOUBLE) + 5.0) AS p_ref,
         (CAST(n_cur AS DOUBLE) + 0.5)
           / (CAST(SUM(n_cur) OVER () AS DOUBLE) + 5.0) AS p_cur
  FROM counts
), terms AS (
  SELECT bin, n_ref, n_cur,
         ROUND((p_cur - p_ref) * LN(p_cur / p_ref), 6) AS psi_term
  FROM props
)
SELECT bin, n_ref, n_cur, psi_term,
       ROUND(SUM(psi_term) OVER (), 6) AS psi_total
FROM terms
"""


@register("stats_psi", oracle=_PSI_ORACLE, tags=("stats", "drift"))
def stats_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two corpus snapshots — the
    standard pre-training drift gate ("did the length/quality
    distribution of the incoming crawl shift vs the reference
    corpus?"). Snapshots are simulated by doc_id parity; the feature is
    document length binned into 10 fixed-width buckets.

    PSI = sum over bins of (p_cur - p_ref) * ln(p_cur / p_ref), with
    Laplace smoothing (+0.5 per bin over +5.0 total) so an empty bin on
    one side contributes a finite term instead of ln(0). psi_total is
    the sum of the already-rounded per-bin terms over the 10-row frame
    (order effects ~1e-16, far under the 6-dp grid).

    Shape: one shuffle to per-(bin,side) counts — 20 rows no matter the
    corpus size — then windows over that constant frame; the scan is a
    2-column projection. Scales linearly; the comparison itself is
    O(bins)."""
    d = load_table(spark, sf_dir, "documents")
    binned = d.select(
        F.least(F.floor(F.col("n_chars") / 50), F.lit(9))
         .cast("long").alias("bin"),
        (F.col("doc_id") % 2).alias("side"))
    counts = binned.groupBy("bin").agg(
        F.count(F.when(F.col("side") == 0, 1)).alias("n_ref"),
        F.count(F.when(F.col("side") == 1, 1)).alias("n_cur"))
    w_all = Window.partitionBy()
    p_ref = ((F.col("n_ref").cast("double") + F.lit(0.5))
             / (F.sum("n_ref").over(w_all).cast("double") + F.lit(5.0)))
    p_cur = ((F.col("n_cur").cast("double") + F.lit(0.5))
             / (F.sum("n_cur").over(w_all).cast("double") + F.lit(5.0)))
    terms = counts.select(
        "bin", "n_ref", "n_cur",
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"))
    return terms.select(
        "bin", "n_ref", "n_cur", "psi_term",
        F.round(F.sum("psi_term").over(w_all), 6).alias("psi_total"))


# --------------------------------------------------------------------------
# Leave-one-out target encoding
# --------------------------------------------------------------------------

_TARGET_ENCODE_ORACLE = """
SELECT o_orderkey, o_orderpriority, loo_enc FROM (
  SELECT o_orderkey, o_orderpriority,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w
                    - CAST(o_totalprice AS DECIMAL(38,6)) AS DOUBLE)
               / (COUNT(*) OVER w - 1), 6) AS loo_enc
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority)
)
WHERE o_orderkey % 199 = 0
"""


@register("ml_target_encode", oracle=_TARGET_ENCODE_ORACLE,
          tags=("ml", "encoding"))
def ml_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of a categorical feature
    (o_orderpriority) against a numeric target (o_totalprice): each
    row's encoding is the mean target of its category EXCLUDING the row
    itself — (sum_cat - y_i) / (n_cat - 1) — the standard
    leakage-free supervised encoding for tree/linear models.

    Exactness: the category sum is an exact DECIMAL(38,6) (money grid),
    the subtraction stays decimal, and only the final single division
    is floating — identical operands on both engines, rounded to 6 dp.

    Shape: one hash-partition window on the category key (same shuffle
    a groupBy would take — no extra pass for the per-row join-back that
    a naive agg-then-join plan would need). Output is thinned by a
    key-modulus AFTER the window so the fixture compare stays small;
    Catalyst correctly keeps the non-partition-key filter above the
    window. At 100 TB this is one shuffle of the fact on a
    low-cardinality key — pair with salting (see agg_salted) if the
    category distribution is hot."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    price_dec = F.col("o_totalprice").cast("decimal(38,6)")
    enc = ((F.sum(price_dec).over(w) - price_dec).cast("double")
           / (F.count(F.lit(1)).over(w) - 1))
    return (o.select("o_orderkey", "o_orderpriority",
                     F.round(enc, 6).alias("loo_enc"))
            .where(F.col("o_orderkey") % 199 == 0))


# --------------------------------------------------------------------------
# Feature hashing (hashing trick)
# --------------------------------------------------------------------------

_FEATURE_HASH_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE doc_id < 30
)
SELECT doc_id, substr(md5(tok), 1, 2) AS feat, COUNT(*) AS n
FROM tok WHERE length(tok) > 0
GROUP BY doc_id, feat
"""


@register("ml_feature_hash", oracle=_FEATURE_HASH_ORACLE,
          tags=("ml", "features"))
def ml_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: map an unbounded token vocabulary into a
    fixed 256-bucket feature space by hashing each token and keeping
    the first hash byte as the feature id, counting occurrences per
    (doc, feature) — the vocabulary-free sparse featurization used
    when a fitted dictionary is impossible at corpus scale.

    md5 is used because both engines implement it identically, making
    the bucket assignment oracle-checkable; a production pipeline on
    Spark alone would swap in ``xxhash64(tok) % n_buckets`` (cheaper,
    same plan). Everything is JVM codegen — explode, hash, substring,
    hash-agg — no Python.

    Shape: explode is pipelined (no shuffle), then one hash aggregation
    on (doc_id, feat). Per-doc fan-out is bounded by token count; the
    feature space is constant-width by construction, which is the whole
    point of the trick at 100 TB. The doc_id < 30 filter is
    fixture-size control and is pushed to the parquet scan."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 30)
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    return (tok.where(F.length("tok") > 0)
            .select("doc_id",
                    F.substring(F.md5(F.col("tok")), 1, 2).alias("feat"))
            .groupBy("doc_id", "feat")
            .agg(F.count(F.lit(1)).alias("n")))


# --------------------------------------------------------------------------
# Consistent (hash-threshold) sampling
# --------------------------------------------------------------------------

_SAMPLE_CONSISTENT_ORACLE = """
SELECT doc_id, lang, n_chars FROM documents
WHERE (doc_id * 2654435761 + 12345) % 1000000007 < 100000000
"""


@register("sample_consistent", oracle=_SAMPLE_CONSISTENT_ORACLE,
          tags=("sample",))
def sample_consistent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent ~10% sample by key-hash threshold: keep a document
    iff an affine hash of its id falls under a fixed cutoff. Unlike
    ``df.sample()``, membership is a pure function of the key, so the
    sample is (a) reproducible across runs and engines, (b) stable
    under corpus growth — a document's in/out status never changes as
    neighbors arrive — and (c) joinable: sampling two tables with the
    same scheme on a shared key preserves join pairs. This is the
    sampling you want for longitudinal eval sets over a growing corpus.

    The multiplier is Knuth's 2654435761 (golden-ratio hashing); exact
    64-bit integer arithmetic on both engines (max |key * A| ~ 1.6e14
    per million keys — no overflow until ~3.5e9 keys; lift to 128-bit
    decimal beyond). The predicate is a pure row filter — pushed into
    the scan, no shuffle, embarrassingly parallel at any scale."""
    d = load_table(spark, sf_dir, "documents")
    u = (F.col("doc_id") * F.lit(2654435761) + F.lit(12345)) % F.lit(1000000007)
    return d.where(u < 100000000).select("doc_id", "lang", "n_chars")
