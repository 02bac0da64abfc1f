"""ML-data-prep operators: deterministic dataset splitting, quantile
bucketing windows, join-strategy hints, fuzzy code matching.
"""

from __future__ import annotations

from decimal import Decimal as _Decimal
from decimal import ROUND_HALF_UP as _ROUND_HALF_UP

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.num import dsum, sql_dsum
from ..io import load_table
from ..registry import register


@register("split_train_test", oracle="""
SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
            IN ('0', '1', '2') THEN 'validation' ELSE 'train' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1
""", tags=("mlprep", "split"))
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation split by content-independent id
    hash (md5 hex prefix → ~3/16 validation): reproducible across
    engines, runs, and cluster sizes — the property rand()-based
    sampling lacks. The same expression assigns any future row of the
    same id to the same split."""
    d = load_table(spark, sf_dir, "documents")
    split = (F.when(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
                    .isin("0", "1", "2"), "validation")
             .otherwise("train"))
    return (d.groupBy(split.alias("split"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("total_chars")))


@register("window_ntile", oracle="""
SELECT o_orderkey, o_orderpriority,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       ROUND(percent_rank() OVER w, 8) AS pct_rank,
       ROUND(cume_dist() OVER w, 8) AS cume
FROM orders
WHERE o_orderkey % 25 = 0
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey)
""", tags=("window", "ntile"))
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: ntile quartiles, percent_rank, cume_dist
    per priority (total order via the orderkey tie-break; the ratios
    are exact rationals of identical ints, rounded only for parity)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 25 == 0)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey", "o_orderpriority",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 8).alias("cume"),
    )


@register("join_hinted", oracle=f"""
SELECT s_nationkey,
       COUNT(*) AS n_items,
       {sql_dsum('l_extendedprice')} AS total
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
""", tags=("join", "hint"))
def join_hinted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit join-strategy override: SHUFFLE_HASH hint forces a
    shuffled hash join where the optimizer would broadcast — the manual
    control used when a 'small' side is only small per-partition, or
    broadcast memory is contended (plan asserted in tests/test_plans)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").hint("shuffle_hash")
    return (li.join(s, li.l_suppkey == s.s_suppkey)
            .groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 dsum("l_extendedprice").alias("total")))


@register("etl_fuzzy_match", oracle="""
WITH variants AS (
  SELECT DISTINCT event_type || CASE WHEN user_id % 3 = 0 THEN 'e'
                                     WHEN user_id % 3 = 1 THEN 's' ELSE '' END
           AS messy FROM events
), canon AS (
  SELECT unnest(['click', 'view', 'purchase', 'signup', 'error']) AS canonical
), scored AS (
  SELECT messy, canonical,
         CAST(levenshtein(messy, canonical) AS BIGINT) AS dist
  FROM variants CROSS JOIN canon
)
SELECT messy, canonical, dist
FROM scored
QUALIFY row_number() OVER (PARTITION BY messy
                           ORDER BY dist, canonical) = 1
   AND dist <= 2
""", tags=("etl", "fuzzy"))
def etl_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy harmonization: messy variant codes (synthesized typos of
    event types) matched to the canonical code list by minimum edit
    distance with a confidence threshold — the technique for mapping
    historical variant spellings onto standard codes when no exact rule
    exists. Candidate space is |variants| x |code list| (bounded by the
    dimension, never the fact table)."""
    e = load_table(spark, sf_dir, "events")
    suffix = (F.when(F.col("user_id") % 3 == 0, "e")
              .when(F.col("user_id") % 3 == 1, "s").otherwise(""))
    variants = (e.select(F.concat(F.col("event_type"), suffix).alias("messy"))
                .distinct())
    canon = spark.createDataFrame(
        [("click",), ("view",), ("purchase",), ("signup",), ("error",)],
        "canonical string")
    scored = (variants.crossJoin(F.broadcast(canon))
              .select("messy", "canonical",
                      F.levenshtein("messy", "canonical").cast("long")
                       .alias("dist")))
    w = Window.partitionBy("messy").orderBy("dist", "canonical")
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (F.col("dist") <= 2))
            .drop("_rn"))


@register("sample_stratified", oracle="""
WITH sized AS (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT doc_id, lang, source
FROM sized
WHERE rn <= CEIL(0.2 * n)
""", tags=("mlprep", "sample"))
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: exactly ceil(20%) of every
    lang stratum, chosen by md5-of-id rank — reproducible across
    engines, runs, and cluster sizes, and stable under re-partitioning
    (none of which holds for df.sampleBy). One window shuffle on the
    stratum key; at 100 TB swap the exact per-stratum rank for the
    md5-prefix threshold variant (split_train_test) to avoid the
    within-stratum sort entirely."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    wn = Window.partitionBy("lang")
    return (d.select("doc_id", "lang", "source",
                     F.row_number().over(w).alias("_rn"),
                     F.count(F.lit(1)).over(wn).alias("_n"))
            .filter(F.col("_rn") <= F.ceil(0.2 * F.col("_n")))
            .drop("_rn", "_n"))


@register("ml_quantile_bins", oracle="""
WITH bounds AS (
  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
)
SELECT LEAST(CAST(FLOOR((o_totalprice - lo) * 10.0 / (hi - lo)) AS BIGINT),
             9) AS bin,
       COUNT(*) AS n_orders,
       ROUND(MIN(o_totalprice), 2) AS bin_min,
       ROUND(MAX(o_totalprice), 2) AS bin_max
FROM orders, bounds
GROUP BY 1
""", tags=("mlprep", "binning"))
def ml_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width feature binning (10-bin histogram of order value):
    global min/max reduced first, broadcast back as a 1-row frame, then
    a pure-expression bucket id — two passes, no per-row Python, no
    sort. The identical IEEE double expression runs in both engines, so
    bin edges are bit-deterministic. (Equal-*frequency* binning is
    window_ntile; this is its constant-memory cousin for monitoring
    histograms at 100 TB.)"""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(F.min("o_totalprice").alias("lo"),
                   F.max("o_totalprice").alias("hi"))
    bin_id = F.least(
        F.floor((F.col("o_totalprice") - F.col("lo")) * 10.0
                / (F.col("hi") - F.col("lo"))).cast("long"),
        F.lit(9).cast("long"))
    return (o.crossJoin(F.broadcast(bounds))
            .groupBy(bin_id.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.min("o_totalprice"), 2).alias("bin_min"),
                 F.round(F.max("o_totalprice"), 2).alias("bin_max")))


MIX_TARGET = 0.6

MIX_ORACLE = f"""
WITH counts AS (SELECT source, COUNT(*) AS _n FROM documents GROUP BY source),
     tot AS (SELECT SUM(_n) AS _all, SUM(SQRT(_n)) AS _sw FROM counts),
     quota AS (SELECT source,
                      CAST(FLOOR({MIX_TARGET} * _all * SQRT(_n) / _sw)
                           AS BIGINT) AS _q
               FROM counts, tot)
SELECT doc_id, source, lang FROM (
  SELECT d.doc_id, d.source, d.lang, q._q,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY md5(CAST(d.doc_id AS VARCHAR)),
                                     d.doc_id) AS rn
  FROM documents d JOIN quota q ON d.source = q.source
) WHERE rn <= _q
"""


@register("mix_weighted", oracle=MIX_ORACLE, tags=("mlprep", "mixing"))
def mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted source mixing — compose a training corpus at target
    mixture proportions: per-source quotas ∝ sqrt(source size) (the
    standard rebalancing that upweights small sources without letting
    any source dominate), filled deterministically by md5-of-id rank so
    the same mixture reproduces on any cluster. Quota derivation is two
    tiny aggregates (per-source counts × one global row) broadcast back
    onto the fact; per-source selection is one window — no sampling
    randomness, no driver loop. At 100 TB the quota frame stays
    |sources| rows and the single fact shuffle is the rank window."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("_n"))
    tot = counts.agg(F.sum("_n").alias("_all"),
                     F.sum(F.sqrt("_n")).alias("_sw"))
    quota = (counts.join(F.broadcast(tot))
             .select("source",
                     F.floor(F.lit(MIX_TARGET) * F.col("_all")
                             * F.sqrt("_n") / F.col("_sw"))
                     .cast("long").alias("_q")))
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (d.join(F.broadcast(quota), "source")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= F.col("_q"))
            .select("doc_id", "source", "lang"))


PIPE_MIN_WORDS = 30
PIPE_KEEP = 0.8

PIPE_ORACLE = f"""
WITH filtered AS (
  SELECT doc_id, source, text,
         len(string_split(text, ' ')) AS n_words
  FROM documents
  WHERE lang = 'en' AND len(string_split(text, ' ')) >= {PIPE_MIN_WORDS}
), deduped AS (
  SELECT doc_id, source, n_words FROM (
    SELECT doc_id, source, n_words,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM filtered
  ) WHERE rn = 1
), quota AS (
  SELECT source, CAST(CEIL({PIPE_KEEP} * COUNT(*)) AS BIGINT) AS _q
  FROM deduped GROUP BY source
)
SELECT doc_id, source, n_words FROM (
  SELECT d.doc_id, d.source, d.n_words, q._q,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY md5(CAST(d.doc_id AS VARCHAR)),
                                     d.doc_id) AS rn
  FROM deduped d JOIN quota q ON d.source = q.source
) WHERE rn <= _q
"""


@register("pipeline_pretrain", oracle=PIPE_ORACLE,
          tags=("mlprep", "pipeline", "flagship"))
def pipeline_pretrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end pretraining-corpus assembly in ONE lazy plan:
    language filter → length floor → exact dedup (keep-first) →
    per-source 80% cap by deterministic md5 rank. The point is
    composition: each stage is a DataFrame-in/DataFrame-out operator,
    so Catalyst sees the whole pipeline at once — the lang/length
    predicates push into the scan BELOW the dedup window, and no stage
    materializes. At 100 TB the plan is two fact shuffles (dedup hash,
    per-source rank) plus one broadcast quota join — the same shape a
    production corpus build runs nightly."""
    d = load_table(spark, sf_dir, "documents")
    # cast("long"): F.size is INT but the DuckDB oracle's len() is
    # BIGINT — align declared dtypes for schema parity.
    n_words = F.size(F.split(F.col("text"), " ")).cast("long")
    filtered = (d.filter(F.col("lang") == "en")
                .withColumn("n_words", n_words)
                .filter(F.col("n_words") >= PIPE_MIN_WORDS)
                .select("doc_id", "source", "text", "n_words"))
    w_dedup = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (filtered.withColumn("_rn", F.row_number().over(w_dedup))
               .filter(F.col("_rn") == 1)
               .select("doc_id", "source", "n_words"))
    quota = (deduped.groupBy("source")
             .agg(F.ceil(F.lit(PIPE_KEEP) * F.count(F.lit(1)))
                  .cast("long").alias("_q")))
    w_rank = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (deduped.join(F.broadcast(quota), "source")
            .withColumn("_rn", F.row_number().over(w_rank))
            .filter(F.col("_rn") <= F.col("_q"))
            .select("doc_id", "source", "n_words"))


PACK_SEQ_LEN = 512     #: tokens per packed training sequence
PACK_BUCKET = 64       #: doc_ids per cumsum bucket (two-phase prefix sum)

PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         doc_id // {PACK_BUCKET} AS bucket
  FROM documents
),
w AS (
  SELECT doc_id, n_tokens, bucket,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_in_bucket
  FROM t
),
b AS (SELECT bucket, SUM(n_tokens) AS btot FROM t GROUP BY bucket),
boff AS (
  SELECT bucket,
         COALESCE(SUM(btot) OVER (ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bucket_off
  FROM b
)
SELECT w.doc_id,
       CAST(w.n_tokens AS BIGINT) AS n_tokens,
       CAST(boff.bucket_off + w.cum_in_bucket AS BIGINT) AS global_start,
       CAST((boff.bucket_off + w.cum_in_bucket) // {PACK_SEQ_LEN} AS BIGINT)
         AS first_seq,
       CAST((boff.bucket_off + w.cum_in_bucket + w.n_tokens - 1)
            // {PACK_SEQ_LEN} AS BIGINT) AS last_seq,
       CAST((boff.bucket_off + w.cum_in_bucket + w.n_tokens - 1)
            // {PACK_SEQ_LEN}
            - (boff.bucket_off + w.cum_in_bucket) // {PACK_SEQ_LEN} + 1
            AS BIGINT) AS n_seqs_spanned
FROM w JOIN boff USING (bucket)
"""


@register("corpus_pack_sequences", oracle=PACK_ORACLE,
          tags=("mlprep", "packing"))
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: documents are laid
    end-to-end in doc_id order and cut into fixed ``PACK_SEQ_LEN``-token
    training sequences; each doc gets its global token offset and the
    sequence ids it spans. The load-bearing scale choice is the prefix
    sum: a single global ``Window.orderBy(doc_id)`` would funnel 100 TB
    through ONE task, so the cumsum runs two-phase — a per-bucket
    window (bucket = doc_id div PACK_BUCKET, parallel across buckets)
    plus a bucket-offset table that is tiny by construction (n_docs /
    PACK_BUCKET rows, one narrow single-partition window) broadcast
    back onto the fact. Same decomposition MPI calls scan-then-add;
    both phases stay declarative so Catalyst fuses them with the scan."""
    t = _pack_offsets(spark, sf_dir)
    start = F.col("global_start")
    end_tok = start + F.col("n_tokens") - 1
    return t.select(
        "doc_id", "n_tokens",
        start.cast("long").alias("global_start"),
        F.floor(start / PACK_SEQ_LEN).cast("long").alias("first_seq"),
        F.floor(end_tok / PACK_SEQ_LEN).cast("long").alias("last_seq"),
        (F.floor(end_tok / PACK_SEQ_LEN)
         - F.floor(start / PACK_SEQ_LEN) + 1)
        .cast("long").alias("n_seqs_spanned"))


def _pack_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packing layout's shared core: (doc_id, n_tokens,
    global_start) via the two-phase prefix sum corpus_pack_sequences'
    docstring describes (per-bucket window + tiny broadcast
    bucket-offset table — never a single global window task)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.floor(F.col("doc_id") / PACK_BUCKET).alias("bucket"))
    w_in = (Window.partitionBy("bucket").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1))
    t = t.withColumn("cum_in_bucket",
                     F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)))
    btot = t.groupBy("bucket").agg(F.sum("n_tokens").alias("btot"))
    w_b = (Window.orderBy("bucket")
           .rowsBetween(Window.unboundedPreceding, -1))
    boff = btot.withColumn(
        "bucket_off", F.coalesce(F.sum("btot").over(w_b), F.lit(0)))
    return (t.join(F.broadcast(boff.select("bucket", "bucket_off")),
                   "bucket")
            .select("doc_id", "n_tokens",
                    (F.col("bucket_off") + F.col("cum_in_bucket"))
                    .cast("long").alias("global_start")))


PACK_MANIFEST_ORACLE = f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         doc_id // {PACK_BUCKET} AS bucket
  FROM documents
),
w AS (
  SELECT doc_id, n_tokens, bucket,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_in_bucket
  FROM t
),
b AS (SELECT bucket, SUM(n_tokens) AS btot FROM t GROUP BY bucket),
boff AS (
  SELECT bucket,
         COALESCE(SUM(btot) OVER (ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bucket_off
  FROM b
),
o AS (
  SELECT w.doc_id, w.n_tokens,
         boff.bucket_off + w.cum_in_bucket AS st
  FROM w JOIN boff USING (bucket)
  WHERE w.n_tokens > 0
),
spans AS (
  SELECT CAST(u.sq AS BIGINT) AS seq_id, o.doc_id,
         LEAST(o.st + o.n_tokens, (u.sq + 1) * {PACK_SEQ_LEN})
           - GREATEST(o.st, u.sq * {PACK_SEQ_LEN}) AS n_tok_in_seq
  FROM o, unnest(range(CAST(o.st // {PACK_SEQ_LEN} AS BIGINT),
                       CAST((o.st + o.n_tokens - 1) // {PACK_SEQ_LEN} + 1
                            AS BIGINT))) u(sq)
)
SELECT seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok_in_seq) AS BIGINT) AS n_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
       CAST(MAX(doc_id) AS BIGINT) AS last_doc,
       SUM(n_tok_in_seq) = {PACK_SEQ_LEN} AS is_full
FROM spans
GROUP BY seq_id
ORDER BY seq_id
"""


@register("corpus_pack_manifest", oracle=PACK_MANIFEST_ORACLE,
          tags=("mlprep", "packing"))
def corpus_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-SEQUENCE face of corpus_pack_sequences — the manifest a
    training dataloader actually reads: for every packed
    PACK_SEQ_LEN-token window, how many documents contribute, how many
    tokens land in it (every window full except possibly the last),
    and the contributing doc-id range. Built by exploding each doc's
    spanned window range (bounded per doc: n_tokens/PACK_SEQ_LEN + 1
    windows) from the same two-phase prefix-sum offsets, then one
    hash aggregation on seq_id — all integers, so the oracle replay is
    exact. The is_full flag is the packing invariant made visible:
    concat-and-chunk leaves no internal fragmentation, which is the
    reason GPT-style pipelines pack instead of padding."""
    t = _pack_offsets(spark, sf_dir).filter(F.col("n_tokens") > 0)
    L = PACK_SEQ_LEN
    st, fin = F.col("global_start"), F.col("global_start") + F.col("n_tokens")
    spans = (t.select(
        "doc_id", "n_tokens", "global_start",
        F.explode(F.sequence(F.floor(st / L),
                             F.floor((fin - 1) / L))).alias("seq_id"))
        .select(
            F.col("seq_id").cast("long").alias("seq_id"), "doc_id",
            (F.least(fin, (F.col("seq_id") + 1) * L)
             - F.greatest(st, F.col("seq_id") * L)).alias("n_tok_in_seq")))
    return (spans.groupBy("seq_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_tok_in_seq").cast("long").alias("n_tokens"),
                 F.min("doc_id").cast("long").alias("first_doc"),
                 F.max("doc_id").cast("long").alias("last_doc"),
                 (F.sum("n_tok_in_seq") == L).alias("is_full"))
            .orderBy("seq_id"))


SHUFFLE_ORACLE = """
SELECT doc_id,
       md5(CAST(doc_id AS VARCHAR)) AS skey,
       CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)))
            - 1 AS BIGINT) AS shuffle_pos
FROM documents
"""


@register("corpus_shuffle", oracle=SHUFFLE_ORACLE, tags=("mlprep", "shuffle"))
def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle — the training-order
    randomization every pretraining run needs, as a rank every engine
    reproduces: order by ``md5(doc_id)`` (seedable by salting the hash
    input) and emit each doc's position.

    The scale choice is the same as corpus_pack_sequences: a global
    ``ROW_NUMBER() OVER (ORDER BY md5)`` funnels the corpus through one
    task, so the rank runs two-phase — md5 keys are uniform, so the
    first two hex chars give 256 equal-width range buckets whose
    (bucket, key) order IS the key order; rank within bucket in
    parallel, add broadcast bucket offsets (256-row prefix sum). At
    100 TB this is one shuffle on a uniform key plus a broadcast —
    no skew by construction, since the bucketing key is the hash
    itself."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("skey"))
    t = t.withColumn("_b", F.substring("skey", 1, 2))
    w_in = Window.partitionBy("_b").orderBy("skey")
    t = t.withColumn("_rank_in", F.row_number().over(w_in))
    bcnt = t.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    w_b = (Window.orderBy("_b")
           .rowsBetween(Window.unboundedPreceding, -1))
    boff = bcnt.withColumn("_off", F.coalesce(F.sum("_n").over(w_b), F.lit(0)))
    return (t.join(F.broadcast(boff.select("_b", "_off")), "_b")
            .select("doc_id", "skey",
                    (F.col("_off") + F.col("_rank_in") - 1)
                    .cast("long").alias("shuffle_pos")))


def _snap_half_up(x: float, dp: int = 9) -> float:
    """Snap a driver-side float to the ``dp``-decimal grid with the
    SAME rounding rule as the SQL side: Spark and DuckDB ROUND are
    half-AWAY-from-zero on the shortest decimal repr, while Python's
    builtin round() is banker's (half-to-even) — an exact .5 tie one
    digit past the grid would diverge engine vs oracle and then
    compound through the remaining iterations of a driver-updated
    loop. Decimal(repr(x)) mirrors BigDecimal.valueOf's shortest-repr
    semantics (what Spark's round(double) quantizes)."""
    return float(_Decimal(repr(x)).quantize(
        _Decimal(f"1e-{dp}"), rounding=_ROUND_HALF_UP))


def _logreg_gd_oracle_sql(iters: int = 8, lr: float = 0.5) -> str:
    """Unrolled fixed-iteration gradient-descent logistic-regression
    oracle (graduates ml_logreg from rows-only — the vec_pca_power /
    ml_naive_bayes grid discipline applied to an optimizer loop). Each
    iteration is one (gradient-sums, new-beta) CTE pair over the SAME
    feature scan:

    - features x_j and label y are exact IEEE doubles derived from
      integer/timestamp columns by identical arithmetic on both
      engines (division, year(), modulo) — bit-identical inputs;
    - z = ((b0*x0 + b1*x1) + b2*x2) + b3*x3 with FIXED association,
      so the double result is bit-identical given grid betas;
    - p = ROUND(sigmoid(z), 9) snaps the only libm call (exp) to a
      9-dp grid — ulp-level exp() noise sits far below the grid (the
      ml_naive_bayes ln() argument);
    - gradient terms (p - y) * x_j are CAST to DECIMAL(28,9) and
      summed EXACTLY (the only cross-partition traffic, k scalars);
    - beta_j' = ROUND(beta_j - lr * grad_j / n, 9) re-snaps the
      driver-side update to the grid.

    Zero unexplained floats cross an engine boundary, so the engines
    must agree exactly at every iteration."""
    feat = """
f AS MATERIALIZED (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y,
         1.0 AS x0,
         o_totalprice / 100000.0 AS x1,
         (year(o_orderdate) - 1995) / 4.0 AS x2,
         (o_custkey % 97) / 97.0 AS x3
  FROM orders),
nn AS (SELECT COUNT(*) AS n FROM f),
b0 AS (SELECT CAST(0.0 AS DOUBLE) AS c0, CAST(0.0 AS DOUBLE) AS c1,
              CAST(0.0 AS DOUBLE) AS c2, CAST(0.0 AS DOUBLE) AS c3)"""
    its = []
    for i in range(1, iters + 1):
        p = i - 1
        z = ("(((b.c0 * f.x0 + b.c1 * f.x1) + b.c2 * f.x2) "
             "+ b.c3 * f.x3)")
        pg = f"ROUND(1.0 / (1.0 + exp(-{z})), 9)"
        sums = ", ".join(
            f"SUM(CAST(({pg} - f.y) * f.x{j} AS DECIMAL(28,9))) AS g{j}"
            for j in range(4))
        upd = ", ".join(
            f"ROUND(b.c{j} - {lr!r} * (CAST(g.g{j} AS DOUBLE) / nn.n), 9)"
            f" AS c{j}" for j in range(4))
        its.append(f"""
g{i} AS MATERIALIZED (
  SELECT {sums}
  FROM f CROSS JOIN b{p} b),
b{i} AS MATERIALIZED (
  SELECT {upd}
  FROM b{p} b CROSS JOIN g{i} g CROSS JOIN nn)""")
    names = ["intercept", "price", "yr", "noise"]
    finals = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS feature, c{j} AS coef FROM b{iters}"
        for j, name in enumerate(names))
    return (f"WITH {feat},{','.join(its)}\n"
            f"SELECT feature, coef FROM ({finals})\n"
            f"ORDER BY feature")


@register("ml_logreg", oracle=_logreg_gd_oracle_sql(),
          tags=("ml", "logreg", "iterative"))
def ml_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic regression by fixed-iteration gradient
    descent — ORACLE-BACKED (graduated from rows-only in round 9; the
    Newton/IRLS fit lives on as ``ml_logreg_irls``). Each of the 8
    iterations is ONE whole-stage-codegen aggregation pass over the
    feature scan producing k=4 decimal-exact gradient sums (the only
    thing that crosses the executor boundary), with the O(k) update on
    the driver — the classic scalable-GD shape: at 100 TB each step is
    a map-side-combinable scan, no shuffle wider than k scalars.

    Cross-engine determinism (see _logreg_gd_oracle_sql): sigmoid
    outputs snap to a 9-dp grid, gradient terms sum as DECIMAL(28,9),
    betas re-snap to the grid each update — both engines walk the
    identical sequence of grid points, so even this ITERATIVE
    optimizer hash-matches exactly.

    On the synthetic fixture every feature is near-uninformative, so
    8 GD steps at lr=0.5 walk toward the base-rate intercept with
    small feature weights — the same (correct) answer the IRLS twin
    reaches faster; recovery of planted structure is pinned by the
    NumPy-reference test on generated data."""
    o = load_table(spark, sf_dir, "orders")
    feats = o.select(
        F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0)
        .alias("y"),
        F.lit(1.0).alias("x0"),
        (F.col("o_totalprice") / 100000.0).alias("x1"),
        ((F.year("o_orderdate") - F.lit(1995)) / 4.0).alias("x2"),
        ((F.col("o_custkey") % 97) / 97.0).alias("x3"))
    # The GD loop re-aggregates this frame 8 times; checkpoint the
    # narrow (y, x0..x3) projection once (5 doubles/row — far smaller
    # than the orders scan it replaces) so each step reads the
    # persisted columns instead of re-running the parquet scan +
    # projection per iteration (guide §5 caching rule: reused AND
    # cheaper than recompute).
    feats = feats.localCheckpoint(eager=False)
    n = feats.count()
    if n == 0:
        raise ValueError("ml_logreg: empty input — nothing to fit")
    lr = 0.5
    beta = [0.0, 0.0, 0.0, 0.0]
    for _ in range(8):
        # Same FIXED association as the oracle's z expression.
        z = (((F.lit(beta[0]) * F.col("x0")
               + F.lit(beta[1]) * F.col("x1"))
              + F.lit(beta[2]) * F.col("x2"))
             + F.lit(beta[3]) * F.col("x3"))
        pg = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 9)
        sums = [F.sum(((pg - F.col("y")) * F.col(f"x{j}"))
                      .cast("decimal(28,9)")).alias(f"g{j}")
                for j in range(4)]
        g = feats.agg(*sums).first()   # k bounded scalars per step
        beta = [_snap_half_up(beta[j] - lr * (float(g[f"g{j}"]) / n))
                for j in range(4)]
    names = ["intercept", "price", "yr", "noise"]
    rows = [(name, float(b)) for name, b in zip(names, beta)]
    return (spark.createDataFrame(rows, "feature string, coef double")
            .orderBy("feature"))


def _det3_expr(m: list[list[str]]) -> str:
    """3×3 determinant as a FIXED expression tree over entry names —
    the same string is Python-eval'd on the driver and pasted into the
    DuckDB oracle, so both evaluate the identical IEEE operation
    sequence (neither engine reassociates float arithmetic)."""
    (a, b, c), (d, e, f_), (g, h, i) = m
    return (f"({a} * ({e} * {i} - {f_} * {h}) "
            f"- {b} * ({d} * {i} - {f_} * {g}) "
            f"+ {c} * ({d} * {h} - {e} * {g}))")


def _det4_expr(m: list[list[str]]) -> str:
    """4×4 determinant by cofactor expansion along column 0, same
    fixed-tree contract as _det3_expr."""
    parts = []
    for r in range(4):
        minor = [[m[i][j] for j in range(1, 4)]
                 for i in range(4) if i != r]
        term = f"{m[r][0]} * {_det3_expr(minor)}"
        if not parts:
            parts.append(term)
        else:
            parts.append(("- " if r % 2 else "+ ") + term)
    return "(" + " ".join(parts) + ")"


def _irls_h_name(i: int, j: int) -> str:
    return f"h{min(i, j)}{max(i, j)}"


#: Cramer's-rule expression strings for the 4×4 Newton solve, shared
#: verbatim between the Python driver update and the DuckDB oracle:
#: _IRLS_DET = det(H); _IRLS_DETJ[j] = det(H with column j replaced by
#: the gradient). Names g0..g3 / h00..h33 resolve against the
#: per-iteration sums (diagonals pre-ridged).
_IRLS_DET = _det4_expr([[_irls_h_name(i, j) for j in range(4)]
                        for i in range(4)])
_IRLS_DETJ = [
    _det4_expr([[f"g{i}" if j == col else _irls_h_name(i, j)
                 for j in range(4)] for i in range(4)])
    for col in range(4)
]

_IRLS_Z = ("(((b.c0 * f.x0 + b.c1 * f.x1) + b.c2 * f.x2) "
           "+ b.c3 * f.x3)")
_IRLS_MU = f"ROUND(1.0 / (1.0 + exp(-{_IRLS_Z})), 9)"


def _logreg_irls_oracle_sql(iters: int = 8) -> str:
    """Unrolled Newton/IRLS oracle — the _logreg_gd_oracle_sql
    discipline extended with the 4×4 solve: per iteration one CTE of
    14 decimal-exact sums (4 gradient + 10 upper-triangle Hessian
    entries, sigmoid snapped to the 9-dp grid), one CTE casting them
    to doubles with the 1e-9 ridge folded into the diagonal, and one
    beta CTE whose updates are Cramer's-rule EXPRESSION TREES — the
    exact strings the engine's driver eval()s, so both engines run the
    identical IEEE operation sequence and walk the same 9-dp beta
    grid. Log loss snaps each per-row term to the grid (ulp-level
    ln/exp noise sits far below) and sums exactly."""
    feat = """
f AS MATERIALIZED (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y,
         1.0 AS x0,
         o_totalprice / 100000.0 AS x1,
         (year(o_orderdate) - 1995) / 4.0 AS x2,
         (o_custkey % 97) / 97.0 AS x3
  FROM orders),
b0 AS (SELECT CAST(0.0 AS DOUBLE) AS c0, CAST(0.0 AS DOUBLE) AS c1,
              CAST(0.0 AS DOUBLE) AS c2, CAST(0.0 AS DOUBLE) AS c3)"""
    its = []
    for it in range(1, iters + 1):
        p = it - 1
        w = f"({_IRLS_MU} * (1.0 - {_IRLS_MU}))"
        sums = [f"SUM(CAST((f.y - {_IRLS_MU}) * f.x{j} "
                f"AS DECIMAL(28,9))) AS g{j}" for j in range(4)]
        sums += [f"SUM(CAST(({w} * f.x{i}) * f.x{j} "
                 f"AS DECIMAL(28,9))) AS h{i}{j}"
                 for i in range(4) for j in range(4) if j >= i]
        casts = [f"CAST(g{j} AS DOUBLE) AS g{j}" for j in range(4)]
        casts += [f"CAST(h{i}{j} AS DOUBLE)"
                  + (" + 1e-09" if i == j else "") + f" AS h{i}{j}"
                  for i in range(4) for j in range(4) if j >= i]
        upd = ", ".join(
            f"ROUND(b.c{j} + {_IRLS_DETJ[j]} / {_IRLS_DET}, 9) AS c{j}"
            for j in range(4))
        its.append(f"""
s{it} AS MATERIALIZED (
  SELECT {', '.join(sums)}
  FROM f CROSS JOIN b{p} b),
m{it} AS (
  SELECT {', '.join(casts)}
  FROM s{it}),
b{it} AS MATERIALIZED (
  SELECT {upd}
  FROM b{p} b CROSS JOIN m{it})""")
    nll_term = (f"ROUND(-(f.y * ln({_IRLS_MU} + 1e-12) "
                f"+ (1.0 - f.y) * ln(1.0 - {_IRLS_MU} + 1e-12)), 9)")
    names = ["intercept", "price", "yr", "noise"]
    finals = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS feature, ROUND(c{j}, 6) AS coef FROM b{iters}"
        for j, name in enumerate(names))
    return (f"WITH {feat},{','.join(its)},\n"
            f"ll AS (SELECT SUM(CAST({nll_term} AS DECIMAL(28,9))) AS nll,"
            f" COUNT(*) AS n FROM f CROSS JOIN b{iters} b)\n"
            f"SELECT feature, coef FROM ({finals}\n"
            f"UNION ALL SELECT '_log_loss' AS feature,"
            f" ROUND(CAST(nll AS DOUBLE) / n, 6) AS coef FROM ll\n"
            f"UNION ALL SELECT '_n' AS feature,"
            f" CAST(n AS DOUBLE) AS coef FROM ll)\n"
            f"ORDER BY feature")


@register("ml_logreg_irls", oracle=_logreg_irls_oracle_sql(),
          tags=("ml", "logreg", "iterative"))
def ml_logreg_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic regression by Newton/IRLS — ORACLE-BACKED
    (graduated in round 10; round 9's "no tractable ANSI-SQL oracle"
    claim fell to the fixed-expression-tree trick): 8 Newton steps,
    each ONE whole-stage-codegen aggregation pass producing k + k(k+1)/2
    decimal-exact gradient/Hessian sums (sigmoid snapped to the 9-dp
    grid — the ml_logreg discipline), with the 4×4 solve done by
    CRAMER'S RULE as generated expression strings (_IRLS_DET /
    _IRLS_DETJ) that the driver Python-eval()s and the oracle pastes
    verbatim — one shared parse tree, so both engines execute the
    identical IEEE operation sequence on identical inputs and the
    betas walk the same grid through all 8 iterations. Output: one row
    per coefficient plus _log_loss and _n summary rows, rounded to
    6 dp — same schema and same answers (to the grid) as the previous
    np.linalg.solve formulation.

    The general-k API (operators/ml.py logistic_irls, NumPy solve)
    remains the library face and keeps its NumPy-reference property
    test; this registered 4-feature instance trades the generic solve
    for cross-engine replayability. Scale shape unchanged: per
    iteration one map-side-combinable scan, 14 scalars across the
    executor boundary, O(k³)=O(1) driver math."""
    o = load_table(spark, sf_dir, "orders")
    feats = o.select(
        F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0)
        .alias("y"),
        F.lit(1.0).alias("x0"),
        (F.col("o_totalprice") / 100000.0).alias("x1"),
        ((F.year("o_orderdate") - F.lit(1995)) / 4.0).alias("x2"),
        ((F.col("o_custkey") % 97) / 97.0).alias("x3"))
    # 8 Newton steps + the log-loss pass re-aggregate this frame 9
    # times — checkpoint the narrow projection once (see ml_logreg).
    feats = feats.localCheckpoint(eager=False)
    beta = [0.0, 0.0, 0.0, 0.0]
    ns = {"__builtins__": {}}
    for _ in range(8):
        z = (((F.lit(beta[0]) * F.col("x0")
               + F.lit(beta[1]) * F.col("x1"))
              + F.lit(beta[2]) * F.col("x2"))
             + F.lit(beta[3]) * F.col("x3"))
        mu = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 9)
        w = mu * (F.lit(1.0) - mu)
        aggs = [F.sum(((F.col("y") - mu) * F.col(f"x{j}"))
                      .cast("decimal(28,9)")).alias(f"g{j}")
                for j in range(4)]
        aggs += [F.sum(((w * F.col(f"x{i}")) * F.col(f"x{j}"))
                       .cast("decimal(28,9)")).alias(f"h{i}{j}")
                 for i in range(4) for j in range(4) if j >= i]
        row = feats.agg(*aggs).first()   # 14 bounded scalars per step
        if row["g0"] is None:
            raise ValueError("ml_logreg_irls: empty input — nothing to fit")
        vals = {f"g{j}": float(row[f"g{j}"]) for j in range(4)}
        for i in range(4):
            for j in range(i, 4):
                v = float(row[f"h{i}{j}"])
                vals[f"h{i}{j}"] = v + 1e-09 if i == j else v
        det = eval(_IRLS_DET, ns, dict(vals))          # noqa: S307
        beta = [_snap_half_up(beta[j]
                              + eval(_IRLS_DETJ[j], ns, dict(vals)) / det)  # noqa: S307
                for j in range(4)]
    zf = (((F.lit(beta[0]) * F.col("x0")
            + F.lit(beta[1]) * F.col("x1"))
           + F.lit(beta[2]) * F.col("x2"))
          + F.lit(beta[3]) * F.col("x3"))
    muf = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-zf)), 9)
    term = F.round(
        -(F.col("y") * F.log(muf + F.lit(1e-12))
          + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - muf
                                              + F.lit(1e-12))), 9)
    stats = feats.agg(
        F.sum(term.cast("decimal(28,9)")).alias("nll"),
        F.count(F.lit(1)).alias("n")).first()
    names = ["intercept", "price", "yr", "noise"]
    rows = [(name, _snap_half_up(b, 6)) for name, b in zip(names, beta)]
    rows += [("_log_loss",
              _snap_half_up(float(stats["nll"]) / stats["n"], 6)),
             ("_n", float(stats["n"]))]
    return (spark.createDataFrame(rows, "feature string, coef double")
            .orderBy("feature"))


@register("sample_cluster_cap", oracle="""
WITH ranked AS (
  SELECT vec_id, label,
         row_number() OVER (PARTITION BY label
                            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
           AS rn,
         COUNT(*) OVER (PARTITION BY label) AS cluster_size
  FROM embeddings
)
SELECT vec_id, CAST(label AS INT) AS label,
       CAST(cluster_size AS BIGINT) AS cluster_size
FROM ranked
WHERE rn <= 10
""", tags=("mlprep", "sample", "embedding"))
def sample_cluster_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-capped diversity sampling — the curation counterpart of
    semantic dedup: cap every embedding cluster at 10 representatives
    (md5-of-id rank — reproducible across engines, runs, partitionings)
    so over-represented modes can't dominate a training mix, the
    SemDeDup-style prototype selection expressed as one window over the
    cluster key. Emits the original cluster_size so the curation report
    can weight what was kept. At 100 TB the per-cluster sort is bounded
    by the cluster key's cardinality x cap; a hot mega-cluster costs a
    straggler, not memory (rank + filter, no collect)."""
    e = load_table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id")
    wn = Window.partitionBy("label")
    return (e.select("vec_id", F.col("label").cast("int").alias("label"),
                     F.row_number().over(w).alias("_rn"),
                     F.count(F.lit(1)).over(wn).cast("long")
                      .alias("cluster_size"))
            .filter(F.col("_rn") <= 10)
            .drop("_rn"))


@register("ml_impute", oracle=f"""
WITH base AS (
  SELECT event_type, value, (event_id % 13 = 0) AS miss FROM events
), med AS (
  SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS med
  FROM base WHERE NOT miss GROUP BY event_type
)
SELECT b.event_type,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN b.miss THEN 1 ELSE 0 END) AS BIGINT)
         AS n_missing,
       m.med AS imputed_with,
       {sql_dsum('CASE WHEN b.miss THEN m.med ELSE b.value END')}
         AS sum_imputed
FROM base b JOIN med m ON m.event_type = b.event_type
GROUP BY b.event_type, m.med
ORDER BY b.event_type
""", tags=("mlprep", "impute", "quality"))
def ml_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value imputation — the ML-prep operator every feature
    pipeline runs before a fit: numeric holes fill with the per-group
    EXACT median of the observed values. The fixture has no nulls, so
    missingness is synthesized deterministically (event_id % 13 — the
    malformed-CSV-quarantine convention of manufacturing the failure
    mode from clean fixtures), which also makes the whole pipeline
    oracle-checkable: the imputed VALUE is the 6-dp-snapped
    interpolated median (Spark ``percentile`` and DuckDB
    ``quantile_cont`` share the (n-1)p positional definition; the snap
    absorbs their last-ulp interpolation difference, the ml_naive_bayes
    grid argument), and ``sum_imputed`` decimal-sums the post-fill
    column row-by-row, so a single mis-filled row fails the hash.

    Scale: one aggregation for the medians (exact percentile is a
    sort-based agg — at 100 TB swap percentile_approx in the SAME
    plan; the fill join is a broadcast of |group| rows either way) and
    one broadcast join back to the facts — no shuffle of the fact
    table."""
    e = load_table(spark, sf_dir, "events")
    base = e.select("event_type", "value",
                    (F.col("event_id") % 13 == 0).alias("miss"))
    med = (base.filter(~F.col("miss"))
           .groupBy("event_type")
           .agg(F.round(F.expr("percentile(value, 0.5)"), 6)
                .alias("med")))
    filled = (base.join(F.broadcast(med), "event_type")
              .select("event_type", "miss", "med",
                      F.when(F.col("miss"), F.col("med"))
                       .otherwise(F.col("value")).alias("v")))
    return (filled.groupBy("event_type", "med")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.when(F.col("miss"), 1).otherwise(0))
                  .cast("long").alias("n_missing"),
                 dsum("v").alias("sum_imputed"))
            .select("event_type", "n_rows", "n_missing",
                    F.col("med").alias("imputed_with"), "sum_imputed")
            .orderBy("event_type"))


# --------------------------------------------------------------------------
# Ridge regression, closed form (round 10, second wave): the normal
# equations (X'X + lambda*I_noint) beta = X'y solved by the SAME
# Cramer's-rule expression-tree discipline as ml_logreg_irls — but
# with NO iterations at all: one whole-stage-codegen aggregation pass
# produces the 9 decimal-exact sufficient statistics, and the 3x3
# solve is O(1) on the driver. The cheapest possible distributed
# linear model: at 100 TB the entire fit is one map-side-combinable
# scan, shuffling exactly nine scalars.

_RIDGE_LAMBDA = 100.0

#: 3x3 Gram matrix entry names (intercept, qty, disc), ridge folded
#: into the non-intercept diagonal only — the standard "don't
#: penalize the intercept" form.
_RIDGE_A = [["nn", "s1", "s2"],
            ["s1", f"(s11 + {_RIDGE_LAMBDA!r})", "s12"],
            ["s2", "s12", f"(s22 + {_RIDGE_LAMBDA!r})"]]
_RIDGE_B = ["sy", "s1y", "s2y"]
_RIDGE_DET = _det3_expr(_RIDGE_A)
_RIDGE_DETJ = [
    _det3_expr([[_RIDGE_B[i] if j == col else _RIDGE_A[i][j]
                 for j in range(3)] for i in range(3)])
    for col in range(3)
]


def _ridge_oracle_sql() -> str:
    """One CTE of decimal-exact sufficient statistics (per-row double
    products cast to DECIMAL(28,9) — the ml_logreg grid discipline,
    bit-identical across engines regardless of partial-agg order),
    one CTE casting to doubles, then the THREE Cramer expression
    trees pasted verbatim — the same strings the engine's driver
    Python-eval()s, so both engines run the identical IEEE sequence."""
    dets = ",\n       ".join(
        f"ROUND({_RIDGE_DETJ[j]} / {_RIDGE_DET}, 9) AS b{j}"
        for j in range(3))
    return f"""
WITH f AS (SELECT l_extendedprice / 100000.0 AS y,
                  l_quantity / 50.0 AS x1,
                  l_discount * 10.0 AS x2
           FROM lineitem),
sums AS (SELECT CAST(COUNT(*) AS DECIMAL(28,9)) AS nn,
                SUM(CAST(x1 AS DECIMAL(28,9))) AS s1,
                SUM(CAST(x2 AS DECIMAL(28,9))) AS s2,
                SUM(CAST(y  AS DECIMAL(28,9))) AS sy,
                SUM(CAST(x1 * x1 AS DECIMAL(28,9))) AS s11,
                SUM(CAST(x1 * x2 AS DECIMAL(28,9))) AS s12,
                SUM(CAST(x2 * x2 AS DECIMAL(28,9))) AS s22,
                SUM(CAST(x1 * y  AS DECIMAL(28,9))) AS s1y,
                SUM(CAST(x2 * y  AS DECIMAL(28,9))) AS s2y
         FROM f),
d AS (SELECT CAST(nn AS DOUBLE) AS nn, CAST(s1 AS DOUBLE) AS s1,
             CAST(s2 AS DOUBLE) AS s2, CAST(sy AS DOUBLE) AS sy,
             CAST(s11 AS DOUBLE) AS s11, CAST(s12 AS DOUBLE) AS s12,
             CAST(s22 AS DOUBLE) AS s22, CAST(s1y AS DOUBLE) AS s1y,
             CAST(s2y AS DOUBLE) AS s2y
      FROM sums),
beta AS (SELECT {dets} FROM d)
SELECT feature, coef
FROM (SELECT 'intercept' AS feature, b0 AS coef FROM beta
      UNION ALL SELECT 'qty', b1 FROM beta
      UNION ALL SELECT 'disc', b2 FROM beta)
ORDER BY feature
"""


@register("ml_ridge", oracle=_ridge_oracle_sql(), tags=("ml", "regression"))
def ml_ridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge regression (price ~ quantity + discount,
    lambda=100 on the non-intercept diagonal) — ORACLE-BACKED: one
    aggregation pass computes the nine sufficient statistics as
    decimal-exact sums of per-row IEEE double products (the ml_logreg
    grid discipline), and the 3x3 normal-equation solve runs Cramer
    expression trees shared VERBATIM with the oracle SQL (_RIDGE_DET /
    _RIDGE_DETJ — eval'd here, pasted there), so the division sequence
    is bit-identical across engines before the final 9-dp snap.

    Scale shape: the fit IS the aggregate — no iteration, no shuffle
    beyond nine scalars, map-side combinable, whole-stage codegen end
    to end. tests/test_analytics.py pins the solve against a NumPy
    float64 normal-equation solve to 1e-6 and asserts the ridge
    shrinks the penalized coefficients vs the lambda=0 OLS solution
    (the fixture's price is independent of quantity by construction,
    so the slopes are near-zero noise — the algebra, not the
    economics, is what's pinned)."""
    li = load_table(spark, sf_dir, "lineitem")
    f = li.select((F.col("l_extendedprice") / 100000.0).alias("y"),
                  (F.col("l_quantity") / 50.0).alias("x1"),
                  (F.col("l_discount") * 10.0).alias("x2"))
    s = f.agg(
        F.count(F.lit(1)).cast("decimal(28,9)").alias("nn"),
        F.sum(F.col("x1").cast("decimal(28,9)")).alias("s1"),
        F.sum(F.col("x2").cast("decimal(28,9)")).alias("s2"),
        F.sum(F.col("y").cast("decimal(28,9)")).alias("sy"),
        F.sum((F.col("x1") * F.col("x1")).cast("decimal(28,9)")).alias("s11"),
        F.sum((F.col("x1") * F.col("x2")).cast("decimal(28,9)")).alias("s12"),
        F.sum((F.col("x2") * F.col("x2")).cast("decimal(28,9)")).alias("s22"),
        F.sum((F.col("x1") * F.col("y")).cast("decimal(28,9)")).alias("s1y"),
        F.sum((F.col("x2") * F.col("y")).cast("decimal(28,9)")).alias("s2y"),
    ).first()
    if s["nn"] is None or int(s["nn"]) == 0:
        raise ValueError("ml_ridge: empty input — nothing to fit")
    env = {k: float(s[k]) for k in
           ("nn", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y")}
    det = eval(_RIDGE_DET, {"__builtins__": {}}, env)  # noqa: S307
    beta = [_snap_half_up(eval(dj, {"__builtins__": {}}, env) / det)  # noqa: S307
            for dj in _RIDGE_DETJ]
    rows = list(zip(["intercept", "qty", "disc"], beta))
    return (spark.createDataFrame(rows, "feature string, coef double")
            .orderBy("feature"))


_STUMP_BIN = 2000.0  # fixed-width price bins — candidate thresholds

#: Weighted-Gini expression over exact integer counts (shared Spark /
#: DuckDB shape): every name is an exact int64 (< 2^53, so its double
#: image is exact), each division is ONE IEEE op on identical
#: operands, and the association is pinned by parentheses — both
#: engines walk the same float sequence into the 9-dp round.
_STUMP_GINI = ("ROUND(((CAST(nl AS DOUBLE) "
               "- CAST(posl * posl + negl * negl AS DOUBLE) / nl) "
               "+ (CAST(nr AS DOUBLE) "
               "- CAST(posr * posr + negr * negr AS DOUBLE) / nr)) "
               "/ nn, 9)")


def _tree_stump_oracle_sql() -> str:
    return f"""
WITH b AS (SELECT CAST(floor(o_totalprice / {_STUMP_BIN!r}) AS BIGINT) AS bin,
                  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
           FROM orders),
h AS (SELECT bin, COUNT(*) AS cnt, SUM(y) AS pos FROM b GROUP BY bin),
tot AS (SELECT SUM(cnt) AS nn, SUM(pos) AS pos_t FROM h),
cum AS (SELECT bin,
               SUM(cnt) OVER (ORDER BY bin) AS nl,
               SUM(pos) OVER (ORDER BY bin) AS posl
        FROM h),
split AS (SELECT bin, nl, posl,
                 nl - posl AS negl,
                 nn - nl AS nr,
                 pos_t - posl AS posr,
                 (nn - nl) - (pos_t - posl) AS negr,
                 nn
          FROM cum, tot
          WHERE nl < nn)
SELECT CAST((bin + 1) * {_STUMP_BIN!r} AS DOUBLE) AS split_threshold,
       {_STUMP_GINI} AS gini,
       CAST(nl AS BIGINT) AS n_left, CAST(posl AS BIGINT) AS pos_left,
       CAST(nr AS BIGINT) AS n_right, CAST(posr AS BIGINT) AS pos_right
FROM split
ORDER BY {_STUMP_GINI}, bin
LIMIT 1
"""


@register("ml_tree_stump", oracle=_tree_stump_oracle_sql(),
          tags=("ml", "tree"))
def ml_tree_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump split finding (best weighted-Gini threshold for
    o_orderstatus='F' on o_totalprice) — ORACLE-BACKED, and built the
    way distributed GBDT actually does it: HISTOGRAM split finding
    (LightGBM/XGBoost-hist), not per-row candidate enumeration. One
    map-side-combinable groupBy builds fixed-width bin histograms of
    (count, positives); the cumulative scan over the ~hundreds of
    bins — not the millions of rows — enumerates every candidate
    threshold; the argmin is a bounded TakeOrdered. At 100 TB the only
    full-data pass is the histogram aggregate (k scalars per bin
    cross the wire); the split scan is driver-trivial by construction,
    which is precisely why the histogram trick owns this space.

    Determinism: Gini comes from exact int64 prefix counts through a
    pinned-association double expression (``_STUMP_GINI``, shared
    textually with the oracle), rounded to the 9-dp grid; ties break
    on the smaller bin. tests/test_analytics.py re-derives the best
    split with pandas/NumPy and pins equality."""
    o = load_table(spark, sf_dir, "orders")
    b = o.select(
        F.floor(F.col("o_totalprice") / _STUMP_BIN).cast("long").alias("bin"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"))
    h = b.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"),
                             F.sum("y").alias("pos"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.select("bin", F.sum("cnt").over(w).alias("nl"),
                   F.sum("pos").over(w).alias("posl"))
    tot = h.agg(F.sum("cnt").alias("nn"), F.sum("pos").alias("pos_t"))
    split = (cum.join(F.broadcast(tot))
             .filter(F.col("nl") < F.col("nn"))
             .select("bin", "nl", "posl", "nn",
                     (F.col("nl") - F.col("posl")).alias("negl"),
                     (F.col("nn") - F.col("nl")).alias("nr"),
                     (F.col("pos_t") - F.col("posl")).alias("posr"),
                     ((F.col("nn") - F.col("nl"))
                      - (F.col("pos_t") - F.col("posl"))).alias("negr")))
    scored = split.withColumn("gini", F.expr(_STUMP_GINI))
    return (scored
            .orderBy("gini", "bin").limit(1)
            .select(((F.col("bin") + 1) * _STUMP_BIN)
                    .alias("split_threshold"),
                    "gini",
                    F.col("nl").alias("n_left"),
                    F.col("posl").alias("pos_left"),
                    F.col("nr").alias("n_right"),
                    F.col("posr").alias("pos_right")))
