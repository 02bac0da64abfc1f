"""UDF / UDAF / UDTF surface (SURVEY.md §2.11) — every Python-extension
mechanism PySpark offers, each on the smallest sensible example:

- scalar pandas_udf (Arrow-vectorized) — the default custom kernel
- row-at-a-time Python UDF — demonstrated because the surface exists;
  deliberately on a sampled input (it is the slow path by design)
- grouped-aggregate pandas_udf (PySpark's UDAF story)
- grouped-map applyInPandas
- UDTF (lateral table function, Spark >= 3.5)

mapInPandas is exercised by operators/knn.py and queries/multimodal.py.

Determinism note: UDAF kernels only compute order-insensitive
quantities (integer sums, max) — a float sum inside a UDAF would
depend on shuffle arrival order.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.num import DEC
from ..io import load_table
from ..registry import register


@register("udf_pandas_scalar", oracle="""
SELECT doc_id,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
         AS n_tokens_udf
FROM documents
""", tags=("udf",))
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas_udf: token count via pandas str
    ops on the whole batch (no per-row Python dispatch)."""
    @F.pandas_udf("long")
    def count_tokens(texts: pd.Series) -> pd.Series:
        return texts.str.count(" ").add(1).astype("int64")

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", count_tokens("text").alias("n_tokens_udf"))


@register("udf_python_scalar", oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS k2
FROM events
WHERE event_id % 100 = 0
""", tags=("udf",))
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the pickle-per-row slow path — kept to
    a deterministic modulo sample; any hot-path use belongs in a
    pandas_udf)."""
    import json

    @F.udf("long")
    def parse_k_doubled(props: str) -> int:
        return json.loads(props)["k"] * 2

    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 100 == 0)
    return e.select("event_id", parse_k_doubled("props").alias("k2"))


@register("udaf_grouped_agg", oracle="""
SELECT lang,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars_udaf,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars_udaf
FROM documents
GROUP BY lang
""", tags=("udf", "udaf"))
def udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf (UDAF): the whole group arrives as a
    Series; kernels compute order-insensitive integer aggregates."""
    @F.pandas_udf("long")
    def total_chars(chars: pd.Series) -> int:
        return int(chars.sum())

    @F.pandas_udf("long")
    def max_chars(chars: pd.Series) -> int:
        return int(chars.max())

    d = load_table(spark, sf_dir, "documents")
    return (d.groupBy("lang")
            .agg(total_chars("n_chars").alias("total_chars_udaf"),
                 max_chars("n_chars").alias("max_chars_udaf")))


@register("udf_grouped_map", oracle="""
SELECT user_id, event_id, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY value DESC, event_id) <= 2
""", tags=("udf", "groupedmap"))
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-user top-2 events by value,
    computed in pandas with an explicit deterministic sort (value desc,
    event_id asc tie-break)."""
    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        return (pdf.sort_values(["value", "event_id"],
                                ascending=[False, True])
                .head(2)[["user_id", "event_id", "value"]])

    e = load_table(spark, sf_dir, "events")
    return (e.select("user_id", "event_id", "value")
            .groupBy("user_id")
            .applyInPandas(top2, "user_id long, event_id long, value double"))


@register("udtf_expand", oracle="""
SELECT doc_id, CAST(i AS BIGINT) AS piece_idx,
       CAST(n_chars * (i + 1) AS BIGINT) AS scaled
FROM (SELECT doc_id, n_chars FROM documents WHERE doc_id % 50 = 0),
     unnest([0, 1, 2]) t(i)
""", tags=("udf", "udtf"))
def udtf_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): each input row yields 3 output
    rows — the lateral-join/set-returning shape with user logic."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="piece_idx bigint, scaled bigint")
    class Expand:
        def eval(self, n_chars: int):  # noqa: D401
            for i in range(3):
                yield i, n_chars * (i + 1)

    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("doc_id") % 50 == 0)
         .select("doc_id", "n_chars"))
    d.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("expand_pieces", Expand)
    return spark.sql("""
        SELECT doc_id, t.piece_idx, t.scaled
        FROM _udtf_docs, LATERAL expand_pieces(n_chars) t
    """)


@register("sql_entry", oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
GROUP BY o_orderstatus
""", tags=("sql",))
def sql_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql entry point (SURVEY.md §3.2 E3): register the view
    catalog, run SQL text — same Catalyst pipeline as the DataFrame API."""
    from ..io import register_views
    register_views(spark, sf_dir, ["orders"])
    return spark.sql("""
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               COUNT(DISTINCT o_custkey) AS n_customers
        FROM orders
        GROUP BY o_orderstatus
    """)


@register("join_cross", oracle="""
SELECT r.r_name, n.n_name
FROM region r CROSS JOIN nation n
""", tags=("join", "cross"))
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Cartesian product (bounded dims only — a cross join on
    fact tables is a plan bug, see plans/audit.py)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@register("udf_arrow_map", oracle="""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents
WHERE n_chars >= 64
GROUP BY lang
""", tags=("udf", "arrow"))
def udf_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy end of the Python UDF spectrum — the
    kernel receives pyarrow RecordBatches directly (no pandas
    conversion), computes token counts with Arrow compute kernels, and
    emits batches. For string-heavy 100 TB corpora this skips the
    pandas object-boxing that mapInPandas pays on text columns. The
    relational tail (filter + groupBy) stays JVM-side and the oracle
    recomputes everything in SQL."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            toks = pc.list_value_length(
                pc.split_pattern(tbl.column("text"), " "))
            yield pa.RecordBatch.from_arrays(
                [tbl.column("lang").combine_chunks(),
                 pc.cast(toks, pa.int64()).combine_chunks(),
                 tbl.column("n_chars").combine_chunks()],
                names=["lang", "n_tokens", "n_chars"])

    d = load_table(spark, sf_dir, "documents").select("lang", "text", "n_chars")
    mapped = d.mapInArrow(kernel, "lang string, n_tokens long, n_chars long")
    return (mapped.filter(F.col("n_chars") >= 64)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens")))


@register("ps_api_groupby", oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM orders
GROUP BY o_orderstatus
""", tags=("api", "pandas"))
def ps_api_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas API on Spark: the same groupby expressed in pandas idiom
    (`psdf.groupby(...).agg(...)`) compiles to the identical
    distributed plan — the migration surface for pandas codebases (no
    collect; the pandas-shaped frame IS a DataFrame underneath). The
    decimal-exact total is applied on the way back to Spark so the
    result hash-matches the engine's conventions."""
    import pyspark.pandas as ps  # noqa: F401

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice")
    psdf = o.pandas_api()
    counts = psdf.groupby("o_orderstatus").size()
    sdf_counts = counts.rename("n_orders").to_frame().reset_index() \
        .to_spark()
    totals = (o.groupBy("o_orderstatus")
              .agg(F.sum(F.col("o_totalprice").cast(DEC))
                   .cast("double").alias("total")))
    return sdf_counts.join(totals, "o_orderstatus") \
        .select("o_orderstatus", "n_orders", "total")


@register("udaf_window", oracle="""
SELECT event_id, user_id,
       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
             6) AS udaf_avg5
FROM events
WHERE user_id % 5 = 0
""", tags=("udf", "window"))
def udaf_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDAF applied OVER A WINDOW FRAME: the grouped-agg Arrow
    UDF runs once per frame (trailing 5 rows per user) — custom Python
    aggregation logic composed with Spark's windowing machinery instead
    of reimplementing frames in Python. The kernel is a plain
    numpy mean; the oracle uses the built-in AVG over the identical
    frame (5-value means are exact in both engines; rounded only for
    display)."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def np_mean(v: pd.Series) -> float:
        return float(np.mean(v.to_numpy()))

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 5 == 0)
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-4, Window.currentRow))
    return e.select("event_id", "user_id",
                    F.round(np_mean("value").over(w), 6).alias("udaf_avg5"))


@register("udf_arrow_iter", oracle="""
SELECT event_id,
       ROUND(1.0 / (1.0 + EXP(-(value / 100.0 - 2.0))), 6) AS score
FROM events WHERE event_id % 37 = 0
""", tags=("udf", "inference"))
def udf_arrow_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-series pandas UDF — the batch-inference pattern:
    the function body runs ONCE per task, loads the "model" (here a
    2-weight logistic head; in production a tokenizer/ONNX session/
    embedding table), then scores every Arrow batch the task streams
    through it. This amortized-init shape is the standard way to run
    per-row ML inference on executors without per-batch model reloads
    — the plain SCALAR pandas_udf re-enters for every batch with no
    place to hang expensive state.

    The score math mirrors the oracle operand-for-operand (x/100.0,
    not x*0.01 — they differ in FP) and rounding happens JVM-side with
    Spark's ROUND so both engines share half-up semantics; numpy exp
    vs libm exp differences sit ~1e-16, far under the 6-dp grid.

    Scale: Arrow-batched transfer, one Python worker per core, state
    held per task — the plan is a scan + project, no shuffle."""
    import numpy as np

    @F.pandas_udf("double")
    def infer(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # "model load" — once per task, reused across all batches
        w, b = 1.0 / 100.0, -2.0  # noqa: F841 — b applied via subtraction
        for vals in batches:
            z = vals.to_numpy(dtype="float64") / 100.0 - 2.0
            yield pd.Series(1.0 / (1.0 + np.exp(-z)))

    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 37 == 0)
    return e.select("event_id", F.round(infer("value"), 6).alias("score"))


@register("ps_api_rolling", oracle="""
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(*), 6) AS y
  FROM events GROUP BY day, event_type
), r AS (
  SELECT event_type, day,
         AVG(y) OVER w AS roll3,
         COUNT(*) OVER w AS cnt
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day, ROUND(roll3, 6) AS roll3 FROM r WHERE cnt = 3
""", tags=("api", "pandas", "window"))
def ps_api_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas API on Spark, rolling flavor: a 3-day moving average of
    the per-type daily mean written in pandas idiom —
    ``psdf.groupby(type)[y].rolling(3).mean()`` — which pyspark.pandas
    compiles to the SAME bounded window-frame plan the SQL form takes
    (no collect, no driver pandas). Together with ps_api_groupby this
    pins the migration story: pandas codebases keep their idioms and
    inherit the distributed plan.

    The daily means are grid-rounded before the rolling mean so the
    3-term frame average is noise-free at 6 dp; min_periods defaults
    to the window, matching the oracle's cnt = 3 filter."""
    import pyspark.pandas as ps  # noqa: F401

    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy(F.date_format(F.date_trunc("day", "ts"),
                                     "yyyy-MM-dd").alias("day"),
                       "event_type")
             .agg(F.round(F.sum(F.col("value").cast("decimal(38,6)"))
                          .cast("double") / F.count(F.lit(1)), 6)
                  .alias("y")))
    psdf = (daily.pandas_api()
            .sort_values(["event_type", "day"])
            .set_index("day"))
    roll = psdf.groupby("event_type")["y"].rolling(3).mean()
    out = roll.rename("roll3").reset_index().to_spark()
    return (out.where(F.col("roll3").isNotNull())
            .select("event_type", "day", F.round("roll3", 6).alias("roll3")))


@register("udf_cogrouped_map", oracle="""
WITH o AS (
  SELECT user_id, ts, MAX(value) AS value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
), c AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.user_id, epoch_us(c.ts) AS click_us,
       epoch_us(p.ts) AS purchase_us, p.value
FROM c ASOF JOIN o p
  ON c.user_id = p.user_id AND p.ts <= c.ts
""", tags=("udf", "cogroup"))
def udf_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map applyInPandas — the two-sided grouped kernel:
    clicks and purchases cogroup on user_id, each group pair lands in
    pandas, and merge_asof attaches the latest preceding purchase to
    every click. The same engine surface the two-sided blocked kNN
    plan uses (operators/knn.py), here on the canonical as-of
    enrichment; DuckDB's native ASOF JOIN is the oracle, and
    operators/asof.py is the pure-relational form of the same
    semantics (this pins the pandas path against both).

    Timestamps cross the boundary as exact integer microseconds. The
    purchase side is pre-collapsed to one row per (user, ts) with a
    MAX(value) tie policy on BOTH engines — merge_asof keeps pandas
    arrival order among equal keys and DuckDB's ASOF picks its own
    arbitrary tied row, so without the collapse an equal-timestamp
    pair would make the attached value partition-order-dependent.
    Scale: one shuffle of each side on user_id, Arrow transfer
    per group pair, per-group memory bounded by a user's history
    (the same contract as udf_grouped_map)."""
    e = load_table(spark, sf_dir, "events")
    clicks = (e.where(F.col("event_type") == "click")
              .select("user_id", F.unix_micros("ts").alias("click_us")))
    purch = (e.where(F.col("event_type") == "purchase")
             .groupBy("user_id", F.unix_micros("ts").alias("purchase_us"))
             .agg(F.max("value").alias("value")))

    def merge(clicks_pdf: pd.DataFrame, purch_pdf: pd.DataFrame) -> pd.DataFrame:
        if clicks_pdf.empty:
            return pd.DataFrame(columns=["user_id", "click_us",
                                         "purchase_us", "value"])
        left = clicks_pdf.sort_values("click_us")
        if purch_pdf.empty:
            out = left.copy()
            out["purchase_us"] = pd.Series(dtype="float64")
            out["value"] = pd.Series(dtype="float64")
        else:
            out = pd.merge_asof(
                left, purch_pdf.sort_values("purchase_us"),
                left_on="click_us", right_on="purchase_us",
                direction="backward")
        out["user_id"] = left["user_id"].iloc[0]
        return out[["user_id", "click_us", "purchase_us", "value"]]

    merged = (clicks.groupBy("user_id")
              .cogroup(purch.groupBy("user_id"))
              .applyInPandas(merge, "user_id long, click_us long, "
                                    "purchase_us long, value double"))
    # ASOF JOIN (inner) drops clicks with no preceding purchase
    return merged.where(F.col("purchase_us").isNotNull())


@register("udf_arrow_scalar", oracle="""
SELECT doc_id,
       CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS BIGINT)
         AS n_vowels
FROM documents
""", tags=("udf", "arrow"))
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-OPTIMIZED scalar Python UDF (Spark 4 ``useArrow=True``):
    per-row Python semantics with Arrow-batch transport — the middle
    rung between the pickle-per-row ``@F.udf`` slow path
    (udf_python_scalar) and the fully-vectorized pandas_udf
    (udf_pandas_scalar). The function body is ordinary scalar Python
    (here a vowel count), but rows cross the JVM/Python boundary as
    Arrow batches, so the per-row dispatch cost survives while the
    serialization cliff disappears — the right migration step for
    legacy row UDFs too stateful to vectorize. The plan shows
    ArrowEvalPython (asserted in tests/test_plans.py), which the
    audit's BatchEvalPython row-Python gate deliberately permits."""
    @F.udf("long", useArrow=True)
    def n_vowels(text: str) -> int:
        return sum(1 for ch in text if ch in "aeiou")

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", n_vowels("text").alias("n_vowels"))
