"""Range-partitioned ordered prefix sums — the scale-safe form of
``SUM(...) OVER (ORDER BY ...)``.

A global ordered window funnels the whole frame through ONE task
(Exchange SinglePartition); fine for calendar-bounded or k-row frames,
fatal for data-dependent ones (|users|, |distinct scores|) at 100 TB.
This module provides the two-phase substitution the repo's
corpus-assembly queries already use for dense integer keys
(queries/ml_prep.py corpus_pack_sequences), generalized to ARBITRARY
orderable keys via ``repartitionByRange``:

  phase 1: range-shuffle on the order key (equal keys co-locate;
           partition i holds keys strictly before partition i+1),
           cumulative sums WITHIN each bucket (partitioned window);
  phase 2: per-bucket totals (n_buckets rows) get exclusive bucket
           offsets through one tiny ordered window (bounded by the
           CONSTANT n_buckets, never by the data), broadcast-joined
           back.

The result is VALUE-IDENTICAL to the single-partition window for any
associative exact-typed sum (integers / decimals) over NON-NULL
summands with the default inclusive frame: bucket boundaries only
re-bracket the same ordered summation. Two edge cases differ from the
raw window and are out of contract: with ``include_current=False``
the first row's empty frame is COALESCE'd to 0 where ``SUM() OVER``
returns NULL, and an all-NULL prefix likewise surfaces as 0 rather
than NULL. Every repo caller uses inclusive frames over non-null
summands. Callers keep float work out of the summed columns (the
repo's decimal-exact discipline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ordered_prefix_sums(df: DataFrame, order_cols: list[str],
                        sums: dict[str, Column],
                        n_buckets: int = 32,
                        ascending: bool = True,
                        include_current: bool = True) -> DataFrame:
    """Append cumulative-sum columns over the total order given by
    ``order_cols`` (compound tie-break — the caller must make the
    order total, same contract as any deterministic window in this
    repo).

    sums: output column name -> expression to accumulate (exact
    integer/decimal types for cross-engine parity). With
    ``include_current=False`` the sum is exclusive (the classic
    offset/rank form). Returns ``df``'s columns plus one column per
    ``sums`` entry.
    """
    cols = [F.col(c) for c in order_cols]
    sort_exprs = [c.asc() if ascending else c.desc() for c in cols]
    # Eager checkpoint: the bucketed frame feeds THREE consumers
    # (local sums, bucket totals, the final join), and
    # repartitionByRange's boundary SAMPLING is not stable across
    # re-evaluations — unpinned, the local sums and the offsets can
    # disagree about bucket membership (measured: cum off by a
    # bucket's worth of rows). One materialization also pays the
    # range shuffle once instead of three times.
    b = (df.repartitionByRange(n_buckets, *sort_exprs)
         .withColumn("_b", F.spark_partition_id())
         .localCheckpoint(eager=True))
    hi = Window.currentRow if include_current else -1
    w_in = (Window.partitionBy("_b").orderBy(*sort_exprs)
            .rowsBetween(Window.unboundedPreceding, hi))
    local = b.select(
        "*", *[F.coalesce(F.sum(expr).over(w_in), F.lit(0) * expr)
               .alias(f"_loc_{name}") for name, expr in sums.items()])
    totals = b.groupBy("_b").agg(
        *[F.sum(expr).alias(f"_tot_{name}") for name, expr in sums.items()])
    # Exclusive offsets over the CONSTANT-sized bucket frame: this is
    # the one ordered-window task left, bounded by n_buckets — the
    # same shape (and plan-audit justification) as corpus_pack's
    # bucket-offset table. Partition ids ascend in range order, under
    # either sort direction.
    w_off = (Window.orderBy("_b")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(
        "_b", *[F.coalesce(F.sum(F.col(f"_tot_{name}")).over(w_off),
                           F.lit(0) * F.col(f"_tot_{name}"))
                .alias(f"_off_{name}") for name in sums])
    out_cols = [c for c in df.columns]
    return (local.join(F.broadcast(offsets), "_b")
            .select(*out_cols,
                    *[(F.col(f"_loc_{name}") + F.col(f"_off_{name}"))
                      .alias(name) for name in sums]))
