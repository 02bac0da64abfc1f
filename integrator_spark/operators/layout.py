"""Multi-dimensional data layout: Z-order (Morton) clustering.

Parquet pruning is min/max-stat based per file/row-group, so a table
sorted by ONE column prunes only filters on that column. Interleaving
the bits of two columns into a Morton code and range-partitioning on it
makes files compact in BOTH dimensions — a 2-D box filter then
overlaps few files instead of all of them. This is what Delta's
OPTIMIZE ZORDER BY does; here it is a pure column expression + a
range-partitioned write, so it runs on stock Spark at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low `bits` of two non-negative ints (a even
    positions, b odd) — a pure expression, fully codegen'd."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(abit, 2 * i)) \
             .bitwiseOR(F.shiftleft(bbit, 2 * i + 1))
    return z


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str,
                   n_files: int = 32, bits: int = 16) -> None:
    """Write `df` as parquet clustered on the Morton code of
    (col_a, col_b): range-partition by z-value so each output file
    covers a compact 2-D tile, then drop the helper column."""
    z = morton_code(F.col(col_a), F.col(col_b), bits)
    (df.withColumn("_z", z)
       .repartitionByRange(n_files, "_z")
       .sortWithinPartitions("_z")
       .drop("_z")  # dropped AFTER partitioning: stats stay clustered
       .write.mode("overwrite").parquet(path))


def files_overlapping(path: str, col_a: str, lo_a, hi_a,
                      col_b, lo_b, hi_b) -> tuple[int, int]:
    """(files overlapping the 2-D box, total files) from parquet
    footer min/max stats — the exact skipping decision a scan makes."""
    import os

    import pyarrow.parquet as pq

    total = overlap = 0
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        total += 1
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        mins = {col_a: None, col_b: None}
        maxs = {col_a: None, col_b: None}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    st = col.statistics
                    mins[name] = (st.min if mins[name] is None
                                  else min(mins[name], st.min))
                    maxs[name] = (st.max if maxs[name] is None
                                  else max(maxs[name], st.max))
        if (mins[col_a] is not None and mins[col_b] is not None
                and not (maxs[col_a] < lo_a or mins[col_a] > hi_a)
                and not (maxs[col_b] < lo_b or mins[col_b] > hi_b)):
            overlap += 1
    return overlap, total
