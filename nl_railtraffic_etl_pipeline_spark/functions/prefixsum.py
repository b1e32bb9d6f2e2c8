"""Distributed global running sums over an integer-keyed ordering.

A global cumulative sum (``SUM(x) OVER (ORDER BY id)``) is the backbone of
sequence packing and systematic sampling, but a naive empty-``partitionBy``
window serializes the whole corpus through ONE partition.  This module
computes the same result with a three-level block scheme:

- level 0: rows are grouped into id-range blocks (``id div block_size``);
  within-block running sums use a window partitioned BY BLOCK — fully
  distributed, the only row-scale pass;
- level 1: one total per block.  Block offsets come from running sums
  WITHIN SUPERBLOCKS (``blk div block_size``) — still distributed, one
  row per ``block_size`` ids;
- level 2: one total per superblock — one row per ``block_size**2`` ids.
  Only THIS table crosses a single-partition window: at the default
  block size (1024) a 10^12-row corpus yields ~10^6 superblock rows,
  metadata scale by construction.  (The level-1 block-offset table is
  one row per block — potentially large — so it is joined back on the
  block key, NOT broadcast; the window that produced the level-0 sums
  already hash-partitioned that side by block, and AQE picks a broadcast
  when the table is actually small.)

The ordering key must be a UNIQUE INTEGRAL column: ``div`` on strings
yields nulls (silently collapsing every row into one block), and
duplicate keys make the within-block running sum order-dependent.  Both
are validated here rather than documented away.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["running_total"]

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def running_total(
    df: DataFrame,
    value: Column,
    id_col: str,
    block_size: int = 1024,
    out_col: str = "_cum",
) -> DataFrame:
    """``df`` + ``out_col`` = inclusive running sum of ``value`` in
    ``id_col`` order (equal to ``SUM(value) OVER (ORDER BY id_col ROWS
    UNBOUNDED PRECEDING)``), computed without any row-scale
    single-partition pass.

    ``value`` may be any summable column (bigint, decimal); the running
    sum inherits Spark's SUM result type for it.  ``id_col`` must be a
    unique integral column — validated, not assumed.
    """
    if block_size < 2:
        raise ValueError("block_size must be >= 2")
    dtype = df.schema[id_col].dataType
    if not isinstance(dtype, _INTEGRAL):
        raise TypeError(
            f"running_total needs an integral id column; {id_col} is "
            f"{dtype.simpleString()} (string ids would div to null blocks "
            "and order lexicographically)"
        )
    base = df.withColumn("_val", value).withColumn(
        "_blk", F.expr(f"{id_col} div {block_size}")
    )
    w_in = (
        Window.partitionBy("_blk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = base.withColumn("_cum_in", F.sum("_val").over(w_in))

    blk_tot = base.groupBy("_blk").agg(F.sum("_val").alias("_tot"))
    blk_tot = blk_tot.withColumn("_sblk", F.expr(f"_blk div {block_size}"))
    w_blk = (
        Window.partitionBy("_sblk")
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    blk_cum = blk_tot.withColumn("_cum_blk", F.sum("_tot").over(w_blk))

    sblk_tot = blk_tot.groupBy("_sblk").agg(F.sum("_tot").alias("_stot"))
    w_sblk = Window.orderBy("_sblk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # one row per block_size**2 ids — the only single-partition window
    sblk_off = sblk_tot.select(
        "_sblk", (F.sum("_stot").over(w_sblk) - F.col("_stot")).alias("_soff")
    )
    blk_off = blk_cum.join(F.broadcast(sblk_off), "_sblk").select(
        "_blk",
        (F.col("_soff") + F.col("_cum_blk") - F.col("_tot")).alias("_off"),
    )
    # block-key join, not broadcast: blk_off is rows/block_size — AQE
    # broadcasts it when small, shuffles on _blk when it is not
    return (
        within.join(blk_off, "_blk")
        .withColumn(out_col, F.col("_off") + F.col("_cum_in"))
        .drop("_val", "_blk", "_cum_in", "_off")
    )
