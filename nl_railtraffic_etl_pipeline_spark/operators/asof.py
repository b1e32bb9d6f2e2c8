"""As-of join: for each left row, the latest right row at-or-before it.

The classic time-series enrichment operator (pandas ``merge_asof``,
DuckDB/QuestDB ``ASOF JOIN``) that Spark's built-in joins lack — a naive
formulation is a per-row range theta-join (nested loop).  Spark-first
strategy: tag both sides, union, and take a running ``last(payload,
ignorenulls=True)`` over a (key)-partitioned window ordered by (ts, side).
ONE hash shuffle on the key, no range explosion, no per-row scan — the
sort inside the window is the same sort a merge-asof does, distributed per
key group.

At 100 TB: the shuffle carries left+right once; state per window frame is
one payload struct (running last), so memory is O(1) per row.  Skewed keys
split fine under AQE since the window is per-key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: Sequence[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join (``right_ts <= left_ts``, latest wins) per key.

    Returns every ``left`` row with one struct-unpacked column per payload
    column (NULL when no right row precedes it, or when the match is older
    than ``tolerance_seconds``), plus ``_asof_ts`` — the matched right
    timestamp.  ``right`` must be unique per (key, right_ts): pre-dedup
    with ``upsert.dedup_batch`` otherwise, or the winner among equal
    stamps is engine-arbitrary.
    """
    keys = list(on)
    payload_cols = list(
        payload_cols
        if payload_cols is not None
        else [c for c in right.columns if c not in set(keys) | {right_ts}]
    )
    pay = F.struct(
        *[F.col(c) for c in payload_cols],
        F.col(right_ts).cast("timestamp").alias("_asof_ts"),
    )
    # A NULL right_ts would cast to NULL _ord, sort FIRST under the
    # ascending window order, and its payload would become the running-last
    # match for left rows with no real predecessor — ASOF semantics
    # (right_ts <= left_ts) can never match a NULL stamp, so drop them.
    rt = right.filter(F.col(right_ts).isNotNull()).select(
        *keys,
        F.col(right_ts).cast("timestamp").alias("_ord"),
        F.lit(0).alias("_side"),
        pay.alias("_pay"),
    )
    pay_type = rt.schema["_pay"].dataType
    lt = left.select(
        "*",
        F.col(left_ts).cast("timestamp").alias("_ord"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(pay_type).alias("_pay"),
    )
    # Right rows sort BEFORE left rows at equal stamps, so an exactly
    # coincident right row matches (<= semantics).
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ord", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    matched = u.withColumn(
        "_match", F.last("_pay", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        within = (
            F.unix_timestamp("_ord")
            - F.unix_timestamp(F.col("_match")["_asof_ts"])
        ) <= tolerance_seconds
        matched = matched.withColumn(
            "_match", F.when(within, F.col("_match"))
        )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col("_match")[c].alias(c) for c in payload_cols
    ] + [F.col("_match")["_asof_ts"].alias("_asof_ts")]
    return matched.select(*out_cols)
