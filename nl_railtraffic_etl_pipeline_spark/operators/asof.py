"""As-of join: for each left row, the nearest right row per key —
backward (at-or-before, the default), forward (at-or-after), or nearest
of the two (pandas ``merge_asof`` direction parity).

The classic time-series enrichment operator (pandas ``merge_asof``,
DuckDB/QuestDB ``ASOF JOIN``) that Spark's built-in joins lack — a naive
formulation is a per-row range theta-join (nested loop).  Spark-first
strategy: tag both sides, union, and take a running ``last(payload,
ignorenulls=True)`` over a (key)-partitioned window ordered by (ts, side)
— ascending for backward, descending for forward, both (sharing the one
shuffle) for nearest.  ONE hash shuffle on the key, no range explosion,
no per-row scan — the sort inside the window is the same sort a
merge-asof does, distributed per key group.

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
    direction: str = "backward",
) -> DataFrame:
    """As-of join per key, pandas ``merge_asof`` directions:

    - ``backward`` (default): latest right row with ``right_ts <=
      left_ts``.
    - ``forward``: earliest right row with ``right_ts >= left_ts`` (the
      mirrored window — same single shuffle, ordered descending).
    - ``nearest``: whichever of the two is closer in absolute time;
      exact ties resolve to the backward match (pandas' rule).  Costs
      both window passes over ONE union/shuffle — still no range
      explosion.

    Returns every ``left`` row with one struct-unpacked column per payload
    column (NULL when no right row qualifies, or when the match is further
    than ``tolerance_seconds``), plus ``_asof_ts`` — the matched right
    timestamp.  ``right`` must be unique per (key, right_ts): pre-dedup
    with ``upsert.dedup_batch`` otherwise, or the winner among equal
    stamps is engine-arbitrary.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction!r}")
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
    # Right rows sort BEFORE left rows at equal stamps (in BOTH window
    # orders), so an exactly coincident right row matches (<=/>=
    # semantics).  Backward scans ascending, forward descending — same
    # partitioning, so nearest's two windows share one shuffle.
    frame = (Window.unboundedPreceding, Window.currentRow)
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(F.asc("_ord"), F.asc("_side"))
        .rowsBetween(*frame)
    )
    # desc is NULLS LAST in Spark, so a NULL-stamped left row would scan
    # AFTER every right row and spuriously match the earliest one; nulls
    # FIRST puts it before any payload (matching the ascending window,
    # where NULLS FIRST already isolates NULL left stamps) so it matches
    # nothing in every direction.
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.desc_nulls_first("_ord"), F.asc("_side"))
        .rowsBetween(*frame)
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    if direction == "backward":
        match = F.last("_pay", ignorenulls=True).over(w_back)
    elif direction == "forward":
        match = F.last("_pay", ignorenulls=True).over(w_fwd)
    else:  # nearest: closer of the two; exact tie -> backward (pandas)
        back = F.last("_pay", ignorenulls=True).over(w_back)
        fwd = F.last("_pay", ignorenulls=True).over(w_fwd)
        b_dist = F.unix_timestamp("_ord") - F.unix_timestamp(
            back["_asof_ts"]
        )
        f_dist = F.unix_timestamp(fwd["_asof_ts"]) - F.unix_timestamp(
            "_ord"
        )
        match = F.when(fwd.isNull(), back).when(back.isNull(), fwd).otherwise(
            F.when(b_dist <= f_dist, back).otherwise(fwd)
        )
    matched = u.withColumn("_match", match).filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        within = (
            F.abs(
                F.unix_timestamp("_ord")
                - F.unix_timestamp(F.col("_match")["_asof_ts"])
            )
            <= tolerance_seconds
        )
        matched = matched.withColumn(
            "_match", F.when(within, F.col("_match"))
        )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col("_match")[c].alias(c) for c in payload_cols
    ] + [F.col("_match")["_asof_ts"].alias("_asof_ts")]
    return matched.select(*out_cols)
