"""Point-in-time (PIT) join: enrich facts with the dimension attributes
that were valid AT each fact's timestamp — the temporal-correctness join
feature stores and SCD-2 warehouses live on, where a naive latest-value
join silently leaks the future into training data.

Semantics: for each fact row, the dimension row of the same key whose
half-open validity interval contains the fact stamp (``valid_from <= ts``
AND (``valid_to`` NULL OR ``ts < valid_to``)); facts before the key's
first interval, or falling in a GAP between intervals, get NULL
attributes (left-join semantics — gaps must not resurrect a stale state).

Physical plan (the 100 TB shape): the same union + per-key running-last
window as ``operators/asof.py::asof_join`` — dimension-change rows and
fact rows are unioned, shuffled ONCE on the key, and each fact picks the
last preceding interval-open; the interval's ``valid_to`` is then checked
map-side to null out gap matches.  No range-condition join, so no
interval explosion and no nested loop; cost is one user-keyed sort
shuffle over |facts| + |dim versions|.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["point_in_time_join"]


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    fact_ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    payload_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Every ``facts`` row plus the payload of the dimension interval
    containing its stamp (NULLs when none does), and ``_pit_from`` — the
    matched interval's open stamp.

    ``dim`` must be unique per (key..., valid_from): with duplicate
    opens the winner is engine-arbitrary — dedup upstream (the same
    contract as ``asof_join``).  A fact stamped exactly at
    ``valid_from`` matches that interval; exactly at ``valid_to`` it
    belongs to the NEXT interval (half-open).
    """
    keys = list(on)
    payload_cols = list(
        payload_cols
        if payload_cols is not None
        else [
            c
            for c in dim.columns
            if c not in set(keys) | {valid_from, valid_to}
        ]
    )
    pay = F.struct(
        *[F.col(c) for c in payload_cols],
        F.col(valid_from).cast("timestamp").alias("_pit_from"),
        F.col(valid_to).cast("timestamp").alias("_pit_to"),
    )
    # NULL valid_from can never contain a stamp (mirrors asof.py's NULL
    # right_ts rule — ascending NULLS FIRST would otherwise make it the
    # running match for pre-history facts).
    dt = dim.filter(F.col(valid_from).isNotNull()).select(
        *keys,
        F.col(valid_from).cast("timestamp").alias("_ord"),
        F.lit(0).alias("_side"),
        pay.alias("_pay"),
    )
    pay_type = dt.schema["_pay"].dataType
    ft = facts.select(
        "*",
        F.col(fact_ts).cast("timestamp").alias("_ord"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(pay_type).alias("_pay"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.asc("_ord"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = ft.unionByName(dt, allowMissingColumns=True)
    match = F.last("_pay", ignorenulls=True).over(w)
    out = (
        u.withColumn("_match", match)
        .filter(F.col("_side") == 1)
        # gap check: the last-opened interval only counts if it is still
        # open at the fact stamp (valid_to NULL or strictly later)
        .withColumn(
            "_valid",
            F.col("_match").isNotNull()
            & (
                F.col("_match")["_pit_to"].isNull()
                | (F.col("_ord") < F.col("_match")["_pit_to"])
            ),
        )
    )
    cols = [c for c in facts.columns]
    sel = [F.col(c) for c in cols]
    for c in payload_cols:
        sel.append(
            F.when(F.col("_valid"), F.col("_match")[c]).alias(c)
        )
    sel.append(
        F.when(F.col("_valid"), F.col("_match")["_pit_from"]).alias(
            "_pit_from"
        )
    )
    return out.select(*sel)
