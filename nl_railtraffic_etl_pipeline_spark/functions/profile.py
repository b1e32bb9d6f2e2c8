"""Data-quality profiling (the Deequ/Great-Expectations family): per-column
completeness, cardinality, and key-uniqueness checks as ONE aggregation
pass, plus rule evaluation against declared expectations.

A 100 TB ingest trusts nothing: every load runs a profile and gates the
downstream merge on its rules (the reference's implicit contract — its
cleaner silently null-drops rows; this makes the contract explicit and
measurable).  All metrics are exact integers, so the profile itself is
oracle-checkable — a profiler whose numbers depend on the engine would be
worse than none.

Plan shape: one partial-aggregated global aggregation computes every
column's row/null counts in a single pass; distinct counts ride the same
statement (Spark plans multi-distinct aggregates with one Expand — input
is scanned once, expanded k-fold map-side, never collected).  The wide
1-row result is unpivoted driver-side into the long (column, metric) form
at metadata scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["table_profile", "check_rules"]


def table_profile(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Long-form profile: (column, n_rows, n_nulls, n_distinct) per column.

    ``n_distinct`` counts non-null distinct values (exact).  Column order
    of the output follows ``columns``.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in columns:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_null_{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"_dist_{c}"))
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', _null_{c}, _dist_{c}" for c in columns
    )
    return wide.select(
        F.expr(
            f"stack({len(columns)}, {stack}) AS (column, n_nulls, n_distinct)"
        ),
        F.col("_n").alias("n_rows"),
    ).select("column", "n_rows", "n_nulls", "n_distinct")


def check_rules(profile: DataFrame, rules: dict) -> DataFrame:
    """Evaluate declared expectations against a :func:`table_profile`.

    ``rules`` maps column -> dict with any of:
    ``not_null`` (True: n_nulls must be 0), ``unique`` (True: n_distinct
    must equal n_rows - n_nulls), ``min_distinct`` (int lower bound).
    Returns (column, rule, passed) — one row per declared rule, exact
    booleans, suitable for gating a merge job.
    """
    rows = []
    for col, spec in rules.items():
        base = profile.filter(F.col("column") == col)
        if spec.get("not_null"):
            rows.append(
                base.select(
                    "column",
                    F.lit("not_null").alias("rule"),
                    (F.col("n_nulls") == 0).alias("passed"),
                )
            )
        if spec.get("unique"):
            rows.append(
                base.select(
                    "column",
                    F.lit("unique").alias("rule"),
                    (
                        F.col("n_distinct")
                        == F.col("n_rows") - F.col("n_nulls")
                    ).alias("passed"),
                )
            )
        if "min_distinct" in spec:
            rows.append(
                base.select(
                    "column",
                    F.lit("min_distinct").alias("rule"),
                    (F.col("n_distinct") >= spec["min_distinct"]).alias(
                        "passed"
                    ),
                )
            )
    if not rows:
        # empty / all-unrecognized rules dict: an empty (column, rule,
        # passed) frame, not an IndexError — callers fold it with the
        # same unionByName/collect they'd use on a populated result
        return profile.sparkSession.createDataFrame(
            [], "column string, rule string, passed boolean"
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
