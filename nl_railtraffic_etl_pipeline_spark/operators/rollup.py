"""Daily roll-up builders: the ``daily_stats`` table and the run report.

``daily_stats`` is declared in the reference schema (schema.sql:48-57) but
never populated (0 rows in data/nl_rail.db) — SURVEY §2.6 A9 calls for the
obvious builder.  The run report mirrors ``ETLPipeline._generate_report``
(pipeline.py:304-342).

Mode-style picks (most_affected_station, peak_hour) are rank-over-aggregate
with explicit tiebreaks — deterministic at any parallelism.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.compat import csv_unnest, exact_avg, hour_bucket


def build_daily_stats(
    disruptions: DataFrame, run_ts: _dt.datetime | None = None
) -> DataFrame:
    """Roll ``disruptions`` up to one row per DATE(start_time).

    Columns per schema.sql:48-57; most_affected_station is the modal station
    among that day's exploded ``affected_stations`` (ties -> lexicographically
    first code), peak_hour the modal hour (ties -> earliest hour).
    """
    run_ts = run_ts or _dt.datetime.now(_dt.timezone.utc)
    base = disruptions.filter(F.col("start_time").isNotNull()).withColumn(
        "date", F.to_date("start_time")
    )

    core = base.groupBy("date").agg(
        F.count("*").cast("int").alias("total_disruptions"),
        F.sum(F.when(F.col("type") == "cancellation", 1).otherwise(0))
        .cast("int")
        .alias("total_cancellations"),
        exact_avg(F.col("duration_minutes")).alias("avg_duration_minutes"),
        F.max("duration_minutes").cast("int").alias("max_duration_minutes"),
    )

    # Both mode picks in ONE shuffle: union (date, kind, value) pairs,
    # one groupBy count, one (date, kind)-partitioned rank, pivot back by
    # kind.  The zero-padded 'HH' hour bucket makes lexical tiebreak order
    # equal numeric order, so the pick matches the per-kind formulation.
    pairs = base.filter(F.col("affected_stations").isNotNull()).select(
        "date",
        F.lit("station").alias("kind"),
        csv_unnest(F.col("affected_stations")).alias("value"),
    ).unionByName(
        base.select(
            "date",
            F.lit("hour").alias("kind"),
            hour_bucket(F.col("start_time")).alias("value"),
        )
    )
    w = Window.partitionBy("date", "kind").orderBy(
        F.desc("count"), F.asc("value")
    )
    picks = (
        pairs.groupBy("date", "kind", "value")
        .count()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    modes = picks.groupBy("date").agg(
        F.max(F.when(F.col("kind") == "station", F.col("value"))).alias(
            "most_affected_station"
        ),
        F.max(F.when(F.col("kind") == "hour", F.col("value")))
        .cast("int")
        .alias("peak_hour"),
    )

    return (
        core.join(modes, "date", "left")
        .withColumn("calculated_at", F.lit(run_ts))
        .select(
            "date",
            "total_disruptions",
            "total_cancellations",
            "avg_duration_minutes",
            "max_duration_minutes",
            "most_affected_station",
            "peak_hour",
            "calculated_at",
        )
    )


def run_report(disruptions: DataFrame, as_of_date=None) -> DataFrame:
    """The pipeline's end-of-run aggregate (pipeline.py:318-330).

    One row: today's totals by type, avg duration, max impact.  ``today`` is
    the injected as_of date (created_at::DATE = CURRENT_DATE in the ref).
    """
    cond = (
        F.to_date("created_at") == F.lit(as_of_date)
        if as_of_date is not None
        else F.to_date("created_at") == F.current_date()
    )
    return disruptions.filter(cond).agg(
        F.count("*").alias("total_records"),
        F.sum(F.when(F.col("type") == "disruption", 1).otherwise(0)).alias(
            "disruptions"
        ),
        F.sum(F.when(F.col("type") == "maintenance", 1).otherwise(0)).alias(
            "maintenance"
        ),
        F.sum(F.when(F.col("type") == "calamity", 1).otherwise(0)).alias(
            "calamities"
        ),
        F.round(exact_avg(F.col("duration_minutes")), 1).alias("avg_duration_minutes"),
        F.max("impact_level").alias("max_impact_level"),
    )
