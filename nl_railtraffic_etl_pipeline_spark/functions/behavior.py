"""Behavioral / product analytics over event streams: ordered funnels,
cohort retention, and transition (Markov) matrices.

The reference's analytics layer answers "what happened" questions over rail
disruptions (aggregators.py Q1-Q6); these are the same class of question
over a user-event stream — the workload an events table
(user_id, ts, event_type) exists for.  All three are pure DataFrame plans:

- ``funnel``: strictly-ordered stage conversion.  A user counts for stage
  i+1 only with an event AFTER their stage-i entry time (not merely "did
  both sometime") — the semantics product funnels mean and naive
  conditional aggregation gets wrong.
- ``cohort_retention``: users bucketed by first-activity week; per
  (cohort, week-offset) distinct active users and the retained share.
- ``event_transitions``: consecutive event-type bigrams per user — the
  empirical Markov transition matrix of the event stream.

Scale shape (100 TB of events): every stage is either a map-side filter,
a ``user_id``-keyed aggregation/join (one hash partitioning reused across
stages — co-partitioned, no broadcast of the fact side), or an
aggregation onto a frame whose size is the number of stages / cohorts /
type-pairs (metadata-scale).  Windows only ever run per-user
(``event_transitions``) or over post-aggregation frames; nothing funnels
the raw stream through a single partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["funnel", "cohort_retention", "event_transitions"]


def funnel(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered funnel conversion counts.

    ``stages`` is the ordered event-type sequence (e.g. ``["view",
    "click", "purchase"]``).  A user reaches stage 1 with any stage-1
    event; stage i+1 with any stage-(i+1) event strictly after their
    EARLIEST qualifying stage-i event.  Earliest-entry semantics make the
    result deterministic and monotone (stage counts never increase).

    Returns (stage, stage_name, users, conversion_pct) — one row per
    stage, conversion_pct relative to stage 1 (rounded 2, NULL when stage
    1 is empty).
    """
    if not stages:
        raise ValueError("need at least one funnel stage")
    # ONE user-keyed shuffle total: each stage's entry time is a
    # conditional min over the SAME user partitioning, and the chained
    # selects stack Window nodes on top of one Exchange (Catalyst sees the
    # partitioning is already satisfied — no re-shuffle, no join).  The
    # earlier join-per-stage formulation shuffled each filtered slice and
    # joined it back; at 100 TB that is `len(stages)` extra shuffles.
    w = Window.partitionBy(user_col)
    cur = events.select(
        user_col, F.col(type_col).alias("_type"), F.col(ts_col).alias("_ts")
    )
    prev_entry = None
    entry_cols: list[str] = []
    for i, stage_type in enumerate(stages):
        qualifies = F.col("_type") == stage_type
        if prev_entry is not None:
            qualifies = qualifies & (F.col("_ts") > F.col(prev_entry))
        name = f"_entry_{i}"
        cur = cur.withColumn(
            name, F.min(F.when(qualifies, F.col("_ts"))).over(w)
        )
        entry_cols.append(name)
        prev_entry = name

    # per-user flags -> one global 1-row aggregate of stage cardinalities
    one_per_user = cur.groupBy(user_col).agg(
        *[F.max(F.col(c).isNotNull()).alias(c) for c in entry_cols]
    )
    counts = one_per_user.agg(
        *[
            F.coalesce(F.sum(F.col(c).cast("bigint")), F.lit(0)).alias(
                f"_users_{i}"
            )
            for i, c in enumerate(entry_cols)
        ]
    )
    stage_rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage"),
                F.lit(stage_type).alias("stage_name"),
                F.col(f"_users_{i}").alias("users"),
            )
            for i, stage_type in enumerate(stages)
        ]
    )
    return (
        counts.select(F.explode(stage_rows).alias("s"), F.col("_users_0"))
        .select(
            F.col("s.stage").alias("stage"),
            F.col("s.stage_name").alias("stage_name"),
            F.col("s.users").alias("users"),
            F.round(
                F.lit(100.0)
                * F.col("s.users")
                / F.nullif(F.col("_users_0"), F.lit(0)),
                2,
            ).alias("conversion_pct"),
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention matrix.

    Cohort = ISO week (Monday-truncated) of the user's first event;
    ``week_offset`` counts weeks since then.  Returns (cohort_week,
    week_offset, active_users, retention_pct) where retention_pct is the
    share of the cohort active in that offset week (offset 0 is 100 by
    construction).

    Plan: ONE user-keyed shuffle of the (user, ts) stream — the first-
    activity stamp is a per-user window min over that partitioning, not a
    groupBy + join back (which would shuffle the stream twice and add a
    join).  Then a distinct on (user, cohort, offset) and a count onto
    the cohorts x offsets frame — whose size is weeks^2, metadata-scale
    at any event volume.  Cohort sizes broadcast back onto it.
    """
    w_user = Window.partitionBy(user_col)
    base = events.select(user_col, ts_col).withColumn(
        "_first", F.min(ts_col).over(w_user)
    )
    cohort = F.to_date(F.date_trunc("week", F.col("_first")))
    # every event is >= the user's first event, so week_offset >= 0 by
    # construction — no post-hoc filter needed
    activity = (
        base.select(
            F.col(user_col),
            cohort.alias("cohort_week"),
            F.expr(
                f"datediff(to_date(date_trunc('week', {ts_col})), "
                "to_date(date_trunc('week', _first))) div 7"
            ).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    # cohort size == offset-0 user count (every user is active in their own
    # first week), so sizes come from `activity` itself — the two consumers
    # share the distinct's exchange (ReuseExchange) instead of re-running
    # the stream window
    sizes = (
        activity.filter(F.col("week_offset") == 0)
        .groupBy("cohort_week")
        .agg(F.count("*").alias("_cohort_size"))
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("active_users"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "active_users",
            F.round(
                F.lit(100.0) * F.col("active_users") / F.col("_cohort_size"), 2
            ).alias("retention_pct"),
        )
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Empirical Markov transition matrix of per-user event sequences.

    Consecutive (by ``ts_col``, tie-broken on ``order_cols`` for a total
    order — cross-engine determinism) event-type pairs per user, counted
    corpus-wide.  Returns (src, dst, n_transitions, share_pct) where
    share_pct normalizes each source row to 100 (rounded 2).

    Plan: ONE user-keyed window (the only shuffle of the raw stream),
    then aggregation onto the |types|^2 frame; the share window runs over
    that metadata-scale frame, never the stream.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), *[F.col(c) for c in order_cols]
    )
    pairs = (
        events.select(
            F.col(type_col).alias("src"),
            F.lead(type_col).over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_transitions"))
    )
    share = Window.partitionBy("src")
    return pairs.select(
        "src",
        "dst",
        "n_transitions",
        F.round(
            F.lit(100.0)
            * F.col("n_transitions")
            / F.sum("n_transitions").over(share),
            2,
        ).alias("share_pct"),
    )
