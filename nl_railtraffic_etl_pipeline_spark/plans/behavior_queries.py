"""Behavioral-analytics gate queries over the synthetic ``events`` stream:
ordered funnel conversion, weekly cohort retention, and the empirical
event-transition (Markov) matrix.

Same engine class as the reference's rail analytics (aggregators.py Q1-Q6)
— windowed/joined aggregation over an event log — applied to the
user-behavior questions an events table exists to answer.  Oracles
replicate the exact semantics (strict event ordering, Monday-truncated
weeks, total-order tiebreaks) in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.behavior import cohort_retention, event_transitions, funnel
from .registry import query
from .testdata import load_table

_FUNNEL_STAGES = ("view", "click", "purchase")


@query(
    "events_funnel",
    """
WITH s1 AS (
    SELECT user_id, MIN(ts) AS entry FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, MIN(e.ts) AS entry
    FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.entry
    WHERE e.event_type = 'click' GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, MIN(e.ts) AS entry
    FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.entry
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
),
counts AS (
    SELECT 1 AS stage, 'view' AS stage_name, COUNT(*) AS users FROM s1
    UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
    UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3
)
SELECT stage, stage_name, users,
       ROUND(100.0 * users
             / NULLIF((SELECT users FROM counts WHERE stage = 1), 0), 2)
           AS conversion_pct
FROM counts
""",
)
def _funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered view -> click -> purchase funnel.

    A user converts to a stage only with an event strictly after their
    earliest entry into the previous stage (reference-class ordered
    semantics, not 'did both ever').
    """
    return funnel(
        load_table(spark, sf_dir, "events", spread=True), _FUNNEL_STAGES
    )


@query(
    "events_retention",
    """
WITH first AS (
    SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT e.user_id,
           CAST(date_trunc('week', f.first_ts) AS DATE) AS cohort_week,
           CAST(datediff('day',
                         CAST(date_trunc('week', f.first_ts) AS DATE),
                         CAST(date_trunc('week', e.ts) AS DATE)) / 7
                AS INTEGER) AS week_offset
    FROM events e JOIN first f ON e.user_id = f.user_id
),
sizes AS (
    SELECT CAST(date_trunc('week', first_ts) AS DATE) AS cohort_week,
           COUNT(*) AS cohort_size
    FROM first GROUP BY 1
)
SELECT a.cohort_week, a.week_offset, COUNT(*) AS active_users,
       ROUND(100.0 * COUNT(*) / s.cohort_size, 2) AS retention_pct
FROM activity a JOIN sizes s ON a.cohort_week = s.cohort_week
GROUP BY a.cohort_week, a.week_offset, s.cohort_size
""",
)
def _retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix (Monday-truncated ISO weeks)."""
    return cohort_retention(load_table(spark, sf_dir, "events", spread=True))


@query(
    "events_transitions",
    """
WITH seq AS (
    SELECT event_type AS src,
           LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS dst
    FROM events
),
pairs AS (
    SELECT src, dst, COUNT(*) AS n_transitions
    FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
)
SELECT src, dst, n_transitions,
       ROUND(100.0 * n_transitions
             / SUM(n_transitions) OVER (PARTITION BY src), 2) AS share_pct
FROM pairs
""",
)
def _transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive event-type bigrams — the empirical Markov
    transition matrix of the stream (ts, event_id total order)."""
    return event_transitions(
        load_table(spark, sf_dir, "events", spread=True)
    )
