"""Driver-facing query registry: Spark plan builders + DuckDB oracle SQL.

Every entry in :data:`QUERIES` has (where SQL-expressible) a matching entry
in :data:`ORACLES` — ANSI SQL DuckDB runs over the same parquet tables.  The
driver compares row count, schema, and an order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- DuckDB aggregate result types are cast to Spark's (SUM/COUNT of integers ->
  BIGINT, rank functions -> INTEGER; DuckDB widens to HUGEINT otherwise);
- double->int casts use trunc() in DuckDB (it rounds on cast; Spark and
  SQLite truncate);
- any ordering that feeds row_number or a LIMIT has an explicit total-order
  tiebreak on both sides (tie order inside an engine is not portable);
- ROUND over a raw double diverges on half boundaries: Spark rounds the
  SHORTEST DECIMAL REPR half-up (BigDecimal.valueOf), DuckDB the exact
  binary expansion — a value printing as x.xxxx5 can round differently
  (bit sf0.1 corpus_quality_trim, doc 3582).  When the rounded double is
  not already quantized (a ratio, a product of ratios, an interpolated
  percentile), the oracle must bridge through
  ``CAST(CAST(x AS VARCHAR) AS DECIMAL(38,20))`` before ROUND
  (``ml_queries._round_sql``); rounds over decimal-exact aggregates
  (exact_avg pattern) are already safe.
- DuckDB numeric literals with a decimal point (``127.0``) are DECIMAL,
  not DOUBLE: ``FLOAT / 127.0`` runs in float32 and diverges from Spark's
  float/double promotion (bit emb_quantize_int8).  Cast both operands —
  ``CAST(x AS DOUBLE) / CAST(127 AS DOUBLE)`` — wherever a float column
  meets a literal.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import rail_queries as rq
from .testdata import disruptions_df, rail_oracle_prelude, stations_df

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Rail-domain analytics (reference aggregators.py Q1-Q6) over the derived
# disruptions/stations tables — see plans/testdata.py for the derivation.
# ---------------------------------------------------------------------------

_ROLLING_FRAME = "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW"


@query(
    "rail_q1_rolling_trend",
    rail_oracle_prelude()
    + f""",
daily_counts AS (
    SELECT CAST(start_time AS DATE) AS disruption_date,
           type,
           COUNT(*) AS incident_count,
           (CAST(SUM(CAST(duration_minutes AS DECIMAL(24,6))) AS DOUBLE) / COUNT(duration_minutes)) AS avg_dur
    FROM disruptions
    WHERE start_time >= (SELECT CAST(max(start_time) AS DATE) - INTERVAL 30 DAY
                         FROM disruptions)
    GROUP BY 1, 2
)
SELECT
    disruption_date,
    type,
    incident_count,
    ROUND(avg_dur, 1) AS avg_duration_minutes,
    CAST(SUM(incident_count) OVER (
        PARTITION BY type ORDER BY disruption_date {_ROLLING_FRAME}
    ) AS BIGINT) AS rolling_7day_total,
    ROUND(AVG(incident_count) OVER (
        PARTITION BY type ORDER BY disruption_date {_ROLLING_FRAME}
    ), 2) AS rolling_7day_avg
FROM daily_counts
""",
)
def _q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rq.rolling_trend(disruptions_df(spark, sf_dir))


@query(
    "rail_q2_station_severity",
    rail_oracle_prelude(with_stations=True)
    + """,
unnested AS (
    SELECT d.disruption_id, d.impact_level, d.duration_minutes,
           TRIM(s.code) AS station_code
    FROM disruptions d,
         unnest(string_split(d.affected_stations, ',')) AS s(code)
    WHERE d.affected_stations IS NOT NULL
),
station_aggregates AS (
    SELECT station_code,
           COUNT(DISTINCT disruption_id) AS total_disruptions,
           (CAST(SUM(CAST(duration_minutes AS DECIMAL(24,6))) AS DOUBLE) / COUNT(duration_minutes)) AS avg_dur,
           AVG(impact_level) AS avg_impact,
           MAX(impact_level) AS max_impact_level
    FROM unnested
    GROUP BY station_code
)
SELECT
    sa.station_code,
    st.station_name,
    sa.total_disruptions,
    ROUND(sa.avg_dur, 1) AS avg_duration_minutes,
    ROUND(sa.avg_impact, 2) AS avg_impact_level,
    ROUND(PERCENT_RANK() OVER (ORDER BY sa.total_disruptions), 3)
        AS disruption_percentile,
    CAST(DENSE_RANK() OVER (ORDER BY sa.total_disruptions DESC) AS INTEGER)
        AS severity_rank,
    CASE
        WHEN PERCENT_RANK() OVER (ORDER BY sa.total_disruptions) > 0.9
            THEN 'HIGH RISK'
        WHEN PERCENT_RANK() OVER (ORDER BY sa.total_disruptions) > 0.7
            THEN 'MEDIUM RISK'
        ELSE 'LOW RISK'
    END AS risk_category
FROM station_aggregates sa
LEFT JOIN stations st ON sa.station_code = st.station_code
""",
)
def _q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rq.station_severity(
        disruptions_df(spark, sf_dir), stations_df(spark, sf_dir)
    )


@query(
    "rail_q3_day_over_day",
    rail_oracle_prelude()
    + f""",
daily_summary AS (
    SELECT CAST(start_time AS DATE) AS disruption_date,
           COUNT(*) AS total_disruptions,
           CAST(SUM(CASE WHEN type = 'calamity' THEN 1 ELSE 0 END) AS BIGINT)
               AS calamities,
           CAST(SUM(CASE WHEN type = 'maintenance' THEN 1 ELSE 0 END) AS BIGINT)
               AS maintenance,
           CAST(SUM(CASE WHEN type = 'disruption' THEN 1 ELSE 0 END) AS BIGINT)
               AS disruptions,
           ROUND((CAST(SUM(CAST(duration_minutes AS DECIMAL(24,6))) AS DOUBLE) / COUNT(duration_minutes)), 1) AS avg_duration,
           MAX(impact_level) AS max_impact
    FROM disruptions
    GROUP BY 1
)
SELECT
    disruption_date,
    total_disruptions,
    avg_duration,
    max_impact,
    LAG(total_disruptions, 1) OVER (ORDER BY disruption_date) AS prev_day_total,
    LEAD(total_disruptions, 1) OVER (ORDER BY disruption_date) AS next_day_total,
    total_disruptions - LAG(total_disruptions, 1) OVER (ORDER BY disruption_date)
        AS dod_delta,
    ROUND(100.0 * (total_disruptions
                   - LAG(total_disruptions, 1) OVER (ORDER BY disruption_date))
          / NULLIF(LAG(total_disruptions, 1) OVER (ORDER BY disruption_date), 0),
          1) AS dod_pct_change,
    CAST(SUM(total_disruptions) OVER (ORDER BY disruption_date {_ROLLING_FRAME})
         AS BIGINT) AS rolling_7day
FROM daily_summary
""",
)
def _q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rq.day_over_day(disruptions_df(spark, sf_dir))


@query(
    "rail_q4_peak_hours",
    rail_oracle_prelude()
    + """,
hourly_stats AS (
    SELECT strftime(start_time, '%H') AS hour_of_day,
           CAST(dayofweek(start_time) AS VARCHAR) AS day_of_week,
           COUNT(*) AS disruption_count,
           ROUND((CAST(SUM(CAST(duration_minutes AS DECIMAL(24,6))) AS DOUBLE) / COUNT(duration_minutes)), 1) AS avg_duration,
           ROUND(AVG(impact_level), 2) AS avg_impact
    FROM disruptions
    WHERE start_time IS NOT NULL
    GROUP BY 1, 2
)
SELECT * FROM (
    SELECT
        CASE day_of_week
            WHEN '0' THEN 'Sunday'   WHEN '1' THEN 'Monday'
            WHEN '2' THEN 'Tuesday'  WHEN '3' THEN 'Wednesday'
            WHEN '4' THEN 'Thursday' WHEN '5' THEN 'Friday'
            WHEN '6' THEN 'Saturday'
        END AS day_name,
        hour_of_day || ':00' AS hour_label,
        disruption_count,
        avg_duration,
        avg_impact,
        CAST(ROW_NUMBER() OVER (
            ORDER BY disruption_count DESC, day_of_week, hour_of_day
        ) AS INTEGER) AS row_num,
        CAST(RANK() OVER (ORDER BY disruption_count DESC) AS INTEGER)
            AS rank_with_gaps,
        CAST(DENSE_RANK() OVER (ORDER BY disruption_count DESC) AS INTEGER)
            AS dense_rank
    FROM hourly_stats
)
ORDER BY disruption_count DESC, row_num
LIMIT 20
""",
)
def _q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rq.peak_hours(disruptions_df(spark, sf_dir))


@query(
    "rail_q5_complex_analytics",
    rail_oracle_prelude()
    + f""",
disruption_metrics AS (
    SELECT CAST(start_time AS DATE) AS disruption_date,
           type,
           COUNT(*) AS incident_count,
           CAST(SUM(CAST((date_part('epoch', end_time)
                          - date_part('epoch', start_time)) / 60.0
                     AS DECIMAL(24,6))) AS DOUBLE)
               / COUNT((date_part('epoch', end_time)
                        - date_part('epoch', start_time)) / 60.0) AS avg_dur,
           CAST(SUM(COUNT(*)) OVER (
               ORDER BY CAST(start_time AS DATE), type {_ROLLING_FRAME}
           ) AS BIGINT) AS rolling_7day_total
    FROM disruptions
    WHERE start_time >= (SELECT CAST(max(start_time) AS DATE) - INTERVAL 30 DAY
                         FROM disruptions)
    GROUP BY 1, 2
),
station_impact AS (
    SELECT station_code,
           COUNT(*) AS disruption_count,
           PERCENT_RANK() OVER (ORDER BY COUNT(*)) AS severity_percentile
    FROM (
        SELECT TRIM(s.code) AS station_code
        FROM disruptions d,
             unnest(string_split(d.affected_stations, ',')) AS s(code)
        WHERE d.affected_stations IS NOT NULL
    )
    GROUP BY station_code
)
SELECT
    dm.disruption_date,
    dm.type,
    dm.incident_count,
    ROUND(dm.avg_dur, 2) AS avg_duration,
    dm.rolling_7day_total,
    (SELECT si.station_code FROM station_impact si
     WHERE si.severity_percentile > 0.9
     ORDER BY si.disruption_count DESC, si.station_code LIMIT 1) AS worst_station,
    ROUND(100.0
          * SUM(CASE WHEN dm.type = 'cancellation'
                     THEN dm.incident_count END)
            OVER (PARTITION BY dm.disruption_date)
          / NULLIF(SUM(dm.incident_count)
                   OVER (PARTITION BY dm.disruption_date), 0),
          2) AS cancellation_rate_pct
FROM disruption_metrics dm
""",
)
def _q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rq.complex_analytics(disruptions_df(spark, sf_dir))


@query(
    "rail_q6_overlapping",
    rail_oracle_prelude()
    + """
SELECT * FROM (
    SELECT
        a.disruption_id AS disruption_a,
        b.disruption_id AS disruption_b,
        a.type AS type_a,
        b.type AS type_b,
        a.start_time AS a_start,
        a.end_time AS a_end,
        b.start_time AS b_start,
        b.end_time AS b_end,
        CAST(trunc((date_part('epoch', LEAST(a.end_time, b.end_time))
                    - date_part('epoch', GREATEST(a.start_time, b.start_time)))
                   / 60.0) AS INTEGER) AS overlap_minutes
    FROM disruptions a
    JOIN disruptions b
      ON a.disruption_id < b.disruption_id
     AND a.start_time < b.end_time
     AND a.end_time > b.start_time
    WHERE a.start_time >= (SELECT CAST(max(start_time) AS DATE) - INTERVAL 7 DAY
                           FROM disruptions)
)
ORDER BY overlap_minutes DESC, disruption_a, disruption_b
LIMIT 50
""",
)
def _q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rq.overlapping_disruptions(disruptions_df(spark, sf_dir))


# Register the ETL-operator and training-data query families (each module
# calls @query at import time).  Imported last: they need `query` above.
from . import analysis_queries  # noqa: E402,F401  (registration side-effect)
from . import behavior_queries  # noqa: E402,F401  (registration side-effect)
from . import etl_queries  # noqa: E402,F401  (registration side-effect)
from . import eval_queries  # noqa: E402,F401  (registration side-effect)
from . import geo_queries  # noqa: E402,F401  (registration side-effect)
from . import inference_queries  # noqa: E402,F401  (registration side-effect)
from . import lake_queries  # noqa: E402,F401  (registration side-effect)
from . import ml_queries  # noqa: E402,F401  (registration side-effect)
from . import streaming_queries  # noqa: E402,F401  (registration side-effect)


# ---------------------------------------------------------------------------
# Cost tiers.  At 281 gates the full 3-SF oracle sweep is the long pole of
# the closing ritual, so tooling (bench.py, tools/check_correctness.py)
# accepts a tier: "smoke" = one representative gate per family prefix (fast
# sanity loop while iterating), "standard" = everything except the heavy
# tail, "full" = the whole registry (the committed evidence; the driver
# always runs full).  HEAVY is declared, not timed: the gates whose idle
# sf0.1 min-of-3 exceeds ~2 s — double-candidate dedup audits, wedge-join
# graph ops, the zlib kernel, stream+batch twin pairs.
# ---------------------------------------------------------------------------
HEAVY_TIER = frozenset(
    {
        "dedup_lsh_recall",
        "text_compression_ratio",
        "dedup_prefix_filter",
        "graph_node_jaccard",
        "graph_degree_histogram",
        "graph_k_core",
        "graph_triangles",
        "graph_pagerank",
        "graph_bfs_hops",
        "graph_reciprocity",
        "graph_hits",
        "graph_clustering_coeff",
        "web_domain_pagerank",
        "dedup_threshold_sweep",
        "dedup_remove_spans",
        "join_bloom_prejoin",
        "streaming_sessionize",
        "streaming_attribution_join",
        "streaming_attribution_left",
        "emb_matryoshka_recall",
        "corpus_training_order",
        "sim_ivf_recall",
    }
)


def tier_names(tier: str = "full") -> list[str]:
    """Registry names for a cost tier, in registration (canonical) order."""
    names = list(QUERIES)
    if tier == "full":
        return names
    if tier == "standard":
        return [n for n in names if n not in HEAVY_TIER]
    if tier == "smoke":
        seen: set[str] = set()
        out: list[str] = []
        for n in names:
            fam = n.split("_", 1)[0]
            if fam not in seen and n not in HEAVY_TIER:
                seen.add(fam)
                out.append(n)
        return out
    raise ValueError(f"unknown tier {tier!r} (smoke|standard|full)")
