"""Gate queries exercising the engine's ETL operators over the synthetic
tables directly (FIXTURES.md §6): upsert/dedup semantics, conditional
aggregates, multi-join star queries, sessionization, JSON extraction, and
the daily_stats roll-up.

Registered into the driver-facing registry (plans/registry.py) with DuckDB
oracles.  Cross-engine parity rules documented in registry.py apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.rollup import build_daily_stats, run_report
from ..operators.upsert import dedup_batch, upsert_latest_wins
from .registry import query
from .testdata import disruptions_df, load_table, rail_oracle_prelude


# ---------------------------------------------------------------------------
# daily_stats roll-up (SURVEY §2.6 A9) over the derived disruptions table
# ---------------------------------------------------------------------------
@query(
    "rail_daily_stats",
    rail_oracle_prelude()
    + """,
base AS (
    SELECT CAST(start_time AS DATE) AS date, *
    FROM disruptions WHERE start_time IS NOT NULL
),
core AS (
    SELECT date,
           CAST(COUNT(*) AS INTEGER) AS total_disruptions,
           CAST(SUM(CASE WHEN type = 'cancellation' THEN 1 ELSE 0 END)
                AS INTEGER) AS total_cancellations,
           ROUND((CAST(SUM(CAST(duration_minutes AS DECIMAL(24,6))) AS DOUBLE) / COUNT(duration_minutes)), 3) AS avg_duration_minutes,
           CAST(trunc(MAX(duration_minutes)) AS INTEGER) AS max_duration_minutes
    FROM base GROUP BY date
),
station_counts AS (
    SELECT date, TRIM(s.code) AS value, COUNT(*) AS cnt
    FROM base, unnest(string_split(affected_stations, ',')) AS s(code)
    WHERE affected_stations IS NOT NULL
    GROUP BY date, value
),
smode AS (
    SELECT date, value AS most_affected_station FROM (
        SELECT date, value,
               ROW_NUMBER() OVER (PARTITION BY date ORDER BY cnt DESC, value)
                   AS rn
        FROM station_counts
    ) WHERE rn = 1
),
hour_counts AS (
    SELECT date, CAST(strftime(start_time, '%H') AS INTEGER) AS value,
           COUNT(*) AS cnt
    FROM base GROUP BY date, value
),
hmode AS (
    SELECT date, value AS peak_hour FROM (
        SELECT date, value,
               ROW_NUMBER() OVER (PARTITION BY date ORDER BY cnt DESC, value)
                   AS rn
        FROM hour_counts
    ) WHERE rn = 1
)
SELECT core.date, total_disruptions, total_cancellations,
       avg_duration_minutes, max_duration_minutes,
       most_affected_station, peak_hour
FROM core
LEFT JOIN smode ON core.date = smode.date
LEFT JOIN hmode ON core.date = hmode.date
""",
)
def _daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = build_daily_stats(disruptions_df(spark, sf_dir))
    return out.drop("calculated_at").withColumn(
        "avg_duration_minutes", F.round("avg_duration_minutes", 3)
    )


# ---------------------------------------------------------------------------
# Run report (A7 / pipeline.py:318-330): one-row "today" aggregate.  The
# derived disruptions table has no created_at; the report day is anchored on
# start_time with as-of = max(start_time) date (registry determinism rules).
# ---------------------------------------------------------------------------
@query(
    "rail_report",
    rail_oracle_prelude()
    + """
SELECT COUNT(*) AS total_records,
       CAST(SUM(CASE WHEN type = 'disruption' THEN 1 ELSE 0 END) AS BIGINT)
           AS disruptions,
       CAST(SUM(CASE WHEN type = 'maintenance' THEN 1 ELSE 0 END) AS BIGINT)
           AS maintenance,
       CAST(SUM(CASE WHEN type = 'calamity' THEN 1 ELSE 0 END) AS BIGINT)
           AS calamities,
       ROUND((CAST(SUM(CAST(duration_minutes AS DECIMAL(24,6))) AS DOUBLE) / COUNT(duration_minutes)), 1) AS avg_duration_minutes,
       MAX(impact_level) AS max_impact_level
FROM disruptions
WHERE CAST(start_time AS DATE) =
      (SELECT CAST(max(start_time) AS DATE) FROM disruptions)
""",
)
def _report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = disruptions_df(spark, sf_dir)
    as_of = d.agg(F.max(F.to_date("start_time"))).first()[0]
    return run_report(d.withColumn("created_at", F.col("start_time")), as_of)


# ---------------------------------------------------------------------------
# Upsert semantics as a query (S7/J4): latest-wins merge of two event slices
# ---------------------------------------------------------------------------
@query(
    "etl_upsert_latest_wins",
    """
WITH existing AS (
    SELECT event_id, event_type, value, ts FROM events WHERE event_id % 2 = 0
),
batch AS (
    SELECT event_id, event_type, value * 2 AS value, ts
    FROM events WHERE event_id % 3 = 0
),
tagged AS (
    SELECT *, 0 AS prio FROM existing
    UNION ALL
    SELECT *, 1 AS prio FROM batch
)
SELECT event_id, event_type, value, ts FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY event_id ORDER BY prio DESC, ts DESC
    ) AS rn FROM tagged
) WHERE rn = 1
""",
)
def _upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", spread=True).select(
        "event_id", "event_type", "value", "ts"
    )
    existing = ev.filter(F.col("event_id") % 2 == 0)
    batch = ev.filter(F.col("event_id") % 3 == 0).withColumn(
        "value", F.col("value") * 2
    )
    return upsert_latest_wins(existing, batch, ["event_id"], "ts")


# ---------------------------------------------------------------------------
# Exact dedup with deterministic winner (J5 / dedup_batch)
# ---------------------------------------------------------------------------
@query(
    "etl_dedup_latest_order_per_customer",
    """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey
           ) AS rn
    FROM orders
) WHERE rn = 1
""",
)
def _dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", spread=True).select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    return dedup_batch(
        orders, ["o_custkey"], [F.desc("o_orderdate"), F.asc("o_orderkey")]
    )


# ---------------------------------------------------------------------------
# Conditional aggregates over lineitem (A3/A7/M2 at TPC-H shape)
# ---------------------------------------------------------------------------
@query(
    "agg_pricing_summary",
    """
SELECT
    l_returnflag,
    l_linestatus,
    ROUND(SUM(l_quantity), 2) AS sum_qty,
    ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
    ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
    ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
        AS sum_charge,
    ROUND(AVG(l_quantity), 2) AS avg_qty,
    ROUND(AVG(l_extendedprice), 2) AS avg_price,
    ROUND(AVG(l_discount), 4) AS avg_disc,
    COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def _pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Star-schema join: revenue by nation (J1 broadcast pattern at fact scale)
# ---------------------------------------------------------------------------
@query(
    "join_revenue_by_nation",
    """
SELECT n_name AS nation,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS line_count
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def _revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders", spread=True)
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Sessionization: gap-based session ids via lag + running sum (W8 pattern)
# ---------------------------------------------------------------------------
SESSION_GAP_MIN = 30


@query(
    "events_sessionize",
    f"""
WITH ordered AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
    SELECT user_id, ts,
           CAST(SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS session_id
    FROM ordered
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end
FROM sessioned
GROUP BY user_id, session_id
""",
)
def _sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", spread=True)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull()
        | ((F.unix_micros("ts") - F.unix_micros(prev)) > gap_us),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("is_new", is_new)
        .withColumn(
            "session_id",
            F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


# ---------------------------------------------------------------------------
# JSON property extraction (F11 inverse): props -> typed column -> aggregate
# ---------------------------------------------------------------------------
@query(
    "events_json_props",
    """
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) / COUNT(value),
             2) AS avg_value
FROM events
GROUP BY k
""",
)
def _json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.compat import exact_avg

    ev = load_table(spark, sf_dir, "events", spread=True)
    return (
        ev.select(
            F.get_json_object("props", "$.k").cast("int").alias("k"), "value"
        )
        .groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.round(exact_avg(F.col("value")), 2).alias("avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join (operators/asof.py): latest purchase at-or-before each event.
# DuckDB ships a native ASOF JOIN, so the oracle checks the operator's
# semantics against an independent first-class implementation.
# ---------------------------------------------------------------------------
@query(
    "asof_last_purchase",
    """
WITH purchases AS (
    SELECT user_id, ts, purchase_event_id, purchase_value FROM (
        SELECT user_id, ts, event_id AS purchase_event_id,
               value AS purchase_value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, ts ORDER BY event_id DESC
               ) AS rn
        FROM events WHERE event_type = 'purchase'
    ) WHERE rn = 1
)
SELECT e.event_id, e.user_id, e.ts,
       p.purchase_event_id,
       p.purchase_value,
       p.ts AS _asof_ts
FROM events e
ASOF LEFT JOIN purchases p
  ON e.user_id = p.user_id AND e.ts >= p.ts
""",
)
def _asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", spread=True)
    purchases = dedup_batch(
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id", "value"
        ),
        ["user_id", "ts"],
        order_col="event_id",
    ).select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        ev.select("event_id", "user_id", "ts"),
        purchases,
        on=["user_id"],
        payload_cols=["purchase_event_id", "purchase_value"],
    )


#: Shared purchases-side CTE for the as-of family (latest event_id wins
#: among equal (user_id, ts) stamps — the dedup_batch contract).
_ASOF_PURCHASES_CTE = """
purchases AS (
    SELECT user_id, ts, purchase_event_id, purchase_value FROM (
        SELECT user_id, ts, event_id AS purchase_event_id,
               value AS purchase_value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, ts ORDER BY event_id DESC
               ) AS rn
        FROM events WHERE event_type = 'purchase'
    ) WHERE rn = 1
)
"""


def _asof_spark_inputs(spark: SparkSession, sf_dir: str):
    ev = load_table(spark, sf_dir, "events", spread=True)
    purchases = dedup_batch(
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id", "value"
        ),
        ["user_id", "ts"],
        order_col="event_id",
    ).select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    return ev.select("event_id", "user_id", "ts"), purchases


@query(
    "asof_next_purchase",
    f"""
WITH {_ASOF_PURCHASES_CTE}
SELECT e.event_id, e.user_id, e.ts,
       p.purchase_event_id,
       p.purchase_value,
       p.ts AS _asof_ts
FROM events e
ASOF LEFT JOIN purchases p
  ON e.user_id = p.user_id AND e.ts <= p.ts
""",
)
def _asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: the EARLIEST purchase at-or-after each event —
    DuckDB's native forward ASOF JOIN is the independent referee."""
    left, purchases = _asof_spark_inputs(spark, sf_dir)
    return asof_join(
        left,
        purchases,
        on=["user_id"],
        payload_cols=["purchase_event_id", "purchase_value"],
        direction="forward",
    )


_ASOF_TOL_S = 6 * 3600


@query(
    "asof_recent_purchase",
    # tolerance branch under the oracle: DuckDB's native backward ASOF
    # finds the latest-at-or-before match, then matches further than the
    # tolerance null out (payload AND matched stamp together).
    f"""
WITH {_ASOF_PURCHASES_CTE}
SELECT e.event_id, e.user_id, e.ts,
       CASE WHEN ok THEN purchase_event_id END AS purchase_event_id,
       CASE WHEN ok THEN purchase_value END AS purchase_value,
       CASE WHEN ok THEN pts END AS _asof_ts
FROM (
    SELECT e.event_id, e.user_id, e.ts,
           p.purchase_event_id, p.purchase_value, p.ts AS pts,
           p.ts IS NOT NULL
             AND date_part('epoch', e.ts) - date_part('epoch', p.ts)
                 <= {_ASOF_TOL_S} AS ok
    FROM events e
    ASOF LEFT JOIN purchases p
      ON e.user_id = p.user_id AND e.ts >= p.ts
) e
""",
)
def _asof_recent_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a 6-hour tolerance: stale matches null out —
    the 'recent enough to attribute' enrichment contract."""
    left, purchases = _asof_spark_inputs(spark, sf_dir)
    return asof_join(
        left,
        purchases,
        on=["user_id"],
        payload_cols=["purchase_event_id", "purchase_value"],
        tolerance_seconds=_ASOF_TOL_S,
    )


@query(
    "asof_nearest_purchase",
    f"""
WITH {_ASOF_PURCHASES_CTE},
b AS (
    SELECT e.event_id, p.purchase_event_id AS bid, p.purchase_value AS bval,
           p.ts AS bts
    FROM events e
    ASOF LEFT JOIN purchases p ON e.user_id = p.user_id AND e.ts >= p.ts
),
f AS (
    SELECT e.event_id, p.purchase_event_id AS fid, p.purchase_value AS fval,
           p.ts AS fts
    FROM events e
    ASOF LEFT JOIN purchases p ON e.user_id = p.user_id AND e.ts <= p.ts
)
SELECT e.event_id, e.user_id, e.ts,
       CASE WHEN pick_b THEN bid ELSE fid END AS purchase_event_id,
       CASE WHEN pick_b THEN bval ELSE fval END AS purchase_value,
       CASE WHEN pick_b THEN bts ELSE fts END AS _asof_ts
FROM (
    SELECT e.event_id, e.user_id, e.ts, b.bid, b.bval, b.bts,
           f.fid, f.fval, f.fts,
           (f.fts IS NULL OR (b.bts IS NOT NULL AND
            date_part('epoch', e.ts) - date_part('epoch', b.bts)
            <= date_part('epoch', f.fts) - date_part('epoch', e.ts)))
               AS pick_b
    FROM events e
    JOIN b USING (event_id)
    JOIN f USING (event_id)
) e
""",
)
def _asof_nearest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of (tie -> backward, the pandas rule): the oracle
    composes DuckDB's two native ASOF directions and re-derives the
    pick, so the engine's single-shuffle twin-window plan is checked
    against an independent formulation."""
    left, purchases = _asof_spark_inputs(spark, sf_dir)
    return asof_join(
        left,
        purchases,
        on=["user_id"],
        payload_cols=["purchase_event_id", "purchase_value"],
        direction="nearest",
    )


# ---------------------------------------------------------------------------
# Range join (operators/range_join.py): events inside disruption intervals,
# aggregated per impact level.  The oracle runs the plain theta join DuckDB
# is happy to nested-loop at this scale; the Spark side must produce the
# identical match set through the bucketed equi-join plan.
# ---------------------------------------------------------------------------
@query(
    "range_join_containment",
    rail_oracle_prelude()
    + """
SELECT d.impact_level,
       COUNT(*) AS n_matches,
       COUNT(DISTINCT e.event_id) AS n_events
FROM events e
JOIN disruptions d
  ON e.ts >= d.start_time AND e.ts <= d.end_time
GROUP BY 1
""",
)
def _range_join_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.range_join import point_in_interval_join

    ev = load_table(spark, sf_dir, "events", spread=True).select(
        "event_id", "ts"
    )
    dis = disruptions_df(spark, sf_dir).select(
        "disruption_id", "start_time", "end_time", "impact_level"
    )
    return (
        point_in_interval_join(ev, dis, "ts", "start_time", "end_time")
        .groupBy("impact_level")
        .agg(
            F.count("*").alias("n_matches"),
            F.countDistinct("event_id").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Range join, LEFT variant (VERDICT r02 'What's wrong' #2): the point side
# carries a deliberately NULL-bearing column (utag) so the null-safe
# anti-join is exercised — with null-rejecting anti equality a matched
# point with utag NULL would be emitted twice (matched + null-padded).
# Pointless points (events outside every disruption window) surface as
# n_unmatched > 0.
# ---------------------------------------------------------------------------
@query(
    "range_join_left",
    rail_oracle_prelude()
    + """
SELECT e.utag,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN d.disruption_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_unmatched,
       COUNT(DISTINCT e.event_id) AS n_events
FROM (SELECT event_id, ts, NULLIF(user_id % 5, 0) AS utag FROM events) e
LEFT JOIN disruptions d
  ON e.ts >= d.start_time AND e.ts <= d.end_time
GROUP BY 1
""",
)
def _range_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.range_join import point_in_interval_join

    ev = load_table(spark, sf_dir, "events", spread=True).select(
        "event_id",
        "ts",
        F.nullif(F.col("user_id") % 5, F.lit(0)).alias("utag"),
    )
    dis = disruptions_df(spark, sf_dir).select(
        "disruption_id", "start_time", "end_time"
    )
    return (
        point_in_interval_join(
            ev, dis, "ts", "start_time", "end_time", how="left"
        )
        .groupBy("utag")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                F.when(F.col("disruption_id").isNull(), 1).otherwise(0)
            ).alias("n_unmatched"),
            F.countDistinct("event_id").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Hypertable-style multi-granularity rollup (continuous-aggregate shape):
# ONE pass produces the hour, day, month, and grand-total grains via
# ROLLUP/GROUPING SETS — partial aggregation is shared across grains
# instead of re-scanning per granularity.
# ---------------------------------------------------------------------------
@query(
    "rollup_multi_granularity",
    rail_oracle_prelude()
    + """
SELECT strftime(start_time, '%Y-%m') AS month,
       CAST(start_time AS DATE) AS day,
       strftime(start_time, '%H') AS hour,
       COUNT(*) AS n_disruptions,
       MAX(impact_level) AS max_impact
FROM disruptions
WHERE start_time IS NOT NULL
GROUP BY ROLLUP(month, day, hour)
""",
)
def _rollup_multi_granularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.compat import hour_bucket

    d = disruptions_df(spark, sf_dir).filter(F.col("start_time").isNotNull())
    return (
        d.withColumn("month", F.date_format("start_time", "yyyy-MM"))
        .withColumn("day", F.to_date("start_time"))
        .withColumn("hour", hour_bucket(F.col("start_time")))
        .rollup("month", "day", "hour")
        .agg(
            F.count("*").alias("n_disruptions"),
            F.max("impact_level").alias("max_impact"),
        )
    )


# ---------------------------------------------------------------------------
# Exact quantiles (sort-based percentile with linear interpolation — Spark
# `percentile` and DuckDB `quantile_cont` implement the same formula, so
# the oracle checks the interpolation bit-for-bit).
# ---------------------------------------------------------------------------
@query(
    "agg_value_quantiles",
    """
SELECT event_type,
       quantile_cont(value, 0.25) AS p25,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.75) AS p75,
       quantile_cont(value, 0.9) AS p90,
       COUNT(value) AS n
FROM events
GROUP BY event_type
""",
)
def _value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", spread=True)
    return ev.groupBy("event_type").agg(
        F.percentile("value", 0.25).alias("p25"),
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.75).alias("p75"),
        F.percentile("value", 0.9).alias("p90"),
        F.count("value").alias("n"),
    )


# ---------------------------------------------------------------------------
# Built-in session windows (the native complement of the custom
# applyInPandasWithState sessionizer): session_window(ts, gap) groups rows
# into gap-bounded sessions engine-side; window end = last event + gap.
# ---------------------------------------------------------------------------
@query(
    "events_session_window",
    f"""
WITH ordered AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
    SELECT user_id, ts,
           SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS sid
    FROM ordered
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS session_end,
       COUNT(*) AS n_events
FROM sessioned
GROUP BY user_id, sid
""",
)
def _session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", spread=True)
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# CUBE: every (event_type x day-of-week) margin in one shared-partial-agg
# pass — the all-margins companion of rollup_multi_granularity.  Subtotal
# rows carry NULL group keys on both engines, so the level marker needs no
# grouping_id().
# ---------------------------------------------------------------------------
@query(
    "events_cube",
    """
SELECT event_type,
       CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
       COUNT(*) AS n_events,
       ROUND((CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(24,10)))
                   AS DOUBLE) / COUNT(value)), 4) AS avg_value
FROM events
GROUP BY CUBE(event_type, CAST(dayofweek(ts) + 1 AS INTEGER))
""",
)
def _events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both margins + grand total in ONE aggregation: CUBE shares the
    partial (map-side) aggregation across all four grouping sets instead
    of scanning per margin.  The average goes through string-exact decimal
    sums (see emb_label_centroids) so every margin hash-matches."""
    ev = load_table(spark, sf_dir, "events", spread=True).select(
        "event_type",
        F.dayofweek("ts").cast("int").alias("dow"),
        F.col("value").cast("string").cast("decimal(24,10)").alias("_dv"),
        "value",
    )
    return ev.cube("event_type", "dow").agg(
        F.count("*").alias("n_events"),
        F.round(
            F.sum("_dv").cast("double") / F.count("value"), 4
        ).alias("avg_value"),
    )


# ---------------------------------------------------------------------------
# SCD-2 validity intervals from a change stream: each event opens a state
# interval that the user's next event closes (half-open, lead-based) — the
# standard slowly-changing-dimension type-2 build, one user-keyed window.
# ---------------------------------------------------------------------------
@query(
    "scd2_user_state",
    """
SELECT user_id,
       event_type AS state,
       ts AS valid_from,
       LEAD(ts) OVER w AS valid_to,
       LEAD(ts) OVER w IS NULL AS is_current
FROM events
WHERE user_id % 20 = 0
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def _scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history of each user's last event type.  `valid_to` is the
    next change's timestamp (NULL = open/current row).  One shuffle on the
    dimension's natural key — the 100 TB shape of an SCD-2 rebuild; the
    user filter keeps the gate's output proportionate."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        load_table(spark, sf_dir, "events", spread=True)
        .filter(F.col("user_id") % 20 == 0)
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            nxt.alias("valid_to"),
            nxt.isNull().alias("is_current"),
        )
    )


# ---------------------------------------------------------------------------
# FULL OUTER join coverage: deliberately misaligned key slices so BOTH
# null-padded directions appear in the output (TPC-H referential integrity
# would otherwise leave the right side fully matched).
# ---------------------------------------------------------------------------
@query(
    "join_full_outer_coverage",
    """
WITH c AS (
    SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0
),
o AS (
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders WHERE o_custkey % 2 = 0
    GROUP BY o_custkey
)
SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
       c.c_name,
       o.n_orders,
       c.c_custkey IS NULL AS customer_missing,
       o.o_custkey IS NULL AS orders_missing
FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
""",
)
def _full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", "c_name")
    )
    orders = (
        load_table(spark, sf_dir, "orders", spread=True)
        .filter(F.col("o_custkey") % 2 == 0)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "full_outer"
    ).select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_name",
        "n_orders",
        F.col("c_custkey").isNull().alias("customer_missing"),
        F.col("o_custkey").isNull().alias("orders_missing"),
    )


# ---------------------------------------------------------------------------
# Bucketed co-located join (sources/lake.py write_bucketed): the storage
# layout that removes the fact-table shuffle from every repeated-key join
# at 100 TB.  The gate materializes orders and customer bucketed+sorted on
# custkey into a /tmp warehouse (once per session per SF), joins them with
# a merge hint — zero Exchange on either side, the plan-shape test asserts
# it — and aggregates per market segment.  The oracle joins the ORIGINAL
# parquet, so the whole bucketed write -> catalog read -> co-located join
# path is hash-checked, not just plan-asserted.
# ---------------------------------------------------------------------------
_BUCKETS = 8


@query(
    "join_bucketed_colocated",
    """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def _bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..sources.lake import write_bucketed

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), "nl_spark_bucketed", tag)
    specs = {
        "orders": (["o_custkey"], ["o_custkey", "o_orderkey", "o_totalprice"]),
        "customer": (["c_custkey"], ["c_custkey", "c_mktsegment"]),
    }
    for table, (keys, cols) in specs.items():
        name = f"bkt_{table}_{tag}"
        if not spark.catalog.tableExists(name):
            write_bucketed(
                load_table(spark, sf_dir, table, spread=True).select(*cols),
                name,
                keys,
                num_buckets=_BUCKETS,
                path=os.path.join(base, table),
            )
    orders = spark.table(f"bkt_orders_{tag}")
    cust = spark.table(f"bkt_customer_{tag}")
    return (
        orders.join(
            cust.hint("merge"),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# Salted skew join (operators/skew.py): the mitigation's CONTRACT — output
# identical to the plain join for any salt — under the oracle, not just
# pytest.  The fact side scatters across 8 sub-keys, the dimension
# replicates once per sub-key; the oracle is the unsalted ANSI join.
# ---------------------------------------------------------------------------
@query(
    "join_salted_skew",
    """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
JOIN customer ON o_custkey = c_custkey
GROUP BY o_orderpriority
""",
)
def _salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    orders = (
        load_table(spark, sf_dir, "orders", spread=True)
        .withColumnRenamed("o_custkey", "custkey")
    )
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    return (
        salted_join(orders, cust, on=["custkey"], salt=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# CDC snapshot materialization (upsert.apply_cdc_log): latest-wins with
# delete semantics over a change log derived from events (signup=insert,
# error=delete, rest=update).  The Spark winner is a partial-aggregated
# max(struct) — skew-immune; the oracle states the same semantics as a
# last-row-per-key window, proving the two formulations agree.
# ---------------------------------------------------------------------------
_CDC_OP_SQL = (
    "CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' "
    "ELSE 'U' END"
)


@query(
    "cdc_latest_snapshot",
    f"""
WITH log AS (
    SELECT user_id, ts, event_id, {_CDC_OP_SQL} AS op, value FROM events
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
    ) AS rn
    FROM log
)
SELECT user_id, ts, event_id, op, value
FROM ranked WHERE rn = 1 AND op <> 'D'
""",
)
def _cdc_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.upsert import apply_cdc_log

    ev = load_table(spark, sf_dir, "events", spread=True)
    op = (
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
    )
    log = ev.select("user_id", "ts", "event_id", op.alias("op"), "value")
    return apply_cdc_log(
        log,
        key_cols=["user_id"],
        ts_col="ts",
        seq_col="event_id",
        payload_cols=["value"],
    )


# ---------------------------------------------------------------------------
# Z-order clustering key (functions/layout.py): bit-interleaved
# (user, day) sort key for two-dimensional file pruning — the Delta
# OPTIMIZE ZORDER technique as an oracle-checkable expression.  The gate
# emits each event's key plus the per-key range summary a compaction job
# would range-partition on.
# ---------------------------------------------------------------------------
from ..functions.layout import zorder_key, zorder_key_sql  # noqa: E402


@query(
    "events_zorder_key",
    f"""
SELECT event_id,
       {zorder_key_sql("user_id % 65536",
                       "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)")}
           AS zkey
FROM events
""",
)
def _events_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", spread=True)
    return ev.select(
        "event_id",
        zorder_key(
            F.col("user_id") % 65536, F.unix_date(F.to_date("ts"))
        ).alias("zkey"),
    )


# ---------------------------------------------------------------------------
# TPC-H-classic multi-join analytics (Q3/Q5 shapes adapted to the synthetic
# relational schema): the join-ordering / broadcast showcase over
# customer-orders-lineitem(-supplier-nation-region).  Revenue terms
# quantize to DECIMAL(18,2) (prices/discounts carry 2 decimals — exact),
# so the sums hash-match; Catalyst broadcasts every dimension and AQE
# picks the fact-join strategy.
# ---------------------------------------------------------------------------
_REV_SQL = (
    "CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(18,2)) * "
    "(1 - CAST(CAST(l_discount AS VARCHAR) AS DECIMAL(18,2)))"
)


def _rev_col() -> F.Column:
    p = F.col("l_extendedprice").cast("string").cast("decimal(18,2)")
    d = F.col("l_discount").cast("string").cast("decimal(18,2)")
    return p * (F.lit(1) - d)


@query(
    "tpch_q3_shipping_priority",
    f"""
SELECT l_orderkey,
       ROUND(CAST(SUM({_REV_SQL}) AS DOUBLE), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
)
def _tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders", spread=True).filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-03-15"))
    )
    li = load_table(spark, sf_dir, "lineitem", spread=True).filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-03-15"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_rev_col()).cast("double"), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey")
        )
        .limit(10)
    )


@query(
    "tpch_q5_regional_volume",
    f"""
SELECT n_name,
       ROUND(CAST(SUM({_REV_SQL}) AS DOUBLE), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
)
def _tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders", spread=True).filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev_col()).cast("double"), 2).alias("revenue"))
    )


@query(
    "tpch_q10_returned_items",
    f"""
SELECT c_custkey, c_name, n_name,
       ROUND(CAST(SUM({_REV_SQL}) AS DOUBLE), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def _tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer —
    3 fact/dim joins, grouped revenue, global top-20
    (TakeOrderedAndProject)."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders", spread=True).filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-07-01")))
    )
    li = load_table(spark, sf_dir, "lineitem", spread=True).filter(
        F.col("l_returnflag") == "R"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nat, cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_rev_col()).cast("double"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q1 (pricing summary) and Q6 (forecast revenue): the scan-heavy
# aggregate pair that complements the join-heavy Q3/Q5/Q10.  Q1 is the
# canonical map-side partial-agg showcase (9 aggregates, 1 exchange over a
# handful of groups); Q6 is pure scan+filter+sum (predicate pushdown to
# parquet, zero shuffles beyond the final 1-row agg).  All money math in
# exact DECIMAL via the string-image cast ((12,2)x(11,2)x(11,2) = (36,6),
# under both engines' 38-digit cap), averages as one IEEE division of
# exact sums — hash-stable at any SF and partitioning.
# ---------------------------------------------------------------------------
from .oracle_util import round_sql as _round_sql  # noqa: E402

_D2 = "CAST(CAST({x} AS VARCHAR) AS DECIMAL(12,2))"
_Q1_QTY = _D2.format(x="l_quantity")
_Q1_PRICE = _D2.format(x="l_extendedprice")
_Q1_DISC = "CAST(CAST(l_discount AS VARCHAR) AS DECIMAL(11,2))"
_Q1_TAX = "CAST(CAST(l_tax AS VARCHAR) AS DECIMAL(11,2))"


def _dec2(col: str, prec: int = 12) -> F.Column:
    return F.col(col).cast("string").cast(f"decimal({prec},2)")


@query(
    "tpch_q1_pricing_summary",
    f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM({_Q1_QTY}) AS DOUBLE) AS sum_qty,
       CAST(SUM({_Q1_PRICE}) AS DOUBLE) AS sum_base_price,
       CAST(SUM({_Q1_PRICE} * (1 - {_Q1_DISC})) AS DOUBLE) AS sum_disc_price,
       CAST(SUM({_Q1_PRICE} * (1 - {_Q1_DISC}) * (1 + {_Q1_TAX})) AS DOUBLE)
           AS sum_charge,
       {{a_qty}} AS avg_qty,
       {{a_price}} AS avg_price,
       {{a_disc}} AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""".format(
        a_qty=_round_sql(
            f"CAST(SUM({_Q1_QTY}) AS DOUBLE) / COUNT(*)", 4
        ),
        a_price=_round_sql(
            f"CAST(SUM({_Q1_PRICE}) AS DOUBLE) / COUNT(*)", 4
        ),
        a_disc=_round_sql(
            f"CAST(SUM({_Q1_DISC}) AS DOUBLE) / COUNT(*)", 4
        ),
    ),
)
def _tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True).filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02"))
    )
    qty, price = _dec2("l_quantity"), _dec2("l_extendedprice")
    disc = _dec2("l_discount", 11)
    tax = _dec2("l_tax", 11)
    cnt = F.count("*")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
        F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
        .cast("double")
        .alias("sum_charge"),
        F.round(F.sum(qty).cast("double") / cnt, 4).alias("avg_qty"),
        F.round(F.sum(price).cast("double") / cnt, 4).alias("avg_price"),
        F.round(F.sum(disc).cast("double") / cnt, 4).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@query(
    "tpch_q6_forecast_revenue",
    f"""
SELECT CAST(SUM({_Q1_PRICE} * {_Q1_DISC}) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND {_Q1_DISC} BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def _tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    disc = _dec2("l_discount", 11)
    li = load_table(spark, sf_dir, "lineitem", spread=True).filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
        & disc.between(F.lit("0.05").cast("decimal(11,2)"),
                       F.lit("0.07").cast("decimal(11,2)"))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_dec2("l_extendedprice") * disc)
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 (promotion effect) and Q18 (large-volume customers).  Q14:
# conditional aggregation over the lineitem-part broadcast join — the
# promo share is ONE IEEE division of two exact decimal sums.  Q18: the
# classic HAVING-subquery semi-join (orders whose total quantity exceeds a
# threshold), planned as an aggregated build side left-semi-joined into
# the fact scan; quantities are integral so their double sums are exact at
# any order.
# ---------------------------------------------------------------------------
@query(
    "tpch_q14_promo_effect",
    f"""
SELECT {{share}} AS promo_share,
       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           AS promo_revenue,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate <  TIMESTAMP '1997-10-01'
""".format(
        share=_round_sql(
            "100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN "
            f"{_REV_SQL} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)"
            f" / CAST(SUM({_REV_SQL}) AS DOUBLE)",
            4,
        )
    ),
)
def _tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True).filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-09-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-10-01")))
    )
    part = load_table(spark, sf_dir, "part")
    rev = _rev_col()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(rev).cast("double"),
            4,
        ).alias("promo_share"),
        F.sum(promo).cast("double").alias("promo_revenue"),
        F.sum(rev).cast("double").alias("total_revenue"),
    )


_Q18_MIN_QTY = 250


@query(
    "tpch_q18_large_orders",
    f"""
WITH big AS (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING SUM(l_quantity) > {_Q18_MIN_QTY}
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       ROUND(CAST(o_totalprice AS DOUBLE), 2) AS o_totalprice,
       CAST(SUM(l_quantity) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
""",
)
def _tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > _Q18_MIN_QTY)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders", spread=True).join(
        big, F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    cust = load_table(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            F.round(F.col("o_totalprice").cast("double"), 2).alias(
                "o_totalprice"
            ),
            "total_qty",
        )
        .orderBy(
            F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey")
        )
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 and Q19 shapes, adapted to the synthetic schema (no
# commitdate/receiptdate/shipmode columns): Q4's EXISTS decorrelates to a
# left-semi join into the orders scan ("orders with a late-shipping line"
# = l_shipdate > o_orderdate + 60 days); Q19's OR-of-ANDs disjunction
# across join sides is the classic partial-pushdown test — Catalyst pushes
# the per-side IN/range supersets to both scans while the exact disjunct
# evaluates post-join.
# ---------------------------------------------------------------------------
@query(
    "tpch_q4_priority_check",
    """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate <  TIMESTAMP '1997-10-01'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
""",
)
def _tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", spread=True).filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-07-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-10-01")))
    )
    li = load_table(spark, sf_dir, "lineitem", spread=True).select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@query(
    "tpch_q19_disjunctive_revenue",
    f"""
SELECT ROUND(CAST(SUM({_REV_SQL}) AS DOUBLE), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 40)
""",
)
def _tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    b = F.col("p_brand")
    s = F.col("p_size")
    q = F.col("l_quantity")
    disj = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 15))
        | ((b == "Brand#2") & s.between(10, 30) & q.between(10, 25))
        | ((b == "Brand#3") & s.between(20, 50) & q.between(20, 40))
    )
    return j.filter(disj).agg(
        F.round(F.sum(_rev_col()).cast("double"), 2).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 / Q13 / Q22 shapes — the NOT-EXISTS / outer-aggregate
# decorrelation family Q4's EXISTS left open, adapted to the synthetic
# schema ("late line" = l_shipdate > o_orderdate + 60 days stands in for
# receiptdate > commitdate; o_orderpriority for o_comment; c_nationkey for
# the phone country code).  Q21: correlated EXISTS + NOT EXISTS with an
# INEQUALITY correlation (other-supplier lines of the same order) becomes
# a left-semi then left-anti join, each on the l_orderkey equi-key with
# the suppkey<> residual — never a cartesian.  Q13: the exclusion
# predicate lives on the OUTER JOIN's ON clause, and the aggregate runs
# over preserved NULL rows (customers with zero surviving orders count at
# c_count = 0).  Q22: scalar-subquery threshold (exact DECIMAL sum, one
# IEEE division — deterministic boundary membership) + NOT EXISTS
# anti-join against recent orders.
# ---------------------------------------------------------------------------
_Q21_NATIONS = ["NATION_3", "NATION_13", "NATION_19"]
_Q21_NATION_IN = ", ".join(f"'{n}'" for n in _Q21_NATIONS)


@query(
    "tpch_q21_waiting_suppliers",
    f"""
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
  AND s_nationkey = n_nationkey
  AND n_name IN ({_Q21_NATION_IN})
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
)
def _tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # one orders projection feeds BOTH the l1 lateness flag and the inner
    # NOT EXISTS (which correlates on the same order's o_orderdate)
    orders_f = (
        load_table(spark, sf_dir, "orders", spread=True)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    flagged = li.join(orders_f, li.l_orderkey == orders_f.o_orderkey)
    late = flagged.filter(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).select("l_orderkey", "l_suppkey")
    # EXISTS other-supplier line -> left-semi on the order equi-key with
    # the suppkey<> residual; NOT EXISTS other-supplier LATE line -> the
    # same shape as a left-anti against the late set itself
    other = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    l1 = late.join(
        other,
        (late.l_orderkey == other._ok) & (late.l_suppkey != other._sk),
        "left_semi",
    ).join(
        other_late,
        (late.l_orderkey == other_late._ok)
        & (late.l_suppkey != other_late._sk),
        "left_anti",
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation").filter(
                F.col("n_name").isin(_Q21_NATIONS)
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        l1.join(F.broadcast(sup), l1.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


_Q13_EXCLUDED_PRIORITY = "4-NOT SPECIFIED"


@query(
    "tpch_q13_order_distribution",
    f"""
WITH per_cust AS (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders
      ON c_custkey = o_custkey
     AND o_orderpriority <> '{_Q13_EXCLUDED_PRIORITY}'
    GROUP BY c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
""",
)
def _tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Aggregate-BELOW-outer-join rewrite: counting per customer after the
    # left join would shuffle every surviving order row on custkey; the
    # count is per-custkey anyway, so partial-aggregate orders FIRST
    # (counts-granularity shuffle) and left-join customer to the counts,
    # NULL -> 0 for customers whose orders were all excluded or absent —
    # exactly the preserved-row semantics of the ON-clause filter.
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    counts = (
        load_table(spark, sf_dir, "orders", spread=True)
        .filter(F.col("o_orderpriority") != _Q13_EXCLUDED_PRIORITY)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("_n"))
    )
    per_cust = cust.join(
        counts, cust.c_custkey == counts.o_custkey, "left"
    ).select(
        F.coalesce(F.col("_n"), F.lit(0).cast("bigint")).alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


_Q22_CODES = [1, 3, 5, 7, 9, 11, 13]
_Q22_CUTOFF = "2000-01-01"


@query(
    "tpch_q22_global_sales_opportunity",
    f"""
WITH base AS (
    SELECT c_custkey, c_nationkey, c_acctbal FROM customer
    WHERE c_nationkey IN ({", ".join(str(c) for c in _Q22_CODES)})
),
avg_bal AS (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(24,6))) AS DOUBLE)
           / COUNT(*) AS ab
    FROM base WHERE c_acctbal > 0
)
SELECT c_nationkey AS cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(24,6))) AS DOUBLE), 2)
           AS totacctbal
FROM base, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}'
  )
GROUP BY c_nationkey
""",
)
def _tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    base = cust.filter(F.col("c_nationkey").isin(_Q22_CODES)).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    # scalar subquery -> 1-row broadcast; the threshold is an exact
    # DECIMAL sum over one IEEE division, so which customers clear it is
    # bit-deterministic on both engines (a double-summed AVG would make
    # boundary membership partitioning-dependent)
    avg_row = base.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(24,6)")).cast("double")
            / F.count("*")
        ).alias("_ab")
    )
    recent = (
        load_table(spark, sf_dir, "orders", spread=True)
        .filter(F.col("o_orderdate") >= F.to_timestamp(F.lit(_Q22_CUTOFF)))
        .select("o_custkey")
    )
    return (
        base.crossJoin(F.broadcast(avg_row))
        .filter(F.col("c_acctbal") > F.col("_ab"))
        .join(recent, F.col("c_custkey") == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(24,6)")).cast(
                    "double"
                ),
                2,
            ).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 / Q16 / Q17 shapes — the scalar-subquery family: Q15 filters a
# derived revenue view against its own global MAX (exact DECIMAL revenue,
# so the equality is deterministic); Q16 is NOT IN -> left-anti plus a
# COUNT(DISTINCT) over three grouping columns (partsupp is absent from the
# synthetic schema, so supplier relationships derive from lineitem and the
# "customer complaints" exclusion is proxied by negative supplier account
# balance); Q17's correlated per-part average decorrelates to a part-keyed
# aggregate join, with the 0.2*avg threshold rewritten as the EXACT
# integer-decimal cross-multiplication 5*qty*cnt < sum — no IEEE division
# on the filter boundary at all.
# ---------------------------------------------------------------------------
_Q15_START, _Q15_END = "1998-01-01", "1998-04-01"


@query(
    "tpch_q15_top_supplier",
    f"""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           SUM({_REV_SQL}) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{_Q15_START}'
      AND l_shipdate <  TIMESTAMP '{_Q15_END}'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       ROUND(CAST(total_revenue AS DOUBLE), 2) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def _tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True).filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit(_Q15_START)))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit(_Q15_END)))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_col()).alias("_rev")
    )
    # global MAX over the DECIMAL-exact view -> 1-row broadcast; equality
    # against exact decimals is deterministic under any partitioning
    top = revenue.agg(F.max("_rev").alias("_top"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("_rev") == F.col("_top"))
        .join(F.broadcast(sup), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("_rev").cast("double"), 2).alias("total_revenue"),
        )
    )


_Q16_EXCLUDED_BRAND = "Brand#1"
_Q16_SIZES = [1, 5, 9, 13, 17, 21, 25]


@query(
    "tpch_q16_supplier_counts",
    f"""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> '{_Q16_EXCLUDED_BRAND}'
  AND p_size IN ({", ".join(str(s) for s in _Q16_SIZES)})
  AND l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
""",
)
def _tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True).select(
        "l_partkey", "l_suppkey"
    )
    complaints = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != _Q16_EXCLUDED_BRAND)
            & F.col("p_size").isin(_Q16_SIZES)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    # NOT IN over a non-null key -> broadcast left-anti (the complaint
    # set is dimension-sized); the part filter broadcasts into the fact
    return (
        li.join(
            F.broadcast(complaints),
            li.l_suppkey == complaints.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q17_BRAND = "Brand#3"


@query(
    "tpch_q17_small_quantity_revenue",
    f"""
WITH per_part AS (
    SELECT l_partkey,
           SUM(CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(18,2)))
               AS qty_sum,
           COUNT(*) AS cnt
    FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(CAST(SUM(CAST(CAST(l_extendedprice AS VARCHAR)
                          AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2)
           AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN per_part USING (l_partkey)
WHERE p_brand = '{_Q17_BRAND}'
  AND CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(18,2)) * 5 * cnt
      < qty_sum
""",
)
def _tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    qty_dec = F.col("l_quantity").cast("string").cast("decimal(18,2)")
    per_part = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum(qty_dec).alias("_qsum"), F.count("*").alias("_cnt")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == _Q17_BRAND)
        .select("p_partkey")
    )
    price_dec = F.col("l_extendedprice").cast("string").cast("decimal(18,2)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == per_part._pk)
        # l_quantity < 0.2 * (qsum/cnt)  <=>  5*qty*cnt < qsum, exact
        .filter(qty_dec * 5 * F.col("_cnt") < F.col("_qsum"))
        .agg(
            F.round(F.sum(price_dec).cast("double") / 7.0, 2).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 / Q8 shapes — the multi-nation star family: Q7's symmetric
# two-nation disjunction evaluates post-join over two broadcast copies of
# the nation dim; Q8's market share is a conditional-over-total ratio of
# exact DECIMAL sums (one IEEE division per year, round bridged through
# the shortest-decimal image on the oracle side).
# ---------------------------------------------------------------------------
from .oracle_util import round_sql  # noqa: E402

_Q7_NATION_A, _Q7_NATION_B = "NATION_3", "NATION_19"
_Q7_START, _Q7_END = "1996-01-01", "1998-01-01"


@query(
    "tpch_q7_volume_shipping",
    f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
       ROUND(CAST(SUM({_REV_SQL}) AS DOUBLE), 2) AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = '{_Q7_NATION_A}' AND n2.n_name = '{_Q7_NATION_B}')
    OR (n1.n_name = '{_Q7_NATION_B}' AND n2.n_name = '{_Q7_NATION_A}'))
  AND l_shipdate >= TIMESTAMP '{_Q7_START}'
  AND l_shipdate <  TIMESTAMP '{_Q7_END}'
GROUP BY 1, 2, 3
""",
)
def _tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True).filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit(_Q7_START)))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit(_Q7_END)))
    )
    orders = load_table(spark, sf_dir, "orders", spread=True).select(
        "o_orderkey", "o_custkey"
    )
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin([_Q7_NATION_A, _Q7_NATION_B])
    )
    # pre-filtering BOTH nation copies to the two names shrinks the
    # supplier/customer dims before they broadcast into the fact, and the
    # symmetric disjunction needs only the cross-pair residual
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(nation, F.col("c_nationkey") == nation.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.round(F.sum(_rev_col()).cast("double"), 2).alias("revenue"))
    )


_Q8_REGION_KEY = 2  # ASIA
_Q8_NATION = "NATION_9"
_Q8_TYPE = "PROMO"


@query(
    "tpch_q8_market_share",
    f"""
WITH flat AS (
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           {_REV_SQL} AS volume,
           n2.n_name AS supp_nation
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE n1.n_regionkey = {_Q8_REGION_KEY}
      AND p_type = '{_Q8_TYPE}'
)
SELECT o_year,
       {round_sql(
           "CAST(SUM(CASE WHEN supp_nation = '" + _Q8_NATION + "'"
           " THEN volume END) AS DOUBLE)"
           " / CAST(SUM(volume) AS DOUBLE)", 6)} AS mkt_share
FROM flat GROUP BY o_year
""",
)
def _tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == _Q8_TYPE)
        .select("p_partkey")
    )
    orders = load_table(spark, sf_dir, "orders", spread=True).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    nation = load_table(spark, sf_dir, "nation")
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            nation.filter(F.col("n_regionkey") == _Q8_REGION_KEY),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    flat = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev_col().alias("_vol"),
            "supp_nation",
        )
    )
    share = F.sum(
        F.when(F.col("supp_nation") == _Q8_NATION, F.col("_vol"))
    ).cast("double") / F.sum("_vol").cast("double")
    return flat.groupBy("o_year").agg(F.round(share, 6).alias("mkt_share"))


# ---------------------------------------------------------------------------
# Data-quality profiling (functions/profile.py — the Deequ family): exact
# per-column completeness/cardinality in ONE aggregation pass, plus rule
# evaluation (event_id unique+not_null, user_id bounded cardinality).
# ---------------------------------------------------------------------------
from ..functions.profile import check_rules, table_profile  # noqa: E402

_PROFILE_COLS = ["event_id", "user_id", "event_type", "value", "props"]


@query(
    "events_profile",
    "SELECT * FROM (\n"
    + "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column, CAST(COUNT(*) AS BIGINT) AS n_rows, "
        f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS n_nulls, CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct "
        "FROM events"
        for c in _PROFILE_COLS
    )
    + "\n)",
)
def _events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", spread=True)
    return table_profile(ev, _PROFILE_COLS)


@query(
    "events_profile_rules",
    """
WITH p AS (
    SELECT 'event_id' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct
    FROM events
    UNION ALL
    SELECT 'user_id', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT user_id) AS BIGINT)
    FROM events
)
SELECT "column", rule, passed FROM (
    SELECT "column", 'not_null' AS rule, n_nulls = 0 AS passed FROM p
    WHERE "column" = 'event_id'
    UNION ALL
    SELECT "column", 'unique', n_distinct = n_rows - n_nulls FROM p
    WHERE "column" = 'event_id'
    UNION ALL
    SELECT "column", 'min_distinct', n_distinct >= 10 FROM p
    WHERE "column" = 'user_id'
)
""",
)
def _events_profile_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", spread=True)
    prof = table_profile(ev, ["event_id", "user_id"])
    return check_rules(
        prof,
        {
            "event_id": {"not_null": True, "unique": True},
            "user_id": {"min_distinct": 10},
        },
    )


# ---------------------------------------------------------------------------
# Leading-digit (Benford) profile: distribution of the first significant
# digit of value per event type — the fraud/synthetic-data forensics
# signal.  Both engines print doubles shortest-roundtrip, so the digit of
# the string image is identical; zero values carry no significant digit
# and are excluded on both sides.
# ---------------------------------------------------------------------------
from .oracle_util import round_sql as _round_sql  # noqa: E402


@query(
    "events_benford_digits",
    f"""
WITH d AS (
    SELECT event_type,
           regexp_extract(CAST(value AS VARCHAR), '[1-9]', 0) AS digit
    FROM events WHERE value <> 0
),
counts AS (
    SELECT event_type, digit, CAST(COUNT(*) AS BIGINT) AS n
    FROM d WHERE digit <> '' GROUP BY event_type, digit
),
tot AS (
    SELECT event_type, CAST(SUM(n) AS BIGINT) AS t FROM counts
    GROUP BY event_type
)
SELECT c.event_type, c.digit, c.n,
       {{r}} AS share
FROM counts c JOIN tot USING (event_type)
""".format(r=_round_sql("CAST(c.n AS DOUBLE) / t", 6)),
)
def _events_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", spread=True).filter(
        F.col("value") != 0
    )
    d = ev.select(
        "event_type",
        F.regexp_extract(F.col("value").cast("string"), "[1-9]", 0).alias(
            "digit"
        ),
    ).filter(F.col("digit") != "")
    counts = d.groupBy("event_type", "digit").agg(F.count("*").alias("n"))
    tot = counts.groupBy("event_type").agg(F.sum("n").alias("t"))
    return counts.join(tot, "event_type").select(
        "event_type",
        "digit",
        "n",
        F.round(F.col("n").cast("double") / F.col("t"), 6).alias("share"),
    )


@query(
    "events_set_operations",
    # INTERSECT (distinct) and EXCEPT ALL (multiset/bag difference) are
    # the two set operators with semantics beyond plain UNION: the bag
    # difference keeps per-user multiplicity (view occurrences minus
    # purchase occurrences), which a join-based rewrite gets wrong
    # without explicit counting.  Both engines implement ANSI semantics;
    # the per-user count projection keeps the gate output compact.
    """
WITH a AS (
    SELECT user_id FROM events
    WHERE event_type = 'view' AND user_id % 11 = 0
),
b AS (
    SELECT user_id FROM events
    WHERE event_type = 'purchase' AND user_id % 11 = 0
),
i AS (SELECT user_id FROM a INTERSECT SELECT user_id FROM b),
x AS (SELECT user_id FROM a EXCEPT ALL SELECT user_id FROM b)
SELECT 'both' AS tag, user_id, CAST(1 AS BIGINT) AS n FROM i
UNION ALL
SELECT 'view_excess' AS tag, user_id, CAST(COUNT(*) AS BIGINT) AS n
FROM x GROUP BY user_id
""",
)
def _events_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native set operators: `intersect` plans as a distinct +
    left-semi aggregate join, `exceptAll` as the generated-count
    anti-multiplicity plan — both equi-keyed shuffles, no cartesians."""
    ev = load_table(spark, sf_dir, "events", spread=True).filter(
        F.col("user_id") % 11 == 0
    )
    a = ev.filter(F.col("event_type") == "view").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    both = a.intersect(b).select(
        F.lit("both").alias("tag"), "user_id", F.lit(1).cast("bigint").alias("n")
    )
    excess = (
        a.exceptAll(b)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .select(F.lit("view_excess").alias("tag"), "user_id", "n")
    )
    return both.unionByName(excess)


@query(
    "events_grouping_sets",
    # Arbitrary GROUPING SETS (finer than CUBE/ROLLUP, which are gated
    # separately): the two single-column margins plus the grand total,
    # with GROUPING() bits distinguishing a real NULL group key from a
    # rolled-up one — the standard disambiguator.
    """
SELECT event_type, CAST(ts AS DATE) AS day,
       CAST(GROUPING(event_type) AS INTEGER) AS g_type,
       CAST(GROUPING(CAST(ts AS DATE)) AS INTEGER) AS g_day,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(24,10)))
                  AS DOUBLE), 4) AS total_value
FROM events
GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())
""",
)
def _events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame-native grouping sets (Spark 4 `groupingSets`) — one
    Expand node, one partial-aggregated shuffle; the decimal summand
    makes every margin bit-identical cross-engine."""
    ev = load_table(spark, sf_dir, "events", spread=True).select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.col("value").cast("string").cast("decimal(24,10)").alias("_dv"),
    )
    return ev.groupingSets(
        [["event_type"], ["day"], []], "event_type", "day"
    ).agg(
        F.grouping("event_type").cast("int").alias("g_type"),
        F.grouping("day").cast("int").alias("g_day"),
        F.count("*").alias("n"),
        F.round(F.sum("_dv").cast("double"), 4).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q2 / Q9 / Q11 / Q12 / Q20 shapes — the final five, completing all
# 22 TPC-H query shapes against the synthetic schema.  partsupp is absent,
# so supply relationships derive from lineitem (the same proxy Q15/Q16/Q17
# established): a "supply offer" is the (part, supplier) pair's minimum
# observed unit price; "supply cost" is the part's retail price; "stock
# value" is shipped revenue.  Every filter boundary is exact (DECIMAL
# sums, double MIN equality of identically-computed values, integer
# cross-multiplication instead of fraction thresholds) so cross-engine
# membership is deterministic.
# ---------------------------------------------------------------------------
_Q2_REGION_KEY = 2
_Q2_SIZE_LO, _Q2_SIZE_HI = 10, 30
_Q2_TYPE = "STANDARD"


@query(
    "tpch_q2_min_cost_supplier",
    f"""
WITH offers AS (
    -- lineitem stands in for partsupp: each (part, supplier) pair's best
    -- observed unit price is its supply offer
    SELECT l_partkey, l_suppkey,
           MIN(l_extendedprice / l_quantity) AS unit_cost
    FROM lineitem GROUP BY l_partkey, l_suppkey
),
region_sup AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_regionkey = {_Q2_REGION_KEY}
),
scoped AS (
    SELECT p_partkey, p_type, p_size, s_suppkey, s_name, s_acctbal,
           n_name, unit_cost
    FROM part
    JOIN offers     ON l_partkey = p_partkey
    JOIN region_sup ON l_suppkey = s_suppkey
    WHERE p_size BETWEEN {_Q2_SIZE_LO} AND {_Q2_SIZE_HI}
      AND p_type = '{_Q2_TYPE}'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_type, p_size,
       unit_cost
FROM scoped
WHERE unit_cost = (
    SELECT MIN(unit_cost) FROM scoped s2
    WHERE s2.p_partkey = scoped.p_partkey
)
ORDER BY s_acctbal DESC, s_suppkey, p_partkey
LIMIT 100
""",
)
def _tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's correlated MIN decorrelates to a part-keyed aggregate join:
    per-part minimum over the REGION-scoped offers (computed once, not per
    outer row), equi-joined back on (partkey, unit_cost).  The double
    equality is deterministic because both sides are the same MIN over the
    same IEEE divisions — no summation order enters the boundary.  The
    supplier dim pre-filters to one region before broadcasting into the
    offer aggregate, and offers themselves are one lineitem shuffle on
    (l_partkey, l_suppkey)."""
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "unit_cost"
        )
    )
    region_sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation").filter(
                F.col("n_regionkey") == _Q2_REGION_KEY
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            F.col("p_size").between(_Q2_SIZE_LO, _Q2_SIZE_HI)
            & (F.col("p_type") == _Q2_TYPE)
        )
        .select("p_partkey", "p_type", "p_size")
    )
    scoped = offers.join(
        F.broadcast(region_sup), offers.l_suppkey == region_sup.s_suppkey
    ).join(F.broadcast(part), offers.l_partkey == part.p_partkey)
    per_part_min = scoped.groupBy(
        F.col("p_partkey").alias("_mpk")
    ).agg(F.min("unit_cost").alias("_min_cost"))
    return (
        scoped.join(
            per_part_min,
            (scoped.p_partkey == per_part_min._mpk)
            & (scoped.unit_cost == per_part_min._min_cost),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"), F.asc("p_partkey"))
        .limit(100)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            "p_size", "unit_cost",
        )
    )


_Q9_PATTERN = "widget"
_Q9_RETAIL_DEC = "CAST(CAST(p_retailprice AS VARCHAR) AS DECIMAL(18,2))"
_Q9_QTY_DEC = "CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(18,2))"


@query(
    "tpch_q9_product_profit",
    f"""
SELECT n_name AS supp_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS o_year,
       ROUND(CAST(SUM({_REV_SQL} - {_Q9_RETAIL_DEC} * {_Q9_QTY_DEC})
                  AS DOUBLE), 2) AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%{_Q9_PATTERN}%'
GROUP BY supp_nation, o_year
""",
)
def _tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 profit by nation and year: supply cost proxied by the part's
    retail price (partsupp absent); profit = revenue - retail*qty, both
    exact DECIMAL products, so the per-group sums are bit-identical
    cross-engine.  Name-pattern part filter and the supplier-nation dim
    both broadcast into the single fact scan — one shuffle on the
    (nation, year) grouping key."""
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like(f"%{_Q9_PATTERN}%"))
        .select("p_partkey", "p_retailprice")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    retail_dec = F.col("p_retailprice").cast("string").cast("decimal(18,2)")
    qty_dec = F.col("l_quantity").cast("string").cast("decimal(18,2)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("supp_nation", F.year("l_shipdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(_rev_col() - retail_dec * qty_dec).cast("double"), 2
            ).alias("sum_profit")
        )
    )


_Q11_NATION = "NATION_3"
_Q11_SHARE_MULT = 2  # keep parts above 2x the average share (scale-free)


@query(
    "tpch_q11_important_stock",
    f"""
WITH scoped AS (
    SELECT l_partkey, {_REV_SQL} AS val
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = '{_Q11_NATION}'
),
per_part AS (
    SELECT l_partkey AS ps_partkey, SUM(val) AS value
    FROM scoped GROUP BY l_partkey
),
tot AS (
    SELECT SUM(value) AS total, COUNT(*) AS n_parts FROM per_part
)
SELECT ps_partkey, {round_sql("CAST(value AS DOUBLE)", 2)} AS value
FROM per_part, tot
WHERE value * n_parts > {_Q11_SHARE_MULT} * total
""",
)
def _tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock: per-part value (exact DECIMAL revenue from the
    one nation's suppliers) filtered against a global-total scalar
    subquery.  The fraction threshold share > 2x average is rewritten
    as the exact cross-multiplication value*n_parts > 2*total — no IEEE
    arithmetic on the boundary, and the selectivity is scale-free.  The scalar total is a 1-row broadcast over
    the already-aggregated per-part view, so the fact table is scanned and
    shuffled exactly once."""
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation").filter(
                F.col("n_name") == _Q11_NATION
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    per_part = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(_rev_col()).alias("_value"))
    )
    total = per_part.agg(
        F.sum("_value").alias("_total"), F.count("*").alias("_n")
    )
    # TPC-H scales the HAVING fraction by 1/SF; the scale-free equivalent
    # keeps parts above _Q11_SHARE_MULT x the AVERAGE share, as the exact
    # cross-multiplication value*n > mult*total (all DECIMAL/integer)
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("_value") * F.col("_n")
            > _Q11_SHARE_MULT * F.col("_total")
        )
        .select(
            "ps_partkey",
            F.round(F.col("_value").cast("double"), 2).alias("value"),
        )
    )


_Q12_START, _Q12_END = "1997-01-01", "1998-01-01"
_Q12_HIGH = ["1-URGENT", "2-HIGH"]


@query(
    "tpch_q12_late_shipment_priority",
    f"""
SELECT l_returnflag AS ship_class,
       CAST(SUM(CASE WHEN o_orderpriority IN
                ({", ".join(f"'{p}'" for p in _Q12_HIGH)})
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN
                ({", ".join(f"'{p}'" for p in _Q12_HIGH)})
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND l_shipdate >= TIMESTAMP '{_Q12_START}'
  AND l_shipdate <  TIMESTAMP '{_Q12_END}'
GROUP BY l_returnflag
""",
)
def _tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipmode priority: l_returnflag stands in for l_shipmode and
    "late" is l_shipdate > o_orderdate + 30 days (receipt/commit dates
    absent).  The year filter pushes to the lineitem scan; the
    order-priority CASE pair is one conditional aggregate over the single
    orderkey equi-join — map-side partial counts, one shuffle on the
    3-value grouping key."""
    li = load_table(spark, sf_dir, "lineitem", spread=True).filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit(_Q12_START)))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit(_Q12_END)))
    )
    orders = load_table(spark, sf_dir, "orders", spread=True).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin(_Q12_HIGH)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        )
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


_Q20_REGION_KEY = 3
_Q20_PATTERN = "blue"
_Q20_YEAR_START, _Q20_YEAR_END = "1997-01-01", "1998-01-01"


@query(
    "tpch_q20_dominant_suppliers",
    f"""
WITH sold AS (
    SELECT l_partkey, l_suppkey,
           SUM({_Q9_QTY_DEC}) AS supp_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{_Q20_YEAR_START}'
      AND l_shipdate <  TIMESTAMP '{_Q20_YEAR_END}'
      AND l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE '{_Q20_PATTERN}%'
      )
    GROUP BY l_partkey, l_suppkey
),
per_part AS (
    SELECT l_partkey, SUM(supp_qty) AS part_qty
    FROM sold GROUP BY l_partkey
),
dominant AS (
    SELECT DISTINCT l_suppkey
    FROM sold JOIN per_part USING (l_partkey)
    WHERE supp_qty * 2 > part_qty
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_regionkey = {_Q20_REGION_KEY}
  AND s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s_name
""",
)
def _tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20's nested correlated-aggregate IN chain (availqty > half the
    part's sold quantity) decorrelates to: per-(part,supplier) quantity
    agg -> per-part total agg (a second, already-tiny shuffle) -> the
    exact cross-multiplication supp_qty*2 > part_qty -> left-semi into
    the nation-filtered supplier dim.  The name-pattern part filter
    broadcasts into the fact scan, so the only fact-sized shuffle is the
    (part, supplier) aggregate."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like(f"{_Q20_PATTERN}%"))
        .select("p_partkey")
    )
    qty_dec = F.col("l_quantity").cast("string").cast("decimal(18,2)")
    li = load_table(spark, sf_dir, "lineitem", spread=True).filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit(_Q20_YEAR_START)))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit(_Q20_YEAR_END)))
    )
    sold = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(qty_dec).alias("supp_qty"))
    )
    per_part = sold.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    dominant = (
        sold.join(per_part, sold.l_partkey == per_part._pk)
        .filter(F.col("supp_qty") * 2 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation").filter(
                F.col("n_regionkey") == _Q20_REGION_KEY
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    return (
        sup.join(dominant, sup.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Referential-integrity profile (the Deequ-style FK audit): orphan
# children (facts whose parent key is missing — broadcast anti-joins
# against the distinct parent keys) and childless parents (dimension
# rows no fact references — anti-join the other way).  Each relation is
# one pushdown-projected scan pair; counts are exact.
# ---------------------------------------------------------------------------
@query(
    "dq_referential_integrity",
    """
SELECT * FROM (
    SELECT 'lineitem->orders' AS relation,
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
               AS BIGINT) AS n_orphans,
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'orders->customer',
           CAST((SELECT COUNT(*) FROM orders
                 WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
               AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'orders_without_lineitems',
           CAST((SELECT COUNT(*) FROM orders
                 WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem))
               AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'customers_without_orders',
           CAST((SELECT COUNT(*) FROM customer
                 WHERE c_custkey NOT IN (SELECT o_custkey FROM orders))
               AS BIGINT),
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT)
)
""",
)
def _dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True).select(
        "l_orderkey"
    )
    orders = load_table(spark, sf_dir, "orders", spread=True).select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")

    def _count_pair(name, child, anti):
        return child.join(anti[0], anti[1], "left_anti").agg(
            F.lit(name).alias("relation"),
            F.count("*").alias("n_orphans"),
        ).crossJoin(
            F.broadcast(child.agg(F.count("*").alias("n_rows")))
        )

    rel1 = _count_pair(
        "lineitem->orders",
        li,
        (orders, li.l_orderkey == orders.o_orderkey),
    )
    rel2 = _count_pair(
        "orders->customer",
        orders,
        (F.broadcast(cust), orders.o_custkey == cust.c_custkey),
    )
    rel3 = _count_pair(
        "orders_without_lineitems",
        orders,
        (li, orders.o_orderkey == li.l_orderkey),
    )
    rel4 = _count_pair(
        "customers_without_orders",
        cust,
        (orders, cust.c_custkey == orders.o_custkey),
    )
    return rel1.unionByName(rel2).unionByName(rel3).unionByName(rel4)


# ---------------------------------------------------------------------------
# HLL++ error-bound gate: Spark's approx_count_distinct is a register-
# max merge, so its estimate is DETERMINISTIC for a given dataset under
# ANY partitioning — only the oracle cannot REPRODUCE it.  The gate
# therefore emits the exact distinct count plus the boolean "HLL within
# 5% of exact"; the oracle computes the exact count and asserts the
# boolean literally.  A drifting or broken sketch flips Spark's boolean
# to FALSE and hash-fails the gate — a one-sided but falsifiable bound,
# the same pattern the KMV sketch is held to in pytest.
# ---------------------------------------------------------------------------
@query(
    "sketch_hll_within_bounds",
    """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
       TRUE AS hll_within_5pct
FROM events GROUP BY event_type
""",
)
def _sketch_hll_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", spread=True)
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct"),
        F.approx_count_distinct("user_id", 0.02).alias("_hll"),
    )
    err = F.abs(F.col("_hll") - F.col("exact_distinct")).cast("double")
    return agg.select(
        "event_type",
        "exact_distinct",
        (err <= 0.05 * F.col("exact_distinct").cast("double")).alias(
            "hll_within_5pct"
        ),
    )


# ---------------------------------------------------------------------------
# MapType surface: the JSON props column parsed into a map, exploded to
# (key, value) rows, aggregated per key — map_keys/explode coverage the
# struct-typed JSON gate (events_json_props) does not touch.
# ---------------------------------------------------------------------------
@query(
    "events_props_map",
    """
SELECT k AS prop_key,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(v AS BIGINT)) AS BIGINT) AS total,
       CAST(MIN(CAST(v AS BIGINT)) AS BIGINT) AS min_v,
       CAST(MAX(CAST(v AS BIGINT)) AS BIGINT) AS max_v
FROM (
    -- this DuckDB build ships json scalar fns but not the json_each
    -- table fn; the synthetic props are single-key objects, so the
    -- regexp image is the exact (key, value) explode
    SELECT regexp_extract(props, '"([^"]+)"', 1) AS k,
           regexp_extract(props, ': *(-?[0-9]+)', 1) AS v
    FROM events WHERE props IS NOT NULL
)
GROUP BY k
""",
)
def _events_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", spread=True).filter(
        F.col("props").isNotNull()
    )
    m = ev.select(
        F.from_json("props", "map<string,bigint>").alias("_m")
    )
    kv = m.select(F.explode("_m").alias("prop_key", "_v"))
    return kv.groupBy("prop_key").agg(
        F.count("*").alias("n"),
        F.sum("_v").alias("total"),
        F.min("_v").alias("min_v"),
        F.max("_v").alias("max_v"),
    )


# ---------------------------------------------------------------------------
# Chi-square test of independence over the l_returnflag x l_linestatus
# contingency table — the categorical-association stat every data-quality
# / drift-detection pipeline computes.  Scale shape: ONE fact aggregate
# reduces 100 TB to <= |domain_r| x |domain_c| cells; row/col/grand
# totals are second-level aggregates of the CELL table (two-pass
# broadcast idiom, no empty-partition window funnel); everything after
# the first agg runs on cell-count-sized data.  Exactness: the deviation
# (obs*N - row*col) is exact BIGINT (safe while obs*N < 2^63 — beyond
# ~3e9 rows promote the products to DECIMAL(38,0)); the per-cell
# contribution ((obs*N - r*c)^2 / (N*r*c), algebraically identical to
# (O-E)^2/E) is one fixed IEEE chain both engines replay bit for bit.
# ---------------------------------------------------------------------------
@query(
    "stats_chisq_independence",
    f"""
WITH cells AS (
    SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS obs
    FROM lineitem GROUP BY l_returnflag, l_linestatus
),
rt AS (SELECT l_returnflag, CAST(SUM(obs) AS BIGINT) AS row_total
       FROM cells GROUP BY l_returnflag),
ct AS (SELECT l_linestatus, CAST(SUM(obs) AS BIGINT) AS col_total
       FROM cells GROUP BY l_linestatus),
nt AS (SELECT CAST(SUM(obs) AS BIGINT) AS n_total FROM cells)
SELECT c.l_returnflag, c.l_linestatus, c.obs, rt.row_total, ct.col_total,
       {_round_sql(
           'CAST(c.obs * nt.n_total - rt.row_total * ct.col_total'
           ' AS DOUBLE)'
           ' * CAST(c.obs * nt.n_total - rt.row_total * ct.col_total'
           ' AS DOUBLE)'
           ' / CAST(nt.n_total * rt.row_total * ct.col_total AS DOUBLE)',
           6,
       )} AS chi2_contrib
FROM cells c
JOIN rt USING (l_returnflag)
JOIN ct USING (l_linestatus)
CROSS JOIN nt
""",
)
def _chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.stats import chisq_cells

    li = load_table(spark, sf_dir, "lineitem", spread=True)
    return chisq_cells(li, "l_returnflag", "l_linestatus")


# ---------------------------------------------------------------------------
# Item-item co-occurrence cosine ("bought X also bought Y") at customer
# basket grain over orders x lineitem — pair generation is a basket-keyed
# self-equi-join (pairs only materialize WITHIN a basket), support counts
# stay exact BIGINT, the cosine is one sqrt + one division, and the top-k
# window is the only rank.  See functions/reco.py.
# ---------------------------------------------------------------------------
@query(
    "reco_item_cosine",
    f"""
WITH b AS (
    SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
n AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1),
co AS (
    SELECT a.p AS item_i, b2.p AS item_j,
           CAST(COUNT(*) AS BIGINT) AS co_baskets
    FROM b a JOIN b b2 ON a.c = b2.c AND a.p <> b2.p
    GROUP BY 1, 2 HAVING COUNT(*) >= 3
),
sim AS (
    SELECT co.item_i, co.item_j, co.co_baskets,
           ni.n AS n_i, nj.n AS n_j,
           {{cosine}} AS cosine
    FROM co JOIN n ni ON co.item_i = ni.p JOIN n nj ON co.item_j = nj.p
)
SELECT item_i, item_j, co_baskets, n_i, n_j, cosine,
       CAST(rn AS INTEGER) AS sim_rank
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY item_i
        ORDER BY cosine DESC, co_baskets DESC, item_j ASC
    ) AS rn FROM sim
) WHERE rn <= 5
""".format(
        cosine=_round_sql(
            "CAST(co.co_baskets AS DOUBLE)"
            " / sqrt(CAST(ni.n * nj.n AS DOUBLE))",
            9,
        )
    ),
)
def _reco_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.reco import item_cosine_similarity

    li = load_table(spark, sf_dir, "lineitem", spread=True).select(
        "l_orderkey", "l_partkey"
    )
    orders = load_table(spark, sf_dir, "orders", spread=True).select(
        "o_orderkey", "o_custkey"
    )
    baskets = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).select(
        F.col("o_custkey").alias("basket"), F.col("l_partkey").alias("item")
    )
    return item_cosine_similarity(
        baskets, "basket", "item", min_support=3, top_k=5
    )


# ---------------------------------------------------------------------------
# Point-in-time join (feature-store temporal correctness): purchases
# enriched with the signup/error status interval valid AT purchase time —
# union + per-key running-last window, ONE user-keyed shuffle, no range
# join, gap/pre-history facts get NULLs.  See operators/pit.py.
# ---------------------------------------------------------------------------
@query(
    "join_point_in_time",
    """
WITH changes AS (
    SELECT user_id, event_type AS state, ts, event_id,
           ROW_NUMBER() OVER (
               PARTITION BY user_id, ts ORDER BY event_id DESC
           ) AS rn
    FROM events
    WHERE user_id % 20 = 0 AND event_type IN ('signup', 'error')
),
dim AS (
    SELECT user_id, state, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
    FROM changes WHERE rn = 1
),
facts AS (
    SELECT event_id, user_id, ts FROM events
    WHERE user_id % 20 = 0 AND event_type = 'purchase'
)
SELECT f.event_id, f.user_id, f.ts,
       CASE WHEN d.valid_to IS NULL OR f.ts < d.valid_to
            THEN d.state END AS state,
       CASE WHEN d.valid_to IS NULL OR f.ts < d.valid_to
            THEN d.valid_from END AS pit_from
FROM facts f
ASOF LEFT JOIN dim d ON f.user_id = d.user_id AND f.ts >= d.valid_from
""",
)
def _join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pit import point_in_time_join

    ev = load_table(spark, sf_dir, "events", spread=True).filter(
        F.col("user_id") % 20 == 0
    )
    changes = (
        ev.filter(F.col("event_type").isin("signup", "error"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy(
                    F.desc("event_id")
                )
            ),
        )
        .filter(F.col("_rn") == 1)
    )
    dim = changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts")
        .over(Window.partitionBy("user_id").orderBy("ts"))
        .alias("valid_to"),
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return point_in_time_join(
        facts, dim, ["user_id"], fact_ts="ts"
    ).withColumnRenamed("_pit_from", "pit_from")


# ---------------------------------------------------------------------------
# Hierarchical share-of-parent: nation revenue share and rank within its
# region — exact decimal money math at full product scale, share/rank as
# windows over the 25-row post-agg frame.  See
# functions/stats.py::share_of_parent.
# ---------------------------------------------------------------------------
@query(
    "agg_share_of_parent",
    f"""
WITH rev AS (
    SELECT r_name AS region, n_name AS nation,
           CAST(SUM({_REV_SQL}) AS DECIMAL(30,4)) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY 1, 2
)
SELECT region, nation,
       CAST(revenue AS DOUBLE) AS revenue,
       {{share}} AS share_pct,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY region ORDER BY revenue DESC, nation
       ) AS INTEGER) AS rank_in_parent
FROM rev
""".format(
        share=_round_sql(
            "(CAST(revenue AS DOUBLE) * 100.0)"
            " / CAST(SUM(revenue) OVER (PARTITION BY region) AS DOUBLE)",
            9,
        )
    ),
)
def _share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.stats import share_of_parent

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders", spread=True)
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(_rev_col()).cast("decimal(30,4)").alias("revenue"))
    )
    # share/rank are computed from the EXACT decimal revenue inside
    # share_of_parent; only the output boundary crosses to double
    # (driver-safe — raw DECIMAL output columns hash-fail at the driver)
    return share_of_parent(rev, "region", "nation", "revenue").withColumn(
        "revenue", F.col("revenue").cast("double")
    )


# ---------------------------------------------------------------------------
# Pairwise association rules over the same customer-basket frame as
# reco_item_cosine: support / confidence / lift as exact-BIGINT
# rationals, one division each.  See functions/reco.py::association_rules.
# ---------------------------------------------------------------------------
@query(
    "reco_association_rules",
    f"""
WITH b AS (
    SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
tot AS (SELECT CAST(COUNT(DISTINCT c) AS BIGINT) AS n_baskets FROM b),
n AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1),
co AS (
    SELECT a.p AS item_i, b2.p AS item_j,
           CAST(COUNT(*) AS BIGINT) AS co_baskets
    FROM b a JOIN b b2 ON a.c = b2.c AND a.p <> b2.p
    GROUP BY 1, 2 HAVING COUNT(*) >= 3
)
SELECT item_i, item_j, co_baskets, n_i, n_j, n_baskets,
       confidence, lift
FROM (
    SELECT co.item_i, co.item_j, co.co_baskets,
           ni.n AS n_i, nj.n AS n_j, tot.n_baskets,
           {{conf}} AS confidence,
           {{lift}} AS lift
    FROM co
    JOIN n ni ON co.item_i = ni.p
    JOIN n nj ON co.item_j = nj.p
    CROSS JOIN tot
)
WHERE confidence >= 0.2
""".format(
        conf=_round_sql(
            "CAST(co.co_baskets AS DOUBLE) / CAST(ni.n AS DOUBLE)", 9
        ),
        lift=_round_sql(
            "CAST(co.co_baskets * tot.n_baskets AS DOUBLE)"
            " / CAST(ni.n * nj.n AS DOUBLE)",
            9,
        ),
    ),
)
def _association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.reco import association_rules

    li = load_table(spark, sf_dir, "lineitem", spread=True).select(
        "l_orderkey", "l_partkey"
    )
    orders = load_table(spark, sf_dir, "orders", spread=True).select(
        "o_orderkey", "o_custkey"
    )
    baskets = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).select(
        F.col("o_custkey").alias("basket"), F.col("l_partkey").alias("item")
    )
    return association_rules(
        baskets, "basket", "item", min_support=3, min_confidence=0.2
    )


# ---------------------------------------------------------------------------
# Incremental SCD-2 merge == full rebuild: the dimension built from
# pre-Jan-16 changes, merged with the post-Jan-16 batch, must equal the
# SCD-2 build over the whole stream row-for-row — the oracle IS the full
# rebuild.  Unaffected keys stream through untouched.  See
# operators/scd2.py.
# ---------------------------------------------------------------------------
@query(
    "scd2_incremental_merge",
    """
SELECT user_id,
       event_type AS state,
       ts AS valid_from,
       LEAD(ts) OVER w AS valid_to,
       LEAD(ts) OVER w IS NULL AS is_current,
       event_id AS change_id
FROM events
WHERE user_id % 20 = 0
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def _scd2_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd2 import scd2_merge

    ev = load_table(spark, sf_dir, "events", spread=True).filter(
        F.col("user_id") % 20 == 0
    )
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    old = ev.filter(F.col("ts") < cut)
    nxt = F.lead("ts").over(w)
    dim0 = old.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        F.col("event_id").alias("change_id"),
    )
    batch = ev.filter(F.col("ts") >= cut).select(
        "user_id",
        F.col("event_type").alias("state"),
        "ts",
        F.col("event_id").alias("change_id"),
    )
    return scd2_merge(
        dim0,
        batch,
        "user_id",
        batch_ts_col="ts",
        batch_state_col="state",
        batch_id_col="change_id",
    )


# ---------------------------------------------------------------------------
# dbt-style declarative DQ test suite: unique / not_null /
# accepted_values / relationship checks, each ONE counting pass (the
# relationship check an anti-join), unioned into a metadata-scale
# report.  An accepted_values check is deliberately configured to FAIL
# ('P' excluded) so the gate proves violations are counted, not just
# zeros.  See functions/profile.py::run_quality_checks.
# ---------------------------------------------------------------------------
@query(
    "dq_test_suite",
    """
SELECT 'unique__orders__o_orderkey' AS check_name,
       'orders' AS table_name, 'o_orderkey' AS column_name,
       CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS n_violations,
       COALESCE(SUM(n - 1), 0) = 0 AS passed
FROM (SELECT COUNT(*) AS n FROM orders
      WHERE o_orderkey IS NOT NULL GROUP BY o_orderkey)
UNION ALL
SELECT 'not_null__orders__o_custkey', 'orders', 'o_custkey',
       CAST(COUNT(*) FILTER (o_custkey IS NULL) AS BIGINT),
       COUNT(*) FILTER (o_custkey IS NULL) = 0
FROM orders
UNION ALL
SELECT 'accepted_values__orders__o_orderstatus', 'orders',
       'o_orderstatus',
       CAST(COUNT(*) FILTER (
           o_orderstatus IS NOT NULL
           AND o_orderstatus NOT IN ('O', 'F')) AS BIGINT),
       COUNT(*) FILTER (
           o_orderstatus IS NOT NULL
           AND o_orderstatus NOT IN ('O', 'F')) = 0
FROM orders
UNION ALL
SELECT 'relationship__orders__o_custkey', 'orders', 'o_custkey',
       CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
FROM orders o
WHERE o.o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'relationship__lineitem__l_orderkey', 'lineitem', 'l_orderkey',
       CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
FROM lineitem l
WHERE l.l_orderkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = l.l_orderkey)
""",
)
def _dq_test_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.profile import run_quality_checks

    tables = {
        "orders": load_table(spark, sf_dir, "orders", spread=True),
        "customer": load_table(spark, sf_dir, "customer"),
        "lineitem": load_table(spark, sf_dir, "lineitem", spread=True),
    }
    checks = [
        {"kind": "unique", "table": "orders", "column": "o_orderkey"},
        {"kind": "not_null", "table": "orders", "column": "o_custkey"},
        # 'P' deliberately excluded: the suite must COUNT violations
        {"kind": "accepted_values", "table": "orders",
         "column": "o_orderstatus", "values": ["O", "F"]},
        {"kind": "relationship", "table": "orders", "column": "o_custkey",
         "to": "customer", "to_column": "c_custkey"},
        {"kind": "relationship", "table": "lineitem",
         "column": "l_orderkey", "to": "orders",
         "to_column": "o_orderkey"},
    ]
    return run_quality_checks(tables, checks)


# ---------------------------------------------------------------------------
# Open-order aging report: the classic warehouse backlog readout.  The
# snapshot date is the data's own max order date (as-of semantics, no
# wall clock); age buckets are exact day arithmetic; money sums go
# through the VARCHAR->DECIMAL bridge so the totals are exact.
# ---------------------------------------------------------------------------
@query(
    "orders_aging_buckets",
    f"""
WITH snap AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS s FROM orders),
open_o AS (
    SELECT o_orderpriority AS priority,
           date_diff('day', CAST(o_orderdate AS DATE), s) AS age,
           CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(24,6)) AS v
    FROM orders, snap
    WHERE o_orderstatus <> 'F'
),
b AS (
    SELECT priority,
           CASE WHEN age <= 30 THEN '0-30'
                WHEN age <= 60 THEN '31-60'
                WHEN age <= 90 THEN '61-90'
                ELSE '90+' END AS age_bucket,
           v
    FROM open_o
)
SELECT priority, age_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {_round_sql("CAST(SUM(v) AS DOUBLE)", 2)} AS total_value
FROM b GROUP BY 1, 2
""",
)
def _orders_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders", spread=True).filter(
        F.col("o_orderstatus") != "F"
    )
    snap = load_table(spark, sf_dir, "orders").agg(
        F.max(F.to_date("o_orderdate")).alias("_s")
    )
    age = F.datediff(F.col("_s"), F.to_date("o_orderdate"))
    bucket = (
        F.when(age <= 30, "0-30")
        .when(age <= 60, "31-60")
        .when(age <= 90, "61-90")
        .otherwise("90+")
    )
    return (
        o.crossJoin(F.broadcast(snap))
        .select(
            F.col("o_orderpriority").alias("priority"),
            bucket.alias("age_bucket"),
            F.col("o_totalprice")
            .cast("string")
            .cast("decimal(24,6)")
            .alias("_v"),
        )
        .groupBy("priority", "age_bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("_v").cast("double"), 2).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Repeat-purchase curve: per order ordinal (a customer's 1st, 2nd,
# 3rd... order), how many customers reach it and the exact share of the
# customer base — the retention curve of the orders table.
# ---------------------------------------------------------------------------
@query(
    "orders_repeat_purchase",
    f"""
WITH ranked AS (
    SELECT o_custkey,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS DATE), o_orderkey
           ) AS ordinal
    FROM orders
),
base AS (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust
         FROM ranked),
curve AS (
    SELECT ordinal, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM ranked GROUP BY 1
)
SELECT CAST(ordinal AS INTEGER) AS ordinal, n_customers,
       {_round_sql("CAST(n_customers * 100 AS DOUBLE)"
                   " / CAST(n_cust AS DOUBLE)", 9)} AS pct_of_base
FROM curve, base
""",
)
def _repeat_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    o = load_table(spark, sf_dir, "orders", spread=True)
    w = _W.partitionBy("o_custkey").orderBy(
        F.to_date("o_orderdate"), "o_orderkey"
    )
    ranked = o.select(
        "o_custkey", F.row_number().over(w).alias("ordinal")
    )
    base = ranked.agg(
        F.countDistinct("o_custkey").alias("n_cust")
    )
    curve = ranked.groupBy("ordinal").agg(
        F.count("*").alias("n_customers")
    )
    return curve.crossJoin(F.broadcast(base)).select(
        F.col("ordinal").cast("int").alias("ordinal"),
        "n_customers",
        F.round(
            (F.col("n_customers") * 100).cast("double")
            / F.col("n_cust").cast("double"),
            9,
        ).alias("pct_of_base"),
    )


# ---------------------------------------------------------------------------
# ABC inventory classification: parts ranked by exact-decimal revenue,
# bucketed by cumulative revenue share (A <= 80% < B <= 95% < C) — the
# Pareto workhorse of inventory/SKU analysis.  The cumulative share
# comparison is decimal-exact (no float cumsum): cum_revenue and
# total_revenue are exact DECIMAL sums, and the A/B/C cut compares
# cum * 100 <= total * threshold in DECIMAL.
# ---------------------------------------------------------------------------
@query(
    "lineitem_abc_classification",
    f"""
WITH rev AS (
    SELECT l_partkey,
           SUM(CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(24,6))
               * (1 - CAST(CAST(l_discount AS VARCHAR) AS DECIMAL(24,6))))
               AS revenue
    FROM lineitem GROUP BY 1
),
t AS (SELECT SUM(revenue) AS total FROM rev),
c AS (
    SELECT l_partkey, revenue,
           SUM(revenue) OVER (
               ORDER BY revenue DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum
    FROM rev
)
SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A'
            WHEN cum * 100 <= total * 95 THEN 'B'
            ELSE 'C' END AS abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       {_round_sql("CAST(SUM(revenue) AS DOUBLE)", 2)} AS class_revenue
FROM c, t GROUP BY 1
""",
)
def _abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    li = load_table(spark, sf_dir, "lineitem", spread=True)
    dec = lambda c: F.col(c).cast("string").cast("decimal(24,6)")  # noqa: E731
    rev = li.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias(
            "revenue"
        )
    )
    t = rev.agg(F.sum("revenue").alias("total"))
    w = (
        _W.orderBy(F.desc("revenue"), F.asc("l_partkey"))
        .rowsBetween(_W.unboundedPreceding, _W.currentRow)
    )
    c = rev.withColumn("cum", F.sum("revenue").over(w)).crossJoin(
        F.broadcast(t)
    )
    abc = (
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
    )
    return c.groupBy(abc.alias("abc_class")).agg(
        F.count("*").alias("n_parts"),
        F.round(F.sum("revenue").cast("double"), 2).alias("class_revenue"),
    )


# ---------------------------------------------------------------------------
# Shipping SLA compliance: share of orders whose FIRST lineitem ships
# within 30 days, by priority — the order-fulfilment health readout.
# One orderkey-keyed min-shipdate aggregate + an order join; exact
# day arithmetic and integer shares.
# ---------------------------------------------------------------------------
@query(
    "orders_sla_compliance",
    f"""
WITH first_ship AS (
    SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS ship0
    FROM lineitem GROUP BY 1
),
j AS (
    SELECT o.o_orderpriority AS priority,
           CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE), f.ship0)
                     <= 30
                THEN 1 ELSE 0 END AS ok
    FROM orders o JOIN first_ship f ON o.o_orderkey = f.l_orderkey
)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(ok) AS BIGINT) AS n_within_sla,
       {_round_sql("CAST(SUM(ok) * 100 AS DOUBLE)"
                   " / CAST(COUNT(*) AS DOUBLE)", 9)} AS sla_pct
FROM j GROUP BY 1
""",
)
def _sla_compliance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    o = load_table(spark, sf_dir, "orders", spread=True)
    first_ship = li.groupBy("l_orderkey").agg(
        F.min(F.to_date("l_shipdate")).alias("ship0")
    )
    j = o.join(first_ship, o["o_orderkey"] == first_ship["l_orderkey"]).select(
        F.col("o_orderpriority").alias("priority"),
        (
            F.datediff("ship0", F.to_date("o_orderdate")) <= 30
        ).cast("int").alias("ok"),
    )
    return j.groupBy("priority").agg(
        F.count("*").alias("n_orders"),
        F.sum("ok").cast("bigint").alias("n_within_sla"),
        F.round(
            (F.sum("ok") * 100).cast("double") / F.count("*").cast("double"),
            9,
        ).alias("sla_pct"),
    )


# ---------------------------------------------------------------------------
# Supplier scorecard: revenue (exact DECIMAL), line volume, return rate,
# and revenue dense-rank within nation — the composite vendor-management
# readout.  One lineitem supplier-keyed aggregate + a broadcast supplier
# dim join; rank windows run over the supplier-level aggregate.
# ---------------------------------------------------------------------------
@query(
    "supplier_scorecard",
    f"""
WITH li AS (
    SELECT l_suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           SUM(CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(24,6))
               * (1 - CAST(CAST(l_discount AS VARCHAR) AS DECIMAL(24,6))))
               AS revenue,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returned
    FROM lineitem GROUP BY 1
)
SELECT s.s_suppkey AS suppkey, s.s_name AS name,
       s.s_nationkey AS nationkey,
       li.n_lines, li.n_returned,
       {_round_sql("CAST(li.n_returned * 100 AS DOUBLE)"
                   " / CAST(li.n_lines AS DOUBLE)", 9)} AS return_pct,
       {_round_sql("CAST(li.revenue AS DOUBLE)", 2)} AS revenue,
       CAST(DENSE_RANK() OVER (
           PARTITION BY s.s_nationkey
           ORDER BY li.revenue DESC, s.s_suppkey
       ) AS INTEGER) AS nation_revenue_rank
FROM li JOIN supplier s ON li.l_suppkey = s.s_suppkey
""",
)
def _supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    li = load_table(spark, sf_dir, "lineitem", spread=True)
    s = load_table(spark, sf_dir, "supplier")
    dec = lambda c: F.col(c).cast("string").cast("decimal(24,6)")  # noqa: E731
    agg = li.groupBy("l_suppkey").agg(
        F.count("*").alias("n_lines"),
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias(
            "_revenue"
        ),
        F.count_if(F.col("l_returnflag") == "R").alias("n_returned"),
    )
    j = agg.join(
        F.broadcast(s), agg["l_suppkey"] == s["s_suppkey"]
    )
    w = _W.partitionBy("s_nationkey").orderBy(
        F.desc("_revenue"), F.asc("s_suppkey")
    )
    return j.select(
        F.col("s_suppkey").alias("suppkey"),
        F.col("s_name").alias("name"),
        F.col("s_nationkey").alias("nationkey"),
        "n_lines",
        "n_returned",
        F.round(
            (F.col("n_returned") * 100).cast("double")
            / F.col("n_lines").cast("double"),
            9,
        ).alias("return_pct"),
        F.round(F.col("_revenue").cast("double"), 2).alias("revenue"),
        F.dense_rank().over(w).cast("int").alias("nation_revenue_rank"),
    )


# ---------------------------------------------------------------------------
# FIFO budget allocation (functions/temporal.py::fifo_allocate): each
# order's o_totalprice consumed against its lineitems in linenumber
# order — exact internal DECIMAL money math, driver-safe double
# boundary (the TPC-H closing pattern).
# ---------------------------------------------------------------------------
@query(
    "orders_fifo_allocation",
    """
WITH t AS (
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(CAST(l.l_extendedprice AS VARCHAR) AS DECIMAL(28,2)) AS amt,
           CAST(CAST(o.o_totalprice AS VARCHAR) AS DECIMAL(28,2)) AS bud
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
c AS (
    SELECT *,
           COALESCE(SUM(amt) OVER (
               PARTITION BY l_orderkey ORDER BY l_linenumber, amt
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), CAST('0' AS DECIMAL(28,2))) AS cum
    FROM t
),
a AS (
    SELECT *,
           LEAST(amt, GREATEST(bud - cum, CAST('0' AS DECIMAL(28,2))))
               AS alloc,
           GREATEST(bud - cum - amt, CAST('0' AS DECIMAL(28,2))) AS rem
    FROM c
)
SELECT l_orderkey, l_linenumber,
       ROUND(CAST(amt AS DOUBLE), 2) AS amount,
       ROUND(CAST(cum AS DOUBLE), 2) AS cum_before,
       ROUND(CAST(alloc AS DOUBLE), 2) AS allocated,
       ROUND(CAST(rem AS DOUBLE), 2) AS remaining_budget,
       alloc = amt AS fully_covered
FROM a
""",
)
def _orders_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.temporal import fifo_allocate

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = li.join(
        orders.select("o_orderkey", "o_totalprice"),
        li["l_orderkey"] == orders["o_orderkey"],
    )
    return fifo_allocate(
        joined,
        ["l_orderkey"],
        "l_linenumber",
        "l_extendedprice",
        "o_totalprice",
        scale=2,
    )


# ---------------------------------------------------------------------------
# Hilbert-curve clustering key (functions/layout.py::with_hilbert_key):
# the locality upgrade over events_zorder_key — consecutive keys are
# always ADJACENT (user, day) cells, so sorted file ranges cover tighter
# bounding boxes (Delta's HILBERT next to ZORDER).  The oracle is the
# generated round-for-round SQL twin; pytest pins both against the
# canonical xy2d reference and the adjacency property.
# ---------------------------------------------------------------------------
from ..functions.layout import (  # noqa: E402
    hilbert_key_sql,
    with_hilbert_key,
)


@query(
    "events_hilbert_key",
    hilbert_key_sql(
        "event_id",
        "user_id % 65536",
        "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)",
        "events",
    ),
)
def _events_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", spread=True).select(
        "event_id",
        (F.col("user_id") % 65536).alias("_x"),
        F.unix_date(F.to_date("ts")).alias("_y"),
    )
    return with_hilbert_key(
        ev, F.col("_x"), F.col("_y"), out="hkey"
    ).select("event_id", "hkey")
