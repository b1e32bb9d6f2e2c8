"""Dual-surface parity: every Spark-SQL text query must produce exactly the
rows (and column names) of its DataFrame-plan twin — SURVEY §3.3's promise
that users of the reference's SQL constants can run them verbatim-style with
``spark.sql`` while the engine's own plans stay DataFrame-first."""

import pytest

from nl_railtraffic_etl_pipeline_spark.plans import rail_queries as rq
from nl_railtraffic_etl_pipeline_spark.plans import sql_queries as sq
from nl_railtraffic_etl_pipeline_spark.plans.testdata import (
    disruptions_df,
    stations_df,
)

SF = "/root/testdata/sf0.001"

_DF_BUILDERS = {
    "rail_q1_rolling_trend": lambda s: rq.rolling_trend(disruptions_df(s, SF)),
    "rail_q2_station_severity": lambda s: rq.station_severity(
        disruptions_df(s, SF), stations_df(s, SF)
    ),
    "rail_q3_day_over_day": lambda s: rq.day_over_day(disruptions_df(s, SF)),
    "rail_q4_peak_hours": lambda s: rq.peak_hours(disruptions_df(s, SF)),
    "rail_q5_complex_analytics": lambda s: rq.complex_analytics(
        disruptions_df(s, SF)
    ),
    "rail_q6_overlapping": lambda s: rq.overlapping_disruptions(
        disruptions_df(s, SF)
    ),
}


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    sq.register_warehouse_views(spark, sf_dir=SF)


@pytest.mark.parametrize("name", sorted(sq.SQL_QUERIES))
def test_sql_text_matches_dataframe_plan(spark, name):
    got_df = spark.sql(sq.SQL_QUERIES[name])
    want_df = _DF_BUILDERS[name](spark)
    assert got_df.columns == want_df.columns, name
    got = sorted(map(tuple, got_df.collect()))
    want = sorted(map(tuple, want_df.collect()))
    assert got == want, name


def test_sql_surface_covers_all_six_reference_queries():
    assert sorted(sq.SQL_QUERIES) == [
        "rail_q1_rolling_trend",
        "rail_q2_station_severity",
        "rail_q3_day_over_day",
        "rail_q4_peak_hours",
        "rail_q5_complex_analytics",
        "rail_q6_overlapping",
    ]
