"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship rolling-trend query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full registry from
``nl_railtraffic_etl_pipeline_spark.plans.registry`` — one entry per
implemented operator from SURVEY.md §2/§2.12.  Every entry except ONE
carries a full DuckDB oracle (including the streaming sessionizer and
duplicate-clustering gates, via gaps-and-islands and recursive-CTE
reachability); ``text_compression_ratio`` is the deliberate rows-only
exception (DEFLATE is not SQL-expressible — pytest pins its semantics).
The committed ``CORRECTNESS_local_r6.json`` records the full 281-gate
oracle run at sf0.001/0.01/0.1: 280 hash-green + 1 rows-only per SF,
zero failures.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nl_railtraffic_etl_pipeline_spark.plans.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q1 rolling trend) on /root/testdata/sf0.001."""
    return QUERIES["rail_q1_rolling_trend"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
