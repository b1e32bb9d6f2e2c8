"""SparkSession factory.

The reference pipeline delegates execution to SQLite/PostgreSQL/Athena; here
the single engine is Spark, so session configuration is the engine
configuration.  Defaults are chosen for correctness-first local runs but keep
every knob that matters on a real cluster:

- UTC session timezone (the reference normalizes all timestamps to UTC,
  ``src/transformation/cleaners.py:94``).
- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  dynamic broadcast — the mechanisms that keep the same plans healthy at
  100 TB without re-tuning.
- Arrow enabled for the few Pandas-UDF paths (similarity / multimodal).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "nl_railtraffic_etl_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    On a real cluster ``master`` comes from spark-submit; locally we default
    to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Dimension tables (stations, nation, region) stay far under this;
        # Catalyst then plans broadcast joins with no shuffle of the fact side.
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # The synthetic events table stores TIMESTAMP(NANOS) parquet, which
        # Spark has no native type for: read as long and convert (testdata.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "90g"))
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
