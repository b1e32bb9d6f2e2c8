"""End-to-end batch ETL: the Spark rebuild of ``ETLPipeline.run``.

Mirrors the reference's four stages (pipeline.py:52-79) with DataFrames as
the only IR and one action per sink (SURVEY §3.1):

    extract   archived payload / live fetch -> raw DataFrame
    transform 6-step cleaner (functions/cleaning.py)
    load      idempotent upserts into a parquet lake (operators/upsert.py)
    report    one-row aggregate (operators/rollup.py)

The lake layout is two parquet zones + the station dim:

    <lake>/raw_disruptions/   (disruption_id, raw_json, fetched_at)
    <lake>/disruptions/       cleaned 12-column table
"""

from __future__ import annotations

import datetime as _dt
import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.cleaning import clean
from .operators.rollup import run_report
from .operators.upsert import insert_ignore, upsert_latest_wins
from .schemas import CLEAN_DISRUPTION
from .sources.json_source import read_payload

logger = logging.getLogger(__name__)


class SparkETLPipeline:
    """extract -> transform -> load -> report over a parquet lake."""

    def __init__(self, spark: SparkSession, lake_path: str):
        self.spark = spark
        self.lake = lake_path.rstrip("/")

    # -- stage 1: extract ---------------------------------------------------
    def extract(self, payload_path: str) -> DataFrame:
        df = read_payload(self.spark, payload_path)
        # Skip records with falsy id during raw load (pipeline.py:147-149).
        return df.filter(F.col("id").isNotNull() & (F.col("id") != ""))

    # -- stage 2: transform -------------------------------------------------
    def transform(self, raw: DataFrame, run_ts: _dt.datetime) -> DataFrame:
        return clean(raw, run_ts)

    # -- stage 3: load ------------------------------------------------------
    def _read_zone(self, name: str, like: DataFrame) -> DataFrame:
        path = f"{self.lake}/{name}"
        if os.path.exists(path):
            return self.spark.read.parquet(path)
        return self.spark.createDataFrame([], like.schema)

    def load(self, raw: DataFrame, cleaned: DataFrame, run_ts: _dt.datetime) -> dict:
        """Idempotent dual load: insert-ignore raw zone, latest-wins clean zone."""
        raw_rows = raw.select(
            F.col("id").alias("disruption_id"),
            F.to_json(F.struct(*[c for c in raw.columns if c != "_corrupt_record"])).alias(
                "raw_json"
            ),
            F.lit(run_ts).alias("fetched_at"),
        )
        raw_existing = self._read_zone("raw_disruptions", raw_rows)
        merged_raw = insert_ignore(raw_existing, raw_rows, ["disruption_id"])
        raw_total = self._overwrite("raw_disruptions", merged_raw)

        clean_existing = self._read_zone(
            "disruptions", self.spark.createDataFrame([], CLEAN_DISRUPTION)
        )
        merged_clean = upsert_latest_wins(
            clean_existing, cleaned, ["disruption_id"], "updated_at"
        )
        clean_total = self._overwrite("disruptions", merged_clean)
        return {"raw_total": raw_total, "clean_total": clean_total}

    def _overwrite(self, name: str, df: DataFrame) -> int:
        """Stage-then-swap overwrite (parquet reads are lazy; writing over the
        input path directly would corrupt it mid-read).  Returns the final
        row count, taken from the swapped files — the merged plan's lineage
        still points at the pre-overwrite input and must not be re-executed.
        """
        path, tmp = f"{self.lake}/{name}", f"{self.lake}/{name}__stage"
        df.write.mode("overwrite").parquet(tmp)
        staged = self.spark.read.parquet(tmp)
        staged.write.mode("overwrite").parquet(path)
        count = self.spark.read.parquet(path).count()
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        return count

    # -- stage 4: report ----------------------------------------------------
    def report(self, as_of_date=None) -> DataFrame:
        return run_report(
            self.spark.read.parquet(f"{self.lake}/disruptions"), as_of_date
        )

    # -- orchestration ------------------------------------------------------
    def run(self, payload_path: str, run_ts: _dt.datetime | None = None) -> dict:
        run_ts = run_ts or _dt.datetime.now(_dt.timezone.utc)
        raw = self.extract(payload_path)
        if raw.isEmpty():
            logger.warning("no data extracted; stopping run")
            return {"raw_total": 0, "clean_total": 0}
        cleaned = self.transform(raw, run_ts)
        stats = self.load(raw, cleaned, run_ts)
        stats["report"] = self.report(run_ts.date()).collect()[0].asDict()
        return stats
