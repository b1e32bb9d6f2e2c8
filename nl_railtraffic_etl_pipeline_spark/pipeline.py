"""End-to-end batch ETL: the Spark rebuild of ``ETLPipeline.run``.

Mirrors the reference's four stages (pipeline.py:52-79) with DataFrames as
the only IR and one action per sink (SURVEY §3.1):

    extract   archived payload / live fetch -> raw DataFrame
    transform 6-step cleaner (functions/cleaning.py)
    load      idempotent upserts into a parquet lake (operators/upsert.py)
    report    one-row aggregate (operators/rollup.py)

The lake layout is the reference warehouse's four tables
(``/root/reference/src/storage/schema.sql:7-57``) as parquet zones:

    <lake>/raw_disruptions/   (disruption_id, raw_json, fetched_at)
    <lake>/disruptions/       cleaned 12-column table
    <lake>/stations/          6-row seed dimension (schema.sql:79-86)
    <lake>/daily_stats/       per-date roll-up, rebuilt each run

All path probing and swaps go through the Hadoop FileSystem API, so the
same code runs against ``file://``, ``hdfs://`` or ``s3a://`` lakes (a
local ``os.path`` check would silently report remote zones as absent and
overwrite them with the bare batch).
"""

from __future__ import annotations

import datetime as _dt
import logging

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .functions.cleaning import clean
from .operators.rollup import build_daily_stats, run_report
from .operators.upsert import insert_ignore, upsert_latest_wins
from .schemas import CLEAN_DISRUPTION, RAW_DISRUPTION, STATIONS
from .sources.lake import write_csv_snapshot, write_raw_archive
from .sources.rest_datasource import register as register_rest_source

logger = logging.getLogger(__name__)

#: The reference's station seed (schema.sql:79-86), country default 'NL'
#: (schema.sql:41).
SEED_STATIONS = [
    ("ASD", "Amsterdam Centraal", "NL", 52.3791, 4.9003),
    ("UTR", "Utrecht Centraal", "NL", 52.0894, 5.1101),
    ("RTD", "Rotterdam Centraal", "NL", 51.9249, 4.4690),
    ("EHV", "Eindhoven Centraal", "NL", 51.4433, 5.4814),
    ("GVC", "Den Haag Centraal", "NL", 52.0808, 4.3247),
    ("LEDN", "Leiden Centraal", "NL", 52.1664, 4.4817),
]


class SparkETLPipeline:
    """extract -> transform -> load -> report over a parquet lake."""

    def __init__(self, spark: SparkSession, lake_path: str):
        self.spark = spark
        self.lake = lake_path.rstrip("/")

    # -- Hadoop FileSystem helpers (scheme-agnostic path ops) ---------------
    def _fs_path(self, path: str):
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return fs, hpath

    def _exists(self, path: str) -> bool:
        fs, hpath = self._fs_path(path)
        return fs.exists(hpath)

    # -- stage 1: extract ---------------------------------------------------
    def extract(self, payload_path: str) -> DataFrame:
        """Payload -> parsed frame CARRYING the verbatim record string.

        The ``ns_disruptions`` DataSource yields each record exactly as the
        reference's raw zone stores it (``json.dumps(item,
        ensure_ascii=False)``, reference pipeline.py:151) plus the falsy-id
        skip; the typed columns the cleaner consumes are a ``from_json``
        over that same string, so raw-zone archiving never re-serializes.
        """
        register_rest_source(self.spark)
        rows = (
            self.spark.read.format("ns_disruptions")
            .option("payload_path", payload_path)
            .load()
        )
        return rows.select(
            "raw_json", F.from_json("raw_json", RAW_DISRUPTION).alias("_rec")
        ).select("raw_json", "_rec.*")

    # -- stage 2: transform -------------------------------------------------
    def transform(self, raw: DataFrame, run_ts: _dt.datetime) -> DataFrame:
        return clean(raw, run_ts)

    def _recover_zone(self, name: str) -> None:
        """Finish an interrupted swap: a crash between delete and rename
        leaves the zone absent with the complete staged copy on disk —
        promote it.  (An orphaned stage NEXT TO a live zone is a crashed
        write before the swap began; the fresh write's overwrite replaces
        it, so only the target-missing case needs action.)"""
        path, tmp = f"{self.lake}/{name}", f"{self.lake}/{name}__stage"
        if not self._exists(path) and self._exists(tmp):
            logger.warning("recovering zone %s from staged copy", name)
            fs, target = self._fs_path(path)
            _, stage = self._fs_path(tmp)
            if not fs.rename(stage, target):
                raise IOError(f"zone recovery: failed to promote {tmp} -> {path}")

    # -- stage 3: load ------------------------------------------------------
    def _read_zone(self, name: str, like: DataFrame) -> DataFrame:
        self._recover_zone(name)
        path = f"{self.lake}/{name}"
        if self._exists(path):
            return self.spark.read.parquet(path)
        return self.spark.createDataFrame([], like.schema)

    def load(self, raw: DataFrame, cleaned: DataFrame, run_ts: _dt.datetime) -> dict:
        """Idempotent dual load: insert-ignore raw zone, latest-wins clean zone.

        The raw zone stores the VERBATIM record string when the extract
        carried one (``raw_json`` column); only parsed-only inputs (e.g.
        the archive file stream) fall back to re-serialization.
        """
        raw_json = (
            F.col("raw_json")
            if "raw_json" in raw.columns
            else F.to_json(
                F.struct(*[c for c in raw.columns if c != "_corrupt_record"])
            )
        )
        raw_rows = raw.select(
            F.col("id").alias("disruption_id"),
            raw_json.alias("raw_json"),
            F.lit(run_ts).alias("fetched_at"),
        )
        raw_existing = self._read_zone("raw_disruptions", raw_rows)
        # raw_json is the within-batch tiebreak: dropDuplicates alone would
        # keep an arbitrary survivor, breaking raw-zone reproducibility.
        merged_raw = insert_ignore(
            raw_existing, raw_rows, ["disruption_id"], order_col="raw_json"
        )
        clean_existing = self._read_zone(
            "disruptions", self.spark.createDataFrame([], CLEAN_DISRUPTION)
        )
        merged_clean = upsert_latest_wins(
            clean_existing, cleaned, ["disruption_id"], "updated_at"
        )
        # The two zone merges touch disjoint zones and share only the
        # checkpointed extract, so their write jobs are independent —
        # submit both and let the scheduler overlap them (guide §2.6:
        # the second job's tasks back-fill executors freed by the first
        # job's straggler tail, instead of idling through two serial
        # commit waits).
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_raw = pool.submit(self._overwrite, "raw_disruptions", merged_raw)
            f_clean = pool.submit(self._overwrite, "disruptions", merged_clean)
            return {
                "raw_total": f_raw.result(),
                "clean_total": f_clean.result(),
            }

    def ensure_stations(self, run_ts: _dt.datetime) -> int:
        """Seed the station dimension, ``INSERT ... ON CONFLICT DO NOTHING``
        semantics (schema.sql:79-86): existing rows win, new codes append.

        When the zone already holds every seed code the merge result is
        byte-identical to the existing zone, so the rewrite is skipped —
        the reference's ON CONFLICT DO NOTHING never rewrites the table
        either, and the anti-join emptiness probe is far cheaper than a
        full stage-write-swap of the dimension (returns 0, meaning "no
        rows written"; the return value has no consumers)."""
        seed = self.spark.createDataFrame(
            [(*row, run_ts) for row in SEED_STATIONS], STATIONS
        )
        existing = self._read_zone("stations", seed)
        if self._exists(f"{self.lake}/stations") and (
            seed.join(
                existing.select("station_code"), ["station_code"], "left_anti"
            ).isEmpty()
        ):
            return 0
        return self._overwrite(
            "stations", insert_ignore(existing, seed, ["station_code"])
        )

    def _overwrite(self, name: str, df: DataFrame) -> int:
        """Single-write stage + atomic rename swap.

        The merged plan's lineage reads the CURRENT zone files (parquet
        reads are lazy), so the zone cannot be overwritten in place.  The
        plan is written ONCE to a staging dir — the row count rides along
        as an ``observe`` metric, no second read — then the swap is two
        filesystem metadata ops (delete + rename; atomic on local/HDFS).
        A crash between them leaves the complete staged copy on disk for
        recovery (``__stage`` is only ever removed by the rename).  On
        rename-as-copy stores (S3A) a table format (Delta/Iceberg) replaces
        this swap; the call sites would not change.
        """
        path, tmp = f"{self.lake}/{name}", f"{self.lake}/{name}__stage"
        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "overwrite"
        ).parquet(tmp)
        fs, target = self._fs_path(path)
        _, stage = self._fs_path(tmp)
        # Hadoop FileSystem reports many delete/rename failures by returning
        # false, not throwing — a silent false here would leave the zone
        # deleted while the run still reports success (ADVICE r02).
        if fs.exists(target) and not fs.delete(target, True):
            raise IOError(f"zone swap: failed to delete {path}")
        if not fs.rename(stage, target):
            raise IOError(f"zone swap: failed to promote {tmp} -> {path}")
        return obs.get["rows"]

    # -- per-run side-effect artifacts --------------------------------------
    def write_run_artifacts(
        self, raw: DataFrame, cleaned: DataFrame, run_ts: _dt.datetime
    ) -> dict:
        """The reference's per-run side effects (reference pipeline.py:103-110,
        api_client.py:90-171), as lake artifacts:

        - ``archive/raw/``    S2/S3: date-prefixed verbatim raw archive.  The
          record string is carried byte-verbatim from the DataSource (never
          re-serialized) under the same ``YYYY/MM/DD`` layout the reference
          assembles by hand for S3.
        - ``archive/athena/`` S4: the Athena-facing JSONL dual-write — one
          compact JSON object per line, date-partitioned so the external
          table prunes day partitions.
        - ``processed/cleaned_<ts>/`` S5: single-file CSV snapshot of the
          cleaned batch with the UTF-8 BOM (``utf-8-sig``) for Excel-bound
          consumers.
        """
        stamp = run_ts.strftime("%Y%m%d_%H%M%S")
        paths = {
            "archive_raw": f"{self.lake}/archive/raw",
            "archive_athena": f"{self.lake}/archive/athena",
            "csv_snapshot": f"{self.lake}/processed/cleaned_{stamp}",
        }
        write_raw_archive(raw, paths["archive_raw"], run_ts, fmt="json")
        write_raw_archive(raw, paths["archive_athena"], run_ts, fmt="json")
        write_csv_snapshot(cleaned, paths["csv_snapshot"], bom=True)
        return paths

    # -- stage 4: report ----------------------------------------------------
    def report(self, as_of_date=None) -> DataFrame:
        return run_report(
            self.spark.read.parquet(f"{self.lake}/disruptions"), as_of_date
        )

    # -- orchestration ------------------------------------------------------
    def run(
        self,
        payload_path: str,
        run_ts: _dt.datetime | None = None,
        artifacts: bool = True,
    ) -> dict:
        run_ts = run_ts or _dt.datetime.now(_dt.timezone.utc)
        # Materialize the extract ONCE: the parsed payload feeds the
        # emptiness probe, the raw-zone merge, the clean-zone merge and
        # (with artifacts) both archive writers — each a separate action
        # that would otherwise re-execute the single-partition Python
        # data source end to end (guide §5: cut lineage of a reused
        # intermediate; the payload is one bounded HTTP response, so the
        # checkpoint is metadata-sized by construction).  The emptiness
        # probe RIDES the checkpoint action as an observe metric — the
        # separate isEmpty() job it replaces was one more full scheduling
        # round-trip per run.
        obs = Observation()
        raw = self.extract(payload_path).observe(
            obs, F.count(F.lit(1)).alias("rows")
        ).localCheckpoint(eager=True)
        if (obs.get["rows"] or 0) == 0:
            logger.warning("no data extracted; stopping run")
            return {"raw_total": 0, "clean_total": 0}
        cleaned = self.transform(raw, run_ts)
        # The station seed touches its own zone, independent of the
        # raw/clean merges — overlap it with stage 3 (guide §2.6).
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_stations = pool.submit(self.ensure_stations, run_ts)
            f_load = pool.submit(self.load, raw, cleaned, run_ts)
            f_stations.result()
            stats = f_load.result()
        if artifacts:
            stats["artifacts"] = self.write_run_artifacts(raw, cleaned, run_ts)
        # one scan resolution of the freshly-published zone serves both the
        # daily roll-up and the report (the read must follow the swap — the
        # pre-merge plan's lineage points at the DELETED old zone files)
        disruptions = self.spark.read.parquet(f"{self.lake}/disruptions")
        stats["daily_stats_total"] = self._overwrite(
            "daily_stats", build_daily_stats(disruptions, run_ts)
        )
        stats["report"] = (
            run_report(disruptions, run_ts.date()).collect()[0].asDict()
        )
        return stats
