"""Lake round-trip gate: ``pipeline.run -> parquet lake -> read-back`` under
the DuckDB oracle.

Every other registry query reads the testdata derivations directly; this
gate drives the FULL pipeline surface the way production does (VERDICT r3
"Next round" #5): a raw NS-shaped JSON payload file goes through
``SparkETLPipeline.run`` (extract DataSource -> 6-step cleaner -> zone
upserts -> atomic swap) TWICE — a stale partial batch, then the complete
batch an hour later — and the gate returns the cleaned ``disruptions``
zone read back from parquet.

The payload is constructed deterministically from the ``events`` table
(one record per ``event_id % 16 == 1`` row), with every field chosen so
each cleaner rule has a closed-form SQL mirror:

    id       = event_id                 (string)
    type     = the derivation's event_type mapping (canonical lowercase)
    title    = 'Disruption <id>'        (>= 5 chars -> survives the trim
                                         rule; no [A-Z]{2,5} run -> the
                                         regex station fallback stays off)
    start    = ts truncated to seconds, ISO with +0000 offset
    end      = start + floor(value*60) s, or ABSENT for event_id % 5 == 0
               and for NULL values -> the cleaner imputes run_ts + 2h
    section.stations[].uicCode = seed station code by user_id % 6

Round 1 loads the ``event_id % 32 == 1`` half with titles prefixed
'STALE ' at run_ts1; round 2 loads every record at run_ts2.  Latest-wins
upsert must therefore REPLACE every round-1 row (same keys, newer
``updated_at``): a surviving STALE title or run_ts1 stamp is a hash
mismatch.  The oracle replays the whole construction + cleaning in SQL —
so the gate proves extract parsing, timestamp/duration/impact/station
cleaning, both upsert paths, the staged atomic swap, and parquet
timestamp fidelity in one check.

The lake lives under /tmp (wiped per invocation) — gate harness state,
never under the repo or testdata.
"""

from __future__ import annotations

import datetime as _dt
import json
import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from .registry import query
from .testdata import load_table

#: event_type -> disruption type, the same mapping the events derivation
#: uses (testdata.py _DISRUPTIONS_BASE_SQL); values are canonical lowercase
#: so the cleaner's lower()+Dutch-map passes them through unchanged.
_TYPE_MAP = {
    "error": "calamity",
    "view": "maintenance",
    "click": "disruption",
    "purchase": "cancellation",
    "signup": "disruption",
}

#: Seed station codes in SEED_STATIONS order (pipeline.py:44-51).
_CODES = ["ASD", "UTR", "RTD", "EHV", "GVC", "LEDN"]

_RUN1 = _dt.datetime(2030, 1, 1, 0, 0, 0, tzinfo=_dt.timezone.utc)
_RUN2 = _dt.datetime(2030, 1, 2, 0, 0, 0, tzinfo=_dt.timezone.utc)

_IMPUTED_END = "TIMESTAMP '2030-01-02 02:00:00'"
_STAMP2 = "TIMESTAMP '2030-01-02 00:00:00'"

_CODE_CASE = "CASE (user_id % 6) " + " ".join(
    f"WHEN {i} THEN '{c}'" for i, c in enumerate(_CODES)
) + " END"

_TYPE_CASE = (
    "CASE event_type "
    + " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in _TYPE_MAP.items())
    + " ELSE lower(event_type) END"
)

#: Hard cap on the synthetic REST payload the roundtrip harness builds.
#: The payload is driver-collected BY NATURE (it simulates the reference's
#: API fetch writing a JSON file), so it must stay O(1) in SF: lowest
#: ``_PAYLOAD_CAP`` qualifying event_ids (unique key -> total order,
#: identical on both engines).  Not binding below ~sf0.5; binding above.
_PAYLOAD_CAP = 2048

_LAKE_ORACLE = f"""
WITH src AS (
    SELECT event_id, event_type, ts, value, user_id
    FROM events WHERE event_id % 16 = 1
    ORDER BY event_id LIMIT {_PAYLOAD_CAP}
),
built AS (
    SELECT
        CAST(event_id AS VARCHAR) AS disruption_id,
        {_TYPE_CASE} AS type,
        'Disruption ' || CAST(event_id AS VARCHAR) AS title,
        'Event ' || CAST(event_id AS VARCHAR) || ' of type ' || event_type
            AS description,
        date_trunc('second', ts) AS start_time,
        CASE WHEN event_id % 5 = 0 OR value IS NULL
             THEN {_IMPUTED_END}
             ELSE date_trunc('second', ts)
                  + to_seconds(CAST(floor(value * 60) AS BIGINT)) END
            AS end_time,
        CASE WHEN event_id % 5 = 0 OR value IS NULL
             THEN (date_part('epoch', {_IMPUTED_END})
                   - date_part('epoch', date_trunc('second', ts))) / 60.0
             WHEN floor(value * 60) < 0 THEN NULL
             ELSE CAST(floor(value * 60) AS BIGINT) / 60.0 END
            AS duration_minutes,
        {_CODE_CASE} AS affected_stations
    FROM src
)
SELECT
    disruption_id, type, title, description, start_time, end_time,
    duration_minutes,
    CAST(CASE WHEN type = 'calamity' THEN 5
              WHEN contains(type, 'cancel') THEN 5
              WHEN type = 'maintenance' THEN
                   CASE WHEN COALESCE(duration_minutes, 0) > 240
                        THEN 4 ELSE 3 END
              WHEN type = 'disruption' THEN
                   CASE WHEN COALESCE(duration_minutes, 0) > 120 THEN 4
                        WHEN COALESCE(duration_minutes, 0) > 60 THEN 3
                        ELSE 2 END
              ELSE 2 END AS INTEGER) AS impact_level,
    affected_stations,
    FALSE AS is_resolved,
    {_STAMP2} AS created_at,
    {_STAMP2} AS updated_at
FROM built
"""


def _records(spark: SparkSession, sf_dir: str) -> list[dict]:
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "ts", "value", "user_id")
        .filter("event_id % 16 = 1")
        .orderBy("event_id")
        .limit(_PAYLOAD_CAP)
        .collect()
    )
    out = []
    for r in sorted(rows, key=lambda r: r["event_id"]):
        eid, ts = r["event_id"], r["ts"].replace(microsecond=0)
        rec = {
            "id": str(eid),
            "type": _TYPE_MAP.get(r["event_type"], r["event_type"]),
            "title": f"Disruption {eid}",
            "description": f"Event {eid} of type {r['event_type']}",
            "start": ts.strftime("%Y-%m-%dT%H:%M:%S+0000"),
            "section": {
                "stations": [{"uicCode": _CODES[r["user_id"] % 6]}]
            },
        }
        if eid % 5 != 0 and r["value"] is not None:
            end = ts + _dt.timedelta(seconds=math.floor(r["value"] * 60))
            rec["end"] = end.strftime("%Y-%m-%dT%H:%M:%S+0000")
        out.append(rec)
    return out


@query("rail_lake_roundtrip", _LAKE_ORACLE)
def _lake_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline import SparkETLPipeline

    # pid-scoped so concurrent same-SF runs never race rmtree vs read —
    # the same fix the ORC/drift gates got in r6 (a concurrent pytest +
    # sweep run reproduced the race here in r7: FILE_NOT_EXIST mid-read)
    lake = (
        f"/tmp/spark_graft_lake_gate_{os.getpid()}/"
        f"{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(lake, ignore_errors=True)
    os.makedirs(lake, exist_ok=True)

    records = _records(spark, sf_dir)
    stale = [
        {**rec, "title": "STALE " + rec["title"]}
        for rec in records
        if int(rec["id"]) % 32 == 1
    ]
    p1, p2 = f"{lake}/payload_stale.json", f"{lake}/payload_full.json"
    with open(p1, "w", encoding="utf-8") as fh:
        json.dump(stale, fh, ensure_ascii=False)
    with open(p2, "w", encoding="utf-8") as fh:
        json.dump(records, fh, ensure_ascii=False)

    pipe = SparkETLPipeline(spark, f"{lake}/warehouse")
    pipe.run(p1, _RUN1, artifacts=False)
    pipe.run(p2, _RUN2, artifacts=False)
    return spark.read.parquet(f"{lake}/warehouse/disruptions")


# ---------------------------------------------------------------------------
# ORC round-trip (S-family extension): the second columnar format Spark
# ships natively.  The gate writes a deterministic events projection to
# an ORC table under /tmp (distributed write — nothing collects), reads
# it back, and aggregates per type; the oracle computes the same
# aggregate straight from the parquet table, so any loss of timestamp,
# double, or string fidelity through the ORC writer/reader is a hash
# mismatch.  The decimal summand makes the totals partition-order-proof.
# ---------------------------------------------------------------------------
import os as _os  # noqa: E402
import shutil as _shutil  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


@query(
    "lake_orc_roundtrip",
    """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(24,10)))
                  AS DOUBLE), 4) AS total_value,
       MIN(ts) AS first_ts, MAX(ts) AS last_ts
FROM events WHERE event_id % 3 = 0
GROUP BY event_type
""",
)
def _lake_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _os.path.basename(sf_dir.rstrip("/"))
    # pid-scoped so concurrent same-SF runs never race rmtree vs read
    path = f"/tmp/spark_graft_orc_gate_{_os.getpid()}/{base}"
    _shutil.rmtree(path, ignore_errors=True)
    ev = (
        load_table(spark, sf_dir, "events", spread=True)
        .filter(F.col("event_id") % 3 == 0)
        .select("event_id", "ts", "event_type", "value")
    )
    ev.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("value").cast("string").cast("decimal(24,10)"))
            .cast("double"),
            4,
        ).alias("total_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


# ---------------------------------------------------------------------------
# Schema evolution across lake generations: an old writer produced
# (event_id, event_type, value); a new writer adds user_id and drops
# value.  Production reads the union of generations with
# ``mergeSchema`` — absent columns surface as NULL, never as an error.
# The gate writes both generations to one directory tree, reads the tree
# back with mergeSchema, and profiles per-column completeness; the
# oracle replays the union with explicit NULL fill.
# ---------------------------------------------------------------------------
@query(
    "lake_schema_drift",
    """
WITH unioned AS (
    SELECT event_id, event_type, value, CAST(NULL AS BIGINT) AS user_id
    FROM events WHERE event_id % 4 = 1
    UNION ALL
    SELECT event_id, event_type, CAST(NULL AS DOUBLE) AS value, user_id
    FROM events WHERE event_id % 4 = 2
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(value) AS BIGINT) AS n_value,
       CAST(COUNT(user_id) AS BIGINT) AS n_user,
       ROUND(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(24,10)))
                  AS DOUBLE), 4) AS total_value
FROM unioned GROUP BY event_type
""",
)
def _lake_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _os.path.basename(sf_dir.rstrip("/"))
    root = f"/tmp/spark_graft_drift_gate_{_os.getpid()}/{base}"
    _shutil.rmtree(root, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events", spread=True)
    gen1 = ev.filter(F.col("event_id") % 4 == 1).select(
        "event_id", "event_type", "value"
    )
    gen2 = ev.filter(F.col("event_id") % 4 == 2).select(
        "event_id", "event_type", "user_id"
    )
    gen1.write.mode("overwrite").parquet(f"{root}/gen=1")
    gen2.write.mode("overwrite").parquet(f"{root}/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{root}/gen=1", f"{root}/gen=2"
    )
    return merged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count("value").alias("n_value"),
        F.count("user_id").alias("n_user"),
        F.round(
            F.sum(F.col("value").cast("string").cast("decimal(24,10)"))
            .cast("double"),
            4,
        ).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Partition-pruned lake scan: events written partitionBy(day), read back
# with a one-week day predicate — the predicate must become a
# PartitionFilter (directories never listed), which the plan guard
# asserts; this gate proves the pruned read is also CORRECT vs the
# unpartitioned oracle.
# ---------------------------------------------------------------------------
@query(
    "lake_partition_pruning",
    """
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(24,10)))
                  AS DOUBLE), 4) AS total_value
FROM events
WHERE CAST(ts AS DATE) >= DATE '2024-01-08'
  AND CAST(ts AS DATE) <= DATE '2024-01-14'
GROUP BY 1, 2
""",
)
def _lake_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _os.path.basename(sf_dir.rstrip("/"))
    path = f"/tmp/spark_graft_part_gate_{_os.getpid()}/{base}"
    if not _os.path.exists(path):
        ev = load_table(spark, sf_dir, "events", spread=True).withColumn(
            "day", F.to_date("ts").cast("string")
        )
        ev.write.mode("overwrite").partitionBy("day").parquet(path)
    back = spark.read.parquet(path).filter(
        (F.col("day") >= "2024-01-08") & (F.col("day") <= "2024-01-14")
    )
    return back.groupBy("day", "event_type").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("value").cast("string").cast("decimal(24,10)"))
            .cast("double"),
            4,
        ).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Multi-writer-safe versioned zone (sources/zones.py): three sequential
# latest-wins upserts commit through the claim -> stage -> audit ->
# publish protocol, old snapshots prune to the retention window, and the
# read-back must equal the SQL replay of the same three merges.  The
# concurrency properties (interleaved writers, dead-claim recovery,
# audit abort) are pinned by tests/test_upsert.py; this gate proves the
# happy-path protocol end-to-end on the cluster with oracle-checked
# CONTENT.  Batch i carries version literal i so latest-wins is
# deterministic: each user's surviving row comes from the highest batch
# that saw them.
# ---------------------------------------------------------------------------
@query(
    "lake_versioned_zone",
    """
WITH b AS (
    SELECT user_id, 0 AS ver, CAST(COUNT(*) AS BIGINT) AS n, MAX(ts) AS last_ts
    FROM events WHERE event_id % 7 = 0 GROUP BY user_id
    UNION ALL
    SELECT user_id, 1, CAST(COUNT(*) AS BIGINT), MAX(ts)
    FROM events WHERE event_id % 7 = 1 GROUP BY user_id
    UNION ALL
    SELECT user_id, 2, CAST(COUNT(*) AS BIGINT), MAX(ts)
    FROM events WHERE event_id % 7 = 2 GROUP BY user_id
),
latest AS (
    SELECT user_id, ver, n, last_ts,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ver DESC) AS rn
    FROM b
)
SELECT user_id, CAST(ver AS INTEGER) AS ver, n, last_ts
FROM latest WHERE rn = 1
""",
)
def _lake_versioned_zone(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.zones import VersionedZone

    base = _os.path.basename(sf_dir.rstrip("/"))
    path = f"/tmp/spark_graft_zone_gate_{_os.getpid()}/{base}"
    _shutil.rmtree(path, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events", spread=True)
    zone = VersionedZone(spark, path)

    def audit(staged: DataFrame) -> None:
        dups = staged.groupBy("user_id").count().filter("count > 1").count()
        if dups:
            raise AssertionError(f"{dups} duplicate keys staged")

    for i in range(3):
        batch = (
            ev.filter(F.col("event_id") % 7 == i)
            .groupBy("user_id")
            .agg(F.count("*").alias("n"), F.max("ts").alias("last_ts"))
            .select(
                "user_id",
                F.lit(i).cast("int").alias("ver"),
                "n",
                "last_ts",
            )
        )
        zone.upsert(batch, ["user_id"], "ver", audit_fn=audit)
    zone.prune(keep=2)
    assert zone.current_version() == 3 and zone.manifest()["version"] == 3
    return zone.read().select("user_id", "ver", "n", "last_ts")
