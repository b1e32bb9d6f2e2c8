"""Lake writers (S2-S5) and the REST source's retry policy."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from nl_railtraffic_etl_pipeline_spark.sources import rest_source
from nl_railtraffic_etl_pipeline_spark.sources.json_source import (
    read_payload,
    read_jsonl,
)
from nl_railtraffic_etl_pipeline_spark.sources.lake import (
    with_date_partitions,
    write_csv_snapshot,
    write_raw_archive,
)

PAYLOAD = "/root/reference/data/raw/disruptions_20260214_111810.json"
RUN_TS = dt.datetime(2026, 2, 14, 11, 18, 10)


def test_raw_archive_hive_layout_and_pruning(spark, tmp_path):
    raw = read_payload(spark, PAYLOAD)
    path = str(tmp_path / "archive")
    write_raw_archive(raw, path, RUN_TS)

    # Hive layout: year=/month=/day= directories, zero-padded values
    assert os.path.isdir(f"{path}/year=2026/month=02/day=14")

    back = spark.read.json(path)
    assert back.count() == raw.count()
    # partition pruning reaches the scan: filtering on partition columns
    # must not list other days' directories
    pruned = back.filter(
        (F.col("year") == "2026") & (F.col("month") == "02") & (F.col("day") == "14")
    )
    assert pruned.count() == raw.count()
    none = back.filter(F.col("day") == "15")
    assert none.count() == 0


def test_date_partition_columns_zero_padded(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2026, 3, 5, 1, 2, 3),)], "fetched_at timestamp"
    )
    row = with_date_partitions(df).first()
    assert (row.year, row.month, row.day) == ("2026", "03", "05")


def test_csv_snapshot_single_file_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, name string"
    )
    path = str(tmp_path / "snap")
    write_csv_snapshot(df, path)
    files = [f for f in os.listdir(path) if f.endswith(".csv")]
    assert len(files) == 1  # the reference's one-file-per-run contract
    back = spark.read.option("header", True).csv(path)
    assert sorted((r["id"], r["name"]) for r in back.collect()) == [
        ("1", "a"),
        ("2", "b"),
    ]


def test_raw_archive_verbatim_record_bytes(spark, tmp_path):
    """S2 fidelity: a raw-zone frame's record string survives the archive
    BYTE-identically (the reference stores json.dumps(item,
    ensure_ascii=False) untouched — reference pipeline.py:151)."""
    import json

    from nl_railtraffic_etl_pipeline_spark.sources.rest_datasource import (
        register,
    )

    register(spark)
    rows = (
        spark.read.format("ns_disruptions")
        .option("payload_path", PAYLOAD)
        .option("fetched_at", RUN_TS.isoformat())
        .load()
    )
    path = str(tmp_path / "archive")
    write_raw_archive(rows, path, RUN_TS)

    with open(PAYLOAD, encoding="utf-8") as fh:
        records = {r["id"]: r for r in json.load(fh) if r.get("id")}
    back = spark.read.json(path)
    got = back.select("raw_json").limit(5).collect()
    assert got
    for r in got:
        rec_id = json.loads(r.raw_json)["id"]
        assert r.raw_json == json.dumps(records[rec_id], ensure_ascii=False)


def test_csv_snapshot_utf8_sig_bom(spark, tmp_path):
    """S5 fidelity: the snapshot head carries the UTF-8 BOM, matching the
    reference's encoding='utf-8-sig' (reference pipeline.py:109)."""
    df = spark.createDataFrame([(1, "café")], "id bigint, name string")
    path = str(tmp_path / "snap")
    write_csv_snapshot(df, path)
    files = [f for f in os.listdir(path) if f.endswith(".csv")]
    assert len(files) == 1
    blob = open(f"{path}/{files[0]}", "rb").read()
    assert blob.startswith(b"\xef\xbb\xbf")
    # content after the BOM is the ordinary UTF-8 CSV
    assert blob[3:].decode("utf-8").splitlines()[1] == "1,café"
    back = spark.read.option("header", True).csv(path)
    assert back.count() == 1


def test_read_jsonl_permissive(spark, tmp_path):
    p = tmp_path / "x.jsonl"
    p.write_text(
        '{"id": "a", "title": "Works at Amsterdam"}\n'
        '{"id": "b", "type": "MAINTENANCE"}\n'
        "{not json at all\n"  # malformed -> _corrupt_record, not a failure
    )
    df = read_jsonl(spark, str(p))
    rows = df.collect()
    assert len(rows) == 3
    ok = {r.id for r in rows if r.id is not None}
    assert ok == {"a", "b"}
    corrupt = [r for r in rows if r._corrupt_record is not None]
    assert len(corrupt) == 1  # Glue ignore.malformed.json equivalence


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    from nl_railtraffic_etl_pipeline_spark.sources.lake import write_bucketed

    a = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "bkt_a", ["k"], 8, path=str(tmp_path / "a"))
    write_bucketed(b, "bkt_b", ["k"], 8, path=str(tmp_path / "b"))
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "simple"
        )
        # co-located: bucket i zips with bucket i — no shuffle, no sort
        assert "Exchange" not in plan, plan
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_python_datasource_raw_zone(spark):
    from nl_railtraffic_etl_pipeline_spark.schemas import RAW_DISRUPTION
    from nl_railtraffic_etl_pipeline_spark.sources import rest_datasource

    rest_datasource.register(spark)
    df = (
        spark.read.format("ns_disruptions")
        .option("payload_path", PAYLOAD)
        .option("fetched_at", "2026-02-14T11:18:10")
        .load()
    )
    assert df.schema.simpleString() == (
        "struct<id:string,raw_json:string,fetched_at:timestamp>"
    )
    assert df.count() == 125
    # raw_json round-trips through the nested schema the cleaner consumes
    parsed = df.select(F.from_json("raw_json", RAW_DISRUPTION).alias("r"))
    assert parsed.filter(F.col("r.id").isNull()).count() == 0


class _FakeResp:
    def __init__(self, status, payload=None):
        self.status_code = status
        self._payload = payload

    def raise_for_status(self):
        if self.status_code >= 400:
            import requests

            err = requests.HTTPError(f"{self.status_code}")
            err.response = self
            raise err

    def json(self):
        return self._payload


def test_rest_source_retries_then_succeeds(monkeypatch):
    requests = pytest.importorskip("requests")
    calls = []

    def fake_get(url, **kw):
        calls.append(url)
        return _FakeResp(500) if len(calls) < 3 else _FakeResp(200, [{"id": "x"}])

    monkeypatch.setattr(requests, "get", fake_get)
    monkeypatch.setattr(rest_source.time, "sleep", lambda s: None)
    out = rest_source.fetch_disruptions("key", max_retries=3)
    assert out == [{"id": "x"}] and len(calls) == 3


def test_rest_source_aborts_on_auth(monkeypatch):
    requests = pytest.importorskip("requests")
    calls = []

    def fake_get(url, **kw):
        calls.append(url)
        return _FakeResp(401)

    monkeypatch.setattr(requests, "get", fake_get)
    monkeypatch.setattr(rest_source.time, "sleep", lambda s: None)
    with pytest.raises(RuntimeError):
        rest_source.fetch_disruptions("key", max_retries=3)
    assert len(calls) == 1  # 401 short-circuits, no retries


def test_compact_partitions_reduces_files_preserves_data(spark, tmp_path):
    """Compaction must leave exactly files_per_partition data files per
    partition directory, preserve every row, and remove the staging dir
    (atomic swap)."""
    import os

    from nl_railtraffic_etl_pipeline_spark.sources.lake import compact_partitions

    path = str(tmp_path / "zone")
    df = spark.createDataFrame(
        [(i, f"d{i % 3}", float(i)) for i in range(300)],
        "id bigint, day string, v double",
    )
    # simulate many small append files: 8 tasks per partition value
    df.repartition(8).write.partitionBy("day").parquet(path)
    before_expected = sum(
        1
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    before, after = compact_partitions(spark, path, ["day"])
    assert before == before_expected and before > 3
    assert after == 3  # one file per day value
    assert not os.path.exists(path + "__compact_stage")
    got = spark.read.parquet(path).select("id", "day", "v")
    ref = df.select("id", "day", "v")
    assert got.count() == 300
    assert got.exceptAll(ref).count() == 0 and ref.exceptAll(got).count() == 0
