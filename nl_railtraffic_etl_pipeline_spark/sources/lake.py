"""Partitioned Parquet/JSON lake writers — the engine's sink surface.

Maps the reference's five sinks (SURVEY §2.1 S2-S5) onto Spark's native
output formats.  The Hive-style ``year/month/day`` S3 layout the reference
assembles by hand (api_client.py:119,160) is Spark's ``partitionBy`` — which
also buys partition pruning on every downstream date-filtered read, the same
access path the Glue partition projection provides (athena/main.tf:35-48).

At 100 TB: date partitioning bounds each daily write to its own directory,
`maxRecordsPerFile` caps file sizes, and readers prune to the queried days.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_date_partitions(df: DataFrame, ts_col: str = "fetched_at") -> DataFrame:
    """Add string year/month/day partition columns from a timestamp column.

    Zero-padded to match the reference's key format '%Y/%m/%d'
    (api_client.py:119) and the Glue partition values.
    """
    return (
        df.withColumn("year", F.date_format(ts_col, "yyyy"))
        .withColumn("month", F.date_format(ts_col, "MM"))
        .withColumn("day", F.date_format(ts_col, "dd"))
    )


def write_raw_archive(
    df: DataFrame, path: str, run_ts: _dt.datetime, fmt: str = "json"
) -> None:
    """S2/S3/S4: archive the verbatim payload under date partitions.

    Keeps one ``raw_json`` string column per record alongside the ingest
    timestamp.  When the frame already carries ``raw_json`` (the raw-zone
    shape the ``ns_disruptions`` DataSource yields) the string is archived
    BYTE-VERBATIM — the reference's archive contract (api_client.py:105-110);
    parsed-only frames fall back to a canonical ``to_json`` re-serialization.
    """
    raw_json = (
        F.col("raw_json")
        if "raw_json" in df.columns
        else F.to_json(
            F.struct(*[c for c in df.columns if c != "_corrupt_record"])
        )
    )
    out = df.select(
        raw_json.alias("raw_json"),
        F.lit(run_ts).alias("fetched_at"),
    )
    (
        with_date_partitions(out)
        .write.mode("append")
        .partitionBy("year", "month", "day")
        .format(fmt)
        .save(path)
    )


def write_clean_lake(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Cleaned warehouse table as date-partitioned parquet.

    Partitioned on the event date (the reference's queries all filter or
    group on DATE(start_time) — partition pruning covers the same access
    paths its four B-tree indexes did, SURVEY §4).
    """
    (
        df.withColumn("event_date", F.to_date("start_time"))
        .repartition("event_date")
        .write.mode(mode)
        .option("maxRecordsPerFile", 5_000_000)
        .partitionBy("event_date")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: list[str],
    num_buckets: int = 32,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed+sorted managed table: the co-located-join storage layout.

    Two tables bucketed on the same keys into the same bucket count join
    with NO shuffle and NO sort — each task zips bucket i with bucket i
    (verified by plan assertion in tests).  This is how the repeated-join
    keys of the warehouse (disruption_id, station_code) avoid re-shuffling
    the fact table on every query at 100 TB; the upsert operators work
    unchanged since bucket layout is preserved under same-key rewrites.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *keys)
        .sortBy(*keys)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def write_csv_snapshot(df: DataFrame, path: str, bom: bool = True) -> None:
    """S5: single-file CSV snapshot of the cleaned frame (pipeline.py:103-110).

    coalesce(1) deliberately: snapshot fidelity over parallelism, exactly the
    reference's one-file-per-run contract.  Not for big outputs.

    ``bom=True`` prepends the UTF-8 BOM — the reference writes
    ``encoding='utf-8-sig'`` (pipeline.py:109) so Excel-bound consumers get
    the byte-identical file head.  Spark's CSV writer has no BOM option;
    the single part file is re-headed through the Hadoop FileSystem API
    (scheme-agnostic, and the snapshot is one small file by contract).
    """
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
    if not bom:
        return
    spark = df.sparkSession
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(hconf)
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if not (name.startswith("part-") and name.endswith(".csv")):
            continue
        src = status.getPath()
        tmp = jvm.org.apache.hadoop.fs.Path(f"{path}/_bom_{name}")
        out = fs.create(tmp, True)
        out.write(bytearray(b"\xef\xbb\xbf"))
        # copyBytes(close=True) closes both streams.
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(fs.open(src), out, hconf, True)
        fs.delete(src, False)
        fs.rename(tmp, src)


def compact_partitions(
    spark,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    max_records_per_file: int | None = None,
) -> tuple[int, int]:
    """Small-file compaction of a partitioned parquet zone, atomically.

    The operational must-have of a streaming/daily-append lake at 100 TB:
    every micro-batch or daily run appends task-count files per partition
    directory, and a year later each day holds hundreds of KB-sized files
    that scan-time file listing and row-group overhead dominate.  This
    rewrites the zone so each partition directory holds
    ``files_per_partition`` files (``max_records_per_file`` caps size so a
    hot day still splits).

    Plan: one read -> one shuffle keyed on the partition tuple (plus a
    salt when ``files_per_partition > 1``), so each output directory is
    written by exactly its own tasks -> staged write with the same
    ``partitionBy`` -> the delete+rename swap ``pipeline._overwrite``
    uses (atomic on local/HDFS; a table format replaces the swap on
    rename-as-copy stores).  Data is byte-preserved — only file layout
    changes.  Returns (files_before, files_after).
    """
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()

    def _count_files(p: str) -> int:
        hp = jvm.org.apache.hadoop.fs.Path(p)
        fs = hp.getFileSystem(conf)
        if not fs.exists(hp):
            return 0
        it, n = fs.listFiles(hp, True), 0
        while it.hasNext():
            f = it.next().getPath().getName()
            if not f.startswith(("_", ".")):
                n += 1
        return n

    before = _count_files(path)
    df = spark.read.parquet(path)
    if files_per_partition > 1:
        salt = (F.abs(F.xxhash64(*df.columns)) % files_per_partition).alias(
            "_salt"
        )
        df = df.withColumn("_salt", salt).repartition(
            *partition_cols, "_salt"
        ).drop("_salt")
    else:
        df = df.repartition(*partition_cols)
    writer = df.write.mode("overwrite").partitionBy(*partition_cols)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    tmp = path.rstrip("/") + "__compact_stage"
    writer.parquet(tmp)

    hp_t = jvm.org.apache.hadoop.fs.Path(path)
    hp_s = jvm.org.apache.hadoop.fs.Path(tmp)
    fs = hp_t.getFileSystem(conf)
    # Hadoop reports many delete/rename failures by returning false, not
    # throwing (see pipeline._overwrite) — check both.
    if fs.exists(hp_t) and not fs.delete(hp_t, True):
        raise IOError(f"compact: failed to delete {path}")
    if not fs.rename(hp_s, hp_t):
        raise IOError(f"compact: failed to promote {tmp} -> {path}")
    return before, _count_files(path)


def parquet_footer_stats(
    spark, path: str, columns: list[str]
):
    """Column-chunk statistics from the parquet FOOTER (no data scan):
    per requested column, (column, n_values, n_nulls, min_val, max_val)
    aggregated across row groups — min of chunk minima, max of maxima,
    summed counts.  The metadata plane a table format trusts for
    predicate pushdown; the gate's oracle recomputes the same numbers
    from the DATA, so a stale or wrong footer hash-mismatches.

    The footer read is a driver-side bounded metadata fetch (one footer,
    KBs) — the documented exception class next to the IVF-centroid
    artifact pattern; the result frame is |columns| rows.
    """
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    agg: dict[str, list] = {c: [0, 0, None, None] for c in columns}
    for rg in range(f.num_row_groups):
        meta = f.metadata.row_group(rg)
        for i in range(meta.num_columns):
            col = meta.column(i)
            name = col.path_in_schema
            if name not in agg or col.statistics is None:
                continue
            s = col.statistics
            a = agg[name]
            a[0] += s.num_values
            a[1] += s.null_count
            if s.has_min_max:
                a[2] = s.min if a[2] is None else min(a[2], s.min)
                a[3] = s.max if a[3] is None else max(a[3], s.max)
    rows = [
        (c, int(a[0]), int(a[1]),
         None if a[2] is None else int(a[2]),
         None if a[3] is None else int(a[3]))
        for c, a in agg.items()
    ]
    return spark.createDataFrame(
        rows,
        "column string, n_values long, n_nulls long,"
        " min_val long, max_val long",
    )
