"""Idempotent set-based upsert operators.

The reference loads row-at-a-time with per-row conflict handling:
``INSERT ... ON CONFLICT DO NOTHING`` for the raw zone (pipeline.py:157-172)
and SELECT-exists -> UPDATE-else-INSERT with savepoint isolation for the
cleaned zone (pipeline.py:184-298).  Spark-first equivalents are set-based —
one anti-join or one window dedup per batch, shuffling only on the key:

- ``insert_ignore``     = S6 / J5: keep existing rows, append only new keys.
- ``upsert_latest_wins``= S7 / J4: new batch replaces matching keys; within a
  batch the deterministic winner is row_number() by ``order_col`` desc
  (SURVEY §7.3.11 — arrival order is not reproducible distributed).

Both satisfy the reference's idempotence contract (README.md:37):
``load(load(X)) == load(X)`` — property-tested in tests/test_upsert.py.

At scale: these are key-partitioned shuffles; with a bucketed/Delta table the
same call sites swap to storage-side MERGE without touching callers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_batch(
    batch: DataFrame, keys: Sequence[str], order_col=None
) -> DataFrame:
    """Deterministic within-batch dedup: latest by order_col, else any-one.

    ``dropDuplicates`` picks an arbitrary survivor; with ``order_col`` (a
    column name, a Column, or a list of either — e.g. ``[F.desc("ts"),
    "id"]`` for total-order tiebreaks) the survivor is the first row per key
    in that ordering.
    """
    if order_col is None:
        return batch.dropDuplicates(list(keys))
    if isinstance(order_col, (list, tuple)):
        order = [F.desc(c) if isinstance(c, str) else c for c in order_col]
    else:
        order = [F.desc(order_col) if isinstance(order_col, str) else order_col]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def insert_ignore(
    existing: DataFrame, batch: DataFrame, keys: Sequence[str], order_col=None
) -> DataFrame:
    """``INSERT OR IGNORE`` semantics: existing rows win, new keys append.

    ``order_col`` picks the deterministic within-batch survivor among rows
    sharing a key (see ``dedup_batch``); without it the survivor is
    engine-arbitrary, which is fine only for callers whose batches are
    already key-unique.
    """
    new_rows = dedup_batch(batch, keys, order_col).join(
        existing.select(*keys).distinct(), list(keys), "left_anti"
    )
    return existing.unionByName(new_rows)


def upsert_latest_wins(
    existing: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    order_col: str,
) -> DataFrame:
    """UPDATE-else-INSERT semantics: the batch replaces matching keys.

    Implemented as priority-tagged union + one window dedup — a single
    shuffle on the key, no driver round-trips.
    """
    tagged = existing.select(batch.columns).withColumn(
        "_prio", F.lit(0)
    ).unionByName(batch.withColumn("_prio", F.lit(1)))
    w = Window.partitionBy(*keys).orderBy(
        F.desc("_prio"), F.desc(order_col)
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_prio")
    )


def apply_cdc_log(
    log: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    seq_col: str,
    op_col: str = "op",
    payload_cols: Sequence[str] = (),
    delete_op: str = "D",
) -> DataFrame:
    """Materialize the LATEST SNAPSHOT from an insert/update/delete change
    log: per key, the most recent operation wins; keys whose last
    operation is a delete are absent from the snapshot.

    The set-based form of a CDC-consumer's apply loop (the reference
    replays per-row INSERT/UPDATE statements, src/storage/db_writer.py —
    this generalizes upsert_latest_wins with delete semantics).
    ``(ts_col, seq_col)`` must totally order each key's operations
    (``seq_col`` breaks timestamp ties, e.g. a log sequence number).

    Skew-immune by construction: the per-key winner is
    ``max(struct(ts, seq, op, payload...))`` — a partial-aggregated
    groupBy, so a whale key ships one candidate row per map task instead
    of sorting its history in one window task.  One key shuffle total.
    """
    keys = list(key_cols)
    winner = F.max(
        F.struct(
            F.col(ts_col).alias("_ts"),
            F.col(seq_col).alias("_seq"),
            F.col(op_col).alias("_op"),
            *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
        )
    ).alias("_w")
    snap = log.groupBy(*keys).agg(winner).filter(
        F.col("_w._op") != delete_op
    )
    return snap.select(
        *keys,
        F.col("_w._ts").alias(ts_col),
        F.col("_w._seq").alias(seq_col),
        F.col("_w._op").alias(op_col),
        *[F.col(f"_w._p_{c}").alias(c) for c in payload_cols],
    )
