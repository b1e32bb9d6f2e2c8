"""Skew-mitigation join: deterministic key salting.

AQE's skew-join splitting (on in session.py) handles most skew at runtime by
splitting oversized shuffle partitions, but it only works for sort-merge
joins where BOTH sides can be re-split.  Salting is the planner-independent
fallback for the remaining cases — e.g. a replicated (non-broadcastable)
dimension against a fact whose key distribution has a few dominant values,
or aggregations feeding a join where one key holds >> 1/parallelism of the
rows.

``salted_join`` scatters the fact side's rows across ``salt`` sub-keys and
replicates the dimension side once per sub-key, so a key holding N rows
shuffles into ``salt`` partitions of N/salt instead of one hot partition.
No ``rand()`` in the plan: the salt comes either from a caller-supplied
column subset (content-deterministic across runs AND plans) or, by
default, from ``monotonically_increasing_id`` — which differs across
IDENTICAL duplicate rows (a whole-row hash would send every copy of a
duplicated hot row to one partition, defeating the mitigation) and never
chokes on unhashable column types (maps).  The default is
plan-deterministic: the same plan over the same files yields the same
placement; a different scan partitioning redistributes rows but never
changes the join RESULT, which is salt-invariant by construction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on ``on``, salted ``salt`` ways.

    Output columns and rows are identical to ``fact.join(dim, on, how)``;
    only the shuffle distribution changes.  ``how`` supports the
    fact-preserving types (inner / left / left_semi / left_anti) — salting
    replicates ``dim``, so dim-preserving joins (right/full) would need the
    symmetric construction.

    ``salt_cols`` names fact columns whose hash spreads the hot key (pick
    high-cardinality payload columns); omitted, the salt is
    ``monotonically_increasing_id() % salt``, which splits even hot keys
    whose rows are byte-identical duplicates.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not support how={how!r}")
    keys = list(on)
    if salt_cols is not None:
        salt_expr = F.pmod(
            F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt)
        )
    else:
        salt_expr = F.pmod(F.monotonically_increasing_id(), F.lit(salt))
    fact_s = fact.withColumn("_salt", salt_expr)
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = fact_s.join(dim_s, keys + ["_salt"], how)
    return out.drop("_salt")


def key_skew_profile(
    df: DataFrame,
    key_cols: Sequence[str],
    topk: int = 20,
) -> DataFrame:
    """Skew diagnostic: the ``topk`` heaviest key values with their row
    counts, corpus share, and rank — the measurement that decides whether
    a join/window needs salting BEFORE you pay for it (pair with
    :func:`salted_join` / the behavioral whale twins).

    Plan: one key-keyed partial-aggregated count (a whale key ships one
    partial row per map task), total derived from the SAME count frame
    (metadata-scale agg, 1-row broadcast), global top-k via
    TakeOrderedAndProject, rank window over the k-row result only.
    """
    keys = list(key_cols)
    counts = df.groupBy(*keys).agg(F.count("*").alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("_tot"))
    top = counts.orderBy(
        F.desc("n_rows"), *[F.asc(k) for k in keys]
    ).limit(topk)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n_rows"), *[F.asc(k) for k in keys])
    return top.crossJoin(F.broadcast(total)).select(
        *keys,
        "n_rows",
        F.round(F.col("n_rows").cast("double") / F.col("_tot"), 6).alias(
            "share"
        ),
        F.row_number().over(w).cast("int").alias("rank"),
    )
