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
The salt is deterministic (hash of the whole fact row, not ``rand()``) —
re-runs produce identical partition placement, keeping the engine's
reproducibility contract.
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
) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on ``on``, salted ``salt`` ways.

    Output columns and rows are identical to ``fact.join(dim, on, how)``;
    only the shuffle distribution changes.  ``how`` supports the
    fact-preserving types (inner / left / left_semi / left_anti) — salting
    replicates ``dim``, so dim-preserving joins (right/full) would need the
    symmetric construction.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not support how={how!r}")
    keys = list(on)
    # Content-hash salt: uniform, deterministic, no rand() in the plan.
    fact_s = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt))
    )
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = fact_s.join(dim_s, keys + ["_salt"], how)
    return out.drop("_salt")
