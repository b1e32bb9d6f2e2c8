"""Data-layout optimization: multi-dimensional clustering keys.

A lake partitioned by one column serves one access path; queries filtering
on a SECOND column scan everything.  Z-ordering (bit interleaving — the
technique behind Delta OPTIMIZE ZORDER and Hudi clustering) maps two sort
dimensions onto one key whose ordering preserves locality in BOTH: sorting
by ``zorder_key(user_id, day)`` keeps any user's rows AND any day's rows
inside a bounded number of file ranges, so min/max row-group stats prune
on either predicate.

Pure integer bit arithmetic (shift/and/or), identical in Spark and DuckDB
— the key itself is oracle-checkable, which matters: a layout key that
computes differently on the writer and the auditor silently destroys
pruning.  Write-side usage::

    df.repartitionByRange(N, zorder_key(...)).sortWithinPartitions(...)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Bits taken from each dimension (key fits in 2*ZORDER_BITS <= 63).
ZORDER_BITS = 16


def zorder_key(x: Column, y: Column, bits: int = ZORDER_BITS) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: x's bit i
    lands at position 2i, y's at 2i+1.  Values are masked to ``bits``
    first (callers bucket wider domains, e.g. ``user_id % 2**bits``)."""
    mask = (1 << bits) - 1
    xm = x.cast("bigint").bitwiseAND(F.lit(mask))
    ym = y.cast("bigint").bitwiseAND(F.lit(mask))
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def zorder_key_sql(x: str, y: str, bits: int = ZORDER_BITS) -> str:
    """The DuckDB twin of :func:`zorder_key`, for oracles and auditors."""
    mask = (1 << bits) - 1
    xs = f"(CAST({x} AS BIGINT) & {mask})"
    ys = f"(CAST({y} AS BIGINT) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xs} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ys} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"
