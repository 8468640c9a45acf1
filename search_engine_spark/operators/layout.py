"""Data-layout optimization: Z-order (Morton) clustering keys.

The lakehouse write-side trick the read-side pruning depends on: sorting
a table by the bit-interleaved key of two columns places rows that are
close in EITHER dimension into the same parquet row groups, so min/max
column statistics prune scans filtered on either column (or both) —
the standard remedy when a table has two competing access paths (e.g.
events filtered sometimes by user, sometimes by time) and single-column
sorting can only serve one of them.

``zorder_key`` is pure integer bit arithmetic (shifts/and/or), identical
in Spark and DuckDB, so layouts are oracle-checkable. ``zorder_layout``
is the write-side application: key + range-repartition + in-partition
sort — the exact shape a 100-TB compaction job runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ZORDER_BITS = 16


def zorder_key(x: Column, y: Column, bits: int = ZORDER_BITS) -> Column:
    """BIGINT Morton key interleaving the low ``bits`` bits of ``x``
    (even bit positions) and ``y`` (odd positions). Inputs are masked to
    ``bits`` bits first, so any non-negative integers work; 2*bits <= 62
    keeps the result inside long."""
    if 2 * bits > 62:
        raise ValueError("zorder_key: 2*bits must be <= 62")
    xm = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ym = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xm, b).bitwiseAND(F.lit(1)), 2 * b)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(ym, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return z


def zorder_key_sql(x: str, y: str, bits: int = ZORDER_BITS) -> str:
    """DuckDB fragment computing the same Morton key."""
    mask = (1 << bits) - 1
    xm = f"(({x})::BIGINT & {mask})"
    ym = f"(({y})::BIGINT & {mask})"
    parts = []
    for b in range(bits):
        parts.append(f"((({xm} >> {b}) & 1) << {2 * b})")
        parts.append(f"((({ym} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " | ".join(parts) + ")"


def zorder_layout(
    df: DataFrame,
    x: str,
    y: str,
    bits: int = ZORDER_BITS,
    partitions: int | None = None,
) -> DataFrame:
    """The write-side compaction shape: compute the Morton key,
    RANGE-repartition on it (contiguous key ranges per output file, the
    property min/max pruning needs — hash partitioning would scatter
    neighborhoods), and sort within partitions. Write the result with
    ``.write.parquet`` and both ``x``- and ``y``-filtered scans prune row
    groups."""
    keyed = df.withColumn("_z", zorder_key(F.col(x), F.col(y), bits))
    rep = (
        keyed.repartitionByRange(partitions, "_z")
        if partitions
        else keyed.repartitionByRange("_z")
    )
    return rep.sortWithinPartitions("_z")
