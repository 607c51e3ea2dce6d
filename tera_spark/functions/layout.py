"""Data-layout keys: Z-order (Morton) interleaving for multi-column
file-skipping.

Beyond-reference scale op (the reference's tables are small enough to scan;
a 100 TB fact table is not): sorting/range-partitioning a table by a
Z-order key over two predicate columns makes min/max footer stats tight on
BOTH columns at once, so a scan with either (or both) predicates prunes
files — the effect lexicographic sort only gives the leading column. This
is the layout trick behind Delta/Iceberg ``ZORDER BY`` / ``sort_order``,
expressed as a plain deterministic column so any writer can use it.

Everything is built-in bitwise expressions (shiftleft/shiftright/&/|) —
JVM-side, whole-stage-codegen-able, and replayable bit-for-bit by a SQL
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key2(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns into one long: ``x``'s bit i lands at position 2i+1,
    ``y``'s at 2i. Callers pre-normalize each dimension into
    [0, 2**bits) — that quantization choice (min-max scale, epoch-day,
    modulo bucket) is the caller's semantic decision, not hidden here.

    2·bits ≤ 62 keeps the result in a positive BIGINT; bits > 31 raises.
    """
    if not (1 <= bits <= 31):
        raise ValueError(f"zorder_key2: bits must be in [1, 31], got {bits}")
    xs = x.cast("long")
    ys = y.cast("long")
    # unrolled at plan-build time (bits is a Python int): 2·bits flat
    # terms, all inside one whole-stage-codegen projection
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xs, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftright(ys, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def cluster_by_zorder(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    num_partitions: int | None = None,
    key_name: str = "zkey",
) -> DataFrame:
    """Return ``df`` with a ``key_name`` Z-order column, range-partitioned
    and sorted by it — the write-side layout step: each output file covers
    a compact Z-range, i.e. a small rectangle in (x, y) space, so both
    columns' min/max stats are tight and scans prune.

    ``repartitionByRange`` samples the key distribution (one extra pass)
    and balances output files even when the key space is skewed;
    ``sortWithinPartitions`` is a local sort, no second shuffle.
    """
    out = df.withColumn(key_name, zorder_key2(F.col(x_col), F.col(y_col), bits))
    if num_partitions:
        out = out.repartitionByRange(num_partitions, F.col(key_name))
    else:
        out = out.repartitionByRange(F.col(key_name))
    return out.sortWithinPartitions(key_name)
