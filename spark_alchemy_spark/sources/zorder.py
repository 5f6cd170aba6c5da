"""Z-order (Morton) clustering keys: interleave the bits of two
columns so range-partitioned writes co-locate rows that are close in
BOTH dimensions — multi-dimensional data skipping for workloads that
filter on either (or both) of two columns at once.

Why it matters at 100 TB: a layout sorted only by column A answers
B-range queries by scanning everything; a Z-ordered layout bounds each
file's span in A AND B simultaneously, so parquet min/max row-group
stats skip most files for either predicate (the effect
``tests/test_bucketing.py::test_zorder_write_clusters_both_dims``
measures directly on file spans).

The key is a pure codegen expression — ``2*bits`` shift/mask/or terms,
no Python, no shuffle; the clustered write is one
``repartitionByRange`` (range exchange) + per-partition sort.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a, b, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer expressions (wrap with a rank/bucket mapping first for
    arbitrary domains).  Even result bits come from ``a``, odd from
    ``b``; fits a long for ``bits <= 31``."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    ca = (a if isinstance(a, Column) else F.col(a)).cast("long")
    cb = (b if isinstance(b, Column) else F.col(b)).cast("long")
    ca, cb = F.pmod(ca, F.lit(1 << bits)), F.pmod(cb, F.lit(1 << bits))
    terms = []
    for j in range(bits):
        terms.append(F.shiftleft(F.shiftright(ca, j).bitwiseAND(F.lit(1)), 2 * j))
        terms.append(
            F.shiftleft(F.shiftright(cb, j).bitwiseAND(F.lit(1)), 2 * j + 1)
        )
    return reduce(Column.bitwiseOR, terms)


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    num_files: int = 16,
) -> None:
    """Cluster ``df`` by the Z-order of (``col_a``, ``col_b``) into
    ``num_files`` range partitions and write parquet — each output
    file then covers a bounded rectangle of the (a, b) plane, which is
    what lets min/max stats skip files for predicates on either
    column."""
    z = zorder_key(col_a, col_b, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
