"""Count-min sketch: the frequency-estimation family, completing the
four sketch algebras (HLL and theta for distinct counts, KLL for
quantiles, CMS for per-item frequencies).

Spark builds the sketch JVM-side with the ``count_min_sketch``
aggregate (mergeable binary column — the same persist-and-reaggregate
design as the others), but ships no SQL reader for it.  This module
adds the reader: a pure-Python decoder for the CountMinSketchImpl
serialization (version 1: int version, long totalCount, int depth,
int width, long hashA[depth], long table[depth][width], big-endian)
and an Arrow-batched point-query UDF.

Estimation contract: ``estimate(item) = min_i table[i][h_i(item)]``
is exact when the sketch is collision-free for the queried items
(width >> distinct items), and an upper bound otherwise — the battery
entry sizes eps so the gate-scale estimates are exact, mirroring how
the HLL/theta/KLL entries pin exactness.

Long items hash with Spark's scheme (CountMinSketchImpl.hash, the
stream-lib Carter–Wegman construction): ``h = hashA[i]*item;
h += h >> 32; h &= 2^31-1; idx = h % width`` in Java 64-bit signed
arithmetic.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MASK = (1 << 64) - 1


def decode_cms(data: bytes) -> tuple[int, int, int, list[int], list[list[int]]]:
    """Parse Spark CountMinSketchImpl bytes -> (total, depth, width,
    hashA, table)."""
    (version,) = struct.unpack_from(">i", data, 0)
    if version != 1:
        raise ValueError(f"unsupported CountMinSketch version {version}")
    total, depth, width = struct.unpack_from(">qii", data, 4)
    off = 4 + 8 + 4 + 4
    hash_a = list(struct.unpack_from(f">{depth}q", data, off))
    off += 8 * depth
    table = []
    for _ in range(depth):
        table.append(list(struct.unpack_from(f">{width}q", data, off)))
        off += 8 * width
    return total, depth, width, hash_a, table


def _signed64(x: int) -> int:
    x &= _MASK
    return x - (1 << 64) if x >= 1 << 63 else x


def _estimate_long(item: int, depth, width, hash_a, table) -> int:
    """Row hash per CountMinSketchImpl.hash (Carter–Wegman a·x folded
    mod the Mersenne prime 2^31-1, Java 64-bit semantics)."""
    est = None
    for i in range(depth):
        h = _signed64(hash_a[i] * item)
        h = _signed64(h + (h >> 32))  # >> is arithmetic on signed ints
        h &= (1 << 31) - 1
        idx = h % width
        v = table[i][idx]
        est = v if est is None else min(est, v)
    return est or 0


def cms_estimate_udf(sketch_bytes: bytes):
    """Arrow-batched point-query UDF over a broadcast-style closure:
    the (small) sketch rides in the task closure; items stream through
    as a vectorized column — frequency lookups for millions of items
    without the sketch ever re-shuffling."""
    total, depth, width, hash_a, table = decode_cms(bytes(sketch_bytes))

    @F.pandas_udf(T.LongType())
    def estimate(items: pd.Series) -> pd.Series:
        return items.map(
            lambda x: _estimate_long(int(x), depth, width, hash_a, table)
        )

    return estimate


def cms_total_count(sketch_bytes: bytes) -> int:
    return decode_cms(bytes(sketch_bytes))[0]


def count_min_sketch_agg(col, eps: float = 0.0001, confidence: float = 0.99, seed: int = 42) -> Column:
    """Build a mergeable CMS over ``col`` (thin veneer over the Spark
    built-in; width = ceil(2/eps), depth = ceil(ln(1-confidence)/ln(1/2)))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.count_min_sketch(c, F.lit(eps), F.lit(confidence), F.lit(seed))
