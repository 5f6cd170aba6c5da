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


def cms_inner_product(a_bytes: bytes, b_bytes: bytes) -> int:
    """Join-size estimate from two CMS sketches: the classic
    count-min inner product (Cormode & Muthukrishnan 2005, §4.2 —
    the AMS-style second-frequency-moment application).  For sketches
    of the join keys of A and B built with the SAME (eps, confidence,
    seed) — hence identical hash rows — ``min_i sum_j tA[i][j] *
    tB[i][j]`` never underestimates ``|A JOIN B|`` = sum_k fA(k)fB(k)
    and exceeds it by at most eps * |A| * |B| with probability
    ``confidence``.

    This is the shuffle-planning primitive: two map-side-combinable
    aggregates (KB-scale blobs) answer "how big is this join" without
    shuffling either table — the signal for choosing broadcast vs
    sort-merge, pre-sizing shuffle partitions, or aborting a runaway
    cross-like join.  Raises if the sketch geometries/hash rows differ
    (different seed or eps — the estimate would be meaningless).
    """
    ta, da, wa, ha, tab_a = decode_cms(bytes(a_bytes))
    tb, db, wb, hb, tab_b = decode_cms(bytes(b_bytes))
    if (da, wa, ha) != (db, wb, hb):
        raise ValueError(
            "CMS sketches are not comparable: build both sides with the "
            f"same eps/confidence/seed (got depth {da}/{db}, width "
            f"{wa}/{wb}, hashA match={ha == hb})"
        )
    return min(
        sum(x * y for x, y in zip(ra, rb)) for ra, rb in zip(tab_a, tab_b)
    )


def sketch_guided_join(
    left, right, on, broadcast_rows: int = 10_000_000,
    eps: float = 0.0001, confidence: float = 0.99, seed: int = 42,
):
    """Join with the physical strategy chosen from the two key
    sketches, no shuffle of either input: the ``right`` side gets a
    ``broadcast`` hint iff ITS row count (the sketch's exact
    totalCount — what actually has to fit on every executor) is at
    most ``broadcast_rows``, else a ``merge`` (sort-merge) hint.  The
    join-OUTPUT estimate (:func:`cms_inner_product`, an upper bound)
    is returned alongside for shuffle-partition sizing — it must NOT
    gate the broadcast: a billion-row table with barely-overlapping
    keys has a tiny pair estimate but would still OOM every executor
    if shipped whole.

    Returns (joined DataFrame, pair_estimate).  Planning cost is two
    sketch-aggregate jobs; amortize by persisting sketches for tables
    that join repeatedly (they are plain binary columns).
    """
    ska = left.agg(
        count_min_sketch_agg(on, eps, confidence, seed).alias("s")
    ).collect()[0]["s"]
    skb = right.agg(
        count_min_sketch_agg(on, eps, confidence, seed).alias("s")
    ).collect()[0]["s"]
    est = cms_inner_product(ska, skb)
    n_right = cms_total_count(skb)
    hinted = right.hint("broadcast" if n_right <= broadcast_rows else "merge")
    return left.join(hinted, on), est


def cms_max_frequency(sketch_bytes: bytes) -> int:
    """Upper-bound estimate of the HOTTEST key's frequency, from the
    sketch alone — no key enumeration: for every hash row i,
    ``max_j t[i][j] >= f(k)`` for every key k (k lands in one bucket
    per row), so ``min_i max_j t[i][j] >= f_max``, and it exceeds
    ``f_max`` by at most the usual eps*N collision mass.  This is the
    skew-detection primitive: one KB-scale sketch of a join key
    answers "does one key dominate this side" without a groupBy."""
    _, _, _, _, table = decode_cms(bytes(sketch_bytes))
    return min(max(row) for row in table)


def sketch_planned_join(
    left,
    right,
    on,
    broadcast_rows: int = 10_000_000,
    salt_above: int | None = None,
    salt: int = 16,
    eps: float = 0.0001,
    confidence: float = 0.99,
    seed: int = 42,
):
    """:func:`sketch_guided_join` extended with the skew leg — the
    full sketch -> plan -> mitigation loop: the two key sketches alone
    choose among BROADCAST (right side fits every executor), SALTED
    sort-merge (right is big AND the left side's hottest key
    (:func:`cms_max_frequency`) exceeds ``salt_above`` — one reducer
    would take the whole hot key), or plain sort-merge.  Broadcast
    joins never need salting (no shuffle of the left side), so skew is
    only consulted on the merge path; the salted leg delegates to
    ``operators.skew.salted_join`` (semantics-preserving, right side
    replicated ``salt`` ways, left never replicated).

    Returns (joined, plan) where plan = {"strategy", "pair_estimate",
    "n_right", "left_max_freq_est"} — everything the decision used,
    for plan assertions and autotuning logs.  Planning cost is two
    map-side-combinable sketch aggregates; neither input shuffles
    before the choice."""
    from ..operators.skew import salted_join

    ska = left.agg(
        count_min_sketch_agg(on, eps, confidence, seed).alias("s")
    ).collect()[0]["s"]
    skb = right.agg(
        count_min_sketch_agg(on, eps, confidence, seed).alias("s")
    ).collect()[0]["s"]
    plan = {
        "pair_estimate": cms_inner_product(ska, skb),
        "n_right": cms_total_count(skb),
        "left_max_freq_est": cms_max_frequency(ska),
    }
    if plan["n_right"] <= broadcast_rows:
        plan["strategy"] = "broadcast"
        joined = left.join(right.hint("broadcast"), on)
    elif salt_above is not None and plan["left_max_freq_est"] > salt_above:
        plan["strategy"] = "salted"
        joined = salted_join(left, right.hint("merge"), on, salt=salt)
    else:
        plan["strategy"] = "merge"
        joined = left.join(right.hint("merge"), on)
    return joined, plan
