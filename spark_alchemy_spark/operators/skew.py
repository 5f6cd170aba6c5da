"""Skew-mitigation joins: explicit key salting for when AQE's runtime
skew splitting isn't available (non-shuffle-stage boundaries, streaming
joins) or a hot key is known up front.

``salted_join`` replicates each right-side row ``salt`` times and
scatters left rows uniformly across the replicas, so one hot key's rows
spread over ``salt`` reducers instead of one.  Cost model: right side
grows ×salt (keep salt modest or pre-filter to the hot keys with
``hot_keys``); the left side — the big one at 100 TB — is never
replicated.  Inner/left-equi-join semantics are preserved exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key: str, min_rows: int) -> DataFrame:
    """Keys whose row count exceeds ``min_rows`` (one cheap pre-pass;
    at scale, sample instead: ``df.sample(0.001)`` and scale the
    threshold)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > min_rows)
        .select(key)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the shuffle key salted ``salt`` ways.

    Left rows get a uniform pseudo-random salt derived from stable row
    content (xxhash64 of all left columns — deterministic, no RNG state
    on executors); right rows are exploded across every salt value.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l.join(r, on=[on, "__salt"], how=how)
    return out.drop("__salt")
