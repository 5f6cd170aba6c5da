"""Incremental aggregate maintenance: keep a grouped-aggregate table
current by merging partial states from delta batches instead of
recomputing from all history — the plain-measure twin of the sketch
reaggregation story (functions/hll.py): every state column is chosen
to be MERGEABLE (sum, count, min, max; avg derives at read time), so

    state(full corpus) == merge(state(old), state(delta))

holds exactly and the maintenance cost tracks the delta, not the
history.  At 100 TB this is the difference between an hourly
aggregate refresh scanning one hour and scanning three years.

Merging is union + re-aggregate — no join, map-side combinable, and
associative, so states can themselves be sharded/tiered (hour -> day
-> month) like sketch rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Build the mergeable state for ``value_col`` grouped by ``keys``:
    (keys..., __sum, __cnt, __min, __max)."""
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.sum(v).alias("__sum"),
        F.count(v).alias("__cnt"),
        F.min(v).alias("__min"),
        F.max(v).alias("__max"),
    )


def merge_states(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two state tables (associative, commutative)."""
    u = a.unionByName(b)
    return u.groupBy(*keys).agg(
        F.sum("__sum").alias("__sum"),
        F.sum("__cnt").alias("__cnt"),
        F.min("__min").alias("__min"),
        F.max("__max").alias("__max"),
    )


def finalize(state: DataFrame, keys: list[str]) -> DataFrame:
    """Read-time view of a state table: totals plus the derived mean."""
    return state.select(
        *keys,
        F.col("__cnt").alias("n"),
        F.round("__sum", 2).alias("total"),
        F.round("__min", 2).alias("min_value"),
        F.round("__max", 2).alias("max_value"),
        F.round(F.col("__sum") / F.col("__cnt"), 4).alias("mean_value"),
    )
