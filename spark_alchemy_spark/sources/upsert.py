"""Merge-on-read upserts: a base snapshot plus an append-only change
log (full row images + tombstones), merged lazily at read time —
latest row per key wins, tombstones delete.  The lakehouse pattern
behind Hudi/Iceberg MoR tables, expressed as plain DataFrames so any
parquet directory pair becomes an upsertable table.

Scale notes: the merge is ONE window over the key (no join) — at read
scale this is the same shuffle a snapshot rebuild would pay, but only
on base ∪ log rather than base × rewrites; ``compact`` materializes
the merged view back into a new base when the log grows past its
amortization point (the copy-on-write flip).  With both inputs
bucketed by the key the window sort is exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_on_read(
    base: DataFrame,
    log: DataFrame,
    key: str,
    ts_col: str,
    tiebreak: str | None = None,
    deleted_col: str = "_deleted",
) -> DataFrame:
    """Read-time latest-wins merge of ``base`` (the snapshot; needs the
    same columns, typically with an epoch ``ts_col``) and ``log``
    (full-row upserts; ``deleted_col`` true = tombstone).  Several
    changes to one key resolve by (``ts_col``, ``tiebreak``) —
    pass a unique tiebreak for deterministic replay.  Returns the
    current view without ``ts_col``/``tiebreak``/``deleted_col``."""
    u = base.unionByName(log)
    order = [F.col(ts_col).desc()] + (
        [F.col(tiebreak).desc()] if tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    drop = [ts_col, deleted_col, "__rn"] + ([tiebreak] if tiebreak else [])
    return (
        u.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & ~F.col(deleted_col))
        .drop(*drop)
    )


def compact(
    base: DataFrame,
    log: DataFrame,
    key: str,
    ts_col: str,
    path: str,
    tiebreak: str | None = None,
    deleted_col: str = "_deleted",
) -> DataFrame:
    """Copy-on-write flip: materialize the merged view as the new base
    snapshot at ``path`` and return the re-read DataFrame (the log can
    then be truncated by the caller)."""
    merged = merge_on_read(base, log, key, ts_col, tiebreak, deleted_col)
    merged.write.mode("overwrite").parquet(path)
    return merged.sparkSession.read.parquet(path)
