"""Slowly-changing-dimension maintenance (SCD type 2): apply a batch
of updates to a versioned dimension — close the current row of every
key whose tracked attributes changed, open a new current row, insert
brand-new keys, and leave everything else untouched.

The reference has no warehouse-maintenance surface; this rounds out the
"complete analytics engine" story next to the relational matrix, and is
the batch twin of the streaming upsert patterns in streaming/.

Scale design: one window (latest update per key) + one full-outer join
on the key + unions — the dimension's history rows never shuffle (they
pass through untouched), and the join is on the dimension's natural
key, so a key-bucketed dimension layout makes the whole apply
exchange-free on the dimension side.  Every piece is a plain
DataFrame/SQL composition, so the operation is oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    ts_col: str = "ts",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    tiebreak: str | None = None,
) -> DataFrame:
    """Apply ``updates`` (``key``, ``tracked...``, ``ts_col``) to a
    type-2 dimension (``key``, attributes, ``from_col``, ``to_col``
    with NULL = current).

    * several updates for one key: the latest by (``ts_col``,
      ``tiebreak``) wins (pass a unique tiebreak column for
      deterministic batches);
    * a key whose tracked attributes are unchanged (null-safe
      comparison) is left alone;
    * a changed key's current row closes at the update timestamp and a
      new current row opens at it, carrying non-tracked attributes
      forward;
    * a brand-new key opens its first row (non-tracked attributes
      NULL, ``from_col`` = update timestamp).

    Returns the full new dimension (history + current rows).
    """
    carried = [
        c for c in dim.columns if c not in {key, from_col, to_col, *tracked}
    ]
    order = [F.col(ts_col).desc()] + (
        [F.col(tiebreak).desc()] if tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    latest = (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col(key).alias("__ukey"),
            F.col(ts_col).alias("__uts"),
            *[F.col(c).alias(f"__u_{c}") for c in tracked],
        )
    )
    history = dim.filter(F.col(to_col).isNotNull())
    current = dim.filter(F.col(to_col).isNull())
    j = current.join(latest, F.col(key) == F.col("__ukey"), "full_outer")

    same = F.lit(True)
    for c in tracked:
        same = same & F.col(c).eqNullSafe(F.col(f"__u_{c}"))
    has_cur = F.col(key).isNotNull()
    has_upd = F.col("__ukey").isNotNull()

    out_cols = [key, *tracked, *carried, from_col, to_col]
    untouched = j.filter(has_cur & (~has_upd | same)).select(*out_cols)
    closed = j.filter(has_cur & has_upd & ~same).select(
        key,
        *tracked,
        *carried,
        from_col,
        F.col("__uts").alias(to_col),
    )
    opened = j.filter(has_upd & (~has_cur | ~same)).select(
        F.coalesce(F.col(key), F.col("__ukey")).alias(key),
        *[F.col(f"__u_{c}").alias(c) for c in tracked],
        *carried,  # NULL for brand-new keys (no current row to carry)
        F.col("__uts").alias(from_col),
        F.lit(None).cast(dim.schema[to_col].dataType).alias(to_col),
    )
    return history.select(*out_cols).unionByName(untouched).unionByName(
        closed
    ).unionByName(opened)
