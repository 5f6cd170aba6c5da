"""Data profiling: one-pass per-column statistics for corpus / table
auditing — the engine's ``DESCRIBE``-with-teeth.

One wide aggregate computes every column's counts, null counts,
min/max and (numeric-only) mean; each EXACT distinct count runs as its
own single-column subplan (parquet column pruning means each reads one
column; partial aggregation shrinks it map-side) and joins back as a
broadcast one-row table, then a ``stack`` unpivot emits one row per
column.  This beats the multi-distinct Expand plan ~4x (the Expand
duplicates every row once per distinct aggregate); at 100 TB the
per-column scans read the same total bytes as one all-column scan, or
swap the distincts for the HLL sketches in functions/hll.py (mergeable,
truly one pass) — the profile schema is identical either way.

min/max are emitted as strings (one output schema for every column
type); numeric min/max/mean are rounded to a 4dp grid first so the
string rendering is engine-stable (raw shortest-round-trip double
formatting differs between runtimes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value, mean_value) — one aggregation job."""
    columns = columns or df.columns
    aggs = []
    for c in columns:
        numeric = isinstance(df.schema[c].dataType, NumericType)
        mn, mx = F.min(c), F.max(c)
        if numeric:
            mn, mx = F.round(mn, 4), F.round(mx, 4)
        aggs.extend(
            [
                F.count(F.lit(1)).alias(f"__n_{c}"),
                F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
                mn.cast("string").alias(f"__min_{c}"),
                mx.cast("string").alias(f"__max_{c}"),
                (
                    F.round(F.avg(c), 4) if numeric else F.lit(None).cast("double")
                ).alias(f"__mean_{c}"),
            ]
        )
    wide = df.agg(*aggs)
    for c in columns:
        # exact distinct as its own pruned single-column subplan
        d = (
            df.select(c)
            .where(F.col(c).isNotNull())
            .distinct()
            .agg(F.count(F.lit(1)).alias(f"__dist_{c}"))
        )
        wide = wide.join(F.broadcast(d))
    stack_args = []
    for c in columns:
        stack_args.extend(
            [
                F.lit(c),
                F.col(f"__n_{c}"),
                F.col(f"__nulls_{c}"),
                F.col(f"__dist_{c}"),
                F.col(f"__min_{c}"),
                F.col(f"__max_{c}"),
                F.col(f"__mean_{c}"),
            ]
        )
    return wide.select(
        F.stack(
            F.lit(len(columns)),
            *stack_args,
        ).alias(
            "column", "n_rows", "n_nulls", "n_distinct",
            "min_value", "max_value", "mean_value",
        )
    )
