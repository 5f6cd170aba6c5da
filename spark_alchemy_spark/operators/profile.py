"""Data profiling: one-pass per-column statistics for corpus / table
auditing — the engine's ``DESCRIBE``-with-teeth.

One wide aggregate computes every column's counts, null counts, exact
distincts, min/max and (numeric-only) mean, then a ``stack`` unpivot
emits one row per column.  Exact multi-column ``count(DISTINCT ...)``
makes Catalyst plan an Expand (one duplicated stream per distinct
aggregate) — the honest cost of exact profiling; at 100 TB swap the
distinct counts for the HLL sketches in functions/hll.py (same shape,
mergeable, one pass) — the profile schema is identical either way.

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
                F.countDistinct(c).alias(f"__dist_{c}"),
                mn.cast("string").alias(f"__min_{c}"),
                mx.cast("string").alias(f"__max_{c}"),
                (
                    F.round(F.avg(c), 4) if numeric else F.lit(None).cast("double")
                ).alias(f"__mean_{c}"),
            ]
        )
    wide = df.agg(*aggs)
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
