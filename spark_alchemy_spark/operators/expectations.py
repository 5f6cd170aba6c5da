"""Data-quality expectation checks (deequ-style, DataFrame-native):
declare rules against a table, get back one row per rule with observed
violation counts — the governance gate a production pipeline runs
before promoting a batch.

All row-level rules compile into ONE aggregation pass (each rule is a
conditional count in the same ``agg``); ``unique`` adds its exact
distinct count to the same pass.  No Python in the evaluation path —
the rules become codegen'd conditional aggregates, so checking 100 TB
costs one scan regardless of rule count.

Drift detection (:func:`psi_drift`) compares two snapshots' value
distributions over fixed bins with the population-stability index —
the standard "did the data move under me" alarm between pipeline runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_expectations(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate ``rules`` in one pass.  Each rule is a dict:

    * ``{"name", "kind": "not_null", "column"}``
    * ``{"name", "kind": "unique", "column"}``
    * ``{"name", "kind": "in_range", "column", "lo", "hi"}``
    * ``{"name", "kind": "accepted_values", "column", "values"}``

    Returns (rule, column, violations, passed)."""
    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, r in enumerate(rules):
        c = F.col(r["column"])
        kind = r["kind"]
        if kind == "not_null":
            bad = c.isNull()
        elif kind == "in_range":
            bad = c.isNull() | ~c.between(r["lo"], r["hi"])
        elif kind == "accepted_values":
            bad = c.isNull() | ~c.isin(*r["values"])
        elif kind == "unique":
            aggs.append(
                (F.count(c) - F.countDistinct(c)).alias(f"__viol_{i}")
            )
            continue
        else:
            raise ValueError(f"unknown expectation kind: {kind}")
        aggs.append(F.sum(bad.cast("long")).alias(f"__viol_{i}"))
    wide = df.agg(*aggs)
    stack_args = []
    for i, r in enumerate(rules):
        stack_args.extend(
            [F.lit(r["name"]), F.lit(r["column"]), F.col(f"__viol_{i}")]
        )
    return wide.select(
        F.stack(F.lit(len(rules)), *stack_args).alias(
            "rule", "column", "violations"
        )
    ).withColumn("passed", F.col("violations") == 0)


def psi_drift(
    baseline: DataFrame,
    current: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population-stability index between two snapshots of
    ``value_col`` over ``bins`` fixed-width bins on [lo, hi] (values
    outside clamp to the edge bins; fixed edges keep the comparison —
    and the oracle — deterministic).  Returns one row per bin:
    (bin, p_baseline, q_current, psi_contrib), 6dp; ``sum(psi_contrib)``
    over the result is the PSI (rule of thumb: > 0.2 = major shift).

    Two grouped counts + a broadcast join on the bin id — each
    snapshot is scanned once."""

    def binned(df, name):
        x = F.col(value_col).cast("double")
        b = F.least(
            F.lit(bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((x - lo) / ((hi - lo) / bins)).cast("int"),
            ),
        )
        out = df.select(b.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias(f"__n_{name}")
        )
        total = out.agg(F.sum(f"__n_{name}").alias(f"__t_{name}"))
        return out.join(F.broadcast(total)).select(
            "bin",
            (F.col(f"__n_{name}") / F.col(f"__t_{name}")).alias(f"__f_{name}"),
        )
    p = binned(baseline, "p")
    q = binned(current, "q")
    grid = baseline.sparkSession.range(bins).select(F.col("id").cast("int").alias("bin"))
    j = (
        grid.join(F.broadcast(p), "bin", "left")
        .join(F.broadcast(q), "bin", "left")
        .select(
            "bin",
            (F.coalesce("__f_p", F.lit(0.0)) + eps).alias("__p"),
            (F.coalesce("__f_q", F.lit(0.0)) + eps).alias("__q"),
        )
    )
    contrib = (F.col("__p") - F.col("__q")) * F.log(F.col("__p") / F.col("__q"))
    return j.select(
        "bin",
        F.round("__p", 6).alias("p_baseline"),
        F.round("__q", 6).alias("q_current"),
        F.round(contrib, 6).alias("psi_contrib"),
    )


def ks_statistic_ppm(
    a: DataFrame, b: DataFrame, value_col: str
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the ``value_col``
    distributions of ``a`` and ``b``, in integer PARTS PER MILLION —
    the second standard drift metric next to :func:`psi_drift` (PSI
    needs binning; KS is binning-free and sensitive to location
    shifts).

    Shape: tag + union the two sides, aggregate counts per DISTINCT
    value (map-side combinable — the shuffle carries distinct values,
    not rows), one window cumsum over the merged value axis, then
    ``max |cumA * nB - cumB * nA|`` cross-multiplied in DECIMAL(38)
    and floor-divided to ppm — no float division anywhere, so any
    engine replays the exact integer.  The single global-order window
    is over DISTINCT values; at 100 TB swap it for a range-partitioned
    cumsum (``plan_range_partitions``) the same way the binned-CDF
    weighted median documents.

    Returns 1 row: (n_a, n_b, ks_ppm).
    """
    from pyspark.sql.window import Window

    ta = a.select(F.col(value_col).alias("__v"), F.lit(1).alias("__a"), F.lit(0).alias("__b"))
    tb = b.select(F.col(value_col).alias("__v"), F.lit(0).alias("__a"), F.lit(1).alias("__b"))
    per_v = (
        ta.unionByName(tb)
        .groupBy("__v")
        .agg(F.sum("__a").alias("ca"), F.sum("__b").alias("cb"))
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_v.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    totals = per_v.agg(
        F.sum("ca").cast("long").alias("n_a"), F.sum("cb").cast("long").alias("n_b")
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .select(
            "n_a",
            "n_b",
            F.expr(
                "CAST(abs(CAST(cum_a AS DECIMAL(38,0)) * n_b "
                "     - CAST(cum_b AS DECIMAL(38,0)) * n_a) * 1000000 "
                "DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
            ).alias("__gap_ppm"),
        )
        .groupBy("n_a", "n_b")
        .agg(F.max("__gap_ppm").alias("ks_ppm"))
    )
