"""Round-9 isotonic calibration (PAVA over a bounded score histogram,
exact integer arithmetic): monotone law, Fraction-exact minimax
equality, identity on already-monotone data, and the codegen
transform column."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from spark_alchemy_spark.operators.probe import (
    PPM,
    isotonic_calibration_ppm,
    isotonic_transform_ppm,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "score long, label int")


def _noisy(spark, n=400):
    """Deterministic noisy data: positive rate loosely increases with
    score but with planted local violations PAVA must pool."""
    return spark.range(n).select(
        (F.col("id") % 20).alias("score"),
        (
            (
                (F.col("id") * 2654435761) % 100
                < 20 + 3 * (F.col("id") % 20)
                + 25 * ((F.col("id") % 20) % 3 == 2).cast("int")
            )
        ).cast("int").alias("label"),
    )


def _minimax_reference(df):
    """Brute-force Fraction minimax: rate(k) = max_{i<=k} min_{j>=k}
    pos(i..j)/n(i..j), then the same trunc-ppm pin."""
    hist = sorted(
        (int(r["score"]), int(r["n"]), int(r["np"]))
        for r in df.groupBy("score")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("label").alias("np"))
        .collect()
    )
    b = len(hist)
    out = {}
    for k in range(b):
        best = None
        for i in range(k + 1):
            worst = None
            for j in range(k, b):
                n = sum(h[1] for h in hist[i:j + 1])
                p = sum(h[2] for h in hist[i:j + 1])
                f = Fraction(p, n)
                worst = f if worst is None or f < worst else worst
            best = worst if best is None or worst > best else best
        out[hist[k][0]] = best.numerator * PPM // best.denominator
    return out


def test_isotonic_monotone_and_matches_minimax(spark):
    df = _noisy(spark)
    fit = isotonic_calibration_ppm(df, "score", "label")
    rates = [r["rate_ppm"] for r in fit]
    assert rates == sorted(rates)  # monotone non-decreasing
    ref = _minimax_reference(df)
    assert {r["score"]: r["rate_ppm"] for r in fit} == ref
    # raw histogram counts are preserved per score
    assert sum(r["n"] for r in fit) == 400


def test_isotonic_identity_on_monotone_data(spark):
    """Already-monotone rates come back as the raw per-score rates —
    PAVA pools nothing."""
    rows = []
    for s in range(8):
        rows += [(s, 1)] * s + [(s, 0)] * (8 - s)
    fit = isotonic_calibration_ppm(_mk(spark, rows), "score", "label")
    assert [r["rate_ppm"] for r in fit] == [
        s * PPM // 8 for s in range(8)
    ]


def test_isotonic_pools_violation_exactly(spark):
    """One planted violation: scores 1 (3/4 positive) and 2 (1/4
    positive) pool to 4/8 exactly."""
    rows = (
        [(0, 0)] * 4
        + [(1, 1)] * 3 + [(1, 0)]
        + [(2, 1)] + [(2, 0)] * 3
        + [(3, 1)] * 4
    )
    fit = isotonic_calibration_ppm(_mk(spark, rows), "score", "label")
    assert [r["rate_ppm"] for r in fit] == [0, 500_000, 500_000, PPM]
    assert [(r["n"], r["n_pos"]) for r in fit] == [
        (4, 0), (4, 3), (4, 1), (4, 4)
    ]


def test_isotonic_transform_is_codegen_step_function(spark):
    df = _noisy(spark)
    fit = isotonic_calibration_ppm(df, "score", "label")
    col = isotonic_transform_ppm(fit, "score")
    got = {
        int(r["score"]): int(r["cal"])
        for r in df.select("score", col.alias("cal")).distinct().collect()
    }
    assert got == {r["score"]: r["rate_ppm"] for r in fit}
    # unseen scores: below-min takes the first rate, gaps take the
    # greatest fitted score below, above-max takes the last rate
    probe = spark.createDataFrame(
        [(-5,), (fit[-1]["score"] + 100,)], "score long"
    )
    vals = [
        int(r["cal"])
        for r in probe.select(col.alias("cal")).orderBy("cal").collect()
    ]
    assert vals == sorted([fit[0]["rate_ppm"], fit[-1]["rate_ppm"]])
    # pure codegen: no Python eval in the plan
    plan = df.select(col.alias("cal"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
