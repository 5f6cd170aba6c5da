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


def test_isotonic_cdc_kill_restart_bit_identical(spark, tmp_path):
    """The histogram maintainer's commit protocol: kill after batch
    0's iso_txn commit but before the engine checkpoint; the restarted
    maintainer re-seeds from the record, skips the replay, and the
    final re-fit equals both the uninterrupted fold and the batch
    calibration over survivors."""
    import glob
    import os

    import pytest as _pytest

    from spark_alchemy_spark.operators.probe import (
        isotonic_calibration_ppm,
        isotonic_fit_from_hist,
        make_streaming_isotonic_maintainer,
    )
    from spark_alchemy_spark.streaming import _drain_foreach_batch

    def rows(lo, hi, op="I"):
        return spark.range(lo, hi).select(
            (F.col("id") % 10).alias("score"),
            ((F.col("id") * 2654435761) % 100 < 8 * (F.col("id") % 10))
            .cast("int").alias("label"),
            F.lit(op).alias("op"),
        )

    base = str(tmp_path / "arrivals")
    b0 = rows(0, 80).withColumn("r", F.lit(0))
    b1 = (
        rows(80, 120)
        .unionByName(rows(0, 80, op="D").filter(F.col("id") % 4 == 0))
        .withColumn("r", F.lit(1))
    )
    b0.unionByName(b1).repartition("r").write.mode("overwrite").partitionBy(
        "r"
    ).parquet(base)
    for i in range(2):
        for leaf in glob.glob(os.path.join(base, f"r={i}", "*.parquet")):
            os.utime(leaf, (1_700_000_000 + i * 100,) * 2)

    def read():
        return (
            spark.readStream.schema("score long, label int, op string")
            .option("maxFilesPerTrigger", 1)
            .parquet(base + "/*")
        )

    txn, chk = str(tmp_path / "txn"), str(tmp_path / "chk")
    fold1, _st1 = make_streaming_isotonic_maintainer(
        txn, "score", "label", op_col="op"
    )

    def crash_after_commit(df, bid):
        fold1(df, bid)
        raise RuntimeError("injected crash after iso commit")

    with _pytest.raises(Exception, match="injected crash"):
        _drain_foreach_batch(read(), crash_after_commit,
                             state_partitions=4, checkpoint=chk)

    fold2, st2 = make_streaming_isotonic_maintainer(
        txn, "score", "label", op_col="op"
    )
    assert st2["last_batch_id"] == 0  # re-seeded from the record
    _drain_foreach_batch(read(), fold2, state_partitions=4, checkpoint=chk)
    assert st2["log"][0] == {"batch_id": 0, "skipped_replay": True}

    surviving = spark.range(0, 120).filter(
        (F.col("id") >= 80) | (F.col("id") % 4 != 0)
    ).select(
        (F.col("id") % 10).alias("score"),
        ((F.col("id") * 2654435761) % 100 < 8 * (F.col("id") % 10))
        .cast("int").alias("label"),
    )
    assert isotonic_fit_from_hist(st2["hist"]) == isotonic_calibration_ppm(
        surviving, "score", "label"
    )


def test_isotonic_cdc_underflow_fails_loud(spark, tmp_path):
    from spark_alchemy_spark.operators.probe import (
        make_streaming_isotonic_maintainer,
    )
    import pytest as _pytest

    fold, _st = make_streaming_isotonic_maintainer(
        str(tmp_path / "txn"), "score", "label", op_col="op"
    )
    fold(_mk(spark, [(1, 1), (1, 0)]).withColumn("op", F.lit("I")), 0)
    bad = _mk(spark, [(1, 1), (1, 1)]).withColumn("op", F.lit("D"))
    with _pytest.raises(ValueError, match="underflow"):
        fold(bad, 1)  # deletes 2 positives where only 1 was inserted


def test_isotonic_transform_rejects_empty_fit():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty fit"):
        isotonic_transform_ppm([], "score")
