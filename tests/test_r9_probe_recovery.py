"""Round-9 restart-recoverable streaming probe fit
(make_streaming_probe_maintainer): the moment-sum fold commits
atomically per micro-batch to probe_txn.json — the probe twin of the
IVF index transaction log — so a kill/restart replays into a visible
no-op skip and the recovered fit is BIT-IDENTICAL to an uninterrupted
one (VERDICT r8 task 2)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from spark_alchemy_spark.operators.probe import (
    _solve_ppm,
    fit_linear_probe_ppm,
    make_streaming_probe_maintainer,
    r2_ppm_from_sums,
)
from spark_alchemy_spark.streaming import _drain_foreach_batch


def _featurized(spark, lo, hi, op="I"):
    """Deterministic integer feature/label rows: y = 3 + 2*x1 - x2 +
    a small id-dependent residual, so the fit is nontrivial."""
    return spark.range(lo, hi).select(
        (F.col("id") % 13).alias("x1"),
        (F.col("id") % 7).alias("x2"),
        (
            3 + 2 * (F.col("id") % 13) - (F.col("id") % 7)
            + (F.col("id") % 3)
        ).alias("y"),
        F.lit(op).alias("op"),
    )


def _write_arrivals(spark, base):
    """Two mtime-ordered files => two deterministic micro-batches:
    batch 0 inserts [0,60); batch 1 inserts [60,90) and DELETES the
    multiples of 5 of batch 0 (before-images re-emitted)."""
    b0 = _featurized(spark, 0, 60).withColumn("r", F.lit(0))
    b1 = (
        _featurized(spark, 60, 90)
        .unionByName(
            _featurized(spark, 0, 60, op="D").filter(F.col("id") % 5 == 0)
        )
        .withColumn("r", F.lit(1))
    )
    b0.unionByName(b1).repartition("r").write.mode("overwrite").partitionBy(
        "r"
    ).parquet(base)
    for i in range(2):
        for leaf in glob.glob(os.path.join(base, f"r={i}", "*.parquet")):
            os.utime(leaf, (1_700_000_000 + i * 100,) * 2)


def _read_arrivals(spark, base):
    return (
        spark.readStream.schema("x1 long, x2 long, y long, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(base + "/*")
    )


def _surviving(spark):
    return _featurized(spark, 0, 90).filter(
        (F.col("id") >= 60) | (F.col("id") % 5 != 0)
    )


def test_probe_kill_restart_fit_bit_identical(spark, tmp_path):
    """Kill after batch 0's probe_txn commit but before the engine
    checkpoint commit; the restarted maintainer re-seeds from the
    record, skips the replay, and the final solve + R^2 are
    bit-identical to both an uninterrupted run and the batch fit."""
    base = str(tmp_path / "arrivals")
    _write_arrivals(spark, base)

    # uninterrupted reference run
    fold_a, st_a = make_streaming_probe_maintainer(
        str(tmp_path / "txn_a"), ["x1", "x2"], "y", op_col="op"
    )
    _drain_foreach_batch(
        _read_arrivals(spark, base), fold_a, state_partitions=4,
        checkpoint=str(tmp_path / "chk_a"),
    )
    assert [e["skipped_replay"] for e in st_a["log"]] == [False, False]

    # crashed run: the fold commits, THEN the injected crash fails the
    # batch post-side-effect — foreachBatch's at-least-once window
    txn_b, chk_b = str(tmp_path / "txn_b"), str(tmp_path / "chk_b")
    fold_b1, _st_b1 = make_streaming_probe_maintainer(
        txn_b, ["x1", "x2"], "y", op_col="op"
    )

    def crash_after_commit(batch_df, batch_id):
        fold_b1(batch_df, batch_id)
        raise RuntimeError("injected crash after probe commit")

    with pytest.raises(Exception, match="injected crash"):
        _drain_foreach_batch(
            _read_arrivals(spark, base), crash_after_commit,
            state_partitions=4, checkpoint=chk_b,
        )

    # restart: fresh maintainer (in-memory fold lost), same checkpoint
    fold_b2, st_b2 = make_streaming_probe_maintainer(
        txn_b, ["x1", "x2"], "y", op_col="op"
    )
    assert st_b2["last_batch_id"] == 0  # re-seeded from the record
    _drain_foreach_batch(
        _read_arrivals(spark, base), fold_b2, state_partitions=4,
        checkpoint=chk_b,
    )
    assert st_b2["log"][0] == {"batch_id": 0, "skipped_replay": True}

    assert st_b2["sums"] == st_a["sums"]
    n, coeffs = _solve_ppm(st_b2["sums"], d=2)
    r2 = r2_ppm_from_sums(st_b2["sums"], d=2)
    batch_fit = fit_linear_probe_ppm(_surviving(spark), ["x1", "x2"], "y")
    assert (n, coeffs, r2) == (
        batch_fit["n"], batch_fit["coeffs_ppm"], batch_fit["r2_ppm"]
    )


def test_probe_same_process_retry_recomputes_exactly(spark, tmp_path):
    """A same-process task retry (fold ran, commit ran, engine retries
    anyway) skips; a retry whose first attempt crashed BEFORE the
    commit recomputes from the un-updated state — no double-fold."""
    txn = str(tmp_path / "txn")
    fold, st = make_streaming_probe_maintainer(
        txn, ["x1", "x2"], "y", op_col="op"
    )
    b0 = _featurized(spark, 0, 40)
    fold(b0, 0)
    committed = dict(st["sums"])
    fold(b0, 0)  # replay of a committed batch
    assert st["log"][-1]["skipped_replay"] is True
    assert st["sums"] == committed
    # batch 1 folds on top exactly once
    fold(_featurized(spark, 40, 50), 1)
    ref = fit_linear_probe_ppm(_featurized(spark, 0, 50), ["x1", "x2"], "y")
    n, coeffs = _solve_ppm(st["sums"], d=2)
    assert (n, coeffs) == (ref["n"], ref["coeffs_ppm"])


def test_probe_plain_mode_without_ops(spark, tmp_path):
    """op_col=None: every batch merges (insert-only ingest)."""
    txn = str(tmp_path / "txn")
    fold, st = make_streaming_probe_maintainer(txn, ["x1", "x2"], "y")
    fold(_featurized(spark, 0, 30).drop("op"), 0)
    fold(_featurized(spark, 30, 60).drop("op"), 1)
    ref = fit_linear_probe_ppm(_featurized(spark, 0, 60), ["x1", "x2"], "y")
    n, coeffs = _solve_ppm(st["sums"], d=2)
    assert (n, coeffs) == (ref["n"], ref["coeffs_ppm"])


def test_probe_maintainer_rejects_unknown_ops(spark, tmp_path):
    fold, _st = make_streaming_probe_maintainer(
        str(tmp_path / "txn"), ["x1", "x2"], "y", op_col="op"
    )
    bad = _featurized(spark, 0, 10, op="U")
    with pytest.raises(ValueError, match="'I'/'D'"):
        fold(bad, 0)
