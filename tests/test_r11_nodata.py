"""r11 equivalence laws for ``run_to_memory(nodata_batches=False)``.

The trailing no-data micro-batch exists to advance the watermark and
fire watermark-GATED emission after the last data batch.  The opt-out
is only legal where the drained sink is already final after the data
batches; these tests pin (a) byte-equality for the safe shapes the
battery opted in, (b) the conf is restored after the drain, and (c)
the UNSAFE shape (append-mode windowed aggregation) really does lose
rows without the no-data batch — the reason the opt-out is per-query
and `stream_chained_windows` / `stream_interval_left_outer` keep the
default.
"""

from pyspark.sql import functions as F

from spark_alchemy_spark import streaming as stx

SF = "/root/testdata/sf0.001"

_NODATA_KEY = "spark.sql.streaming.noDataMicroBatches.enabled"


def _drain(spark, df, name, **kw):
    return sorted(
        tuple(r) for r in stx.run_to_memory(df, name, **kw).collect()
    )


def test_nodata_opt_out_complete_mode_identical(spark):
    stream = stx.read_events_stream(spark, SF)
    base = _drain(
        spark, stx.windowed_counts(stream), "t_nd_on", output_mode="complete"
    )
    off = _drain(
        spark,
        stx.windowed_counts(stx.read_events_stream(spark, SF)),
        "t_nd_off",
        output_mode="complete",
        nodata_batches=False,
    )
    assert base == off and len(base) > 0


def test_nodata_opt_out_inner_interval_join_identical(spark):
    def pairs(**kw):
        stream = stx.read_events_stream(spark, SF)
        clicks = stream.filter(F.col("event_type") == "click")
        purchases = stream.filter(F.col("event_type") == "purchase")
        return _drain(
            spark,
            stx.interval_join(clicks, purchases),
            "t_nd_ssj_" + ("off" if kw else "on"),
            output_mode="append",
            state_partitions=4,
            **kw,
        )

    base = pairs()
    off = pairs(nodata_batches=False)
    assert base == off and len(base) > 0


def test_nodata_opt_out_unsafe_for_append_windows(spark):
    """Append-mode windowed aggregation EMITS in the no-data batch
    (windows close when the watermark passes them); without it the
    drain ends before any window is final.  This is the failure mode
    that makes the opt-out per-query."""

    def counts(**kw):
        s = stx.read_events_stream(spark, SF).withWatermark("ts", "1 hour")
        agg = s.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"))
        return _drain(
            spark,
            agg,
            "t_nd_aw_" + ("off" if kw else "on"),
            output_mode="append",
            state_partitions=4,
            **kw,
        )

    base = counts()
    off = counts(nodata_batches=False)
    assert len(base) > 0
    assert len(off) < len(base)


def test_nodata_conf_restored_after_drain(spark):
    before = spark.conf.get(_NODATA_KEY, None)
    stream = stx.read_events_stream(spark, SF)
    stx.run_to_memory(
        stx.windowed_counts(stream),
        "t_nd_conf",
        output_mode="complete",
        nodata_batches=False,
    )
    assert spark.conf.get(_NODATA_KEY, None) == before

    spark.conf.set(_NODATA_KEY, "true")
    try:
        stx.run_to_memory(
            stx.windowed_counts(stx.read_events_stream(spark, SF)),
            "t_nd_conf2",
            output_mode="complete",
            nodata_batches=False,
        )
        assert spark.conf.get(_NODATA_KEY) == "true"
    finally:
        spark.conf.unset(_NODATA_KEY)
