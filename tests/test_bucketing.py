"""Bucketed co-located joins: the join on the bucket key must plan with
zero shuffle exchanges (the write amortized them)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_alchemy_spark import plans
from spark_alchemy_spark.sources.bucketing import read_bucketed, write_bucketed
from spark_alchemy_spark.sources.tpch import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    write_bucketed(load_table(spark, SF, "orders"), "b_orders", "o_custkey", 8)
    write_bucketed(
        load_table(spark, SF, "customer").withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer",
        "o_custkey",
        8,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, "b_orders").join(
            read_bucketed(spark, "b_customer"), "o_custkey"
        )
        assert plans.num_exchanges(j) == 0
        assert "SortMergeJoin" in plans.join_strategies(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_has_no_exchange(spark, bucketed):
    agg = (
        read_bucketed(spark, "b_orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert plans.num_exchanges(agg) == 0


def test_bucketed_join_results_match_plain(spark, bucketed):
    plain = (
        load_table(spark, SF, "orders")
        .groupBy("o_custkey")
        .count()
        .orderBy("o_custkey")
        .collect()
    )
    bucked = (
        read_bucketed(spark, "b_orders")
        .groupBy("o_custkey")
        .count()
        .orderBy("o_custkey")
        .collect()
    )
    assert plain == bucked


def test_merge_on_read_and_compact(spark, tmp_path):
    """Upsert wins over base, tombstone deletes, compact round-trips
    to the same view."""
    import datetime as dt

    from spark_alchemy_spark.sources.upsert import compact, merge_on_read

    TS = dt.datetime
    base = spark.createDataFrame(
        [(1, "a", TS(2020, 1, 1), -1, False),
         (2, "b", TS(2020, 1, 1), -1, False),
         (3, "c", TS(2020, 1, 1), -1, False)],
        "k long, v string, ts timestamp, seq long, _deleted boolean",
    )
    log = spark.createDataFrame(
        [(1, "a2", TS(2021, 1, 1), 1, False),   # update
         (1, "a3", TS(2021, 1, 1), 2, False),   # same ts, higher seq wins
         (2, None, TS(2021, 1, 1), 3, True),    # tombstone
         (9, "new", TS(2021, 1, 1), 4, False)], # insert
        "k long, v string, ts timestamp, seq long, _deleted boolean",
    )
    view = merge_on_read(base, log, "k", "ts", tiebreak="seq")
    got = {r["k"]: r["v"] for r in view.collect()}
    assert got == {1: "a3", 3: "c", 9: "new"}
    assert view.columns == ["k", "v"]  # bookkeeping columns dropped
    snap = compact(base, log, "k", "ts", str(tmp_path / "snap"), tiebreak="seq")
    assert {r["k"]: r["v"] for r in snap.collect()} == got


def test_zorder_write_clusters_both_dims(spark, tmp_path):
    """Z-order's payoff is file skipping on EITHER dimension: for a
    narrow day-range query, a custkey-sorted layout leaves day
    unbounded in every file (all files overlap the range), while the
    Z-ordered layout confines the range to a few tiles.  Measured on
    parquet footer-equivalent per-file min/max."""
    import pyspark.sql.functions as F

    from spark_alchemy_spark.sources import load_tables
    from spark_alchemy_spark.sources.zorder import write_zordered

    orders = load_tables(spark, "/root/testdata/sf0.001", ("orders",))["orders"]
    day = (F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long")
    df = orders.select("o_custkey", day.alias("day"))
    lo, hi, n = df.agg(F.min("day"), F.max("day"), F.count("*")).collect()[0]
    # normalize day to the 8-bit grid (zorder_key needs in-range ints;
    # production callers use a rank/bucket mapping the same way)
    df = df.withColumn(
        "day_cell", ((F.col("day") - lo) * 255 / (hi - lo)).cast("long")
    )

    def files_overlapping_day_range(path, d_lo, d_hi):
        got = spark.read.parquet(path).select(
            "day", F.input_file_name().alias("f")
        )
        spans = got.groupBy("f").agg(
            F.min("day").alias("mn"), F.max("day").alias("mx")
        )
        return spans.filter(
            (F.col("mn") <= d_hi) & (F.col("mx") >= d_lo)
        ).count(), spans.count()

    z_path = str(tmp_path / "zorder")
    write_zordered(df, z_path, "o_custkey", "day_cell", bits=8, num_files=16)
    lin_path = str(tmp_path / "linear")
    (df.repartitionByRange(16, "o_custkey")
       .sortWithinPartitions("o_custkey")
       .write.mode("overwrite").parquet(lin_path))

    q_lo, q_hi = lo + 1000, lo + 1060  # a 60-day window
    z_hit, z_total = files_overlapping_day_range(z_path, q_lo, q_hi)
    l_hit, l_total = files_overlapping_day_range(lin_path, q_lo, q_hi)
    assert z_total == 16 and l_total == 16
    assert l_hit == 16            # custkey sort: day unbounded everywhere
    assert z_hit <= 8, z_hit      # z-order: the window touches few tiles


def test_plan_range_partitions_balanced(spark):
    from pyspark.sql import functions as F

    from spark_alchemy_spark.sources.bucketing import plan_range_partitions

    df = spark.range(100000).select(F.col("id").cast("double").alias("v"))
    splits = {
        r["split_idx"]: r["split_value"]
        for r in plan_range_partitions(df, "v", 4, k=800).collect()
    }
    assert sorted(splits) == [1, 2, 3]
    for i, v in splits.items():
        assert abs(v - i * 25000) < 2500, (i, v)  # within 10% of exact
    import pytest

    with pytest.raises(ValueError):
        plan_range_partitions(df, "v", 1)
