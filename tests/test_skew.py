"""salted_join semantics: identical results to a plain equi-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_alchemy_spark.operators.skew import hot_keys, salted_join


def test_salted_join_matches_plain_join(spark):
    # skewed left: key 0 holds 90% of rows
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(0)).otherwise(F.col("id") % 7).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.createDataFrame([(i, f"r{i}") for i in range(7)], "k long, rv string")
    plain = left.join(right, "k").select("k", "lv", "rv")
    salted = salted_join(left, right, "k", salt=8).select("k", "lv", "rv")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "z")], "k long, lv string")
    right = spark.createDataFrame([(1, "r1"), (2, "r2")], "k long, rv string")
    out = salted_join(left, right, "k", salt=4, how="left").collect()
    assert len(out) == 3
    assert {r["rv"] for r in out if r["k"] == 99} == {None}


def test_hot_keys(spark):
    df = spark.range(100).select((F.col("id") % 10).alias("k"))
    hot = df.union(spark.range(500).select(F.lit(3).alias("k")))
    keys = [r["k"] for r in hot_keys(hot, "k", min_rows=100).collect()]
    assert keys == [3]
