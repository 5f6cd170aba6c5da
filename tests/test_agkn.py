"""hll_convert / AgKn codec tests — the engine's analogue of the
reference's STRM->AGKN conversion accuracy suite
(HLLFunctionsTest.scala:356-386) and the byte-format half of the
Postgres interop gate (PostgresInteropTest.scala:55-99): sketches
converted to the postgresql-hll v1 layout must round-trip their
registers and estimate the same cardinality."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_alchemy_spark.functions import hll
from spark_alchemy_spark.functions.agkn import (
    agkn_cardinality,
    agkn_cardinality_udf,
    agkn_registers,
    ds_registers,
    ds_to_agkn,
)
from spark_alchemy_spark.functions.sketch_codec import sketch_bytes_from_hashes


def test_conversion_accuracy_10k(spark):
    """p=20, n=10000 (the reference's conversion-accuracy config,
    HLLFunctionsTest.scala:356-377): converted estimate within +-1 of
    the native estimate."""
    rng = np.random.default_rng(42)
    vals = [int(v) for v in rng.integers(-(2**62), 2**62, size=10_000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    row = df.agg(
        hll.hll_init_agg("v", 0.0015).alias("sk")
    ).select(
        "sk", hll.hll_cardinality("sk").alias("est")
    ).collect()[0]
    converted = ds_to_agkn(bytes(row["sk"]))
    assert abs(agkn_cardinality(converted) - row["est"]) <= 1


@pytest.mark.parametrize("n,lgk", [(0, 12), (5, 12), (200, 12), (10_000, 9)])
def test_register_roundtrip(spark, n, lgk):
    """DS image (LIST/SET/dense) -> AgKn FULL -> parse-back preserves
    every register (capped at the 6-bit regwidth)."""
    if n:
        df = spark.range(n).select(F.xxhash64("id").alias("h"))
        sk = bytes(
            df.agg(F.hll_sketch_agg("h", F.lit(lgk)).alias("sk")).collect()[0]["sk"]
        )
    else:
        sk = sketch_bytes_from_hashes(np.array([], dtype=np.int64), lgk)
    lg, regs = ds_registers(sk)
    log2m, regwidth, back = agkn_registers(ds_to_agkn(sk))
    assert (log2m, regwidth) == (lg, 6)
    assert np.array_equal(np.minimum(regs, 63), back)


def test_python_list_set_images_convert():
    """Our per-row writer's LIST and SET images convert too (hll_init
    output is convertible without touching the JVM)."""
    for n in (0, 3, 20, 500):
        b = sketch_bytes_from_hashes(np.arange(n, dtype=np.int64) * 2654435761, 14)
        est = agkn_cardinality(ds_to_agkn(b))
        assert abs(est - n) <= max(2, 0.02 * n)


def test_hll_convert_column(spark):
    """hll_convert as a Column op: DS sketches per group -> AgKn bytes;
    AgKn-side estimates equal the exact distinct counts (small n)."""
    df = spark.createDataFrame(
        [(i % 3, i % 25) for i in range(300)], "g int, v int"
    )
    out = (
        df.groupBy("g")
        .agg(hll.hll_init_agg("v", 0.0015).alias("sk"))
        .select(
            "g",
            agkn_cardinality_udf()(hll.hll_convert("sk", "DS", "AGKN")).alias("n"),
        )
        .orderBy("g")
        .collect()
    )
    assert [r["n"] for r in out] == [25, 25, 25]


def test_hll_convert_rejects_unsupported():
    with pytest.raises(ValueError, match="not supported"):
        hll.hll_convert(F.lit(None), "AGKN", "DS")
