"""Bucketed managed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant join cost is the shuffle; bucketing both fact
tables by the join key at write time amortizes that shuffle into the
(one-off) write, after which every join/aggregation on the bucket key
plans with **zero exchanges** — asserted by tests/test_bucketing.py via
the plans layer.  Bucket count is a storage-layout decision: pick it
for the target cluster's reducer parallelism, not the current job's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _clear_orphan_location(spark: SparkSession, table: str) -> None:
    """Remove a stale managed-table directory the metastore doesn't know
    about (a crashed prior session can leave the warehouse dir behind
    while the fresh per-session metastore has no table entry, and
    saveAsTable then fails with LOCATION_ALREADY_EXISTS)."""
    import os
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:") :]
    loc = os.path.join(warehouse, table.lower())
    if warehouse and os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sorted_by_key: bool = True,
) -> None:
    """Persist as a managed parquet table bucketed (and by default
    sorted) by ``key`` — sorting lets sort-merge joins skip their sort."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    _clear_orphan_location(spark, table)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sorted_by_key:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def plan_range_partitions(
    df, col: str, num_partitions: int, k: int = 800
):
    """Balanced range-partition split points from a KLL sketch: the
    ``num_partitions - 1`` equi-depth quantiles of ``col``, computed
    with ONE map-side-combinable sketch aggregate — the planning pass
    for ``repartitionByRange`` / sorted parquet writes / per-range
    compaction at 100 TB, where Spark's own RangePartitioner samples
    per-use and a persisted plan lets every downstream job agree on
    the same boundaries.

    The split at index i targets rank i / num_partitions; KLL's
    normalized-rank guarantee (~0.6% at k=800, 99% confidence) bounds
    how unbalanced a resulting partition can be.  Returns
    (split_idx 1-based, split_value double) — feed the values to a
    range-bucketing CASE or ``repartitionByRange`` seed frame.
    """
    from pyspark.sql import functions as F

    from ..functions.sketches import kll_init_agg, kll_quantile

    if num_partitions < 2:
        raise ValueError("need num_partitions >= 2")
    sk = df.agg(kll_init_agg(col, k).alias("__sk"))
    splits = [
        F.struct(
            F.lit(i).alias("split_idx"),
            kll_quantile("__sk", i / num_partitions).alias("split_value"),
        )
        for i in range(1, num_partitions)
    ]
    return sk.select(
        F.explode(F.array(*splits)).alias("__s")
    ).select("__s.split_idx", "__s.split_value")


def exact_percentiles(df, col: str, percentages) -> DataFrame:
    """Exact interpolated percentiles of ``col`` as a LAZY codegen
    histogram plan — bit-identical to ``percentile(col,
    array(<percentages>))`` (pinned by
    tests/test_r11_kernels.py::test_exact_percentiles_matches_percentile
    on real and adversarial duplicate-heavy data; r11, guide §1.2).

    Spark's exact ``percentile`` buffers one (value -> count)
    OpenHashMap per partial aggregate and merges + sorts them in ONE
    final task (~2.5-3s over sf0.1 lineitem).  The identical result
    follows from a codegen ``groupBy(value).count()`` histogram +
    one ordered window over the DISTINCT values (the same
    distinct-bounded single-task envelope the builtin's merge pays)
    + the builtin's own interpolation arithmetic, replicated
    operation-for-operation in SQL doubles:

        pos    = p * (n - 1)          -- n rows, NULLs excluded
        lower  = floor(pos); higher = ceil(pos)
        result = v[lower]                         if higher == lower
                 (higher-pos)*v[lower] + (pos-lower)*v[higher]  else

    Returns (__i 0-based index into ``percentages``, __q double).
    Callers own non-emptiness (the builtin returns NULL on an empty
    input; this frame returns no row for it)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    v = df.select(F.col(col).cast("double").alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    hist = v.groupBy("__v").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "__v",
        "__c",
        F.sum("__c").over(w).alias("__cum"),
        F.sum("__c").over(Window.partitionBy()).alias("__n"),
    )
    arr = "array(" + ", ".join(
        repr(float(p)) + "D" for p in percentages
    ) + ")"
    lo_hit = (F.col("__cum") - F.col("__c") <= F.col("__lo")) & (
        F.col("__lo") < F.col("__cum")
    )
    hi_hit = (F.col("__cum") - F.col("__c") <= F.col("__hi")) & (
        F.col("__hi") < F.col("__cum")
    )
    cand = (
        cum.select(
            "__v", "__c", "__cum", "__n",
            F.posexplode(F.expr(arr)).alias("__i", "__p"),
        )
        .withColumn("__pos", F.col("__p") * (F.col("__n") - 1))
        .withColumn("__lo", F.floor("__pos"))
        .withColumn("__hi", F.ceil("__pos"))
        .filter(lo_hit | hi_hit)
        .groupBy("__i")
        .agg(
            F.max(F.when(lo_hit, F.col("__v"))).alias("__vlo"),
            F.max(F.when(hi_hit, F.col("__v"))).alias("__vhi"),
            F.min("__pos").alias("__pos"),
            F.min("__lo").alias("__lo"),
            F.min("__hi").alias("__hi"),
        )
    )
    return cand.select(
        "__i",
        F.when(F.col("__hi") == F.col("__lo"), F.col("__vlo"))
        .otherwise(
            (F.col("__hi") - F.col("__pos")) * F.col("__vlo")
            + (F.col("__pos") - F.col("__lo")) * F.col("__vhi")
        )
        .alias("__q"),
    )
