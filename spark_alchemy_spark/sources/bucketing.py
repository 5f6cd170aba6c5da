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
