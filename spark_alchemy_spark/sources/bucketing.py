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


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sorted_by_key: bool = True,
) -> None:
    """Persist as a managed parquet table bucketed (and by default
    sorted) by ``key`` — sorting lets sort-merge joins skip their sort."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sorted_by_key:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
