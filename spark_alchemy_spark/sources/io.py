"""Generic source/sink helpers: parquet, CSV, JSON (lines), ORC.

The reference delegates all I/O to stock Spark (SURVEY.md §2.2 — its
tests read/write JDBC and parallelized collections); this engine keeps
the same stance and exposes thin, schema-explicit wrappers so round
trips are lossless:

* CSV rides with a header and explicit schema on read (CSV carries no
  types; inferring would silently widen/narrow);
* JSON reads with the writer's schema for the same reason (and to skip
  the schema-inference scan — at 100 TB an extra full pass);
* parquet/ORC are self-describing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_table(df: DataFrame, path: str, fmt: str = "parquet", **options) -> None:
    writer = df.write.format(fmt).mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", schema=None, **options
) -> DataFrame:
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Hive-style partitioned layout (``col=value/`` directories) — the
    100 TB table design: queries filtering on a partition column prune
    whole directories at planning time (PartitionFilters in the scan),
    never opening a single excluded file."""
    df.write.format(fmt).mode("overwrite").partitionBy(*partition_cols).save(path)


def roundtrip(df: DataFrame, path: str, fmt: str, **options) -> DataFrame:
    """Write ``df`` to ``path`` as ``fmt`` and read it back with the
    original schema — the loss-free source/sink contract the battery
    checks end to end."""
    write_table(df, path, fmt, **options)
    return read_table(df.sparkSession, path, fmt, schema=df.schema, **options)
