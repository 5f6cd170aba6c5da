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


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Rewrite a table directory into ~``target_file_bytes`` files.

    The small-files problem is THE silent killer of 100 TB tables:
    streaming appends and over-parallel writes leave thousands of tiny
    files, and every later scan pays per-file open/footer costs plus a
    task per file.  Compaction = size the output partition count from
    the actual byte size (never the file count) and rewrite.  Returns
    the number of files written.

    The rewrite stages through a sibling directory and swaps via
    rename.  NOTE: the local-filesystem swap is for single-writer dev /
    CI use — ``os.rename``/``os.walk`` require a POSIX filesystem, the
    table path briefly does not exist between the two renames, and a
    concurrent reader can race the swap.  At deployment scale (object
    stores / HDFS) the swap must be a metastore location flip or an
    Iceberg/Delta rewrite commit instead; this function raises rather
    than guess on non-local paths.  The swap IS re-runnable: stale
    ``__compacting.*`` / ``__old.*`` leftovers from a crashed prior run
    are cleared first, and unique suffixes prevent collisions.
    """
    import math
    import os
    import shutil
    import uuid

    if "://" in path and not path.startswith("file://"):
        raise ValueError(
            "compact_table's rename swap only works on local filesystems; "
            f"got {path!r} — use a metastore location flip / table-format "
            "rewrite commit for object stores"
        )
    path = path.removeprefix("file://")

    # clear stale staging/old dirs from a previously crashed run, so the
    # rewrite is re-runnable without manual cleanup
    parent, base = os.path.split(path.rstrip("/"))
    for entry in os.listdir(parent or "."):
        if entry.startswith((base + "__compacting", base + "__old")):
            shutil.rmtree(os.path.join(parent, entry), ignore_errors=True)

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if not f.startswith(("_", "."))
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.format(fmt).load(path)
    token = uuid.uuid4().hex[:8]
    staging = path.rstrip("/") + f"__compacting.{token}"
    df.repartition(n_files).write.format(fmt).mode("overwrite").save(staging)
    old = path.rstrip("/") + f"__old.{token}"
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    return n_files
