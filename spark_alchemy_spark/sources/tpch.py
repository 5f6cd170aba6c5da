"""Loader for the driver's TPC-H-ish star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under ``<sf_dir>/``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: TIMESTAMP(NANOS) columns in the driver parquet.  Spark can't read
#: nanos timestamps natively; with spark.sql.legacy.parquet.nanosAsLong
#: they surface as BIGINT nanoseconds and are converted to microsecond
#: timestamps here (matching what DuckDB sees, truncated to micros).
TIMESTAMP_NANOS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Resolve one base table, memoized PER SESSION OBJECT: resolving
    a parquet DataFrame costs ~70-100 ms per call (DataSource
    resolution + schema inference + analysis round trips) and every
    battery entry re-loads its tables — ~30 s across a 306-entry run
    for identical immutable inputs (r10, measured).  The cached object
    is a lazy plan over a static deterministic file set, so reuse
    changes nothing but cost; the temp view is still (re-)registered
    on EVERY load so view state stays exactly as before.  The cache
    dict lives ON the SparkSession (DataFrames are bound to the
    session that created them — a ``newSession()`` sharing the
    applicationId must NOT see another session's plans — and the
    cache dies with the session object, so nothing accumulates across
    session rebuilds)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    cache = getattr(spark, "_sas_table_cache", None)
    if cache is None:
        cache = {}
        spark._sas_table_cache = cache
    key = (sf_dir, name)
    df = cache.get(key)
    if df is None:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        for c in TIMESTAMP_NANOS_COLS.get(name, ()):
            if isinstance(df.schema[c].dataType, T.LongType):
                df = df.withColumn(
                    c, F.timestamp_micros((F.col(c) / 1000).cast("long"))
                )
        cache[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    """Load the star schema and register each table as a temp view."""
    out = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
