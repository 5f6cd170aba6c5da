"""Structured Streaming operators: the streaming twins of the batch
battery (the reference has no streaming surface at all — SURVEY.md
§2.2 — so this is pure extension territory).

Each helper takes/returns streaming DataFrames; batch-equivalence is
asserted in tests by replaying the events parquet with the
``availableNow`` trigger into a memory sink and comparing against the
batch operator on the same data.

Scale notes: every aggregation below is keyed so state partitions by
the natural key; watermarks bound state (late data beyond the
watermark is dropped, exactly the documented contract); sketch state
in ``windowed_hll_users`` is a constant-size HLL per (window, key) —
the streaming version of the precompute-then-merge pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hll


def read_table_stream(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Replay any testdata table's parquet as a file-source stream.

    ``{table}.parquet`` may be a single FILE (driver testdata) or a
    DIRECTORY of part files (Spark-written).  File streams take a
    directory; pathGlobFilter matches LEAF files only — so for the
    single-file layout stream the parent dir globbed to the file, and
    for the directory layout stream the directory itself (the glob
    would silently match nothing and drain an empty stream)."""
    import os

    path = os.path.join(sf_dir, f"{table}.parquet")
    static = spark.read.parquet(path)
    reader = spark.readStream.schema(static.schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isdir(path):
        return reader.parquet(path)
    return reader.option("pathGlobFilter", f"{table}.parquet").parquet(sf_dir)


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Replay the events parquet as a file-source stream."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = read_table_stream(spark, sf_dir, "events", max_files_per_trigger)
    # Driver testdata has shipped ts as either TIMESTAMP(NANOS) (surfacing
    # as BIGINT nanos under nanosAsLong) or plain timestamp[us]; guard on
    # the actual type like sources.tpch.load_table does.
    from pyspark.sql import types as T

    if isinstance(stream.schema["ts"].dataType, T.LongType):
        stream = stream.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    # Watermarks require TIMESTAMP (with local tz); a TIMESTAMP_NTZ column
    # is rejected with EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE.  The NTZ→LTZ
    # cast keeps the wall-clock reading under the session timezone, so
    # date_format/window boundaries match the batch oracle exactly.
    if isinstance(stream.schema["ts"].dataType, T.TimestampNTZType):
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts per event type with a watermark bounding
    state and late data."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_windowed_counts(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding (hopping) window counts per event type: each event
    contributes to window/slide overlapping windows, so streaming state
    holds that many concurrent aggregates per key — the watermark still
    bounds total state because windows close slide-by-slide."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:00:00").alias("win_start"),
            "event_type",
            "n",
        )
    )


def windowed_hll_users(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    relative_sd: float = 0.0015,
) -> DataFrame:
    """Streaming sketch rollup: one HLL of user_id per (window,
    event_type).  Persisted sketches stay re-mergeable downstream —
    the streaming half of the reference's precompute/merge pipeline."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(hll.hll_init_agg("user_id", relative_sd).alias("users_hll"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
            "users_hll",
        )
    )


def sessionized_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native streaming sessionization via session_window (the batch
    twin is operators.temporal.sessionize)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", "n_events")
    )


def deduped_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id with watermark-bounded state."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


#: conf key + provider class for the RocksDB state store — the backend a
#: TB-state deployment runs (bounded executor heap: state lives off-heap
#: in RocksDB with changelog checkpointing), vs the default HDFS-backed
#: in-memory map whose state must fit the executor heap.
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "append",
    state_partitions: int | None = None,
    state_store: str | None = None,
) -> DataFrame:
    """Drain a stream with the availableNow trigger into a memory sink;
    returns the materialized result (test/bench harness).  Use
    ``output_mode='complete'`` for aggregations (append would hold back
    windows still inside the watermark at end-of-replay).

    ``state_partitions`` sets the number of state-store partitions for
    this query (fixed at first start by ``spark.sql.shuffle.partitions``).
    Every stateful operator pays a per-partition fixed cost (store
    open + delta-file checkpoint per microbatch — a stream-stream join
    keeps four stores per partition), so size it to state volume:
    measured here, a 100k-row replayed join is 3.4× faster on 8
    partitions than 32, while a 1000-executor deployment with TBs of
    state wants hundreds.

    ``state_store="rocksdb"`` runs the query on the RocksDB provider
    (off-heap state + changelog checkpointing — what TB-scale state
    deployments use); default keeps the session's provider.  Both confs
    are restored after the drain."""
    if state_store not in (None, "rocksdb"):
        # validate BEFORE touching session conf — raising between a
        # conf.set and the restoring finally would leak the setting
        raise ValueError(f"unknown state_store {state_store!r}")
    spark = stream_df.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(conf_key)
    old_provider = spark.conf.get(_PROVIDER_KEY, None)
    if state_partitions is not None:
        spark.conf.set(conf_key, str(state_partitions))
    if state_store == "rocksdb":
        spark.conf.set(_PROVIDER_KEY, _ROCKSDB_PROVIDER)
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(conf_key, old)
        if state_store == "rocksdb":
            if old_provider is None:
                spark.conf.unset(_PROVIDER_KEY)
            else:
                spark.conf.set(_PROVIDER_KEY, old_provider)
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join within a time interval: each ``right`` row
    matches ``left`` rows of the same key whose timestamp falls in
    [right.ts - max_lag, right.ts].

    Both sides carry watermarks and the join condition bounds event
    time on both sides, so Spark can expire join state (without the
    bound, stream-stream join state grows forever — the scale
    constraint that shapes this API).

    ``how="left_outer"`` preserves unmatched RIGHT rows (the probe
    side here) with NULL ``l_ts`` — but an outer null-row can only
    emit once the watermark proves no future match exists, so
    unmatched rows inside the final watermark horizon stay in state at
    end-of-replay (inner matches always emit).  The outer variant is
    the streaming form of "purchases with no preceding click"."""
    if how not in ("inner", "left_outer"):
        # right/full outer would surface unmatched LEFT rows whose key
        # column (aliased from the right side below) is NULL —
        # structurally wrong output; fail fast instead
        raise ValueError(f"interval_join supports inner/left_outer, got {how!r}")
    l = left.withWatermark("ts", watermark).select(
        F.col(key).alias("l_key"), F.col("ts").alias("l_ts")
    )
    r = right.withWatermark("ts", watermark).select(
        F.col(key).alias("r_key"), F.col("ts").alias("r_ts")
    )
    joined = r.join(
        l,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("l_ts") >= F.col("r_ts") - F.expr(f"INTERVAL {max_lag}"))
        & (F.col("l_ts") <= F.col("r_ts")),
        how,
    )
    return joined.select(F.col("r_key").alias(key), "l_ts", "r_ts")


def incremental_sketch_store(
    events: DataFrame,
    store_path: str,
    key_cols: list[str] | None = None,
    value_col: str = "user_id",
    lg_k: int = 16,
    state_partitions: int = 8,
) -> None:
    """Incrementally maintain a persistent sketch table from a stream.

    Every micro-batch appends one theta sketch per (batch, key) to a
    parquet store via ``foreachBatch`` — the streaming half of the
    precompute-then-reaggregate design: the store is tiny (one binary
    column per key per batch), survives restarts, and any later reader
    answers distinct-count/set-algebra questions with
    ``theta_union_agg`` over the store instead of rescanning raw
    events.  Append-only parquet keeps the write atomic per batch; at
    deployment scale the same shape lands in a partitioned table keyed
    by arrival date."""
    from pyspark.sql import functions as F

    from ..functions import sketches as S

    keys = key_cols if key_cols is not None else ["event_type"]

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy(*keys)
            .agg(S.theta_init_agg(value_col, lg_k).alias("sketch"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(store_path)
        )

    spark = events.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(conf_key)
    spark.conf.set(conf_key, str(state_partitions))
    try:
        q = (
            events.writeStream.foreachBatch(write_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", store_path + "_chk")
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(conf_key, old)
