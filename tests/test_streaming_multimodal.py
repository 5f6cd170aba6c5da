"""Streaming operators (batch-equivalence via availableNow replay) and
multimodal column plumbing."""

import json
import pytest
from pyspark.sql import functions as F

from spark_alchemy_spark import streaming as stx
from spark_alchemy_spark.functions import hll
from spark_alchemy_spark.multimodal import (
    image_features,
    sample_frames,
    sniff_mime,
    synth_image_bytes,
    synth_image_udf,
    with_media_metadata,
)

SF = "/root/testdata/sf0.001"


def test_streaming_windowed_counts_equals_batch(spark):
    stream = stx.read_events_stream(spark, SF)
    got = stx.run_to_memory(
        stx.windowed_counts(stream), "t_wc", output_mode="complete"
    ).collect()
    from spark_alchemy_spark.queries import QUERIES

    exp = QUERIES["tumbling_hourly_counts"](spark, SF).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))


def test_streaming_hll_rollup_matches_exact(spark):
    stream = stx.read_events_stream(spark, SF)
    sketches = stx.run_to_memory(
        stx.windowed_hll_users(stream), "t_hll", output_mode="complete"
    )
    merged = sketches.groupBy("event_type").agg(
        hll.hll_cardinality(hll.hll_merge("users_hll")).alias("n")
    )
    got = {r["event_type"]: r["n"] for r in merged.collect()}
    from spark_alchemy_spark.sources import load_tables

    events = load_tables(spark, SF, ("events",))["events"]
    exp = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == exp


def test_streaming_dedup(spark):
    stream = stx.read_events_stream(spark, SF)
    doubled = stream.union(stream)
    got = stx.run_to_memory(stx.deduped_stream(doubled), "t_dd").count()
    exact = stx.read_events_stream(spark, SF)
    base = stx.run_to_memory(exact, "t_base").count()
    assert got == base


def test_synth_media_metadata(spark):
    df = spark.range(4).select(
        F.col("id").alias("media_id"),
        F.lit(16).alias("w"),
        F.lit(9).alias("h"),
    )
    imgs = df.withColumn("data", synth_image_udf()(F.col("media_id"), "w", "h"))
    meta = with_media_metadata(imgs, "data").select("media_id", "media_meta.*")
    row = meta.orderBy("media_id").head()
    assert row["mime"] == "image/synth"
    assert (row["width"], row["height"], row["channels"]) == (16, 9, 3)
    assert row["n_bytes"] == 9 + 16 * 9 * 3


def test_sniff_png_and_unknown(spark):
    png_header = (
        b"\x89PNG\r\n\x1a\x0a" + b"\x00\x00\x00\x0dIHDR"
        + (640).to_bytes(4, "big") + (480).to_bytes(4, "big") + b"\x08\x02\x00\x00\x00"
    )
    df = spark.createDataFrame(
        [(bytearray(png_header),), (bytearray(b"garbage-bytes"),)], "data binary"
    )
    out = with_media_metadata(df, "data").select("media_meta.*").collect()
    png, unk = out
    assert png["mime"] == "image/png" and (png["width"], png["height"]) == (640, 480)
    assert unk["mime"] == "application/octet-stream" and unk["width"] is None


def test_image_features_deterministic(spark):
    df = spark.createDataFrame(
        [(1, bytearray(synth_image_bytes(1, 32, 32)))], "media_id long, data binary"
    )
    row = image_features(df, "data", "media_id", thumb=4).head()
    assert (row["width"], row["height"], row["channels"]) == (32, 32, 3)
    assert len(row["embedding"]) == 16
    import numpy as np

    img = np.frombuffer(synth_image_bytes(1, 32, 32)[9:], dtype=np.uint8).reshape(32, 32, 3)
    exp_mean = img.reshape(-1, 3).mean(axis=0).round(4).tolist()
    assert row["channel_mean"] == pytest.approx(exp_mean)


def test_sample_frames_expansion(spark):
    df = spark.createDataFrame(
        [(7, bytearray(synth_image_bytes(0, 8, 10)))], "media_id long, data binary"
    )
    out = sample_frames(df, "data", "media_id", every_n=2)
    assert out.count() == 5  # frames 0,2,4,6,8 of 10


def test_decode_unsupported_format_raises(spark):
    jpeg_ish = b"\xff\xd8\xff\xe0" + b"\x00" * 32
    df = spark.createDataFrame([(1, bytearray(jpeg_ish))], "media_id long, data binary")
    with pytest.raises(Exception, match="(?i)pil|notimplemented|synth"):
        image_features(df, "data", "media_id").collect()


def test_audio_wav_roundtrip_features(spark):
    """Synth WAV bytes decode to the exact closed-form stats."""
    import numpy as np
    from pyspark.sql import functions as F

    from spark_alchemy_spark.multimodal import (
        audio_features,
        sniff_mime,
        synth_wav_bytes,
        synth_wav_udf,
    )

    df = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    clips = df.select("doc_id", synth_wav_udf()(F.col("doc_id")).alias("wav"))
    mimes = {r["m"] for r in clips.select(sniff_mime("wav").alias("m")).collect()}
    assert mimes == {"audio/wav"}
    rows = {r["doc_id"]: r for r in audio_features(clips, "wav", "doc_id").collect()}
    for seed in range(5):
        idx = np.arange(1000, dtype=np.int64)
        samples = ((seed * 2654435761 + idx * 40503) % 65536 - 32768).astype(np.float64)
        r = rows[seed]
        assert r["sample_rate"] == 16000
        assert r["n_samples"] == 1000
        assert r["rms"] == float(np.round(np.sqrt(np.mean(samples**2)), 2))
        assert r["peak"] == int(np.abs(samples).max())
    # byte-level: header says PCM16 mono 16kHz
    buf = synth_wav_bytes(3)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE" and len(buf) == 44 + 2000


def test_python_stream_source_checkpoint_recovery(spark, tmp_path):
    """Kill a streaming query mid-run, restart from the checkpoint:
    the exactly-once file sink + the source's offset-replay contract
    must deliver every row exactly once across the restart."""
    import time

    import pyspark.sql.functions as F

    from spark_alchemy_spark.sources import pyds

    pyds.register(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    N = 10000

    def start():
        return (
            spark.readStream.format("synth_events")
            .option("n", N).option("n_users", 100).option("batchsize", 250)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    def rows_written():
        try:
            return spark.read.parquet(out).count()
        except Exception:
            return 0

    q = start()
    deadline = time.time() + 60
    while time.time() < deadline and rows_written() < 1:
        time.sleep(0.05)
    q.stop()  # kill as early as possible (some batches committed, some not)
    # on a fast machine the drain can win the race and finish before the
    # stop lands — the exactly-once assertions below still hold either
    # way; a mid-stream kill (the common case at batchsize 250 over 40
    # batches) additionally exercises offset replay across the restart
    q2 = start()
    deadline = time.time() + 120
    while time.time() < deadline and rows_written() < N:
        time.sleep(0.3)
    q2.stop()
    got = spark.read.parquet(out)
    assert got.count() == N                         # no loss, no dupes
    assert got.select("event_id").distinct().count() == N
    # value spot-check: the closed-form formula survived the restart
    r = got.filter(F.col("event_id") == N - 1).collect()[0]
    assert r["user_id"] == ((N - 1) * 2654435761) % 100


def test_streaming_rocksdb_state_store_equals_batch(spark):
    """The RocksDB state store provider (off-heap state + changelog
    checkpointing — the TB-state deployment backend) produces the same
    windowed aggregate as the default HDFS-backed provider and the
    batch twin."""
    stream = stx.read_events_stream(spark, SF)
    got = stx.run_to_memory(
        stx.windowed_counts(stream),
        "t_wc_rocksdb",
        output_mode="complete",
        state_partitions=4,
        state_store="rocksdb",
    ).collect()
    from spark_alchemy_spark.queries import QUERIES

    exp = QUERIES["tumbling_hourly_counts"](spark, SF).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))
    # the drain restored the session provider conf
    assert (
        spark.conf.get(stx._PROVIDER_KEY, None) != stx._ROCKSDB_PROVIDER
    )


def test_events_stream_handles_both_ts_encodings(spark, tmp_path):
    """Driver testdata has shipped events.ts as TIMESTAMP(NANOS)
    (surfacing as BIGINT nanos under nanosAsLong) in rounds 1-2 and as
    timestamp[us] in round 3+; the stream reader must handle BOTH (and
    produce identical wall-clock hours)."""
    import os

    src = stx.read_events_stream(spark, SF)
    base = stx.run_to_memory(
        stx.windowed_counts(src), "t_enc_base", output_mode="complete"
    ).collect()

    # re-encode the same events with ts as BIGINT nanoseconds (what the
    # nanos parquet surfaces as) and stream that directory instead
    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    nanos_dir = str(tmp_path / "nanos")
    staging = str(tmp_path / "staging")
    from pyspark.sql import types as T

    if isinstance(ev.schema["ts"].dataType, T.LongType):
        # source already ships bigint nanos (rounds-1-2 layout) — a bare
        # cast('timestamp') would misread nanos as SECONDS
        nanos_ts = F.col("ts")
    else:
        nanos_ts = F.unix_micros(F.col("ts").cast("timestamp")) * 1000
    (
        ev.withColumn("ts", nanos_ts)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(staging)
    )
    # the driver ships events.parquet as a single FILE (pathGlobFilter
    # matches leaf files); reproduce that layout
    import shutil

    os.makedirs(nanos_dir, exist_ok=True)
    part = [f for f in os.listdir(staging) if f.endswith(".parquet")][0]
    shutil.copy(
        os.path.join(staging, part), os.path.join(nanos_dir, "events.parquet")
    )
    src2 = stx.read_events_stream(spark, nanos_dir)
    got = stx.run_to_memory(
        stx.windowed_counts(src2), "t_enc_long", output_mode="complete"
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, base))


def test_late_data_dropped_beyond_watermark_kept_within(spark, tmp_path):
    """Watermark correctness property (VERDICT r3 #8): the availableNow
    battery entries pin replay==batch, which can't see late-data
    semantics.  Here two files replay as two microbatches
    (maxFilesPerTrigger=1, mtime-ordered):

    * batch A carries window-[00:00] events and a ts=06:00 advancer;
    * batch B carries a ts=09:00 advancer (watermark firmly at 07:00
      with the 2h delay — watermark propagation to the input filter
      lags one microbatch in this Spark version, so the straggler
      must arrive two batches after its window closed);
    * batch C carries a ts=00:40 straggler (BEYOND the watermark: must
      be dropped — the [00:00] window count stays 2 forever) and a
      ts=07:30 out-of-order event (WITHIN the watermark: must be kept
      and open its window).

    Update mode emits changed windows per batch, so the memory sink
    exposes whether batch C changed the [00:00] window.
    """
    import os
    from datetime import datetime, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_alchemy_spark.streaming import windowed_counts

    d = tmp_path / "late_stream"
    d.mkdir()

    def write(name, hours_minutes, mtime):
        ts = [
            datetime(2026, 1, 1, h, m, tzinfo=timezone.utc)
            for h, m in hours_minutes
        ]
        tbl = pa.table(
            {
                "ts": pa.array(ts, type=pa.timestamp("us", tz="UTC")),
                "event_type": pa.array(["x"] * len(ts)),
                "value": pa.array([1.0] * len(ts)),
            }
        )
        path = str(d / name)
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    write("a.parquet", [(0, 10), (0, 20), (6, 0)], 1_700_000_000)
    write("b.parquet", [(9, 0)], 1_700_000_100)
    write("c.parquet", [(0, 40), (7, 30)], 1_700_000_200)

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        stream = (
            spark.readStream.schema("ts timestamp, event_type string, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
        )
        agg = windowed_counts(stream, window="1 hour", watermark="2 hours")
        q = (
            agg.writeStream.format("memory")
            .queryName("late_test")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.sql("SELECT * FROM late_test").collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)

    per_win: dict[str, int] = {}
    for r in rows:
        per_win[r["hour"]] = max(per_win.get(r["hour"], 0), r["n"])
    # the straggler was dropped: the 00:00 window never reaches 3
    assert per_win["2026-01-01 00:00:00"] == 2, per_win
    # the within-watermark out-of-order event was kept
    assert per_win.get("2026-01-01 07:00:00") == 1, per_win


def test_idle_session_finalizer_event_time_timeout(spark, tmp_path):
    """EventTimeTimeout state finalization: user A's session (2 events,
    last at 00:10, gap 30m) must be emitted EXACTLY ONCE after the
    watermark passes 00:40, and its state removed; user B keeps an
    open session and emits nothing.  Three microbatches advance the
    watermark (propagation to the timeout check lags one batch in this
    Spark version, hence two advancer batches)."""
    import os
    from datetime import datetime, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_alchemy_spark.streaming.stateful import idle_session_finalizer

    d = tmp_path / "idle_stream"
    d.mkdir()

    def write(name, rows, mtime):
        ts = [
            datetime(2026, 1, 1, h, m, tzinfo=timezone.utc) for h, m, _ in rows
        ]
        tbl = pa.table(
            {
                "ts": pa.array(ts, type=pa.timestamp("us", tz="UTC")),
                "user_id": pa.array([u for _, _, u in rows], type=pa.int64()),
            }
        )
        path = str(d / name)
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    write("a.parquet", [(0, 0, 1), (0, 10, 1), (0, 5, 2)], 1_700_000_000)
    write("b.parquet", [(6, 0, 2)], 1_700_000_100)
    write("c.parquet", [(9, 0, 2)], 1_700_000_200)

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    # run under BOTH timezones: the timeout timestamp is true-epoch ms
    # (unix_millis JVM-side) so a non-UTC session timezone must neither
    # crash (INVALID_TIMEOUT_TIMESTAMP — the bug this pins) nor shift
    # the fired session
    for i, tz in enumerate(["UTC", "America/Los_Angeles"]):
        spark.conf.set("spark.sql.session.timeZone", tz)
        try:
            stream = (
                spark.readStream.schema("ts timestamp, user_id long")
                .option("maxFilesPerTrigger", 1)
                .parquet(str(d))
            )
            out = idle_session_finalizer(
                stream, gap="30 minutes", watermark="1 hour"
            )
            q = (
                out.writeStream.format("memory")
                .queryName(f"idle_sessions_{i}")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            rows = spark.sql(f"SELECT * FROM idle_sessions_{i}").collect()
        finally:
            spark.conf.set("spark.sql.session.timeZone", old_tz)

        assert len(rows) == 1, (tz, rows)  # exactly one finalized session
        r = rows[0]
        assert r["user_id"] == 1 and r["n_events"] == 2, tz
        assert r["session_start"].minute == 0 and r["session_end"].minute == 10


def test_idle_session_state_rows_shrink_to_open_sessions(spark, tmp_path):
    """State-growth guard (VERDICT r4 task 7): after finalization the
    state store must hold OPEN sessions only — numRowsTotal in the last
    stateOperators progress equals the open-session count, and removals
    were actually reported.  A cleanup regression (state never removed
    on timeout) would keep numRowsTotal at #users and fail here even
    though the emitted rows still look right."""
    import os
    from datetime import datetime, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_alchemy_spark.streaming.stateful import idle_session_finalizer

    d = tmp_path / "idle_state_growth"
    d.mkdir()

    def write(name, rows, mtime):
        ts = [
            datetime(2026, 1, 1, h, m, tzinfo=timezone.utc) for h, m, _ in rows
        ]
        tbl = pa.table(
            {
                "ts": pa.array(ts, type=pa.timestamp("us", tz="UTC")),
                "user_id": pa.array([u for _, _, u in rows], type=pa.int64()),
            }
        )
        path = str(d / name)
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    # 4 users with early sessions that must finalize; 2 users whose
    # events ride the watermark frontier and stay open
    write(
        "a.parquet",
        [(0, 0, u) for u in (1, 2, 3, 4)] + [(0, 10, u) for u in (1, 2)],
        1_700_000_000,
    )
    write("b.parquet", [(6, 0, 10)], 1_700_000_100)
    write("c.parquet", [(9, 0, 10), (9, 1, 11)], 1_700_000_200)

    stream = (
        spark.readStream.schema("ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = idle_session_finalizer(stream, gap="30 minutes", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("idle_state_growth")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = spark.sql("SELECT * FROM idle_state_growth").collect()
    assert {r["user_id"] for r in rows} == {1, 2, 3, 4}
    assert len(rows) == 4  # exactly once each

    state_progress = [
        p["stateOperators"][0]
        for p in (json.loads(x.json) for x in q.recentProgress)
        if p.get("stateOperators")
    ]
    assert state_progress, "no stateOperators progress recorded"
    final = state_progress[-1]
    # open sessions only: users 10 and 11
    assert final["numRowsTotal"] == 2, final
    # the four finalized sessions were REMOVED from the store, not
    # merely masked from output
    assert sum(p.get("numRowsRemoved", 0) for p in state_progress) >= 4, (
        state_progress
    )


def test_media_dedup_at_ingest_stateless_and_exact(spark, tmp_path):
    """The image-ingest dedup must match an exact replay (banded
    Hamming is pigeonhole-complete at 4x16 for radius 3) and run with
    ZERO state-store rows — foreachBatch against a static index."""
    from pyspark.sql import functions as F

    from spark_alchemy_spark.multimodal import synth_image_udf
    from spark_alchemy_spark.streaming import media_dedup_at_ingest

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang"
    )
    img = lambda df: df.select(
        "doc_id", "lang",
        synth_image_udf()((F.col("doc_id") % 7) * 17, F.lit(8), F.lit(8))
        .alias("data"),
    )
    standing = img(docs.filter(F.col("doc_id") % 2 == 0))
    d = tmp_path / "arr"
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(str(d))
    arrivals = img(
        spark.readStream.schema("doc_id long, lang string").parquet(str(d))
    )
    progress: list = []
    got = {
        r["lang"]: (r["n_arrived"], r["n_dropped"], r["n_survived"])
        for r in media_dedup_at_ingest(
            arrivals, standing, "doc_id", "data", "lang",
            progress_out=progress,
        ).collect()
    }
    # mod-7 motifs: every odd doc's motif also occurs among even docs
    # (doc ids are dense), so EVERY arrival is an exact-fingerprint dup
    want = {
        r["lang"]: (r["n"], r["n"], 0)
        for r in docs.filter(F.col("doc_id") % 2 == 1)
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want and got
    assert progress and all(p["stateOperators"] == [] for p in progress)


def test_media_dedup_at_ingest_rejects_mismatched_n_bits(spark, tmp_path):
    """16x16 images produce 256-bit fingerprints: with the default
    n_bits=64 the substring verify would silently ignore 192 bits —
    the helper must fail loud instead."""
    import pytest
    from pyspark.sql import functions as F

    from spark_alchemy_spark.multimodal import synth_image_udf
    from spark_alchemy_spark.streaming import media_dedup_at_ingest

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang"
    )
    img = lambda df, side: df.select(
        "doc_id", "lang",
        synth_image_udf()((F.col("doc_id") % 7) * 17, F.lit(side), F.lit(side))
        .alias("data"),
    )
    standing = img(docs.filter(F.col("doc_id") % 2 == 0), 16)
    d = tmp_path / "arr16"
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(str(d))
    arrivals = img(
        spark.readStream.schema("doc_id long, lang string").parquet(str(d)),
        16,
    )
    with pytest.raises(ValueError, match="256 bits"):
        media_dedup_at_ingest(arrivals, standing, "doc_id", "data", "lang")
