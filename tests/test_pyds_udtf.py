"""Custom Python data source + UDTF surfaces: partitioning, determinism,
null handling."""

from pyspark.sql import functions as F

from spark_alchemy_spark.functions import udtfs
from spark_alchemy_spark.sources import pyds


def test_synth_source_partitions_and_rows(spark):
    pyds.register(spark)
    df = (
        spark.read.format("synth_events")
        .option("n", 1000)
        .option("n_users", 50)
        .option("numPartitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = df.collect()
    assert len(rows) == 1000
    assert len({r["event_id"] for r in rows}) == 1000  # slices don't overlap
    # spot-check the closed form at i=7
    r7 = next(r for r in rows if r["event_id"] == 7)
    assert r7["user_id"] == (7 * 2654435761) % 50
    assert r7["event_type"] == pyds.TYPES[(7 * 40503) % 5]
    assert r7["value"] == ((7 * 37) % 1000) / 10.0


def test_synth_source_uneven_split(spark):
    pyds.register(spark)
    df = (
        spark.read.format("synth_events")
        .option("n", 10)
        .option("numPartitions", 3)
        .load()
    )
    assert df.count() == 10


def test_udtf_tokenize_positions_and_nulls(spark):
    udtfs.register(spark)
    df = spark.createDataFrame(
        [(1, "a b  c"), (2, None), (3, "")], "id int, text string"
    )
    df.createOrReplaceTempView("udtf_probe")
    out = spark.sql(
        "SELECT id, t.pos, t.token FROM udtf_probe, "
        "LATERAL tokenize_udtf(text) t"
    ).collect()
    # null and empty text produce no rows; double space is skipped
    assert sorted((r["id"], r["pos"], r["token"]) for r in out) == [
        (1, 0, "a"),
        (1, 1, "b"),
        (1, 2, "c"),
    ]


def test_python_stream_source_replay_contract(spark):
    """Streaming flavor of the synth source: micro-batch drain equals
    the batch read, and readBetweenOffsets regenerates any batch
    byte-identically (the recovery-replay contract)."""
    from spark_alchemy_spark.sources.pyds import SynthEventsSimpleStreamReader

    r = SynthEventsSimpleStreamReader(n=2500, n_users=50, batch=1000)
    off = r.initialOffset()
    seen = []
    offsets = [off]
    while int(off["i"]) < 2500:
        rows, off = r.read(off)
        seen.extend(rows)
        offsets.append(off)
    assert len(seen) == 2500
    assert [o["i"] for o in offsets] == [0, 1000, 2000, 2500]
    # replay any interval: identical rows (returned as an iterator —
    # the runner's isinstance(..., Iterator) contract)
    assert list(r.readBetweenOffsets({"i": 1000}, {"i": 2000})) == seen[1000:2000]
    # row formula parity with the batch reader
    from spark_alchemy_spark.sources.pyds import SynthEventsReader, _Slice

    batch = list(SynthEventsReader(2500, 50, 1).read(_Slice(0, 2500)))
    assert batch == seen


def test_jsonl_sink_two_phase_commit(spark, tmp_path):
    """Python data source writer: atomic publication (temp files never
    visible after commit, _SUCCESS dropped, overwrite replaces) and
    exact row round-trip."""
    import os

    from spark_alchemy_spark.sources import pyds

    pyds.register_sink(spark)
    path = str(tmp_path / "sink")
    df = spark.range(100).selectExpr("id", "cast(id % 7 as string) AS g").coalesce(3)
    df.write.format("jsonl_sink").option("path", path).mode("append").save()
    names = sorted(os.listdir(path))
    assert "_SUCCESS" in names
    assert not [n for n in names if n.startswith("_tmp_")]
    back = spark.read.schema("id long, g string").json(path + "/part-*.jsonl")
    assert back.count() == 100
    assert sorted(r["id"] for r in back.collect()) == list(range(100))
    # a SECOND append must add rows, never os.replace earlier part files
    df1b = (
        spark.range(100, 150)
        .selectExpr("id", "cast(id as string) AS g")
        .coalesce(2)
    )
    df1b.write.format("jsonl_sink").option("path", path).mode("append").save()
    back_both = spark.read.schema("id long, g string").json(path + "/part-*.jsonl")
    assert sorted(r["id"] for r in back_both.collect()) == list(range(150))
    # overwrite publishes a fresh set, never appends
    df2 = spark.range(10).selectExpr("id", "cast(id as string) AS g").coalesce(1)
    df2.write.format("jsonl_sink").option("path", path).mode("overwrite").save()
    back2 = spark.read.schema("id long, g string").json(path + "/part-*.jsonl")
    assert back2.count() == 10
