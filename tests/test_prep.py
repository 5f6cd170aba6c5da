"""Training-data prep operator tests: chunking boundaries, sampling
determinism/reproducibility, decontamination semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_alchemy_spark.operators.prep import (
    chunk_documents,
    decontaminate,
    fraction_threshold,
    weighted_sample,
)


def test_chunk_documents_boundaries(spark):
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),  # 10 tokens
            (2, "a b c"),                                # single short chunk
            (3, ""),                                     # empty -> no chunks
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, "doc_id", "text", max_tokens=4, overlap=1)
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        for r in out.collect()
    )
    # doc 1: starts at token 1, 4, 7, 10 (stride 3)
    assert rows == [
        (1, 0, "w0 w1 w2 w3", 4),
        (1, 1, "w3 w4 w5 w6", 4),
        (1, 2, "w6 w7 w8 w9", 4),
        (1, 3, "w9", 1),
        (2, 0, "a b c", 3),
    ]
    # consecutive chunks overlap by exactly `overlap` tokens
    assert rows[0][2].split()[-1] == rows[1][2].split()[0]


def test_weighted_sample_deterministic_and_proportional(spark):
    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    frac = {"en": 0.5, "de": 0.1}
    a = sorted(r["doc_id"] for r in weighted_sample(df, "lang", "doc_id", frac).collect())
    b = sorted(r["doc_id"] for r in weighted_sample(df, "lang", "doc_id", frac).collect())
    assert a == b  # same salt+ids -> identical draw, run to run
    counts = {
        r["lang"]: r["n"]
        for r in weighted_sample(df, "lang", "doc_id", frac)
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert abs(counts["en"] - 1000) < 150 and abs(counts["de"] - 200) < 100
    # different salt -> different draw
    c = sorted(
        r["doc_id"]
        for r in weighted_sample(df, "lang", "doc_id", frac, salt="mix-v2").collect()
    )
    assert c != a
    assert fraction_threshold(0.0) == "00000000"
    assert fraction_threshold(1.0) == "g"  # sorts after every 8-char hex
    kept_all = weighted_sample(df, "lang", "doc_id", {"en": 1.0, "de": 1.0})
    assert kept_all.count() == 4000


def test_decontaminate_drops_overlapping_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),
            (2, "a completely different sentence entirely here"),
            (3, "nothing shared with anything else at all"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "someone saw the quick brown fox yesterday")],
        "doc_id long, text string",
    )
    clean = sorted(
        r["doc_id"]
        for r in decontaminate(docs, bench, "doc_id", "text", n=3).collect()
    )
    assert clean == [2, 3]  # doc 1 shares the 'the quick brown' trigram


def test_scrub_pii_patterns(spark):
    from spark_alchemy_spark.operators.prep import scrub_pii

    df = spark.createDataFrame(
        [("mail a.b+c@x-corp.io, ip 192.168.0.1, call (415) 555-2671 "
          "or +1 415-555-2671, ssn 123-45-6789, keep 1.2 and v1.2.3",)],
        "t string",
    )
    out = df.select(scrub_pii("t").alias("t")).collect()[0]["t"]
    assert "<EMAIL>" in out and "<IP>" in out and "<SSN>" in out
    assert out.count("<PHONE>") == 2
    assert "@" not in out and "192.168" not in out and "123-45-6789" not in out
    assert "1.2 and v1.2.3" in out  # short dotted numbers survive


def test_training_order_reproducible(spark):
    from spark_alchemy_spark.operators.prep import training_order

    df = spark.range(500).withColumnRenamed("id", "doc_id")
    a = [r["doc_id"] for r in training_order(df, "doc_id").orderBy("position").collect()]
    b = [r["doc_id"] for r in training_order(df, "doc_id").orderBy("position").collect()]
    assert a == b and a != sorted(a)  # stable and actually shuffled
    c = [
        r["doc_id"]
        for r in training_order(df, "doc_id", salt="epoch-2").orderBy("position").collect()
    ]
    assert c != a  # new salt = new epoch order
