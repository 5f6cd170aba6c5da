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


def test_decontaminate_bloom_equals_exact(spark):
    """Bloom prefilter is a pure optimization: output == exact
    decontaminate even when the filter is degenerate-small (every gram
    a false positive candidate) — the verify semi-join removes exactly
    the FP tail, and Bloom filters have no false negatives."""
    from spark_alchemy_spark.operators.prep import decontaminate_bloom

    docs = spark.createDataFrame(
        [
            (i, f"doc number {i} carries unique tail tokens alpha{i} beta{i}")
            for i in range(40)
        ]
        + [(100, "the quick brown fox jumps high"),
           (101, "shared prefix words lead this document body")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(900, "someone saw the quick brown fox yesterday"),
         (901, "shared prefix words appear in benchmarks too")],
        "doc_id long, text string",
    )
    exact = sorted(
        r["doc_id"]
        for r in decontaminate(docs, bench, "doc_id", "text", n=3).collect()
    )
    for bits, k in [(1 << 16, 3), (256, 2), (64, 1)]:
        got = sorted(
            r["doc_id"]
            for r in decontaminate_bloom(
                docs, bench, "doc_id", "text", n=3, num_bits=bits, num_hashes=k
            ).collect()
        )
        assert got == exact, f"bits={bits} k={k}"
    # sanity: contamination was actually detected (not all docs clean)
    assert 100 not in exact and 101 not in exact and 0 in exact


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


def test_pack_sequences_greedy_invariants(spark):
    """Every row assigned, no pack exceeds the budget (except a lone
    oversize row), packs are contiguous in shard order, and repartition
    of the input doesn't change the assignment."""
    import pyspark.sql.functions as F

    from spark_alchemy_spark.operators.prep import pack_sequences_greedy

    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        # lengths 1..97 plus a few oversize rows (> budget 100)
        (F.pmod(F.col("id") * 37 + 11, F.lit(97)) + 1
         + F.when(F.pmod(F.col("id"), 100) == 7, 300).otherwise(0)
         ).alias("tok"),
    )
    packed = pack_sequences_greedy(
        df, "doc_id", "tok", budget=100, num_shards=4, order_cols=["doc_id"]
    ).cache()
    assert packed.count() == 400  # nothing dropped or duplicated

    sums = packed.groupBy("shard", "pack_id").agg(
        F.sum("tok").alias("s"), F.count("*").alias("n")
    )
    over = sums.filter((F.col("s") > 100) & (F.col("n") > 1)).count()
    assert over == 0  # only singleton (oversize) packs may exceed budget

    # packs are contiguous and start at 0 within each shard
    rows = packed.orderBy("shard", "doc_id").collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pack_id"])
    for ids in by_shard.values():
        assert ids[0] == 0
        assert all(b - a in (0, 1) for a, b in zip(ids, ids[1:]))

    again = pack_sequences_greedy(
        df.repartition(13), "doc_id", "tok",
        budget=100, num_shards=4, order_cols=["doc_id"],
    )
    assert (
        sorted(map(tuple, packed.collect()))
        == sorted(map(tuple, again.collect()))
    )  # deterministic under any input partitioning
    packed.unpersist()


def test_pack_contiguous_matches_cumsum(spark):
    import pyspark.sql.functions as F

    from spark_alchemy_spark.operators.prep import pack_sequences

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 13 + 5, F.lit(60)) + 1).alias("tok"),
    )
    packed = pack_sequences(
        df, "doc_id", "tok", budget=128, num_shards=4, order_cols=["doc_id"]
    )
    rows = packed.orderBy("shard", "doc_id").collect()
    cum = {}
    for r in rows:
        before = cum.get(r["shard"], 0)
        assert r["pack_id"] == before // 128
        cum[r["shard"]] = before + r["tok"]


def test_train_split_deterministic_and_partitioned(spark):
    import pyspark.sql.functions as F

    from spark_alchemy_spark.operators.prep import train_split

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    out = train_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000  # exact partition, no overlap/loss
    assert abs(counts["train"] - 1600) < 100  # roughly the asked mix
    # same ids land in the same split on a re-run
    again = train_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert (
        out.select("doc_id", "split").subtract(
            again.select("doc_id", "split")
        ).count() == 0
    )


def test_bm25_prefers_term_dense_docs(spark):
    from spark_alchemy_spark.operators.ranking import bm25_scores

    df = spark.createDataFrame(
        [
            (1, "hash hash hash join"),
            (2, "hash join filter scan merge sort group window agg batch"),
            (3, "scan merge sort"),
            (4, "filter"),
        ],
        "doc_id long, text string",
    )
    top = bm25_scores(df, "doc_id", "text", ["hash", "join"], topk=4).collect()
    ids = [r["doc_id"] for r in top]
    assert ids[0] == 1            # densest match wins
    assert 3 not in ids           # no query term, no score
    assert all(r["score"] > 0 for r in top)


def test_temperature_fractions_math():
    from spark_alchemy_spark.operators.prep import temperature_fractions

    counts = {"a": 10000, "b": 100, "c": 1}
    # alpha=1: natural mix — every stratum kept fully
    assert temperature_fractions(counts, alpha=1.0) == {"a": 1.0, "b": 1.0, "c": 1.0}
    # alpha=0: equalize — keep-fraction inversely proportional to count
    eq = temperature_fractions(counts, alpha=0.0)
    assert eq["c"] == 1.0 and abs(eq["a"] - 1e-4) < 1e-12
    # alpha=0.5: rare strata boosted relative to natural share
    mid = temperature_fractions(counts, alpha=0.5)
    assert mid["c"] == 1.0 and mid["a"] == 0.01 and mid["b"] == 0.1


def test_stratified_fixed_n_exact_and_stable(spark):
    import pyspark.sql.functions as F

    from spark_alchemy_spark.operators.prep import stratified_fixed_n

    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, "rare").otherwise("common").alias("g"),
    )
    out = stratified_fixed_n(df, "g", "doc_id", 25)
    counts = {r["g"]: r["n"] for r in
              out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {"rare": 25, "common": 25}
    # smaller stratum than n: keep everything
    tiny = stratified_fixed_n(df.filter("doc_id < 30"), "g", "doc_id", 25)
    got = {r["g"]: r["n"] for r in
           tiny.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert got["rare"] == 3  # only 3 rare rows exist below 30
    # deterministic: re-run selects the same ids
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in stratified_fixed_n(df, "g", "doc_id", 25).collect())
    assert a == b


def test_token_budget_take_bounds(spark):
    import pyspark.sql.functions as F

    from spark_alchemy_spark.operators.prep import token_budget_take

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id"), 3)).cast("string").alias("src"),
        (F.pmod(F.col("id") * 7 + 3, F.lit(50)) + 1).alias("tok"),
    )
    out = token_budget_take(df, "src", "doc_id", "tok", budget_per_stratum=300)
    per = {r["src"]: (r["s"], r["m"]) for r in
           out.groupBy("src").agg(F.sum("tok").alias("s"), F.max("tok").alias("m")).collect()}
    for s, (total, biggest) in per.items():
        assert total < 300 + biggest  # overshoot bounded by one document
        assert total >= 300 - 50      # budget actually filled
    # deterministic membership
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in
               token_budget_take(df, "src", "doc_id", "tok", 300).collect())
    assert a == b


def test_mixture_plan_integer_semantics(spark):
    from spark_alchemy_spark.operators.prep import mixture_plan

    docs = spark.createDataFrame(
        [(1, "en", "a b c d e f g h i j"),      # en: 10 tokens
         (2, "en", " ".join(["w"] * 90)),        # en total: 100
         (3, "de", " ".join(["x"] * 10))],       # de: 10
        "doc_id long, lang string, text string",
    )
    out = {
        r["lang"]: r
        for r in mixture_plan(
            docs, "lang", "text",
            {"en": 0.5, "de": 0.4, "fr": 0.1}, token_budget=1000,
        ).collect()
    }
    # en: target 500 over 100 available -> 5 epochs, no tail, repeat risk
    assert out["en"]["available_tokens"] == 100
    assert out["en"]["target_tokens"] == 500
    assert out["en"]["full_epochs"] == 5
    assert out["en"]["tail_fraction"] == 0.0
    assert out["en"]["repeat_risk"] is True
    # de: target 400 over 10 -> 40 epochs
    assert out["de"]["full_epochs"] == 40 and out["de"]["repeat_risk"] is True
    # fr: weighted but absent from the corpus
    assert out["fr"]["available_tokens"] == 0
    assert out["fr"]["full_epochs"] is None and out["fr"]["tail_fraction"] is None
    # partial pass: budget 150 -> en target 75 -> 0 epochs, tail 0.75
    out2 = {
        r["lang"]: r
        for r in mixture_plan(
            docs, "lang", "text", {"en": 1.0}, token_budget=75
        ).collect()
    }
    assert out2["en"]["full_epochs"] == 0
    assert out2["en"]["tail_fraction"] == 0.75
    assert out2["en"]["repeat_risk"] is False


def test_mixture_plan_no_int64_overflow_at_corpus_scale(spark):
    """budget x ppm-weight and remainder x 1e6 exceed int64 at real
    corpus sizes; the DECIMAL(38,0) intermediates must keep the plan
    exact (regression for the wrap-to-negative failure)."""
    from spark_alchemy_spark.operators.prep import mixture_plan

    big = 9_300_000_000_000  # > 9.2e12 tokens in one stratum
    docs = spark.createDataFrame(
        [(1, "web", "x")], "doc_id long, src string, text string"
    )
    # patch the availability by unioning a synthetic aggregate is
    # overkill — drive the arithmetic directly through a frame whose
    # token count we control via a fat token string? Too slow; instead
    # check the expressions on a crafted available_tokens row.
    out = mixture_plan(
        docs, "src", "text", {"web": 0.95, "code": 0.05},
        token_budget=100_000_000_000,
    ).collect()
    by = {r["src"]: r for r in out}
    assert by["web"]["target_tokens"] == 100_000_000_000 * 950_000 // 1_000_000
    assert by["code"]["target_tokens"] == 100_000_000_000 * 50_000 // 1_000_000
    assert by["web"]["target_tokens"] > 0  # no wraparound
    # tail ppm path on a huge stratum: replay the SQL expression alone
    r = docs.sparkSession.sql(
        f"SELECT CAST(CAST({big - 7} AS DECIMAL(38,0)) * 1000000 "
        f"DIV {big} AS DOUBLE) / 1000000 AS f"
    ).collect()[0]["f"]
    assert 0.999999 <= r <= 1.0


def test_assemble_sft_pairs_flags(spark):
    from spark_alchemy_spark.operators.prep import assemble_sft_pairs

    long_r = " ".join(["w"] * 12)
    df = spark.createDataFrame(
        [
            (1, "explain gravity please", long_r),          # valid
            (2, "explain gravity please", long_r + " more"),  # dup prompt
            (3, "short answer", "too short"),                 # response floor
            (4, "a", " ".join(["x"] * 30)),                   # ratio ceiling (30 > 1*20)
        ],
        "pair_id long, prompt string, response string",
    )
    out = {
        r["pair_id"]: r
        for r in assemble_sft_pairs(df, "pair_id", "prompt", "response").collect()
    }
    assert out[1]["valid"] and out[1]["dup_prompt"]
    assert out[2]["dup_prompt"]
    assert not out[3]["valid"] and not out[3]["dup_prompt"]
    assert not out[4]["valid"]
    assert out[1]["rendered"].startswith("<|user|>explain gravity")
    assert out[1]["rendered"].endswith("<|end|>")
    import pytest

    with pytest.raises(ValueError):
        assemble_sft_pairs(df, "pair_id", "prompt", "response", template="{p}")


def test_assemble_sft_pairs_passthrough_null_and_reversed_template(spark):
    from pyspark.sql import functions as F

    from spark_alchemy_spark.operators.prep import assemble_sft_pairs

    long_r = " ".join(["w"] * 12)
    df = spark.createDataFrame(
        [
            (1, "meta", None, long_r),
            (2, "meta", None, long_r),
            (3, "meta", "unique prompt here", long_r),
        ],
        "pair_id long, extra string, prompt string, response string",
    )
    out = assemble_sft_pairs(
        df, "pair_id", "prompt", "response",
        template="<|assistant|>{r}<|user|>{p}<|end|>",  # response-first works
    )
    rows = {r["pair_id"]: r for r in out.collect()}
    assert rows[3]["extra"] == "meta"          # input columns pass through
    assert rows[1]["dup_prompt"] and rows[2]["dup_prompt"]  # NULL dups flagged
    assert not rows[3]["dup_prompt"]
    assert rows[3]["rendered"].startswith("<|assistant|>w w")
    assert rows[3]["rendered"].endswith("unique prompt here<|end|>")
