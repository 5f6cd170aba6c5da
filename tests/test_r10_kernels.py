"""Round-10 optimization kernels: the three interpreted-loop -> codegen/
BLAS swaps must be RESULT-IDENTICAL to the expression forms they
replaced.  Each test reconstructs the pre-swap computation inline (the
straightforward per-pair expression form) and compares exactly."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_selective_kernel_equals_expression_verify(spark):
    """The per-cluster BLAS verify in semantic_dup_pairs (selective
    nprobe) must emit exactly the pair set the old skinny-candidate +
    per-pair HOF cosine form produced: same candidate rule, same
    JVM-side HALF_UP round/threshold."""
    from pyspark.sql.window import Window

    from spark_alchemy_spark.operators.dedup import (
        _as_double,
        cosine_similarity,
        semantic_dup_pairs,
    )
    from spark_alchemy_spark.operators.similarity import train_ivf_centroids

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    threshold, n_centroids, nprobe, seed = 0.4, 6, 2, 42
    got = {
        (r["id_a"], r["id_b"], r["cos"])
        for r in semantic_dup_pairs(
            emb, "vec_id", "embedding", threshold=threshold,
            n_centroids=n_centroids, nprobe=nprobe, seed=seed,
        ).collect()
    }

    # the pre-r10 expression form, reconstructed verbatim
    v = emb.select(
        F.col("vec_id").alias("__id"), _as_double("embedding").alias("__v")
    )
    cents = train_ivf_centroids(
        emb, "embedding", n_centroids=n_centroids, seed=seed
    )
    scored = v.crossJoin(F.broadcast(cents)).withColumn(
        "__csim", cosine_similarity(F.col("__v"), F.col("__cent"))
    )
    w = Window.partitionBy("__id").orderBy(F.col("__csim").desc(), "__list")
    assign = (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= nprobe)
        .select("__id", "__list", "__rk")
    )
    top1 = assign.filter(F.col("__rk") == 1).select(
        F.col("__id").alias("__ida"), "__list"
    )
    probes = assign.select(F.col("__id").alias("__idb"), "__list")
    cand = (
        top1.join(probes, ["__list"])
        .filter(F.col("__ida") != F.col("__idb"))
        .select(
            F.least("__ida", "__idb").alias("id_a"),
            F.greatest("__ida", "__idb").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    va = v.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"))
    vb = v.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"))
    want = {
        (r["id_a"], r["id_b"], r["cos"])
        for r in cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cos",
            F.round(cosine_similarity(F.col("__va"), F.col("__vb")), 4),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
        .collect()
    }
    assert got == want and got  # identical pair set, non-empty


def test_bitstring_words_hamming_equals_char_diff(spark):
    """The word-parsed bit_count(xor) Hamming must equal the
    character-diff count on random bitstrings, including widths that
    do not fill the last 32-bit word."""
    from spark_alchemy_spark.operators.dedup import (
        _bitstring_words,
        _words_hamming,
    )

    rng = random.Random(1234)
    for n_bits in (64, 48, 33, 96):
        rows = [
            ("".join(rng.choice("01") for _ in range(n_bits)),
             "".join(rng.choice("01") for _ in range(n_bits)))
            for _ in range(50)
        ] + [("0" * n_bits, "0" * n_bits), ("1" * n_bits, "0" * n_bits)]
        df = spark.createDataFrame(rows, "a string, b string")
        char_diff = F.size(
            F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.lit(n_bits)),
                    lambda i: F.substring("a", i, 1) != F.substring("b", i, 1),
                ),
                lambda d: d,
            )
        )
        bad = df.select(
            (
                _words_hamming(
                    _bitstring_words(F.col("a"), n_bits),
                    _bitstring_words(F.col("b"), n_bits),
                )
                != char_diff
            ).alias("mismatch")
        ).filter("mismatch").count()
        assert bad == 0, f"hamming mismatch at n_bits={n_bits}"


def test_brute_force_kernel_equals_expression_topk(spark):
    """The BLAS partial-top-k brute_force_topk must emit exactly what
    the old crossJoin + HOF cosine + global window form produced —
    including NULL cosines for zero-norm vectors and the
    (rounded cos desc, neighbor id) tie order."""
    from pyspark.sql.window import Window

    from spark_alchemy_spark.operators.dedup import (
        _as_double,
        cosine_similarity,
    )
    from spark_alchemy_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)  # includes any zero-norm rows
    k = 7
    got = {
        tuple(r)
        for r in brute_force_topk(
            emb, queries, "vec_id", "embedding", k=k
        ).collect()
    }

    # the pre-r10 expression form, reconstructed verbatim
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"),
            _as_double("embedding").alias("__qv"),
        )
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        _as_double("embedding").alias("__cv"),
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 4),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    want = {
        tuple(r)
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
        .collect()
    }
    assert got == want and len(got) > 0
