"""Round-6 operator tests: streaming semantic dedup (stateless +
batch-equal), the CMS skew-planning primitives, bitstring Hamming
pairs, and the selective-nprobe planted-recall law."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.test_semantic_dedup import _ref_hash_embedding, _ref_pretok


def test_stream_semantic_dedup_stateless_and_batch_equal(spark, tmp_path):
    """The ingest-dedup stream must (a) match an exact Python replay of
    the batch semantics over EVERY micro-batch split (replay-order
    freedom) and (b) run with ZERO state-store rows — it is foreachBatch
    against a static index, so no stateOperators may appear in any
    progress event (the state-growth guard for this family)."""
    import math

    from spark_alchemy_spark.streaming import semantic_dedup_at_ingest

    standing_rows = [
        (0, "en", "alpha beta gamma delta"),
        (2, "en", "epsilon zeta eta theta"),
        (4, "de", "iota kappa lam mu"),
    ]
    arrival_rows = [
        (1, "en", "alpha beta gamma delta"),   # identical -> dropped
        (3, "en", "alpha beta gamma delta."),  # near-identical tokens
        (5, "de", "nu xi omicron pi"),         # unrelated -> survives
        (7, "de", "iota kappa lam mu"),        # identical -> dropped
        (9, "en", "rho sigma tau upsilon"),    # unrelated -> survives
    ]
    d = tmp_path / "arrivals"
    d.mkdir()
    for i, r in enumerate(arrival_rows):  # one file per arrival => 5 batches
        spark.createDataFrame(
            [r], "doc_id long, lang string, text string"
        ).coalesce(1).write.mode("overwrite").parquet(str(d / f"f{i}"))

    standing = spark.createDataFrame(
        standing_rows, "doc_id long, lang string, text string"
    )
    arrivals = (
        spark.readStream.schema("doc_id long, lang string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    progress: list = []
    got = {
        r["lang"]: (r["n_arrived"], r["n_dropped"], r["n_survived"])
        for r in semantic_dedup_at_ingest(
            arrivals, standing, dim=32, threshold=0.95, n_centroids=2,
            seed=42, progress_out=progress,
        ).collect()
    }

    # Python replay of the exact (probe-all) semantics
    def cos(u, v):
        dot = sum(a * b for a, b in zip(u, v))
        nu, nv = math.sqrt(sum(a * a for a in u)), math.sqrt(sum(b * b for b in v))
        if nu == 0 or nv == 0:
            return -1.0
        return round(dot / (nu * nv), 4)

    s_vecs = [_ref_hash_embedding(t, 32) for _, _, t in standing_rows]
    want: dict = {}
    for _, lang, text in arrival_rows:
        v = _ref_hash_embedding(text, 32)
        dropped = any(
            _ref_pretok(text) and cos(v, sv) >= 0.95 for sv in s_vecs
        )
        a, dr, su = want.get(lang, (0, 0, 0))
        want[lang] = (a + 1, dr + int(dropped), su + int(not dropped))
    assert got == want
    # the identical plants really dropped; the punctuated near-miss
    # (doc 3: one extra '.' token, cos ~0.894) correctly survived
    assert want["en"][1] == 1 and want["de"][1] == 1

    # stateless: multiple batches ran, none with a state operator
    assert len(progress) >= 2
    assert all(p["stateOperators"] == [] for p in progress)


def test_cms_max_frequency_is_sound_upper_bound(spark):
    """cms_max_frequency law: >= the true hottest-key frequency, and
    <= true + eps*N (the standard CMS collision mass)."""
    from spark_alchemy_spark.functions.cms import (
        cms_max_frequency,
        count_min_sketch_agg,
    )

    rows = [(1,)] * 500 + [(k,) for k in range(2, 402)]  # f_max=500, N=900
    df = spark.createDataFrame(rows, "k long")
    sk = df.agg(count_min_sketch_agg("k", 0.001, 0.99, 42).alias("s")).collect()[
        0
    ]["s"]
    est = cms_max_frequency(sk)
    assert 500 <= est <= 500 + int(0.001 * 900) + 1


def test_sketch_planned_join_picks_all_three_strategies(spark):
    """The three legs of the sketch planner: broadcast when the right
    side fits, salted merge when the left key is skewed past the
    threshold, plain merge otherwise — and the salted leg must be
    row-for-row equal to the plain join (semantics preserved)."""
    from spark_alchemy_spark.functions.cms import sketch_planned_join

    left_skew = spark.createDataFrame(
        [(1, i) for i in range(900)] + [(k, k) for k in range(2, 102)],
        "k long, payload long",
    )
    right = spark.createDataFrame([(k,) for k in range(1, 102)], "k long")

    jb, pb = sketch_planned_join(left_skew, right, "k", broadcast_rows=1000)
    assert pb["strategy"] == "broadcast"

    js, ps = sketch_planned_join(
        left_skew, right, "k", broadcast_rows=1, salt_above=500
    )
    assert ps["strategy"] == "salted"
    assert ps["left_max_freq_est"] >= 900
    assert js.count() == left_skew.join(right, "k").count()
    plan = js._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan

    jm, pm = sketch_planned_join(
        left_skew, right, "k", broadcast_rows=1, salt_above=10_000
    )
    assert pm["strategy"] == "merge"
    assert jm.count() == left_skew.join(right, "k").count()
    assert "__salt" not in jm._jdf.queryExecution().executedPlan().toString()


def test_bitstring_hamming_pairs_exact_recall(spark):
    """Banded candidate generation must be COMPLETE for the default
    radius (pigeonhole: 4x16 bands cover Hamming <= 3): the pair set
    equals the brute-force pair set on random fingerprints."""
    import random

    from spark_alchemy_spark.operators.dedup import bitstring_hamming_pairs

    rng = random.Random(7)
    base = [rng.randint(0, 1) for _ in range(64)]

    def flip(bits, k):
        out = list(bits)
        for i in rng.sample(range(64), k):
            out[i] ^= 1
        return out

    fps = {0: base}
    for i in range(1, 30):
        fps[i] = flip(base, rng.choice([1, 2, 3, 4, 8, 32]))
    rows = [(i, "".join(map(str, b))) for i, b in fps.items()]
    df = spark.createDataFrame(rows, "rep long, ahash string")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in bitstring_hamming_pairs(df, "rep", "ahash", max_hamming=3).collect()
    }
    want = set()
    for i in fps:
        for j in fps:
            if i < j:
                d = sum(a != b for a, b in zip(fps[i], fps[j]))
                if d <= 3:
                    want.add((i, j, d))
    assert got == want and want  # exact, and the case is non-trivial


def test_bitstring_hamming_pairs_rejects_bad_geometry(spark):
    from spark_alchemy_spark.operators.dedup import bitstring_hamming_pairs

    df = spark.createDataFrame([(1, "0" * 64)], "rep long, ahash string")
    with pytest.raises(ValueError, match="divisible"):
        bitstring_hamming_pairs(df, "rep", "ahash", n_bits=64, n_bands=5)
    with pytest.raises(ValueError, match="complete"):
        bitstring_hamming_pairs(df, "rep", "ahash", max_hamming=4, n_bands=4)


def test_selective_recall_entry_laws(spark):
    """The planted-recall entry's structural guarantees, asserted
    directly (not just via the oracle): identical plants are found at
    100% exactly, scaled plants clear the pinned threshold, and the
    executed plan carries no corpus cartesian."""
    from spark_alchemy_spark.queries import QUERIES

    r = QUERIES["dedup_semantic_selective"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r["exact_recall_ppm"] == 1_000_000
    assert r["scaled_recall_ok"] and r["plan_ok"]
    assert r["n_planted"] > 0 and r["n_planted"] % 2 == 0


def test_cross_pairs_kernel_matches_hof_pairs(spark):
    """The cross-set blocked BLAS kernel (streaming verify's probe-all
    delegate) must emit EXACTLY the pairs the row-at-a-time HOF cosine
    path emits — same rounding contract, same zero-norm handling."""
    import random

    from spark_alchemy_spark.operators.dedup import (
        _cross_pairs_cosine_blocked,
        cosine_similarity,
    )

    rng = random.Random(13)
    mk = lambda n, off: [
        (off + i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(n)
    ]
    a_rows = mk(40, 0) + [(90, [0.0] * 8)]  # zero-norm row: must drop
    b_rows = mk(35, 1000) + [(1090, [0.0] * 8)]
    # plant exact duplicates across the sets so matches exist at 0.95
    for k in range(5):
        b_rows[k] = (1000 + k, list(a_rows[k][1]))
    a = spark.createDataFrame(a_rows, "__id long, __v array<double>")
    b = spark.createDataFrame(b_rows, "__id long, __v array<double>")

    got = {
        (r["id_a"], r["id_b"], r["cos"])
        for r in _cross_pairs_cosine_blocked(a, b, 0.9).collect()
    }
    # zero-norm rows have no defined cosine: the kernel must drop them
    assert not any(90 in p[:2] or 1090 in p[:2] for p in got)
    nz = F.exists("__v", lambda x: x != 0)  # ANSI: reference path must
    want = {                                # not divide by zero norms
        (r["id_a"], r["id_b"], r["cos"])
        for r in (
            a.filter(nz).alias("x")
            .crossJoin(b.filter(nz).alias("y"))
            .select(
                F.col("x.__id").alias("id_a"),
                F.col("y.__id").alias("id_b"),
                F.round(
                    cosine_similarity(F.col("x.__v"), F.col("y.__v")), 4
                ).alias("cos"),
            )
            .filter(F.col("cos") >= 0.9)
            .collect()
        )
    }
    assert got == want and len(want) >= 5


def test_stream_semantic_dedup_kernel_equals_join_path(spark, tmp_path):
    """At probe-all the streaming verify delegates to the cross-set
    kernel; forcing the candidate-join path must give the identical
    per-language report (the delegation is a pure execution-strategy
    swap, never a semantics change)."""
    from spark_alchemy_spark.streaming import semantic_dedup_at_ingest

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "lang", "text")
    standing = docs.filter(F.col("doc_id") % 2 == 0)
    d = tmp_path / "arr"
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(str(d))

    def run(force):
        arrivals = spark.readStream.schema(docs.schema).parquet(str(d))
        return {
            tuple(r)
            for r in semantic_dedup_at_ingest(
                arrivals, standing, dim=32, threshold=0.95,
                n_centroids=8, seed=42, _force_join_verify=force,
            ).collect()
        }

    kernel, join = run(False), run(True)
    assert kernel == join and kernel
