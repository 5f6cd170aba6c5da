"""Round-4 operators: JVM window longest_streak (production path for
the partitioned-TABLE UDTF), KLL weighted quantiles, and the
weighted-median scale path."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_alchemy_spark.operators.temporal import longest_streak

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# longest_streak
# ---------------------------------------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=u, event_type=t, ts=ts, event_id=e) for u, t, ts, e in rows]
    )


def test_longest_streak_basic(spark):
    df = _events(
        spark,
        [
            (1, "a", 1, 1),
            (1, "a", 2, 2),
            (1, "b", 3, 3),
            (1, "b", 4, 4),
            (1, "b", 5, 5),
            (2, "x", 1, 6),
        ],
    )
    got = {
        tuple(r)
        for r in longest_streak(
            df, "user_id", "event_type", ["ts", "event_id"]
        ).collect()
    }
    assert got == {(1, "b", 3, 5), (2, "x", 1, 1)}


def test_longest_streak_tie_resolves_to_first_run(spark):
    # two runs of length 2: 'a' first in time order wins
    df = _events(
        spark,
        [(1, "a", 1, 1), (1, "a", 2, 2), (1, "b", 3, 3), (1, "b", 4, 4)],
    )
    row = longest_streak(df, "user_id", "event_type", ["ts", "event_id"]).collect()[0]
    assert (row["best_type"], row["best_streak"], row["n_rows"]) == ("a", 2, 4)


def test_longest_streak_null_types_form_runs(spark):
    # eqNullSafe: NULL == NULL continues a run (IS DISTINCT FROM in SQL)
    df = _events(
        spark,
        [(1, None, 1, 1), (1, None, 2, 2), (1, "a", 3, 3)],
    )
    row = longest_streak(df, "user_id", "event_type", ["ts", "event_id"]).collect()[0]
    assert (row["best_type"], row["best_streak"]) == (None, 2)


def test_longest_streak_matches_udtf_entry(spark):
    """The production window operator and the Spark 4 UDTF API demo
    must produce identical results on the same events — the UDTF entry
    runs on its pinned user quarter (user_id % 4 = 0), so the JVM side
    is compared on that same slice."""
    from spark_alchemy_spark.queries import QUERIES

    jvm = {
        tuple(r)
        for r in QUERIES["streak_longest_per_user"](spark, SF).collect()
        if r["user_id"] % 4 == 0
    }
    udtf = {
        tuple(r)
        for r in QUERIES["udtf_partitioned_streaks"](spark, SF).collect()
    }
    assert jvm == udtf and len(jvm) > 0


def test_longest_streak_plan_one_exchange_no_python(spark):
    """The scale contract: zero Python boundaries, and ONE shuffle —
    the run/best windows partition by supersets of the key and must
    reuse its hashpartitioning (sorts, not exchanges)."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    df = longest_streak(ev, "user_id", "event_type", ["ts", "event_id"])
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "PythonUDTF" not in plan
    # AQE's toString prints the final AND the initial plan; count
    # exchanges only in the final section
    final = plan.split("== Initial Plan ==")[0]
    n = final.count("Exchange hashpartitioning")
    assert n == 1, f"expected 1 exchange in final plan, got {n}:\n{final[:3000]}"


# ---------------------------------------------------------------------------
# KLL weighted quantiles
# ---------------------------------------------------------------------------


def test_kll_weighted_quantiles_exact_in_exact_mode(spark):
    """Below KLL capacity every value is retained: weighted quantiles
    are exact order statistics of the expanded multiset."""
    from spark_alchemy_spark.functions.sketches import kll_weighted_quantiles

    df = spark.createDataFrame(
        [Row(g="a", v=float(v), w=w) for v, w in [(1, 1), (2, 3), (10, 1)]]
    )
    # expanded multiset: [1, 2, 2, 2, 10] -> median 2, q0.9 -> 10
    out = kll_weighted_quantiles(df, ["g"], "v", "w", ranks=[0.5, 0.9]).collect()[0]
    assert out["n_weight"] == 5
    assert out["q_0_5"] == 2.0
    assert out["q_0_9"] == 10.0


def test_kll_weighted_quantiles_zero_weight_rows_are_absent(spark):
    from spark_alchemy_spark.functions.sketches import kll_weighted_quantiles

    df = spark.createDataFrame(
        [Row(g="a", v=1.0, w=2), Row(g="a", v=99.0, w=0)]
    )
    out = kll_weighted_quantiles(df, ["g"], "v", "w", ranks=[1.0]).collect()[0]
    assert out["n_weight"] == 2 and out["q_1_0"] == 1.0


def test_kll_weighted_quantiles_out_of_int32_weight_drops_row(spark):
    """A weight outside int32 drops its row (documented contract):
    try_cast makes it NULL instead of CAST_OVERFLOW under ANSI mode or
    a silent wrap (bogus huge array_repeat) with ANSI off."""
    from spark_alchemy_spark.functions.sketches import kll_weighted_quantiles

    df = spark.createDataFrame(
        [Row(g="a", v=1.0, w=2), Row(g="a", v=99.0, w=2**31 + 7)]
    )
    out = kll_weighted_quantiles(df, ["g"], "v", "w", ranks=[1.0]).collect()[0]
    assert out["n_weight"] == 2 and out["q_1_0"] == 1.0


def test_kll_weighted_shuffle_carries_sketches_not_rows(spark):
    """The expansion must stay map-side: the aggregate below the
    exchange is the partial kll sketch, so the shuffle volume is
    #groups x sketch bytes — assert partial aggregation exists under
    the exchange in the plan."""
    from spark_alchemy_spark.functions.sketches import kll_weighted_quantiles

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = kll_weighted_quantiles(
        li, ["l_returnflag"], "l_extendedprice", "l_quantity", ranks=[0.5]
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # top-down order must be: Exchange, THEN the partial kll aggregate,
    # THEN the Generate expansion — i.e. both partial agg and explode
    # run below the shuffle (map side).  A regression that shuffled
    # expanded rows or dropped the partial agg breaks the ordering (or
    # the index() lookups raise).
    pos_x = final.index("Exchange hashpartitioning")
    pos_partial = final.index("partial_kll_sketch_agg_double")
    pos_gen = final.index("Generate explode")
    assert pos_x < pos_partial < pos_gen, final[:2500]


def test_ivf_append_drift_detection(spark, tmp_path):
    """A well-matched append batch keeps the drift ratio ~1; a
    pathological batch (a cluster the build corpus never saw, far from
    every trained centroid) must trip retrain_recommended.

    Uses synthetic CLUSTERED vectors, not the near-uniform testdata
    embeddings: the detector's contract is about clustered corpora
    (where 'no centroid is close to the batch' is a meaningful event),
    and tiny uniform corpora carry train-set bias in the baseline."""
    import numpy as np

    from spark_alchemy_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
    )

    rng = np.random.default_rng(7)
    dim, per = 8, 60
    centers = np.eye(4, dim) * 10.0

    def cluster_rows(c_idx, start_id, n):
        pts = centers[c_idx] + rng.normal(0, 0.5, size=(n, dim))
        return [
            Row(vec_id=start_id + i, embedding=[float(x) for x in pts[i]])
            for i in range(n)
        ]

    corpus = []
    for c in range(4):
        corpus += cluster_rows(c, 1000 * c, per)
    standing = spark.createDataFrame(corpus)
    path = str(tmp_path / "ivf_drift")
    build_ivf_index(standing, "vec_id", "embedding", path, n_centroids=4)

    good = spark.createDataFrame(
        [r for c in range(4) for r in cluster_rows(c, 10_000 + 1000 * c, 10)]
    )
    rep = append_ivf_index(good, "vec_id", "embedding", path)
    assert rep["n_appended"] == 40
    assert rep["drift_ratio"] > 0.9 and not rep["retrain_recommended"]

    # a new cluster in a direction no centroid covers (negative octant)
    far = -10.0 * np.ones(dim)
    bad_rows = [
        Row(
            vec_id=50_000 + i,
            embedding=[float(x) for x in far + rng.normal(0, 0.5, size=dim)],
        )
        for i in range(40)
    ]
    rep2 = append_ivf_index(
        spark.createDataFrame(bad_rows), "vec_id", "embedding", path
    )
    assert rep2["drift_ratio"] < 0.8 and rep2["retrain_recommended"]
    # /stats is a RUNNING (n, mean) since round 6 (each append folds
    # itself in after its own drift comparison, which is what keeps
    # rebalance's incremental update exact): the second append's
    # baseline is the first append's baseline with the good batch
    # folded in — nothing else
    want = (rep["build_mean_cos"] * 240 + rep["batch_mean_cos"] * 40) / 280
    assert rep2["build_mean_cos"] == pytest.approx(want, rel=1e-12)


def test_weighted_median_sketch_entry_agrees_with_exact_entry(spark):
    from spark_alchemy_spark.queries import QUERIES

    exact = {
        (r["l_returnflag"], r["weighted_median"])
        for r in QUERIES["weighted_median_price"](spark, SF).collect()
    }
    binned = {
        (r["l_returnflag"], r["weighted_median"])
        for r in QUERIES["weighted_median_price_sketch"](spark, SF).collect()
    }
    assert exact == binned and len(exact) == 3


def test_ivf_append_empty_batch_is_noop(spark, tmp_path):
    """An empty append period must return a no-op report, not crash on
    the NULL batch mean."""
    from spark_alchemy_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path / "ivf_empty")
    build_ivf_index(emb, "vec_id", "embedding", path, n_centroids=4)
    empty = emb.filter(F.col("vec_id") < 0)
    rep = append_ivf_index(empty, "vec_id", "embedding", path)
    assert rep == {
        "n_appended": 0,
        "batch_mean_cos": None,
        "build_mean_cos": None,
        "drift_ratio": 1.0,
        "retrain_recommended": False,
        "list_counts": {},
        "skipped_replay": False,  # round 8: the txn-log replay flag
    }


def test_streak_tiebreak_engine_matches_oracle(spark):
    """Tie-break regression (code-review r4): two runs of equal length
    where the later-starting run contains a smaller event_id deeper
    inside.  'First run in (ts, event_id) order' must win in BOTH the
    engine and the DuckDB oracle — min(ts)/min(event_id) taken
    separately would pick the wrong run ('y')."""
    import duckdb
    from datetime import datetime

    from spark_alchemy_spark.queries import ORACLES

    rows = [
        (1, "x", datetime(2026, 1, 1, 0, 0, 5), 2),
        (1, "x", datetime(2026, 1, 1, 0, 0, 5), 3),
        (1, "y", datetime(2026, 1, 1, 0, 0, 5), 9),
        (1, "y", datetime(2026, 1, 1, 0, 0, 6), 1),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    got = longest_streak(df, "user_id", "event_type", ["ts", "event_id"]).collect()[0]
    assert (got["best_type"], got["best_streak"]) == ("x", 2)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (user_id BIGINT, event_type VARCHAR, "
        "ts TIMESTAMP, event_id BIGINT)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?)", rows)
    oracle = con.execute(ORACLES["streak_longest_per_user"]).fetchall()
    assert len(oracle) == 1
    assert (oracle[0][1], oracle[0][2]) == ("x", 2)


def test_strip_shared_spans_semantics(spark):
    """Cross-doc duplicated k-gram coverage is cut exactly; within-doc
    repeats and sub-k shared spans survive; fully-unique and empty
    docs come back intact."""
    from spark_alchemy_spark.operators.dedup import strip_shared_spans

    para = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"doc one starts here {para} and then ends differently"),
            (2, f"totally other opening {para} with another distinct tail"),
            (3, "unique content only nothing copied anywhere at all here"),
            # within-doc repeat of an 8-gram, no other doc has it
            (4, "self copy block one two three four five six "
                "self copy block one two three four five six"),
            # shares only a 4-token run with doc 1 (< k): survives
            (5, "alpha beta gamma delta but then it diverges completely"),
            (6, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in strip_shared_spans(docs, "doc_id", "text", k=8).collect()
    }
    assert len(out) == 6
    # docs 1 and 2: exactly the 8 shared tokens cut
    assert out[1]["n_removed"] == 8
    assert out[1]["clean_text"] == "doc one starts here and then ends differently"
    assert out[2]["n_removed"] == 8
    assert "alpha" not in out[2]["clean_text"]
    # doc 3 untouched
    assert out[3]["n_removed"] == 0 and out[3]["clean_text"].startswith("unique")
    # doc 4: within-doc repeat does not flag (distinct-doc frequency)
    assert out[4]["n_removed"] == 0
    # doc 5: 4-token overlap is below the k=8 resolution
    assert out[5]["n_removed"] == 0
    # empty doc: present, zeros, empty text
    assert out[6]["n_kept"] == 0 and out[6]["clean_text"] == ""


def test_strip_shared_spans_full_copy_and_min_docs(spark):
    from spark_alchemy_spark.operators.dedup import strip_shared_spans

    body = " ".join(f"w{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, body), (2, body), (3, body)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           strip_shared_spans(docs, "doc_id", "text", k=8).collect()}
    assert all(out[i]["n_kept"] == 0 and out[i]["clean_text"] == ""
               for i in (1, 2, 3))
    # min_docs=4: three copies are below the bar, nothing cut
    out2 = strip_shared_spans(docs, "doc_id", "text", k=8, min_docs=4).collect()
    assert all(r["n_removed"] == 0 for r in out2)


def test_strip_contaminated_spans_cuts_only_benchmark_coverage(spark):
    from spark_alchemy_spark.operators.dedup import strip_contaminated_spans

    q = "what is the capital of france answer paris"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"intro text before the quiz {q} and trailing discussion"),
            (2, "no benchmark content in this one at all whatsoever"),
            (3, q),  # doc IS the benchmark item -> fully cut
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(1, q)], "qid long, text string")
    out = {
        r["doc_id"]: r
        for r in strip_contaminated_spans(
            docs, bench, "doc_id", "text", k=8
        ).collect()
    }
    assert out[1]["n_removed"] == 8
    assert out[1]["clean_text"] == "intro text before the quiz and trailing discussion"
    assert out[2]["n_removed"] == 0
    assert out[3]["n_kept"] == 0 and out[3]["clean_text"] == ""


def test_int8_quantization_roundtrip_bound(spark):
    from pyspark.sql import functions as F

    from spark_alchemy_spark.operators.similarity import (
        dequantize_int8,
        quantize_embeddings_int8,
    )

    df = spark.createDataFrame(
        [
            (1, [0.5, -1.0, 0.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),       # zero vector
            (3, [3.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    q = quantize_embeddings_int8(df, "embedding")
    rows = {r["vec_id"]: r for r in q.collect()}
    assert rows[1]["scale"] == 1.0
    assert rows[1]["codes"] == [64, -127, 32, 0]  # floor(x*127+0.5)
    assert rows[2]["scale"] == 0.0 and rows[2]["codes"] == [0, 0, 0, 0]
    assert rows[3]["codes"] == [127]
    # reconstruction bounded by scale/254 per element
    err = q.select(
        F.array_max(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                dequantize_int8(),
                lambda a, b: F.abs(a - b),
            )
        ).alias("e"),
        "scale",
    )
    bad = err.filter(
        (F.col("scale") > 0) & (F.col("e") > F.col("scale") / 254 * 1.000001)
    ).count()
    assert bad == 0
