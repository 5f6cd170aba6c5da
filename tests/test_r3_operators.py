"""Round-3 operators: incremental cross-corpus dedup, triangle
counting, geo radius join."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_alchemy_spark.operators.dedup import (
    cross_corpus_jaccard_pairs,
    incremental_dedup,
)
from spark_alchemy_spark.operators.geo import haversine_km, radius_join
from spark_alchemy_spark.operators.graph import triangle_count


# ---------------------------------------------------------------------------
# cross-corpus dedup
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_cross_corpus_pairs_exact_jaccard(spark):
    new = _docs(spark, [(1, "a b c d e"), (2, "z y x w v")])
    cor = _docs(spark, [(10, "a b c d e f"), (11, "completely different words here")])
    got = {
        (r["new_id"], r["corpus_id"], r["inter"], r["uni"])
        for r in cross_corpus_jaccard_pairs(
            new, cor, "doc_id", "text", n=3, threshold_num=1, threshold_den=2
        ).collect()
    }
    # doc1 trigrams {abc,bcd,cde} vs doc10 {abc,bcd,cde,def}: inter 3, uni 4
    assert got == {(1, 10, 3, 4)}


def test_cross_corpus_never_pairs_corpus_with_itself(spark):
    # two identical corpus docs must NOT appear as a pair
    new = _docs(spark, [(1, "unrelated text entirely distinct")])
    cor = _docs(spark, [(10, "a b c d"), (11, "a b c d")])
    assert (
        cross_corpus_jaccard_pairs(
            new, cor, "doc_id", "text", threshold_num=1, threshold_den=10
        ).count()
        == 0
    )


def test_cross_corpus_hot_shingle_correction_exact(spark):
    # viral trigram "the end came" present in EVERY corpus doc; cap at
    # DF 3 forces the hot path.  Pair (1,10) shares hot + cold
    # shingles -> counts must still be exact.
    viral = "the end came"
    cor = _docs(
        spark,
        [(10, f"alpha beta gamma delta {viral}")]
        + [(10 + k, f"filler{k} words{k} here{k} {viral}") for k in range(1, 6)],
    )
    new = _docs(spark, [(1, f"alpha beta gamma delta {viral}")])
    capped = cross_corpus_jaccard_pairs(
        new, cor, "doc_id", "text", threshold_num=1, threshold_den=100,
        max_shingle_df=3,
    ).collect()
    uncapped = cross_corpus_jaccard_pairs(
        new, cor, "doc_id", "text", threshold_num=1, threshold_den=100,
        max_shingle_df=None,
    ).collect()
    key = lambda r: (r["new_id"], r["corpus_id"])  # noqa: E731
    capped_m = {key(r): (r["inter"], r["uni"]) for r in capped}
    uncapped_m = {key(r): (r["inter"], r["uni"]) for r in uncapped}
    # the identical pair (1,10) shares cold shingles -> exact under cap
    assert capped_m[(1, 10)] == uncapped_m[(1, 10)]
    # pairs whose ENTIRE overlap is the viral shingle are dropped by
    # design under the cap
    assert set(capped_m) <= set(uncapped_m)


def test_incremental_dedup_drops_exact_and_near(spark):
    cor = _docs(
        spark,
        [
            (10, "the quick brown fox jumps over the lazy dog today"),
            (11, "some corpus document with its own words"),
        ],
    )
    new = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog today"),  # exact
            (2, "the quick brown fox jumps over the lazy dog yesterday"),  # near
            (3, "an entirely novel piece of text nothing shares"),  # survivor
            (4, "xy"),  # below shingle width, no exact match -> survivor
        ],
    )
    got = sorted(
        r["doc_id"]
        for r in incremental_dedup(new, cor, "doc_id", "text").collect()
    )
    assert got == [3, 4]


# ---------------------------------------------------------------------------
# triangle counting
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def test_triangle_count_known_graph(spark):
    # K4 has 4 triangles; edges given in mixed directions + a dup + a
    # self-loop, all of which must be tolerated
    k4 = [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (4, 2), (3, 4), (3, 3)]
    assert triangle_count(_edges(spark, k4)).collect()[0]["n_triangles"] == 4


def test_triangle_count_star_has_none(spark):
    star = [(0, i) for i in range(1, 8)]
    assert triangle_count(_edges(spark, star)).collect()[0]["n_triangles"] == 0


def test_triangle_count_two_disjoint_triangles(spark):
    g = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10)]
    assert triangle_count(_edges(spark, g)).collect()[0]["n_triangles"] == 2


# ---------------------------------------------------------------------------
# geo radius join
# ---------------------------------------------------------------------------


def test_radius_join_matches_brute_force_at_high_latitude(spark):
    # points at lat ~59-60 where lon degrees are half-width: an
    # unscaled lon cell would lose cross-cell pairs; compare against
    # the O(n^2) exact join
    pts = [
        Row(id=i, lat=59.0 + (i * 13 % 100) / 100.0, lon=10.0 + (i * 29 % 200) / 100.0)
        for i in range(60)
    ]
    df = spark.createDataFrame(pts)
    got = {
        (r["id_a"], r["id_b"])
        for r in radius_join(
            df, "id", "lat", "lon", radius_km=30.0, max_abs_lat=60.0
        ).collect()
    }
    a, b = df.alias("a"), df.alias("b")
    brute = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn(
            "d",
            haversine_km(
                F.col("a.lat"), F.col("a.lon"), F.col("b.lat"), F.col("b.lon")
            ),
        )
        .filter(F.col("d") < 30.0)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    want = {(r["id_a"], r["id_b"]) for r in brute.collect()}
    assert got == want
    assert len(want) > 0  # non-vacuous


def test_radius_join_rejects_polar_band(spark):
    df = spark.createDataFrame([Row(id=1, lat=89.0, lon=0.0)])
    with pytest.raises(ValueError):
        radius_join(df, "id", "lat", "lon", radius_km=10.0, max_abs_lat=90.0)


def test_haversine_known_distance(spark):
    # Paris (48.8566, 2.3522) -> London (51.5074, -0.1278) ~ 343-344 km
    row = (
        spark.range(1)
        .select(
            haversine_km(
                F.lit(48.8566), F.lit(2.3522), F.lit(51.5074), F.lit(-0.1278)
            ).alias("d")
        )
        .collect()[0]
    )
    assert math.isclose(row["d"], 343.5, abs_tol=2.0)


# ---------------------------------------------------------------------------
# streaming data source drain contract
# ---------------------------------------------------------------------------


def test_simple_stream_reader_read_returns_copyable_iterator():
    """The wrapper probes emptiness with next(it) when the stream
    drains (a bare list raises TypeError and kills the query) and
    copy.copy()s the cached iterator per replay — read() must satisfy
    both."""
    import copy
    from collections.abc import Iterator

    from spark_alchemy_spark.sources.pyds import SynthEventsSimpleStreamReader

    r = SynthEventsSimpleStreamReader(10, 3, 4)
    it, end = r.read({"i": 0})
    assert isinstance(it, Iterator)
    assert end == {"i": 4}
    dup = copy.copy(it)
    assert list(dup) == list(r.readBetweenOffsets({"i": 0}, {"i": 4}))
    assert list(it) == list(r.readBetweenOffsets({"i": 0}, {"i": 4}))
    # drained tail: empty ITERATOR with an unchanged offset
    tail, tail_end = r.read({"i": 10})
    assert isinstance(tail, Iterator)
    assert next(tail, None) is None
    assert tail_end == {"i": 10}


def test_radius_join_boundary_band_parity(spark):
    # irregular (non-grid-aligned) coordinates with many pairs within
    # ~0.1% of the radius: catches cell sizing that is even slightly
    # smaller than the radius (the 111.32-vs-111.195 km/deg bug)
    pts = [
        Row(
            id=i,
            lat=(i * 7919 % 10007) / 10007.0 * 0.9,  # 0..0.9 deg
            lon=(i * 104729 % 10007) / 10007.0 * 0.9,
        )
        for i in range(120)
    ]
    df = spark.createDataFrame(pts)
    got = {
        (r["id_a"], r["id_b"])
        for r in radius_join(
            df, "id", "lat", "lon", radius_km=25.0, max_abs_lat=1.0
        ).collect()
    }
    a, b = df.alias("a"), df.alias("b")
    brute = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn(
            "d",
            haversine_km(
                F.col("a.lat"), F.col("a.lon"), F.col("b.lat"), F.col("b.lon")
            ),
        )
        .filter(F.col("d") < 25.0)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    want = {(r["id_a"], r["id_b"]) for r in brute.collect()}
    assert got == want
    assert len(want) > 50  # dense enough to exercise the boundary band


def test_radius_join_antimeridian_pairs(spark):
    # points straddling +/-180: cells must wrap, not sit 1000s apart
    pts = [
        Row(id=1, lat=10.0, lon=179.95),
        Row(id=2, lat=10.0, lon=-179.95),  # ~21.9 km from id=1
        Row(id=3, lat=10.0, lon=179.0),    # ~104 km from id=2
        Row(id=4, lat=10.0, lon=0.0),
    ]
    df = spark.createDataFrame(pts)
    got = {
        (r["id_a"], r["id_b"])
        for r in radius_join(
            df, "id", "lat", "lon", radius_km=25.0, max_abs_lat=11.0
        ).collect()
    }
    assert got == {(1, 2)}


def test_local_clustering_k4_and_star(spark):
    from spark_alchemy_spark.operators.graph import local_clustering

    k4 = _edges(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])
    rows = {r["v"]: r for r in local_clustering(k4).collect()}
    assert set(rows) == {1, 2, 3, 4}
    for r in rows.values():
        assert r["deg"] == 3 and r["n_triangles"] == 3 and r["coeff"] == 1.0

    star = _edges(spark, [(0, i) for i in range(1, 6)])
    srows = {r["v"]: r for r in local_clustering(star).collect()}
    # leaves have deg 1 -> excluded; the hub has deg 5, zero triangles
    assert set(srows) == {0}
    assert srows[0]["n_triangles"] == 0 and srows[0]["coeff"] == 0.0


def test_cross_corpus_equals_restricted_self_join(spark):
    """cross_corpus_jaccard_pairs(new, cor) must equal the full
    self-join of (new UNION cor) restricted to cross pairs — the
    equivalence that makes the incremental operator a drop-in for
    re-running global dedup (ids disjoint, new ids < corpus ids, so
    the a<b self-join orientation matches (new, corpus))."""
    from spark_alchemy_spark.operators.dedup import ngram_jaccard_pairs

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox leaps over the lazy dog",
        "pack my box with five dozen liquor jugs today",
        "pack my box with five dozen liquor jugs tonight",
        "entirely different content with no overlap at all",
    ]
    new = _docs(spark, [(i, texts[i % 5] + f" tail{i % 2}") for i in range(5)])
    cor = _docs(spark, [(100 + i, texts[i % 5] + f" tail{i % 3}") for i in range(7)])
    cross = {
        (r["new_id"], r["corpus_id"], r["inter"], r["uni"])
        for r in cross_corpus_jaccard_pairs(
            new, cor, "doc_id", "text", threshold_num=1, threshold_den=2
        ).collect()
    }
    full = ngram_jaccard_pairs(
        new.unionByName(cor), "doc_id", "text", threshold_num=1, threshold_den=2
    )
    restricted = {
        (r["id_a"], r["id_b"], r["inter"], r["uni"])
        for r in full.collect()
        if r["id_a"] < 100 <= r["id_b"]
    }
    assert cross == restricted
    assert len(cross) > 0


def test_kcore_bounded_peels_tail(spark):
    from spark_alchemy_spark.operators.graph import kcore_bounded

    # triangle with a pendant chain: 1-2-3 triangle, 3-4-5 tail.
    # 2-core = the triangle; the tail peels off (5 first, then 4).
    g = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)])
    got = {(r["v"], r["deg"]) for r in kcore_bounded(g, k=2, rounds=3).collect()}
    assert got == {(1, 2), (2, 2), (3, 2)}

    # bounded semantics: with rounds=1 only node 5's edge is gone, so
    # node 4 (deg 1 in the induced graph) still fails the final >= k
    # filter but node 3 keeps deg 3 -> after ONE round the filter
    # yields the triangle only as well; rounds=0 returns raw deg >= 2
    got0 = {(r["v"], r["deg"]) for r in kcore_bounded(g, k=2, rounds=0).collect()}
    assert got0 == {(1, 2), (2, 2), (3, 3), (4, 2)}


def test_radius_join_narrow_final_cell_regression(spark):
    """ceil-based lon cell counts left a final NARROW cell at the wrap:
    a pair spanning that sliver landed 2 cells apart mod n and was
    silently dropped.  This pins the exact geometry (radius 50 at
    max_abs_lat 60 -> old layout had a 0.27-deg final cell)."""
    pts = [
        # just west of the old narrow final cell vs just east of -180
        Row(id=1, lat=59.9, lon=-180 + 400 * 0.8993 - 0.01),
        Row(id=2, lat=59.9, lon=-179.70),
        Row(id=3, lat=59.9, lon=0.0),
    ]
    df = spark.createDataFrame(pts)
    got = {
        (r["id_a"], r["id_b"])
        for r in radius_join(
            df, "id", "lat", "lon", radius_km=50.0, max_abs_lat=60.0
        ).collect()
    }
    assert (1, 2) in got


def test_radius_join_raises_beyond_max_abs_lat(spark):
    """Points beyond max_abs_lat would silently lose boundary pairs
    (lon cells sized for cos(max_abs_lat)); they must raise instead."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    df = spark.createDataFrame(
        [Row(id=1, lat=70.0, lon=0.0), Row(id=2, lat=10.0, lon=0.1)]
    )
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)):
        radius_join(df, "id", "lat", "lon", radius_km=25.0, max_abs_lat=60.0).collect()


def test_radius_join_plans_equi_join_on_cells(spark):
    """The candidate join must be a hash-family EQUI join on the cell
    key — a BroadcastNestedLoopJoin over the point pairs would mean
    cell bucketing fell out of the plan and the operator degraded to
    an n^2 scan.  (The only BNLJ allowed is the 9-row offset
    crossJoin.)"""
    from pyspark.sql import Row

    from spark_alchemy_spark import plans
    from spark_alchemy_spark.operators.geo import radius_join

    df = spark.createDataFrame(
        [Row(id=i, lat=float(i % 50) / 10, lon=float(i % 70) / 10) for i in range(200)]
    )
    out = radius_join(df, "id", "lat", "lon", radius_km=30.0, max_abs_lat=6.0)
    joins = plans.join_strategies(out)
    equi = [j for j in joins if "HashJoin" in j or "SortMergeJoin" in j]
    bnlj = [j for j in joins if "NestedLoop" in j]
    assert equi, f"no equi join on cell keys in {joins}"
    # offsets crossJoin may appear as BNLJ; the cell join itself must not
    assert len(bnlj) <= 2, f"unexpected nested-loop joins: {joins}"


def test_append_ivf_index_assigns_to_existing_centroids(spark, tmp_path):
    """Appending a batch must reuse the EXISTING centroids (no retrain:
    the sidecar is unchanged) and land every new vector in the list of
    its nearest centroid, queryable alongside the standing corpus."""
    import numpy as np

    from spark_alchemy_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
        ivf_topk_indexed,
    )

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8)).astype(float)
    rows = [Row(vec_id=i, embedding=[float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows)
    standing = df.filter(F.col("vec_id") < 30)
    batch = df.filter(F.col("vec_id") >= 30)
    path = str(tmp_path / "ivf")
    build_ivf_index(standing, "vec_id", "embedding", path, n_centroids=4)
    cents_before = sorted(
        tuple(r["__cent"]) for r in spark.read.parquet(path + "/centroids").collect()
    )
    append_ivf_index(batch, "vec_id", "embedding", path)
    cents_after = sorted(
        tuple(r["__cent"]) for r in spark.read.parquet(path + "/centroids").collect()
    )
    assert cents_before == cents_after  # no retrain
    lists = spark.read.parquet(path + "/lists")
    assert lists.count() == 40  # every vector present exactly once
    assert lists.select("vec_id").distinct().count() == 40
    # probing ALL lists must recover exact top-3 for a batch vector
    q = df.filter(F.col("vec_id") == 35)
    got = {
        r["neighbor_id"]
        for r in ivf_topk_indexed(
            spark, path, q, "vec_id", "embedding", k=3, nprobe=4
        ).collect()
    }
    sims = vecs @ vecs[35] / (
        np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[35])
    )
    sims[35] = -2
    want = set(np.argsort(np.round(sims, 4))[-3:].tolist())
    assert got == {int(w) for w in want}
