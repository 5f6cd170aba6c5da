"""Battery extension (round 3): the incremental-ingest, geo, graph,
CDC, and streaming-composition tiers.

Incremental / curation: cross-corpus dedup of a new batch against the
standing corpus (``dedup_incremental_batch``), containment
contamination scoring (``prep_contamination_containment``), CDC
snapshot diffs (``snapshot_diff_cdc``), robust median/MAD outlier
screening (``quality_outlier_mad``), incremental IVF index
maintenance (``ann_ivf_index_append``).

Sketch compositions: hourly HLL sketches unioned over a RANGE window
frame (``window_rolling_distinct_sketch``), sketch aggregation under
ROLLUP (``rollup_distinct_sketch``), pairwise theta-intersection
audience overlap from once-built sketches (``audience_overlap_matrix``),
percentile_approx held to its rank-error contract
(``approx_percentile_bounds``), hourly p50/p95/p99 bands
(``window_hourly_percentiles``), weighted median via cumulative-weight
windows (``weighted_median_price``).

Geo + graph: grid-cell bucketed haversine radius join
(``geo_cell_radius_join``), compact-forward triangle counting and
per-node clustering coefficients over a kNN graph
(``graph_triangle_count`` / ``graph_clustering_coefficient``), bounded
k-core peeling of the near-dup graph (``graph_kcore_dup_families``).

Lake semantics: parquet mergeSchema evolution
(``source_schema_evolution``), dynamic partition overwrite
(``source_dynamic_partition_overwrite``), null-aware NOT IN
(``nullaware_not_in_orders``).

Streaming compositions: chained stateful window aggregations
(``stream_chained_windows``), stream-stream LEFT OUTER interval join
with a safe emission horizon (``stream_interval_left_outer``),
dynamic-gap sessions in batch and streaming
(``session_window_dynamic_gap`` / ``stream_session_dynamic_gap``),
event-time-correct SCD2 enrichment (``stream_scd2_enrichment``).

Text/corpus + media + UDTF: Zipf rank-frequency fit
(``text_zipf_slope``), video scene-cut detection over per-frame means
(``media_scene_cut_counts``), polymorphic analyze()-schema UDTF
(``udtf_polymorphic_split``).

Same determinism conventions as queries.py.  Reference scope note: the
reference (swoop-inc/spark-alchemy) delegates all relational execution
to stock Spark (SURVEY.md §2.2); these entries extend the engine's
LLM-pipeline/data-engineering tier per BASELINE.json's north star.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _t, query
from .queries_ext import _sink_name


# ---------------------------------------------------------------------------
# Incremental cross-corpus dedup
# ---------------------------------------------------------------------------


@query(
    "dedup_incremental_batch",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                     for i in range(1, len(ws) - 1)]) AS s
      FROM toks WHERE len(ws) >= 3),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS nid, b.doc_id AS cid, count(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s
      WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
      GROUP BY 1, 2),
    near AS (
      SELECT DISTINCT nid FROM inter
      JOIN sizes na ON na.doc_id = nid
      JOIN sizes nb ON nb.doc_id = cid
      WHERE inter * 10 >= (na.n + nb.n - inter) * 6),
    exact AS (
      SELECT DISTINCT d.doc_id FROM documents d
      JOIN documents c ON md5(d.text) = md5(c.text) AND c.doc_id % 10 <> 0
      WHERE d.doc_id % 10 = 0)
    SELECT doc_id, lang, n_chars FROM documents
    WHERE doc_id % 10 = 0
      AND doc_id NOT IN (SELECT nid FROM near)
      AND doc_id NOT IN (SELECT doc_id FROM exact)
    """,
)
def dedup_incremental_batch(spark, sf_dir):
    """Incremental-ingest dedup: the 'new batch' (doc_id % 10 == 0) is
    deduped AGAINST the standing corpus (the other 90%) — exact content
    hash plus word-trigram Jaccard >= 0.6 — and only batch survivors
    come back.  The corpus is never self-joined: at 100 TB the standing
    corpus dwarfs every daily batch, and candidate volume must scale
    with the batch, not the corpus."""
    from .operators.dedup import incremental_dedup

    (documents,) = _t(spark, sf_dir, "documents")
    batch = documents.filter(F.col("doc_id") % 10 == 0)
    corpus = documents.filter(F.col("doc_id") % 10 != 0)
    return incremental_dedup(
        batch, corpus, "doc_id", "text",
        max_shingle_df=None,  # oracle computes uncapped Jaccard: share semantics
    ).select(
        "doc_id", "lang", "n_chars"
    )


@query(
    "prep_contamination_containment",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                     for i in range(1, len(ws) - 1)]) AS s
      FROM toks WHERE len(ws) >= 3),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 17 = 0),
    train AS (SELECT * FROM sh WHERE doc_id % 17 <> 0),
    sizes AS (SELECT doc_id, count(*) AS n FROM train GROUP BY doc_id),
    inter AS (
      SELECT t.doc_id, count(*) AS inter
      FROM train t JOIN bench b ON t.s = b.s GROUP BY 1)
    SELECT i.doc_id, inter, n AS n_shingles
    FROM inter i JOIN sizes USING (doc_id)
    WHERE inter * 2 >= n
    """,
)
def prep_contamination_containment(spark, sf_dir):
    """Train-test leakage by CONTAINMENT |A∩benchmark|/|A| >= 0.5 over
    word trigrams: the asymmetric overlap metric (Jaccard under-reports
    when a long training doc swallows a short benchmark item whole).
    Benchmark shingles are a distinct-set inverted index (deduped
    across benchmark docs BEFORE the join); training docs join it on
    the shingle key and never see each other."""
    from .functions.text import exploded_shingles

    (documents,) = _t(spark, sf_dir, "documents")
    sh = exploded_shingles(
        documents.select(F.col("doc_id").alias("__id"), F.col("text").alias("__t")),
        "__id",
        "__t",
        3,
    ).dropDuplicates(["__id", "__s"])
    bench = sh.filter(F.col("__id") % 17 == 0).select("__s").distinct()
    train = sh.filter(F.col("__id") % 17 != 0)
    sizes = train.groupBy("__id").agg(F.count(F.lit(1)).alias("n_shingles"))
    inter = (
        train.join(bench, "__s")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes, "__id")
        .filter(F.col("inter") * 2 >= F.col("n_shingles"))
        .select(F.col("__id").alias("doc_id"), "inter", "n_shingles")
    )


# ---------------------------------------------------------------------------
# CDC snapshot diff
# ---------------------------------------------------------------------------


@query(
    "snapshot_diff_cdc",
    """
    WITH snap2 AS (
      SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 7 = 0 THEN round(c_acctbal + 10, 2)
                  ELSE c_acctbal END AS c_acctbal
      FROM customer WHERE c_custkey % 13 <> 0
      UNION ALL
      SELECT c_custkey + 10000000, c_name, c_acctbal
      FROM customer WHERE c_custkey % 11 = 0),
    diff AS (
      SELECT coalesce(a.c_custkey, b.c_custkey) AS c_custkey,
             CASE WHEN a.c_custkey IS NULL THEN 'insert'
                  WHEN b.c_custkey IS NULL THEN 'delete'
                  WHEN a.c_acctbal <> b.c_acctbal OR a.c_name <> b.c_name
                    THEN 'update'
                  ELSE NULL END AS change_type
      FROM customer a FULL OUTER JOIN snap2 b USING (c_custkey))
    SELECT c_custkey, change_type FROM diff WHERE change_type IS NOT NULL
    """,
)
def snapshot_diff_cdc(spark, sf_dir):
    """Change-data feed between two table snapshots: full-outer join on
    the key, change classification by null-side and content compare —
    the generic 'what changed' primitive under incremental sync /
    backfill-verification jobs.  One shuffle on the key; the content
    compare is a codegen'd md5 over the concatenated tracked columns
    (16-byte compare instead of N column equality fans at wide
    schemas).  Snapshot 2 is derived deterministically (deletes: key %
    13, updates: % 7 acctbal bump, inserts: % 11 re-keyed +10M)."""
    (customer,) = _t(spark, sf_dir, "customer")
    snap1 = customer.select("c_custkey", "c_name", "c_acctbal")
    snap2 = (
        snap1.filter(F.col("c_custkey") % 13 != 0)
        .withColumn(
            "c_acctbal",
            F.when(
                F.col("c_custkey") % 7 == 0, F.round(F.col("c_acctbal") + 10, 2)
            ).otherwise(F.col("c_acctbal")),
        )
        .unionByName(
            snap1.filter(F.col("c_custkey") % 11 == 0).withColumn(
                "c_custkey", F.col("c_custkey") + 10_000_000
            )
        )
    )

    def fp(side):
        return F.md5(
            F.concat_ws("\x1f", F.col(f"{side}.c_name"), F.col(f"{side}.c_acctbal"))
        )

    diff = (
        snap1.alias("a")
        .join(snap2.alias("b"), "c_custkey", "full_outer")
        .withColumn(
            "change_type",
            F.when(F.col("a.c_name").isNull(), F.lit("insert"))
            .when(F.col("b.c_name").isNull(), F.lit("delete"))
            .when(fp("a") != fp("b"), F.lit("update")),
        )
        .filter(F.col("change_type").isNotNull())
    )
    return diff.select("c_custkey", "change_type")


# ---------------------------------------------------------------------------
# Robust outlier screen (median/MAD)
# ---------------------------------------------------------------------------


@query(
    "quality_outlier_mad",
    """
    WITH med AS (
      SELECT event_type, median(value) AS m FROM events GROUP BY 1),
    mad AS (
      SELECT e.event_type, median(abs(e.value - m.m)) AS mad
      FROM events e JOIN med m USING (event_type) GROUP BY 1)
    SELECT e.event_type,
           count(*) AS n,
           sum(CASE WHEN abs(e.value - med.m) > 3 * 1.4826 * mad.mad
                    THEN 1 ELSE 0 END) AS n_outliers
    FROM events e
    JOIN med USING (event_type) JOIN mad USING (event_type)
    GROUP BY 1
    """,
)
def quality_outlier_mad(spark, sf_dir):
    """Robust per-group outlier screen: |x - median| > 3 x 1.4826 x MAD
    (the distribution-free 3-sigma band — means/stddevs are exactly
    what heavy-tailed telemetry breaks).  Two narrow aggregations
    (median, then MAD over residuals) produce one tiny banding table
    that broadcast-joins back; the fact rows shuffle once per
    aggregation and never sort globally."""
    (events,) = _t(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("m")
    )
    mad = (
        events.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.expr("percentile(abs(value - m), 0.5)").alias("mad"))
    )
    flagged = events.join(F.broadcast(med), "event_type").join(
        F.broadcast(mad), "event_type"
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (
                F.abs(F.col("value") - F.col("m"))
                > 3 * 1.4826 * F.col("mad")
            ).cast("long")
        ).alias("n_outliers"),
    )


# ---------------------------------------------------------------------------
# Rolling distinct users via windowed sketch algebra
# ---------------------------------------------------------------------------


@query(
    "window_rolling_distinct_sketch",
    """
    WITH h AS (
      SELECT DISTINCT event_type, date_trunc('hour', ts) AS hr, user_id
      FROM events),
    hrs AS (SELECT DISTINCT event_type, hr FROM h)
    SELECT a.event_type,
           strftime(a.hr, '%Y-%m-%d %H:00:00') AS hour,
           count(DISTINCT b.user_id) AS rolling_users
    FROM hrs a
    JOIN h b ON b.event_type = a.event_type
            AND b.hr BETWEEN a.hr - INTERVAL 2 HOUR AND a.hr
    GROUP BY 1, 2
    """,
)
def window_rolling_distinct_sketch(spark, sf_dir):
    """Rolling 3-hour distinct users per event type WITHOUT
    re-scanning raw events per window: one hourly HLL sketch per
    (type, hour), then ``hll_union_agg`` OVER a RANGE window frame
    (epoch-hour +/- 2) — sketch algebra composed inside the window
    operator.  The raw events shuffle ONCE (to hourly grain); the
    window unions 16KB sketches, not user sets.  At lgK 21 the sparse
    representation is exact at battery cardinalities, so the oracle is
    the exact rolling COUNT DISTINCT."""
    (events,) = _t(spark, sf_dir, "events")
    hourly = (
        events.withColumn("hr", F.date_trunc("hour", "ts"))
        .groupBy("event_type", "hr")
        .agg(F.expr("hll_sketch_agg(user_id, 21)").alias("sk"))
        .withColumn("hr_idx", (F.unix_timestamp("hr") / 3600).cast("long"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr_idx")
        .rangeBetween(-2, 0)
    )
    rolled = F.expr("hll_union_agg(sk, true)").over(w)
    return hourly.select(
        "event_type",
        F.date_format("hr", "yyyy-MM-dd HH:00:00").alias("hour"),
        F.call_function("hll_sketch_estimate", rolled)
        .cast("long")
        .alias("rolling_users"),
    )


# ---------------------------------------------------------------------------
# Schema evolution on read
# ---------------------------------------------------------------------------


@query(
    "source_schema_evolution",
    """
    SELECT o_orderpriority,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS sum_price
    FROM (
      SELECT o_totalprice,
             CASE WHEN o_orderkey % 2 = 0 THEN NULL
                  ELSE o_orderpriority END AS o_orderpriority
      FROM orders)
    GROUP BY o_orderpriority
    """,
)
def source_schema_evolution(spark, sf_dir):
    """Parquet schema evolution on read: batch 1 written WITHOUT
    ``o_orderpriority``, batch 2 written with it, read back under
    ``mergeSchema`` — the producer-added-a-column lake reality.  Rows
    from the old-schema batch surface the new column as NULL; the
    aggregate proves both batches land in one scan.  (mergeSchema
    footer reconciliation is a one-time planning cost; data files are
    read in the same vectorized scan.)"""
    (orders,) = _t(spark, sf_dir, "orders")
    # per-pid FIXED path (no sequence number): reruns in one process
    # overwrite instead of accumulating orders-sized /tmp trees
    base = os.path.join(
        tempfile.gettempdir(), f"schema_evo_{os.getpid()}"
    )
    old_batch = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    new_batch = orders.filter(F.col("o_orderkey") % 2 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    old_batch.write.mode("overwrite").parquet(os.path.join(base, "b=1"))
    new_batch.write.mode("overwrite").parquet(os.path.join(base, "b=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(base, "b=1"), os.path.join(base, "b=2")
    )
    return merged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# Geo cell-bucketed radius join
# ---------------------------------------------------------------------------


@query(
    "geo_cell_radius_join",
    """
    WITH pts AS (
      SELECT DISTINCT user_id,
             ((user_id * 37) % 600) / 100.0 + 40 AS lat,
             ((user_id * 91) % 600) / 100.0 - 3 AS lon
      FROM events),
    pairs AS (
      SELECT a.user_id AS id_a, b.user_id AS id_b,
             2 * 6371.0 * asin(sqrt(
               pow(sin(radians(b.lat - a.lat) / 2), 2)
               + cos(radians(a.lat)) * cos(radians(b.lat))
                 * pow(sin(radians(b.lon - a.lon) / 2), 2))) AS dist_km
      FROM pts a JOIN pts b ON a.user_id < b.user_id)
    SELECT id_a, id_b, round(dist_km, 3) AS dist_km
    FROM pairs WHERE dist_km < 25
    """,
)
def geo_cell_radius_join(spark, sf_dir):
    """Spatial radius self-join (< 25 km) via GRID-CELL BUCKETING: each
    point lands in one 0.25-degree cell, one side explodes to its 3x3
    neighbor cells, candidates meet on the cell key, exact haversine
    verifies — the 2-D analogue of the banded range join.  Candidate
    volume is points x 9 x cell occupancy, never the n^2 cross join
    the oracle runs (``operators/geo.py::radius_join``).  Coordinates
    derive deterministically from user_id so both engines build the
    identical point set — a 6x6-degree patch at lat 40-46; the
    operator sizes lon cells by cos(max latitude), because a lon cell
    sized in raw degrees is ~19 km at 46N (< radius) and would break
    the 3x3 cover."""
    from .operators.geo import radius_join

    (events,) = _t(spark, sf_dir, "events")
    pts = events.select(
        "user_id",
        (((F.col("user_id") * 37) % 600) / 100.0 + 40).alias("lat"),
        (((F.col("user_id") * 91) % 600) / 100.0 - 3).alias("lon"),
    ).distinct()
    pairs = radius_join(
        pts, "user_id", "lat", "lon", radius_km=25.0, max_abs_lat=46.0
    )
    return pairs.select("id_a", "id_b", F.round("dist_km", 3).alias("dist_km"))


# ---------------------------------------------------------------------------
# Triangle counting (degree-ordered orientation) over a kNN graph
# ---------------------------------------------------------------------------


@query(
    "graph_triangle_count",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id < 300),
    scored AS (
      SELECT q.vec_id AS src, c.vec_id AS dst,
             round(list_cosine_similarity(q.v, c.v), 4) AS cos
      FROM v q JOIN v c ON c.vec_id <> q.vec_id),
    knn AS (
      SELECT src, dst FROM (
        SELECT *, row_number() OVER (PARTITION BY src
                                     ORDER BY cos DESC, dst) AS rnk
        FROM scored) t WHERE rnk <= 3),
    und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM knn)
    SELECT count(*) AS n_triangles
    FROM und e1
    JOIN und e2 ON e2.a = e1.b
    JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def graph_triangle_count(spark, sf_dir):
    """Triangle count over the cosine 3-NN graph of the embeddings
    table (the local-clustering signal used to audit near-dup cluster
    quality).  Scale design: undirected edges are DEGREE-ORDERED
    (lower-degree endpoint first, id tie-break) before the wedge join,
    so every triangle is counted exactly once and the wedge fan-out is
    bounded by the SMALLER endpoint's degree — the standard fix for
    power-law graphs where orienting by id alone lets one hub generate
    O(deg^2) wedges.  The closing-edge check is a semi-style inner join
    on the canonical (min,max) key."""
    from .operators.graph import triangle_count
    from .operators.similarity import brute_force_topk

    (embeddings,) = _t(spark, sf_dir, "embeddings")
    sub = embeddings.filter(F.col("vec_id") < 300)
    knn = brute_force_topk(sub, sub, "vec_id", "embedding", k=3).select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    return triangle_count(knn, "src", "dst")


# ---------------------------------------------------------------------------
# Chained stateful streaming operators (Spark 4 multi-agg pipelines)
# ---------------------------------------------------------------------------


@query(
    "stream_chained_windows",
    """
    WITH mx AS (SELECT max(ts) AS m FROM events)
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
           event_type, count(*) AS n
    FROM events, mx
    WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= m - INTERVAL 2 HOUR
    GROUP BY 1, 2
    """,
)
def stream_chained_windows(spark, sf_dir):
    """CHAINED stateful streaming aggregations in one query: 15-minute
    tumbling counts re-aggregated into hourly totals via
    ``window(window_time(...))`` — the multiple-stateful-operators
    pipeline (pre-aggregate fine, roll up coarse) that previously
    required two jobs with an intermediate sink.  Runs in append mode
    (chained aggs forbid complete), so only windows the final
    watermark (max ts - 2h delay) has CLOSED emit; the oracle applies
    the same cutoff to the batch hourly counts.  An hourly window's
    15-minute inputs all end no later than the hour itself, so every
    emitted hour is complete — counts match batch exactly."""
    from .streaming import read_events_stream, run_to_memory

    s = read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    quarter = s.groupBy(
        F.window("ts", "15 minutes").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    hourly = quarter.groupBy(
        F.window(F.window_time("w"), "1 hour").alias("hw"), "event_type"
    ).agg(F.sum("n").alias("n"))
    out = hourly.select(
        F.date_format("hw.start", "yyyy-MM-dd HH:00:00").alias("hour"),
        "event_type",
        "n",
    )
    return run_to_memory(
        out, _sink_name("chained_win"), output_mode="append", state_partitions=8
    )


# ---------------------------------------------------------------------------
# Approximate percentile with a verified rank-error bound
# ---------------------------------------------------------------------------


@query(
    "approx_percentile_bounds",
    """
    SELECT unnest(CAST([0.25, 0.5, 0.75] AS DOUBLE[])) AS q,
           true AS within_bound
    """,
)
def approx_percentile_bounds(spark, sf_dir):
    """``percentile_approx`` (KLL-style quantile summary, mergeable
    across partitions — the distributed-percentile workhorse) HELD TO
    ITS CONTRACT: for each quantile q the returned value's true rank
    interval [count(<v), count(<=v)] must intersect q*n +/- n/accuracy
    (+1 slack for interpolation).  The oracle pins the bound-check
    booleans, so a regression in the sketch path (not just a crash)
    fails the gate.  One aggregation computes all three quantiles and
    n; ranks come from one conditional re-aggregation against the
    3-row broadcast value table — two passes total, no sort."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    qs = [0.25, 0.5, 0.75]
    acc = 1000
    agg = lineitem.agg(
        F.percentile_approx(
            "l_quantity", F.array(*[F.lit(x) for x in qs]), F.lit(acc)
        ).alias("vs"),
        F.count(F.lit(1)).alias("n"),
    )
    vals = agg.select(F.posexplode("vs").alias("i", "v"), "n")
    ranks = (
        lineitem.crossJoin(F.broadcast(vals))
        .groupBy("i", "v", "n")
        .agg(
            F.sum((F.col("l_quantity") < F.col("v")).cast("long")).alias("r_lo"),
            F.sum((F.col("l_quantity") <= F.col("v")).cast("long")).alias("r_hi"),
        )
    )
    qarr = F.array(*[F.lit(x) for x in qs])
    target = F.element_at(qarr, F.col("i") + 1) * F.col("n")
    slack = F.col("n") / acc + 1
    return ranks.select(
        F.element_at(qarr, F.col("i") + 1).alias("q"),
        (
            (F.col("r_hi") >= target - slack) & (F.col("r_lo") <= target + slack)
        ).alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# Corpus health: Zipf rank-frequency fit
# ---------------------------------------------------------------------------


@query(
    "text_zipf_slope",
    """
    WITH w AS (
      SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
      FROM documents),
    freq AS (SELECT word, count(*) AS f FROM w GROUP BY word),
    ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, word) AS r FROM freq)
    SELECT round(regr_slope(log10(f), log10(r)), 4) AS zipf_slope,
           count(*) AS n_types,
           CAST(sum(f) AS BIGINT) AS n_tokens
    FROM ranked WHERE r <= 500
    """,
)
def text_zipf_slope(spark, sf_dir):
    """Zipf rank-frequency fit over the corpus vocabulary: regression
    slope of log10(frequency) on log10(rank) for the top-500 types —
    natural corpora sit near -1; a slope collapsing toward 0 flags
    synthetic/templated text and heavy boilerplate (a standard corpus
    health metric next to the repetition/quality screens).  One token
    explode + one word groupBy (the only token-width shuffle), then a
    500-row windowed head and a tiny regression aggregate."""
    from .functions.text import tokens

    (documents,) = _t(spark, sf_dir, "documents")
    freq = (
        documents.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    ranked = freq.select(
        "f",
        F.row_number()
        .over(Window.orderBy(F.col("f").desc(), F.col("word")))
        .alias("r"),
    ).filter(F.col("r") <= 500)
    return ranked.agg(
        F.round(
            F.regr_slope(F.log10("f"), F.log10("r")), 4
        ).alias("zipf_slope"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum("f").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Stream-stream LEFT OUTER interval join
# ---------------------------------------------------------------------------


@query(
    "stream_interval_left_outer",
    """
    WITH mx AS (SELECT max(ts) AS m FROM events),
    p AS (SELECT user_id, ts FROM events, mx
          WHERE event_type = 'purchase' AND ts <= m - INTERVAL 4 HOUR),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    j AS (
      SELECT p.user_id, c.ts AS l_ts
      FROM p LEFT JOIN c
        ON c.user_id = p.user_id
       AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts)
    SELECT user_id, count(*) AS n_no_click
    FROM j WHERE l_ts IS NULL GROUP BY user_id
    """,
)
def stream_interval_left_outer(spark, sf_dir):
    """Stream-stream LEFT OUTER interval join: purchases with NO click
    in the preceding hour — the negative-evidence query that inner
    joins cannot answer on streams.  An outer null-row may only emit
    once the watermark PROVES no matching click can still arrive, so
    rows near the end-of-replay horizon legitimately stay in state;
    both the entry and the oracle therefore restrict to purchases at
    least 4 hours (watermark delay 2h + join interval 1h + 1h margin)
    before the stream's max timestamp, where emission is guaranteed.
    Matched rows emit immediately and are discarded here."""
    from .streaming import interval_join, read_events_stream, run_to_memory

    stream = read_events_stream(spark, sf_dir)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    res = run_to_memory(
        interval_join(clicks, purchases, how="left_outer"),
        _sink_name("ss_louter"),
        output_mode="append",
        state_partitions=8,
    )
    # safe-horizon cutoff from the batch table (one tiny aggregate)
    (events,) = _t(spark, sf_dir, "events")
    cutoff = events.agg(
        (F.max("ts") - F.expr("INTERVAL 4 HOURS")).alias("cut")
    ).collect()[0]["cut"]
    return (
        res.filter(F.col("l_ts").isNull() & (F.col("r_ts") <= F.lit(cutoff)))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_no_click"))
    )


# ---------------------------------------------------------------------------
# Per-node clustering coefficient over the kNN graph
# ---------------------------------------------------------------------------


@query(
    "graph_clustering_coefficient",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id < 300),
    scored AS (
      SELECT q.vec_id AS src, c.vec_id AS dst,
             round(list_cosine_similarity(q.v, c.v), 4) AS cos
      FROM v q JOIN v c ON c.vec_id <> q.vec_id),
    knn AS (
      SELECT src, dst FROM (
        SELECT *, row_number() OVER (PARTITION BY src
                                     ORDER BY cos DESC, dst) AS rnk
        FROM scored) t WHERE rnk <= 3),
    und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM knn),
    deg AS (
      SELECT v, count(*) AS deg FROM (
        SELECT a AS v FROM und UNION ALL SELECT b FROM und) GROUP BY v),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
    corners AS (
      SELECT v, count(*) AS n_triangles FROM (
        SELECT x AS v FROM tri UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri) GROUP BY v)
    SELECT d.v, d.deg, coalesce(c.n_triangles, 0) AS n_triangles,
           round(2.0 * coalesce(c.n_triangles, 0)
                 / (d.deg * (d.deg - 1)), 4) AS coeff
    FROM deg d LEFT JOIN corners c USING (v) WHERE d.deg >= 2
    """,
)
def graph_clustering_coefficient(spark, sf_dir):
    """Per-node local clustering coefficient over the cosine 3-NN
    graph: triangles(v) / (deg(v) choose 2) — the cluster-cohesion
    audit for near-dup clusters (a dup cluster should be near-clique;
    a low-coefficient hub is chaining unrelated docs).  Same
    compact-forward machinery as graph_triangle_count; the DuckDB
    oracle orients by id (a<b) instead of degree, which yields the
    identical triangle SET."""
    from .operators.graph import local_clustering
    from .operators.similarity import brute_force_topk

    (embeddings,) = _t(spark, sf_dir, "embeddings")
    sub = embeddings.filter(F.col("vec_id") < 300)
    knn = brute_force_topk(sub, sub, "vec_id", "embedding", k=3).select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    return local_clustering(knn, "src", "dst")


# ---------------------------------------------------------------------------
# Sketch algebra composed with ROLLUP
# ---------------------------------------------------------------------------


@query(
    "rollup_distinct_sketch",
    """
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS users
    FROM events GROUP BY ROLLUP (event_type)
    """,
)
def rollup_distinct_sketch(spark, sf_dir):
    """Distinct users per event type AND the grand total in ONE pass:
    ``hll_sketch_agg`` under ROLLUP — the sketch's mergeability is what
    lets the partial aggregates serve every grouping level without
    re-scanning (exact COUNT DISTINCT under rollup must keep per-key
    user sets per level).  lgK 21 keeps the estimate exact at battery
    cardinalities, so the oracle is the exact rollup."""
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.rollup("event_type")
        .agg(F.expr("hll_sketch_agg(user_id, 21)").alias("sk"))
        .select(
            "event_type",
            F.expr("hll_sketch_estimate(sk)").cast("long").alias("users"),
        )
    )


# ---------------------------------------------------------------------------
# Weighted median (cumulative-weight window)
# ---------------------------------------------------------------------------


@query(
    "weighted_median_price",
    """
    WITH w AS (
      SELECT l_returnflag, l_extendedprice AS price, l_quantity AS wt,
             sum(l_quantity) OVER (PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING) AS cum,
             sum(l_quantity) OVER (PARTITION BY l_returnflag) AS total
      FROM lineitem)
    SELECT l_returnflag, round(min(price), 2) AS weighted_median
    FROM w WHERE cum * 2 >= total GROUP BY l_returnflag
    """,
)
def weighted_median_price(spark, sf_dir):
    """Quantity-weighted median price per return flag: the smallest
    price whose cumulative weight reaches half the total.  One sorted
    window per group (cumulative weight) + the all-rows total via an
    unbounded frame — no collect, no iterative search; ties broken by
    (price, orderkey, linenumber) so both engines walk the identical
    order."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    order_cols = [F.col("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")]
    cum_w = (
        Window.partitionBy("l_returnflag")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy("l_returnflag")
    w = lineitem.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.sum("l_quantity").over(cum_w).alias("cum"),
        F.sum("l_quantity").over(tot_w).alias("total"),
    )
    return (
        w.filter(F.col("cum") * 2 >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(F.round(F.min("price"), 2).alias("weighted_median"))
    )


# ---------------------------------------------------------------------------
# Null-aware NOT IN (the anti-join semantics corner)
# ---------------------------------------------------------------------------


_NAI_SQL = """
SELECT 'not_in' AS variant, (
    SELECT count(*) FROM {o}
    WHERE o_custkey NOT IN (
      SELECT CASE WHEN c_custkey % 50 = 0 THEN NULL ELSE c_custkey END
      FROM {c} WHERE c_mktsegment = 'BUILDING')
  ) AS n
UNION ALL
SELECT 'not_exists', (
    SELECT count(*) FROM {o} o
    WHERE NOT EXISTS (
      SELECT 1 FROM {c} c
      WHERE c.c_mktsegment = 'BUILDING'
        AND (CASE WHEN c.c_custkey % 50 = 0 THEN NULL
                  ELSE c.c_custkey END) = o.o_custkey)
  )
"""


@query(
    "nullaware_not_in_orders",
    _NAI_SQL.format(o="orders", c="customer"),
)
def nullaware_not_in_orders(spark, sf_dir):
    """NOT IN vs NOT EXISTS against a value list CONTAINING NULLs — the
    three-valued-logic corner: one NULL in the list makes every NOT IN
    membership test UNKNOWN (count 0), while NOT EXISTS over the same
    list ignores the NULLs and keeps its full count.  Catalyst plans
    the former as a NULL-AWARE anti join (BroadcastHashJoin with
    isNullAware=true); an engine that silently rewrites it to a plain
    anti join reports a non-zero not_in count and fails the hash
    compare.  Both counts come back in one result so the contrast
    itself is what's pinned."""
    (orders, customer) = _t(spark, sf_dir, "orders", "customer")
    orders.createOrReplaceTempView("nai_orders")
    customer.createOrReplaceTempView("nai_customer")
    return spark.sql(_NAI_SQL.format(o="nai_orders", c="nai_customer"))


# ---------------------------------------------------------------------------
# Dynamic partition overwrite (lake in-place backfill semantics)
# ---------------------------------------------------------------------------


@query(
    "source_dynamic_partition_overwrite",
    """
    SELECT o_orderpriority,
           count(*) AS n,
           round(sum(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_totalprice * 2 ELSE o_totalprice END), 2)
             AS sum_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def source_dynamic_partition_overwrite(spark, sf_dir):
    """``partitionOverwriteMode=dynamic``: overwriting a partitioned
    table replaces ONLY the partitions present in the incoming frame —
    the in-place backfill primitive (static mode would truncate the
    whole table).  Writes all priorities, then rewrites just 1-URGENT
    with doubled prices; every other partition must survive untouched,
    which the read-back aggregate proves."""
    (orders,) = _t(spark, sf_dir, "orders")
    base = os.path.join(tempfile.gettempdir(), f"dpo_{os.getpid()}")
    cols = ["o_orderkey", "o_totalprice", "o_orderpriority"]
    orders.select(*cols).write.mode("overwrite").partitionBy(
        "o_orderpriority"
    ).parquet(base)
    urgent_backfill = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(*cols)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    from .queries_runtime import _conf_window

    with _conf_window(
        spark, {"spark.sql.sources.partitionOverwriteMode": "dynamic"}
    ):
        urgent_backfill.write.mode("overwrite").partitionBy(
            "o_orderpriority"
        ).parquet(base)
    return (
        spark.read.parquet(base)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# Dynamic-gap session windows
# ---------------------------------------------------------------------------


@query(
    "session_window_dynamic_gap",
    """
    WITH g AS (
      SELECT user_id, ts,
             ts + CASE WHEN event_type = 'error' THEN INTERVAL 30 MINUTE
                       ELSE INTERVAL 60 MINUTE END AS reach
      FROM events),
    marked AS (
      SELECT user_id, ts, reach,
             CASE WHEN max(reach) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  > ts THEN 0 ELSE 1 END AS new_s
      FROM g),
    sess AS (
      SELECT user_id, ts, reach,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(reach), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def session_window_dynamic_gap(spark, sf_dir):
    """Session windows with a PER-EVENT gap expression
    (``F.session_window(ts, CASE ...)``): error events extend their
    session only 30 minutes, everything else an hour — the
    activity-dependent timeout real sessionization needs (a crash
    should close a session sooner than a page view).  Sessions merge
    while each event lands before the running max of previous events'
    reach (ts + gap); the oracle replays exactly that with a running-max
    gaps-and-islands window."""
    (events,) = _t(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "error", F.lit("30 minutes")).otherwise(
        F.lit("60 minutes")
    )
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Video temporal analysis: scene-cut detection on frame intensity
# ---------------------------------------------------------------------------


@query(
    "media_scene_cut_counts",
    """
    WITH f AS (
      SELECT doc_id,
             (16 + doc_id % 17) * 3 AS n,
             unnest(range(0, (8 + doc_id % 11)::BIGINT)) AS fi
      FROM documents),
    s AS (
      SELECT doc_id, fi, n, (doc_id + fi * n) % 256 AS s0 FROM f),
    m AS (
      SELECT doc_id, fi,
             (CASE WHEN s0 + n <= 256
               THEN n * s0 + n * (n - 1) / 2
               ELSE (256 - s0) * s0 + (256 - s0) * (255 - s0) / 2
                    + (n - 256 + s0) * (n - 257 + s0) / 2
               END)::DOUBLE / n AS mean_int
      FROM s),
    c AS (
      SELECT doc_id, mean_int,
             lag(mean_int) OVER (PARTITION BY doc_id ORDER BY fi) AS prev
      FROM m)
    SELECT doc_id,
           count(*) FILTER (WHERE prev IS NOT NULL
                            AND abs(mean_int - prev) > 8.0) AS n_cuts,
           count(*) AS n_frames
    FROM c GROUP BY doc_id
    """,
)
def media_scene_cut_counts(spark, sf_dir):
    """Scene-cut (shot-boundary) detection on frame-major media: decode
    every frame (Arrow mapInPandas), reduce each to its mean intensity,
    flag a cut where consecutive frames jump by > 8 intensity levels
    (lag window per doc) — the standard first-pass video segmenter,
    with the heavy decode parallel in Python workers and the temporal
    logic JVM-side.  SYNTH pixels are (seed + idx) % 256, so each
    frame's mean has a closed form (arithmetic series with one mod-256
    wrap) that the oracle computes exactly — decode, Arrow transport,
    frame explosion, windowing, and threshold all verified
    value-level."""
    from .multimodal import frame_mean_intensity
    from .queries_ext import _synth_media

    media = _synth_media(spark, sf_dir)
    frames = frame_mean_intensity(media, "media", "doc_id")
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    cuts = frames.withColumn("prev", F.lag("mean_intensity").over(w))
    return cuts.groupBy("doc_id").agg(
        F.sum(
            (
                F.col("prev").isNotNull()
                & (F.abs(F.col("mean_intensity") - F.col("prev")) > 8.0)
            ).cast("long")
        ).alias("n_cuts"),
        F.count(F.lit(1)).alias("n_frames"),
    )


# ---------------------------------------------------------------------------
# Polymorphic (analyze-schema) UDTF
# ---------------------------------------------------------------------------


@query(
    "udtf_polymorphic_split",
    """
    WITH parts AS (
      SELECT list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents)
    SELECT ws[3] AS p2, count(*) AS n
    FROM parts WHERE len(ws) >= 3 GROUP BY ws[3]
    """,
)
def udtf_polymorphic_split(spark, sf_dir):
    """UDTF whose OUTPUT SCHEMA is computed at plan time by
    ``analyze()`` from a constant argument (``split_parts_udtf(text,
    3)`` -> columns p0..p2): the Spark 4 polymorphic-table-function
    seam a fixed returnType cannot express.  The entry groups on the
    third word; the oracle replays the split in SQL.  Rows with fewer
    than 3 words surface p2 = NULL and are filtered symmetrically."""
    from .functions import udtfs

    udtfs.register(spark)
    (documents,) = _t(spark, sf_dir, "documents")
    documents.createOrReplaceTempView("docs_poly_v")
    return spark.sql(
        """
        SELECT s.p2, count(*) AS n
        FROM docs_poly_v, LATERAL split_parts_udtf(text, 3) s
        WHERE s.p2 IS NOT NULL
        GROUP BY s.p2
        """
    )


@query(
    "stream_session_dynamic_gap",
    """
    WITH g AS (
      SELECT user_id, ts,
             ts + CASE WHEN event_type = 'error' THEN INTERVAL 30 MINUTE
                       ELSE INTERVAL 60 MINUTE END AS reach
      FROM events),
    marked AS (
      SELECT user_id, ts,
             CASE WHEN max(reach) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  > ts THEN 0 ELSE 1 END AS new_s
      FROM g),
    sess AS (
      SELECT user_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked)
    SELECT user_id, CAST(count(DISTINCT sid) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM sess GROUP BY user_id
    """,
)
def stream_session_dynamic_gap(spark, sf_dir):
    """STREAMING sessionization with a per-event gap expression —
    activity-dependent timeouts in the streaming session operator
    (error events extend their session 30 minutes, others an hour).
    Complete-mode availableNow drain, so every session emits and the
    replay must equal the batch dynamic-gap fixpoint exactly (the
    running-max gaps-and-islands oracle shared with
    session_window_dynamic_gap)."""
    from .streaming import read_events_stream, run_to_memory

    stream = read_events_stream(spark, sf_dir)
    gap = F.when(F.col("event_type") == "error", F.lit("30 minutes")).otherwise(
        F.lit("60 minutes")
    )
    sessions = run_to_memory(
        stream.withWatermark("ts", "2 hours")
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events")),
        _sink_name("dyn_sessions"),
        output_mode="complete",
        state_partitions=8,
        nodata_batches=False,  # complete-mode drain (see run_to_memory)
    )
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Audience-overlap matrix from reusable sketches
# ---------------------------------------------------------------------------


@query(
    "audience_overlap_matrix",
    """
    WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
    t AS (SELECT DISTINCT event_type FROM events),
    o AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS overlap
      FROM u a JOIN u b ON a.user_id = b.user_id
      WHERE a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT ta.event_type AS type_a, tb.event_type AS type_b,
           coalesce(o.overlap, 0) AS overlap
    FROM t ta JOIN t tb ON ta.event_type < tb.event_type
    LEFT JOIN o ON o.type_a = ta.event_type AND o.type_b = tb.event_type
    """,
)
def audience_overlap_matrix(spark, sf_dir):
    """Pairwise audience overlap for every segment pair from sketches
    BUILT ONCE: one theta sketch per event type (single scan of
    events), then the 5x5 overlap matrix from sketch INTERSECTIONS of
    the tiny per-type sketch table — the query pattern the reference
    exists for, generalized to true set algebra (HLL can only
    approximate A∩B by inclusion-exclusion with compounding error;
    theta intersects directly on sketch bytes, exact while sketches
    stay exact-mode).  Raw events are scanned exactly once regardless
    of how many pairs are asked."""
    from .functions.sketches import theta_cardinality, theta_init_agg, theta_intersection_row

    (events,) = _t(spark, sf_dir, "events")
    sketches = events.groupBy("event_type").agg(
        theta_init_agg("user_id", 14).alias("sk")
    )
    a = sketches.select(
        F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a")
    )
    b = sketches.select(
        F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b")
    )
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    # a disjoint (or all-NULL-input) pair yields a NULL intersection
    # sketch — that's overlap 0, and the matrix keeps the zero cell
    return pairs.select(
        "type_a",
        "type_b",
        F.coalesce(
            theta_cardinality(
                theta_intersection_row("sk_a", "sk_b")
            ).cast("long"),
            F.lit(0),
        ).alias("overlap"),
    )


# ---------------------------------------------------------------------------
# Hourly latency percentile bands (ops observability workload)
# ---------------------------------------------------------------------------


@query(
    "window_hourly_percentiles",
    """
    SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events
    GROUP BY 1, 2
    """,
)
def window_hourly_percentiles(spark, sf_dir):
    """Hourly p50/p95/p99 value bands per event type — the canonical
    observability rollup.  One aggregation computes all three ranks
    (`percentile(value, array(...))`, a single sorted pass per group);
    at 100x the same shape swaps in the mergeable KLL sketch
    (`kll_quantiles_quantity`) so partials combine map-side — exact
    interpolated percentiles per (type, hour) here, matching DuckDB's
    quantile_cont."""
    (events,) = _t(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.5, 0.95, 0.99))")
    return (
        events.groupBy(
            "event_type",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias(
                "hour"
            ),
        )
        .agg(pct.alias("ps"))
        .select(
            "event_type",
            "hour",
            F.round(F.element_at("ps", 1), 4).alias("p50"),
            F.round(F.element_at("ps", 2), 4).alias("p95"),
            F.round(F.element_at("ps", 3), 4).alias("p99"),
        )
    )


# ---------------------------------------------------------------------------
# Bounded k-core peeling over the near-dup graph
# ---------------------------------------------------------------------------


@query(
    "graph_kcore_dup_families",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents),
    sh AS MATERIALIZED (
      SELECT DISTINCT doc_id,
             unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                     for i in range(1, len(ws) - 1)]) AS s
      FROM toks WHERE len(ws) >= 3),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    e0 AS MATERIALIZED (
      SELECT id_a AS a, id_b AS b FROM inter
      JOIN sizes na ON na.doc_id = id_a
      JOIN sizes nb ON nb.doc_id = id_b
      WHERE inter * 10 >= (na.n + nb.n - inter) * 5),
    d1 AS (SELECT v, count(*) AS deg FROM (
             SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0) GROUP BY v),
    k1 AS (SELECT v FROM d1 WHERE deg >= 2),
    e1 AS MATERIALIZED (SELECT e0.a, e0.b FROM e0
           JOIN k1 x ON x.v = e0.a JOIN k1 y ON y.v = e0.b),
    d2 AS (SELECT v, count(*) AS deg FROM (
             SELECT a AS v FROM e1 UNION ALL SELECT b FROM e1) GROUP BY v),
    k2 AS (SELECT v FROM d2 WHERE deg >= 2),
    e2 AS MATERIALIZED (SELECT e1.a, e1.b FROM e1
           JOIN k2 x ON x.v = e1.a JOIN k2 y ON y.v = e1.b),
    d3 AS (SELECT v, count(*) AS deg FROM (
             SELECT a AS v FROM e2 UNION ALL SELECT b FROM e2) GROUP BY v),
    k3 AS (SELECT v FROM d3 WHERE deg >= 2),
    e3 AS MATERIALIZED (SELECT e2.a, e2.b FROM e2
           JOIN k3 x ON x.v = e2.a JOIN k3 y ON y.v = e2.b),
    d4 AS (SELECT v, count(*) AS deg FROM (
             SELECT a AS v FROM e3 UNION ALL SELECT b FROM e3) GROUP BY v),
    k4 AS (SELECT v FROM d4 WHERE deg >= 2),
    e4 AS (SELECT e3.a, e3.b FROM e3
           JOIN k4 x ON x.v = e3.a JOIN k4 y ON y.v = e3.b)
    SELECT v, count(*) AS deg FROM (
      SELECT a AS v FROM e4 UNION ALL SELECT b FROM e4) t
    GROUP BY v HAVING count(*) >= 2
    """,
)
def graph_kcore_dup_families(spark, sf_dir):
    """Dense duplicate FAMILIES via bounded 2-core peeling of the
    trigram-Jaccard>=0.5 near-dup graph: repeatedly shed documents with
    fewer than 2 near-dup partners (4 peel rounds), leaving only the
    tightly-interlinked template/boilerplate families — chains and
    stragglers that connected components would lump in are peeled away.
    Fixed round count keeps the result reproducible and unrollable in
    SQL (``operators/graph.py::kcore_bounded``); each round is one
    degree aggregation + two semi joins with per-round lineage cuts."""
    from .operators.dedup import ngram_jaccard_pairs
    from .operators.graph import kcore_bounded

    (documents,) = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        documents, "doc_id", "text", threshold_num=5, threshold_den=10,
        max_shingle_df=None,  # oracle computes uncapped Jaccard: share semantics
    )
    return kcore_bounded(pairs, k=2, rounds=4, src="id_a", dst="id_b")


# ---------------------------------------------------------------------------
# Event-time-correct dimension enrichment on a stream (SCD2 semantics)
# ---------------------------------------------------------------------------


@query(
    "stream_scd2_enrichment",
    """
    WITH users AS (SELECT DISTINCT user_id FROM events),
    weeks AS (SELECT unnest(range(0, 5)) AS w),
    dim AS (
      SELECT user_id, w,
             TIMESTAMP '2024-01-01' + w * INTERVAL 7 DAY AS vf,
             TIMESTAMP '2024-01-01' + (w + 1) * INTERVAL 7 DAY AS vt,
             (user_id + w) % 3 AS tier
      FROM users, weeks)
    SELECT tier, count(*) AS n, round(sum(e.value), 2) AS sum_value
    FROM events e
    JOIN dim d ON d.user_id = e.user_id AND e.ts >= d.vf AND e.ts < d.vt
    GROUP BY tier
    """,
)
def stream_scd2_enrichment(spark, sf_dir):
    """EVENT-TIME-CORRECT dimension enrichment on a stream: each event
    joins the dimension VERSION that was valid at the event's
    timestamp (user tier changes weekly), not the latest row — the
    stream-side SCD2 lookup every lakehouse enrichment eventually
    needs.  A stream-static inner join with the validity-window range
    predicate stays STATELESS (no watermark state; the dim broadcasts),
    and the grouped rollup drains in complete mode.  The weekly-tier
    dimension derives deterministically from the user set so the
    oracle rebuilds it exactly."""
    from .streaming import read_events_stream, run_to_memory

    (events,) = _t(spark, sf_dir, "events")
    users = events.select("user_id").distinct()
    weeks = spark.range(5).select(F.col("id").alias("w"))
    base = F.to_timestamp(F.lit("2024-01-01"))
    dim = users.crossJoin(weeks).select(
        "user_id",
        (base + F.make_interval(days=F.col("w") * 7)).alias("vf"),
        (base + F.make_interval(days=(F.col("w") + 1) * 7)).alias("vt"),
        ((F.col("user_id") + F.col("w")) % 3).alias("tier"),
    )
    stream = read_events_stream(spark, sf_dir)
    enriched = stream.join(
        F.broadcast(dim),
        (stream.user_id == dim.user_id)
        & (stream.ts >= dim.vf)
        & (stream.ts < dim.vt),
        "inner",
    )
    rollup = enriched.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    return run_to_memory(
        rollup,
        _sink_name("scd2_enrich"),
        output_mode="complete",
        state_partitions=8,
        nodata_batches=False,  # complete-mode drain (see run_to_memory)
    )


# ---------------------------------------------------------------------------
# Incremental IVF index maintenance (append without retrain)
# ---------------------------------------------------------------------------


#: Exact top-10-over-the-FULL-corpus oracle shared by every entry whose
#: contract is "probing all lists reduces to brute force" (the batch
#: append entry here and the streaming append in queries_r6).
ANN_FULL_CORPUS_TOPK_ORACLE = """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.v, c.v), 4) AS cos
      FROM v q JOIN v c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 5)
    SELECT query_id, neighbor_id, rnk AS rank, cos FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rnk
      FROM scored) t WHERE rnk <= 10
    """


@query("ann_ivf_index_append", ANN_FULL_CORPUS_TOPK_ORACLE)
def ann_ivf_index_append(spark, sf_dir):
    """INCREMENTAL vector-index maintenance: build the IVF index on the
    standing corpus (vec_id < 250), then APPEND the new batch by
    assigning it to the EXISTING centroids — no retrain, no rewrite of
    the standing list partitions (append touches only the files the
    batch lands in).  Probing all lists after the append must reduce
    exactly to brute force over the FULL corpus, which proves the
    appended rows landed in queryable partitions with correct
    assignments."""
    from .operators.similarity import (
        append_ivf_index,
        ivf_topk_indexed,
    )

    (embeddings,) = _t(spark, sf_dir, "embeddings")
    standing = embeddings.filter(F.col("vec_id") < 250)
    new_batch = embeddings.filter(F.col("vec_id") >= 250)
    queries_df = embeddings.filter(F.col("vec_id") < 5)
    path = os.path.join(tempfile.gettempdir(), f"ivf_append_{os.getpid()}")
    from .queries import _ivf_standing_index

    _ivf_standing_index(spark, sf_dir, 250, dest=path)
    append_ivf_index(new_batch, "vec_id", "embedding", path)
    return ivf_topk_indexed(
        spark, path, queries_df, "vec_id", "embedding", k=10, nprobe=16
    )


# ---------------------------------------------------------------------------
# Declarative SQL TABLE functions (CREATE FUNCTION ... RETURNS TABLE)
# ---------------------------------------------------------------------------


@query(
    "sql_table_function_topn",
    """
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS r
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW'))
    SELECT o_orderpriority AS priority, o_orderkey,
           round(o_totalprice, 2) AS o_totalprice
    FROM ranked WHERE r <= 5
    """,
)
def sql_table_function_topn(spark, sf_dir):
    """Declarative SQL TABLE function (``CREATE FUNCTION ... RETURNS
    TABLE``): a parameterized top-5-orders-for-priority relation
    defined IN SQL and invoked in the FROM clause — the SQL-native
    table abstraction (next to the Python UDTF seam) that lets SQL
    users package a reusable parameterized query without any host
    language.  Catalyst inlines the body per invocation, so both calls
    plan as ordinary window-limit subtrees over the same scan."""
    (orders,) = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("sqltf_orders_v")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION topn_by_priority(prio STRING)
        RETURNS TABLE (priority STRING, o_orderkey BIGINT, o_totalprice DOUBLE)
        RETURN SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2)
               FROM sqltf_orders_v WHERE o_orderpriority = prio
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 5
        """
    )
    return spark.sql(
        """
        SELECT * FROM topn_by_priority('1-URGENT')
        UNION ALL
        SELECT * FROM topn_by_priority('5-LOW')
        """
    )


# ---------------------------------------------------------------------------
# Market-basket co-purchase lift (association mining)
# ---------------------------------------------------------------------------


@query(
    "basket_copurchase_lift",
    """
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM b),
    item AS (SELECT l_partkey, count(*) AS cnt FROM b GROUP BY l_partkey),
    pair AS (
      SELECT a.l_partkey AS part_a, c.l_partkey AS part_b, count(*) AS cnt
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2)
    SELECT part_a, part_b, pair.cnt AS n_both,
           round(pair.cnt * 1.0 * n.n_orders / (ia.cnt * ib.cnt), 4) AS lift
    FROM pair
    JOIN item ia ON ia.l_partkey = part_a
    JOIN item ib ON ib.l_partkey = part_b
    CROSS JOIN n
    WHERE pair.cnt >= 3
    """,
)
def basket_copurchase_lift(spark, sf_dir):
    """Association mining over order baskets: co-purchase LIFT
    P(A,B)/(P(A)P(B)) for every part pair appearing together in >= 3
    orders.  The pair join is keyed on the ORDER (baskets average a
    handful of lines, so per-order fan-out is tiny and bounded — the
    shape that scales, unlike item-pair cross joins); item supports
    re-aggregate from the same distinct basket table, and the order
    count joins in as a broadcast scalar."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    # b feeds the self-join (twice), the item supports, and the order
    # count: checkpoint the distinct basket table once — LAZY, so the
    # n_orders count right below is the job that materializes it
    b = (
        lineitem.select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_orders = b.select("l_orderkey").distinct().count()
    item = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    pair = (
        b.alias("a")
        .join(
            b.alias("c"),
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("c.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("c.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 3)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("cnt").alias("__ca"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("cnt").alias("__cb"))
    return (
        pair.join(ia, "part_a")
        .join(ib, "part_b")
        .select(
            "part_a",
            "part_b",
            "n_both",
            F.round(
                F.col("n_both") * float(n_orders) / (F.col("__ca") * F.col("__cb")),
                4,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation
# ---------------------------------------------------------------------------


@query(
    "customer_rfm_segments",
    """
    WITH mx AS (SELECT max(o_orderdate) AS m FROM orders),
    rfm AS (
      SELECT o_custkey,
             date_diff('day', max(o_orderdate), (SELECT m FROM mx)) AS recency_days,
             count(*) AS frequency,
             round(sum(o_totalprice), 2) AS monetary
      FROM orders GROUP BY o_custkey),
    scored AS (
      SELECT *,
             ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS r_score,
             ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
             ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_score
      FROM rfm)
    SELECT r_score, f_score, m_score,
           count(*) AS n_customers,
           round(sum(monetary), 2) AS segment_value
    FROM scored GROUP BY 1, 2, 3
    """,
)
def customer_rfm_segments(spark, sf_dir):
    """RFM (recency / frequency / monetary) quintile segmentation —
    the classic customer-value grid: per-customer aggregates in one
    pass, then three ntile windows over the small per-customer table
    (never over raw orders), rolled up to the 5x5x5 segment counts.
    Ties are broken by customer key so both engines cut identical
    quintiles."""
    (orders,) = _t(spark, sf_dir, "orders")
    max_date = orders.agg(F.max("o_orderdate")).collect()[0][0]
    rfm = orders.groupBy("o_custkey").agg(
        F.datediff(F.lit(max_date), F.max("o_orderdate")).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    scored = rfm.select(
        "*",
        F.ntile(5)
        .over(Window.orderBy(F.col("recency_days").desc(), F.col("o_custkey")))
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("frequency"), F.col("o_custkey")))
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("monetary"), F.col("o_custkey")))
        .alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("monetary"), 2).alias("segment_value"),
    )


# ---------------------------------------------------------------------------
# ABC / Pareto classification
# ---------------------------------------------------------------------------


@query(
    "pareto_abc_parts",
    """
    WITH rev AS (
      SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS revenue
      FROM lineitem GROUP BY l_partkey),
    ranked AS (
      SELECT l_partkey, revenue,
             sum(revenue) OVER (ORDER BY revenue DESC, l_partkey
               ROWS UNBOUNDED PRECEDING) AS cum,
             sum(revenue) OVER () AS total
      FROM rev)
    SELECT CASE WHEN cum <= total * 0.8 THEN 'A'
                WHEN cum <= total * 0.95 THEN 'B'
                ELSE 'C' END AS abc_class,
           count(*) AS n_parts,
           round(sum(revenue), 2) AS class_revenue
    FROM ranked GROUP BY 1
    """,
)
def pareto_abc_parts(spark, sf_dir):
    """ABC (Pareto) classification of parts by revenue: A = the parts
    covering the first 80% of cumulative revenue, B to 95%, C the
    tail — the inventory-prioritization classic.  One aggregation to
    part grain, then a single ordered cumulative window over the
    (much smaller) per-part table; class boundaries compare the
    running sum against the broadcast grand total."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    rev = lineitem.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    w_cum = (
        Window.orderBy(F.col("revenue").desc(), F.col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = rev.select(
        "revenue",
        F.sum("revenue").over(w_cum).alias("cum"),
        F.sum("revenue").over(Window.partitionBy()).alias("total"),
    )
    abc = F.when(F.col("cum") <= F.col("total") * 0.8, F.lit("A")).when(
        F.col("cum") <= F.col("total") * 0.95, F.lit("B")
    ).otherwise(F.lit("C"))
    return ranked.groupBy(abc.alias("abc_class")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum("revenue"), 2).alias("class_revenue"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------


@query(
    "audit_benford_order_totals",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1),
    obs AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
    tot AS (SELECT sum(n) AS total FROM obs)
    SELECT digit, n,
           round(n * 1.0 / total, 4) AS observed_p,
           round(log10(1.0 + 1.0 / digit), 4) AS benford_p
    FROM obs CROSS JOIN tot
    """,
)
def audit_benford_order_totals(spark, sf_dir):
    """Benford first-digit audit of order totals: observed first-digit
    distribution next to the Benford expectation log10(1 + 1/d) — the
    standard fraud/synthetic-data screen for financial columns.  The
    first digit comes from integer-truncated string math (identical in
    both engines, no float formatting); one narrow aggregation plus a
    1-row total join."""
    (orders,) = _t(spark, sf_dir, "orders")
    # floor() explicitly: Spark's double->bigint cast truncates but
    # DuckDB's ROUNDS — floor pins identical integerization in both
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    obs = (
        orders.filter(F.col("o_totalprice") >= 1)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = obs.agg(F.sum("n").alias("total"))
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        F.round(F.col("n") / F.col("total"), 4).alias("observed_p"),
        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 4).alias("benford_p"),
    )


# ---------------------------------------------------------------------------
# Session journey paths
# ---------------------------------------------------------------------------


@query(
    "session_top_paths",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged),
    paths AS (
      SELECT user_id, sid,
             array_to_string(
               (list(event_type ORDER BY ts, event_id))[1:3], '>') AS path
      FROM sess GROUP BY user_id, sid)
    SELECT path, count(*) AS n_sessions
    FROM paths GROUP BY path
    HAVING count(*) >= 10
    """,
)
def session_top_paths(spark, sf_dir):
    """Session JOURNEY analysis: the first three event types of every
    30-minute-gap session concatenated into a path signature, rolled
    up to path frequencies — the entry-flow report behind funnel
    design.  Events never leave their (user, session) grouping: one
    windowed island pass, then the path string comes from a sorted
    per-session struct collect (ts + event_id tie-break, so both
    engines walk identical orders)."""
    (events,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
                > 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sess = flagged.withColumn(
        "sid",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = (
        sess.groupBy("user_id", "sid")
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("ts", "event_id", "event_type")
                            )
                        ),
                        lambda s: s["event_type"],
                    ),
                    1,
                    3,
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .filter(F.col("n_sessions") >= 10)
    )


# ---------------------------------------------------------------------------
# Corpus novelty curve
# ---------------------------------------------------------------------------


@query(
    "text_novelty_curve",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                     for i in range(1, len(ws) - 1)]) AS s
      FROM toks WHERE len(ws) >= 3),
    first_seen AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s),
    nov AS (
      SELECT sh.doc_id,
             count(*) AS n_shingles,
             sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS n_novel
      FROM sh JOIN first_seen f ON f.s = sh.s
      GROUP BY sh.doc_id)
    SELECT CAST(doc_id // 50 AS BIGINT) AS doc_bucket,
           CAST(sum(n_novel) AS BIGINT) AS novel_shingles,
           CAST(sum(n_shingles) AS BIGINT) AS total_shingles,
           round(sum(n_novel) * 1.0 / sum(n_shingles), 4) AS novelty_rate
    FROM nov GROUP BY 1
    """,
)
def text_novelty_curve(spark, sf_dir):
    """Corpus NOVELTY curve: per ingest bucket (doc_id order proxies
    arrival order), the fraction of each document's trigrams appearing
    for the FIRST time — the saturation signal dataset curators watch
    to decide when a source is mined out (novelty decays as the corpus
    saturates; a flat-high curve means fresh content, a collapse means
    boilerplate).  First occurrence is one min-aggregate over the
    shingle index; the novelty flag is a join back on the shingle key
    — no per-document history scan."""
    from .functions.text import exploded_shingles

    (documents,) = _t(spark, sf_dir, "documents")
    sh = exploded_shingles(
        documents.select(F.col("doc_id").alias("__id"), F.col("text").alias("__t")),
        "__id",
        "__t",
        3,
    ).dropDuplicates(["__id", "__s"])
    first_seen = sh.groupBy("__s").agg(F.min("__id").alias("__first"))
    nov = (
        sh.join(first_seen, "__s")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("__first") == F.col("__id")).cast("long")).alias(
                "n_novel"
            ),
        )
    )
    return (
        nov.groupBy(F.floor(F.col("__id") / 50).cast("bigint").alias("doc_bucket"))
        .agg(
            F.sum("n_novel").alias("novel_shingles"),
            F.sum("n_shingles").alias("total_shingles"),
            F.round(
                F.sum("n_novel") / F.sum("n_shingles"), 4
            ).alias("novelty_rate"),
        )
    )


# ---------------------------------------------------------------------------
# DAU / WAU stickiness
# ---------------------------------------------------------------------------


@query(
    "metric_dau_wau_stickiness",
    """
    WITH d AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      FROM events),
    days AS (SELECT DISTINCT day FROM d),
    dau AS (SELECT day, count(*) AS dau FROM d GROUP BY day),
    wau AS (
      SELECT a.day, count(DISTINCT b.user_id) AS wau
      FROM days a JOIN d b
        ON b.day BETWEEN a.day - INTERVAL 6 DAY AND a.day
      GROUP BY a.day)
    SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, wau.wau,
           round(dau.dau * 1.0 / wau.wau, 4) AS stickiness
    FROM dau JOIN wau ON wau.day = dau.day
    """,
)
def metric_dau_wau_stickiness(spark, sf_dir):
    """DAU/WAU stickiness per day — the engagement ratio every growth
    dashboard tracks.  Daily HLL sketches built once, the trailing
    7-day WAU from a RANGE window union over epoch-days (sketches
    merge; user sets never re-shuffle), estimates exact at lgK 21 for
    battery cardinalities — the same mergeable-sketch shape that keeps
    this metric one narrow pass at 100 TB."""
    (events,) = _t(spark, sf_dir, "events")
    daily = (
        events.withColumn("day", F.date_trunc("day", "ts"))
        .groupBy("day")
        .agg(F.expr("hll_sketch_agg(user_id, 21)").alias("sk"))
        .withColumn(
            "day_idx", (F.unix_timestamp("day") / 86400).cast("long")
        )
    )
    w = Window.orderBy("day_idx").rangeBetween(-6, 0)
    rolled = F.expr("hll_union_agg(sk, true)").over(w)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.expr("hll_sketch_estimate(sk)").cast("long").alias("dau"),
        F.call_function("hll_sketch_estimate", rolled)
        .cast("long")
        .alias("wau"),
    ).withColumn(
        "stickiness", F.round(F.col("dau") / F.col("wau"), 4)
    )


# ---------------------------------------------------------------------------
# Supplier delivery performance
# ---------------------------------------------------------------------------


@query(
    "supplier_delivery_performance",
    """
    WITH perf AS (
      SELECT l_suppkey,
             count(*) AS n_lines,
             sum(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90
                      THEN 1 ELSE 0 END) AS n_late,
             round(avg(date_diff('day', o_orderdate, l_shipdate)), 4)
               AS avg_ship_days
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY l_suppkey)
    SELECT l_suppkey, n_lines, n_late,
           round(n_late * 1.0 / n_lines, 4) AS late_rate, avg_ship_days
    FROM perf
    WHERE n_lines >= 20
    ORDER BY late_rate DESC, l_suppkey LIMIT 25
    """,
)
def supplier_delivery_performance(spark, sf_dir):
    """Worst-25 suppliers by slow-shipment rate (line shipped more
    than 90 days after the order date), with the average order-to-ship
    lag — the vendor-scorecard rollup.  One fact-side join on the
    order key (orders is the small side), conditional counters at
    supplier grain, then an ordered limit over the small supplier
    table; the n_lines floor keeps the ranking statistically
    meaningful and the tie-break deterministic."""
    (lineitem, orders) = _t(spark, sf_dir, "lineitem", "orders")
    joined = lineitem.join(
        orders.select("o_orderkey", "o_orderdate"),
        lineitem.l_orderkey == orders.o_orderkey,
    ).withColumn("ship_days", F.datediff("l_shipdate", "o_orderdate"))
    perf = joined.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum((F.col("ship_days") > 90).cast("long")).alias("n_late"),
        F.round(F.avg("ship_days"), 4).alias("avg_ship_days"),
    )
    return (
        perf.filter(F.col("n_lines") >= 20)
        .withColumn(
            "late_rate", F.round(F.col("n_late") / F.col("n_lines"), 4)
        )
        .select(
            "l_suppkey", "n_lines", "n_late", "late_rate", "avg_ship_days"
        )
        .orderBy(F.col("late_rate").desc(), "l_suppkey")
        .limit(25)
    )

from . import queries_r4  # noqa: E402,F401  (registration side effect)
