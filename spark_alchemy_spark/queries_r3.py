"""Battery extension (round 3): incremental-ingest dedup, contamination
scoring, CDC snapshot diffs, robust outlier screening, sketch-windowed
rolling distincts, schema evolution on read, geo radius joins, and
triangle counting.

* **Incremental cross-corpus dedup** — the shape every standing-corpus
  deployment actually runs: dedup TODAY'S batch against the corpus
  without re-pairing the corpus with itself (``operators/dedup.py::
  cross_corpus_jaccard_pairs`` / ``incremental_dedup``).  Candidate
  volume stays proportional to the batch's postings, corpus-side viral
  shingles are DF-capped with exact probe-back correction.
* **Containment contamination scoring** — asymmetric overlap
  |A∩B|/|A| of document shingles against an eval/benchmark set (the
  train-test-leakage metric; Jaccard under-scores when the benchmark
  doc is much shorter than the training doc).  Integer threshold
  arithmetic, inverted-index join — never pairwise text comparison.
* **CDC snapshot diff** — full-outer key join + 128-bit content-hash
  compare between two table snapshots -> (key, change_type) feed.
  The generic "what changed" primitive under every incremental sync.
* **Robust outlier screen** — median/MAD banding per group (3-sigma
  equivalent x 1.4826), exact medians; two narrow aggregations +
  broadcast joins, the fact rows shuffle once.
* **Rolling distinct users via windowed sketch algebra** — hourly HLL
  sketches UNIONED OVER A WINDOW FRAME (RANGE 2 preceding epoch-hours):
  sketch-algebra composability demonstrated inside the window operator;
  at lgK 21 the estimates are exact at battery cardinalities, so the
  oracle is the exact rolling COUNT DISTINCT.
* **Schema evolution on read** — parquet mergeSchema over batches
  written with different column sets (the lake reality: producers add
  columns over time); missing columns surface as NULL.
* **Geo cell-bucketed radius join** — haversine neighbor pairs via
  grid-cell bucketing (3x3 neighbor-cell candidates, exact distance
  verify): the 2-D analogue of the banded range join; never a cross
  join.
* **Triangle counting** — degree-ordered edge orientation (each
  triangle counted once, high-degree fan-out cut) over a kNN graph
  built from the embeddings table.

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
    return incremental_dedup(batch, corpus, "doc_id", "text").select(
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
    base = os.path.join(
        tempfile.gettempdir(), _sink_name("schema_evo")
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

_EARTH_KM = 6371.0


def _haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance in km, double math — expression shared by
    the Spark entry; the oracle spells the identical formula so both
    engines evaluate the same arithmetic."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return 2 * _EARTH_KM * F.asin(F.sqrt(a))


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
    the oracle runs.  (Coordinates derive deterministically from
    user_id so both engines build the identical point set, a 6x6-degree
    patch at lat 40-46.  Cell sizing is per-axis: 0.25 deg latitude ~
    27.8 km >= the radius everywhere, but longitude degrees SHRINK with
    cos(lat) — at 46N a 0.25-deg lon cell is ~19 km < radius, which
    would break the 3x3 cover — so lon cells are 0.35 deg (~27 km at
    46N).  A general-latitude deployment banks lon cell width per
    latitude band the same way.)"""
    (events,) = _t(spark, sf_dir, "events")
    pts = events.select(
        "user_id",
        (((F.col("user_id") * 37) % 600) / 100.0 + 40).alias("lat"),
        (((F.col("user_id") * 91) % 600) / 100.0 - 3).alias("lon"),
    ).distinct()
    cell_lat, cell_lon = 0.25, 0.35
    with_cell = pts.withColumn(
        "cx", F.floor(F.col("lon") / cell_lon).cast("long")
    ).withColumn("cy", F.floor(F.col("lat") / cell_lat).cast("long"))
    offsets = spark.range(9).select(
        (F.col("id") % 3 - 1).alias("dx"), (F.col("id") / 3).cast("long").alias("dy")
    ).withColumn("dy", F.col("dy") - 1)
    probe = with_cell.crossJoin(F.broadcast(offsets)).select(
        F.col("user_id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        (F.col("cx") + F.col("dx")).alias("cx"),
        (F.col("cy") + F.col("dy")).alias("cy"),
    )
    cand = probe.join(
        with_cell.select(
            F.col("user_id").alias("id_b"),
            F.col("lat").alias("lat_b"),
            F.col("lon").alias("lon_b"),
            "cx",
            "cy",
        ),
        ["cx", "cy"],
    ).filter(F.col("id_a") < F.col("id_b"))
    dist = _haversine_km(
        F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
    )
    return (
        cand.withColumn("dist_km", dist)
        .filter(F.col("dist_km") < 25)
        .select("id_a", "id_b", F.round("dist_km", 3).alias("dist_km"))
    )


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
             list_cosine_similarity(q.v, c.v) AS cos
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
    from .operators.similarity import brute_force_topk

    (embeddings,) = _t(spark, sf_dir, "embeddings")
    sub = embeddings.filter(F.col("vec_id") < 300)
    knn = brute_force_topk(sub, sub, "vec_id", "embedding", k=3).select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    und = knn.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient u -> w iff (deg(u), u) < (deg(w), w): total order, each
    # undirected edge gets exactly one direction
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    oriented = (
        und.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("w")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("w")))
            .alias("e")
        )
        .select("e.u", "e.w")
    )
    wedges = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), F.col("e1.w") == F.col("e2.u"))
        .select(
            F.col("e1.u").alias("x"),
            F.col("e1.w").alias("y"),
            F.col("e2.w").alias("z"),
        )
    )
    # the orientation is a TOTAL order, so for a wedge x->y->z the
    # closing edge (if present) is always oriented x->z — one join
    # direction suffices and no triangle can match twice
    closing = wedges.join(
        oriented.select(F.col("u").alias("x"), F.col("w").alias("z")),
        ["x", "z"],
    )
    return closing.agg(F.count(F.lit(1)).alias("n_triangles"))
