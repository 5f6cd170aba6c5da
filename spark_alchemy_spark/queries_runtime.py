"""Battery extension: Catalyst RUNTIME filtering (the two scan-reduction
mechanisms a 100 TB deployment gets from the optimizer, demonstrated
end-to-end and plan-asserted) plus a statistical-LM quality scorer for
the curation tier.

* **Runtime bloom-filter join reduction** — Catalyst's
  ``InjectRuntimeFilter`` rule builds a bloom filter over the join keys
  of the SELECTIVE side and pushes ``might_contain`` into the big
  side's scan, turning a full-fact-table shuffle join into a
  pre-filtered one.  This is the optimizer-native version of the
  "semi-join reducer" pattern — no hand-built filter, no extra
  pipeline stage (the reference relies on stock Spark for all join
  execution; SURVEY.md §2.2).
* **Dynamic partition pruning** — with a hive-partitioned fact table,
  a selective dim-side predicate prunes fact PARTITION DIRECTORIES at
  runtime via a reused broadcast subquery: the dominant scan-reduction
  mechanism for star-schema joins over partitioned lakes.
* **Unigram-LM quality scoring** — corpus-trained unigram language
  model scoring each document by average negative log-likelihood (the
  CCNet-style statistical quality filter): doc-term counts first (one
  (doc, term) shuffle, tokens never re-shuffled), vocabulary counts
  re-aggregated FROM the doc-term table, totals joined back as a
  1-row broadcast — never a driver-side scalar.

Also registered here: native batch session windows and sliding windows
(plus the streaming sliding twin), mixed-precision HLL union, the
native XML file format, the hidden ``_metadata`` provenance columns,
and the PQ / IVF+PQ compressed-domain ANN entries.

Same determinism conventions as queries.py.
"""

from __future__ import annotations

import contextlib
import os
import tempfile

from pyspark.sql import functions as F

from .localframe import local_frame

from .queries import _t, query
from .queries_ext import _sink_name


@contextlib.contextmanager
def _conf_window(spark, confs: dict):
    """Set session confs for a plan-shaping window and restore every
    one (including previously-unset keys) on exit — shared by the
    entries whose Catalyst behavior is conf-gated and by their
    restore-guard tests."""
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

# Confs that make Catalyst's runtime bloom filter observable at battery
# scale: the rule is on by default but gated on a 10 GB application-side
# scan, so drop that floor and forbid broadcast (a broadcast join needs
# no bloom — the point here is the shuffle-join reduction path).
_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def bloom_reduced_join(spark, sf_dir):
    """The lazy plan: lineitem ⋈ (selective orders slice), aggregated.

    Under ``_BLOOM_CONFS`` Catalyst injects
    ``might_contain(bloom_filter_agg(xxhash64(o_orderkey)),
    xxhash64(l_orderkey))`` below the lineitem scan — asserted in
    tests/test_plans.py.  Callers own the conf window (the rule runs at
    optimization time, so the confs must still be set when the plan
    first executes)."""
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    joined = lineitem.join(
        urgent, lineitem.l_orderkey == urgent.o_orderkey
    )
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


@query(
    "runtime_bloom_join_reduction",
    """
    SELECT l_returnflag, count(*) AS n_lines,
           round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
)
def runtime_bloom_join_reduction(spark, sf_dir):
    """Scan reduction by optimizer-injected runtime bloom filter (see
    :func:`bloom_reduced_join`).  The plan-shaping confs must hold at
    execution, so the (3-row) result is materialized inside the conf
    window and the session's join/bloom settings restored before
    returning — no conf leaks into later battery entries."""
    with _conf_window(spark, _BLOOM_CONFS):
        out = bloom_reduced_join(spark, sf_dir)
        path = os.path.join(tempfile.gettempdir(), _sink_name("bloomjoin"))
        out.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


@query(
    "dpp_partitioned_star_join",
    """
    SELECT event_type, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM events
    JOIN (VALUES ('purchase', 'conversion'), ('signup', 'conversion'),
                 ('click', 'engagement'), ('view', 'engagement'),
                 ('error', 'ops')) AS d(event_type, tier)
      USING (event_type)
    WHERE tier = 'conversion'
    GROUP BY event_type
    """,
)
def dpp_partitioned_star_join(spark, sf_dir):
    """Dynamic partition pruning over a hive-partitioned fact table:
    events partitioned by event_type, joined to a tiny tier dimension
    filtered on a NON-partition attribute.  Catalyst turns the dim
    filter into a runtime pruning subquery on the fact scan (reusing
    the join's broadcast), so only the matching partition directories
    are ever opened — the star-schema scan reducer at lake scale.
    Plan asserted in tests/test_plans.py (``dynamicpruning`` present)."""
    from .sources.io import write_partitioned

    (events,) = _t(spark, sf_dir, "events")
    path = os.path.join(tempfile.gettempdir(), _sink_name("events_dpp"))
    write_partitioned(events, path, ["event_type"])
    fact = spark.read.parquet(path)
    tiers = local_frame(spark, 
        [
            ("purchase", "conversion"),
            ("signup", "conversion"),
            ("click", "engagement"),
            ("view", "engagement"),
            ("error", "ops"),
        ],
        "event_type string, tier string",
    )
    return (
        fact.join(tiers, "event_type")
        .filter(F.col("tier") == "conversion")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "quality_unigram_logprob",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents),
    dw AS (SELECT doc_id, w, count(*) AS k FROM tok GROUP BY doc_id, w),
    v AS (SELECT w, sum(k) AS c FROM dw GROUP BY w),
    t AS (SELECT sum(c) AS n FROM v)
    SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_tokens,
           round(-sum(k * ln(c / n)) / sum(k), 4) AS nll
    FROM dw JOIN v USING (w) CROSS JOIN t
    GROUP BY doc_id
    """,
)
def quality_unigram_logprob(spark, sf_dir):
    """Corpus-trained unigram LM quality score: per-document average
    negative log-likelihood under the corpus's own token distribution
    (low = templated/repetitive boilerplate, high = rare-token noise —
    the CCNet-style statistical filter between the heuristic
    text_quality tier and a real LM).

    Scale shape: tokens collapse to doc-term counts FIRST (the only
    shuffle that sees per-token rows is the (doc_id, term) groupBy);
    the vocabulary is then a re-aggregation of that much smaller table,
    and the corpus total joins back as a literal 1-row broadcast —
    no driver-side scalar, no second pass over the raw tokens."""
    from .functions.text import tokens

    (documents,) = _t(spark, sf_dir, "documents")
    toks = documents.select(
        "doc_id", F.explode(tokens("text")).alias("w")
    )
    dw = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("k"))
    vocab = dw.groupBy("w").agg(F.sum("k").alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    return (
        dw.join(vocab, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("bigint").alias("n_tokens"),
            F.round(
                -F.sum(F.col("k") * F.log(F.col("c") / F.col("n")))
                / F.sum("k"),
                4,
            ).alias("nll"),
        )
    )


@query(
    "session_window_native",
    """
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events),
    s AS (
      SELECT user_id,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sess
      FROM o),
    per AS (SELECT user_id, sess, count(*) AS n FROM s GROUP BY 1, 2)
    SELECT user_id, count(*) AS n_sessions,
           CAST(max(n) AS BIGINT) AS max_session_events
    FROM per GROUP BY user_id
    """,
)
def session_window_native(spark, sf_dir):
    """Spark's NATIVE batch session windows (``F.session_window``, the
    same merging-interval operator Structured Streaming uses for
    session state) — vs the manual gaps-and-islands form in
    ``sessionize_users``.  One shuffle on the session key; window
    merging happens inside the aggregate, no lag/window pre-pass.
    Oracle: gaps-and-islands fixpoint (a new session starts at gap >=
    30 min, matching session_window's exclusive window end)."""
    (events,) = _t(spark, sf_dir, "events")
    per = events.groupBy(
        "user_id", F.session_window("ts", "30 minutes")
    ).agg(F.count(F.lit(1)).alias("n"))
    return per.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n").cast("bigint").alias("max_session_events"),
    )


@query(
    "sliding_window_counts",
    """
    SELECT strftime(ws, '%Y-%m-%d %H:00:00') AS win_start, event_type,
           count(*) AS n
    FROM (SELECT unnest([date_trunc('hour', ts),
                         date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
                 event_type
          FROM events)
    GROUP BY ws, event_type
    """,
)
def sliding_window_counts(spark, sf_dir):
    """Sliding (hopping) time windows in batch: 2-hour windows every
    hour via ``F.window(ts, '2 hours', '1 hour')`` — each event lands
    in exactly two windows; the generator runs inside the scan
    projection (no join against a calendar table).  Oracle: explicit
    2-element unnest of the covering window starts."""
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:00:00").alias(
                "win_start"
            ),
            "event_type",
            "n",
        )
    )


@query(
    "hll_union_mixed_precision",
    """
    SELECT event_type, count(DISTINCT user_id) AS approx_users
    FROM events GROUP BY event_type
    """,
)
def hll_union_mixed_precision(spark, sf_dir):
    """Mixed-precision sketch reaggregation: historical slices sketched
    at a COARSER precision (relative_sd 0.002 -> lgK 19) union cleanly
    with fresh slices at the battery's fine precision (0.0015 -> lgK
    20) — ``hll_merge`` passes allowDifferentLgConfigK so the union
    downgrades to the smaller lgK instead of erroring (the
    cross-precision story the reference handles via its per-call
    relativeSD argument; HLLFunctions.scala:67-70).  Both precisions
    stay in Datasketches' exact coupon range at battery cardinalities,
    so the estimate equals exact COUNT DISTINCT."""
    from .functions import hll
    from .queries import _EXACT_SD

    (events,) = _t(spark, sf_dir, "events")
    cut = F.col("user_id") % 2 == 0
    old_slice = events.filter(cut).groupBy("event_type").agg(
        hll.hll_init_agg("user_id", 0.002).alias("users_hll")
    )
    new_slice = events.filter(~cut).groupBy("event_type").agg(
        hll.hll_init_agg("user_id", _EXACT_SD).alias("users_hll")
    )
    merged = old_slice.unionAll(new_slice)
    return merged.groupBy("event_type").agg(
        hll.hll_cardinality(hll.hll_merge("users_hll")).alias(
            "approx_users"
        )
    )


@query(
    "stream_sliding_window_counts",
    """
    SELECT strftime(ws, '%Y-%m-%d %H:00:00') AS win_start, event_type,
           count(*) AS n
    FROM (SELECT unnest([date_trunc('hour', ts),
                         date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
                 event_type
          FROM events)
    GROUP BY ws, event_type
    """,
)
def stream_sliding_window_counts(spark, sf_dir):
    """Streaming SLIDING windows (2-hour window, 1-hour hop) replayed
    with availableNow: overlapping window state (2 live aggregates per
    event at any time), watermark-bounded, must equal the batch
    covering-window expansion exactly — the streaming twin of
    ``sliding_window_counts``."""
    from .streaming import read_events_stream, run_to_memory, sliding_windowed_counts

    stream = read_events_stream(spark, sf_dir)
    return run_to_memory(
        sliding_windowed_counts(stream),
        _sink_name("slide_counts"),
        output_mode="complete",
        state_partitions=8,
        nodata_batches=False,  # complete-mode drain (see run_to_memory)
    )


@query(
    "source_xml_roundtrip",
    """
    SELECT p_brand, count(*) AS n_parts,
           round(sum(p_retailprice), 2) AS sum_price
    FROM part GROUP BY p_brand
    """,
)
def source_xml_roundtrip(spark, sf_dir):
    """Spark 4's NATIVE XML file format (reader + writer, no external
    package): part written as <row> documents and read back under the
    original schema (explicit schema on read — XML carries no types),
    proven identical via the brand aggregate.  Completes the
    self-describing-format matrix next to parquet/ORC/CSV/JSON;
    ``from_xml`` string parsing is covered separately by
    ``semistructured_xml_and_maps``."""
    (part,) = _t(spark, sf_dir, "part")
    path = os.path.join(tempfile.gettempdir(), _sink_name("xml_rt"))
    part.write.mode("overwrite").format("xml").option("rowTag", "row").save(
        path
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "row")
        .schema(part.schema)
        .load(path)
    )
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum("p_retailprice"), 2).alias("sum_price"),
    )


@query(
    "source_file_metadata_columns",
    """
    SELECT 8 AS n_files, count(*) AS n_rows, 0 AS min_row_index
    FROM lineitem
    """,
)
def source_file_metadata_columns(spark, sf_dir):
    """The hidden ``_metadata`` file columns (file_name, row_index) a
    lake pipeline uses for row-level lineage and incremental-load
    bookkeeping: lineitem fragmented into 8 files, read back with
    per-row provenance, and audited — 8 distinct source files, full
    row count, row indexes starting at 0 in every file.  The metadata
    struct is generated by the scan itself (no join against a file
    listing)."""

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    path = os.path.join(tempfile.gettempdir(), _sink_name("meta_cols"))
    lineitem.repartition(8).write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path).select(
        F.col("_metadata.file_name").alias("fname"),
        F.col("_metadata.row_index").alias("ridx"),
    )
    return back.agg(
        F.countDistinct("fname").cast("int").alias("n_files"),
        F.count(F.lit(1)).alias("n_rows"),
        F.min("ridx").cast("int").alias("min_row_index"),
    )


@query(
    "ann_pq_topk",
    """
    SELECT vec_id AS query_id, 10 AS k, true AS recall_ok
    FROM embeddings WHERE vec_id < 5
    """,
)
def ann_pq_topk(spark, sf_dir):
    """Product-quantization ANN (operators/similarity.py::pq_topk):
    corpus compressed to 16 4-bit subspace codes (32x smaller than
    float32), scored in the COMPRESSED domain via per-query lookup
    tables (ADC), exact cosine re-rank on the merged shortlist only —
    the billion-vector memory lever next to the IVF scan lever.
    Oracle = derived deterministic invariant: every query's PQ top-10
    recovers >= 60% of the exact cosine top-10 (measured 0.9-1.0 at
    sf0.01, 0.7-1.0 at sf0.1; seeded training + first-minimum code
    assignment make the per-query hit counts stable integers)."""
    from .operators.similarity import pq_topk
    from .queries import _ann_exact_cached

    (embeddings,) = _t(spark, sf_dir, "embeddings")
    queries_df = embeddings.filter(F.col("vec_id") < 5)
    exact = _ann_exact_cached(spark, sf_dir)
    pq = pq_topk(
        embeddings,
        queries_df,
        "vec_id",
        "embedding",
        k=10,
        m_subspaces=16,
        n_codes=16,
        shortlist=100,
    )
    from .queries import _ann_recall_report

    return _ann_recall_report(queries_df, exact, pq, min_hits=6)


@query(
    "ann_ivfpq_topk",
    """
    SELECT vec_id AS query_id, 10 AS k, true AS recall_ok
    FROM embeddings WHERE vec_id < 5
    """,
)
def ann_ivfpq_topk(spark, sf_dir):
    """IVF + PQ composed (operators/similarity.py::ivfpq_topk): the
    inverted file bounds WHICH vectors a query touches (10/16 lists
    probed), PQ codes bound WHAT is read per vector, exact re-rank on
    the shortlist only — the FAISS-IVFPQ layout as one Arrow
    assign+encode pass plus a broadcast probe join.  Oracle = derived
    deterministic invariant: every query recovers >= 60% of the exact
    top-10 (measured 0.8-1.0 at sf0.01, 0.7-1.0 at sf0.1 — on
    UNIFORMLY RANDOM synthetic embeddings, ANN's adversarial case;
    clustered real embeddings probe far fewer lists for the same
    recall)."""
    from .operators.similarity import ivfpq_topk
    from .queries import _ann_exact_cached

    (embeddings,) = _t(spark, sf_dir, "embeddings")
    queries_df = embeddings.filter(F.col("vec_id") < 5)
    exact = _ann_exact_cached(spark, sf_dir)
    from .queries import _ivf_centroids_cached

    pq = ivfpq_topk(
        embeddings,
        queries_df,
        "vec_id",
        "embedding",
        k=10,
        nprobe=10,
        centroids=_ivf_centroids_cached(spark, sf_dir),
        shortlist=150,
    )
    from .queries import _ann_recall_report

    return _ann_recall_report(queries_df, exact, pq, min_hits=6)


# Confs that make AQE's runtime skew-join splitting observable at
# battery scale: broadcast is disabled (a broadcast join sidesteps
# reduce-side skew entirely — the point is the SMJ path), and the skew
# thresholds drop from their 256MB-class production defaults to match
# the synthetic volume.
_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
}


def aqe_skewed_join(spark):
    """The lazy plan: a 2M-row fact with 95% of rows on ONE join key,
    shuffle-joined to a 100-key dimension.  Under ``_SKEW_CONFS`` AQE's
    ``OptimizeSkewedJoin`` detects the hot reduce partition from
    runtime map statistics and splits it across mapper ranges
    (``SortMergeJoin(skew=true)`` in the final adaptive plan, asserted
    in tests/test_plans.py) — the runtime complement to the MANUAL
    salting operator in operators/skew.py, which remains the tool when
    the skewed side must also aggregate on the hot key."""
    f = spark.range(0, 2_000_000, 1, 8).select(
        F.when(F.col("id") % 20 < 19, F.lit(0))
        .otherwise(F.col("id") % 100)
        .alias("k"),
        ((F.col("id") * 13) % 1000).cast("double").alias("val"),
    )
    d = spark.range(0, 100).select(
        F.col("id").alias("k"),
        F.concat(F.lit("g"), (F.col("id") % 7).cast("string")).alias("grp"),
    )
    return (
        f.join(d, "k")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("val") / 10, 2).alias("amount"),
        )
    )


@query(
    "aqe_skew_join_split",
    """
    WITH f AS (
      SELECT CASE WHEN id % 20 < 19 THEN 0 ELSE id % 100 END AS k,
             CAST((id * 13) % 1000 AS DOUBLE) AS val
      FROM range(0, 2000000) t(id)),
    d AS (SELECT range AS k, 'g' || CAST(range % 7 AS VARCHAR) AS grp
          FROM range(0, 100))
    SELECT grp, count(*) AS n, round(sum(val) / 10, 2) AS amount
    FROM f JOIN d USING (k) GROUP BY grp
    """,
)
def aqe_skew_join_split(spark, sf_dir):
    """AQE runtime skew-join splitting end to end (see
    :func:`aqe_skewed_join`).  Like the bloom entry, the plan-shaping
    confs must hold at execution, so the (7-row) result materializes
    inside the conf window and the session's join/AQE settings are
    restored before returning."""
    with _conf_window(spark, _SKEW_CONFS):
        out = aqe_skewed_join(spark)
        path = os.path.join(tempfile.gettempdir(), _sink_name("skewjoin"))
        out.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


@query(
    "quality_band_trim",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents),
    dw AS (SELECT doc_id, w, count(*) AS k FROM tok GROUP BY doc_id, w),
    v AS (SELECT w, sum(k) AS c FROM dw GROUP BY w),
    t AS (SELECT sum(c) AS n FROM v),
    scored AS (
      SELECT doc_id, round(-sum(k * ln(c / n)) / sum(k), 4) AS nll
      FROM dw JOIN v USING (w) CROSS JOIN t GROUP BY doc_id),
    hist AS (
      SELECT nll, count(*) AS cnt FROM scored GROUP BY nll),
    cdf AS (
      SELECT nll, sum(cnt) OVER (ORDER BY nll
                                 ROWS UNBOUNDED PRECEDING) AS cum,
             (SELECT sum(cnt) FROM hist) AS total
      FROM hist),
    bounds AS (
      SELECT min(CASE WHEN cum * 10 >= total THEN nll END) AS lo,
             min(CASE WHEN cum * 10 >= total * 9 THEN nll END) AS hi
      FROM cdf)
    SELECT d.lang, count(*) AS n_docs, round(avg(s.nll), 4) AS avg_nll
    FROM scored s JOIN documents d USING (doc_id) CROSS JOIN bounds
    WHERE s.nll > bounds.lo AND s.nll < bounds.hi
    GROUP BY d.lang
    """,
)
def quality_band_trim(spark, sf_dir):
    """Statistical quality banding: keep only documents whose
    unigram-LM score sits strictly BETWEEN the 10th- and
    90th-percentile score values — trimming both tails at once
    (too-predictable boilerplate at the bottom, rare-token noise at
    the top), the both-sided filter CCNet-style curation applies.

    Scale shape: the percentile thresholds come from a cumulative
    distribution over DISTINCT (4dp-rounded) score values — a window
    over the value histogram, thousands of rows, never a global
    row-number over the corpus — and join back as a 1-row broadcast.
    Value-level trimming keeps ties deterministic in both engines
    (scores are rounded before banding, so the threshold comparison
    can't flip on last-ulp float drift)."""
    from pyspark.sql import Window

    (documents,) = _t(spark, sf_dir, "documents")
    # one row per doc, materialized ONCE: both the histogram branch and
    # the survivor branch would otherwise re-run the full scoring
    # pipeline (the token explode is the costliest subplan here)
    scored = (
        quality_unigram_logprob(spark, sf_dir)
        .select("doc_id", "nll")
        # LAZY: both branches ride one final action; the first use
        # materializes the scoring subplan once, same sharing as eager
        .localCheckpoint(eager=False)
    )
    hist = scored.groupBy("nll").agg(F.count(F.lit(1)).alias("cnt"))
    wv = Window.orderBy("nll").rowsBetween(Window.unboundedPreceding, 0)
    # total = sum over the (small) histogram — never a third pass over
    # the expensive scoring subplan
    cdf = hist.withColumn("cum", F.sum("cnt").over(wv)).crossJoin(
        F.broadcast(hist.agg(F.sum("cnt").alias("total")))
    )
    bounds = cdf.agg(
        F.min(F.when(F.col("cum") * 10 >= F.col("total"), F.col("nll"))).alias(
            "lo"
        ),
        F.min(
            F.when(F.col("cum") * 10 >= F.col("total") * 9, F.col("nll"))
        ).alias("hi"),
    )
    kept = (
        scored.crossJoin(F.broadcast(bounds))
        .filter((F.col("nll") > F.col("lo")) & (F.col("nll") < F.col("hi")))
        .join(documents.select("doc_id", "lang"), "doc_id")
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("nll"), 4).alias("avg_nll"),
    )


@query(
    "stream_quality_at_ingest",
    """
    WITH q AS (
      SELECT lang,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS tok,
             CASE WHEN len(text) > 0 THEN
               round(CAST(len(list_filter(string_split(text, ' '),
                                          x -> x <> '')) AS DOUBLE)
                     / len(text), 4) END AS density
      FROM documents)
    SELECT lang, count(*) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS sum_tokens,
           round(avg(density), 4) AS avg_density
    FROM q GROUP BY lang
    """,
)
def stream_quality_at_ingest(spark, sf_dir):
    """Curation-at-ingest: heuristic quality features computed ON THE
    STREAM (token count, token density) — a stateless projection, so
    the streaming plan carries no state store at all and scales as
    pure per-file map work; this is the shape real pipelines use to
    score documents as they land, before any batch curation pass.
    availableNow replay must equal the batch computation exactly."""
    from .functions.text import token_count
    from .streaming import read_table_stream, run_to_memory

    stream = read_table_stream(spark, sf_dir, "documents")
    scored = stream.select(
        "lang",
        token_count("text").alias("tok"),
        F.when(
            F.length("text") > 0,
            F.round(
                token_count("text").cast("double") / F.length("text"), 4
            ),
        ).alias("density"),
    )
    rows = run_to_memory(scored, _sink_name("ingest_q"), output_mode="append")
    return rows.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").cast("bigint").alias("sum_tokens"),
        F.round(F.avg("density"), 4).alias("avg_density"),
    )


@query(
    "privacy_k_anonymity",
    """
    WITH classes AS (
      SELECT c_mktsegment, c_nationkey,
             CASE WHEN c_acctbal < 0 THEN 'neg'
                  WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bal_band,
             count(*) AS sz
      FROM customer GROUP BY 1, 2, 3)
    SELECT count(*) AS n_classes,
           CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS violating_classes,
           CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(min(sz) AS BIGINT) AS min_class_size
    FROM classes
    """,
)
def privacy_k_anonymity(spark, sf_dir):
    """K-anonymity audit — the measurement side of the privacy tier
    (scrubbing lives in prep_pii_scrub / string_mask_pii): group the
    table by its quasi-identifier combination (segment, nation,
    balance band) and report how many equivalence classes fall below
    k=5 and how many rows they expose.  One aggregation pass; at scale
    this is the same shuffle as any groupBy-count, and the violating
    classes (not the rows) are what a remediation pass generalizes."""
    (customer,) = _t(spark, sf_dir, "customer")
    classes = customer.groupBy(
        "c_mktsegment",
        "c_nationkey",
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("sz"))
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.when(F.col("sz") < 5, 1).otherwise(0))
        .cast("bigint")
        .alias("violating_classes"),
        F.sum(F.when(F.col("sz") < 5, F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
        F.min("sz").cast("bigint").alias("min_class_size"),
    )


@query(
    "source_corrupt_record_tolerance",
    """
    SELECT CAST(sum(CASE WHEN o_orderkey % 50 <> 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_good,
           CAST(sum(CASE WHEN o_orderkey % 50 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_corrupt,
           round(sum(CASE WHEN o_orderkey % 50 <> 0
                          THEN o_totalprice ELSE 0 END), 2) AS good_revenue
    FROM orders
    """,
)
def source_corrupt_record_tolerance(spark, sf_dir):
    """Bad-record tolerance — the ingestion property a 100 TB pipeline
    cannot live without: a JSONL feed where every 50th record is
    malformed is read in PERMISSIVE mode with a ``_corrupt_record``
    capture column, so the scan degrades per-record (corrupt rows
    quarantined with their raw text, good rows parsed) instead of
    failing the job.  The audit counts and good-row revenue must equal
    the clean-source replay."""
    (orders,) = _t(spark, sf_dir, "orders")
    path = os.path.join(tempfile.gettempdir(), _sink_name("corrupt_src"))
    line = F.to_json(F.struct("o_orderkey", "o_totalprice"))
    feed = orders.select(
        F.when(F.col("o_orderkey") % 50 == 0, F.concat(F.lit("oops"), line))
        .otherwise(line)
        .alias("value")
    )
    feed.write.mode("overwrite").text(path)
    back = spark.read.schema(
        "o_orderkey long, o_totalprice double, _corrupt_record string"
    ).json(path)
    return back.agg(
        F.sum(F.when(F.col("_corrupt_record").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_good"),
        F.sum(F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_corrupt"),
        F.round(
            F.sum(
                F.when(
                    F.col("_corrupt_record").isNull(), F.col("o_totalprice")
                ).otherwise(0.0)
            ),
            2,
        ).alias("good_revenue"),
    )


@query(
    "window_time_range_frame",
    """
    WITH c AS (
      SELECT user_id,
             count(*) OVER (PARTITION BY user_id
                            ORDER BY CAST(epoch(date_trunc('second', ts)) AS BIGINT)
                            RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
               AS burst
      FROM events)
    SELECT user_id, CAST(max(burst) AS BIGINT) AS max_burst_1h
    FROM c GROUP BY user_id
    """,
)
def window_time_range_frame(spark, sf_dir):
    """Time-interval RANGE window frames: each event's frame is the
    VALUE range [ts - 1h, ts] (not N physical rows — gaps and ties
    behave correctly), here computing every user's maximum 1-hour
    event burst, the rate-limiting/abuse-detection primitive.  Frames
    order by epoch seconds so both engines evaluate the identical
    numeric range; one shuffle on the user key."""
    from pyspark.sql import Window

    (events,) = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    bursts = events.select(
        "user_id", F.count(F.lit(1)).over(w).alias("burst")
    )
    return bursts.groupBy("user_id").agg(
        F.max("burst").cast("bigint").alias("max_burst_1h")
    )


# Round-3 battery extension registers itself on import.
from . import queries_r3  # noqa: E402,F401  (registration side effect)
