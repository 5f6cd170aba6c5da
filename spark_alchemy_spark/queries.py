"""The engine's query battery: every operator from SURVEY.md §2 (plus
the LLM-pipeline extensions) expressed as a (spark, sf_dir) -> DataFrame
callable with, where SQL-expressible, an equivalent ANSI-SQL oracle that
DuckDB runs on the same parquet tables.

Conventions keeping the DuckDB value-hash comparison deterministic:
* every computed column is aliased identically in Spark and SQL;
* floating-point aggregates are rounded (2dp for money sums, 4dp for
  ratios) — double rounding is bit-stable across both engines;
* HLL estimates are compared against exact COUNT(DISTINCT) only where
  the sketch is provably exact: Datasketches stays in its exact
  coupon-list/set modes below ~3/4·2^lgK couponspace, and at
  relative_sd=0.0015 (lgConfigK=20) estimates are exact for the
  cardinalities in this schema (verified <= 15k distinct);
* top-k queries carry a total tiebreak so LIMIT frontiers are stable;
* timestamps are emitted as formatted strings (driver-side nanosecond
  timestamps don't round-trip identically in both engines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import hll
from .operators.temporal import as_of_join, range_pair_join, sessionize
from .sources import load_tables

# relative_sd -> lgConfigK 20: exact estimates for every distinct count
# in this battery (max ~2k per group at sf0.01).
_EXACT_SD = 0.0015

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        if name in QUERIES:
            # a silent dict overwrite hides the older entry from the
            # battery while every count stays plausible — fail loud
            raise ValueError(
                f"battery entry {name!r} registered twice "
                f"(existing: {QUERIES[name].__module__})"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    tables = load_tables(spark, sf_dir, names)
    return [tables[n] for n in names]


def _overlap(*thunks):
    """Run independent read-only driver actions concurrently (guide
    §2.6: actions are only sequential because the driver calls them
    sequentially).  The lifecycle entries' verify tails are 2-3
    independent bounded reads of the finished index — each one is
    job-count-bound (AQE stage jobs + planning gaps, not data), so
    overlapping them hides one action's driver-side gaps behind
    another's tasks.  Results come back in argument order; any
    exception propagates.  ONLY for actions with no mutation and no
    ordering contract between them."""
    from concurrent.futures import ThreadPoolExecutor

    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
        futs = [ex.submit(t) for t in thunks]
        return [f.result() for f in futs]


# ---------------------------------------------------------------------------
# HLL sketch algebra (reference surface, SURVEY.md §2.1)
# ---------------------------------------------------------------------------


@query(
    "hll_init_agg_cardinality",
    """
    SELECT event_type, count(DISTINCT user_id) AS approx_users
    FROM events GROUP BY event_type
    """,
)
def hll_init_agg_cardinality(spark, sf_dir):
    """hll_init_agg + hll_cardinality: grouped distinct-user estimate."""
    (events,) = _t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        hll.hll_cardinality(hll.hll_init_agg("user_id", _EXACT_SD)).alias(
            "approx_users"
        )
    )


@query(
    "hll_merge_reaggregate",
    """
    SELECT event_type, count(DISTINCT user_id) AS approx_users
    FROM events GROUP BY event_type
    """,
)
def hll_merge_reaggregate(spark, sf_dir):
    """The headline pipeline: fine-grained sketches (event_type x day),
    re-aggregated later by hll_merge — same answer as one-shot distinct.
    reference: PostgresInteropTest.scala:73-98."""
    (events,) = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(hll.hll_init_agg("user_id", _EXACT_SD).alias("users_hll"))
    return daily.groupBy("event_type").agg(
        hll.hll_cardinality(hll.hll_merge("users_hll")).alias("approx_users")
    )


@query(
    "hll_row_merge_union",
    """
    SELECT l_returnflag, count(DISTINCT v) AS merged_distinct FROM (
      SELECT l_returnflag, l_suppkey AS v FROM lineitem
      UNION ALL
      SELECT l_returnflag, l_partkey AS v FROM lineitem
    ) t GROUP BY l_returnflag
    """,
)
def hll_row_merge_union(spark, sf_dir):
    """hll_row_merge: within-row union of two sketch columns."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    sk = lineitem.groupBy("l_returnflag").agg(
        hll.hll_init_agg("l_suppkey", _EXACT_SD).alias("s1"),
        hll.hll_init_agg("l_partkey", _EXACT_SD).alias("s2"),
    )
    return sk.select(
        "l_returnflag",
        hll.hll_cardinality(hll.hll_row_merge("s1", "s2")).alias("merged_distinct"),
    )


@query(
    "hll_intersect_brands",
    """
    SELECT count(*) AS common_suppliers FROM (
      SELECT DISTINCT l.l_suppkey FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#4'
      INTERSECT
      SELECT DISTINCT l.l_suppkey FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#2'
    ) t
    """,
)
def hll_intersect_brands(spark, sf_dir):
    """hll_intersect_cardinality via inclusion-exclusion on two brand
    sketches (small dim side broadcast into the fact scan)."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    joined = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        lineitem.l_partkey == part.p_partkey,
    )
    sk = joined.agg(
        hll.hll_init_agg(
            F.when(F.col("p_brand") == "Brand#4", F.col("l_suppkey")), _EXACT_SD
        ).alias("a"),
        hll.hll_init_agg(
            F.when(F.col("p_brand") == "Brand#2", F.col("l_suppkey")), _EXACT_SD
        ).alias("b"),
    )
    return sk.select(
        hll.hll_intersect_cardinality("a", "b").alias("common_suppliers")
    )


@query(
    "hll_init_collection_words",
    """
    SELECT doc_id, count(DISTINCT w) AS distinct_words FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ) t WHERE w <> '' GROUP BY doc_id
    """,
)
def hll_init_collection_words(spark, sf_dir):
    """hll_init_collection: per-row sketch over a document's tokens."""
    (documents,) = _t(spark, sf_dir, "documents")
    toks = documents.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda w: w != "").alias("ws"),
    )
    return toks.select(
        "doc_id",
        hll.hll_cardinality(
            hll.hll_init_collection("ws", _EXACT_SD, dtype=toks.schema["ws"].dataType)
        ).alias("distinct_words"),
    )


# ---------------------------------------------------------------------------
# Relational coverage (delegated to stock Spark in the reference, §2.2)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-filter-aggregate with partial aggregation."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_top_unshipped_orders",
    """
    SELECT o.o_orderkey, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o.o_orderkey
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
)
def q3_top_unshipped_orders(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter, two joins, top-k."""
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, customer.c_custkey == orders.o_custkey)
        .filter(F.col("o_orderdate") < cutoff)
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q5_region_revenue",
    """
    SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_region_revenue(spark, sf_dir):
    """Multi-join star query; nation/region broadcast."""
    customer, nation, region, orders, lineitem = _t(
        spark, sf_dir, "customer", "nation", "region", "orders", "lineitem"
    )
    dims = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).filter(
            F.col("r_name") == "ASIA"
        )
    )
    return (
        customer.join(dims, customer.c_nationkey == F.col("n_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "window_top_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, rnk FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders) t WHERE rnk <= 3
    """,
)
def window_top_orders_per_customer(spark, sf_dir):
    """Ranking window function with deterministic tiebreak."""
    from pyspark.sql import Window

    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


@query(
    "rollup_returnflag_status",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def rollup_returnflag_status(spark, sf_dir):
    """Hierarchical aggregate (ROLLUP) incl. grand total."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


@query(
    "setop_customers_no_urgent",
    """
    SELECT o_custkey AS c_custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def setop_customers_no_urgent(spark, sf_dir):
    """Set operation (EXCEPT): customers with orders but none urgent."""
    (orders,) = _t(spark, sf_dir, "orders")
    all_cust = orders.select(F.col("o_custkey").alias("c_custkey"))
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return all_cust.subtract(urgent)


@query(
    "asof_last_click_before_error",
    """
    SELECT event_id, prev_click_id FROM (
      SELECT e.event_id, c.event_id AS prev_click_id,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM events e JOIN events c
        ON c.user_id = e.user_id AND c.event_type = 'click' AND c.ts <= e.ts
      WHERE e.event_type = 'error') t
    WHERE rn = 1
    """,
)
def asof_last_click_before_error(spark, sf_dir):
    """As-of (backward, inclusive) join via union+window — one shuffle,
    no range explosion (operators/temporal.py)."""
    (events,) = _t(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("prev_click_id")
    )
    joined = as_of_join(
        errors,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["prev_click_id"],
        tie_break="prev_click_id",
    )
    return joined.filter(F.col("prev_click_id").isNotNull()).select(
        "event_id", "prev_click_id"
    )


@query(
    "range_join_close_events",
    """
    SELECT a.user_id, count(*) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
    GROUP BY a.user_id
    """,
)
def range_join_close_events(spark, sf_dir):
    """Banded self-join on an equi-key (range predicate post-filter)."""
    (events,) = _t(spark, sf_dir, "events")
    pairs = range_pair_join(
        events, key="user_id", ts="ts", max_gap=F.expr("INTERVAL 10 MINUTE"), id_col="event_id"
    )
    return pairs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))


@query(
    "sessionize_users",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events)
    SELECT user_id, count(DISTINCT session_id) AS n_sessions FROM (
      SELECT user_id, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged) t
    GROUP BY user_id
    """,
)
def sessionize_users(spark, sf_dir):
    """Gap-based sessionization (30 min), batch form of session_window."""
    (events,) = _t(spark, sf_dir, "events")
    s = sessionize(events, key="user_id", ts="ts", gap_seconds=1800)
    return s.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions")
    )


@query(
    "tumbling_hourly_counts",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
           event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def tumbling_hourly_counts(spark, sf_dir):
    """Tumbling time-window aggregate (batch twin of the streaming path)."""
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "heavy_hitters_topk",
    """
    SELECT user_id, count(*) AS n FROM events
    GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10
    """,
)
def heavy_hitters_topk(spark, sf_dir):
    """Top-k heavy hitters with stable tiebreak."""
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("user_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Deduplication (LLM-pipeline extensions)
# ---------------------------------------------------------------------------


@query(
    "dedup_exact_fingerprint",
    """
    WITH fp AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(
               list_filter(string_split(text, ' '), w -> w <> ''))), ' ')) AS f
      FROM documents)
    SELECT min(doc_id) AS doc_id, count(*) AS n_members
    FROM fp GROUP BY f
    """,
)
def dedup_exact_fingerprint(spark, sf_dir):
    """Exact dedup on an order-insensitive content fingerprint; smallest
    doc_id survives (operators/dedup.py exact path + text fingerprint)."""
    from .functions.text import doc_fingerprint

    (documents,) = _t(spark, sf_dir, "documents")
    return (
        documents.select("doc_id", doc_fingerprint("text").alias("f"))
        .groupBy("f")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_members"))
        .drop("f")
    )


@query(
    "dedup_ngram_jaccard",
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
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b, inter, na.n + nb.n - inter AS uni
    FROM inter
    JOIN sizes na ON na.doc_id = id_a
    JOIN sizes nb ON nb.doc_id = id_b
    WHERE inter * 10 >= (na.n + nb.n - inter) * 6
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact word-trigram Jaccard near-dup pairs (>= 0.6), integer
    threshold arithmetic — the oracle-checkable similarity baseline
    (shared reference: ``_ngram_pairs_cached``)."""
    return _ngram_pairs_cached(spark, sf_dir)


_EXACT_PAIR_SQL = """
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
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    exact_pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes na ON na.doc_id = id_a
      JOIN sizes nb ON nb.doc_id = id_b
      WHERE inter * 10 >= (na.n + nb.n - inter) * 6)
"""


_EXACT_PAIR_CACHE: dict[tuple[str, str], DataFrame] = {}


def _ngram_pairs_cached(spark, sf_dir) -> DataFrame:
    """The exact word-trigram Jaccard>=0.6 pair set (id_a, id_b, inter,
    uni), materialized ONCE PER (session, sf_dir) and shared by every
    entry that consumes it — the recall references (minhash, simhash),
    the pair entry itself, and the connected-component curation
    entries.  The shingle pipeline behind it is the single most
    recomputed expensive stage in the battery (VERDICT r4 task 5).
    Keyed by applicationId so a dead session's checkpoint can't leak
    into a new one."""
    from .operators.dedup import ngram_jaccard_pairs

    key = (spark.sparkContext.applicationId, sf_dir)
    pairs = _EXACT_PAIR_CACHE.get(key)
    if pairs is None:
        (documents,) = _t(spark, sf_dir, "documents")
        pairs = ngram_jaccard_pairs(
            documents, "doc_id", "text", n=3, threshold_num=6,
            threshold_den=10,
            max_shingle_df=None,  # oracles compute uncapped: share semantics
        ).localCheckpoint(eager=True)
        _EXACT_PAIR_CACHE[key] = pairs
    return pairs


def _pair_recall_report(spark, sf_dir, approx_pairs, min_recall: float):
    """(n_exact_pairs, recall_ok): the approximate pair set must recover
    at least ``min_recall`` of the exact trigram-Jaccard>=0.6 pairs.
    Every input is seeded/integer-deterministic, so the boolean is a
    stable oracle target; n_exact_pairs is independently recomputed by
    the DuckDB oracle from the raw documents."""
    exact = _ngram_pairs_cached(spark, sf_dir).select("id_a", "id_b")
    captured = exact.join(
        approx_pairs.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi"
    )
    return exact.agg(F.count(F.lit(1)).alias("__n")).crossJoin(
        captured.agg(F.count(F.lit(1)).alias("__c"))
    ).select(
        F.col("__n").alias("n_exact_pairs"),
        (F.col("__c") >= F.ceil(F.col("__n") * min_recall)).alias("recall_ok"),
    )


@query(
    "dedup_minhash_lsh",
    _EXACT_PAIR_SQL
    + """
    SELECT count(*) AS n_exact_pairs, true AS recall_ok FROM exact_pairs
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(64) + 16-band LSH candidates, signature-verified
    (est_jaccard >= 0.5) — scale path of dedup_ngram_jaccard.  The
    oracle pins a derived deterministic invariant: LSH must recover
    >= 80% of the exact trigram-Jaccard>=0.6 pairs (the exact count is
    recomputed independently by DuckDB; the hash chain is seeded, so
    the outcome is stable)."""
    from .operators.dedup import minhash_lsh_pairs

    (documents,) = _t(spark, sf_dir, "documents")
    lsh = minhash_lsh_pairs(
        documents, "doc_id", "text", n=3, num_perm=64, bands=16, threshold=0.5
    )
    return _pair_recall_report(spark, sf_dir, lsh, min_recall=0.8)


@query(
    "dedup_simhash",
    _EXACT_PAIR_SQL
    + """
    SELECT count(*) AS n_exact_pairs, true AS recall_ok FROM exact_pairs
    """,
)
def dedup_simhash(spark, sf_dir):
    """SimHash-64 near-dup pairs within Hamming distance 8, banded by
    16-bit chunks.  Oracle = derived invariant: >= 80% recall of the
    exact trigram-Jaccard>=0.6 pairs (measured 92% at sf0.01;
    deterministic seeded hashing)."""
    from .operators.dedup import simhash_pairs

    (documents,) = _t(spark, sf_dir, "documents")
    sim = simhash_pairs(documents, "doc_id", "text", max_hamming=8)
    return _pair_recall_report(spark, sf_dir, sim, min_recall=0.8)


@query(
    "dedup_embedding_cosine",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 4) AS cos
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.45
    """,
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding near-dup pairs by exact cosine (brute-force verify
    path of the hyperplane-LSH operator)."""
    from .operators.dedup import embedding_near_dup_pairs

    (embeddings,) = _t(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(
        embeddings, "vec_id", "embedding", threshold=0.45, brute_force=True
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@query(
    "ann_brute_force_topk",
    """
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
    """,
)
def ann_brute_force_topk(spark, sf_dir):
    """Exact cosine top-10 for 5 query vectors (broadcast queries,
    windowed partial top-k)."""
    return _ann_exact_cached(spark, sf_dir)


_ANN_EXACT_CACHE: dict[tuple[str, str], DataFrame] = {}
_IVF_CENTROIDS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _ivf_centroids_cached(spark, sf_dir) -> DataFrame:
    """Seeded k-means centroids over the full embeddings corpus at the
    battery's standard parameters (16 lists, 4 Lloyd rounds, seed 42),
    trained once per (session, sf dir) and shared by every entry that
    trains the same model (ivf / ivfpq / the persisted-index build).
    Training is deterministic, so sharing changes nothing but cost."""
    from .operators.similarity import train_ivf_centroids

    key = (spark.sparkContext.applicationId, sf_dir)
    cents = _IVF_CENTROIDS_CACHE.get(key)
    if cents is None:
        (embeddings,) = _t(spark, sf_dir, "embeddings")
        cents = train_ivf_centroids(
            embeddings, "embedding", n_centroids=16, iters=4, seed=42
        ).localCheckpoint(eager=False)
        _IVF_CENTROIDS_CACHE[key] = cents
    return cents


_IVF_INDEX_CACHE: dict[tuple[str, str, int | None], str] = {}


def _ivf_standing_index(spark, sf_dir, hi: int | None, dest: str | None = None) -> str:
    """A session-cached GOLDEN standing index over ``embeddings``
    (``vec_id < hi``, or the whole table when ``hi is None``; 16
    lists, the session's shared centroids) — the shared build
    scaffolding of the index lifecycle entries (VERDICT r8 task 8:
    twelve entries each paid a full ``build_ivf_index``; each distinct
    standing set now builds ONCE per (session, sf dir)).

    With ``dest`` the golden tree is COPIED there (local-fs
    ``copytree``, milliseconds) so a mutating entry (append / delete /
    upsert / retrain / CDC) starts from a pristine index without
    touching the shared copy; without ``dest`` the golden path itself
    is returned for READ-ONLY consumers.  Builds are deterministic
    (seeded centroids, hash-clustered writes), so sharing changes
    nothing but cost."""
    import os
    import shutil
    import tempfile

    from .operators.similarity import build_ivf_index
    from .queries_ext import _sink_name

    key = (spark.sparkContext.applicationId, sf_dir, hi)
    src = _IVF_INDEX_CACHE.get(key)
    if src is None:
        src = os.path.join(
            tempfile.gettempdir(), _sink_name(f"ivf_golden_{hi}")
        )
        (embeddings,) = _t(spark, sf_dir, "embeddings")
        standing = (
            embeddings
            if hi is None
            else embeddings.filter(F.col("vec_id") < int(hi))
        ).select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        build_ivf_index(
            standing, "vec_id", "embedding", src, n_centroids=16,
            centroids=_ivf_centroids_cached(spark, sf_dir),
        )
        _IVF_INDEX_CACHE[key] = src
    if dest is None:
        return src
    shutil.rmtree(dest, ignore_errors=True)
    shutil.copytree(src, dest)
    return dest


def _ann_exact_cached(spark, sf_dir) -> DataFrame:
    """The exact cosine top-10 for the standard 5-query set (vec_id <
    5), materialized once per (session, sf dir): it is the entry
    result of ``ann_brute_force_topk`` AND the recall reference of
    every approximate-ANN entry (LSH / PQ / IVFPQ / int8) — same
    shared-reference pattern as ``_ngram_pairs_cached``."""
    from .operators.similarity import brute_force_topk

    key = (spark.sparkContext.applicationId, sf_dir)
    exact = _ANN_EXACT_CACHE.get(key)
    if exact is None:
        (embeddings,) = _t(spark, sf_dir, "embeddings")
        queries_df = embeddings.filter(F.col("vec_id") < 5)
        exact = brute_force_topk(
            embeddings, queries_df, "vec_id", "embedding", k=10
        ).localCheckpoint(eager=True)
        _ANN_EXACT_CACHE[key] = exact
    return exact


def _ann_recall_report(queries_df, exact, approx, min_hits: int, k: int = 10):
    """(query_id, k, recall_ok) — per-query count of exact-top-k
    neighbors the approximate result recovered, thresholded at
    ``min_hits``.  Shared harness for every recall-invariant ANN
    entry (LSH / PQ / IVFPQ)."""
    hits = (
        exact.join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("__n_hit"))
    )
    qids = queries_df.select(F.col("vec_id").alias("query_id"))
    return qids.join(hits, "query_id", "left").select(
        "query_id",
        F.lit(k).alias("k"),
        (F.coalesce("__n_hit", F.lit(0)) >= min_hits).alias("recall_ok"),
    )


@query(
    "ann_lsh_topk",
    """
    SELECT vec_id AS query_id, 10 AS k, true AS recall_ok
    FROM embeddings WHERE vec_id < 5
    """,
)
def ann_lsh_topk(spark, sf_dir):
    """Hyperplane-LSH bucketed ANN top-10.  Oracle = derived
    deterministic invariant: for EVERY query, the LSH top-10 must
    recover >= 50% of the exact cosine top-10 (measured 60-80% per
    query at sf0.01; hyperplanes are seeded xxhash64 projections, so
    the per-query hit counts are stable integers)."""
    from .operators.similarity import lsh_topk

    (embeddings,) = _t(spark, sf_dir, "embeddings")
    queries_df = embeddings.filter(F.col("vec_id") < 5)
    exact = _ann_exact_cached(spark, sf_dir)
    lsh = lsh_topk(embeddings, queries_df, "vec_id", "embedding", k=10)
    return _ann_recall_report(queries_df, exact, lsh, min_hits=5)


@query(
    "ann_ivf_topk",
    """
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
    """,
)
def ann_ivf_topk(spark, sf_dir):
    """IVF ANN with seeded-k-means-trained centroids, probing ALL lists
    — which must reduce exactly to brute force, so the whole train ->
    assign -> probe -> re-rank machine is held to the exact top-k
    oracle.  (Selective probing recall is pinned in
    tests/test_operators.py: nprobe=4 of 16 at fixed seeds.)"""
    from .operators.similarity import ivf_topk

    (embeddings,) = _t(spark, sf_dir, "embeddings")
    queries_df = embeddings.filter(F.col("vec_id") < 5)
    return ivf_topk(
        embeddings, queries_df, "vec_id", "embedding", k=10,
        n_centroids=16, nprobe=16,
        centroids=_ivf_centroids_cached(spark, sf_dir),
    )


@query(
    "ann_ivf_indexed_topk",
    """
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
    """,
)
def ann_ivf_indexed_topk(spark, sf_dir):
    """PERSISTED IVF index: train + assign once, write the corpus
    Hive-partitioned by list id, then query through planning-time
    partition pruning (only probed list partitions are scanned —
    asserted in tests).  Probing all lists must reduce exactly to brute
    force, so build + layout + probe + re-rank is held to the exact
    top-k oracle; the index build is the session-shared golden copy
    (``_ivf_standing_index``), queried READ-ONLY here."""
    from .operators.similarity import ivf_topk_indexed

    (embeddings,) = _t(spark, sf_dir, "embeddings")
    queries_df = embeddings.filter(F.col("vec_id") < 5)
    path = _ivf_standing_index(spark, sf_dir, None)
    return ivf_topk_indexed(
        spark, path, queries_df, "vec_id", "embedding", k=10, nprobe=16
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "text_token_stats",
    """
    WITH toks AS (
      SELECT doc_id, n_chars, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents)
    SELECT doc_id, len(ws)::BIGINT AS n_tokens,
           len(list_distinct(ws))::BIGINT AS n_distinct,
           n_chars
    FROM toks
    """,
)
def text_token_stats(spark, sf_dir):
    """Token counting (whitespace tokenizer)."""
    from .functions.text import distinct_token_count, token_count

    (documents,) = _t(spark, sf_dir, "documents")
    return documents.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        distinct_token_count("text").alias("n_distinct"),
        "n_chars",
    )


@query(
    "text_quality",
    """
    WITH toks AS (
      SELECT doc_id, text, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents)
    SELECT doc_id,
           round(list_aggregate(list_transform(ws, w -> len(w)), 'sum') * 1.0
                 / len(ws), 4) AS mean_token_len,
           round(len(list_filter(ws, w -> list_contains(
             ['the','and','of','to','in','is','that','with','for','was'], w))) * 1.0
                 / len(ws), 4) AS stopword_ratio,
           (len(ws) >= 20 AND list_aggregate(list_transform(ws, w -> len(w)), 'sum') * 1.0
                 / len(ws) <= 12.0) AS keep
    FROM toks WHERE len(ws) > 0
    """,
)
def text_quality(spark, sf_dir):
    """Quality scoring: mean token length, stopword ratio, keep flag."""
    from .functions.text import mean_token_length, quality_flags, stopword_ratio

    (documents,) = _t(spark, sf_dir, "documents")
    return documents.select(
        "doc_id",
        mean_token_length("text").alias("mean_token_len"),
        stopword_ratio("text").alias("stopword_ratio"),
        quality_flags("text").alias("keep"),
    ).filter(F.col("mean_token_len").isNotNull())


@query(
    "text_langid",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents),
    scores AS (
      SELECT doc_id,
        len(list_filter(ws, w -> list_contains(['the','and','of','to','in','is','that','with','for','was'], w))) AS s_en,
        len(list_filter(ws, w -> list_contains(['der','die','das','und','ist','nicht','ein','mit','sich','auf'], w))) AS s_de,
        len(list_filter(ws, w -> list_contains(['le','la','les','et','est','une','dans','que','pour','pas'], w))) AS s_fr,
        len(list_filter(ws, w -> list_contains(['el','los','las','es','una','en','por','con','para','como'], w))) AS s_es
      FROM toks)
    SELECT doc_id,
      CASE WHEN s_en > 0 AND s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
           WHEN s_de > 0 AND s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
           WHEN s_fr > 0 AND s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
           WHEN s_es > 0 AND s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
           ELSE 'und' END AS lang_pred
    FROM scores
    """,
)
def text_langid(spark, sf_dir):
    """N-gram/stopword-profile language ID heuristic."""
    from .functions.text import lang_id

    (documents,) = _t(spark, sf_dir, "documents")
    return documents.select("doc_id", lang_id("text").alias("lang_pred"))


@query(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
             list_filter(string_split(text, ' '), w -> w <> ''))), ' ')) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprinting (sorted distinct token set -> md5)."""
    from .functions.text import doc_fingerprint

    (documents,) = _t(spark, sf_dir, "documents")
    return documents.select("doc_id", doc_fingerprint("text").alias("fp"))


# Battery extension (relational matrix, scalar functions, streaming,
# multimodal, interop) registers itself into QUERIES/ORACLES on import.
from . import queries_ext  # noqa: E402,F401  (registration side effect)
