"""Battery extension: scale-layout sources and the analytical query
shapes a 100 TB deployment leans on.

* **Partitioned table layout** — hive-style ``col=value/`` directories
  written by ``sources/io.py::write_partitioned``; the pruning entry's
  plan is asserted in tests/test_plans.py (PartitionFilters present,
  excluded directories never opened).
* **ORC round trip** — the remaining self-describing columnar format.
* **Statistical aggregates** — corr/covariance/stddev/regression, all
  single-pass JVM aggregates.
* **TPC-H-shaped analytics** (Q6/Q10/Q14/Q19 adapted to the synthetic
  schema) — the selective-scan, top-k-join, conditional-ratio and
  OR-of-ANDs pushdown patterns.

Same determinism conventions as queries.py (shared aliases, rounded
floats, stable tiebreaks, timestamps as strings).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from .queries import _t, query
from .queries_ext import _sink_name


def _cc_close_sql(k_rounds=12):
    """Non-recursive connected-components closure: given an
    already-defined CTE ``pairs(id_a, id_b)``, emit the CTEs that close
    it into components by ``k_rounds`` unrolled rounds of min-label
    propagation WITH pointer jumping, plus ONE extra canary round.
    Recursive CTEs are banned from oracles (driver-box DuckDB recursion
    semantics drifted across versions, round-3 red); a fixed unroll
    uses only joins + GROUP BY.

    Each round relaxes over edges (1-hop label spread) AND inherits the
    label of the current label-node (pointer jump — labels are node
    ids, so ``l(v) := min(l(v), l(l(v)))``).  Hook+jump halves label
    distances per round, so 12 rounds close components of diameter in
    the thousands — this matters for chain-shaped near-dup graphs
    (e.g. ``media_dedup_components``: sequentially-offset motifs form
    long Hamming chains), where pure 1-hop propagation would need a
    round per hop.  The fixpoint (every node labeled with its
    component's min id) is identical to plain propagation, so adding
    the jump changed no converged oracle's output.  ``bad`` counts
    labels still moving after round ``k_rounds`` — the caller appends
    a poison row when ``n > 0`` so an under-unrolled oracle flips the
    gate loudly instead of silently mislabeling.  MATERIALIZED is
    load-bearing: each round references the previous several times,
    and inlining would grow the plan exponentially (2^13 leaf scans
    blew the driver-box fd limit)."""
    rounds = []
    prev = "l0"
    for i in range(1, k_rounds + 2):
        rounds.append(
            f"""
    l{i} AS MATERIALIZED (
      SELECT node, min(lbl) AS lbl FROM (
        SELECT e.a AS node, least(la.lbl, lb.lbl) AS lbl
        FROM edges e JOIN {prev} la ON la.node = e.a
                     JOIN {prev} lb ON lb.node = e.b
        UNION ALL
        SELECT x.node, y.lbl FROM {prev} x JOIN {prev} y ON y.node = x.lbl
      ) relax GROUP BY node),"""
        )
        prev = f"l{i}"
    return (
        """
    edges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    l0 AS MATERIALIZED (
      SELECT a AS node, a AS lbl FROM (SELECT DISTINCT a FROM edges) t),"""
        + "".join(rounds)
        + f"""
    comp AS (SELECT node, lbl AS comp FROM l{k_rounds}),
    bad AS (SELECT count(*) AS n FROM l{k_rounds} x
            JOIN l{k_rounds + 1} y ON x.node = y.node AND x.lbl <> y.lbl)"""
    )


def _cc_oracle_ctes(k_rounds=12):
    """Shingle-pipeline connected-components oracle prefix: n-gram
    Jaccard pairs (same semantics as the Spark side) fed into the
    shared non-recursive closure (``_cc_close_sql``)."""
    return (
        """
    WITH
    tok AS (
      SELECT doc_id AS __id,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents),
    sh AS (
      SELECT __id, unnest(list_distinct(
               [list_aggregate(tk[i:i+2], 'string_agg', ' ')
                FOR i IN range(1, len(tk) - 1)])) AS s
      FROM tok WHERE len(tk) >= 3),
    sizes AS (SELECT __id, count(*) AS n FROM sh GROUP BY __id),
    inter AS (
      SELECT a.__id AS id_a, b.__id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.__id < b.__id
      GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.__id = id_a JOIN sizes sb ON sb.__id = id_b
      WHERE i * 10 >= (sa.n + sb.n - i) * 6),"""
        + _cc_close_sql(k_rounds)
    )


@query(
    "source_partitioned_pruning",
    """
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders WHERE o_orderpriority = '1-URGENT'
    GROUP BY month
    """,
)
def source_partitioned_pruning(spark, sf_dir):
    """Write orders as a hive-partitioned table (partitioned by
    priority), then answer a one-priority query: planning-time partition
    pruning reads 1/5th of the data without opening excluded files."""
    from .sources.io import write_partitioned

    (orders,) = _t(spark, sf_dir, "orders")
    path = os.path.join(tempfile.gettempdir(), _sink_name("orders_part"))
    write_partitioned(orders, path, ["o_orderpriority"])
    part = spark.read.parquet(path).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return part.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@query(
    "source_orc_roundtrip",
    """
    SELECT p_brand, count(*) AS n_parts,
           round(sum(p_retailprice), 2) AS sum_price
    FROM part GROUP BY p_brand
    """,
)
def source_orc_roundtrip(spark, sf_dir):
    """ORC sink+source round trip (self-describing, like parquet)."""
    from .sources.io import roundtrip

    (part,) = _t(spark, sf_dir, "part")
    path = os.path.join(tempfile.gettempdir(), _sink_name("orc_rt"))
    part2 = roundtrip(part, path, "orc")
    return part2.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum("p_retailprice"), 2).alias("sum_price"),
    )


@query(
    "stats_functions_lineitem",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
           round(stddev_samp(l_quantity), 4) AS qty_stddev,
           round(var_pop(l_discount), 6) AS disc_var,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS price_per_qty,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS price_base
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stats_functions_lineitem(spark, sf_dir):
    """Statistical aggregate library: correlation, covariance, variance
    and least-squares regression — one pass, partial+final mergeable
    moments (the same reaggregation property as the sketches)."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "qty_price_covar"
        ),
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        F.round(F.var_pop("l_discount"), 6).alias("disc_var"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias(
            "price_per_qty"
        ),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
            "price_base"
        ),
    )


@query(
    "q6_selective_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_selective_revenue(spark, sf_dir):
    """TPC-H Q6: a highly selective scan-aggregate — every predicate
    pushes to the parquet scan (asserted in tests/test_plans.py); the
    canonical 'filter early, read little' pattern."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


@query(
    "q14_promo_revenue_ratio",
    """
    SELECT round(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue_ratio(spark, sf_dir):
    """TPC-H Q14: conditional-ratio aggregate over a broadcast join
    (part is the small dimension — at any SF it stays broadcastable
    relative to lineitem)."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    ).join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
            / F.sum(disc),
            4,
        ).alias("promo_pct")
    )


@query(
    "q19_or_of_ands_revenue",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_or_of_ands_revenue(spark, sf_dir):
    """TPC-H Q19: disjunction of conjunctive predicates across both join
    sides — Catalyst splits the single-side conjuncts out of the OR and
    pushes them below the join, the rest evaluates post-join."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    joined = lineitem.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#20")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return joined.filter(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q10_returned_revenue_customers",
    """
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue_customers(spark, sf_dir):
    """TPC-H Q10: top-20 customers by returned-item revenue — fact-fact
    join shuffled on the join key, dimensions broadcast, stable top-k
    tiebreak."""
    customer, nation, orders, lineitem = _t(
        spark, sf_dir, "customer", "nation", "orders", "lineitem"
    )
    returned = lineitem.filter(F.col("l_returnflag") == "R")
    joined = (
        returned.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "stream_stream_interval_join",
    """
    SELECT p.user_id, count(*) AS n_pairs
    FROM events p JOIN events c
      ON c.user_id = p.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    GROUP BY p.user_id
    """,
)
def stream_stream_interval_join(spark, sf_dir):
    """Stream-stream interval join (clicks within the hour before each
    purchase), watermarked on both sides so join state expires; the
    availableNow replay must equal the batch interval join."""
    from .streaming import interval_join, read_events_stream, run_to_memory

    stream = read_events_stream(spark, sf_dir)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    pairs = run_to_memory(
        interval_join(clicks, purchases),
        _sink_name("ssjoin"),
        output_mode="append",
        state_partitions=8,
        # INNER stream-stream join: matches emit in their data batch;
        # the trailing no-data batch only expires state (see
        # run_to_memory).  The LEFT_OUTER twin keeps the default —
        # its null rows emit on watermark advance.
        nodata_batches=False,
    )
    return pairs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))


@query(
    "source_python_datasource",
    """
    WITH synth AS (
      SELECT i AS event_id,
             (i * 2654435761) % 500 AS user_id,
             ['click','view','purchase','signup','error'][1 + (i * 40503) % 5]
               AS event_type,
             ((i * 37) % 1000) / 10.0 AS value
      FROM generate_series(0, 19999) t(i))
    SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS users,
           round(sum(value), 2) AS sum_value
    FROM synth GROUP BY event_type
    """,
)
def source_python_datasource(spark, sf_dir):
    """Custom Python data source (Spark 4 DataSource API): a partitioned
    deterministic generator planned like any other scan; the closed-form
    row formula is reproduced exactly by the DuckDB oracle."""
    return _python_datasource_agg(spark)


@query(
    "source_python_stream_datasource",
    """
    WITH synth AS (
      SELECT i AS event_id,
             (i * 2654435761) % 200 AS user_id,
             ['click','view','purchase','signup','error'][1 + (i * 40503) % 5]
               AS event_type,
             ((i * 37) % 1000) / 10.0 AS value
      FROM generate_series(0, 4999) t(i))
    SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS users,
           round(sum(value), 2) AS sum_value
    FROM synth GROUP BY event_type
    """,
)
def source_python_stream_datasource(spark, sf_dir):
    """STREAMING Python data source (Spark 4 SimpleDataSourceStreamReader):
    the same closed-form generator emitted as 1000-row micro-batches,
    drained through a memory sink (5 batches; offsets are row indices,
    so recovery replay is exact), then aggregated and held to the
    identical DuckDB closed form as the batch entry."""
    import time

    from .queries_ext import _sink_name
    from .sources import pyds

    pyds.register(spark)
    stream = (
        spark.readStream.format("synth_events")
        .option("n", 5000)
        .option("n_users", 200)
        .option("batchsize", 1000)
        .load()
    )
    sink = _sink_name("pyds_stream")
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            # driver-side progress poll: a batch's numInputRows is
            # reported only after the batch COMMITS (memory sink
            # written), so >= 5000 here implies the sink holds all
            # rows — unlike the old spark.table(sink).count() poll,
            # this runs no Spark job per probe (the source caps at n,
            # so there is no 6th batch to race with q.stop())
            if sum(p.numInputRows for p in q.recentProgress) >= 5000:
                break
            time.sleep(0.05)
    finally:
        q.stop()
    return (
        spark.table(sink)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def _python_datasource_agg(spark):
    from .sources import pyds

    pyds.register(spark)
    synth = (
        spark.read.format("synth_events")
        .option("n", 20000)
        .option("n_users", 500)
        .option("numPartitions", 4)
        .load()
    )
    return synth.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("users"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "udtf_tokenize_documents",
    """
    WITH per_doc AS (
      SELECT doc_id, source,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    exploded AS (SELECT source, unnest(toks) AS token FROM per_doc)
    SELECT e.source, count(*) AS n_tokens,
           count(DISTINCT token) AS distinct_tokens,
           m.max_pos
    FROM exploded e
    JOIN (SELECT source, max(len(toks) - 1) AS max_pos
          FROM per_doc WHERE len(toks) > 0 GROUP BY source) m
      ON e.source = m.source
    GROUP BY e.source, m.max_pos
    """,
)
def udtf_tokenize_documents(spark, sf_dir):
    """Python UDTF in the FROM clause via LATERAL: per-row 1→N token
    expansion at the SQL level (the Python-native table-function
    surface; bulk tokenization stays JVM-side in functions/text.py)."""
    from .functions import udtfs
    from .queries_ext import _sink_name

    (documents,) = _t(spark, sf_dir, "documents")
    udtfs.register(spark)
    view = _sink_name("docs_udtf")
    documents.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT d.source, count(*) AS n_tokens,
               count(DISTINCT t.token) AS distinct_tokens,
               max(t.pos) AS max_pos
        FROM {view} d, LATERAL tokenize_udtf(d.text) t
        GROUP BY d.source
        """
    )


@query(
    "window_analytic_functions",
    """
    SELECT o_custkey, o_orderkey,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 4) AS pct_rank,
           round(cume_dist() OVER w, 4) AS cdist,
           lead(o_orderkey, 1) OVER w AS next_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_analytic_functions(spark, sf_dir):
    """The analytic window-function set (ntile, percent_rank, cume_dist,
    lead) over a deterministic total order per customer."""
    from pyspark.sql import Window

    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cdist"),
        F.lead("o_orderkey", 1).over(w).alias("next_order"),
    )


@query(
    "skew_salted_join_priority_revenue",
    """
    SELECT o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def skew_salted_join_priority_revenue(spark, sf_dir):
    """Skew-mitigated fact-fact join: the shuffle key is salted 8 ways
    (operators/skew.py), spreading any hot order key across reducers;
    result is identical to the plain equi-join oracle."""
    from .operators.skew import salted_join

    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    joined = salted_join(
        lineitem,
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        on="l_orderkey",
        salt=8,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "bucketed_colocated_join",
    """
    SELECT o_orderpriority, count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def bucketed_colocated_join(spark, sf_dir):
    """Bucketed-table join: both facts written bucketed+sorted on the
    join key, so the join and downstream aggregation plan with zero
    shuffle of fact rows (the write amortized it) — the 100 TB layout
    for repeated fact-fact joins.  Broadcast is disabled for the query
    to exercise the co-located sort-merge path the layout exists for."""
    from .queries_ext import _sink_name
    from .sources.bucketing import read_bucketed, write_bucketed

    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    t_li, t_od = _sink_name("b_li"), _sink_name("b_od")
    write_bucketed(
        lineitem.select("l_orderkey", "l_quantity"), t_li, "l_orderkey", 8
    )
    write_bucketed(
        orders.select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
        ),
        t_od,
        "l_orderkey",
        8,
    )
    # MERGE hint (not a session conf toggle — a conf set here would be
    # restored before the lazy plan executes): forces the sort-merge
    # path, which the bucketed+sorted layout serves with zero exchange
    # and zero sort
    joined = read_bucketed(spark, t_li).hint("merge").join(
        read_bucketed(spark, t_od), "l_orderkey"
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "variant_json_events",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k
    FROM events GROUP BY event_type
    """,
)
def variant_json_events(spark, sf_dir):
    """Spark 4 VARIANT columns: parse the JSON props once into the
    shredded binary variant encoding, then typed variant_get paths —
    the scale answer to schema-on-read JSON (parse once, project many
    times without re-parsing text)."""
    (events,) = _t(spark, sf_dir, "events")
    v = events.select(
        "event_type", F.parse_json("props").alias("pv")
    ).select(
        "event_type", F.variant_get("pv", "$.k", "bigint").alias("k")
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
    )


@query(
    "unpivot_pricing_metrics",
    """
    WITH wide AS (
      SELECT l_returnflag,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_price,
             round(avg(l_discount), 4) AS avg_disc
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, metric, value FROM (
      SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
      UNION ALL
      SELECT l_returnflag, 'sum_price', sum_price FROM wide
      UNION ALL
      SELECT l_returnflag, 'avg_disc', avg_disc FROM wide) t
    """,
)
def unpivot_pricing_metrics(spark, sf_dir):
    """Unpivot (wide->long): the inverse of pivot_revenue_by_flag,
    melting three metric columns into (metric, value) rows."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    wide = lineitem.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "avg_disc"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "listagg_statuses",
    """
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
             AS statuses,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def listagg_statuses(spark, sf_dir):
    """Ordered string aggregation (SQL:2023 LISTAGG ... WITHIN GROUP),
    deterministic via the mandated element order."""
    from .queries_ext import _sink_name

    (orders,) = _t(spark, sf_dir, "orders")
    view = _sink_name("orders_la")
    orders.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT o_orderpriority,
               listagg(DISTINCT o_orderstatus, ',')
                 WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
               count(*) AS n
        FROM {view} GROUP BY o_orderpriority
        """
    )


@query(
    "stream_incremental_sketch_store",
    """
    SELECT event_type, count(DISTINCT user_id) AS approx_users
    FROM events GROUP BY event_type
    """,
)
def stream_incremental_sketch_store(spark, sf_dir):
    """Streaming sketch maintenance end to end: replay events through
    foreachBatch into a persistent theta-sketch store (parquet), then
    answer the distinct-user question from the STORE ALONE — raw events
    are never rescanned.  Exact at gate scale (theta exact mode)."""
    from .queries_ext import _sink_name
    from .functions import sketches as S
    from .streaming import incremental_sketch_store, read_events_stream

    store = os.path.join(
        tempfile.gettempdir(), _sink_name("sketch_store")
    )
    stream = read_events_stream(spark, sf_dir)
    incremental_sketch_store(stream, store, ["event_type"], "user_id", 16)
    persisted = spark.read.parquet(store)
    return persisted.groupBy("event_type").agg(
        S.theta_cardinality(S.theta_merge("sketch", 16)).alias("approx_users")
    )


@query(
    "media_audio_features",
    """
    WITH s AS (
      SELECT d.doc_id,
             CAST((d.doc_id * 2654435761 + i * 40503) % 65536 - 32768
                  AS DOUBLE) AS samp
      FROM documents d, generate_series(0, 999) t(i)
      WHERE d.doc_id < 200)
    SELECT doc_id, 16000 AS sample_rate, count(*) AS n_samples,
           round(sqrt(avg(samp * samp)), 2) AS rms,
           CAST(max(abs(samp)) AS INTEGER) AS peak
    FROM s GROUP BY doc_id
    """,
)
def media_audio_features(spark, sf_dir):
    """Audio modality end to end: synthesize WAV/PCM16 clips (binary
    column), sniff the container JVM-side, then a REAL decode — PCM
    needs no codec library — with vectorized per-clip stats in
    mapInPandas.  The closed-form samples give an exact SQL oracle."""
    from .multimodal import audio_features, sniff_mime, synth_wav_udf

    (documents,) = _t(spark, sf_dir, "documents")
    clips = (
        documents.filter(F.col("doc_id") < 200)
        .repartition(8, "doc_id")
        .select("doc_id", synth_wav_udf()(F.col("doc_id")).alias("wav"))
    )
    # JVM-side header sniff gates the Python decode to actual WAV rows
    clips = clips.filter(sniff_mime("wav") == "audio/wav")
    return audio_features(clips, "wav", "doc_id")


@query(
    "q18_large_volume_orders",
    """
    SELECT c_name, o_orderkey, round(o_totalprice, 2) AS totalprice,
           round(sum(l_quantity), 2) AS order_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 220)
    GROUP BY c_name, o_orderkey, o_totalprice
    ORDER BY totalprice DESC, o_orderkey LIMIT 50
    """,
)
def q18_large_volume_orders(spark, sf_dir):
    """TPC-H Q18: IN-subquery with HAVING — planned as an aggregate
    feeding a left-semi join on the fact key, then the enrichment
    joins; stable top-k tiebreak."""
    customer, orders, lineitem = _t(
        spark, sf_dir, "customer", "orders", "lineitem"
    )
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 220)
        .select("l_orderkey")
    )
    li = lineitem.join(big, "l_orderkey", "left_semi")
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).join(
        F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        joined.groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("order_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "order_qty",
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(50)
    )


@query(
    "q22_dormant_high_balance",
    """
    SELECT CAST(c_nationkey % 10 AS BIGINT) AS cntry,
           count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                       WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY cntry
    """,
)
def q22_dormant_high_balance(spark, sf_dir):
    """TPC-H Q22 shape: scalar subquery (broadcast single-row cross
    join) + anti join against recent orders — above-average-balance
    customers with no orders this millennium."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    rich = customer.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    dormant = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return dormant.groupBy(
        (F.col("c_nationkey") % 10).cast("bigint").alias("cntry")
    ).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


@query(
    "map_functions_events",
    """
    SELECT event_type,
           count(*) AS n_with_k,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT) * 2)
                AS BIGINT) AS sum_k_doubled,
           count(DISTINCT 'k') AS n_distinct_keys
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
)
def map_functions_events(spark, sf_dir):
    """Map-typed columns and their function library: parse props into
    map<string,bigint>, then map_contains_key / transform_values /
    element_at / map_keys — all codegen'd collection expressions."""
    (events,) = _t(spark, sf_dir, "events")
    m = events.select(
        "event_type",
        F.from_json("props", "map<string,bigint>").alias("m"),
    ).filter(F.map_contains_key("m", "k"))
    doubled = m.select(
        "event_type",
        F.transform_values("m", lambda k, v: v * 2).alias("m2"),
        F.map_keys("m").alias("ks"),
    )
    return doubled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_with_k"),
        F.sum(F.element_at("m2", "k")).alias("sum_k_doubled"),
        F.size(F.array_distinct(F.flatten(F.collect_list("ks")))).cast(
            "bigint"
        ).alias("n_distinct_keys"),
    )


@query(
    "dedup_cluster_components",
    _cc_oracle_ctes()
    + """
    SELECT comp, count(*) AS n_members, min(node) AS min_doc,
           max(node) AS max_doc
    FROM comp GROUP BY comp
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
    FROM bad WHERE n > 0
    """,
)
def dedup_cluster_components(spark, sf_dir):
    """Dedup pairs -> dedup CLUSTERS: n-gram Jaccard pairs closed into
    connected components (operators/graph.py, min-label propagation
    with checkpointed lineage), so chained duplicates A~B~C collapse to
    one canonical id even when A~C never matched directly.  Oracle:
    unrolled min-label propagation (``_cc_oracle_ctes``) reaches the
    same fixpoint without recursive CTEs."""
    from .operators.graph import connected_components
    from .queries import _ngram_pairs_cached

    pairs = _ngram_pairs_cached(spark, sf_dir)
    comps = connected_components(pairs, "id_a", "id_b")
    return comps.groupBy("comp").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("min_doc"),
        F.max("node").alias("max_doc"),
    )


@query(
    "source_compaction_roundtrip",
    """
    SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def source_compaction_roundtrip(spark, sf_dir):
    """Small-file compaction: fragment lineitem into 64 tiny files,
    compact to byte-sized outputs (sources/io.py::compact_table,
    staged rewrite + atomic swap), and prove the data identical via
    the aggregate oracle."""
    from .queries_ext import _sink_name
    from .sources.io import compact_table

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    path = os.path.join(tempfile.gettempdir(), _sink_name("compact"))
    lineitem.repartition(64).write.mode("overwrite").parquet(path)
    compact_table(spark, path, target_file_bytes=32 * 1024 * 1024)
    back = spark.read.parquet(path)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "curate_canonical_docs",
    _cc_oracle_ctes()
    + """,
    dropped AS (SELECT node FROM comp WHERE node <> comp)
    SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM documents WHERE doc_id NOT IN (SELECT node FROM dropped)
    GROUP BY lang
    UNION ALL
    SELECT 'UNCONVERGED_ORACLE', CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
    FROM bad WHERE n > 0
    """,
)
def curate_canonical_docs(spark, sf_dir):
    """Cluster-aware dedup end to end: near-dup pairs -> connected
    components -> keep only each cluster's canonical (minimum-id)
    document -> corpus stats over the survivors.  This is the shape a
    production curation job ships: transitive duplicates drop even when
    the endpoints never matched pairwise.  Oracle: non-recursive
    unrolled propagation (``_cc_oracle_ctes``)."""
    from .operators.graph import connected_components
    from .queries import _ngram_pairs_cached

    (documents,) = _t(spark, sf_dir, "documents")
    pairs = _ngram_pairs_cached(spark, sf_dir)
    comps = connected_components(pairs, "id_a", "id_b")
    dropped = comps.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias("doc_id")
    )
    survivors = documents.join(F.broadcast(dropped), "doc_id", "left_anti")
    return survivors.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )


@query(
    "stream_static_enrichment",
    """
    SELECT c_mktsegment, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c_mktsegment
    """,
)
def stream_static_enrichment(spark, sf_dir):
    """Stream-static join: the streaming-enrichment op class — each
    micro-batch joins against a (broadcast) static dimension with no
    streaming state at all, the standard shape for attaching dimension
    attributes to events at ingest."""
    from .queries_ext import _sink_name
    from .streaming import read_events_stream, run_to_memory

    customer = _t(spark, sf_dir, "customer")[0]
    stream = read_events_stream(spark, sf_dir)
    enriched = stream.join(
        F.broadcast(customer),
        stream.user_id == customer.c_custkey,
    ).select("user_id", "c_mktsegment")
    rows = run_to_memory(
        enriched, _sink_name("enrich"), output_mode="append",
        # stateless stream-static join (see run_to_memory)
        state_partitions=8, nodata_batches=False,
    )
    return rows.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "timeseries_gap_fill",
    """
    WITH bounds AS (
      SELECT min(date_trunc('day', ts)) AS lo, max(date_trunc('day', ts)) AS hi
      FROM events),
    cal AS (
      SELECT t.day FROM bounds,
             LATERAL (SELECT unnest(generate_series(bounds.lo, bounds.hi,
                                    INTERVAL 1 DAY)) AS day) t),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT day, event_type FROM cal CROSS JOIN types),
    actual AS (
      SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT strftime(g.day, '%Y-%m-%d') AS day, g.event_type,
           COALESCE(a.n, 0) AS n
    FROM grid g LEFT JOIN actual a
      ON a.day = g.day AND a.event_type = g.event_type
    """,
)
def timeseries_gap_fill(spark, sf_dir):
    """Calendar gap filling: build the dense (day x type) grid with
    sequence+explode (no driver loop, no UDF), left-join the actual
    counts, zero-fill the holes — the canonical time-series
    densification before windowed models."""
    (events,) = _t(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    cal = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    types = events.select("event_type").distinct()
    grid = cal.crossJoin(F.broadcast(types))
    actual = events.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        grid.join(actual, ["day", "event_type"], "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


@query(
    "histogram_order_totals",
    """
    SELECT LEAST(GREATEST(CAST(floor(o_totalprice / 50000) AS BIGINT) + 1,
                          0), 13) AS bucket,
           count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders GROUP BY bucket
    """,
)
def histogram_order_totals(spark, sf_dir):
    """Equi-width histogram via width_bucket — the one-pass
    distribution profile (bucket, count, observed range)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(12)).alias(
            "bucket"
        )
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@query(
    "regexp_functions_documents",
    """
    SELECT source,
           CAST(sum(len(regexp_extract_all(text, '[0-9]+'))) AS BIGINT)
             AS n_numbers,
           count(CASE WHEN regexp_matches(text, '^[A-Z]') THEN 1 END)
             AS n_upper_start,
           CAST(sum(len(regexp_extract_all(text, '[a-z]+ing '))) AS BIGINT)
             AS n_ing_words
    FROM documents GROUP BY source
    """,
)
def regexp_functions_documents(spark, sf_dir):
    """The regexp function family (extract_all, match-test) over the
    corpus — patterns restricted to the syntax both engines share."""
    (documents,) = _t(spark, sf_dir, "documents")
    return documents.groupBy("source").agg(
        F.sum(F.size(F.regexp_extract_all("text", F.lit("[0-9]+"))))
        .cast("bigint")
        .alias("n_numbers"),
        F.count(F.when(F.col("text").rlike("^[A-Z]"), 1)).alias(
            "n_upper_start"
        ),
        F.sum(F.size(F.regexp_extract_all("text", F.lit("[a-z]+ing "))))
        .cast("bigint")
        .alias("n_ing_words"),
    )


@query(
    "asof_forward_next_error",
    """
    WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    nxt AS (
      SELECT p.user_id, p.ts,
             (SELECT min(e.ts) FROM events e
              WHERE e.user_id = p.user_id AND e.event_type = 'error'
                AND e.ts >= p.ts) AS err_ts
      FROM p)
    SELECT user_id, count(*) AS n_purchases,
           count(CASE WHEN err_ts IS NOT NULL
                       AND err_ts <= ts + INTERVAL 1 HOUR THEN 1 END)
             AS n_error_within_hour
    FROM nxt GROUP BY user_id
    """,
)
def asof_forward_next_error(spark, sf_dir):
    """Forward as-of join with tolerance: for every purchase, the next
    error by the same user within one hour — same one-shuffle
    union+window plan as the backward variant, time reversed."""
    from .operators.temporal import as_of_join

    (events,) = _t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("err_ts")
    )
    joined = as_of_join(
        purchases,
        errors,
        on="user_id",
        left_ts="ts",
        right_ts="err_ts",
        right_cols=["err_ts"],
        direction="forward",
        tolerance=F.expr("INTERVAL 1 HOUR"),
    )
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count("err_ts").alias("n_error_within_hour"),
    )


@query(
    "text_subword_token_stats",
    """
    WITH t AS (
      SELECT lang,
             len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+'))
               AS n_sub,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_ws
      FROM documents)
    SELECT lang, CAST(sum(n_sub) AS BIGINT) AS subword_tokens,
           CAST(sum(n_ws) AS BIGINT) AS ws_tokens,
           round(sum(n_sub) * 1.0 / sum(n_ws), 4) AS expansion
    FROM t GROUP BY lang
    """,
)
def text_subword_token_stats(spark, sf_dir):
    """Token budgets under BPE-ish pretokenization vs whitespace — the
    expansion factor is what turns corpus bytes into training-token
    estimates (functions/text.py::subword_token_count)."""
    from .functions.text import subword_token_count, token_count

    (documents,) = _t(spark, sf_dir, "documents")
    per_doc = documents.select(
        "lang",
        subword_token_count("text").alias("n_sub"),
        token_count("text").alias("n_ws"),
    )
    return per_doc.groupBy("lang").agg(
        F.sum("n_sub").cast("bigint").alias("subword_tokens"),
        F.sum("n_ws").cast("bigint").alias("ws_tokens"),
        F.round(F.sum("n_sub") * 1.0 / F.sum("n_ws"), 4).alias("expansion"),
    )


# ---------------------------------------------------------------------------
# Training-data prep: chunking, deterministic mixing, decontamination
# ---------------------------------------------------------------------------


@query(
    "prep_chunk_documents",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents),
    chunks AS (
      SELECT doc_id, u.s AS start,
             (u.s - 1) // 112 AS chunk_idx, ws
      FROM toks, UNNEST([s for s in range(1, len(ws) + 1, 112)]) AS u(s)
      WHERE len(ws) >= 1)
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           array_to_string(list_slice(ws, start, start + 127), ' ') AS chunk_text,
           CAST(least(128, len(ws) - start + 1) AS INTEGER) AS n_tokens
    FROM chunks
    """,
)
def prep_chunk_documents(spark, sf_dir):
    """Token-bounded chunking with overlap (128-token chunks, 16-token
    overlap -> stride 112): one codegen'd slice per chunk, one row per
    chunk via posexplode; the oracle replays the slicing value-for-value
    (operators/prep.py::chunk_documents)."""
    from .operators.prep import chunk_documents

    (documents,) = _t(spark, sf_dir, "documents")
    return chunk_documents(documents, "doc_id", "text", max_tokens=128, overlap=16)


@query(
    "prep_weighted_sample",
    """
    WITH thr AS (
      SELECT doc_id, lang, len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens,
             CASE lang WHEN 'en' THEN 'b3333333' WHEN 'de' THEN '80000000'
                       WHEN 'fr' THEN '40000000' ELSE '0ccccccd' END AS threshold
      FROM documents)
    SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM thr
    WHERE substr(md5('mix-v1:' || CAST(doc_id AS VARCHAR)), 1, 8) < threshold
    GROUP BY lang
    """,
)
def prep_weighted_sample(spark, sf_dir):
    """Deterministic per-language Bernoulli mix (en 70%, de 50%,
    fr 25%, rest 5%) via an md5 hex threshold — the SAME rows are drawn
    by any engine with md5, which is what makes a training mix
    reproducible and auditable; the oracle re-draws the sample in
    DuckDB and must agree on every stratum's doc and token counts
    (operators/prep.py::weighted_sample)."""
    from .functions.text import token_count
    from .operators.prep import weighted_sample

    (documents,) = _t(spark, sf_dir, "documents")
    sampled = weighted_sample(
        documents,
        "lang",
        "doc_id",
        {"en": 0.7, "de": 0.5, "fr": 0.25},
        default_fraction=0.05,
        salt="mix-v1",
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).cast("bigint").alias("n_tokens"),
    )


@query(
    "prep_decontaminate",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                     for i in range(1, len(ws) - 1)]) AS s
      FROM toks WHERE len(ws) >= 3),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 10),
    contaminated AS (
      SELECT DISTINCT sh.doc_id FROM sh JOIN bench USING (s))
    SELECT count(*) AS n_clean, CAST(sum(len(ws)) AS BIGINT) AS clean_tokens
    FROM toks
    WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
)
def prep_decontaminate(spark, sf_dir):
    """Benchmark-leakage guard: drop every document sharing a word
    trigram with the 'benchmark' set (docs 0-9 stand in for an eval
    suite); one shingle semi-join, documents never shuffle
    (operators/prep.py::decontaminate)."""
    from .functions.text import token_count
    from .operators.prep import decontaminate

    (documents,) = _t(spark, sf_dir, "documents")
    bench = documents.filter(F.col("doc_id") < 10)
    clean = decontaminate(documents, bench, "doc_id", "text", n=3)
    return clean.agg(
        F.count(F.lit(1)).alias("n_clean"),
        F.sum(token_count("text")).cast("bigint").alias("clean_tokens"),
    )


@query(
    "prep_pii_scrub",
    """
    WITH injected AS (
      SELECT doc_id, lang,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com ip 10.1.2.3 call 415-555-2671 ssn 123-45-6789'
               AS t
      FROM documents)
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
             '\\b(?:\\+?\\d{1,3}[-. ])?\\(?\\d{3}\\)?[-. ]\\d{3}[-. ]\\d{4}\\b', '<PHONE>', 'g'),
             '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g')) AS scrubbed_md5
    FROM injected
    """,
)
def prep_pii_scrub(spark, sf_dir):
    """PII redaction (emails/IPs/phones/SSNs) as chained codegen'd
    regexp_replace; deterministic PII is injected per document and the
    oracle re-runs the SAME RE2-safe patterns in DuckDB, comparing
    md5(scrubbed text) per row — engine-for-engine rewrite parity
    (operators/prep.py::scrub_pii)."""
    from .operators.prep import scrub_pii

    (documents,) = _t(spark, sf_dir, "documents")
    injected = documents.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ip 10.1.2.3 call 415-555-2671 ssn 123-45-6789"),
        ).alias("t"),
    )
    return injected.select("doc_id", F.md5(scrub_pii("t")).alias("scrubbed_md5"))


@query(
    "prep_training_order",
    """
    SELECT CAST(row_number() OVER (
             ORDER BY md5('order-v1:' || CAST(doc_id AS VARCHAR)), doc_id
           ) - 1 AS BIGINT) AS position,
           doc_id
    FROM documents
    """,
)
def prep_training_order(spark, sf_dir):
    """Reproducible global training order: position = rank of a salted
    md5 over the doc id — the oracle independently derives the
    byte-identical permutation, proving epoch shuffles are portable
    across engines with zero RNG state
    (operators/prep.py::training_order)."""
    from .operators.prep import training_order

    (documents,) = _t(spark, sf_dir, "documents")
    return training_order(documents, "doc_id", salt="order-v1").select(
        F.col("position").cast("bigint").alias("position"), "doc_id"
    )


# The remaining TPC-H query shapes (Q2/Q4/Q7/Q8/Q9/Q11/Q12/Q13/Q15/
# Q16/Q20/Q21 adapted to the synthetic schema) register on import.
from . import queries_tpch2  # noqa: E402,F401  (registration side effect)

# Trainer-facing prep (packing, splits, repetition) + lexical ranking.
from . import queries_prep  # noqa: E402,F401  (registration side effect)


def _pagerank_oracle(iters: int = 5) -> str:
    """Unrolled fixed-iteration PageRank CTE chain — identical
    recurrence to operators/graph.py::pagerank (no recursive-CTE
    semantics to second-guess; constants cast to DOUBLE so both
    engines run the same IEEE arithmetic)."""
    its = []
    for k in range(1, iters + 1):
        its.append(f"""
    it{k} AS (
      SELECT n2.node,
             (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
               + CAST(0.85 AS DOUBLE) * coalesce(s.contrib, 0) AS r
      FROM nodes n2 CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS node, sum(p.r / o.outdeg) AS contrib
        FROM edges e
        JOIN it{k - 1} p ON p.node = e.src
        JOIN outdeg o ON o.node = e.src
        GROUP BY e.dst) s ON s.node = n2.node
    )""")
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    outdeg AS (SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY src),
    nn AS (SELECT count(*) AS n FROM nodes),
    it0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS r FROM nodes CROSS JOIN nn),
    {",".join(its)}
    SELECT node, round(r, 6) AS rank
    FROM it{iters}
    ORDER BY round(r, 6) DESC, node
    LIMIT 20
    """


@query("graph_pagerank_topk", _pagerank_oracle(5))
def graph_pagerank_topk(spark, sf_dir):
    """PageRank over the customer<->supplier trade graph (both
    directions of every distinct trading pair), 5 fixed rounds — the
    iterative-analytics twin of connected components.  Top-20 hubs by
    6dp-rounded rank."""
    from .operators.graph import pagerank

    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    # fact-fact join: keep it a sort-merge (both sides scale with the
    # corpus; a broadcast hint here would be a 100 TB OOM), but project
    # both sides to join columns only so the shuffle carries 2 ints
    pairs = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("c"),
            (F.col("l_suppkey") + 1000000).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
    # checkpoint_interval = iters: all 5 rounds optimize as ONE lazy
    # job (no mid-run materialization) — ~2s off the entry at sf0.1;
    # plan depth at 5 rounds is far below the optimizer-blowup regime
    # the default interval of 4 guards longer runs against
    pr = pagerank(
        edges, "src", "dst", iters=5, damping=0.85, checkpoint_interval=5
    )
    return (
        pr.select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), "node")
        .limit(20)
    )


@query(
    "scd2_customer_dimension",
    """
    WITH dim AS (
      SELECT c_custkey, round(c_acctbal, 2) AS acctbal, c_mktsegment,
             TIMESTAMP '1995-01-01' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM customer
    ),
    upd AS (
      SELECT o_custkey AS k, round(o_totalprice, 2) AS new_acctbal,
             o_orderdate AS uts,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC,
                                         o_orderkey DESC) AS rn
      FROM orders
      WHERE o_orderpriority = '1-URGENT'
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1997-07-01'
    ),
    u AS (SELECT k, new_acctbal, uts FROM upd WHERE rn = 1),
    j AS (SELECT * FROM dim FULL OUTER JOIN u ON c_custkey = k),
    untouched AS (
      SELECT c_custkey, acctbal, c_mktsegment, valid_from, valid_to
      FROM j WHERE c_custkey IS NOT NULL
        AND (k IS NULL OR acctbal IS NOT DISTINCT FROM new_acctbal)
    ),
    closed AS (
      SELECT c_custkey, acctbal, c_mktsegment, valid_from, uts AS valid_to
      FROM j WHERE c_custkey IS NOT NULL AND k IS NOT NULL
        AND acctbal IS DISTINCT FROM new_acctbal
    ),
    opened AS (
      SELECT coalesce(c_custkey, k) AS c_custkey, new_acctbal AS acctbal,
             c_mktsegment, uts AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
      FROM j WHERE k IS NOT NULL
        AND (c_custkey IS NULL OR acctbal IS DISTINCT FROM new_acctbal)
    )
    SELECT c_custkey, acctbal, c_mktsegment,
           strftime(valid_from, '%Y-%m-%d') AS valid_from,
           coalesce(strftime(valid_to, '%Y-%m-%d'), 'current') AS valid_to
    FROM (SELECT * FROM untouched
          UNION ALL SELECT * FROM closed
          UNION ALL SELECT * FROM opened) t
    """,
)
def scd2_customer_dimension(spark, sf_dir):
    """SCD type-2 apply: customer balances versioned by the latest
    urgent 1997-H1 order — changed keys close their current row and
    open a new one at the update date, everything else passes through.
    The full before/after dimension is hash-compared."""
    from .operators.scd import scd2_apply

    customer, orders = _t(spark, sf_dir, "customer", "orders")
    dim = customer.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        "c_mktsegment",
        F.lit("1995-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    updates = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    ).select(
        F.col("o_custkey").alias("c_custkey"),
        F.round("o_totalprice", 2).alias("acctbal"),
        F.col("o_orderdate").alias("ts"),
        "o_orderkey",
    )
    applied = scd2_apply(
        dim, updates, key="c_custkey", tracked=["acctbal"],
        ts_col="ts", tiebreak="o_orderkey",
    )
    return applied.select(
        "c_custkey",
        "acctbal",
        "c_mktsegment",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.coalesce(
            F.date_format("valid_to", "yyyy-MM-dd"), F.lit("current")
        ).alias("valid_to"),
    )


@query(
    "profile_lineitem_columns",
    """
    SELECT 'l_quantity' AS "column", count(*) AS n_rows,
           sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS n_nulls,
           count(DISTINCT l_quantity) AS n_distinct,
           CAST(round(min(l_quantity), 4) AS VARCHAR) AS min_value,
           CAST(round(max(l_quantity), 4) AS VARCHAR) AS max_value,
           round(avg(l_quantity), 4) AS mean_value
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', count(*),
           sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END),
           count(DISTINCT l_extendedprice),
           CAST(round(min(l_extendedprice), 4) AS VARCHAR),
           CAST(round(max(l_extendedprice), 4) AS VARCHAR),
           round(avg(l_extendedprice), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', count(*),
           sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END),
           count(DISTINCT l_returnflag),
           min(l_returnflag), max(l_returnflag), CAST(NULL AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'l_shipdate', count(*),
           sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END),
           count(DISTINCT l_shipdate),
           strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S'),
           strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S'),
           CAST(NULL AS DOUBLE)
    FROM lineitem
    """,
)
def profile_lineitem_columns(spark, sf_dir):
    """One-pass data profiling over mixed column types (numeric,
    string, timestamp): counts, nulls, exact distincts, min/max,
    means — the table-audit step before any pipeline run."""
    from .operators.profile import profile_table

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    prof = profile_table(
        lineitem,
        ["l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate"],
    )
    # timestamps render as 'yyyy-MM-dd HH:mm:ss' on both engines
    return prof


@query(
    "mor_customer_current_view",
    """
    WITH base AS (
      SELECT c_custkey, round(c_acctbal, 2) AS acctbal, c_mktsegment,
             TIMESTAMP '1990-01-01' AS ts, CAST(-1 AS BIGINT) AS seq,
             false AS _deleted
      FROM customer
    ),
    upserts AS (
      SELECT o.o_custkey AS c_custkey, round(o.o_totalprice, 2) AS acctbal,
             c.c_mktsegment, o.o_orderdate AS ts, o.o_orderkey AS seq,
             false AS _deleted
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE o.o_orderpriority = '1-URGENT'
        AND o.o_orderdate >= TIMESTAMP '1997-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-07-01'
    ),
    deletes AS (
      SELECT o.o_custkey AS c_custkey, CAST(NULL AS DOUBLE) AS acctbal,
             CAST(NULL AS VARCHAR) AS c_mktsegment, o.o_orderdate AS ts,
             o.o_orderkey AS seq, true AS _deleted
      FROM orders o
      WHERE o.o_orderpriority = '5-LOW'
        AND o.o_orderdate >= TIMESTAMP '1997-07-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
    ),
    all_rows AS (
      SELECT * FROM base UNION ALL SELECT * FROM upserts
      UNION ALL SELECT * FROM deletes
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY c_custkey
                                   ORDER BY ts DESC, seq DESC) AS rn
      FROM all_rows
    )
    SELECT c_custkey, acctbal, c_mktsegment
    FROM ranked WHERE rn = 1 AND NOT _deleted
    """,
)
def mor_customer_current_view(spark, sf_dir):
    """Merge-on-read upsert table: base customer snapshot + an
    append-only change log (urgent-1997H1 full-row upserts,
    low-priority-1997H2 tombstones) merged at read time, latest change
    per key winning — the lakehouse MoR pattern as one keyed window."""
    from .sources.upsert import merge_on_read

    customer, orders = _t(spark, sf_dir, "customer", "orders")
    base = customer.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        "c_mktsegment",
        F.lit("1990-01-01").cast("timestamp").alias("ts"),
        F.lit(-1).cast("long").alias("seq"),
        F.lit(False).alias("_deleted"),
    )
    upserts = (
        orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            F.round("o_totalprice", 2).alias("acctbal"),
            "c_mktsegment",
            F.col("o_orderdate").alias("ts"),
            F.col("o_orderkey").alias("seq"),
            F.lit(False).alias("_deleted"),
        )
    )
    deletes = orders.filter(
        (F.col("o_orderpriority") == "5-LOW")
        & (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select(
        F.col("o_custkey").alias("c_custkey"),
        F.lit(None).cast("double").alias("acctbal"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("seq"),
        F.lit(True).alias("_deleted"),
    )
    log = upserts.unionByName(deletes)
    return merge_on_read(base, log, "c_custkey", "ts", tiebreak="seq")


@query(
    "source_zorder_buckets",
    """
    WITH z AS (
      SELECT (
        -- Morton interleave of (o_custkey % 256, epoch-day % 256)
        -- NB every shift term parenthesized: DuckDB gives << and | equal
        -- precedence (left-assoc), unlike Java/Spark
        (SELECT bit_or(
           (((( o_custkey % 256) >> j) & 1) << (2 * j))
           | ((((CAST(epoch(o_orderdate) AS BIGINT) // 86400 % 256) >> j) & 1)
              << (2 * j + 1)))
         FROM range(8) t(j)) ) AS zval
      FROM orders
    )
    SELECT zval >> 8 AS z_bucket, count(*) AS n
    FROM z GROUP BY z_bucket
    """,
)
def source_zorder_buckets(spark, sf_dir):
    """Z-order clustering key (8-bit Morton interleave of customer and
    order-day): bucket histogram of the interleaved key — the layout
    coordinate behind multi-dimensional data skipping.  The DuckDB
    oracle rebuilds the interleave bit-by-bit."""
    from .sources.zorder import zorder_key

    (orders,) = _t(spark, sf_dir, "orders")
    day = (F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long")
    z = zorder_key(F.col("o_custkey"), day, bits=8)
    return (
        orders.select(F.shiftright(z, 8).alias("z_bucket"))
        .groupBy("z_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
