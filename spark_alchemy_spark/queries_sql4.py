"""Battery extension: the Spark 4 surface a reference user gains by
switching engines — recursive CTEs, SQL pipe syntax, EXECUTE IMMEDIATE
dynamic SQL, declarative SQL UDFs, SQL scripting, LATERAL subqueries,
approx_top_k, the state-store reader for streaming state observability,
mapInArrow, ordered-set/argmax aggregates, INTERVAL arithmetic, mask()
redaction, the array-v2 function set, the Python data source WRITER,
observe() metrics, and the JDBC leg (plain round trip + the
sketch-in-database pipeline of hll/PostgresInteropTest.scala:73-98,
against embedded Derby).

The reference delegates its whole relational surface to the host engine
(SURVEY.md §2.2 — its tests express queries over stock Spark/Postgres);
these entries pin the NEWER forms of that delegated surface so a user
can rely on them with the same oracle guarantee as the classic forms.
Every entry has a DuckDB oracle expressing the identical semantics in
classic ANSI SQL — which doubles as documentation of what each new form
desugars to.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from .localframe import local_frame

from .functions import hll
from .queries import _t, query
from .queries_ext import _sink_name


@query(
    "sql_recursive_cte_chain",
    """
    -- Unrolled (non-recursive) replay of the digit-hierarchy walk: the
    -- recursion emits depth k (k >= 1) iff leaf // 10^(k-1) > 0, i.e.
    -- leaf*10 >= 10^k, so a powers-of-ten VALUES table reproduces the
    -- whole chain with one join.  Recursive CTEs are banned from
    -- oracles (DuckDB recursion semantics drifted across driver-box
    -- versions); k <= 18 covers any BIGINT suppkey.
    WITH pows(k, p) AS (
      VALUES (0, CAST(1 AS BIGINT)), (1, 10), (2, 100), (3, 1000),
             (4, 10000), (5, 100000), (6, 1000000), (7, 10000000),
             (8, 100000000), (9, 1000000000), (10, 10000000000),
             (11, 100000000000), (12, 1000000000000),
             (13, 10000000000000), (14, 100000000000000),
             (15, 1000000000000000), (16, 10000000000000000),
             (17, 100000000000000000), (18, 1000000000000000000)
    ),
    chain AS (
      SELECT s_suppkey AS leaf, CAST(s_suppkey AS BIGINT) // p AS node,
             k AS depth
      FROM supplier, pows
      WHERE k = 0 OR CAST(s_suppkey AS BIGINT) * 10 >= p
    )
    SELECT leaf, max(depth) AS depth_to_root,
           CAST(sum(node) AS BIGINT) AS chain_sum
    FROM chain GROUP BY leaf
    """,
)
def sql_recursive_cte_chain(spark, sf_dir):
    """Native recursive CTE (Spark 4): walk each supplier up a synthetic
    decimal-digit hierarchy (parent = suppkey DIV 10) to the root,
    returning per-leaf depth and the sum of visited node ids.  The
    iterative-DataFrame twin of this shape is operators/graph.py —
    this entry pins the declarative SQL form.  Depth is O(log10 n), so
    the recursion is planner-bounded at any corpus scale."""
    _t(spark, sf_dir, "supplier")
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT s_suppkey AS leaf, CAST(s_suppkey AS BIGINT) AS node, 0 AS depth
          FROM supplier
          UNION ALL
          SELECT leaf, node DIV 10, depth + 1 FROM chain WHERE node > 0
        )
        SELECT leaf, max(depth) AS depth_to_root,
               CAST(sum(node) AS BIGINT) AS chain_sum
        FROM chain GROUP BY leaf
        """
    )


@query(
    "sql_pipe_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_pricing(spark, sf_dir):
    """SQL pipe syntax (|>, Spark 4): the Q1 pricing summary written as
    a linear dataflow — FROM |> WHERE |> AGGREGATE ... GROUP BY.  Same
    plan as the nested form (Catalyst desugars before optimization), so
    pushdown/partial-agg behavior is identical."""
    _t(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |> AGGREGATE round(sum(l_quantity), 2) AS sum_qty,
                     round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                     count(*) AS count_order
           GROUP BY l_returnflag, l_linestatus
        """
    )


@query(
    "sql_execute_immediate_param",
    """
    SELECT o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders WHERE o_totalprice > 150000.0
    GROUP BY o_orderpriority
    """,
)
def sql_execute_immediate_param(spark, sf_dir):
    """Dynamic SQL: EXECUTE IMMEDIATE with positional USING parameters
    and an IDENTIFIER() table name — the safe (injection-free) form of
    runtime-assembled queries."""
    _t(spark, sf_dir, "orders")
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderpriority, count(*) AS n,
                  round(sum(o_totalprice), 2) AS total
           FROM IDENTIFIER(?) WHERE o_totalprice > ? GROUP BY o_orderpriority'
        USING 'orders', 150000.0
        """
    )


@query(
    "sql_udf_scalar_revenue",
    """
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(sum(CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bulk
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sql_udf_scalar_revenue(spark, sf_dir):
    """Declarative SQL UDFs (CREATE FUNCTION ... RETURN expr, Spark 4):
    scalar functions defined in SQL text are inlined by Catalyst into
    the calling plan — full codegen, no serialization boundary, unlike
    Python UDFs.  The oracle shows the inlined equivalent."""
    _t(spark, sf_dir, "lineitem")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_revenue(ep DOUBLE, disc DOUBLE)
        RETURNS DOUBLE RETURN ep * (1 - disc)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION is_bulk(qty DOUBLE)
        RETURNS INT RETURN CASE WHEN qty >= 30 THEN 1 ELSE 0 END
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               round(sum(disc_revenue(l_extendedprice, l_discount)), 2) AS revenue,
               CAST(sum(is_bulk(l_quantity)) AS BIGINT) AS n_bulk
        FROM lineitem GROUP BY l_returnflag
        """
    )


@query(
    "sql_scripting_threshold_bands",
    """
    SELECT CAST(
      (SELECT count(*) FROM orders WHERE o_totalprice > 100000)
      + (SELECT count(*) FROM orders WHERE o_totalprice > 200000)
      + (SELECT count(*) FROM orders WHERE o_totalprice > 300000)
      AS BIGINT) AS n_above_bands
    """,
)
def sql_scripting_threshold_bands(spark, sf_dir):
    """SQL scripting (BEGIN/DECLARE/WHILE, Spark 4.1): a control-flow
    loop accumulating counts over three price thresholds; the script's
    last statement is the result.  The oracle is the unrolled sum."""
    _t(spark, sf_dir, "orders")
    return spark.sql(
        """
        BEGIN
          DECLARE i INT DEFAULT 1;
          DECLARE acc BIGINT DEFAULT 0;
          WHILE i <= 3 DO
            SET acc = acc + (
              SELECT count(*) FROM orders WHERE o_totalprice > i * 100000
            );
            SET i = i + 1;
          END WHILE;
          SELECT acc AS n_above_bands;
        END
        """
    )


@query(
    "sql_lateral_topn_per_region",
    """
    SELECT r_name, c_name, c_acctbal FROM (
      SELECT r.r_name, c.c_name, c.c_acctbal,
             row_number() OVER (PARTITION BY r.r_name
                                ORDER BY c.c_acctbal DESC, c.c_name) AS rnk
      FROM region r
      JOIN nation n ON n.n_regionkey = r.r_regionkey
      JOIN customer c ON c.c_nationkey = n.n_nationkey) t
    WHERE rnk <= 2
    """,
)
def sql_lateral_topn_per_region(spark, sf_dir):
    """Correlated LATERAL subquery with ORDER BY/LIMIT: top-2 customers
    by balance per region, written as a lateral per-row subquery.  The
    oracle shows the window-function desugaring Catalyst applies."""
    _t(spark, sf_dir, "region", "nation", "customer")
    return spark.sql(
        """
        SELECT r.r_name, t.c_name, t.c_acctbal
        FROM region r, LATERAL (
          SELECT c.c_name, c.c_acctbal
          FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          ORDER BY c.c_acctbal DESC, c.c_name LIMIT 2
        ) t
        """
    )


@query(
    "sketch_approx_topk_events",
    """
    SELECT event_type AS item, count(*) AS est_count
    FROM events GROUP BY event_type
    ORDER BY est_count DESC, item LIMIT 5
    """,
)
def sketch_approx_topk_events(spark, sf_dir):
    """approx_top_k (Spark 4.1 frequent-items sketch): heavy hitters
    over event_type.  At this cardinality (items ≪ sketch capacity
    10000) the Space-Saving estimates are exact, so the oracle is the
    exact GROUP BY — the same exact-below-capacity contract the HLL
    entries pin."""
    _t(spark, sf_dir, "events")
    return (
        spark.sql("SELECT approx_top_k(event_type, 5) AS tk FROM events")
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").alias("est_count"),
        )
        .orderBy(F.col("est_count").desc(), "item")
    )


@query(
    "stream_statestore_inspect",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
           event_type, count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def stream_statestore_inspect(spark, sf_dir):
    """Streaming state observability: drain a windowed-count stream to
    an explicit checkpoint, then read the aggregation STATE STORE
    itself with the Spark 4 state data source.  The state rows (one per
    (window, event_type) group, value = running count) must equal the
    batch aggregate — which is exactly the replay guarantee operators
    teams audit with this reader in production."""
    from .streaming import read_events_stream

    ckpt = os.path.join(
        tempfile.gettempdir(), _sink_name("ss_inspect"), "ckpt"
    )
    stream = read_events_stream(spark, sf_dir)
    # NB the state-store key schema keeps the grouping expression's own
    # field name ("window"), not any alias applied in the groupBy
    agg = stream.groupBy(
        F.window("ts", "1 hour"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    conf_key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "8")
    try:
        q = (
            agg.writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(conf_key, old)
    state = spark.read.format("statestore").load(ckpt)
    return state.select(
        F.date_format("key.window.start", "yyyy-MM-dd HH:00:00").alias("hour"),
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").alias("n"),
    )


@query(
    "arrow_batch_vector_norms",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           round(sqrt(list_aggregate(
             list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')), 4)
             AS l2_norm
    FROM embeddings
    """,
)
def arrow_batch_vector_norms(spark, sf_dir):
    """mapInArrow: per-batch vectorized math straight on Arrow
    RecordBatches — no pandas materialization at all, the leanest
    Python boundary Spark offers (the pandas paths convert
    Arrow->pandas->Arrow; this skips both).  Computes per-vector L2
    norms by flattening the Arrow list column into one numpy view per
    batch: one BLAS-ish pass per batch, zero per-row Python."""
    import pyarrow as pa

    (embeddings,) = _t(spark, sf_dir, "embeddings")

    def norms(batches):
        import numpy as np

        for batch in batches:
            ids = batch.column("vec_id")
            emb = batch.column("embedding")
            # zero-copy flatten: values buffer + offsets from Arrow
            lst = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
            values = np.asarray(lst.flatten(), dtype=np.float64)
            # flatten() honors slicing but offsets keep the base offset;
            # rebase so they index into `values`
            offsets = np.asarray(lst.offsets)
            offsets = offsets - offsets[0]
            dims = np.diff(offsets).astype(np.int32)
            sq = values * values
            # reduceat quirks guarded: an index == len(values) (trailing
            # empty list) raises IndexError, and an empty segment returns
            # the NEXT value — clamp the starts, then zero empty dims.
            if len(values) == 0:
                sums = np.zeros(len(dims))
            else:
                starts = np.minimum(offsets[:-1], len(values) - 1)
                sums = np.add.reduceat(sq, starts)
            sums = np.where(dims == 0, 0.0, sums)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(dims, type=pa.int32()),
                    pa.array(np.round(np.sqrt(sums), 4), type=pa.float64()),
                ],
                names=["vec_id", "dim", "l2_norm"],
            )

    return embeddings.select("vec_id", "embedding").mapInArrow(
        norms, "vec_id long, dim int, l2_norm double"
    )


@query(
    "ordered_set_aggregates",
    """
    SELECT l_returnflag,
           round(median(l_extendedprice), 2) AS med_price,
           CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_disc,
           bool_and(l_quantity > 0) AS all_pos,
           bool_or(l_quantity >= 50) AS any_big,
           CAST(bit_xor(CAST(l_orderkey AS BIGINT)) AS BIGINT) AS key_xor,
           round(quantile_disc(l_extendedprice, 0.25), 2) AS p25_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def ordered_set_aggregates(spark, sf_dir):
    """Modern aggregate battery: median, count_if, bool_and/bool_or,
    bit_xor, and percentile_disc WITHIN GROUP — the ordered-set and
    filtered aggregate surface.  percentile_disc returns an actual data
    value (discrete), unlike the interpolating percentile_cont the
    `percentiles_quantity` entry pins; median is the 0.5 cont form.
    mode() is deliberately absent: its tie-break is engine-unspecified,
    so it cannot carry a cross-engine oracle."""
    _t(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               round(median(l_extendedprice), 2) AS med_price,
               count_if(l_discount > 0.05) AS n_disc,
               bool_and(l_quantity > 0) AS all_pos,
               bool_or(l_quantity >= 50) AS any_big,
               bit_xor(CAST(l_orderkey AS BIGINT)) AS key_xor,
               round(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 2)
                 AS p25_disc
        FROM lineitem GROUP BY l_returnflag
        """
    )


@query(
    "interval_arithmetic_orders",
    """
    SELECT o_orderpriority,
           CAST(count(*) FILTER (
             WHERE o_orderdate + INTERVAL 90 DAY
                   <= TIMESTAMP '1998-06-30 00:00:00') AS BIGINT) AS matured,
           strftime(min(o_orderdate + INTERVAL 12 HOUR),
                    '%Y-%m-%d %H:%M:%S') AS first_plus_12h,
           strftime(max(date_trunc('week', o_orderdate)),
                    '%Y-%m-%d %H:%M:%S') AS last_week_start
    FROM orders GROUP BY o_orderpriority
    """,
)
def interval_arithmetic_orders(spark, sf_dir):
    """ANSI INTERVAL arithmetic on timestamps: day/hour offsets inside
    filters and aggregates, plus week truncation — emitted as formatted
    strings (the battery's timestamp convention)."""
    _t(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count_if(o_orderdate + INTERVAL 90 DAY
                        <= TIMESTAMP '1998-06-30 00:00:00') AS matured,
               date_format(min(o_orderdate + INTERVAL 12 HOUR),
                           'yyyy-MM-dd HH:mm:ss') AS first_plus_12h,
               date_format(max(date_trunc('week', o_orderdate)),
                           'yyyy-MM-dd HH:mm:ss') AS last_week_start
        FROM orders GROUP BY o_orderpriority
        """
    )


@query(
    "source_python_datasource_sink",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(user_id) AS BIGINT) AS sum_users
    FROM events WHERE event_id % 10 = 0
    GROUP BY event_type
    """,
)
def source_python_datasource_sink(spark, sf_dir):
    """Python data source WRITER (Spark 4): events subset written
    through the jsonl_sink two-phase commit (task temp files -> driver
    rename + _SUCCESS), read back with the stock JSON reader, and
    aggregated — proving the sink publishes exactly-once per save.  The
    oracle aggregates the same subset straight from parquet."""
    from .sources import pyds

    pyds.register_sink(spark)
    sink_dir = os.path.join(tempfile.gettempdir(), _sink_name("jsonl_sink"))
    (events,) = _t(spark, sf_dir, "events")
    subset = (
        events.filter(F.col("event_id") % 10 == 0)
        .select("event_id", "user_id", "event_type")
        # size write tasks to the (small) subset: each task is one Python
        # writer worker + one output file — 4 right-sized files beat 32
        # slivers on both the write and the read-back
        .coalesce(4)
    )
    subset.write.format("jsonl_sink").option("path", sink_dir).mode(
        "append"
    ).save()
    back = spark.read.schema("event_id long, user_id long, event_type string").json(
        sink_dir + "/part-*.jsonl"
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("user_id").alias("sum_users"),
    )


@query(
    "observe_pipeline_metrics",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT)
             AS n_discounted
    FROM lineitem
    """,
)
def observe_pipeline_metrics(spark, sf_dir):
    """df.observe + Observation: pipeline-embedded metrics collected as
    a side effect of one pass (no second scan), the ops-instrumentation
    surface a production job wires into its monitoring.  The entry
    returns the observed metrics as a row; the oracle recomputes them
    as plain aggregates."""
    from pyspark.sql import Observation

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    obs = Observation("pipeline_metrics")
    observed = lineitem.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return local_frame(spark, 
        [(m["n_rows"], m["sum_qty"], m["n_discounted"])],
        "n_rows long, sum_qty double, n_discounted long",
    )


@query(
    "argmax_aggregates",
    """
    SELECT l_returnflag, best_key, worst_key FROM (
      SELECT l_returnflag,
             first(l_orderkey ORDER BY l_extendedprice DESC, l_orderkey DESC)
               AS best_key,
             first(l_orderkey ORDER BY l_extendedprice ASC, l_orderkey ASC)
               AS worst_key
      FROM lineitem GROUP BY l_returnflag) t
    """,
)
def argmax_aggregates(spark, sf_dir):
    """max_by / min_by (argmax aggregates): the row-valued answer to
    "WHICH order has the extreme price" without a join-back or window.
    Tie-broken deterministically by pairing the ordering value with the
    key in a struct (struct comparison is lexicographic), since bare
    max_by tie-breaks are engine-unspecified.  The oracle states the
    same thing as DuckDB ordered-first aggregates."""
    _t(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               max_by(l_orderkey, struct(l_extendedprice, l_orderkey))
                 AS best_key,
               min_by(l_orderkey, struct(l_extendedprice, l_orderkey))
                 AS worst_key
        FROM lineitem GROUP BY l_returnflag
        """
    )


@query(
    "string_mask_pii",
    """
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(c_name,
             '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS masked_default,
           regexp_replace(regexp_replace(regexp_replace(c_name,
             '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'), '[0-9]', '#', 'g')
             AS masked_custom
    FROM customer
    """,
)
def string_mask_pii(spark, sf_dir):
    """Built-in mask() (Spark 3.4+): character-class redaction — the
    codegen'd complement to operators/prep.py::scrub_pii's pattern
    scrubbing.  Default masks upper->X lower->x digit->n; the custom
    form overrides all three.  Oracle replays as per-class
    regexp_replace chains."""
    _t(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey,
               mask(c_name) AS masked_default,
               mask(c_name, 'U', 'l', '#') AS masked_custom
        FROM customer
        """
    )


@query(
    "array_functions_v2",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents),
    ab AS (
      SELECT doc_id, ws[1:4] AS a, ws[5:8] AS b FROM toks
      WHERE len(ws) >= 8)
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(a || b)), '|') AS u,
           COALESCE(array_to_string(list_sort(
             [x FOR x IN list_distinct(a) IF list_contains(b, x)]), '|'),
             '') AS i,
           COALESCE(array_to_string(list_sort(
             [x FOR x IN list_distinct(a) IF NOT list_contains(b, x)]), '|'),
             '') AS e,
           array_to_string(a || ['<eos>'], '|') AS appended,
           array_to_string(['<bos>'] || a, '|') AS prepended,
           len([x FOR x IN a IF x IS NOT NULL]) AS n_compact,
           array_to_string(a[2:4] || [a[1]], '|') AS rotated
    FROM ab
    """,
)
def array_functions_v2(spark, sf_dir):
    """Array function battery v2 (Spark 3.4/3.5 additions): set algebra
    (union/intersect/except — sorted on both engines, since set results
    are order-unspecified values), append/prepend, compact, and an
    array_insert/slice rotation.  All codegen'd collection expressions.
    Array columns are '|'-joined to scalar strings on BOTH sides so the
    battery output stays canonicalizer-safe (the driver's compare sorts
    with pandas, which cannot hash list cells)."""
    (documents,) = _t(spark, sf_dir, "documents")
    toks = documents.select(
        "doc_id", F.filter(F.split("text", " "), lambda w: w != "").alias("ws")
    )
    ab = toks.filter(F.size("ws") >= 8).select(
        "doc_id",
        F.slice("ws", 1, 4).alias("a"),
        F.slice("ws", 5, 4).alias("b"),
    )
    j = lambda c: F.array_join(c, "|")  # noqa: E731
    return ab.select(
        "doc_id",
        j(F.array_sort(F.array_union("a", "b"))).alias("u"),
        j(F.array_sort(F.array_intersect("a", "b"))).alias("i"),
        j(F.array_sort(F.array_except("a", "b"))).alias("e"),
        j(F.array_append("a", F.lit("<eos>"))).alias("appended"),
        j(F.array_prepend("a", F.lit("<bos>"))).alias("prepended"),
        F.size(F.array_compact("a")).alias("n_compact"),
        j(F.concat(F.slice("a", 2, 3), F.array(F.element_at("a", 1)))).alias(
            "rotated"
        ),
    )


@query(
    "source_jdbc_roundtrip",
    """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def source_jdbc_roundtrip(spark, sf_dir):
    """JDBC source/sink round trip — the reference's actual I/O leg
    (PostgresInteropTest writes/reads Postgres over JDBC; no container
    runs here, so the bundled embedded Derby stands in).  Customers are
    written to a JDBC table and read BACK with a partitioned parallel
    read (partitionColumn/numPartitions — the cluster-scale JDBC scan
    shape, one executor per key range), then aggregated; the oracle
    aggregates the same rows straight from parquet."""
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    url = f"jdbc:derby:memory:{_sink_name('jdbc_rt')};create=true"
    (customer,) = _t(spark, sf_dir, "customer")
    cols = customer.select("c_custkey", "c_mktsegment", "c_acctbal")
    (
        cols.coalesce(4)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", "customer_rt")
        .option("driver", driver)
        .mode("overwrite")
        .save()
    )
    n = cols.count()
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "customer_rt")
        .option("driver", driver)
        .option("partitionColumn", "c_custkey")
        .option("lowerBound", "0")
        .option("upperBound", str(max(n, 1)))
        .option("numPartitions", "4")
        .load()
    )
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


@query(
    "hll_jdbc_sketch_store",
    """
    SELECT event_type, count(DISTINCT user_id) AS approx_users
    FROM events GROUP BY event_type
    """,
)
def hll_jdbc_sketch_store(spark, sf_dir):
    """The reference's headline interop pipeline
    (hll/PostgresInteropTest.scala:73-98) against a real database:
    fine-grained HLL sketches per (event_type, day) are WRITTEN to a
    JDBC table (binary sketch column -> BLOB), read BACK, and
    re-aggregated with hll_merge + hll_cardinality — proving sketch
    bytes survive database storage and stay re-mergeable, which is the
    whole point of sketch-in-warehouse architectures.  Embedded Derby
    stands in for Postgres (no container runtime here); estimates are
    exact at these cardinalities (lgK 20), so the oracle is exact
    COUNT(DISTINCT)."""
    from .queries import _EXACT_SD

    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    url = f"jdbc:derby:memory:{_sink_name('hll_store')};create=true"
    (events,) = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(hll.hll_init_agg("user_id", _EXACT_SD).alias("users_hll"))
    (
        daily.coalesce(4)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", "daily_sketches")
        .option("driver", driver)
        .mode("overwrite")
        .save()
    )
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "daily_sketches")
        .option("driver", driver)
        .load()
    )
    return back.groupBy("event_type").agg(
        hll.hll_cardinality(hll.hll_merge("users_hll")).alias("approx_users")
    )


@query(
    "generator_outer_variants",
    """
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN length(text) >= 60
                  THEN list_filter(string_split(substring(text, 1, 40), ' '),
                                   w -> w <> '')
                  ELSE [] END AS ws
      FROM documents),
    ex AS (
      SELECT t.doc_id, u.w,
             CAST(u.p - 1 AS INTEGER) AS pos
      FROM toks t LEFT JOIN LATERAL (
        SELECT unnest(ws) AS w, generate_subscripts(ws, 1) AS p) u ON true)
    SELECT doc_id, pos, w FROM ex
    """,
)
def generator_outer_variants(spark, sf_dir):
    """OUTER generators (posexplode_outer): rows with an empty/NULL
    collection survive as a single null-element row instead of
    vanishing — the generator form joins need when the left side must
    be preserved.  Docs shorter than 60 chars get an empty token array
    on purpose so both branches are exercised.  Oracle: LEFT JOIN
    LATERAL unnest."""
    (documents,) = _t(spark, sf_dir, "documents")
    toks = documents.select(
        "doc_id",
        F.when(
            F.length("text") >= 60,
            F.filter(
                F.split(F.substring("text", 1, 40), " "), lambda w: w != ""
            ),
        ).otherwise(F.array().cast("array<string>")).alias("ws"),
    )
    return toks.select(
        "doc_id", F.posexplode_outer("ws").alias("pos", "w")
    )


@query(
    "stack_generator_metrics",
    """
    SELECT o_orderkey, 'total' AS metric, round(o_totalprice, 2) AS value
    FROM orders WHERE o_orderkey % 100 = 0
    UNION ALL
    SELECT o_orderkey, 'acctbal_sign',
           CAST(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS DOUBLE)
    FROM orders WHERE o_orderkey % 100 = 0
    UNION ALL
    SELECT o_orderkey, 'key_mod', CAST(o_orderkey % 7 AS DOUBLE)
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def stack_generator_metrics(spark, sf_dir):
    """stack(n, ...): the row-generator unpivot primitive (the SQL
    engine's lowest-level wide->long operator, beneath the UNPIVOT
    syntax the `unpivot_pricing_metrics` entry pins).  Oracle is the
    UNION ALL desugaring."""
    _t(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, metric, value FROM (
          SELECT o_orderkey,
                 stack(3,
                       'total', round(o_totalprice, 2),
                       'acctbal_sign',
                       CAST(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END
                            AS DOUBLE),
                       'key_mod', CAST(o_orderkey % 7 AS DOUBLE))
                   AS (metric, value)
          FROM orders WHERE o_orderkey % 100 = 0)
        """
    )


@query(
    "binary_codec_functions",
    """
    SELECT p_partkey,
           to_base64(encode(p_name)) AS b64,
           lower(hex(encode(p_brand))) AS hx,
           decode(from_base64(to_base64(encode(p_name)))) AS rt,
           CAST(octet_length(encode(p_name)) AS INTEGER) AS n_bytes
    FROM part
    """,
)
def binary_codec_functions(spark, sf_dir):
    """Binary codec battery: base64 / hex round trips and byte-length
    over UTF-8 encoded strings — the encode/decode surface data
    interchange relies on (all codegen'd)."""
    _t(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_partkey,
               base64(encode(p_name, 'utf-8')) AS b64,
               lower(hex(encode(p_brand, 'utf-8'))) AS hx,
               decode(unbase64(base64(encode(p_name, 'utf-8'))), 'utf-8') AS rt,
               octet_length(p_name) AS n_bytes
        FROM part
        """
    )


@query(
    "dedup_shared_spans",
    """
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents),
    pos AS (
      SELECT t.doc_id, u.p - 1 AS p,
             array_to_string(t.ws[u.p : u.p + 5], ' ') AS s
      FROM tok t, LATERAL (SELECT generate_subscripts(ws, 1) AS p) u
      WHERE u.p + 5 <= len(t.ws)),
    m AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.p AS pa, b.p AS pb,
             a.p - b.p AS diag
      FROM pos a JOIN pos b ON a.s = b.s AND a.doc_id < b.doc_id),
    runs AS (
      SELECT id_a, id_b, diag,
             pa - row_number() OVER (PARTITION BY id_a, id_b, diag
                                     ORDER BY pa) AS grp
      FROM m),
    spans AS (
      SELECT id_a, id_b, count(*) + 5 AS span_tokens
      FROM runs GROUP BY id_a, id_b, diag, grp
      HAVING count(*) + 5 >= 10)
    SELECT id_a, id_b,
           CAST(max(span_tokens) AS BIGINT) AS max_span_tokens,
           count(*) AS n_spans
    FROM spans GROUP BY id_a, id_b
    """,
)
def dedup_shared_spans(spark, sf_dir):
    """Verbatim shared-span pairs (exact substring overlap, k=6 grams,
    spans >= 10 tokens) — the suffix-array-dedup signal set-overlap
    Jaccard can't see (a copied paragraph inside two long documents).
    Positional k-gram index -> diagonal gaps-and-islands -> span runs;
    the oracle replays the identical computation with SQL windows, so
    the entry runs the PURE exact mode (max_shingle_df=None); the
    operator's default keeps the hot-k-gram guard on for production
    corpora, where it can only split spans containing viral
    boilerplate, never invent one."""
    from .operators.dedup import shared_span_pairs

    (documents,) = _t(spark, sf_dir, "documents")
    return shared_span_pairs(
        documents, "doc_id", "text", k=6, min_span_tokens=10,
        max_shingle_df=None,
    )


# Runtime-filtering + LM-quality battery registers itself on import.
from . import queries_runtime  # noqa: E402,F401  (registration side effect)
